from .base import BreverBaseModel, ModelRegistry, count_params  # noqa: F401

# import model families so they register themselves
from . import convtasnet  # noqa: F401
from . import dccrn  # noqa: F401
from . import ffnn  # noqa: F401
from . import tfgridnet  # noqa: F401
from . import manner  # noqa: F401
from . import metricgan  # noqa: F401
from . import sgmse  # noqa: F401

__all__ = ['ModelRegistry', 'BreverBaseModel', 'count_params']
