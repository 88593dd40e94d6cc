from .base import BreverBaseModel, ModelRegistry, count_params  # noqa: F401

# import model families so they register themselves
from . import convtasnet  # noqa: F401
from . import dccrn  # noqa: F401
from . import ffnn  # noqa: F401

__all__ = ['ModelRegistry', 'BreverBaseModel', 'count_params']
