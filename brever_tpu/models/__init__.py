from .base import BreverBaseModel, ModelRegistry, count_params  # noqa: F401

# import model families so they register themselves
from . import ffnn  # noqa: F401

__all__ = ['ModelRegistry', 'BreverBaseModel', 'count_params']
