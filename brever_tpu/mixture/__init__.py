from .maker import RandomMixtureMaker  # noqa: F401
from .metadata import MixtureMetadata  # noqa: F401

__all__ = ['RandomMixtureMaker', 'MixtureMetadata']
