from .stft import STFT, ConvSTFT, MelFilterbank  # noqa: F401
from .features import FeatureExtractor  # noqa: F401
from .normalization import (  # noqa: F401
    causal_group_norm,
    causal_instance_norm,
    causal_layer_norm,
)
from .resampling import downsample_2d, upsample_2d  # noqa: F401
from .ema import EMA, EMAKarras, post_hoc_ema  # noqa: F401

__all__ = [
    'STFT',
    'ConvSTFT',
    'MelFilterbank',
    'FeatureExtractor',
    'causal_group_norm',
    'causal_layer_norm',
    'causal_instance_norm',
    'upsample_2d',
    'downsample_2d',
    'EMA',
    'EMAKarras',
    'post_hoc_ema',
]
