"""Pallas TPU kernels for the DSP hot paths."""

from .stft_kernel import pallas_stft, pallas_stft_available  # noqa: F401
