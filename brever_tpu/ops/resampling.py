"""2x FIR up/down-sampling (Karras EDM style) as XLA convs.

Used by the diffusion U-Net. Depthwise separable FIR kernel, stride 2;
the ``Resampler`` padding stack makes ``up(down(x))`` restore odd input
shapes exactly (reference brever/modules/resampling.py:8-76).

Down: plain strided depthwise conv with per-dim padding
``ceil(K/2)-1`` (even dims) / ``ceil((K+1)/2)-1`` (odd dims).
Up: fractionally-strided conv (lhs dilation 2) with kernel scaled by 4,
matching ``conv_transpose2d(stride=2, padding=(K-1)//2)`` semantics.
"""

import math

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

_DN = ('NCHW', 'OIHW', 'NCHW')


def _fir_kernel_2d(fir_kernel):
    k = np.asarray(fir_kernel, dtype=np.float32)
    k2 = np.outer(k, k)
    return k2 / k2.sum()


def _depthwise(kernel2d, n_channels, dtype):
    k = jnp.asarray(kernel2d, dtype=dtype)
    return jnp.tile(k[None, None], (n_channels, 1, 1, 1))


def downsample_2d(x, fir_kernel, return_padding=False):
    """Depthwise FIR low-pass + 2x decimation on the last two axes.

    ``x`` has shape ``(batch, channels, h, w)``.
    """
    kernel2d = _fir_kernel_2d(fir_kernel)
    ksize = kernel2d.shape[-1]
    padding = tuple(
        math.ceil(ksize / 2) - 1 if dim % 2 == 0
        else math.ceil((ksize + 1) / 2) - 1
        for dim in x.shape[-2:]
    )
    out = lax.conv_general_dilated(
        x,
        _depthwise(kernel2d, x.shape[1], x.dtype),
        window_strides=(2, 2),
        padding=[(p, p) for p in padding],
        dimension_numbers=_DN,
        feature_group_count=x.shape[1],
    )
    if return_padding:
        output_padding = tuple(
            0 if (dim + 2 * p - ksize) % 2 == 0 else 1
            for dim, p in zip(x.shape[-2:], padding)
        )
        return out, (padding, output_padding)
    return out


def upsample_2d(x, fir_kernel, padding=None):
    """2x zero-stuffed upsampling + depthwise FIR interpolation.

    ``padding`` is an optional ``(padding, output_padding)`` pair produced
    by ``downsample_2d(..., return_padding=True)`` to restore odd shapes.
    """
    kernel2d = _fir_kernel_2d(fir_kernel) * 4
    ksize = kernel2d.shape[-1]
    if padding is None:
        pad = ((ksize - 1) // 2,) * 2
        out_pad = (0, 0)
    else:
        pad, out_pad = padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if isinstance(out_pad, int):
            out_pad = (out_pad, out_pad)
    # torch conv_transpose2d(stride s, padding p, output_padding op) is a
    # conv over the 2x-dilated input with asymmetric padding
    # (K-1-p, K-1-p+op); the FIR kernel is symmetric so no flip is needed.
    conv_padding = [
        (ksize - 1 - p, ksize - 1 - p + op) for p, op in zip(pad, out_pad)
    ]
    return lax.conv_general_dilated(
        x,
        _depthwise(kernel2d, x.shape[1], x.dtype),
        window_strides=(1, 1),
        padding=conv_padding,
        lhs_dilation=(2, 2),
        dimension_numbers=_DN,
        feature_group_count=x.shape[1],
    )


class Resampler:
    """Stateful wrapper pairing downs with ups through a padding stack.

    The diffusion U-Net pushes a padding record at every encoder
    downsample and pops it at the matching decoder upsample so odd
    feature-map shapes round-trip exactly.
    """

    def __init__(self, fir_kernel, buffer_padding=False):
        self.fir_kernel = tuple(fir_kernel)
        self._paddings = [] if buffer_padding else None

    def down(self, x):
        if self._paddings is None:
            return downsample_2d(x, self.fir_kernel)
        out, padding = downsample_2d(x, self.fir_kernel, return_padding=True)
        self._paddings.append(padding)
        return out

    def up(self, x):
        padding = self._paddings.pop() if self._paddings else None
        return upsample_2d(x, self.fir_kernel, padding)
