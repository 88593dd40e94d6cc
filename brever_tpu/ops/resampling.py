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
import os

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

def _fir_kernel_2d(fir_kernel):
    k = np.asarray(fir_kernel, dtype=np.float32)
    k2 = np.outer(k, k)
    return k2 / k2.sum()


def _depthwise_mode():
    """How the depthwise FIR conv is expressed.

    ``fold``: channels folded into the batch axis, plain C=1 conv —
    grouped convs lower terribly on XLA-CPU, but the fold costs a
    full-tensor transpose copy on each side of every resample.
    ``group``: native ``feature_group_count=C`` conv in the tensor's
    own NHWC layout — no copies; XLA-TPU lowers grouped convs
    directly.
    ``shift``: the FIR kernel is an outer product of one 1-D kernel
    (see ``_fir_kernel_2d``), so the resample factors into two 1-D
    passes of K strided-slice taps — pure elementwise multiply-adds
    XLA fuses into neighbors, with no conv patch tensor.  The round-4
    sgmse byte census attributed 64.5 GB/step of materialized pad:bf16
    (buffers like ``bf16[256,32,63,384,3]``) to the grouped-conv
    lowering of exactly these resamples.  Default: ``group`` on TPU,
    ``fold`` elsewhere.
    """
    mode = os.environ.get('BREVER_RESAMPLE_MODE')
    if mode in ('fold', 'group', 'shift'):
        return mode
    import jax
    return 'group' if jax.default_backend() != 'cpu' else 'fold'


def _fir_kernel_1d(fir_kernel):
    k = np.asarray(fir_kernel, dtype=np.float32)
    return k / k.sum()


def _shift_down1d(x, w, pad, axis):
    """1-D FIR + 2x decimation along ``axis`` via strided-slice taps:
    ``y[i] = sum_k w[k] * x_pad[2*i + k]``."""
    K = len(w)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (pad, pad)
    xp = jnp.pad(x, widths)
    n = xp.shape[axis]
    out_len = (n - K) // 2 + 1
    y = None
    for k in range(K):
        lo = [0] * x.ndim
        hi = list(xp.shape)
        st = [1] * x.ndim
        lo[axis] = k
        hi[axis] = k + 2 * (out_len - 1) + 1
        st[axis] = 2
        tap = lax.slice(xp, lo, hi, st) * jnp.asarray(w[k], x.dtype)
        y = tap if y is None else y + tap
    return y


def _shift_up1d(x, w, lo_pad, hi_pad, axis):
    """1-D fractionally-strided FIR along ``axis``: zero-stuff 2x,
    pad ``(lo_pad, hi_pad)``, then K unit-stride slice taps."""
    K = len(w)
    n = x.shape[axis]
    # zero-stuff: (..., n, ...) -> (..., 2n-1, ...)
    z = jnp.stack([x, jnp.zeros_like(x)], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    z = z.reshape(shape)
    z = lax.slice_in_dim(z, 0, 2 * n - 1, axis=axis)
    widths = [(0, 0)] * x.ndim
    widths[axis] = (lo_pad, hi_pad)
    zp = jnp.pad(z, widths)
    out_len = zp.shape[axis] - K + 1
    y = None
    for k in range(K):
        tap = lax.slice_in_dim(zp, k, k + out_len, axis=axis) \
            * jnp.asarray(w[k], x.dtype)
        y = tap if y is None else y + tap
    return y


def _depthwise_conv(x, kernel2d, *, strides, padding, lhs_dilation,
                    c_axis):
    """Depthwise conv with the same 2-D FIR kernel per channel."""
    if _depthwise_mode() == 'group':
        if c_axis == 1:  # NCHW
            dn = ('NCHW', 'HWIO', 'NCHW')
            c = x.shape[1]
        else:
            dn = ('NHWC', 'HWIO', 'NHWC')
            c = x.shape[3]
        kernel = jnp.broadcast_to(
            jnp.asarray(kernel2d, x.dtype)[:, :, None, None],
            kernel2d.shape + (1, c))
        return lax.conv_general_dilated(
            x, kernel, window_strides=strides, padding=padding,
            lhs_dilation=lhs_dilation, dimension_numbers=dn,
            feature_group_count=c), None
    folded, spec = _fold_channels(x, c_axis)
    kernel = jnp.asarray(kernel2d, x.dtype)[:, :, None, None]
    out = lax.conv_general_dilated(
        folded, kernel, window_strides=strides, padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out, spec


def _layout(data_format):
    if data_format == 'NCHW':
        return ('NCHW', 'HWIO', 'NCHW'), 1, (-2, -1)
    if data_format == 'NHWC':
        return ('NHWC', 'HWIO', 'NHWC'), 3, (1, 2)
    raise ValueError(f'unsupported data_format: {data_format}')


def _fold_channels(x, c_axis):
    """(N, ..., C, ...) -> (N*C, H, W, 1): grouped convs lower terribly
    on XLA-CPU, so depthwise = same-kernel-per-channel is done by
    folding channels into the batch axis (identical math, plain conv)."""
    if c_axis == 1:  # NCHW
        n, c, h, w = x.shape
        folded = x.reshape(n * c, h, w, 1)
    else:  # NHWC
        n, h, w, c = x.shape
        folded = jnp.moveaxis(x, -1, 1).reshape(n * c, h, w, 1)
    return folded, (x.shape, c_axis)


def _unfold_channels(y, spec):
    shape, c_axis = spec
    if c_axis == 1:
        n, c = shape[0], shape[1]
        out = y.reshape(n, c, y.shape[1], y.shape[2])
        return out
    n, c = shape[0], shape[3]
    out = y.reshape(n, c, y.shape[1], y.shape[2])
    return jnp.moveaxis(out, 1, -1)


def downsample_2d(x, fir_kernel, return_padding=False,
                  data_format='NCHW'):
    """Depthwise FIR low-pass + 2x decimation over the spatial axes."""
    dn, c_axis, spatial = _layout(data_format)
    kernel2d = _fir_kernel_2d(fir_kernel)
    ksize = kernel2d.shape[-1]
    dims = (x.shape[spatial[0]], x.shape[spatial[1]])
    padding = tuple(
        math.ceil(ksize / 2) - 1 if dim % 2 == 0
        else math.ceil((ksize + 1) / 2) - 1
        for dim in dims
    )
    if _depthwise_mode() == 'shift':
        w = _fir_kernel_1d(fir_kernel)
        out = _shift_down1d(x, w, padding[0], spatial[0] % x.ndim)
        out = _shift_down1d(out, w, padding[1], spatial[1] % x.ndim)
    else:
        out, spec = _depthwise_conv(
            x, kernel2d, strides=(2, 2),
            padding=[(p, p) for p in padding], lhs_dilation=None,
            c_axis=c_axis)
        if spec is not None:
            out = _unfold_channels(out, spec)
    if return_padding:
        output_padding = tuple(
            0 if (dim + 2 * p - ksize) % 2 == 0 else 1
            for dim, p in zip(dims, padding)
        )
        return out, (padding, output_padding)
    return out


def upsample_2d(x, fir_kernel, padding=None, data_format='NCHW'):
    """2x zero-stuffed upsampling + depthwise FIR interpolation.

    ``padding`` is an optional ``(padding, output_padding)`` pair produced
    by ``downsample_2d(..., return_padding=True)`` to restore odd shapes.
    """
    dn, c_axis, _ = _layout(data_format)
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
    if _depthwise_mode() == 'shift':
        _, _, spatial = _layout(data_format)
        w = _fir_kernel_1d(fir_kernel) * 2.0
        out = _shift_up1d(x, w, *conv_padding[0], axis=spatial[0] % x.ndim)
        out = _shift_up1d(out, w, *conv_padding[1], axis=spatial[1] % x.ndim)
        return out
    out, spec = _depthwise_conv(
        x, kernel2d, strides=(1, 1), padding=conv_padding,
        lhs_dilation=(2, 2), c_axis=c_axis)
    return _unfold_channels(out, spec) if spec is not None else out


class Resampler:
    """Stateful wrapper pairing downs with ups through a padding stack.

    The diffusion U-Net pushes a padding record at every encoder
    downsample and pops it at the matching decoder upsample so odd
    feature-map shapes round-trip exactly. The stack is trace-time
    Python state (shapes are static under jit).
    """

    def __init__(self, fir_kernel, buffer_padding=False,
                 data_format='NCHW'):
        self.fir_kernel = tuple(fir_kernel)
        self.data_format = data_format
        self._paddings = [] if buffer_padding else None

    def down(self, x):
        if self._paddings is None:
            return downsample_2d(x, self.fir_kernel,
                                 data_format=self.data_format)
        out, padding = downsample_2d(
            x, self.fir_kernel, return_padding=True,
            data_format=self.data_format)
        self._paddings.append(padding)
        return out

    def up(self, x):
        padding = self._paddings.pop() if self._paddings else None
        return upsample_2d(x, self.fir_kernel, padding,
                           data_format=self.data_format)

    def __call__(self, x, up_or_down):
        if up_or_down == 'down':
            return self.down(x)
        if up_or_down == 'up':
            return self.up(x)
        raise ValueError(
            f'up_or_down must be up or down, got {up_or_down}')
