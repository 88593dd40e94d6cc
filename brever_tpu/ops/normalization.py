"""Causal (cumulative-over-time) normalization ops.

Running statistics are cumulative sums along the time axis, so frame ``t``
is normalized using only frames ``<= t`` — the causality contract the
reference pins with a NaN-probe test (reference
brever/modules/normalization.py:5-72, tests/test_modules.py:185-218).

Pure functions over arrays; flax modules in the model zoo wrap these with
learned gain/bias parameters.
"""

import functools
import os

import jax
import jax.numpy as jnp


def causal_group_norm(x, num_groups, gain=None, bias=None, time_dim=-1,
                      eps=1e-10):
    """Cumulative group norm.

    Parameters
    ----------
    x : array
        Shape ``(batch, channels, ...)``.
    num_groups : int
        Number of channel groups; ``channels`` must be divisible by it.
    gain, bias : array or None
        Per-channel affine parameters of shape ``(channels,)``.
    time_dim : int
        The time axis (must not be the batch or channel axis).
    """
    time_dim = list(range(x.ndim))[time_dim]
    if time_dim in (0, 1):
        raise ValueError('time_dim cannot be the batch (0) or channel (1) '
                         'dimension')
    n_channels = x.shape[1]
    if n_channels % num_groups != 0:
        raise ValueError('num_channels must be divisible by num_groups')

    orig_shape = x.shape
    grouped = x.reshape(
        x.shape[0], num_groups, n_channels // num_groups, *x.shape[2:]
    )
    t_axis = time_dim + 1  # channel axis was split in two

    reduce_axes = tuple(
        i for i in range(grouped.ndim) if i not in (0, 1, t_axis)
    )
    # elements per time step within a group
    count_per_step = 1
    for i in reduce_axes:
        count_per_step *= grouped.shape[i]
    steps = jnp.arange(1, grouped.shape[t_axis] + 1, dtype=x.dtype)
    shape = [1] * grouped.ndim
    shape[t_axis] = grouped.shape[t_axis]
    count = (steps * count_per_step).reshape(shape)

    mean = jnp.cumsum(
        grouped.sum(axis=reduce_axes, keepdims=True), axis=t_axis
    ) / count
    var = jnp.cumsum(
        (grouped**2).sum(axis=reduce_axes, keepdims=True), axis=t_axis
    ) / count - mean**2
    normed = (grouped - mean) / jnp.sqrt(var + eps)
    normed = normed.reshape(orig_shape)

    if gain is not None:
        param_shape = [n_channels if i == 1 else 1 for i in range(x.ndim)]
        normed = normed * gain.reshape(param_shape)
        if bias is not None:
            normed = normed + bias.reshape(param_shape)
    return normed


def causal_layer_norm(x, gain=None, bias=None, time_dim=-1, eps=1e-10):
    """Cumulative layer norm (single group over all channels)."""
    return causal_group_norm(x, 1, gain, bias, time_dim, eps)


def causal_instance_norm(x, gain=None, bias=None, time_dim=-1, eps=1e-10):
    """Cumulative instance norm (one group per channel)."""
    return causal_group_norm(x, x.shape[1], gain, bias, time_dim, eps)


# ---------------------------------------------------------------------------
# fused GroupNorm(+SiLU) with a memory-lean custom VJP

def _silu_f32(z):
    s = jax.nn.sigmoid(z)
    return z * s


def _dsilu_f32(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


@functools.lru_cache(maxsize=None)
def _make_gn_silu(num_groups, eps, apply_silu, has_ext):
    """Build the custom-VJP GroupNorm(+SiLU) for a static config.

    Why a custom VJP: under plain autodiff the SiLU saves its input —
    the full pre-activation tensor — purely so the backward can reread
    it. On byte-bound models (the diffusion U-Net runs 2 GroupNorm+SiLU
    pairs per block at up to (B, 256, T, 128)) that stash is an extra
    full-tensor HBM write in the forward and read in the backward. The
    residuals here are only ``(x, mean, rstd)`` (+ the tiny affine
    terms); the backward recomputes the normalized tensor and the SiLU
    derivative from ``x`` on the fly, fused by XLA into the reduction
    passes it must run anyway. Statistics in f32 like ``nn.GroupNorm``
    (fast-variance form: var = E[x^2] - E[x]^2).
    """

    def _stats(x32, shape3):
        b, n, c = shape3
        xg = x32.reshape(b, n, num_groups, c // num_groups)
        mean = xg.mean(axis=(1, 3))                       # (B, G)
        var = (xg * xg).mean(axis=(1, 3)) - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        reps = c // num_groups
        return (jnp.repeat(mean, reps, axis=-1),          # (B, C)
                jnp.repeat(rstd, reps, axis=-1))

    def _apply(x32, mean_c, rstd_c, scale, bias, ext_scale, ext_shift):
        xhat = (x32 - mean_c[:, None, :]) * rstd_c[:, None, :]
        z = xhat * scale + bias
        if has_ext:
            z = z * ext_scale[:, None, :] + ext_shift[:, None, :]
        return xhat, z

    @jax.custom_vjp
    def f(x, scale, bias, ext_scale, ext_shift):
        b, n, c = x.shape
        x32 = x.astype(jnp.float32)
        mean_c, rstd_c = _stats(x32, (b, n, c))
        _, z = _apply(x32, mean_c, rstd_c,
                      scale.astype(jnp.float32), bias.astype(jnp.float32),
                      None if not has_ext else ext_scale.astype(jnp.float32),
                      None if not has_ext else ext_shift.astype(jnp.float32))
        y = _silu_f32(z) if apply_silu else z
        return y.astype(jnp.result_type(x, scale))

    def fwd(x, scale, bias, ext_scale, ext_shift):
        b, n, c = x.shape
        x32 = x.astype(jnp.float32)
        mean_c, rstd_c = _stats(x32, (b, n, c))
        _, z = _apply(x32, mean_c, rstd_c,
                      scale.astype(jnp.float32), bias.astype(jnp.float32),
                      None if not has_ext else ext_scale.astype(jnp.float32),
                      None if not has_ext else ext_shift.astype(jnp.float32))
        y = _silu_f32(z) if apply_silu else z
        y = y.astype(jnp.result_type(x, scale))
        # residuals: the input and O(B*C) statistics — no (B, N, C)
        # pre-activation stash
        return y, (x, mean_c, rstd_c, scale, bias, ext_scale, ext_shift)

    def bwd(res, dy):
        x, mean_c, rstd_c, scale, bias, ext_scale, ext_shift = res
        b, n, c = x.shape
        x32 = x.astype(jnp.float32)
        dy32 = dy.astype(jnp.float32)
        scale32 = scale.astype(jnp.float32)
        ext_scale32 = ext_scale.astype(jnp.float32) if has_ext else None
        ext_shift32 = ext_shift.astype(jnp.float32) if has_ext else None
        xhat, z = _apply(x32, mean_c, rstd_c, scale32,
                         bias.astype(jnp.float32),
                         ext_scale32, ext_shift32)
        dz = dy32 * _dsilu_f32(z) if apply_silu else dy32
        if has_ext:
            z0 = xhat * scale32 + bias.astype(jnp.float32)
            d_ext_scale = (dz * z0).sum(axis=1).astype(ext_scale.dtype)
            d_ext_shift = dz.sum(axis=1).astype(ext_shift.dtype)
            dz0 = dz * ext_scale32[:, None, :]
        else:
            d_ext_scale = jnp.zeros_like(ext_scale)
            d_ext_shift = jnp.zeros_like(ext_shift)
            dz0 = dz
        d_scale = (dz0 * xhat).sum(axis=(0, 1)).astype(scale.dtype)
        d_bias = dz0.sum(axis=(0, 1)).astype(bias.dtype)
        dxhat = dz0 * scale32
        # per-group means of dxhat and dxhat*xhat
        reps = c // num_groups

        def gmean(t):
            tg = t.reshape(b, n, num_groups, reps).mean(axis=(1, 3))
            return jnp.repeat(tg, reps, axis=-1)[:, None, :]

        dx = rstd_c[:, None, :] * (
            dxhat - gmean(dxhat) - xhat * gmean(dxhat * xhat))
        return (dx.astype(x.dtype), d_scale, d_bias,
                d_ext_scale, d_ext_shift)

    f.defvjp(fwd, bwd)
    return f


def group_norm_silu(x, scale, bias, num_groups, eps=1e-6,
                    ext_scale=None, ext_shift=None, apply_silu=True):
    """GroupNorm -> optional per-(batch, channel) affine -> SiLU, with a
    memory-lean custom VJP (residuals: input + O(B*C) statistics).

    ``x``: (B, *spatial, C); ``scale``/``bias``: (C,) learned affine;
    ``ext_scale``/``ext_shift``: optional (B, C) conditioning terms
    (ADM-style ``(s + 1) * GN(x) + t``), both given or both None.
    Matches ``nn.GroupNorm`` statistics (f32, fast-variance) followed by
    ``nn.silu``; reference for the consumer: brever/models/sgmse/net.py.
    """
    if (ext_scale is None) != (ext_shift is None):
        raise ValueError('ext_scale and ext_shift must be given together')
    shape = x.shape
    b, c = shape[0], shape[-1]
    if c % num_groups:
        raise ValueError(f'channels {c} not divisible by {num_groups} groups')
    has_ext = ext_scale is not None
    x3 = x.reshape(b, -1, c)
    # flash-GN: both directions as Pallas kernels (HBM traffic = the
    # tensors themselves; the jnp custom VJP still materializes shared
    # f32 intermediates — 102 GB/step of sgmsepm's HLO census).
    # BREVER_GN_PALLAS: '0' forces the jnp path, '1' forces the kernel
    # (interpreter off-TPU via the module's FORCE_INTERPRET test hook).
    from .pallas.groupnorm import gn_pallas_available, gn_silu_pallas
    flag = os.environ.get('BREVER_GN_PALLAS', 'auto')
    use_pallas = (not has_ext and c % 128 == 0
                  and jnp.issubdtype(x.dtype, jnp.floating)
                  and (gn_pallas_available() if flag == 'auto'
                       else flag == '1'))
    if use_pallas and os.environ.get('BREVER_FUSED_GN', '1') == '1':
        # rank-4 inputs go to the kernel unreshaped: it blocks over the
        # second axis, so no (b, f*t, c) merge — when the frame axis is
        # not sublane-aligned that merge is a physical retiling copy
        # around EVERY kernel call (measured 37.9 ms/step of copies in
        # the round-5 sgmsepm per-op profile)
        xk = x if x.ndim == 4 else x3
        return gn_silu_pallas(
            xk, scale, bias, num_groups, eps, apply_silu).reshape(shape)
    f = _make_gn_silu(num_groups, float(eps), bool(apply_silu), has_ext)
    # BREVER_FUSED_GN=0: A/B hook — same f32 math through plain
    # autodiff (the SiLU/affine stash the custom VJP exists to avoid),
    # so the memory-lean backward can be isolated on hardware.
    if os.environ.get('BREVER_FUSED_GN', '1') != '1':
        f = f.__wrapped__
    if has_ext:
        ext_scale = ext_scale.reshape(b, c)
        ext_shift = ext_shift.reshape(b, c)
    else:
        # static dummies; their grads are discarded by custom_vjp
        ext_scale = ext_shift = jnp.zeros((b, c), x.dtype)
    return f(x3, scale, bias, ext_scale, ext_shift).reshape(shape)
