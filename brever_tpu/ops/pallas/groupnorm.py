"""Fused GroupNorm(+SiLU) as a streaming Pallas TPU kernel (flash-GN).

Accelerator for :func:`brever_tpu.ops.normalization.group_norm_silu`
(consumers: the diffusion U-Net's ~60 GroupNorm+SiLU pairs, reference
brever/models/sgmse/net.py).  The jnp custom-VJP twin already avoids
the SiLU pre-activation stash, but XLA still materializes the shared
f32 intermediates: the round-4 HLO census of one sgmsepm train step
attributed **102 GB of the 165 GB of HBM writes** to `norm_*` scopes —
full ``f32[4, 256, 501, 384]`` buffers for ``xhat``/``dxhat``, each
consumed by two reductions plus the elementwise pass, so XLA cannot
fuse them away (multi-consumer intermediates are materialized).

The kernel streams ``(chunk, C)`` blocks through VMEM with a two-phase
grid per batch row — phase 0 accumulates per-channel sums, phase 1
applies the folded affine — so HBM traffic is exactly the tensors
themselves at their own dtype:

  forward:  read x twice, write y once            (3 bf16 passes)
  backward: read x+dy twice, write dx once        (5 bf16 passes)

versus the observed ~6-10 f32-equivalent passes under XLA.  All
arithmetic is f32 inside VMEM (statistics match ``nn.GroupNorm``'s
fast-variance form); per-group reductions/broadcasts are expressed as
tiny segment matmuls (``(1, C) @ (C, G)``) so no lane-dim reshapes are
needed.  Parameter gradients accumulate in f32 across the sequential
batch grid into a revisited output block (same pattern as the flash-TCN
``dW`` accumulation).

Supports the ``has_ext=False`` configurations (the NCSN default used by
every registered sgmse arch); the ADM external-affine path falls back
to the jnp twin.

Known toolchain hazard (round-5 bisect, PERF.md): the BACKWARD kernel
hangs Mosaic compilation (>600 s, reproducible) at some block
geometries — observed at ``(n=3984, c=1920, f32)`` and
``(n=3984, c=960, bf16)`` while immediate neighbors (``c<=1536`` f32,
``n=16000 c=960`` bf16) compile in ~1 s.  Every geometry the
registered sgmse configs produce is compile-proven on hardware; the
flash-BN consumer (``models/common.batch_norm_act``) is gated OFF by
default because MANNER's geometry set hits the hazard.  If an unusual
clip length ever hangs an sgmse compile, set ``BREVER_GN_PALLAS=0``
(jnp custom-VJP twin, same numerics) and report the geometry.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False

#: scoped VMEM ceiling (v5e cores have 128 MB physical)
_VMEM_LIMIT = 64 * 1024 * 1024

#: target byte size of one streamed (chunk, C) block
_CHUNK_BYTES = 1024 * 1024

# test hook: route through the Pallas interpreter on CPU
FORCE_INTERPRET = False


def gn_pallas_available():
    if FORCE_INTERPRET:
        return _PALLAS_OK
    return _PALLAS_OK and jax.default_backend() in ('tpu',)


def _pick_chunk(n_rows, n_chan, itemsize):
    chunk = _CHUNK_BYTES // (n_chan * itemsize)
    chunk = max(8, min(-(-n_rows // 8) * 8, -(-chunk // 8) * 8))
    return chunk


def _segments(n_chan, n_groups):
    """(C, G) 0/1 segment matrix: column g marks the channels of group
    g.  ``sums @ seg`` reduces channels to groups; ``stats @ seg.T``
    broadcasts groups back to channels.

    When ``n_groups == n_chan`` (the flash-BN case) both maps are the
    identity; callers pass a (1, 1) placeholder instead — a C x C
    identity is O(C^2) VMEM (14.7 MB at MANNER's C=1920, which
    overflowed the 64 MB scoped limit on hardware)."""
    reps = n_chan // n_groups
    return np.kron(np.eye(n_groups, dtype=np.float32),
                   np.ones((reps, 1), np.float32))


def _to_groups(v, seg, identity):
    if identity:
        return v
    return jnp.dot(v, seg, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _to_channels(g, seg, identity):
    if identity:
        return g
    return jnp.dot(g, seg.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _row_mask(j, chunk, n_rows, xdim):
    shape = (chunk,) + (1,) * (xdim - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (j * chunk + rows) < n_rows


def _silu(z):
    return z * jax.nn.sigmoid(z)


def _dsilu(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _apply_act(z, act):
    if act == 'silu':
        return _silu(z)
    if act == 'relu':
        return jnp.maximum(z, 0.0)
    return z


# ---------------------------------------------------------------------------
# forward

def _fwd_kernel(x_ref, scale_ref, bias_ref, seg_ref,
                y_ref, mean_ref, rstd_ref,
                ssum, ssq, aff_a, aff_b,
                *, n_rows, inv_n, eps, act, chunk, identity):
    p, j = pl.program_id(1), pl.program_id(2)

    @pl.when((p == 0) & (j == 0))
    def _():
        ssum[...] = jnp.zeros_like(ssum)
        ssq[...] = jnp.zeros_like(ssq)

    x = x_ref[0].astype(jnp.float32)
    red = tuple(range(x.ndim - 1))

    @pl.when(p == 0)
    def _():
        xm = jnp.where(_row_mask(j, chunk, n_rows, x.ndim), x, 0.0)
        ssum[...] += jnp.sum(xm, axis=red).reshape(ssum.shape)
        ssq[...] += jnp.sum(xm * xm, axis=red).reshape(ssq.shape)

    @pl.when((p == 1) & (j == 0))
    def _():
        seg = seg_ref[...]
        gsum = _to_groups(ssum[...], seg, identity)
        gsq = _to_groups(ssq[...], seg, identity)
        mean_g = gsum * inv_n
        var_g = gsq * inv_n - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_ref[0] = mean_g
        rstd_ref[0] = rstd_g
        # broadcast to channels and fold the learned affine:
        # z = xhat*scale + bias = x*a + b
        mean_c = _to_channels(mean_g, seg, identity)
        rstd_c = _to_channels(rstd_g, seg, identity)
        a = scale_ref[...].astype(jnp.float32) * rstd_c
        aff_a[...] = a
        aff_b[...] = bias_ref[...].astype(jnp.float32) - mean_c * a

    @pl.when(p == 1)
    def _():
        z = x * aff_a[...] + aff_b[...]
        y_ref[0] = _apply_act(z, act).astype(y_ref.dtype)


def _plan(x):
    """Blocking plan shared by both directions.

    Rank 3 ``(b, n, c)``: stream ``(1, chunk, c)`` row blocks.
    Rank 4 ``(b, f, t, c)``: stream ``(1, fchunk, t, c)`` whole-plane
    blocks over the f axis — NO ``(b, f*t, c)`` reshape.  When t is not
    sublane-aligned (t % 8 != 0, e.g. the U-Net's 501/251 frames) that
    reshape is a physical retiling copy that XLA materializes around
    every kernel invocation (fwd x + y, bwd x + dy + dx — the round-5
    sgmsepm per-op profile measured 37.9 ms/step of such copies).
    """
    c = x.shape[-1]
    if x.ndim == 4:
        b, f, t, _ = x.shape
        n = f * t
        chunk = max(1, _CHUNK_BYTES // (t * c * x.dtype.itemsize))
        chunk = min(chunk, f)
        blk = (1, chunk, t, c)
        idx = lambda i, p, j: (i, j, 0, 0)  # noqa: E731
        n_rows = f
    else:
        b, n, c = x.shape
        chunk = _pick_chunk(n, c, x.dtype.itemsize)
        blk = (1, chunk, c)
        idx = lambda i, p, j: (i, j, 0)  # noqa: E731
        n_rows = n
    nb = -(-n_rows // chunk)
    return b, n, c, chunk, blk, idx, n_rows, nb


def _fwd_pallas(x, scale, bias, num_groups, eps, act, interpret):
    out_dt = jnp.result_type(x, scale)
    b, n, c, chunk, blk, idx, n_rows, nb = _plan(x)
    identity = num_groups == c
    seg = jnp.zeros((1, 1), jnp.float32) if identity \
        else jnp.asarray(_segments(c, num_groups))
    inv_n = 1.0 / (n * (c // num_groups))

    kernel = functools.partial(
        _fwd_kernel, n_rows=n_rows, inv_n=inv_n, eps=eps,
        act=act, chunk=chunk, identity=identity)
    y, mean_g, rstd_g = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, out_dt),
            # stats are (b, 1, G) so each block spans the last two dims
            # exactly (Mosaic requires lane/sublane-aligned or full)
            jax.ShapeDtypeStruct((b, 1, num_groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, num_groups), jnp.float32),
        ),
        grid=(b, 2, nb),
        in_specs=[
            pl.BlockSpec(blk, idx),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec(seg.shape, lambda i, p, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(blk, idx),
            pl.BlockSpec((1, 1, num_groups), lambda i, p, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, num_groups), lambda i, p, j: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * c,
            bytes_accessed=b * n * c
            * (2 * x.dtype.itemsize + out_dt.itemsize),
            transcendentals=b * n * c if act == 'silu' else 0,
        ),
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c), seg)
    return y, mean_g, rstd_g


# ---------------------------------------------------------------------------
# backward

def _bwd_kernel(x_ref, dy_ref, scale_ref, bias_ref, seg_ref,
                mean_ref, rstd_ref,
                dx_ref, dscale_ref, dbias_ref,
                s_dz, s_dzx, aff_a, aff_b, mean_c, rstd_c, m1, m2,
                *, n_rows, inv_n, act, chunk, identity):
    i, p, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((i == 0) & (p == 0) & (j == 0))
    def _():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    @pl.when((p == 0) & (j == 0))
    def _():
        seg = seg_ref[...]
        mc = _to_channels(mean_ref[0], seg, identity)
        rc = _to_channels(rstd_ref[0], seg, identity)
        mean_c[...] = mc
        rstd_c[...] = rc
        a = scale_ref[...].astype(jnp.float32) * rc
        aff_a[...] = a
        aff_b[...] = bias_ref[...].astype(jnp.float32) - mc * a
        s_dz[...] = jnp.zeros_like(s_dz)
        s_dzx[...] = jnp.zeros_like(s_dzx)

    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    red = tuple(range(x.ndim - 1))
    if act == 'silu':
        z = x * aff_a[...] + aff_b[...]
        dz = dy * _dsilu(z)
    elif act == 'relu':
        z = x * aff_a[...] + aff_b[...]
        dz = jnp.where(z > 0.0, dy, 0.0)
    else:
        dz = dy
    xhat = (x - mean_c[...]) * rstd_c[...]

    @pl.when(p == 0)
    def _():
        mask = _row_mask(j, chunk, n_rows, x.ndim)
        dzm = jnp.where(mask, dz, 0.0)
        s_dz[...] += jnp.sum(dzm, axis=red).reshape(s_dz.shape)
        s_dzx[...] += jnp.sum(jnp.where(mask, dz * xhat, 0.0),
                              axis=red).reshape(s_dzx.shape)

    @pl.when((p == 1) & (j == 0))
    def _():
        seg = seg_ref[...]
        dscale_ref[...] += s_dzx[...]
        dbias_ref[...] += s_dz[...]
        scale32 = scale_ref[...].astype(jnp.float32)
        m1[...] = _to_channels(
            _to_groups(s_dz[...] * scale32, seg, identity) * inv_n,
            seg, identity)
        m2[...] = _to_channels(
            _to_groups(s_dzx[...] * scale32, seg, identity) * inv_n,
            seg, identity)

    @pl.when(p == 1)
    def _():
        scale32 = scale_ref[...].astype(jnp.float32)
        dx = rstd_c[...] * (dz * scale32 - m1[...] - xhat * m2[...])
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd_pallas(x, dy, scale, bias, mean_g, rstd_g,
                num_groups, act, interpret):
    b, n, c, chunk, blk, idx, n_rows, nb = _plan(x)
    identity = num_groups == c
    seg = jnp.zeros((1, 1), jnp.float32) if identity \
        else jnp.asarray(_segments(c, num_groups))
    inv_n = 1.0 / (n * (c // num_groups))

    kernel = functools.partial(
        _bwd_kernel, n_rows=n_rows, inv_n=inv_n,
        act=act, chunk=chunk, identity=identity)
    dx, dscale, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=(b, 2, nb),
        in_specs=[
            pl.BlockSpec(blk, idx),
            pl.BlockSpec(blk, idx),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec(seg.shape, lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, 1, num_groups), lambda i, p, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, num_groups), lambda i, p, j: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(blk, idx),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, p, j: (0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)
                        for _ in range(8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary'),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=20 * b * n * c,
            bytes_accessed=b * n * c * 5 * x.dtype.itemsize,
            transcendentals=2 * b * n * c if act == 'silu' else 0,
        ),
        interpret=interpret,
    )(x, dy, scale.reshape(1, c), bias.reshape(1, c), seg,
      mean_g, rstd_g)
    return dx, dscale.reshape(c), dbias.reshape(c)


# ---------------------------------------------------------------------------
# custom-VJP wrapper

@functools.lru_cache(maxsize=None)
def _make_gn_act_pallas(num_groups, eps, act, interpret, with_stats):
    """custom_vjp GroupNorm(+activation) running both directions as
    Pallas kernels.  ``with_stats=True`` additionally returns the
    per-group (mean, rstd) f32 stats — consumers treat them as
    stop-gradient (their cotangents are ignored), which is exactly the
    running-average update of a BatchNorm layer."""

    @jax.custom_vjp
    def f(x, scale, bias):
        y, mean_g, rstd_g = _fwd_pallas(
            x, scale, bias, num_groups, eps, act, interpret)
        return (y, mean_g, rstd_g) if with_stats else y

    def fwd(x, scale, bias):
        y, mean_g, rstd_g = _fwd_pallas(
            x, scale, bias, num_groups, eps, act, interpret)
        out = (y, mean_g, rstd_g) if with_stats else y
        return out, (x, scale, bias, mean_g, rstd_g)

    def bwd(res, ct):
        x, scale, bias, mean_g, rstd_g = res
        dy = ct[0] if with_stats else ct
        dx, dscale, dbias = _bwd_pallas(
            x, dy, scale, bias, mean_g, rstd_g,
            num_groups, act, interpret)
        return dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype)

    f.defvjp(fwd, bwd)
    return f


def gn_silu_pallas(x3, scale, bias, num_groups, eps, apply_silu):
    """(B, N, C) GroupNorm(+SiLU) through the Pallas kernels."""
    f = _make_gn_act_pallas(
        int(num_groups), float(eps), 'silu' if apply_silu else 'none',
        bool(FORCE_INTERPRET), False)
    return f(x3, scale, bias)


def gn_act_stats_pallas(x3, scale, bias, num_groups, eps, act):
    """(B, N, C) GroupNorm(+activation) -> (y, mean_g, rstd_g).

    The stats are the per-(batch-row, group) f32 batch statistics in
    the fast-variance form (``var = 1/rstd**2 - eps``); gradients do
    NOT flow through them (BatchNorm running-average semantics)."""
    f = _make_gn_act_pallas(
        int(num_groups), float(eps), str(act),
        bool(FORCE_INTERPRET), True)
    return f(x3, scale, bias)
