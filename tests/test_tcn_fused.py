"""Fused (flash-TCN) Conv-TasNet block parity — kernel vs jnp twin,
and the full model integration through the Pallas interpreter.

The fused kernel (ops/pallas/tcn_block.py) engages automatically on
TPU under bf16 amp; these tests pin its numerics on CPU via
``interpret=True`` so CI catches drift without TPU hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brever_tpu.ops.pallas.tcn_block as tcn
from brever_tpu.models import ModelRegistry


def _params(rng, c, h, cs):
    def arr(*s):
        return jnp.asarray(rng.randn(*s).astype('float32') * 0.1)
    return (arr(c, h), arr(h), jnp.asarray([0.25]), arr(h), arr(h),
            arr(3, h), arr(h), jnp.asarray([0.25]), arr(h), arr(h),
            arr(h, c), arr(c), arr(h, cs), arr(cs))


@pytest.mark.parametrize('dilation', [1, 4, 64, 250, 600])
@pytest.mark.parametrize('t_total', [512, 520])
def test_fused_forward_matches_reference(dilation, t_total):
    """d=250 exercises a boundary region spanning multiple chunks
    (d ~ tile), d=600 the d >= T regime where every row's outer taps
    read the zero padding (short clips reach this in production: the
    dilation sweep tops out at 128 but MAX_FUSED_T gating admits any
    T, so keep the correction algebra pinned in the extremes)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, t_total, 128).astype('float32'))
    params = _params(rng, 128, 256, 128)
    ref_res, ref_skip = tcn.tcn_block_reference(x, params, dilation,
                                                False)
    res, skip = tcn.tcn_block_fused(x, params, dilation, False,
                                    tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(res), np.asarray(ref_res),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(skip), np.asarray(ref_skip),
                               atol=2e-5, rtol=1e-4)


def test_fused_last_block():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 256, 128).astype('float32'))
    params = _params(rng, 128, 256, 128)
    _, ref_skip = tcn.tcn_block_reference(x, params, 2, True)
    res, skip = tcn.tcn_block_fused(x, params, 2, True, tile=128,
                                    interpret=True)
    assert res is None
    np.testing.assert_allclose(np.asarray(skip), np.asarray(ref_skip),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('last', [False, True])
@pytest.mark.parametrize('dilation', [1, 2, 4, 8, 96, 250])
def test_fused_gradients_match_reference(dilation, last):
    """custom_vjp backward must agree with differentiating the jnp
    twin directly (same math; fused fwd feeds the same cotangents).
    d=1/2/4 exercise the recompute backward variant (or the scratch
    variant under BREVER_TCN_BWD_SCRATCH_ALL=1 — every production
    dilation is covered either way), d=8 the scratch-row variant (the
    production path for 8-aligned dilations); last=True pins the final
    block's skip-only gradient path.  d=96 (scratch) spans multiple
    chunks with its boundary region (d > tile=64); d=250 (recompute)
    is the d >= T regime where the outer taps read only zero
    padding."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 192, 64).astype('float32'))
    params = _params(rng, 64, 96, 64)

    def loss_fused(x, params):
        res, skip = tcn.tcn_block_fused(x, params, dilation, last,
                                        tile=64, interpret=True)
        loss = (skip ** 2).sum()
        return loss if last else loss + (res ** 2).mean()

    def loss_ref(x, params):
        res, skip = tcn.tcn_block_reference(x, params, dilation, last)
        loss = (skip ** 2).sum()
        return loss if last else loss + (res ** 2).mean()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=1e-4, rtol=1e-3)
    for a, b in zip(gp_f, gp_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_convtasnet_fused_model_parity(monkeypatch):
    """Full Conv-TasNet forward: bf16 fused (interpreter) vs bf16
    unfused must agree to bf16 tolerance; parameter tree identical."""
    model = ModelRegistry.get('convtasnet')(
        filters=64, filter_length=16, bottleneck_channels=32,
        hidden_channels=64, skip_channels=32, layers=2, repeats=2)
    variables = model.init_variables(jax.random.PRNGKey(0))
    bf = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v,
        variables['params'])
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 4000).astype('float32')
    ).astype(jnp.bfloat16)

    out_unfused = model.module.apply({'params': bf}, x)

    monkeypatch.setattr(tcn, 'FORCE_INTERPRET', True)
    out_fused = model.module.apply({'params': bf}, x)

    np.testing.assert_allclose(
        np.asarray(out_fused, dtype=np.float32),
        np.asarray(out_unfused, dtype=np.float32),
        atol=0.05, rtol=0.05)


def test_convtasnet_fused_param_tree_unchanged(monkeypatch):
    """Init under the fused gate must produce the exact same parameter
    tree as the unfused path (checkpoint compatibility)."""
    from flax.traverse_util import flatten_dict

    model = ModelRegistry.get('convtasnet')(
        filters=64, filter_length=16, bottleneck_channels=32,
        hidden_channels=64, skip_channels=32, layers=2, repeats=2)
    ref = model.init_variables(jax.random.PRNGKey(0))

    monkeypatch.setattr(tcn, 'FORCE_INTERPRET', True)
    # init traces with f32 (fused gate requires bf16) but apply with a
    # bf16 tree exercises the fused branch; tree must match regardless
    fused_vars = model.init_variables(jax.random.PRNGKey(0))
    keys_ref = set(flatten_dict(ref['params']).keys())
    keys_fused = set(flatten_dict(fused_vars['params']).keys())
    assert keys_ref == keys_fused


@pytest.mark.parametrize('dilation', [4, 8])
def test_fused_gradients_bf16_parity(dilation):
    """Amp-dtype gradients: dW_in multiplies at x's dtype (bf16 under
    amp, f32 accumulator) — pin fused-vs-twin agreement with bf16
    inputs for both backward variants (d=4 recompute, d=8 scratch).
    The f32 tests above are blind to regressions in this path."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 192, 64).astype('float32')) \
        .astype(jnp.bfloat16)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16), _params(rng, 64, 96, 64))

    def loss_fused(x, params):
        res, skip = tcn.tcn_block_fused(x, params, dilation, False,
                                        tile=64, interpret=True)
        return (res.astype(jnp.float32) ** 2).mean() \
            + (skip.astype(jnp.float32) ** 2).sum()

    def loss_ref(x, params):
        res, skip = tcn.tcn_block_reference(x, params, dilation, False)
        return (res.astype(jnp.float32) ** 2).mean() \
            + (skip.astype(jnp.float32) ** 2).sum()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(
        np.asarray(gx_f, dtype=np.float32),
        np.asarray(gx_r, dtype=np.float32), rtol=5e-2, atol=5e-2)
    for a, b in zip(gp_f, gp_r):
        a32 = np.asarray(a, dtype=np.float32)
        b32 = np.asarray(b, dtype=np.float32)
        assert np.isfinite(a32).all()
        if a32.size == 1:
            # PReLU alpha grads: a heavily-cancelling scalar sum of
            # ~18k bf16-rounded products — the kernel (f32
            # intermediates) and the bf16 twin legitimately diverge
            # beyond any tight bound; pin order of magnitude only
            assert abs(float(a32) - float(b32)) \
                <= 0.2 * max(1.0, abs(float(b32)))
            continue
        np.testing.assert_allclose(a32, b32, rtol=5e-2,
                                   atol=5e-2 * max(1.0, np.abs(b32).max()))
