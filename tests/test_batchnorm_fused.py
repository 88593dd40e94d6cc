"""Parity of the fused BatchNorm(+activation) path (flash-BN) against
the flax ``nn.BatchNorm`` + activation composite it replaces in MANNER.

flash-BN views the (..., C) tensor as one GroupNorm row (1, prod, C)
with num_groups=C and routes through the flash-GN Pallas kernel
(interpreter mode here), so the load-bearing checks are:

* forward + all gradients == nn.BatchNorm composite, per activation;
* the running-average update sees the same batch statistics;
* the packed variant's phase-pair groups reproduce the per-logical-
  channel statistics of the unfused ``packed_batch_norm``;
* parameter/batch_stats trees are byte-compatible with the
  ``batch_norm`` wrapper (checkpoint interchange).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brever_tpu.models.common as common
from brever_tpu.models.common import batch_norm, batch_norm_act

B, T, C = 3, 50, 60  # deliberately NOT lane-aligned (manner's hidden)
EPS = 1e-5
MOM = 0.99


@pytest.fixture
def _pallas_interpret(monkeypatch):
    import brever_tpu.ops.pallas.groupnorm as gnp
    monkeypatch.setattr(gnp, 'FORCE_INTERPRET', True)
    monkeypatch.setattr(gnp, '_CHUNK_BYTES', 8 * 1024)  # masked tails
    monkeypatch.setattr(common, '_FUSED_BN_MIN_BYTES', 0)
    monkeypatch.setenv('BREVER_BN_FUSED', '1')  # default-off since r5d
    return gnp


def _data():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(B, T, C).astype('float32'))


class _Fused(nn.Module):
    act: str

    @nn.compact
    def __call__(self, x, train):
        return batch_norm_act(x, train, 'bn', act=self.act,
                              momentum=MOM, epsilon=EPS)


class _Composite(nn.Module):
    act: str

    @nn.compact
    def __call__(self, x, train):
        y = batch_norm(x, train, 'bn', momentum=MOM, epsilon=EPS)
        if self.act == 'relu':
            y = nn.relu(y)
        elif self.act == 'silu':
            y = y * jax.nn.sigmoid(y)
        return y


@pytest.mark.parametrize('act', ['none', 'relu', 'silu'])
def test_fused_bn_matches_flax_composite(_pallas_interpret, act):
    x = _data()
    fused, comp = _Fused(act), _Composite(act)
    v_f = fused.init(jax.random.PRNGKey(0), x, train=False)
    v_c = comp.init(jax.random.PRNGKey(0), x, train=False)
    # same variable trees (checkpoint interchange)
    assert jax.tree_util.tree_structure(v_f) \
        == jax.tree_util.tree_structure(v_c)

    # non-trivial affine
    scale = jnp.asarray(np.random.RandomState(1).rand(C) + 0.5,
                        jnp.float32)
    bias = jnp.asarray(np.random.RandomState(2).randn(C) * 0.3,
                       jnp.float32)
    for v in (v_f, v_c):
        v['params']['bn']['scale'] = scale
        v['params']['bn']['bias'] = bias

    y_f, upd_f = fused.apply(v_f, x, train=True,
                             mutable=['batch_stats'])
    y_c, upd_c = comp.apply(v_c, x, train=True, mutable=['batch_stats'])
    np.testing.assert_allclose(y_f, y_c, rtol=3e-5, atol=3e-6)
    for key in ('mean', 'var'):
        np.testing.assert_allclose(
            upd_f['batch_stats']['bn'][key],
            upd_c['batch_stats']['bn'][key], rtol=3e-5, atol=1e-7,
            err_msg=f'running {key}')

    # eval path uses the (updated) running stats
    v_f2 = {'params': v_f['params'], **upd_f}
    v_c2 = {'params': v_c['params'], **upd_c}
    ye_f = fused.apply(v_f2, x, train=False)
    ye_c = comp.apply(v_c2, x, train=False)
    np.testing.assert_allclose(ye_f, ye_c, rtol=3e-5, atol=3e-6)

    # gradients w.r.t. input and affine params
    w = jnp.asarray(np.random.RandomState(3).randn(B, T, C), jnp.float32)

    def loss(module, variables, x):
        y, _ = module.apply(variables, x, train=True,
                            mutable=['batch_stats'])
        return (y * w).sum()

    g_f = jax.grad(lambda p, x: loss(
        fused, {**v_f, 'params': p}, x), argnums=(0, 1))(
        v_f['params'], x)
    g_c = jax.grad(lambda p, x: loss(
        comp, {**v_c, 'params': p}, x), argnums=(0, 1))(
        v_c['params'], x)
    np.testing.assert_allclose(g_f[1], g_c[1], rtol=3e-4, atol=3e-5,
                               err_msg=f'{act} grad x')
    for key in ('scale', 'bias'):
        np.testing.assert_allclose(
            g_f[0]['bn'][key], g_c[0]['bn'][key], rtol=3e-4, atol=3e-5,
            err_msg=f'{act} grad {key}')


def test_fused_bn_bf16_trunk(_pallas_interpret):
    x = _data().astype(jnp.bfloat16)
    fused, comp = _Fused('relu'), _Composite('relu')
    v = fused.init(jax.random.PRNGKey(0), x, train=False)
    y_f, _ = fused.apply(v, x, train=True, mutable=['batch_stats'])
    y_c, _ = comp.apply(v, x, train=True, mutable=['batch_stats'])
    assert y_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_f, np.float32), np.asarray(y_c, np.float32),
        rtol=0.1, atol=0.02)


def test_wide_channels_fall_back_to_xla(_pallas_interpret, monkeypatch):
    """C above _FUSED_BN_MAX_C must NOT route through the kernel even
    when opted in: the flash-GN backward hangs Mosaic at C=1920 on v5e
    (round-5 bisect, PERF.md) — the cap is the shipped guard."""
    import brever_tpu.ops.pallas.groupnorm as gnp

    def boom(*a, **k):
        raise AssertionError('kernel must not be called above the cap')

    monkeypatch.setattr(gnp, 'gn_act_stats_pallas', boom)
    monkeypatch.setattr(common, '_FUSED_BN_MAX_C', 32)
    x = _data()  # C=60 > patched cap of 32
    fused = _Fused('relu')
    v = fused.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = fused.apply(v, x, train=True, mutable=['batch_stats'])
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize('act', ['none', 'silu'])
def test_packed_bn_kernel_matches_fallback(_pallas_interpret, act,
                                           monkeypatch):
    """Kernel route (phase pairs as 2-channel groups) == the explicit
    phase-averaged statistics of the jnp fallback, fwd + grads +
    running stats."""
    from brever_tpu.models.manner import packed_batch_norm

    class _M(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return packed_batch_norm(x, train, 'bn', act=act,
                                     momentum=MOM, epsilon=EPS)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 40, 2 * C).astype('float32'))
    m = _M()
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    v['params']['bn']['scale'] = jnp.asarray(
        rng.rand(C) + 0.5, jnp.float32)
    v['params']['bn']['bias'] = jnp.asarray(
        rng.randn(C) * 0.3, jnp.float32)

    w = jnp.asarray(rng.randn(*x.shape), jnp.float32)

    def run(x, params):
        y, upd = m.apply({**v, 'params': params}, x, train=True,
                         mutable=['batch_stats'])
        return (y * w).sum(), (y, upd)

    (_, (y_k, upd_k)), g_k = jax.value_and_grad(
        run, argnums=(0, 1), has_aux=True)(x, v['params'])
    monkeypatch.setattr(common, '_FUSED_BN_MIN_BYTES', 1 << 60)
    (_, (y_j, upd_j)), g_j = jax.value_and_grad(
        run, argnums=(0, 1), has_aux=True)(x, v['params'])

    np.testing.assert_allclose(y_k, y_j, rtol=3e-5, atol=3e-6)
    for key in ('mean', 'var'):
        np.testing.assert_allclose(
            upd_k['batch_stats']['bn'][key],
            upd_j['batch_stats']['bn'][key], rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(g_k[0], g_j[0], rtol=3e-4, atol=3e-5)
    for key in ('scale', 'bias'):
        np.testing.assert_allclose(
            g_k[1]['bn'][key], g_j[1]['bn'][key], rtol=3e-4, atol=3e-5)
