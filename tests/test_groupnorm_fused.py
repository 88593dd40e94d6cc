"""Parity of the memory-lean fused GroupNorm(+SiLU) custom VJP against
the ``nn.GroupNorm`` + ``nn.silu`` composite it replaced in the
diffusion U-Net (forward and all gradients, every config combination).

The fused op's point is its backward residual policy — input +
O(B*C) statistics instead of the full pre-activation stash — so the
gradient parity is the load-bearing check.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brever_tpu.ops.normalization import group_norm_silu

B, F, T, C, G = 2, 8, 10, 32, 8
EPS = 1e-6


def _data():
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(B, F, T, C).astype('float32')),
        jnp.asarray(rng.randn(C).astype('float32') * 0.1 + 1.0),
        jnp.asarray(rng.randn(C).astype('float32') * 0.1),
        jnp.asarray(rng.randn(B, C).astype('float32') * 0.1 + 1.0),
        jnp.asarray(rng.randn(B, C).astype('float32') * 0.1),
    )


def _reference(x, scale, bias, s, t, apply_silu, ext):
    y = nn.GroupNorm(num_groups=G, epsilon=EPS).apply(
        {'params': {'scale': scale, 'bias': bias}}, x)
    if ext:
        y = y * s[:, None, None, :] + t[:, None, None, :]
    return nn.silu(y) if apply_silu else y


@pytest.mark.parametrize('apply_silu', [True, False])
@pytest.mark.parametrize('ext', [True, False])
def test_forward_and_gradients_match_composite(apply_silu, ext):
    x, scale, bias, s, t = _data()

    def fused(x, scale, bias, s, t):
        return group_norm_silu(
            x, scale, bias, G, EPS,
            ext_scale=s if ext else None,
            ext_shift=t if ext else None, apply_silu=apply_silu)

    y_ref = _reference(x, scale, bias, s, t, apply_silu, ext)
    y = fused(x, scale, bias, s, t)
    np.testing.assert_allclose(y_ref, y, rtol=2e-5, atol=2e-6)

    w = jnp.asarray(np.random.RandomState(1)
                    .randn(*y.shape).astype('float32'))
    g_ref = jax.grad(
        lambda a: (_reference(*a, apply_silu, ext) * w).sum())(
        (x, scale, bias, s, t))
    g = jax.grad(lambda a: (fused(*a) * w).sum())((x, scale, bias, s, t))
    names = ['x', 'scale', 'bias', 'ext_scale', 'ext_shift']
    for a, b, name in zip(g_ref, g, names):
        if not ext and name.startswith('ext'):
            continue
        np.testing.assert_allclose(
            a, b, rtol=3e-4, atol=1e-5,
            err_msg=f'silu={apply_silu} ext={ext} grad {name}')


def test_bf16_dtype_and_value():
    x, scale, bias, _, _ = _data()
    xb, sb, bb = (a.astype(jnp.bfloat16) for a in (x, scale, bias))
    y = group_norm_silu(xb, sb, bb, G, EPS)
    assert y.dtype == jnp.bfloat16
    y_ref = _reference(xb, sb, bb, None, None, True, False)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.1, atol=0.02)


def test_residuals_exclude_preactivation():
    """The VJP residuals must stay O(input + B*C): linearizing the op
    may not stash an extra full-size tensor (that stash is the HBM
    traffic this op exists to remove)."""
    x, scale, bias, _, _ = _data()

    def f(x):
        return group_norm_silu(x, scale, bias, G, EPS)

    # closed-over residuals of the linearized function
    _, vjp_fn = jax.vjp(f, x)
    leaves = jax.tree_util.tree_leaves(vjp_fn)
    big = [l.size for l in leaves
           if hasattr(l, 'size') and l.size > x.size]
    n_full = sum(1 for l in leaves
                 if hasattr(l, 'size') and l.size == x.size)
    assert not big
    assert n_full <= 1  # x itself, nothing else


def test_validation_errors():
    x, scale, bias, s, t = _data()
    with pytest.raises(ValueError):
        group_norm_silu(x, scale, bias, 7)
    with pytest.raises(ValueError):
        group_norm_silu(x, scale, bias, G, ext_scale=s)


# ---------------------------------------------------------------------------
# flash-GN Pallas kernel (interpreter-mode parity on CPU)

CP = 128  # lane-aligned channel count the kernel requires
GP = 32


@pytest.fixture
def _pallas_interpret(monkeypatch):
    import brever_tpu.ops.pallas.groupnorm as gnp
    monkeypatch.setattr(gnp, 'FORCE_INTERPRET', True)
    # force multiple chunks + a masked tail at small N
    monkeypatch.setattr(gnp, '_CHUNK_BYTES', 16 * 1024)
    monkeypatch.setenv('BREVER_GN_PALLAS', '1')
    return gnp


def _pallas_data(dtype='float32'):
    rng = np.random.RandomState(3)
    return (
        jnp.asarray(rng.randn(2, 7, 43, CP).astype(dtype)),
        jnp.asarray(rng.randn(CP).astype(dtype) * 0.1 + 1.0),
        jnp.asarray(rng.randn(CP).astype(dtype) * 0.1),
    )


@pytest.mark.parametrize('apply_silu', [True, False])
def test_pallas_kernel_matches_jnp_twin(_pallas_interpret, apply_silu,
                                        monkeypatch):
    """Kernel == the jnp custom-VJP path, forward and all grads (the
    kernel accumulates channel sums chunk-sequentially, hence the
    slightly wider tolerance than the jnp-vs-composite pin)."""
    x, scale, bias = _pallas_data()

    def run(x, scale, bias):
        return group_norm_silu(x, scale, bias, GP, EPS,
                               apply_silu=apply_silu)

    y = run(x, scale, bias)
    monkeypatch.setenv('BREVER_GN_PALLAS', '0')
    y_ref = run(x, scale, bias)
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-6)

    w = jnp.asarray(np.random.RandomState(4)
                    .randn(*y.shape).astype('float32'))
    g_ref = jax.grad(lambda a: (run(*a) * w).sum())((x, scale, bias))
    monkeypatch.setenv('BREVER_GN_PALLAS', '1')
    g = jax.grad(lambda a: (run(*a) * w).sum())((x, scale, bias))
    for a, b, name in zip(g_ref, g, ['x', 'scale', 'bias']):
        np.testing.assert_allclose(
            a, b, rtol=3e-4, atol=2e-5,
            err_msg=f'silu={apply_silu} grad {name}')


def test_pallas_kernel_bf16(_pallas_interpret):
    x, scale, bias = _pallas_data()
    xb, sb, bb = (a.astype(jnp.bfloat16) for a in (x, scale, bias))
    y = group_norm_silu(xb, sb, bb, GP, EPS)
    assert y.dtype == jnp.bfloat16
    y_ref = nn.silu(nn.GroupNorm(num_groups=GP, epsilon=EPS).apply(
        {'params': {'scale': scale, 'bias': bias}}, x))
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.1, atol=0.02)


def test_pallas_gating_falls_back(_pallas_interpret, monkeypatch):
    """ext terms and non-lane-aligned channels must take the jnp path
    even when the kernel is forced on (C=32 < 128 here)."""
    x, scale, bias, s, t = _data()
    y = group_norm_silu(x, scale, bias, G, EPS, ext_scale=s, ext_shift=t)
    y_ref = _reference(x, scale, bias, s, t, True, True)
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-6)
