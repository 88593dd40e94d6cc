"""flash-LSTM kernel parity vs the jnp scan twin (interpreter mode).

Same idiom as tests/test_tcn_fused.py: the Pallas kernel runs through
the interpreter on CPU and must match models.rnn's reference scan in
forward outputs AND gradients (dgates_x, dw_hh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import brever_tpu.ops.pallas.lstm_scan as fused_mod
from brever_tpu.models.rnn import _lstm_scan_impl


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fused_mod, 'FORCE_INTERPRET', True)


def _ref_scan(gates_x, w_hh):
    """models.rnn reference over the (T, D, R, 4H) layout."""
    h_seq, _ = _lstm_scan_impl(gates_x, w_hh, unroll=1)
    return h_seq


@pytest.mark.parametrize('n_dir,rows,t_steps', [
    (1, 8, 5),      # unidirectional, rows below one tile
    (2, 8, 7),      # bidirectional stack
    (2, 12, 3),     # rows not a multiple of the sublane tile
    (1, 16, 20),    # several time chunks: carry streams across blocks
])
def test_fused_lstm_forward_parity(n_dir, rows, t_steps):
    h = 128
    rng = np.random.RandomState(0)
    gates_x = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, 4 * h).astype('float32') * 0.3)
    w_hh = jnp.asarray(rng.randn(n_dir, h, 4 * h).astype('float32') * 0.1)
    got = fused_mod.lstm_scan_fused(gates_x, w_hh)
    want = _ref_scan(gates_x, w_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_fused_lstm_multichunk_streaming(monkeypatch):
    """Forward AND gradients must stream correctly across time-chunk
    boundaries (the (h, c) carry crosses grid steps; the backward
    reads the chunk-boundary arrays)."""
    monkeypatch.setattr(fused_mod, '_CHUNK_BYTES', 16 * 512 * 4 * 8)
    h = 128
    n_dir, rows, t_steps = 1, 16, 11   # -> chunk 8, 2 chunks, pad 5
    rng = np.random.RandomState(3)
    gates_x = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, 4 * h).astype('float32') * 0.3)
    w_hh = jnp.asarray(rng.randn(n_dir, h, 4 * h).astype('float32') * 0.1)
    cot = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, h).astype('float32'))

    got = fused_mod.lstm_scan_fused(gates_x, w_hh)
    want = _ref_scan(gates_x, w_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    g_fused = jax.grad(
        lambda gx, w: jnp.sum(fused_mod.lstm_scan_fused(gx, w) * cot),
        argnums=(0, 1))(gates_x, w_hh)
    g_ref = jax.grad(
        lambda gx, w: jnp.sum(_ref_scan(gx, w) * cot),
        argnums=(0, 1))(gates_x, w_hh)
    np.testing.assert_allclose(np.asarray(g_fused[0]),
                               np.asarray(g_ref[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_fused[1]),
                               np.asarray(g_ref[1]),
                               rtol=2e-4, atol=2e-3)


def test_fused_lstm_gradient_parity():
    h = 128
    n_dir, rows, t_steps = 2, 8, 6
    rng = np.random.RandomState(1)
    gates_x = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, 4 * h).astype('float32') * 0.3)
    w_hh = jnp.asarray(rng.randn(n_dir, h, 4 * h).astype('float32') * 0.1)
    # weight the output so every (t, d, r, k) position matters
    cot = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, h).astype('float32'))

    def loss_fused(gx, w):
        return jnp.sum(fused_mod.lstm_scan_fused(gx, w) * cot)

    def loss_ref(gx, w):
        return jnp.sum(_ref_scan(gx, w) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(gates_x, w_hh)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(gates_x, w_hh)
    for got, want, tol in [(g_fused[0], g_ref[0], 2e-4),
                           (g_fused[1], g_ref[1], 2e-3)]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=tol)


@pytest.mark.parametrize('cap_bytes', [
    None,                      # default cap: 272 rows fold into ONE tile
    16 * 4 * 128 * 4 * 8,      # tiny cap -> 256-row tiles, 2 serial tiles
])
def test_fused_lstm_many_rows_tiling(monkeypatch, cap_bytes):
    """rows > 256 exercise the row-tile sizing: with the default cap
    all rows fold into one tile (one serial pass over the sequence);
    with a binding cap the rows split across serial tiles whose (h, c)
    carries must stay isolated.  Both must match the twin in outputs
    and gradients."""
    if cap_bytes is not None:
        monkeypatch.setattr(fused_mod, '_MAX_TILE_BLOCK_BYTES',
                            cap_bytes)
    h = 128
    n_dir, rows, t_steps = 1, 272, 6
    rng = np.random.RandomState(7)
    gates_x = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, 4 * h).astype('float32') * 0.3)
    w_hh = jnp.asarray(rng.randn(n_dir, h, 4 * h).astype('float32') * 0.1)
    cot = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, h).astype('float32'))

    got = fused_mod.lstm_scan_fused(gates_x, w_hh)
    want = _ref_scan(gates_x, w_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    g_fused = jax.grad(
        lambda gx, w: jnp.sum(fused_mod.lstm_scan_fused(gx, w) * cot),
        argnums=(0, 1))(gates_x, w_hh)
    g_ref = jax.grad(
        lambda gx, w: jnp.sum(_ref_scan(gx, w) * cot),
        argnums=(0, 1))(gates_x, w_hh)
    for got_g, want_g, tol in [(g_fused[0], g_ref[0], 2e-4),
                               (g_fused[1], g_ref[1], 2e-3)]:
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(want_g), rtol=2e-4, atol=tol)


def test_fused_lstm_unidirectional_wrapper(monkeypatch):
    """The (T, B, 4H) path through models.rnn dispatch reshapes into
    the kernel layout and back."""
    monkeypatch.setenv('BREVER_FUSED_LSTM', '1')
    from brever_tpu.models.rnn import (_dispatch_scan, _use_fused_scan,
                                       lstm_scan)
    h = 128
    rng = np.random.RandomState(2)
    gates_x = jnp.asarray(
        rng.randn(4, 128, 4 * h).astype('float32') * 0.3)
    w_hh = jnp.asarray(rng.randn(h, 4 * h).astype('float32') * 0.1)
    assert _use_fused_scan(gates_x, w_hh)
    # narrow recurrences stay on the XLA scan (MXU would idle)
    assert not _use_fused_scan(gates_x[:, :32], w_hh)
    want = lstm_scan(gates_x, w_hh, 1)
    got = _dispatch_scan(gates_x, w_hh, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_fused_lstm_bf16_gradient_parity():
    """Amp-dtype gradients: the backward's dW_hh accumulation multiplies
    at the carry dtype (bf16 under amp) with an f32 accumulator — pin
    that configuration against the jnp twin run in bf16 (the f32 tests
    above cannot see a regression in the amp-dtype matmul path)."""
    h = 128
    n_dir, rows, t_steps = 2, 16, 9
    rng = np.random.RandomState(4)
    gates_x = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, 4 * h).astype('float32') * 0.3
    ).astype(jnp.bfloat16)
    w_hh = jnp.asarray(
        rng.randn(n_dir, h, 4 * h).astype('float32') * 0.1
    ).astype(jnp.bfloat16)
    cot = jnp.asarray(
        rng.randn(t_steps, n_dir, rows, h).astype('float32')
    ).astype(jnp.bfloat16)

    g_fused = jax.grad(
        lambda gx, w: jnp.sum(
            fused_mod.lstm_scan_fused(gx, w).astype(jnp.float32)
            * cot.astype(jnp.float32)),
        argnums=(0, 1))(gates_x, w_hh)
    g_ref = jax.grad(
        lambda gx, w: jnp.sum(
            _ref_scan(gx, w).astype(jnp.float32)
            * cot.astype(jnp.float32)),
        argnums=(0, 1))(gates_x, w_hh)
    for got, want in zip(g_fused, g_ref):
        got32 = np.asarray(got, dtype=np.float32)
        want32 = np.asarray(want, dtype=np.float32)
        assert np.isfinite(got32).all()
        np.testing.assert_allclose(got32, want32, rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# v2: projection-fused kernel (lstm_scan_fused_x)

def _ref_scan_x(x_seq, w_ih, bias, w_hh):
    """projection outside + jnp twin: the pipeline v2 replaces."""
    gates_x = jnp.einsum('tdrf,dfk->tdrk', x_seq, w_ih) \
        + bias[None, :, None, :]
    h_seq, _ = _lstm_scan_impl(gates_x, w_hh, unroll=1)
    return h_seq


def _x_data(n_dir, rows, t_steps, e_feat, seed=0, dtype='float32'):
    h = 128
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(t_steps, n_dir, rows, e_feat)
                    .astype(dtype) * 0.3),
        jnp.asarray(rng.randn(n_dir, e_feat, 4 * h)
                    .astype(dtype) * 0.1),
        jnp.asarray(rng.randn(n_dir, 4 * h).astype(dtype) * 0.1),
        jnp.asarray(rng.randn(n_dir, h, 4 * h).astype(dtype) * 0.1),
        jnp.asarray(rng.randn(t_steps, n_dir, rows, h).astype(dtype)),
    )


@pytest.mark.parametrize('n_dir,rows,t_steps,e_feat', [
    (1, 8, 5, 128),     # lane-aligned features
    (2, 12, 7, 96),     # feature dim padded to lanes, ragged rows
    (2, 8, 3, 300),     # wider-than-4H padded features
])
def test_fused_x_forward_parity(n_dir, rows, t_steps, e_feat):
    x_seq, w_ih, bias, w_hh, _ = _x_data(n_dir, rows, t_steps, e_feat)
    got = fused_mod.lstm_scan_fused_x(x_seq, w_ih, bias, w_hh)
    want = _ref_scan_x(x_seq, w_ih, bias, w_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize('e_feat', [128, 96])
def test_fused_x_gradient_parity(e_feat):
    """All four gradients (dx, dW_ih, dbias, dW_hh) against autodiff
    through the projection-outside reference."""
    n_dir, rows, t_steps = 2, 8, 6
    x_seq, w_ih, bias, w_hh, cot = _x_data(
        n_dir, rows, t_steps, e_feat, seed=1)

    g_fused = jax.grad(
        lambda *a: jnp.sum(fused_mod.lstm_scan_fused_x(*a) * cot),
        argnums=(0, 1, 2, 3))(x_seq, w_ih, bias, w_hh)
    g_ref = jax.grad(
        lambda *a: jnp.sum(_ref_scan_x(*a) * cot),
        argnums=(0, 1, 2, 3))(x_seq, w_ih, bias, w_hh)
    for got, want, name in zip(g_fused, g_ref,
                               ['x', 'w_ih', 'bias', 'w_hh']):
        assert got.shape == want.shape, name
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3,
            err_msg=f'grad {name} (E={e_feat})')


def test_fused_x_multichunk_streaming(monkeypatch):
    """Carries and weight-grad accumulation across time chunks and row
    tiles, with time padding in the final chunk."""
    monkeypatch.setattr(fused_mod, '_CHUNK_BYTES', 16 * 512 * 4 * 8)
    n_dir, rows, t_steps, e_feat = 1, 16, 11, 128
    x_seq, w_ih, bias, w_hh, cot = _x_data(
        n_dir, rows, t_steps, e_feat, seed=3)

    got = fused_mod.lstm_scan_fused_x(x_seq, w_ih, bias, w_hh)
    want = _ref_scan_x(x_seq, w_ih, bias, w_hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)

    g_fused = jax.grad(
        lambda *a: jnp.sum(fused_mod.lstm_scan_fused_x(*a) * cot),
        argnums=(0, 1, 2, 3))(x_seq, w_ih, bias, w_hh)
    g_ref = jax.grad(
        lambda *a: jnp.sum(_ref_scan_x(*a) * cot),
        argnums=(0, 1, 2, 3))(x_seq, w_ih, bias, w_hh)
    for got_g, want_g, name in zip(g_fused, g_ref,
                                   ['x', 'w_ih', 'bias', 'w_hh']):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(want_g), rtol=2e-4, atol=2e-3,
            err_msg=f'grad {name}')


def test_fused_x_bf16_gradient_parity():
    n_dir, rows, t_steps, e_feat = 2, 16, 9, 128
    x_seq, w_ih, bias, w_hh, cot = (
        a.astype(jnp.bfloat16)
        for a in _x_data(n_dir, rows, t_steps, e_feat, seed=4))

    g_fused = jax.grad(
        lambda *a: jnp.sum(
            fused_mod.lstm_scan_fused_x(*a).astype(jnp.float32)
            * cot.astype(jnp.float32)),
        argnums=(0, 1, 2, 3))(x_seq, w_ih, bias, w_hh)
    g_ref = jax.grad(
        lambda *a: jnp.sum(
            _ref_scan_x(*a).astype(jnp.float32)
            * cot.astype(jnp.float32)),
        argnums=(0, 1, 2, 3))(x_seq, w_ih, bias, w_hh)
    for idx, name in [(0, 'x'), (1, 'w_ih'), (3, 'w_hh')]:
        got, want = g_fused[idx], g_ref[idx]
        got32 = np.asarray(got, dtype=np.float32)
        want32 = np.asarray(want, dtype=np.float32)
        assert np.isfinite(got32).all()
        # atol 5e-2: the kernel accumulates dW per-step in f32 while
        # the reference runs one monolithic bf16 matmul — a handful of
        # elements (~0.002%) land one bf16 ulp-cluster apart
        np.testing.assert_allclose(got32, want32, rtol=3e-2, atol=5e-2,
                                   err_msg=f'grad {name}')
    # dbias: the reference reduces 288 bf16 terms with a bf16
    # accumulator (worst-case drift ~n*eps), the kernel in f32 — pin
    # the kernel against an f64 reduction of the reference's own
    # dgates instead of against the noisier bf16 reduce
    gates_x = jnp.einsum('tdrf,dfk->tdrk', x_seq, w_ih) \
        + bias[None, :, None, :]
    dgx = jax.grad(
        lambda gx: jnp.sum(
            _lstm_scan_impl(gx, w_hh, unroll=1)[0].astype(jnp.float32)
            * cot.astype(jnp.float32)))(gates_x)
    dbias_true = np.asarray(dgx, np.float64).sum(axis=(0, 2))
    # atol 0.15: the kernel rounds x@W+b once (f32 -> bf16) where the
    # reference rounds twice, so per-element dgates differ by ~1 ulp
    # and the 288-term bias sum drifts ~eps*sqrt(n) ~ 0.13
    np.testing.assert_allclose(
        np.asarray(g_fused[2], np.float32), dbias_true,
        rtol=3e-2, atol=1.5e-1, err_msg='grad bias')


def test_blstm_module_fused_matches_fallback(monkeypatch):
    """End-to-end BLSTM module: the v2 kernel path must match the
    projection-outside fallback (params and inputs identical)."""
    import flax.linen as nn
    from brever_tpu.models.rnn import BLSTM

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(130, 6, 64).astype('float32') * 0.3)
    mod = BLSTM(hidden_size=128)
    params = mod.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv('BREVER_FUSED_LSTM', '0')
    want = mod.apply(params, x)
    monkeypatch.setenv('BREVER_FUSED_LSTM', '1')
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
