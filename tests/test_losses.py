"""Criterion contracts: batched-padded == per-item (reference
tests/test_losses.py), PIT behavior, mask correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

from brever_tpu.criterion import (
    CriterionRegistry,
    apply_mask,
    init_criterion,
    length_mask,
)

CRITERIA = ['sisnr', 'snr', 'mse', 'multiresyu']


def _rand_batch(seed=0, batch=4, sources=2, max_len=3200):
    rng = np.random.RandomState(seed)
    lengths = rng.randint(max_len // 2, max_len, batch)
    lengths[0] = max_len
    x = rng.randn(batch, sources, max_len).astype('float32')
    y = rng.randn(batch, sources, max_len).astype('float32')
    for i, n in enumerate(lengths):
        x[i, :, n:] = 0
        y[i, :, n:] = 0
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(lengths)


@pytest.mark.parametrize('name', CRITERIA)
def test_batched_matches_per_item(name):
    criterion = init_criterion(name)
    x, y, lengths = _rand_batch()
    batched = np.asarray(criterion(x, y, lengths))
    for i in range(x.shape[0]):
        n = int(lengths[i])
        single = criterion(
            x[i:i + 1, :, :n], y[i:i + 1, :, :n], jnp.asarray([n])
        )
        np.testing.assert_allclose(batched[i], np.asarray(single)[0],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('name', CRITERIA)
def test_padding_is_ignored(name):
    """Garbage in the padded region must not change the loss."""
    criterion = init_criterion(name)
    x, y, lengths = _rand_batch()
    clean = np.asarray(criterion(x, y, lengths))
    mask = np.asarray(length_mask(x.shape, lengths))
    noise = 100 * np.random.RandomState(1).randn(*x.shape).astype('float32')
    x_dirty = jnp.asarray(np.asarray(x) + noise * (1 - mask))
    y_dirty = jnp.asarray(np.asarray(y) + noise * (1 - mask))
    dirty = np.asarray(criterion(x_dirty, y_dirty, lengths))
    np.testing.assert_allclose(clean, dirty, rtol=1e-4, atol=1e-5)


def test_sisnr_perfect_reconstruction():
    x, _, lengths = _rand_batch()
    loss = np.asarray(CriterionRegistry.get('sisnr')(x, x, lengths))
    assert (loss < -50).all()  # SI-SNR -> +inf, loss -> -inf


def test_sisnr_pit_invariance():
    """Swapping estimated sources must not change the PIT loss."""
    x, y, lengths = _rand_batch(sources=2)
    loss = np.asarray(CriterionRegistry.get('sisnr')(x, y, lengths))
    swapped = np.asarray(
        CriterionRegistry.get('sisnr')(x[:, ::-1], y, lengths))
    np.testing.assert_allclose(loss, swapped, rtol=1e-5, atol=1e-5)


def test_sisnr_scale_invariance():
    x, y, lengths = _rand_batch()
    loss = np.asarray(CriterionRegistry.get('sisnr')(x, y, lengths))
    scaled = np.asarray(CriterionRegistry.get('sisnr')(3 * x, y, lengths))
    np.testing.assert_allclose(loss, scaled, rtol=1e-3, atol=1e-4)


def test_snr_zero_noise():
    x, _, lengths = _rand_batch()
    loss = np.asarray(CriterionRegistry.get('snr')(x, x, lengths))
    assert (loss < -50).all()


def test_mse_weighting():
    x, y, lengths = _rand_batch()
    base = np.asarray(CriterionRegistry.get('mse')(x, y, lengths))
    weight = jnp.asarray(np.full(x.shape[0], 2.0, dtype='float32'))
    weighted = np.asarray(
        CriterionRegistry.get('mse')(x, y, lengths, weight=weight))
    np.testing.assert_allclose(weighted, 2 * base, rtol=1e-5)


def test_apply_mask():
    x = jnp.ones((2, 3, 10))
    y = jnp.ones((2, 3, 10))
    xm, ym = apply_mask(x, y, jnp.asarray([4, 10]))
    assert float(xm[0, :, 4:].sum()) == 0
    assert float(xm[0, :, :4].sum()) == 12
    assert float(ym[1].sum()) == 30


def test_multiresyu_multi_resolution():
    loss = init_criterion(
        'multiresyu', frame_lengths=[256, 512], scale_invariant=True)
    x, y, lengths = _rand_batch()
    out = np.asarray(loss(x, y, lengths))
    assert out.shape == (4,)
    assert np.isfinite(out).all()
