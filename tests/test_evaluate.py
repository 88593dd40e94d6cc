"""Sharded evaluation tests (reference eval runs under DDP with
rank-sliced batches and a gather on rank 0 — scripts/test_model.py:66-70
and :215-238; here the forward is sharded over the local device mesh
and batches are round-robin sliced over processes)."""

import jax
import jax.numpy as jnp
import numpy as np

from brever_tpu.evaluate import (
    evaluate_dataset,
    make_sharded_enhance,
    merge_scores,
)


class FakeModel:
    """Minimal model surface: a jittable ``_enhance``."""

    def _enhance(self, variables, x):
        # (B, ch, samples) -> (B, samples): downmix then scale
        return x.mean(-2) * variables['gain']


def make_batches(seed=0, sizes=(5, 3, 8)):
    rng = np.random.RandomState(seed)
    batches = []
    for n in sizes:
        samples = 256
        batch = rng.randn(n, 2, 2, samples).astype('float32')
        lengths = rng.randint(samples // 2, samples, n).astype('int32')
        batches.append((batch, lengths))
    return batches


def serial_scores(batches, metrics, gain=1.0):
    from brever_tpu.metrics import MetricRegistry
    n_items = sum(b.shape[0] for b, _ in batches)
    scores = np.zeros((n_items, len(metrics), 2))
    i = 0
    for batch, lengths in batches:
        n = batch.shape[0]
        inputs_mono = batch[:, 0].mean(-2)
        target_mono = batch[:, 1].mean(-2)
        out = inputs_mono * gain
        for im, m in enumerate(metrics):
            fn = MetricRegistry.get(m)
            scores[i:i + n, im, 0] = np.asarray(
                fn(inputs_mono, target_mono, lengths=lengths))
            scores[i:i + n, im, 1] = np.asarray(
                fn(out, target_mono, lengths=lengths))
        i += n
    return scores


def test_sharded_enhance_pads_and_shards():
    model = FakeModel()
    enhance, mesh = make_sharded_enhance(model)
    assert mesh.devices.size == 8
    x = np.random.RandomState(0).randn(8, 2, 64).astype('float32')
    out = enhance({'gain': jnp.float32(2.0)}, x)
    assert out.shape == (8, 64)
    # sharded over the batch axis: one row per device
    assert len(out.addressable_shards) == 8
    np.testing.assert_allclose(np.asarray(out), x.mean(-2) * 2.0,
                               rtol=1e-6)


def test_evaluate_dataset_matches_serial():
    """Device-sharded eval (with non-divisible batch padding) must
    reproduce the plain serial loop exactly."""
    batches = make_batches()
    metrics = ['snr', 'sisnr']
    got = evaluate_dataset(FakeModel(), {'gain': jnp.float32(1.5)},
                           batches, metrics, n_items=16)
    want = serial_scores(batches, metrics, gain=1.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_round_robin_process_slicing(monkeypatch):
    """Simulate two processes: each scores a disjoint round-robin slice
    (zeros elsewhere); summing the per-rank arrays reproduces the
    serial result — the allgather-sum merge contract."""
    batches = make_batches(seed=1, sizes=(4, 6, 2, 4))
    metrics = ['snr']
    want = serial_scores(batches, metrics, gain=1.0)

    parts = []
    monkeypatch.setattr(jax, 'process_count', lambda: 2)
    for rank in (0, 1):
        monkeypatch.setattr(jax, 'process_index', lambda r=rank: r)
        monkeypatch.setattr('brever_tpu.evaluate.merge_scores',
                            lambda s: s)
        parts.append(
            evaluate_dataset(FakeModel(), {'gain': jnp.float32(1.0)},
                             batches, metrics, n_items=16))
    # disjoint ownership
    assert ((parts[0] != 0) & (parts[1] != 0)).sum() == 0
    np.testing.assert_allclose(parts[0] + parts[1], want,
                               rtol=1e-4, atol=1e-5)


def test_merge_scores_single_process_identity():
    s = np.arange(12.0).reshape(3, 2, 2)
    np.testing.assert_array_equal(merge_scores(s), s)


def test_on_batch_receives_global_indices():
    batches = make_batches(seed=2, sizes=(3, 5))
    seen = []

    def on_batch(indices, inputs_mono, output, lengths):
        seen.append((indices.copy(), output.shape))

    evaluate_dataset(FakeModel(), {'gain': jnp.float32(1.0)},
                     batches, ['snr'], n_items=8, on_batch=on_batch)
    all_idx = np.concatenate([i for i, _ in seen])
    np.testing.assert_array_equal(np.sort(all_idx), np.arange(8))


def test_evaluate_dataset_device_metrics_matches_host():
    """device_metrics=True must reproduce the host-scored result (the
    snr/sisnr twins are the same jnp criterion; stoi twins are pinned
    separately in test_metrics_device.py)."""
    batches = make_batches(seed=3, sizes=(5, 3))
    metrics = ['snr', 'sisnr']
    host = evaluate_dataset(FakeModel(), {'gain': jnp.float32(1.5)},
                            batches, metrics, n_items=8)
    dev = evaluate_dataset(FakeModel(), {'gain': jnp.float32(1.5)},
                           batches, metrics, n_items=8,
                           device_metrics=True)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
