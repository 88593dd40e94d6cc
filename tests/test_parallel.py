"""Multi-device sharding tests on the forced 8-device CPU mesh —
coverage the reference never had (its DDP was untested; SURVEY.md §4
flags this gap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brever_tpu.models import ModelRegistry
from brever_tpu.parallel.mesh import (
    get_mesh,
    make_data_parallel_step,
    pad_batch_to_devices,
    shard_batch,
)
from brever_tpu.training import BreverTrainer

from utils import DummyDataset


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_shard_batch_layout():
    mesh = get_mesh()
    x = np.arange(8 * 4, dtype='float32').reshape(8, 4)
    sharded = shard_batch(x, mesh)
    assert sharded.shape == (8, 4)
    # each device holds one row
    assert len(sharded.addressable_shards) == 8
    for shard in sharded.addressable_shards:
        assert shard.data.shape == (1, 4)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_pad_batch_to_devices():
    batch = np.ones((5, 3), dtype='float32')
    lengths = np.array([3, 3, 3, 3, 3], dtype='int32')
    padded, new_lengths, n_real = pad_batch_to_devices(batch, lengths, 8)
    assert padded.shape == (8, 3)
    assert n_real == 5
    assert (new_lengths[5:] == 0).all()


def test_data_parallel_step_matches_single_device():
    """The sharded-jit gradient step must produce the same params as a
    single-device step — XLA's all-reduce is exact."""
    mesh = get_mesh()

    def step(state, batch, lengths, _):
        def loss_fn(w):
            pred = batch @ w
            per_item = ((pred - 1.0)**2).mean(axis=-1)
            weightv = (lengths > 0).astype(jnp.float32)
            return (per_item * weightv).sum() / weightv.sum()

        grads = jax.grad(loss_fn)(state['w'])
        return {'w': state['w'] - 0.1 * grads}, loss_fn(state['w'])

    rng = np.random.RandomState(0)
    batch = rng.randn(16, 4).astype('float32')
    lengths = np.full(16, 4, dtype='int32')
    w0 = rng.randn(4, 2).astype('float32')

    # single device
    state1, loss1 = jax.jit(step)(
        {'w': jnp.asarray(w0)}, jnp.asarray(batch), jnp.asarray(lengths),
        None)

    # 8-device mesh
    sharded_step = make_data_parallel_step(step, mesh, donate_state=False)
    state8, loss8 = sharded_step(
        {'w': jnp.asarray(w0)}, *shard_batch(
            (batch, lengths), mesh), None)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state1['w']), np.asarray(state8['w']), rtol=1e-5,
        atol=1e-6)


def test_trainer_on_eight_device_mesh(tmp_path):
    """Full FFNN training over the 8-device mesh; params must end up
    identical to the single-device run (same seed, same data)."""
    results = {}
    for device, subdir in (('cpu', 'single'), ('tpu', 'mesh')):
        model = ModelRegistry.get('ffnn')(hidden_layers=[32])
        trainer = BreverTrainer(
            model=model,
            train_dataset=DummyDataset(n_items=8),
            val_dataset=DummyDataset(n_items=4, seed=7),
            model_dirpath=str(tmp_path / subdir),
            epochs=1,
            device=device,  # 'tpu' resolves to all devices (8 cpu here)
            batch_size=16,
            dynamic_batch_size=True,
            val_metrics=set(),
            val_period=1,
            seed=0,
        )
        if device == 'cpu':
            trainer.mesh = get_mesh(jax.devices()[:1])
            trainer.n_devices = 1
        trainer.run()
        leaves = jax.tree.leaves(trainer.state['params'])
        results[subdir] = np.concatenate(
            [np.asarray(x).ravel() for x in leaves])
        assert trainer.epochs_ran == 1

    np.testing.assert_allclose(
        results['single'], results['mesh'], rtol=1e-4, atol=1e-5)


def test_device_metrics_on_eight_device_mesh(tmp_path):
    """Validation metrics scored by the on-device twins must work on a
    sharded batch (GSPMD-sharded enhance output feeding the jitted
    metric graph) and agree with host scoring."""
    model = ModelRegistry.get('ffnn')(hidden_layers=[32])

    def make(subdir, device_val_metrics):
        trainer = BreverTrainer(
            model=model,
            train_dataset=DummyDataset(n_items=8),
            val_dataset=DummyDataset(n_items=4, seed=7),
            model_dirpath=str(tmp_path / subdir),
            epochs=1,
            device='tpu',      # all 8 virtual cpu devices
            batch_size=16,
            dynamic_batch_size=True,
            val_metrics={'estoi', 'snr', 'sisnr'},
            val_period=1,
            device_val_metrics=device_val_metrics,
            seed=0,
        )
        trainer.run()
        return trainer.loss_logger.metrics[0]

    dev = make('dev', True)
    host = make('host', False)
    assert set(dev) == {'estoi', 'snr', 'sisnr'}
    for k in dev:
        np.testing.assert_allclose(dev[k], host[k], rtol=1e-3,
                                   atol=2e-3)


def test_distributed_batch_sampler_wrapper_single_process():
    from brever_tpu.batching import (
        BatchSamplerRegistry,
        DistributedBatchSamplerWrapper,
    )
    ds = DummyDataset(n_items=10)
    inner = BatchSamplerRegistry.get('random')(dataset=ds, batch_size=2)
    # simulate 2 processes
    shards = []
    for rank in (0, 1):
        sampler = DistributedBatchSamplerWrapper(
            inner, num_replicas=2, rank=rank)
        sampler.set_epoch(0)
        inner._previous_epoch = -1
        shards.append(list(sampler))
    assert len(shards[0]) == len(shards[1])
    # no batch overlap between ranks (up to the repeat-padding batch)
    flat0 = {tuple(b) for b in shards[0]}
    flat1 = {tuple(b) for b in shards[1]}
    total = len(flat0 | flat1)
    assert total >= len(shards[0]) + len(shards[1]) - 1


def test_local_rows_multihost_semantics():
    """Regression for the multi-host metric-slicing bug: scoring must
    use this process's own rows, not the head of the globally gathered
    array (reference semantics: per-rank scores then mean over world,
    brever/training.py:369-373)."""
    from brever_tpu.training import _local_rows

    class FakeShard:
        def __init__(self, start, stop, data):
            self.index = (slice(start, stop), slice(None))
            self.data = data

    class FakeGlobalArray:
        # global batch of 8 rows over 2 processes; this process owns
        # rows 4:8 (two shards, plus a replicated duplicate of 4:6)
        is_fully_addressable = False

        def __init__(self):
            rows = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
            self.addressable_shards = [
                FakeShard(6, 8, rows[6:8]),
                FakeShard(4, 6, rows[4:6]),
                FakeShard(4, 6, rows[4:6]),  # replica on another device
            ]

    out = _local_rows(FakeGlobalArray())
    expected = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)[4:8]
    np.testing.assert_array_equal(out, expected)

    # fully addressable arrays pass through unchanged
    x = np.ones((4, 2))
    np.testing.assert_array_equal(_local_rows(x), x)
    np.testing.assert_array_equal(
        _local_rows(jnp.asarray(x)), x)


def test_trainer_rejects_unknown_val_metric(tmp_path):
    from brever_tpu.models import ModelRegistry
    from brever_tpu.training import BreverTrainer

    model = ModelRegistry.get('ffnn')(hidden_layers=[16], stacks=0)
    ds = DummyDataset(n_items=4)
    with pytest.raises(KeyError):
        BreverTrainer(
            model=model, train_dataset=ds, val_dataset=ds,
            model_dirpath=str(tmp_path), epochs=1, device='cpu',
            val_metrics={'nonexistent_metric'})


# ---------------------------------------------------------------------------
# tensor parallelism (2-D dp x mp mesh) — no reference counterpart
# (brever is DDP-only); capability exists for HBM headroom on the
# largest models (see brever_tpu/parallel/tensor.py docstring)

def test_tp_specs_shard_kernels_only():
    from brever_tpu.parallel import infer_tp_specs
    from jax.sharding import PartitionSpec as P

    params = {
        'dense': {'kernel': jnp.zeros((64, 128)),
                  'bias': jnp.zeros((128,))},
        'conv': {'kernel': jnp.zeros((3, 16, 128))},
        'odd': {'kernel': jnp.zeros((63, 65))},
        'tiny': {'kernel': jnp.zeros((2, 4))},
    }
    specs = infer_tp_specs(params, mp=4)
    assert specs['dense']['kernel'] == P(None, 'mp')
    assert specs['dense']['bias'] == P()
    assert specs['conv']['kernel'] == P(None, None, 'mp')
    assert specs['odd']['kernel'] == P()       # nothing divides by 4
    assert specs['tiny']['kernel'] == P()      # below min size


def test_tp_train_step_matches_single_device():
    """Channel-sharded Conv-TasNet train step over a (2, 4) mesh must
    match the single-device step (GSPMD collectives are exact up to
    reduction order)."""
    import optax

    from brever_tpu.models.base import sample_weighted_mean
    from brever_tpu.parallel import (
        get_mesh_2d,
        make_tp_step,
        make_tp_train_state,
        shard_batch_2d,
    )

    model = ModelRegistry.get('convtasnet')(
        filters=64, filter_length=16, bottleneck_channels=32,
        hidden_channels=64, skip_channels=32, layers=2, repeats=2)
    tx = optax.chain(optax.clip_by_global_norm(model.grad_clip),
                     model.optimizer())

    def train_step(state, batch, lengths):
        rng, step_rng = jax.random.split(state['rng'])

        def loss_fn(params):
            per_item = model.loss({'params': params}, batch, lengths,
                                  step_rng, train=True)
            return sample_weighted_mean(per_item, lengths)

        loss, grads = jax.value_and_grad(loss_fn)(state['params'])
        updates, opt_state = tx.update(grads, state['opt_state'],
                                       state['params'])
        return {'params': optax.apply_updates(state['params'], updates),
                'opt_state': opt_state, 'rng': rng}, loss

    rng = np.random.RandomState(0)
    batch = rng.randn(8, 2, 2, 2048).astype('float32')
    lengths = np.full(8, 2048, dtype=np.int32)

    # single device
    variables = model.init_variables(jax.random.PRNGKey(0))
    state1 = {'params': variables['params'],
              'opt_state': tx.init(variables['params']),
              'rng': jax.random.PRNGKey(1)}
    new1, loss1 = jax.jit(train_step)(
        state1, jnp.asarray(batch), jnp.asarray(lengths))

    # (2, 4) mesh: batch over dp, channels over mp
    mesh = get_mesh_2d(2, 4)
    state, _ = make_tp_train_state(model, mesh, tx)
    from brever_tpu.parallel.tensor import sharded_size
    # at least one kernel must actually be distributed
    sizes = [
        (sharded_size(x), int(np.prod(x.shape)))
        for x in jax.tree.leaves(state['params'])
    ]
    assert any(s < full for s, full in sizes)
    dbatch, dlengths = shard_batch_2d((batch, lengths), mesh)
    step = make_tp_step(train_step, donate_state=False)
    new2, loss2 = step(state, dbatch, dlengths)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    flat1 = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree.leaves(new1['params'])])
    flat2 = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree.leaves(new2['params'])])
    # GSPMD is exact only up to reduction order; Adam's per-element
    # normalization amplifies that noise where |grad| ~ eps, so allow
    # a small fraction of elements past the tight tolerance while
    # still bounding the absolute drift of every element.
    np.testing.assert_allclose(flat1, flat2, rtol=1e-4, atol=2e-3)
    tight = np.isclose(flat1, flat2, rtol=1e-4, atol=1e-6)
    assert tight.mean() > 0.999, f'only {tight.mean():.4%} match tightly'
