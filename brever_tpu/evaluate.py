"""Sharded model evaluation.

The reference evaluates under DDP: each rank pulls a disjoint slice of
test batches, scores them, the score lists are gathered on rank 0 and
written once (reference scripts/test_model.py:66-70 and :215-238).

Evaluation is embarrassingly parallel — no gradient exchange — so the
TPU-native mapping needs no global SPMD program:

* **across processes**: batches are round-robin sliced by
  ``jax.process_index()``; each process fills its rows of the global
  score array and the arrays are merged with
  ``multihost_utils.process_allgather`` (the ``dist.gather_object``
  equivalent; a no-op on one process).
* **across local devices**: the enhancement forward is jitted with the
  batch sharded over a local ``dp`` mesh, so one process drives all its
  chips with a single dispatch. Host-side metrics (PESQ/STOI run on
  CPU) then score the gathered outputs.

Batches whose size does not divide the mesh are padded with repeated
rows that are dropped before scoring.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .metrics import MetricRegistry

__all__ = ['make_sharded_enhance', 'evaluate_dataset', 'merge_scores']


def _local_mesh(axis_name='dp'):
    return Mesh(np.array(jax.local_devices()), (axis_name,))


def make_sharded_enhance(model, mesh=None, axis_name='dp'):
    """Jit ``model._enhance`` with the batch sharded over ``mesh``.

    Returns ``(enhance_fn, mesh)``; ``enhance_fn(variables, x)`` takes a
    host batch ``(B, ch, samples)`` with ``B`` divisible by the mesh
    size and returns a device array sharded over the batch axis.
    """
    if mesh is None:
        mesh = _local_mesh(axis_name)
    replicated = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis_name))

    @jax.jit
    def enhance(variables, x):
        out = model._enhance(variables, x)
        return jax.lax.with_sharding_constraint(out, batched)

    def run(variables, x):
        x = jax.device_put(jnp.asarray(x), batched)
        variables = jax.device_put(variables, replicated)
        return enhance(variables, x)

    return run, mesh


def _pad_rows(x, multiple):
    pad = (-x.shape[0]) % multiple
    if pad == 0:
        return x
    return np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0)


def merge_scores(scores):
    """Merge per-process score arrays (zeros on unowned rows) into the
    global array — the ``dist.gather_object`` + concatenate step of the
    reference, as one allgather-sum."""
    if jax.process_count() == 1:
        return scores
    from jax.experimental import multihost_utils
    return np.asarray(
        multihost_utils.process_allgather(scores)).sum(axis=0)


def evaluate_dataset(model, variables, dataloader, metrics, n_items,
                     mesh=None, on_batch=None, device_metrics=False):
    """Score ``n_items`` mixtures with every metric in ``metrics``.

    Returns ``(n_items, len(metrics), 2)`` — input and output scores —
    identical on every process after the merge. ``on_batch`` (optional)
    receives ``(global_indices, inputs_mono, output)`` for each locally
    scored batch (signal dumping hooks).

    ``device_metrics=True`` scores with the on-device jax twins
    (:mod:`brever_tpu.metrics_device`) where available, so enhanced
    audio never crosses to the host (the d2h fetch dominates evaluation
    on tunneled backends). Host metrics — the scoring authority, with
    PESQ's full utterance alignment — stay the default; metrics without
    a device twin fall back to host either way.
    """
    enhance, mesh = make_sharded_enhance(model, mesh)
    n_dev = int(mesh.devices.size)
    rank, n_proc = jax.process_index(), jax.process_count()
    twins = {}
    if device_metrics:
        from .metrics_device import DEVICE_METRICS
        twins = DEVICE_METRICS
    metric_fns = [
        (twins.get(m) or MetricRegistry.get(m), m in twins)
        for m in metrics
    ]
    need_host_out = on_batch is not None \
        or any(not on_device for _, on_device in metric_fns)

    scores = np.zeros((n_items, len(metrics), 2))
    i_mix = 0
    for i_batch, (batch, lengths) in enumerate(dataloader):
        n = int(np.asarray(batch).shape[0])
        start = i_mix
        i_mix += n
        if i_batch % n_proc != rank:
            continue  # another process owns this batch
        batch = np.asarray(batch)
        lengths = np.asarray(lengths)
        inputs = batch[:, 0]                       # (B, ch, samples)
        target_mono = batch[:, 1].mean(-2)
        inputs_mono = inputs.mean(-2)
        out_dev = enhance(variables, _pad_rows(inputs, n_dev))
        if out_dev.ndim == 3:
            out_dev = out_dev[:, 0]
        out = np.asarray(out_dev)[:n] if need_host_out else None
        for i_metric, (fn, on_device) in enumerate(metric_fns):
            est = out_dev if on_device else out
            est_n = est[:n] if on_device else est
            scores[start:start + n, i_metric, 0] = np.asarray(
                fn(inputs_mono, target_mono, lengths=lengths))
            scores[start:start + n, i_metric, 1] = np.asarray(
                fn(est_n, target_mono, lengths=lengths))
        if on_batch is not None:
            on_batch(np.arange(start, start + n), inputs_mono, out,
                     lengths)
    return merge_scores(scores)
