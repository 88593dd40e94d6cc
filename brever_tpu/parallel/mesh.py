"""Device mesh and data-parallel step construction.

The reference's entire distributed stack (NCCL process groups, DDP
gradient hooks, DistributedSampler — brever/training.py:62-63,
scripts/train_model.py:41-44) maps onto one concept here: a
``jax.sharding.Mesh`` with a ``dp`` axis. Batches are sharded over
``dp``, parameters are replicated, and ``jax.jit`` with those shardings
makes XLA insert the gradient all-reduce over ICI. Loss averaging
across devices is just the mean the loss already computes — no
``dist.reduce`` equivalent exists or is needed.

Multi-host: per-process batch slices are assembled into global arrays
with ``jax.make_array_from_process_local_data``.
"""

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None, axis_name='dp'):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh, axis_name='dp'):
    """Place a host batch on the mesh, sharded along the leading axis.

    Works for single arrays or pytrees (e.g. ``(batch, lengths)``).
    On multi-host setups each process passes its local slice.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        # make_array_from_process_local_data wants host buffers; pull
        # device-synthesized batches back (single-host keeps them on
        # device below)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree.map(partial(jax.device_put, device=sharding), batch)


def replicate(tree, mesh):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_data_parallel_step(step_fn, mesh, donate_state=True,
                            axis_name='dp'):
    """Jit a ``(state, batch, lengths, rng) -> (state, metrics)`` step
    with params replicated and batch sharded over ``dp``.

    XLA derives the gradient all-reduce from the shardings; the
    returned function is the full DDP-equivalent train step.
    """
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, batch_sharded, batch_sharded, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate_state else (),
    )


def pad_batch_to_devices(batch, lengths, n_devices):
    """Pad the batch axis to a multiple of the mesh size.

    Padded rows repeat row 0 but are reported with length 0 so masked
    losses ignore them; returns ``(batch, lengths, real_count)``.
    """
    def pad_rows(x):
        n = x.shape[0]
        pad = (-n) % n_devices
        if pad == 0:
            return x
        return np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0)

    n = lengths.shape[0]
    pad = (-n) % n_devices
    batch = jax.tree.map(pad_rows, batch)
    if pad:
        lengths = np.concatenate(
            [lengths, np.zeros((pad,) + lengths.shape[1:], lengths.dtype)])
    return batch, lengths, n
