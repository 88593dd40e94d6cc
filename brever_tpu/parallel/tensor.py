"""2-D (data x model) mesh: GSPMD tensor parallelism.

The reference's distributed stack is pure DDP (brever/training.py:62-63)
and at this zoo's scale (1.5M-65M params) data parallelism is the right
default.  The ``mp`` axis exists for the cases DP cannot cover on a
16 GB v5e:

* activation memory headroom — the diffusion U-Net and TF-GridNet at
  batch 16 x 4 s exceed a single chip's HBM (that is why the trainer
  falls back to smaller batches / remat); sharding channels over ``mp``
  divides both weight and activation footprints,
* serving wide batches on a pod slice without replicating every model.

Design is deliberately GSPMD, not hand-written collectives: parameters
are *placed* with ``NamedSharding`` channel shardings, the optimizer
state inherits them through a jitted ``tx.init``, and ``jax.jit``
propagates shardings through the step function, inserting all-gathers /
reduce-scatters over ICI where layers change the sharded axis.  No
NCCL-style explicit communication exists anywhere (scaling-book recipe:
pick a mesh, annotate, let XLA insert collectives).
"""

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh_2d(dp, mp, devices=None):
    """``(dp, mp)`` mesh with axes ``('dp', 'mp')``.

    ``mp`` should map onto the fastest ICI links; on a flat device list
    adjacent devices land on the ``mp`` (minor) axis, which matches the
    torus layout of TPU slices.
    """
    if devices is None:
        devices = jax.devices()
    if dp * mp > len(devices):
        raise ValueError(
            f'mesh {dp}x{mp} needs {dp * mp} devices, '
            f'have {len(devices)}')
    grid = np.array(devices[:dp * mp]).reshape(dp, mp)
    return Mesh(grid, ('dp', 'mp'))


def infer_tp_specs(params, mp, axis_name='mp', min_shard_size=1024):
    """Channel-sharding ``PartitionSpec`` tree for a params pytree.

    Rule: shard the trailing (output-channel) axis of every >=2-D
    kernel whose trailing dim divides by ``mp`` and whose total size
    makes sharding worthwhile; replicate everything else (biases,
    scales, norm affines).  XLA's propagation handles the mismatched
    boundaries (a replicated-input x sharded-kernel matmul yields a
    channel-sharded activation; the next layer's gather is inserted
    automatically).
    """
    def spec_for(x):
        shape = getattr(x, 'shape', ())
        if len(shape) < 2 or int(np.prod(shape)) < min_shard_size:
            return P()
        if shape[-1] % mp == 0:
            return P(*([None] * (len(shape) - 1)), axis_name)
        if shape[-2] % mp == 0:
            return P(*([None] * (len(shape) - 2)), axis_name, None)
        return P()

    return jax.tree.map(spec_for, params)


def shard_params(params, mesh, specs=None, mp_axis='mp'):
    """Place params on the mesh with channel shardings.

    Returns the sharded pytree; pass it to a jitted ``tx.init`` and the
    step function so shardings propagate (no explicit ``in_shardings``
    needed — placement is the annotation).
    """
    if specs is None:
        mp = mesh.shape[mp_axis]
        specs = infer_tp_specs(params, mp, axis_name=mp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_batch_2d(batch, mesh):
    """Shard the leading (batch) axis over ``dp``, replicate over ``mp``."""
    sharding = NamedSharding(mesh, P('dp'))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree.map(partial(jax.device_put, device=sharding), batch)


def make_tp_train_state(model, mesh, tx, rng=None, mp_axis='mp'):
    """Init + shard a ``{'params', 'opt_state', 'rng'}`` train state.

    Params get channel shardings over ``mp``; the optimizer moments
    inherit them by running ``tx.init`` under jit on the placed params.
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng
    variables = model.init_variables(rng)
    params = shard_params(variables['params'], mesh, mp_axis=mp_axis)
    opt_state = jax.jit(tx.init)(params)
    state = {
        'params': params,
        'opt_state': opt_state,
        'rng': jax.device_put(
            jax.random.PRNGKey(1), NamedSharding(mesh, P())),
    }
    aux = {k: jax.device_put(v, NamedSharding(mesh, P()))
           for k, v in variables.items() if k != 'params'}
    return state, aux


def make_tp_step(step_fn, donate_state=True):
    """Jit a step whose arrays already carry mesh shardings.

    Placement is the annotation: ``jax.jit`` reads the argument
    shardings (channel-sharded params, dp-sharded batch) and GSPMD
    partitions the whole step, inserting the gradient ``psum`` over
    ``dp`` and the activation collectives over ``mp``.
    """
    return jax.jit(
        step_fn, donate_argnums=(0,) if donate_state else ())


def sharded_size(x):
    """Per-device element count of a (possibly sharded) jax array —
    test/diagnostic helper to assert a tree is actually distributed."""
    shards = getattr(x, 'addressable_shards', None)
    if not shards:
        return int(np.prod(x.shape))
    return int(np.prod(shards[0].data.shape))
