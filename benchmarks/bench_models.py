"""Per-architecture TPU train-step benchmark (scan-amortized, bf16).

Usage: python benchmarks/bench_models.py [arch ...]
Prints ms/step and steps/s for each architecture at the standard
workload (batch 16 x 4 s @ 16 kHz, full fwd+bwd+optimizer update).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from brever_tpu.models import ModelRegistry  # noqa: E402
from brever_tpu.models.base import sample_weighted_mean  # noqa: E402

BATCH, SECONDS, FS = 16, 4, 16000

# memory-bound architectures run at a smaller batch on one 16 GB v5e
# (the reference's dynamic batching would produce small batches for
# them anyway); steps/s are reported at the actual batch used
ARCH_BATCH = {
    'tfgridnet': 4,
    'sgmsepm': 4,
    'dccrn': 16,
}


def bench_arch(arch, n_steps=10, use_bf16=True):
    model = ModelRegistry.get(arch)()
    batch_size = ARCH_BATCH.get(arch, BATCH)
    variables = model.init_variables(jax.random.PRNGKey(0))
    aux = {k: v for k, v in variables.items() if k != 'params'}
    tx = model.optimizer()
    if model.grad_clip and not isinstance(tx, dict):
        tx = optax.chain(optax.clip_by_global_norm(model.grad_clip), tx)
    if isinstance(tx, dict):
        print(f'{arch}: skipped (multi-optimizer GAN; host scoring '
              'between phases)')
        return None
    state = {
        'params': variables['params'],
        'opt_state': tx.init(variables['params']),
        'rng': jax.random.PRNGKey(1),
    }
    rng = np.random.RandomState(0)
    batch = jnp.asarray(
        rng.randn(batch_size, 2, 2, SECONDS * FS).astype('float32'))
    lengths = jnp.full((batch_size,), SECONDS * FS, dtype=jnp.int32)

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def train_step(state, _):
        rng, step_rng = jax.random.split(state['rng'])

        def loss_fn(params):
            p = cast(params) if use_bf16 else params
            b = cast(batch) if use_bf16 else batch
            out = model.loss({'params': p, **aux}, b, lengths, step_rng,
                             train=True)
            per_item = out[0] if isinstance(out, tuple) else out
            if isinstance(per_item, dict):
                per_item = sum(per_item.values())
            return sample_weighted_mean(
                per_item.astype(jnp.float32), lengths)

        loss, grads = jax.value_and_grad(loss_fn)(state['params'])
        updates, opt_state = tx.update(
            grads, state['opt_state'], state['params'])
        params = optax.apply_updates(state['params'], updates)
        return {'params': params, 'opt_state': opt_state, 'rng': rng}, loss

    @jax.jit
    def run(state):
        return jax.lax.scan(train_step, state, None, length=n_steps)

    # warm up to the jit-signature fixed point: weak-type churn in the
    # carried optimizer state can trigger recompiles on the first 2-3
    # calls (measured: 3 distinct signatures before stabilizing)
    compile_s = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run(state)
        float(losses[-1])
        compile_s += time.perf_counter() - t0
    t0 = time.perf_counter()
    state, losses = run(state)
    float(losses[-1])
    step_ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(f'{arch}: batch {batch_size}: {step_ms:.1f} ms/step '
          f'({1e3 / step_ms:.2f} steps/s, '
          f'{batch_size * SECONDS * 1e3 / step_ms:.0f} audio-s/s), '
          f'compile {compile_s:.0f} s')
    return step_ms


def main():
    archs = sys.argv[1:] or ['convtasnet', 'dccrn', 'ffnn', 'tfgridnet',
                             'manner', 'sgmsepm']
    for arch in archs:
        try:
            bench_arch(arch)
        except Exception as e:
            print(f'{arch}: failed ({type(e).__name__}: {e})')


if __name__ == '__main__':
    main()
