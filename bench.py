"""Benchmark: Conv-TasNet training step rate on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the reference implementation's
PyTorch training step on this host's CPU (the only reference hardware
available here; the reference repo publishes no benchmark numbers —
see BASELINE.md). Falls back to null when torch or the reference model
cannot be loaded.

Workload: batch 16 x 4 s @ 16 kHz mono, full forward+backward+Adam
update, grad-clip 5.0 — the Conv-TasNet/VB+DEMAND-shaped step from
BASELINE.json.
"""

import json
import os
import sys
import time

BATCH = 16
SECONDS = 4
FS = 16000


def bench_jax():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from brever_tpu.models import ModelRegistry
    from brever_tpu.models.base import sample_weighted_mean

    model = ModelRegistry.get('convtasnet')()
    variables = model.init_variables(jax.random.PRNGKey(0))
    tx = optax.chain(
        optax.clip_by_global_norm(model.grad_clip), model.optimizer())
    state = {
        'params': variables['params'],
        'opt_state': tx.init(variables['params']),
        'rng': jax.random.PRNGKey(1),
    }

    rng = np.random.RandomState(0)
    batch = jnp.asarray(
        rng.randn(BATCH, 2, 2, SECONDS * FS).astype('float32'))
    lengths = jnp.full((BATCH,), SECONDS * FS, dtype=jnp.int32)

    def train_step(state, _):
        rng, step_rng = jax.random.split(state['rng'])

        def loss_fn(params):
            # bf16 compute (the recommended TPU configuration; master
            # params and grads stay fp32)
            p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            per_item = model.loss(
                {'params': p16}, batch.astype(jnp.bfloat16), lengths,
                step_rng, train=True)
            return sample_weighted_mean(
                per_item.astype(jnp.float32), lengths)

        loss, grads = jax.value_and_grad(loss_fn)(state['params'])
        updates, opt_state = tx.update(
            grads, state['opt_state'], state['params'])
        params = optax.apply_updates(state['params'], updates)
        return {'params': params, 'opt_state': opt_state, 'rng': rng}, loss

    # time N steps chained inside one jit (lax.scan): per-call dispatch
    # over a remote-tunneled backend costs ~15 ms and block_until_ready
    # is not a reliable fence, so amortized+fetched timing is the honest
    # device number
    n_steps = 10

    @jax.jit
    def run_steps(state):
        return jax.lax.scan(train_step, state, None, length=n_steps)

    # warm up to the jit-signature fixed point (weak-type churn in the
    # carried state can recompile the first couple of calls)
    for _ in range(3):
        state, losses = run_steps(state)
        float(losses[-1])
    t0 = time.perf_counter()
    state, losses = run_steps(state)
    float(losses[-1])                  # host fetch = sync fence
    elapsed = time.perf_counter() - t0
    return n_steps / elapsed, str(jax.devices()[0])


def bench_torch_reference():
    """Reference-architecture PyTorch step rate on this host's CPU.

    A single step takes ~4 minutes on this machine, so the measurement
    is cached in benchmarks/baseline_torch_cpu.json; set
    BENCH_REMEASURE_TORCH=1 to re-measure live.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, 'benchmarks', 'baseline_torch_cpu.json')
    if not os.environ.get('BENCH_REMEASURE_TORCH') \
            and os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)['steps_per_sec']

    import numpy as np
    import torch

    sys.path.insert(0, here)
    from benchmarks.torch_convtasnet import TorchConvTasNet

    torch.manual_seed(0)
    model = TorchConvTasNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.from_numpy(
        np.random.RandomState(0).randn(BATCH, SECONDS * FS)
        .astype('float32'))
    y = torch.from_numpy(
        np.random.RandomState(1).randn(BATCH, 1, SECONDS * FS)
        .astype('float32'))

    def step():
        opt.zero_grad()
        out = model(x)
        eps = 1e-7
        num = (y**2).sum(-1)
        den = ((y - out)**2).sum(-1) + eps
        loss = (-10 * torch.log10(num / den + eps)).mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()

    t0 = time.perf_counter()
    step()
    return 1.0 / (time.perf_counter() - t0)


def main():
    value, device = bench_jax()
    try:
        baseline = bench_torch_reference()
        vs_baseline = value / baseline
    except Exception as e:
        print(f'# torch baseline unavailable: {e}', file=sys.stderr)
        vs_baseline = None
    print(json.dumps({
        'metric': f'convtasnet_train_steps_per_sec '
                  f'(batch {BATCH} x {SECONDS}s @ {FS}Hz, bf16, {device}; '
                  'vs torch-CPU reference arch fp32)',
        'value': round(value, 4),
        'unit': 'steps/s',
        'vs_baseline': round(vs_baseline, 4)
        if vs_baseline is not None else None,
    }))


if __name__ == '__main__':
    main()
