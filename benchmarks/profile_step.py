"""Per-op profile of one arch's train step on the live backend.

Builds the same train step as ``bench_models.bench_arch`` (bf16 amp,
Adam + global-norm clip), runs N steps under ``jax.profiler.trace``
and aggregates device-track op durations from the generated perfetto
trace (stdlib json parsing; no tensorboard dependency).

Usage: python benchmarks/profile_step.py [arch] [n_steps]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from benchmarks.bench_models import ARCH_BATCH, BATCH, FS, SECONDS  # noqa: E402
from brever_tpu.models import ModelRegistry  # noqa: E402
from brever_tpu.models.base import sample_weighted_mean  # noqa: E402


def build_step(arch):
    """(step_fn, state, batch, lengths) mirroring bench_arch's setup."""
    model = ModelRegistry.get(arch)()
    batch_size = ARCH_BATCH.get(arch, BATCH)
    if arch == 'tfgridnet':
        import dataclasses
        model.module = dataclasses.replace(
            model.module, remat=False, scan_blocks=False)
    if arch in ('sgmsepm', 'sgmsep', 'idmse'):
        import dataclasses
        model.module = dataclasses.replace(model.module, remat=False)
        model.model.net = model.module
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    aux = {k: v for k, v in variables.items() if k != 'params'}
    tx = model.optimizer()
    if model.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(model.grad_clip), tx)
    state = {
        'params': variables['params'],
        'opt_state': tx.init(variables['params']),
        'rng': jax.random.PRNGKey(1),
    }
    state = jax.tree.map(
        lambda x: jax.lax.convert_element_type(x, x.dtype), state)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(
        rng.randn(batch_size, 2, 2, SECONDS * FS).astype('float32'))
    lengths = jnp.full((batch_size,), SECONDS * FS, dtype=jnp.int32)

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def train_step(state, batch, lengths):
        rng, step_rng = jax.random.split(state['rng'])

        def loss_fn(params):
            out = model.loss({'params': cast(params), **aux},
                             cast(batch), lengths, step_rng, train=True)
            per_item = out[0] if isinstance(out, tuple) else out
            if isinstance(per_item, dict):
                per_item = sum(per_item.values())
            return sample_weighted_mean(
                per_item.astype(jnp.float32), lengths)

        loss, grads = jax.value_and_grad(loss_fn)(state['params'])
        updates, opt_state = tx.update(
            grads, state['opt_state'], state['params'])
        params = optax.apply_updates(state['params'], updates)
        return ({'params': params, 'opt_state': opt_state, 'rng': rng},
                loss)

    return jax.jit(train_step), state, batch, lengths


def aggregate_trace(trace_dir, n_steps):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, '**', '*.trace.json.gz'), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print('no trace found under', trace_dir)
        return
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            pid_name[e['pid']] = e.get('args', {}).get('name', '')
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tid_name[(e['pid'], e['tid'])] = \
                e.get('args', {}).get('name', '')
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get('ph') != 'X':
            continue
        tname = tid_name.get((e['pid'], e['tid']), '')
        if 'XLA Ops' not in tname:
            continue
        dur = e.get('dur', 0) / 1e3  # us -> ms
        agg[e['name']] += dur
        cnt[e['name']] += 1
        total += dur
    if not agg:
        print('no XLA Ops events; tracks seen:')
        seen = sorted({(pid_name.get(p, p), t)
                       for (p, _), t in tid_name.items()})
        for p, t in seen[:40]:
            print('  ', p, '/', t)
        return
    print(f'# device op time: {total / n_steps:.2f} ms/step '
          f'({n_steps} steps)')
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    shown = 0.0
    for name, dur in rows[:45]:
        print(f'{dur / n_steps:9.3f} ms  x{cnt[name] // n_steps:<4d} '
              f'{name[:110]}')
        shown += dur
    rest = total - shown
    if rest > 0:
        print(f'{rest / n_steps:9.3f} ms  (remaining '
              f'{len(rows) - 45} ops)')
    # attribute the tail: aggregate ALL ops by category (instruction
    # name with trailing `.NNN` indices stripped) so dispatch-bound
    # steps show where the thousands of tiny ops live
    import re
    cat_agg = defaultdict(float)
    cat_cnt = defaultdict(int)
    for name, dur in agg.items():
        cat = re.sub(r'[.\d]+$', '', name)
        cat_agg[cat] += dur
        cat_cnt[cat] += cnt[name]
    print('# by category (all ops)')
    for cat, dur in sorted(cat_agg.items(), key=lambda kv: -kv[1])[:40]:
        n = cat_cnt[cat] // n_steps
        print(f'{dur / n_steps:9.3f} ms  x{n:<5d} '
              f'avg {dur / max(cat_cnt[cat], 1) * 1e3:7.1f} us  {cat[:90]}')


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else 'convtasnet'
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    step, state, batch, lengths = build_step(arch)
    t0 = time.perf_counter()
    state, loss = step(state, batch, lengths)
    print(f'# {arch}: compiled+first step in '
          f'{time.perf_counter() - t0:.1f}s', flush=True)
    float(loss)

    trace_dir = os.environ.get('PROFILE_DIR', '/tmp/brever_profile')
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, loss = step(state, batch, lengths)
        float(loss)
    aggregate_trace(trace_dir, n_steps)


if __name__ == '__main__':
    main()
