"""Optimized-HLO byte census of one training step on the live backend.

Usage: python benchmarks/hlo_census.py [arch] [top_n]

Compiles ONE train step (same construction as bench_models.bench_arch:
bf16 cast, optax update, no scan) and prints output-buffer bytes by
opcode plus the largest individual instructions. This answers "where do
the 251 GB/step of sgmsepm go" at the compiler's own accounting level —
`cost_analysis()` is aggregate-only, so the census parses the optimized
module text instead.
"""

import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

DT_BYTES = {'f32': 4, 'bf16': 2, 'f64': 8, 's32': 4, 'pred': 1,
            'u32': 4, 'c64': 8, 's64': 8, 'u8': 1, 's8': 1, 'f16': 2,
            'u64': 8, 's16': 2, 'u16': 2, 'c128': 16}
_INSTR = re.compile(
    r'^\s*(?:ROOT\s+)?%?([\w.-]+) = ([a-z0-9]+)\[([\d,]*)\]'
    r'[^=]*? ([\w-]+)\(')
_COMP = re.compile(r'^(?:ENTRY )?%?([\w.-]+) \(.*\{\s*$')
_META = re.compile(r'op_name="([^"]*)"')
# computations whose instructions are NOT HBM-materialized: fusion
# bodies, XLA's single-op wrappers, and reduce/scatter/sort lambda
# bodies. Everything else (ENTRY, while bodies, called computations)
# writes its instruction outputs to real buffers.
_VIRTUAL = ('fused_computation', 'wrapped_', 'region_')
# ops whose "output" aliases an existing buffer and writes nothing to
# HBM: bitcast/GTE/tuple are pure aliasing, and the -done half of an
# async pair aliases the buffer its -start allocated (counting both
# would double-count every async copy/collective).  Earlier census
# logs (r4_measure.log before 2026-08-19 late) include these; their
# "materialized" totals read ~30-50% high as a result.
_ALIAS_OPS = ('bitcast', 'get-tuple-element', 'tuple', 'copy-done',
              'async-done', 'all-reduce-done', 'all-gather-done',
              'collective-permute-done')


def _group(op_name):
    """Collapse an op_name path to an attributable module path: strip
    the jit wrapper, drop the trailing primitive, merge block indices
    (enc_3_1 -> enc_#_#) and autodiff wrappers."""
    if not op_name:
        return '(no metadata)'
    parts = op_name.split('/')
    if parts and parts[0].startswith('jit('):
        parts = parts[1:]
    bwd = any('transpose(' in p for p in parts)
    parts = [p for p in parts
             if not re.fullmatch(r'(transpose\()?j?vp\(.*\)+', p)]
    if len(parts) > 1:
        parts = parts[:-1]                      # drop the primitive
    parts = [re.sub(r'\d+', '#', p) for p in parts]
    path = '/'.join(parts[-4:])
    return ('bwd ' if bwd else 'fwd ') + path


def census(txt, top_n=12):
    by_op = collections.Counter()
    n_op = collections.Counter()
    by_src = collections.Counter()
    n_src = collections.Counter()
    biggest = []
    material = True
    for line in txt.splitlines():
        mc = _COMP.match(line)
        if mc:
            material = not mc.group(1).startswith(_VIRTUAL)
            continue
        if not material:
            continue
        m = _INSTR.match(line)
        if not m:
            continue
        name, dt, shape, op = m.groups()
        if dt not in DT_BYTES or op == 'parameter':
            continue
        if op in _ALIAS_OPS:
            continue
        n = 1
        for s in shape.split(','):
            if s:
                n *= int(s)
        b = n * DT_BYTES[dt]
        by_op[f'{op}:{dt}'] += b
        n_op[f'{op}:{dt}'] += 1
        mm = _META.search(line)
        src = _group(mm.group(1) if mm else '')
        by_src[src] += b
        n_src[src] += 1
        biggest.append((b, f'{op} {dt}[{shape}] {name} <- {src}'))
    total = sum(by_op.values())
    print(f'# materialized output-buffer bytes (HBM writes): '
          f'{total / 1e9:.1f} GB')
    print('# by op:dtype')
    for k, b in by_op.most_common(top_n):
        print(f'{k:28s} {b / 1e9:9.3f} GB  x{n_op[k]}', flush=True)
    print('# by source module (op_name metadata)')
    for k, b in by_src.most_common(top_n * 2):
        print(f'{b / 1e9:9.3f} GB  x{n_src[k]:<5d} {k[:90]}', flush=True)
    print('# largest single instructions')
    biggest.sort(reverse=True)
    seen = set()
    shown = 0
    for b, desc in biggest:
        key = desc.split(' ')[0] + desc.split('[')[1].split(']')[0]
        if key in seen:
            continue
        seen.add(key)
        print(f'{b / 1e6:9.1f} MB  {desc[:150]}', flush=True)
        shown += 1
        if shown >= top_n:
            break


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else 'sgmsepm'
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from benchmarks.bench_models import ARCH_BATCH, BATCH, FS, SECONDS
    from brever_tpu.models import ModelRegistry
    from brever_tpu.models.base import sample_weighted_mean

    model = ModelRegistry.get(arch)()
    batch_size = ARCH_BATCH.get(arch, BATCH)
    if arch in ('sgmsepm', 'sgmsep', 'idmse', 'tfgridnet'):
        import dataclasses
        model.module = dataclasses.replace(model.module, remat=False)
        if hasattr(model, 'model'):
            model.model.net = model.module
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    aux = {k: v for k, v in variables.items() if k != 'params'}
    tx = model.optimizer()
    if model.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(model.grad_clip), tx)
    state = {'params': variables['params'],
             'opt_state': tx.init(variables['params']),
             'rng': jax.random.PRNGKey(1)}
    rng = np.random.RandomState(0)
    batch = jnp.asarray(
        rng.randn(batch_size, 2, 2, SECONDS * FS).astype('float32'))
    lengths = jnp.full((batch_size,), SECONDS * FS, dtype=jnp.int32)

    def cast(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def train_step(state):
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
        return {'params': params, 'opt_state': opt_state,
                'rng': rng}, loss

    t0 = time.perf_counter()
    compiled = jax.jit(train_step).lower(state).compile()
    print(f'# {arch}: compiled in {time.perf_counter() - t0:.1f}s on '
          f'{jax.devices()[0].device_kind}', flush=True)
    try:
        ca = compiled.cost_analysis()
        print(f'# aggregate: flops {ca.get("flops", 0) / 1e12:.2f} T, '
              f'bytes {ca.get("bytes accessed", 0) / 1e9:.1f} GB',
              flush=True)
    except Exception as e:
        print(f'# cost_analysis failed: {e}', flush=True)
    census(compiled.as_text(), top_n)


if __name__ == '__main__':
    main()
