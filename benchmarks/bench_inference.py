"""Inference benchmark: enhancement latency and real-time factor.

Usage: python benchmarks/bench_inference.py [arch ...]

Per architecture: jitted ``_enhance`` on batch 1 and batch 8 of 4 s
clips (the serving shapes), reporting wall latency and RTF =
audio-seconds enhanced per wall second. For causal Conv-TasNet the
chunked streaming step (brever_tpu.streaming) is benched too: per-chunk
latency at a 64 ms chunk is the number a live system cares about.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from brever_tpu.models import ModelRegistry  # noqa: E402

SECONDS, FS = 4, 16000
DEFAULT_ARCHS = ['convtasnet', 'dccrn', 'ffnn', 'tfgridnet', 'manner',
                 'metricganokd']


_FENCE = jax.jit(lambda y: jnp.sum(y))


def _time(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)          # compile + warmup
    # fence EVERY iteration with a scalar d2h fetch: that is the
    # latency a serving system pays before it can use the result.
    # block_until_ready alone is NOT a reliable fence on the axon
    # backend: round 3 measured 0.2 ms batch-8 convtasnet with an
    # end-of-loop block, round 4 still measured 0.3 ms with a
    # per-iteration block (vs the ~30 ms tunnel round-trip floor every
    # other arch shows) — the ready-wait can complete without a device
    # round trip. A scalar fetch cannot. The fetch itself costs one
    # RTT; it is part of the serving latency being measured. The fence
    # reduction is pre-jitted and warmed OUTSIDE the loop: an eager
    # jnp.sum compiles one tiny program per new output shape, and on
    # the tunneled backend that mid-loop compile costs seconds (the
    # first scalar-fence run read 11.7 s/call for convtasnet batch 1 —
    # one ~2 min sum compile averaged over 10 iterations).
    float(_FENCE(out))                  # warm the fence for this shape
    t0 = time.perf_counter()
    for _ in range(n):
        float(_FENCE(fn(*args)))
    return (time.perf_counter() - t0) / n


def bench_enhance(arch, batch):
    model = ModelRegistry.get(arch)()
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(
        batch, 2, SECONDS * FS).astype('float32')
    dt = _time(lambda v, x: model.enhance(v, x), variables,
               jax.device_put(x))
    rtf = batch * SECONDS / dt
    print(f'{arch}: enhance batch {batch}: {dt * 1e3:.1f} ms '
          f'({rtf:.0f}x real time)', flush=True)


def bench_streaming(chunk_ms=64):
    from brever_tpu.streaming import StreamingEnhancer

    model = ModelRegistry.get('convtasnet')(causal=True)
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    chunk = int(chunk_ms * FS / 1000)
    chunk -= chunk % (model.module.filter_length // 2)
    enhancer = StreamingEnhancer(model, variables, chunk_samples=chunk)
    state = enhancer.init_state(batch_size=1)
    x = np.random.RandomState(0).randn(1, chunk).astype('float32')
    state, out = enhancer.step(state, x)      # compile + warmup
    float(_FENCE(out))                        # warm the fence too
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        state, out = enhancer.step(state, x)
        float(_FENCE(out))                    # true per-chunk fence
    dt = (time.perf_counter() - t0) / n
    budget = chunk / FS
    print(f'convtasnet-causal streaming: {chunk / FS * 1e3:.0f} ms '
          f'chunks in {dt * 1e3:.2f} ms/step '
          f'({budget / dt:.0f}x real time)', flush=True)


def bench_streaming_dccrn(chunk_ms=64):
    from brever_tpu.streaming import StreamingDCCRN

    model = ModelRegistry.get('dccrn')()
    variables = jax.jit(model.init_variables)(jax.random.PRNGKey(0))
    hop = model.stft.hop_length
    chunk = int(chunk_ms * FS / 1000) // hop * hop
    se = StreamingDCCRN(model, variables, chunk_samples=chunk)
    state = se.init_state(batch_size=1)
    x = np.random.RandomState(0).randn(1, chunk).astype('float32')
    state, out = se.step(state, x)
    float(_FENCE(out))                        # warm the fence too
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        state, out = se.step(state, x)
        float(_FENCE(out))                    # true per-chunk fence
    dt = (time.perf_counter() - t0) / n
    budget = chunk / FS
    print(f'dccrn streaming: {chunk / FS * 1e3:.0f} ms chunks in '
          f'{dt * 1e3:.2f} ms/step ({budget / dt:.0f}x real time)',
          flush=True)


def main():
    archs = sys.argv[1:] or DEFAULT_ARCHS
    print(f'# device: {jax.devices()[0].device_kind}', flush=True)
    for arch in archs:
        for batch in (1, 8):
            try:
                bench_enhance(arch, batch)
            except Exception as e:
                print(f'# {arch} batch {batch}: failed '
                      f'({type(e).__name__}: {e})', file=sys.stderr,
                      flush=True)
    if 'convtasnet' in archs:
        bench_streaming()
    if 'dccrn' in archs:
        bench_streaming_dccrn()


if __name__ == '__main__':
    main()
