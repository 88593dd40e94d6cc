"""Per-kernel flash-TCN microbenchmark (TPU): fwd / fwd+bwd ms per
block at the model's benchmark shapes, per dilation and time tile.

Isolates the Pallas kernel from the rest of the model so the tile
sweep and any pipelining experiments have a direct per-block signal
(the model-level sweep in r3_measure.sh only sees the 24-block sum).

Usage: python benchmarks/bench_tcn_kernel.py [dilation ...]
Env: BREVER_TCN_TILE (sweep externally), BENCH_T (default 4000 frames),
BENCH_BATCH (default 16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from brever_tpu.ops.pallas import tcn_block as tcn  # noqa: E402

B = int(os.environ.get('BENCH_BATCH', '16'))
T = int(os.environ.get('BENCH_T', '4000'))
C, H, CS = 128, 512, 128
N_CALLS = 20


def make_params(rng):
    def r(*shape):
        return jnp.asarray(rng.randn(*shape).astype('float32') * 0.05,
                           jnp.bfloat16)
    return (r(C, H), r(H), jnp.float32(0.2), r(H), r(H),
            r(3, H), r(H), jnp.float32(0.2), r(H), r(H),
            r(H, C), r(C), r(H, CS), r(CS))


def _drain(out):
    """Force a device round trip: on the tunneled backend
    ``block_until_ready`` does NOT wait for execution (see
    bench_inference.py, r4 'inference_scalar_fence' rerun) — only a
    d2h fetch of a value does. Execution is in-order, so fetching one
    scalar of the LAST output drains the whole queue."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def bench(fn, *args):
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / N_CALLS * 1e3


def main():
    dilations = [int(d) for d in sys.argv[1:]] or [1, 4, 8, 32, 128]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype('float32'), jnp.bfloat16)
    params = make_params(rng)
    tile = tcn.DEFAULT_TILE
    print(f'# B={B} T={T} tile={tile} '
          f'device={jax.devices()[0].device_kind}')
    for d in dilations:
        fwd = jax.jit(lambda x, p, d=d: tcn.tcn_block_fused(
            x, p, d, False))

        def loss(x, p, d=d):
            res, skip = tcn.tcn_block_fused(x, p, d, False)
            return (res.astype(jnp.float32).sum()
                    + skip.astype(jnp.float32).sum())

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_fwd = bench(fwd, x, params)
        t_both = bench(grad, x, params)
        variant = 'scratch' if d % 8 == 0 else 'recompute'
        print(f'd={d:4d} fwd {t_fwd:7.3f} ms   fwd+bwd {t_both:7.3f} ms'
              f'   (bwd variant: {variant})', flush=True)


if __name__ == '__main__':
    main()
