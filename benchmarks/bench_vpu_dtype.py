"""Micro-benchmark: VPU elementwise throughput, f32 vs bf16.

Decides whether reformulating the flash-TCN backward's elementwise
passes in bf16 (select/copysign forms instead of compares, which
Mosaic cannot lower in bf16) can beat the measured ~54-f32-op/element
ALU roofline (PERF.md): if the VPU does NOT run bf16 mul/add at 2x
f32 rate, the whole bf16-backward direction is dead on arrival and
the ~40 ms Conv-TasNet wall stands as structural.

One Pallas kernel per dtype: K chained multiply-adds over a
VMEM-resident (8, 1024, 512) block (no HBM traffic inside the loop),
fenced with a scalar fetch. Prints ns/element/op and the bf16:f32
ratio.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, T, H = 8, 1024, 512
K = 64  # chained ops per element per pass
PASSES = 8


def _kernel(x_ref, o_ref, *, k, passes):
    x = x_ref[...]
    acc = x
    for _ in range(passes):
        for i in range(k // 2):
            acc = acc * x + x      # 2 ops (mul + add), FMA-able
    o_ref[...] = acc


def bench(dtype):
    x = jnp.asarray(
        np.random.RandomState(0).rand(ROWS, T, H) * 0.001 + 0.5, dtype)
    f = pl.pallas_call(
        functools.partial(_kernel, k=K, passes=PASSES),
        out_shape=jax.ShapeDtypeStruct((ROWS, T, H), dtype),
        grid=(ROWS,),
        in_specs=[pl.BlockSpec((1, T, H), lambda r: (r, 0, 0))],
        out_specs=pl.BlockSpec((1, T, H), lambda r: (r, 0, 0)),
        interpret=os.environ.get('VPU_INTERPRET') == '1',
    )
    g = jax.jit(f)
    t0 = time.time()
    out = g(x)
    _ = float(jnp.sum(out[..., :1]))  # fence via scalar fetch
    compile_s = time.time() - t0
    n_rep = 20
    t0 = time.time()
    for _ in range(n_rep):
        out = g(x)
    _ = float(jnp.sum(out[..., :1]))
    dt = (time.time() - t0) / n_rep
    n_ops = ROWS * T * H * K * PASSES
    return dt, n_ops / dt / 1e12, compile_s


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        dt, tops, comp = bench(dtype)
        print(f'{jnp.dtype(dtype).name}: {dt*1e3:.3f} ms/iter, '
              f'{tops:.3f} Top/s (compile {comp:.1f} s)', flush=True)


if __name__ == '__main__':
    main()
