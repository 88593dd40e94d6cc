"""Host-vs-device metric scoring benchmark.

Usage: python benchmarks/bench_metrics.py [batch] [seconds]

Times one validation-batch scoring pass per metric: the host f64
implementations (what the reference pipeline does: fetch enhanced audio
to the host, score with pystoi/pesq equivalents) against the on-device
jax twins (brever_tpu.metrics_device; only per-item scalars leave the
device). On the tunneled TPU backend the host path additionally pays
the ~0.08 MB/s d2h fetch of the audio itself — timed separately below.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    fs = 16000
    rng = np.random.RandomState(0)
    t = seconds * fs
    ref = rng.randn(batch, t).astype('float32')
    deg = (ref + 0.3 * rng.randn(batch, t)).astype('float32')
    lengths = np.linspace(t // 2, t, batch).astype('int32')

    from brever_tpu import metrics as host
    from brever_tpu import metrics_device as dev

    ref_d = jax.device_put(ref)
    deg_d = jax.device_put(deg)
    len_d = jax.device_put(lengths)

    print(f'# device: {jax.devices()[0].device_kind}, batch {batch} x '
          f'{seconds}s @ 16 kHz', flush=True)

    # d2h fetch cost of the enhanced batch (what host scoring pays
    # before any metric work)
    t0 = time.perf_counter()
    np.asarray(deg_d)
    fetch_s = time.perf_counter() - t0
    print(f'd2h fetch of the batch: {fetch_s:.2f} s', flush=True)

    pairs = [
        ('estoi', lambda: host.estoi(deg, ref, lengths=lengths),
         lambda: dev.estoi_device(deg_d, ref_d, lengths=len_d)),
        ('stoi', lambda: host.stoi(deg, ref, lengths=lengths),
         lambda: dev.stoi_device(deg_d, ref_d, lengths=len_d)),
        ('pesq', lambda: host.pesq(deg, ref, lengths=lengths),
         lambda: dev.pesq_device(deg_d, ref_d, lengths=len_d)),
    ]
    # warm the host spawn pool at FULL batch width once so its startup
    # (pool size = min(batch, 8); each worker imports numpy/scipy —
    # ~30 s on a 1-core host) is not billed to the first metric
    host.estoi(deg[:, :8000], ref[:, :8000],
               lengths=np.full(batch, 8000, 'int32'))
    for name, host_fn, dev_fn in pairs:
        t0 = time.perf_counter()
        hv = np.asarray(host_fn())
        host_s = time.perf_counter() - t0
        np.asarray(dev_fn())              # compile + warmup
        t0 = time.perf_counter()
        dv = np.asarray(dev_fn())
        dev_s = time.perf_counter() - t0
        dmax = float(np.nanmax(np.abs(hv - dv)))
        print(f'{name}: host {host_s:.2f} s, device {dev_s * 1e3:.0f} '
              f'ms ({host_s / dev_s:.0f}x), max |d| {dmax:.2e}',
              flush=True)


if __name__ == '__main__':
    main()
