"""Host-vs-device metric scoring benchmark.

Usage: python benchmarks/bench_metrics.py [batch] [seconds]

Times one validation-batch scoring pass per metric: the host f64
implementations (what the reference pipeline does: fetch enhanced audio
to the host, score with pystoi/pesq equivalents) against the on-device
jax twins (brever_tpu.metrics_device; only per-item scalars leave the
device). On the tunneled TPU backend the host path additionally pays
the ~0.08 MB/s d2h fetch of the audio itself — timed separately below.

Ordering is timeout-robust (round 3 hit rc=124 before printing a single
number): device twins first (cheap), then the d2h fetch, then host
scoring metric-by-metric with incremental prints.
BENCH_METRICS_HOST_ITEMS caps how many batch items the (serial, 1-core)
host path scores — per-item cost is what matters and is printed; the
parity check uses the same subset.
BENCH_METRICS_KEYS selects which metrics run (comma list of
estoi/stoi/pesq; default all) so each device-twin compile — 700+ s
each over the tunnel — can get its own runbook timeout budget.
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
    host_items = int(os.environ.get('BENCH_METRICS_HOST_ITEMS', '8'))
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
          f'{seconds}s @ 16 kHz, host items capped at {host_items}',
          flush=True)

    # ---- device twins first: compile + one timed steady-state pass
    dev_fns = {
        'estoi': lambda: dev.estoi_device(deg_d, ref_d, lengths=len_d),
        'stoi': lambda: dev.stoi_device(deg_d, ref_d, lengths=len_d),
        'pesq': lambda: dev.pesq_device(deg_d, ref_d, lengths=len_d),
    }
    keys = [k.strip() for k in os.environ.get(
        'BENCH_METRICS_KEYS', ','.join(dev_fns)).split(',') if k.strip()]
    dev_fns = {k: dev_fns[k] for k in keys}
    dev_vals, dev_times = {}, {}
    for name, fn in dev_fns.items():
        t0 = time.perf_counter()
        np.asarray(fn())              # compile + warmup
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        dev_vals[name] = np.asarray(fn())
        dev_times[name] = time.perf_counter() - t0
        print(f'{name}: device {dev_times[name] * 1e3:.0f} ms '
              f'(compile+first {compile_s:.1f} s)', flush=True)

    # ---- d2h fetch cost of the enhanced batch (what host scoring pays
    # before any metric work)
    t0 = time.perf_counter()
    np.asarray(deg_d)
    fetch_s = time.perf_counter() - t0
    print(f'd2h fetch of the batch: {fetch_s:.2f} s', flush=True)

    # ---- host scoring on a bounded item subset, serial on this
    # 1-core host (the spawn pool declines; per-item time is the
    # meaningful number)
    k = min(host_items, batch)
    lens_k = lengths[:k]
    host_fns = {
        'estoi': lambda: host.estoi(deg[:k], ref[:k], lengths=lens_k),
        'stoi': lambda: host.stoi(deg[:k], ref[:k], lengths=lens_k),
        'pesq': lambda: host.pesq(deg[:k], ref[:k], lengths=lens_k),
    }
    host_fns = {k: host_fns[k] for k in keys}
    for name, fn in host_fns.items():
        t0 = time.perf_counter()
        hv = np.asarray(fn())
        host_s = time.perf_counter() - t0
        per_item = host_s / k
        full_est = fetch_s + per_item * batch
        dmax = float(np.nanmax(np.abs(hv - dev_vals[name][:k])))
        dev_s = dev_times[name]
        print(f'{name}: host {host_s:.2f} s for {k} items '
              f'({per_item:.2f} s/item; full batch incl. d2h est. '
              f'{full_est:.1f} s = {full_est / dev_s:.0f}x device), '
              f'max |d| vs device {dmax:.2e}', flush=True)


if __name__ == '__main__':
    main()
