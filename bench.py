"""Benchmark driver: TPU train-step timing, FLOPs and MFU.

Prints ONE JSON line with the headline Conv-TasNet number:

    {"metric", "value" (steps/s), "unit", "vs_baseline" (= MFU, the
     fraction of the device's dense-bf16 peak the step sustains),
     "archs" (per-architecture detail)}

``vs_baseline`` is the model-FLOPs-utilization of the flagship step —
the honest efficiency measure on this hardware. The reference repo
publishes no benchmark numbers (BASELINE.md) and no reference GPU is
reachable here, so a speed *ratio* against the reference would have to
compare against the reference architecture on this host's CPU, which
is degenerate (>1000x) and says nothing.

Budget design (round 3): the driver gives this script ~10 minutes on a
tunneled single-chip backend where compiles are expensive and
device-to-host transfers run at ~0.08 MB/s. So by default only the
flagship (convtasnet) is benched — one AOT compile, scalar-only
fetches — and the headline line is printed and flushed the moment it
is ready.

Deadline guard (round 4): the full headline's compile measured 73-565 s
for the *identical* program across same-day runs (backend/tunnel
weather), and 565 s leaves ~0 budget. A watchdog thread therefore
prints the previous recorded hardware result — clearly labeled
``STALE`` with ``"stale": true`` — and exits 0 if the fresh headline
has not landed by BENCH_DEADLINE_S (default 500) seconds of process
wall time, so a slow-compile day degrades the evidence instead of
erasing it (round 2 lost its number to rc=124). A 1 s-clip insurance
pre-measure was tried and dropped: its compile hit 250.8 s against
79.3 s for the full 4 s program minutes later (r4_measure.log,
bench_headline_guarded_1) — the variance is backend state, not program
size, so any pre-measure only delays the real headline. Set
BENCH_DEADLINE_S=0 to disable the guard. Set BENCH_ARCHS="a b c" or BENCH_FULL=1 to additionally
bench the other architectures AFTER the headline is out (their results
land in benchmarks/bench_detail.json; a timeout then cannot cost the
headline). A full-sweep snapshot is kept in
benchmarks/bench_detail_full.json.

If the tunneled TPU backend is unreachable (it can wedge for hours —
round 3 observed `jax.devices()` blocking indefinitely), the script
falls back to a small, honestly-labeled CPU benchmark instead of
producing nothing: metric says "CPU FALLBACK", and vs_baseline becomes
the audio-throughput ratio against the reference torch implementation
on the same host CPU (benchmarks/baseline_torch_cpu.json).
"""

import json
import os
import sys
import time

#: process-start reference for the headline deadline (BENCH_DEADLINE_S)
_T_START = time.time()


def _backend_alive(deadline_s=150):
    """Probe the tunneled TPU backend WITHOUT touching it from this
    process.

    A wedged tunnel makes ``jax.devices()`` block forever — and once a
    process has started that init it cannot abandon it (the backend
    lock is held). Probing in a throwaway subprocess keeps this
    process clean so it can still fall back to the CPU backend
    (observed round 3: the tunnel can stay wedged for hours after a
    client is killed mid-compile)."""
    import subprocess
    code = ('import jax; d = jax.devices(); '
            'import sys; sys.exit(0 if d and d[0].platform != "cpu" '
            'else 1)')
    try:
        proc = subprocess.run(
            [sys.executable, '-c', code], timeout=deadline_s,
            capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _pin_cpu_backend():
    """Force the CPU backend before any jax computation and enable the
    persistent compile cache (it behaves on CPU; see the TPU note in
    ``main``)."""
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    # NOTE: the persistent XLA compile cache is deliberately NOT
    # enabled for TPU runs. On the tunneled single-chip backend a cache
    # hit must push the ~100 MB serialized executable through the slow
    # control channel (measured: >10 min, vs ~220 s to just recompile
    # — the HLO going the other way is tiny and compilation happens
    # backend-side). The CPU fallback below does enable it.
    cpu_fallback = bool(os.environ.get('BENCH_FORCE_CPU'))
    if not cpu_fallback and not _backend_alive():
        print('# TPU tunnel unreachable (wedged backend init) — '
              'falling back to an honestly-labeled CPU benchmark so '
              'the driver still gets a number', file=sys.stderr,
              flush=True)
        cpu_fallback = True
    if cpu_fallback:
        # tiny workload: the full batch-16 x 4 s step takes minutes on
        # this 1-core host (the torch reference needs 226 s; even
        # batch 1 x 4 s measured ~280 s/step). The TCN is linear in T,
        # so audio-throughput stays comparable at 1 s.
        os.environ.setdefault('BENCH_BATCH', '1')
        os.environ.setdefault('BENCH_SECONDS', '1')
        os.environ.setdefault('BENCH_STEPS', '1')
        os.environ.setdefault('BENCH_BF16', '0')
        _pin_cpu_backend()
    from benchmarks.bench_models import DEFAULT_ARCHS, bench_all

    # use the local AOT artifact cache when one was built (see
    # bench_models._compile_maybe_aot): the driver-budget run then
    # loads the serialized executable from disk instead of gambling
    # on compile weather; a key mismatch falls back to compiling
    aot_dir = os.path.join(here, 'benchmarks', 'aot')
    if not cpu_fallback and os.path.isdir(aot_dir):
        os.environ.setdefault('BENCH_AOT_DIR', aot_dir)

    if os.environ.get('BENCH_ARCHS'):
        archs = os.environ['BENCH_ARCHS'].split()
    elif os.environ.get('BENCH_FULL'):
        archs = DEFAULT_ARCHS
    else:
        archs = ['convtasnet']
    # headline first so later archs can never starve it of budget
    if 'convtasnet' in archs:
        archs = ['convtasnet'] + [a for a in archs if a != 'convtasnet']

    results = {}
    printed = False

    def emit():
        head_arch = 'convtasnet' if 'convtasnet' in results \
            else next(iter(results))
        head = results[head_arch]
        device = head['device']
        if cpu_fallback:
            # same-host, same-workload-family comparison: audio
            # throughput vs the reference architecture under torch on
            # this CPU (benchmarks/baseline_torch_cpu.json)
            with open(os.path.join(
                    here, 'benchmarks', 'baseline_torch_cpu.json')) as f:
                base = json.load(f)
            torch_audio_per_sec = base['steps_per_sec'] * 16 * 4
            vs_baseline = round(
                head['audio_sec_per_sec'] / torch_audio_per_sec, 2)
            metric = (
                f"{head_arch}_train_steps_per_sec CPU FALLBACK — TPU "
                f"tunnel was unreachable (batch {head['batch']} x "
                f"{head['seconds_per_item']}s @ 16kHz, f32, {device}; "
                'vs_baseline = audio-throughput ratio vs the reference '
                'torch-CPU implementation on this host)')
        else:
            vs_baseline = head['mfu']
            metric = (
                f"{head_arch}_train_steps_per_sec (batch "
                f"{head['batch']} x {head['seconds_per_item']}s "
                f"@ 16kHz, bf16, {device}; vs_baseline = MFU vs "
                'dense-bf16 peak)')
        print(json.dumps({
            'metric': metric,
            'value': head['steps_per_sec'],
            'unit': 'steps/s',
            'vs_baseline': vs_baseline,
            'archs': {
                a: {k: r[k] for k in (
                    'batch', 'ms_per_step', 'steps_per_sec',
                    'flops_per_step', 'achieved_tflops', 'mfu',
                    'bytes_per_step', 'mxu_floor_ms', 'hbm_floor_ms',
                    'hbm_roofline_frac', 'torch_cpu_audio_ratio')
                    if k in r}
                for a, r in results.items()
            },
        }), flush=True)

    # per-arch torch-CPU reference throughput (param-pinned twins of
    # the same architectures; benchmarks/torch_baselines.py)
    torch_base = {}
    all_path = os.path.join(here, 'benchmarks',
                            'baseline_torch_cpu_all.json')
    if os.path.exists(all_path):
        with open(all_path) as f:
            torch_base = json.load(f)

    def annotate(sub):
        for a, r in sub.items():
            if a in torch_base:
                r['torch_cpu_audio_ratio'] = round(
                    r['audio_sec_per_sec']
                    / torch_base[a]['audio_sec_per_sec'], 1)

    detail_path = os.path.join(here, 'benchmarks', 'bench_detail.json')

    # ------------------------------------------------------------------
    # Deadline-guarded headline (TPU path only). The full 4 s headline
    # compile has measured 73-565 s for the SAME program (the variance
    # is backend/tunnel weather, not the HLO — r4_measure.log) against a
    # ~600 s driver budget; round 2 already lost its number to rc=124.
    # Insurance: measure a 1 s-clip configuration first (its flash-TCN
    # kernels unroll 1 time chunk instead of 4, so the Mosaic share of
    # the compile is ~4x cheaper), then start the full compile. A
    # watchdog prints the freshest REAL measurement and exits 0 if the
    # full headline has not landed by BENCH_DEADLINE_S (default 500 s)
    # of process wall time.
    import threading
    headline_out = threading.Event()
    guard_headline = (not cpu_fallback and archs
                      and archs[0] == 'convtasnet'
                      and os.environ.get('BENCH_DEADLINE_S') != '0')
    if guard_headline:
        deadline = _T_START + float(
            os.environ.get('BENCH_DEADLINE_S', '500'))

        def emit_fallback():
            """Last-resort headline: the previous recorded hardware
            result, marked stale. Runs on the watchdog thread; exits
            the process (the blocked compile cannot be abandoned)."""
            try:
                with open(detail_path) as f:
                    prev = json.load(f)['convtasnet']
            except Exception:
                prev = None
            if prev is None:
                line = {'metric': 'convtasnet_train_steps_per_sec '
                                  'COMPILE TIMEOUT — no measurement '
                                  'landed inside the driver budget',
                        'value': 0.0, 'unit': 'steps/s',
                        'vs_baseline': 0.0}
            else:
                line = {'metric': (
                    'convtasnet_train_steps_per_sec STALE — this '
                    "run's compile exceeded the driver deadline; "
                    'value is the previous recorded hardware '
                    'result (benchmarks/bench_detail.json)'),
                    'value': prev['steps_per_sec'], 'unit': 'steps/s',
                    'vs_baseline': prev.get('mfu', 0.0),
                    'stale': True}
            print(json.dumps(line), flush=True)
            os._exit(0)

        def watchdog():
            headline_out.wait(max(0.0, deadline - time.time()))
            if not headline_out.is_set():
                emit_fallback()

        threading.Thread(target=watchdog, daemon=True).start()

    for arch in archs:
        sub = bench_all([arch])
        annotate(sub)
        results.update(sub)
        with open(detail_path, 'w') as f:
            json.dump(results, f, indent=2)
            f.write('\n')
        if results and not printed:
            headline_out.set()     # disarm the watchdog BEFORE printing
            emit()
            printed = True
    if results and not printed:
        headline_out.set()
        emit()


if __name__ == '__main__':
    main()
