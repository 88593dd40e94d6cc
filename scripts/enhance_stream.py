"""Stream-enhance a WAV file chunk by chunk with a trained model.

Simulates real-time serving: audio is fed through the stateful
streaming pipeline (brever_tpu.streaming) in fixed-size chunks and the
per-chunk latency is reported against the real-time budget.

    python scripts/enhance_stream.py <model_dir> input.wav output.wav \
        [--chunk-ms 64] [--best <metric>]

Works for causal Conv-TasNet (``causal=True``) and DCCRN models.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.audio import read_wav, write_wav  # noqa: E402
from brever_tpu.config import get_config  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('model_dir')
    parser.add_argument('input')
    parser.add_argument('output')
    parser.add_argument('--chunk-ms', type=float, default=64.0)
    parser.add_argument('--best', default=None,
                        help='pick the best checkpoint for this metric '
                        '(default: last.ckpt)')
    args = parser.parse_args()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'test_model', os.path.join(os.path.dirname(
            os.path.abspath(__file__)), 'test_model.py'))
    test_model_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_model_mod)

    cfg = get_config(os.path.join(args.model_dir, 'config.yaml'))
    ckpt_dir = os.path.join(args.model_dir, 'checkpoints')
    if args.best:
        ckpt = test_model_mod.find_best_checkpoint(ckpt_dir, args.best)
    else:
        ckpt = os.path.join(ckpt_dir, 'last.ckpt')
    model, variables = test_model_mod.load_model(
        args.model_dir, ckpt, cfg)

    from brever_tpu.models.convtasnet import ConvTasNet
    from brever_tpu.models.dccrn import DCCRN
    from brever_tpu.streaming import StreamingDCCRN, StreamingEnhancer

    x, fs = read_wav(args.input)
    if x.ndim > 1:
        x = x.mean(axis=-1)
    x = np.asarray(x, np.float32)

    if isinstance(model, DCCRN):
        quantum = model.stft.hop_length
        make = StreamingDCCRN
    elif isinstance(model, ConvTasNet):
        quantum = model.module.filter_length // 2
        make = StreamingEnhancer
    else:
        raise SystemExit(
            f'streaming is not implemented for {cfg.arch}')
    chunk = max(int(args.chunk_ms * fs / 1000) // quantum, 1) * quantum
    pad = (-len(x)) % chunk
    x = np.pad(x, (0, pad))

    enhancer = make(model, variables, chunk_samples=chunk)
    state = enhancer.init_state(batch_size=1)
    outs = []
    times = []
    for i in range(0, len(x), chunk):
        t0 = time.perf_counter()
        state, out = enhancer.step(state, x[None, i:i + chunk])
        out = np.asarray(out)            # sync
        times.append(time.perf_counter() - t0)
        outs.append(out[0])
    y = np.concatenate(outs)[:len(x) - pad]
    write_wav(args.output, y, fs)

    budget = chunk / fs
    steady = np.median(times[1:]) if len(times) > 1 else times[0]
    print(f'{len(times)} chunks of {chunk / fs * 1e3:.0f} ms; first '
          f'(compile) {times[0] * 1e3:.0f} ms, steady '
          f'{steady * 1e3:.2f} ms/chunk '
          f'({budget / steady:.1f}x real time)')


if __name__ == '__main__':
    main()
