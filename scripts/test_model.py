"""Evaluate trained models on test datasets -> scores.hdf5.

Reference behavior: scripts/test_model.py:35-317 — checkpoint selection
(``--best <metric>`` scans best-checkpoint filenames), sorted dynamic
batching, per-mixture input/output scores for each metric written to
``scores.hdf5`` under ``<checkpoint>/<test_set>`` with HDF5 dimension
labels, idempotent unless ``--force``.
"""

import argparse
import logging
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.batching import SortedBatchSampler  # noqa: E402
from brever_tpu.checkpoint import load_checkpoint  # noqa: E402
from brever_tpu.config import get_config  # noqa: E402
from brever_tpu.data import BreverDataLoader, BreverDataset  # noqa: E402
from brever_tpu.evaluate import evaluate_dataset  # noqa: E402
from brever_tpu.inspect import Path  # noqa: E402
from brever_tpu.logger import set_logger  # noqa: E402
from brever_tpu.metrics import MetricRegistry  # noqa: E402
from brever_tpu.models import ModelRegistry  # noqa: E402


def find_best_checkpoint(checkpoints_dir, metric):
    regex = rf'^.*?_{metric}=(\d+\.\d+(?:e(?:\+|-)\d+)?).*?\.ckpt$'
    candidates = []
    for filename in os.listdir(checkpoints_dir):
        match = re.match(regex, filename)
        if match:
            candidates.append(
                (os.path.join(checkpoints_dir, filename),
                 float(match.group(1))))
    if not candidates:
        raise FileNotFoundError(
            f'no checkpoint tracking {metric} in {checkpoints_dir}')
    return max(candidates, key=lambda x: x[1])[0]


def load_model(model_dir, checkpoint_path, cfg):
    import jax
    model = ModelRegistry.get(cfg.arch)(**cfg.model.to_dict())
    state = load_checkpoint(checkpoint_path)
    template = model.init_variables(jax.random.PRNGKey(0))
    from brever_tpu.training import _restore_like
    params = _restore_like(template['params'], state['params'])
    if 'ema' in state:
        logging.info('Using EMA parameters')
        params = _restore_like(template['params'], state['ema'])
    aux = {k: v for k, v in template.items() if k != 'params'}
    if state.get('aux'):
        aux = _restore_like(aux, state['aux'])
    return model, {'params': params, **aux}


def test_model(args, model, variables, cfg, test_path, score_file,
               checkpoint_path, metrics):
    import h5py
    import jax

    checkpoint_name = os.path.basename(checkpoint_path)
    test_name = os.path.basename(os.path.normpath(test_path))
    h5path = f'{checkpoint_name}/{test_name}'

    if os.path.exists(score_file) and not args.force:
        with h5py.File(score_file, 'r') as h5file:
            if h5path in h5file:
                logging.info(f'Model already tested on {test_path}')
                return

    dataset = BreverDataset(
        path=test_path,
        segment_length=0.0,
        fs=cfg.dataset.fs,
        sources=cfg.dataset.sources,
    )
    sampler = SortedBatchSampler(
        dataset, batch_size=args.batch_size, shuffle=False, dynamic=True,
        reverse=True,
    )
    # pad_quantum rounds batch lengths up to a fixed grid so the TPU
    # sees a bounded set of (B, T) shapes (each distinct shape is a
    # remote compile on the tunneled backend); metrics trim with
    # ``lengths`` so scores are unaffected
    pad_to_multiple = round(args.pad_quantum * cfg.dataset.fs) \
        if args.pad_quantum else None
    dataloader = BreverDataLoader(dataset, sampler,
                                  num_workers=args.workers,
                                  pad_to_multiple=pad_to_multiple,
                                  native=True)

    on_batch = None
    if args.output_dir is not None:
        from brever_tpu.audio import write_wav
        os.makedirs(args.output_dir, exist_ok=True)

        def on_batch(indices, inputs_mono, output, lengths):
            for name, data in [('input', inputs_mono), ('output', output)]:
                for i, idx in enumerate(indices):
                    write_wav(
                        os.path.join(args.output_dir,
                                     f'{idx:05d}_{name}.wav'),
                        data[i][:lengths[i]], cfg.dataset.fs)

    # sharded evaluation: batches round-robin over processes, the
    # forward sharded over local devices, scores allgather-merged
    # (reference DDP eval, scripts/test_model.py:66-70,215-238)
    scores = evaluate_dataset(model, variables, dataloader, metrics,
                              len(dataset), on_batch=on_batch,
                              device_metrics=args.device_metrics)
    if jax.process_index() != 0:
        return

    logging.info('Average delta scores:')
    for i_metric, metric in enumerate(metrics):
        delta = (scores[:, i_metric, 1] - scores[:, i_metric, 0]).mean()
        logging.info(f'{metric}: {delta:.2e}')

    write_scores(score_file, h5path, scores, metrics)


def write_scores(score_file, h5path, scores, metrics):
    """Write one (mixtures, metrics, input/output) block to scores.hdf5
    with labeled dimension scales (reference scripts/test_model.py
    score-file contract)."""
    import h5py

    mode = 'a' if os.path.exists(score_file) else 'w'
    with h5py.File(score_file, mode) as h5file:
        if 'metrics' not in h5file:
            h5file['metrics'] = list(metrics)
            h5file['which'] = ['input', 'output']
        if h5path in h5file:
            h5file[h5path][...] = scores
            dset = h5file[h5path]
        else:
            dset = h5file.create_dataset(h5path, data=scores)
        dset.dims[0].label = 'mixture'
        dset.dims[1].label = 'metric'
        dset.dims[2].label = 'which'
        dset.dims[1].attach_scale(h5file['metrics'])
        dset.dims[2].attach_scale(h5file['which'])
        # Surface metric provenance: 'pesq' here is the from-scratch
        # P.862 implementation (brever_tpu/pesq.py), not the ITU C
        # library the reference scores with (ref brever/metrics.py:47-99
        # via the pesq wheel) — no measured |dMOS| bound vs canonical
        # exists in this environment, so scores carry the label.
        if any(m.startswith('pesq') for m in metrics):
            h5file.attrs['pesq_implementation'] = (
                'brever_tpu.pesq (from-scratch P.862 approximation; '
                'not the canonical ITU-T C library)')


def main():
    parser = argparse.ArgumentParser(description='test a model')
    parser.add_argument('-i', '--inputs', nargs='+', required=True,
                        help='model directories or checkpoints')
    parser.add_argument('-t', '--tests', type=Path, nargs='+',
                        required=True, help='test dataset paths')
    parser.add_argument('-f', '--force', action='store_true')
    parser.add_argument('--output_dir', help='where to write signals')
    parser.add_argument('--metrics', nargs='+',
                        default=['pesq', 'stoi', 'estoi', 'snr', 'sisnr'])
    parser.add_argument('--no_train_check', action='store_true')
    parser.add_argument('--best',
                        help='metric for best-checkpoint selection')
    parser.add_argument('--batch_size', type=float, default=20)
    parser.add_argument('--workers', type=int, default=0)
    parser.add_argument('--pad_quantum', type=float, default=0.0,
                        help='round batch lengths up to multiples of '
                        'this many seconds to bound the set of '
                        'compiled shapes (recommended on TPU)')
    parser.add_argument('--device_metrics', action='store_true',
                        help='score with the on-device jax metric '
                        'twins (brever_tpu.metrics_device) instead of '
                        'the host implementations; avoids fetching '
                        'enhanced audio to the host')
    args = parser.parse_args()

    # all default metrics are built in (PESQ/STOI are from-scratch
    # implementations in brever_tpu.pesq / brever_tpu.metrics); fail
    # loudly on unknown names rather than silently dropping them
    metrics = list(args.metrics)
    for metric in metrics:
        MetricRegistry.get(metric)

    for input_ in args.inputs:
        if not os.path.exists(input_):
            print(f'Model {input_} does not exist')
            continue
        checkpoints_dir = os.path.join(input_, 'checkpoints')
        if input_.endswith('.ckpt'):
            model_dir = os.path.dirname(os.path.dirname(input_))
            checkpoint_path = input_
        else:
            model_dir = input_
            checkpoint_path = os.path.join(checkpoints_dir, 'last.ckpt')
        if args.best is not None:
            checkpoint_path = find_best_checkpoint(checkpoints_dir,
                                                   args.best)
        if not os.path.exists(os.path.join(model_dir, 'losses.npz')) \
                and not args.no_train_check:
            print(f'Model {input_} is not trained')
            continue
        cfg = get_config(os.path.join(model_dir, 'config.yaml'))
        set_logger(os.path.join(model_dir, 'log_test.log'))
        logging.info(f'Testing {checkpoint_path}')
        model, variables = load_model(model_dir, checkpoint_path, cfg)
        score_file = os.path.join(model_dir, 'scores.hdf5')
        for test_path in args.tests:
            test_model(args, model, variables, cfg, test_path, score_file,
                       checkpoint_path, metrics)


if __name__ == '__main__':
    main()
