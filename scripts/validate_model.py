"""Compute the validation loss of saved checkpoints -> val.npz.

Used for checkpoint selection (reference scripts/validate_model.py).
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.batching import SortedBatchSampler  # noqa: E402
from brever_tpu.config import get_config  # noqa: E402
from brever_tpu.data import BreverDataLoader, BreverDataset  # noqa: E402
from brever_tpu.logger import set_logger  # noqa: E402
from brever_tpu.models.base import sample_weighted_mean  # noqa: E402


# The loader is shared with test_model.py; import it lazily to avoid
# duplicating checkpoint-restore logic.
def run(args):
    import importlib.util
    import jax
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location(
        'test_model', os.path.join(os.path.dirname(
            os.path.abspath(__file__)), 'test_model.py'))
    test_model_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_model_mod)

    for input_ in args.inputs:
        if not os.path.exists(input_):
            print(f'Model {input_} does not exist')
            continue
        if input_.endswith('.ckpt'):
            model_dir = os.path.dirname(os.path.dirname(input_))
            checkpoint_path = input_
        else:
            model_dir = input_
            checkpoint_path = os.path.join(model_dir, 'checkpoints',
                                           'last.ckpt')
        if not os.path.exists(os.path.join(model_dir, 'losses.npz')) \
                and not args.no_train_check:
            print(f'Model {input_} is not trained')
            continue

        val_file = os.path.join(model_dir, 'val.npz')
        npz_key = os.path.basename(checkpoint_path)
        if os.path.exists(val_file) and not args.force:
            if npz_key in np.load(val_file, allow_pickle=True):
                print('Model already validated')
                continue

        cfg = get_config(os.path.join(model_dir, 'config.yaml'))
        set_logger(os.path.join(model_dir, 'log_val.log'))
        logging.info(f'Validating {checkpoint_path}')

        model, variables = test_model_mod.load_model(
            model_dir, checkpoint_path, cfg)

        dataset = BreverDataset(
            path=cfg.val_path,
            segment_length=0.0,
            fs=cfg.dataset.fs,
            sources=cfg.dataset.sources,
        )
        sampler = SortedBatchSampler(
            dataset, batch_size=args.batch_size, shuffle=False,
            dynamic=True)
        dataloader = BreverDataLoader(dataset, sampler,
                                      num_workers=args.workers)

        total, count = 0.0, 0
        for batch, lengths in dataloader:
            out = model.loss(
                variables, jnp.asarray(batch), jnp.asarray(lengths),
                jax.random.PRNGKey(0), train=False)
            per_item = out[0] if isinstance(out, tuple) else out
            if isinstance(per_item, dict):
                per_item = sum(per_item.values())
            loss = sample_weighted_mean(per_item, jnp.asarray(lengths))
            total += float(loss) * batch.shape[0]
            count += batch.shape[0]
        mean_loss = total / max(count, 1)
        logging.info(f'Validation loss: {mean_loss}')

        data = {}
        if os.path.exists(val_file):
            data = dict(np.load(val_file, allow_pickle=True))
        data[npz_key] = mean_loss
        np.savez(val_file, **data)


if __name__ == '__main__':
    parser = argparse.ArgumentParser(description='validate a model')
    parser.add_argument('inputs', nargs='+',
                        help='model directories or checkpoints')
    parser.add_argument('-f', '--force', action='store_true')
    parser.add_argument('--no_train_check', action='store_true')
    parser.add_argument('--batch_size', type=float, default=16.0)
    parser.add_argument('--workers', type=int, default=0)
    run(parser.parse_args())
