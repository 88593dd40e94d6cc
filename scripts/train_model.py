"""Train a model from its hashed config directory.

Reference behavior: scripts/train_model.py:21-181 — config merge with
CLI overrides, seeding, train/val dataset leakage check, trainer run.
The NCCL process-group setup is replaced by ``jax.distributed`` for
multi-host runs (single-host multi-chip needs no setup at all).
"""

import argparse
import logging
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.args import ModelArgParser  # noqa: E402
from brever_tpu.config import get_config  # noqa: E402
from brever_tpu.data import BreverDataset  # noqa: E402
from brever_tpu.logger import set_logger  # noqa: E402
from brever_tpu.models import ModelRegistry  # noqa: E402
from brever_tpu.training import BreverTrainer  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('input', help='model directory')
    parser.add_argument('--force', action='store_true',
                        help='train even if already trained')
    parser.add_argument('--multihost', action='store_true',
                        help='initialize jax.distributed for multi-host '
                        'training')
    parser.add_argument('--wandb-run-id', default=None,
                        help='W&B run id to resume after a preemption '
                        '(reference scripts/train_model.py:171)')
    ModelArgParser.add_trainer_args(parser, required=False)
    args = parser.parse_args()

    model_dir = args.input
    losses_path = os.path.join(model_dir, 'losses.npz')
    if os.path.exists(losses_path) and not args.force:
        raise FileExistsError(
            f'training already done: {losses_path}; use --force to retrain')

    if args.multihost:
        import jax
        jax.distributed.initialize()

    config = get_config(os.path.join(model_dir, 'config.yaml'))
    config.update_from_args(args, ModelArgParser.trainer_arg_map())

    import jax
    rank = jax.process_index()
    set_logger(os.path.join(model_dir, 'log_train.log'),
               distributed=jax.process_count() > 1, rank=rank)
    logging.info(f'Training {model_dir}')
    logging.info(config.to_dict())

    random.seed(config.seed)
    np.random.seed(config.seed)

    model_cls = ModelRegistry.get(config.arch)
    model = model_cls(**config.model.to_dict())

    dataset_kwargs = config.dataset.to_dict()
    # host-side per-item precompute (e.g. MetricGAN's noisy metric
    # score) runs in the loader for the train set only, like the
    # reference (train_model.py:104 vs :117); jnp transforms stay
    # inside the jitted step instead
    train_dataset = BreverDataset(path=config.train_path,
                                  transform=model.loader_transform,
                                  **dataset_kwargs)
    # validation is always a static (pre-created) dataset, even when
    # training uses dynamic mixing (reference train_model.py:108-118
    # pins dynamic_mixing=False for the val set)
    val_kwargs = dict(dataset_kwargs)
    val_kwargs['dynamic_mixing'] = False
    val_kwargs['dynamic_mixing_device'] = False
    val_dataset = BreverDataset(path=config.val_path, **val_kwargs)

    # train/val leakage check: same dataset path is almost always an
    # error (reference train_model.py:140-162)
    if config.train_path == config.val_path:
        logging.warning('train_path and val_path are identical')

    trainer_kwargs = config.trainer.to_dict()
    trainer_kwargs['seed'] = config.seed
    trainer = BreverTrainer(
        model=model,
        train_dataset=train_dataset,
        val_dataset=val_dataset,
        model_dirpath=model_dir,
        **trainer_kwargs,
    )
    trainer.wandb_run_id = args.wandb_run_id
    trainer.run()
    trainer.loss_logger.save()
    trainer.loss_logger.plot()


if __name__ == '__main__':
    main()
