"""Root-logger configuration with optional per-process rank tagging.

Reference behavior: brever/logger.py:1-37 (stdout + file handlers, rank
injected through a logging.Filter under DDP). Here the rank is the JAX
process index for multi-host runs.
"""

import logging
import sys


class _RankFilter(logging.Filter):

    def __init__(self, rank):
        super().__init__()
        self.rank = rank

    def filter(self, record):
        record.rank = self.rank
        return True


def set_logger(log_file=None, distributed=False, rank=None):
    """Configure the root logger to write to stdout and optionally a file."""
    root = logging.getLogger()
    root.setLevel(logging.INFO)

    fmt = '%(asctime)s [%(levelname)s:%(module)s]'
    if distributed:
        if rank is None:
            raise ValueError('must provide rank when distributed=True')
        root.addFilter(_RankFilter(rank))
        formatter = logging.Formatter(fmt + ' [rank %(rank)s] %(message)s')
    else:
        formatter = logging.Formatter(fmt + ' %(message)s')

    root.handlers.clear()

    stream = logging.StreamHandler(sys.stdout)
    stream.setFormatter(formatter)
    root.addHandler(stream)

    if log_file is not None:
        file_handler = logging.FileHandler(log_file, mode='a')
        file_handler.setFormatter(formatter)
        root.addHandler(file_handler)
