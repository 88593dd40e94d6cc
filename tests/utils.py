"""Test fakes: a seeded random dataset bypassing file IO (pattern from
the reference suite, tests/utils.py)."""

import numpy as np


class DummyDataset:
    """Random (sources, channels, samples) items with seeded variable
    lengths; implements the BreverDataset surface the trainer needs."""

    def __init__(self, n_items=12, n_sources=2, n_channels=2, fs=16000,
                 min_length=1.0, max_length=2.0, seed=42, transform=None):
        self.fs = fs
        self.n_items = n_items
        self.n_sources = n_sources
        self.n_channels = n_channels
        rng = np.random.RandomState(seed)
        self._lengths = rng.randint(
            round(min_length * fs), round(max_length * fs), n_items)
        self._seeds = rng.randint(0, 2**31, n_items)
        self.transform = transform
        self.rmm_dset = None
        self.preloaded_data = None
        self._duration = float(self._lengths.sum()) / fs
        self._effective_duration = self._duration

    def __len__(self):
        return self.n_items

    def __getitem__(self, i):
        rng = np.random.RandomState(self._seeds[i])
        x = rng.randn(
            self.n_sources, self.n_channels, self._lengths[i]
        ).astype('float32')
        if self.transform is not None:
            x = self.transform(x)
        return x

    def get_segment_length(self, i):
        return int(self._lengths[i])

    def get_max_segment_length(self):
        return int(self._lengths.max())

    def set_epoch(self, epoch):
        pass

    def preload(self, device=None, tqdm_desc=None):
        self.preloaded_data = [self[i] for i in range(len(self))]
