"""Seed-stable random generators for the mixture metadata tree.

Design constraints carried over from the reference
(brever/mixture/random.py:8-296), because they define the dataset
reproducibility contract:

* roll/get protocol — every value is rolled exactly once, then consumed
  exactly once; calling ``get`` without a prior ``roll`` is an error.
* one independent ``np.random.RandomState`` per draw *position*, so
  increasing the draw count of a generator never perturbs the values at
  earlier positions (datasets stay identical along unchanged axes).
* dict-of-generators iterate over **sorted keys** so the seeding order
  is deterministic regardless of insertion order.
"""

import random as _stdlib_random

import numpy as np

from .io import is_long_recording


class Seeder:
    """Deterministic stream of integer seeds for child generators."""

    def __init__(self, seed, max_seed=2**16):
        self._rng = _stdlib_random.Random(seed)
        self.max_seed = max_seed

    def __call__(self):
        return self._rng.randrange(self.max_seed)


class BaseRandGen:
    """Roll/get protocol base."""

    def __init__(self, seed=None):
        self.random = np.random.RandomState(seed)
        self._pending = None

    def roll(self):
        self._pending = self.random.rand()

    def get(self):
        if self._pending is None:
            raise ValueError('must call roll() before calling get()')
        value, self._pending = self._pending, None
        return value


class ChoiceRandGen(BaseRandGen):
    """Draw ``size`` elements from a pool, one RandomState per position.

    Supports weights (dict for set pools, list for list pools) and
    drawing without replacement.
    """

    def __init__(self, pool, size=1, weights=None, replace=True, seed=None,
                 squeeze=True):
        super().__init__(seed)
        self.random = [
            np.random.RandomState(None if seed is None else seed + i)
            for i in range(size)
        ]
        if isinstance(pool, set):
            self.pool = sorted(pool)
            if weights is not None:
                if not isinstance(weights, dict):
                    raise ValueError('weights must be dict when pool is set')
                if set(weights) != pool:
                    raise ValueError('weights keys do not match pool')
                weights = [weights[item] for item in self.pool]
        else:
            self.pool = pool
            if weights is not None:
                if not isinstance(weights, list):
                    raise ValueError('weights must be list when pool is list')
                if len(weights) != len(pool):
                    raise ValueError(
                        'weights and pool must have same length')
        self.weights = None if weights is None \
            else np.asarray(weights) / np.sum(weights)
        self.replace = replace
        self.squeeze = squeeze

    def roll(self):
        drawn = []
        remaining = list(self.pool)
        for rng in self.random:
            value = rng.choice(remaining, p=self.weights).item()
            drawn.append(value)
            if not self.replace:
                remaining.remove(value)
        if len(drawn) == 1 and self.squeeze:
            drawn, = drawn
        self._pending = drawn


class DistRandGen(BaseRandGen):
    """Sample from any ``np.random`` distribution by name."""

    def __init__(self, dist_name, dist_args, seed=None):
        super().__init__(seed)
        self.dist_name = dist_name
        self.dist_args = dist_args

    def roll(self):
        self._pending = getattr(self.random, self.dist_name)(*self.dist_args)


class MultiDistRandGen(BaseRandGen):
    """A positional list of independent ``DistRandGen`` objects."""

    def __init__(self, dist_name, dist_args, size=1, seed=None):
        self.random = [
            DistRandGen(dist_name, dist_args,
                        seed=None if seed is None else seed + i)
            for i in range(size)
        ]
        self._pending = None

    def roll(self):
        values = []
        for rng in self.random:
            rng.roll()
            values.append(rng.get())
        self._pending = values

    def get(self):
        if self._pending is None:
            raise ValueError('must call roll() before calling get()')
        value, self._pending = self._pending, None
        return value


class MultiChoiceRandGen(BaseRandGen):
    """Dict of ``ChoiceRandGen``, seeded over **sorted** keys."""

    def __init__(self, pool_dict, size=1, replace=True, seed=None,
                 squeeze=True):
        if not pool_dict:
            raise ValueError('pool_dict cannot be empty')
        self.random = {}
        for i, key in enumerate(sorted(pool_dict)):
            self.random[key] = ChoiceRandGen(
                pool=pool_dict[key],
                size=size,
                replace=replace,
                seed=None if seed is None else seed + i,
                squeeze=squeeze,
            )
        self._pending = None

    def roll(self):
        values = {}
        for key, rng in self.random.items():
            rng.roll()
            values[key] = rng.get()
        self._pending = values

    def get(self, key):
        if self._pending is None:
            raise ValueError('must call roll() before calling get()')
        keys = key if isinstance(key, list) else [key]
        values = [self._pending[k] for k in keys]
        self._pending = None
        return values if isinstance(key, list) else values[0]


class AngleRandGen(MultiChoiceRandGen):
    """Per-room angle randomizer with limits and even/odd parity split.

    Parity partitions the sorted angle grid into alternating halves (the
    half containing 0 deg is 'even') — used for train/test room-angle
    separation.
    """

    def __init__(self, pool_dict, size=1, replace=False, lims=None,
                 parity='all', seed=None, squeeze=True):
        filtered = {
            room: self.filter_angles(angles, lims, parity)
            for room, angles in pool_dict.items()
        }
        super().__init__(filtered, size=size, replace=replace, seed=seed,
                         squeeze=squeeze)

    @staticmethod
    def filter_angles(angles, lims, parity):
        angles = sorted(angles)
        if parity in ('even', 'odd'):
            evens, odds = angles[::2], angles[1::2]
            if 0 not in evens:
                evens, odds = odds, evens
            angles = evens if parity == 'even' else odds
        elif parity != 'all':
            raise ValueError(
                f'parity must be all, odd or even, got {parity}')
        if lims is not None:
            lo, hi = lims
            angles = [a for a in angles if lo <= a <= hi]
        return angles


class TargetFileRandGen(MultiChoiceRandGen):
    """Speech file randomizer with fractional file-range limits
    (train/test splits on the file level)."""

    def __init__(self, pool_dict, *args, lims=[0.0, 1.0], **kwargs):
        super().__init__(self._limit(pool_dict, lims), *args, **kwargs)

    @staticmethod
    def _limit(pool_dict, lims):
        out = {}
        for key, files in pool_dict.items():
            n = len(files)
            out[key] = files[round(n * lims[0]):round(n * lims[1])]
        return out


class NoiseFileRandGen(MultiChoiceRandGen):
    """Noise file randomizer: per-position consumption counter, file
    limits skipped for colored noise and long recordings (those split on
    the sample level instead)."""

    def __init__(self, pool_dict, *args, lims=[0.0, 1.0], size=1, **kwargs):
        super().__init__(self._limit(pool_dict, lims), *args, size=size,
                         **kwargs)
        for key, rng in self.random.items():
            if key.startswith('colored_'):
                rng.replace = True
        self.size = size
        self._consumed = [False] * size

    @staticmethod
    def _limit(pool_dict, lims):
        out = {}
        for key, files in pool_dict.items():
            synthesized = key.startswith('colored_') or key == 'ssn'
            if not synthesized and not is_long_recording(key):
                n = len(files)
                files = files[round(n * lims[0]):round(n * lims[1])]
            out[key] = files
        return out

    def roll(self):
        super().roll()
        self._consumed = [False] * self.size

    def get(self, noise, idx):
        if self._pending is None or self._consumed[idx]:
            raise ValueError('must call roll() before calling get()')
        value = self._pending[noise][idx]
        self._consumed[idx] = True
        if all(self._consumed):
            self._pending = None
            self._consumed = [False] * self.size
        return value
