"""Cross-corpus generalization experiments.

Initializes model x training-corpus grids for studying mismatched
speech/noise/room generalization, and gathers the resulting
``scores.hdf5`` matrices into delta-score arrays. Behavioral reference:
brever/cross.py:11-498 (the experiment layout behind the reference's
cross-corpus papers).

Folds: for each acoustic dimension subset that *matches* between
training and test, for low (1 database) and high (n-1 databases)
training diversity, and for each held-out fold, a *main* model and a
matched *reference* model are initialized.
"""

import itertools
import os

import numpy as np

from .config import DatasetInitializer, ModelInitializer
from .inspect import Path

DEFAULT_DATABASES = dict(
    speakers=['timit_.*', 'libri_.*', 'wsj0_.*', 'clarity_.*', 'vctk_.*'],
    noises=['dcase_.*', 'noisex_.*', 'icra_.*', 'demand', 'arte'],
    rooms=['surrey_.*', 'ash_.*', 'bras_.*', 'catt_.*', 'avil_.*'],
)

DEFAULT_DSET_SPEC = dict(
    train=dict(seed=0, duration=30 * 60 * 60, speech_files=(0.0, 0.8),
               noise_files=(0.0, 0.8), room_files='even',
               weight_by_avg_length=True),
    val=dict(seed=1337, duration=30 * 60, speech_files=(0.0, 0.8),
             noise_files=(0.0, 0.8), room_files='even',
             weight_by_avg_length=False),
    test=dict(seed=42, duration=60 * 60, speech_files=(0.8, 1.0),
              noise_files=(0.8, 1.0), room_files='odd',
              weight_by_avg_length=False),
)


class CrossCorpusExperiment:
    """Experiment initializer and score loader (see module docstring)."""

    def __init__(self, model_archs, databases=None, dset_spec=None,
                 metrics=['pesq', 'estoi', 'snr'], delta_scores=True,
                 model_seeds=[0], model_kwargs={}):
        self.databases = databases or dict(DEFAULT_DATABASES)
        self.dset_spec = dset_spec or dict(DEFAULT_DSET_SPEC)
        self.metrics = metrics
        self.delta_scores = delta_scores
        self.model_seeds = model_seeds
        self.model_archs = model_archs
        self.model_kwargs = model_kwargs

        self.dset_init = DatasetInitializer(batch_mode=True)
        self.model_init = ModelInitializer(batch_mode=True)

        self._main_models = {1: set(), self.n_db - 1: set()}
        self._dsets = set()
        self._evals = {}

    # ------------------------------------------------------------------
    # sizes

    @property
    def n_db(self):
        counts = {len(dbs) for dbs in self.databases.values()}
        assert len(counts) == 1, 'database lists must have equal length'
        return counts.pop()

    @property
    def n_dim(self):
        return len(self.databases)

    @property
    def n_metrics(self):
        return len(self.metrics)

    @property
    def n_archs(self):
        return len(self.model_archs)

    @property
    def n_mismatches(self):
        return 2**self.n_dim

    # ------------------------------------------------------------------
    # dataset/model path helpers

    def _dset(self, func, kind, **kwargs):
        return func(kind=kind, **kwargs, **self.dset_spec[kind])

    def get_dset(self, kind, **kwargs):
        return self._dset(self.dset_init.get_path_from_kwargs, kind,
                          **kwargs)

    def init_dset(self, kind, **kwargs):
        return self._dset(self.dset_init.init_from_kwargs, kind, **kwargs)

    def get_model(self, arch, train_path, val_path, seed):
        return self.model_init.get_path_from_kwargs(
            arch=arch, train_path=Path(train_path),
            val_path=Path(val_path), seed=seed, **self.model_kwargs)

    def init_model(self, arch, train_path, val_path, seed):
        return self.model_init.init_from_kwargs(
            arch=arch, train_path=Path(train_path),
            val_path=Path(val_path), seed=seed, **self.model_kwargs)

    # ------------------------------------------------------------------
    # fold index algebra

    def _complement(self, idx_list):
        return [i for i in range(self.n_db) if i not in idx_list]

    def _train_db_idx(self, fold_idx, diversity):
        if diversity == 1:
            return [[fold_idx]] * self.n_dim
        if diversity == self.n_db - 1:
            return [self._complement([fold_idx])] * self.n_dim
        raise ValueError(
            f'diversity must be 1 or {self.n_db - 1}, got {diversity}')

    def _test_db_idx(self, train_idx, matching_dims):
        test_idx = [self._complement(train_idx[i])
                    for i in range(self.n_dim)]
        for dim in matching_dims:
            test_idx[dim] = train_idx[dim]
        return test_idx

    def _dset_kwargs(self, idx_list):
        return {
            dim: {dbs[i] for i in indexes}
            for (dim, dbs), indexes in zip(self.databases.items(), idx_list)
        }

    # ------------------------------------------------------------------
    # experiment initialization

    def _init_fold(self, i_fold, matching_dims, diversity):
        train_idx = self._train_db_idx(i_fold, diversity)
        train_kwargs = self._dset_kwargs(train_idx)
        train_path = self.init_dset('train', **train_kwargs)
        val_path = self.init_dset('val', **train_kwargs)

        ref_idx = self._test_db_idx(train_idx, matching_dims)
        ref_kwargs = self._dset_kwargs(ref_idx)
        train_path_ref = self.init_dset('train', **ref_kwargs)
        val_path_ref = self.init_dset('val', **ref_kwargs)
        test_path = self.init_dset('test', **ref_kwargs)

        for arch in self.model_archs:
            for seed in self.model_seeds:
                m = self.init_model(arch, train_path, val_path, seed)
                m_ref = self.init_model(arch, train_path_ref, val_path_ref,
                                        seed)
                self._evals.setdefault(m, set()).add(test_path)
                self._evals.setdefault(m_ref, set()).add(test_path)
                self._main_models[diversity].add(m)
        self._dsets.update([train_path, val_path, train_path_ref,
                            val_path_ref, test_path])

    def init_experiment(self, eval_script):
        self._dsets = set()
        for n_match in reversed(range(self.n_dim)):
            for dims in itertools.combinations(range(self.n_dim), n_match):
                for diversity in (1, self.n_db - 1):
                    for i_fold in range(self.n_db):
                        self._init_fold(i_fold, dims, diversity)
        self.write_eval_script(eval_script)
        self.check_deprecated_models()
        self.check_deprecated_dsets()
        self.print_main_models()

    def print_main_models(self):
        for diversity, models in self._main_models.items():
            print(f'N={diversity} main models:')
            for model in models:
                print(model)

    def write_eval_script(self, eval_script, batch_size=50):
        with open(eval_script, 'w') as f:
            for model, test_paths in self._evals.items():
                tests = ' '.join(sorted(test_paths))
                f.write(f'python scripts/test_model.py -i {model} '
                        f'-t {tests} --batch_size {batch_size}\n')

    def check_deprecated_models(self):
        model_dir = self.model_init.dir_
        if not os.path.exists(model_dir):
            return
        for model_id in os.listdir(model_dir):
            path = os.path.join(model_dir, model_id)
            if path not in self._evals:
                print('the following model was found in the system and was '
                      f'not attempted to be initialized: {path}')

    def check_deprecated_dsets(self):
        dset_dir = self.dset_init.dir_
        for kind in ('train', 'val', 'test'):
            subdir = os.path.join(dset_dir, kind)
            if not os.path.exists(subdir):
                continue
            for dset_id in os.listdir(subdir):
                path = os.path.join(subdir, dset_id).replace('\\', '/')
                if path not in self._dsets:
                    print('the following dataset was found in the system '
                          'and was not attempted to be initialized: '
                          f'{path}')

    # ------------------------------------------------------------------
    # score loading

    def get_scores(self, model, test_paths):
        import h5py
        with h5py.File(os.path.join(model, 'scores.hdf5')) as h5f:
            metric_idx = [
                list(h5f['metrics'].asstr()).index(m) for m in self.metrics
            ]
            scores = []
            for test_path in test_paths:
                h5path = f'last.ckpt/{os.path.basename(test_path)}'
                if h5path not in h5f:
                    raise ValueError(f'{model} not tested on {test_path}')
                scores.append(h5f[h5path][:, metric_idx, :])
        scores = np.concatenate(scores, axis=0)
        if self.delta_scores:
            scores = scores[:, :, 1] - scores[:, :, 0]
        else:
            scores = scores[:, :, 1]
        return scores.mean(axis=0), scores.std(axis=0)

    def _fold_scores(self, i_fold, matching_dims, diversity, seed):
        train_idx = self._train_db_idx(i_fold, diversity)
        train_kwargs = self._dset_kwargs(train_idx)
        train_path = self.get_dset('train', **train_kwargs)
        val_path = self.get_dset('val', **train_kwargs)
        ref_idx = self._test_db_idx(train_idx, matching_dims)
        ref_kwargs = self._dset_kwargs(ref_idx)
        train_path_ref = self.get_dset('train', **ref_kwargs)
        val_path_ref = self.get_dset('val', **ref_kwargs)
        test_paths = [self.get_dset('test', **ref_kwargs)]
        for arch in self.model_archs:
            m = self.get_model(arch, train_path, val_path, seed)
            m_ref = self.get_model(arch, train_path_ref, val_path_ref, seed)
            yield (*self.get_scores(m, test_paths),
                   *self.get_scores(m_ref, test_paths))

    def _matched_scores(self, i_fold, diversity, seed):
        train_idx = self._train_db_idx(i_fold, diversity)
        train_kwargs = self._dset_kwargs(train_idx)
        train_path = self.get_dset('train', **train_kwargs)
        val_path = self.get_dset('val', **train_kwargs)
        test_paths = [self.get_dset('test', **train_kwargs)]
        for arch in self.model_archs:
            m = self.get_model(arch, train_path, val_path, seed)
            yield self.get_scores(m, test_paths)

    def gather_all_scores(self, seed):
        shape = (2, self.n_mismatches, self.n_db, self.n_archs,
                 self.n_metrics)
        mean = np.empty(shape)
        std = np.empty(shape)
        ref_mean = np.empty(shape)
        ref_std = np.empty(shape)

        for i_n, diversity in enumerate([1, self.n_db - 1]):
            i_mism = 0
            for ndim in range(self.n_dim):
                for dims in itertools.combinations(range(self.n_dim), ndim):
                    for i_fold in range(self.n_db):
                        for i_arch, data in enumerate(self._fold_scores(
                                i_fold, dims, diversity, seed)):
                            mean[i_n, i_mism, i_fold, i_arch] = data[0]
                            std[i_n, i_mism, i_fold, i_arch] = data[1]
                            ref_mean[i_n, i_mism, i_fold, i_arch] = data[2]
                            ref_std[i_n, i_mism, i_fold, i_arch] = data[3]
                    i_mism += 1

        # fully matched scenario
        for i_n, diversity in enumerate([1, self.n_db - 1]):
            for i_fold in range(self.n_db):
                for i_arch, data in enumerate(self._matched_scores(
                        i_fold, diversity, seed)):
                    mean[i_n, -1, i_fold, i_arch] = data[0]
                    std[i_n, -1, i_fold, i_arch] = data[1]
                    ref_mean[i_n, -1, i_fold, i_arch] = data[0]
                    ref_std[i_n, -1, i_fold, i_arch] = data[1]

        return mean, std, ref_mean, ref_std

    @staticmethod
    def dict_product(**kwargs):
        keys = kwargs.keys()
        for values in itertools.product(*kwargs.values()):
            yield dict(zip(keys, values))
