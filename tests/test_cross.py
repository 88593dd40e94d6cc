"""Cross-corpus experiment layer: grid initialization, eval-script
generation, and score-matrix gathering from fabricated scores.hdf5
files (reference brever/cross.py:11-498 — previously untested)."""

import importlib.util
import itertools
import os

import h5py
import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATABASES = dict(
    speakers=['synth_a.*', 'synth_b.*'],
    noises=['colored_pink', 'colored_white'],
    rooms=['synthetic_a.*', 'synthetic_b.*'],
)

DSET_SPEC = dict(
    train=dict(seed=0, duration=8),
    val=dict(seed=1337, duration=4),
    test=dict(seed=42, duration=4),
)


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, 'scripts', f'{name}.py'))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.fixture()
def project(tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        _load_script('write_default_config').main('config')
        with open('config/paths.yaml', 'w') as f:
            yaml.dump({'MODELS': 'models/',
                       'DATASETS': 'data/datasets/'}, f)
        yield tmp_path
    finally:
        os.chdir(cwd)


def _model_delta(model_path):
    """Deterministic per-model synthetic improvement score."""
    return (sum(model_path.encode()) % 97) / 100.0


def _fake_scores(exp):
    """Write scores.hdf5 for every initialized model: input score 1.0,
    output score 1.0 + model-specific delta, 3 mixtures per test set."""
    for model, test_paths in exp._evals.items():
        os.makedirs(model, exist_ok=True)
        with h5py.File(os.path.join(model, 'scores.hdf5'), 'w') as f:
            f.create_dataset(
                'metrics', data=np.array(exp.metrics, dtype='S'))
            grp = f.create_group('last.ckpt')
            for test_path in test_paths:
                data = np.ones((3, exp.n_metrics, 2))
                data[:, :, 1] += _model_delta(model)
                grp.create_dataset(os.path.basename(test_path), data=data)


def test_cross_corpus_experiment(project):
    from brever_tpu.cross import CrossCorpusExperiment

    exp = CrossCorpusExperiment(
        model_archs=['ffnn'], databases=DATABASES, dset_spec=DSET_SPEC,
        metrics=['snr'], model_seeds=[0])
    assert exp.n_db == 2
    assert exp.n_dim == 3
    assert exp.n_mismatches == 8

    script = str(project / 'eval.sh')
    exp.init_experiment(script)

    # every evaluated model got an initialized config dir
    for model in exp._evals:
        assert os.path.exists(os.path.join(model, 'config.yaml')), model
    for dset in exp._dsets:
        assert os.path.exists(os.path.join(dset, 'config.yaml')), dset

    # the eval script has one test_model line per model
    with open(script) as f:
        lines = [ln for ln in f if ln.strip()]
    assert len(lines) == len(exp._evals)
    assert all('test_model.py' in ln for ln in lines)

    # fabricate scores and gather the full matrix
    _fake_scores(exp)
    mean, std, ref_mean, ref_std = exp.gather_all_scores(0)
    shape = (2, 8, 2, 1, 1)
    assert mean.shape == std.shape == ref_mean.shape == ref_std.shape \
        == shape
    np.testing.assert_allclose(std, 0.0, atol=1e-12)

    # every cell must equal the delta of the model that owns the cell
    i_mism = 0
    for ndim in range(exp.n_dim):
        for dims in itertools.combinations(range(exp.n_dim), ndim):
            for i_fold in range(exp.n_db):
                for i_n, diversity in enumerate([1, exp.n_db - 1]):
                    train_idx = exp._train_db_idx(i_fold, diversity)
                    kw = exp._dset_kwargs(train_idx)
                    m = exp.get_model(
                        'ffnn', exp.get_dset('train', **kw),
                        exp.get_dset('val', **kw), 0)
                    np.testing.assert_allclose(
                        mean[i_n, i_mism, i_fold, 0, 0],
                        _model_delta(m))
        i_mism += len(list(
            itertools.combinations(range(exp.n_dim), ndim)))

    # fully matched block (last mismatch index): main == reference
    np.testing.assert_allclose(mean[:, -1], ref_mean[:, -1])


def test_cross_delta_scores_toggle(project):
    from brever_tpu.cross import CrossCorpusExperiment

    exp = CrossCorpusExperiment(
        model_archs=['ffnn'], databases=DATABASES, dset_spec=DSET_SPEC,
        metrics=['snr'], delta_scores=False)
    exp.init_experiment(str(project / 'eval.sh'))
    _fake_scores(exp)
    mean, *_ = exp.gather_all_scores(0)
    # absolute output scores: 1 + delta instead of delta
    model = next(iter(exp._evals))
    assert mean.min() >= 1.0
    del model
