"""Dataset pipeline tests: creation CLI -> tar -> BreverDataset ->
segment strategies -> collate/batching -> full scripted training slice
(reference tests/test_datasets.py pattern, built on synthetic material
instead of proprietary databases)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, 'scripts', f'{name}.py'))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope='module')
def project(tmp_path_factory):
    """A project root with config/, synthetic corpus, and one created
    train dataset; tests chdir into it."""
    root = tmp_path_factory.mktemp('project')
    from brever_tpu.mixture.synthetic import make_synthetic_speech_corpus
    corpus = root / 'corpus'
    make_synthetic_speech_corpus(
        str(corpus), n_speakers=2, files_per_speaker=3,
        duration_range=(0.8, 1.6), seed=0)

    cwd = os.getcwd()
    os.chdir(root)
    try:
        write_default_config = _load_script('write_default_config')
        write_default_config.main('config')
        with open('config/paths.yaml', 'w') as f:
            yaml.dump({
                'SYNTH': str(corpus),
                'MODELS': 'models/',
                'DATASETS': 'data/datasets/',
            }, f)

        from brever_tpu.config import DatasetInitializer
        init = DatasetInitializer()
        dataset_dir = init.init_from_kwargs(
            kind='train',
            duration=8,
            speakers={'synth_.*'},
            noises={'colored_pink'},
            rooms={'synthetic_.*'},
            decay=True,
            decay_rt60_dist_args=(0.1, 0.3),
            seed=0,
        )
        create_dataset = _load_script('create_dataset')
        n = create_dataset.create_dataset(dataset_dir)
        assert n > 0
    finally:
        os.chdir(cwd)
    return root, str(root / dataset_dir)


def _chdir(project_root):
    os.chdir(project_root)


def test_created_dataset_files(project):
    root, dataset_dir = project
    assert os.path.exists(os.path.join(dataset_dir, 'audio.tar'))
    with open(os.path.join(dataset_dir, 'mixture_info.json')) as f:
        metas = json.load(f)
    assert all('room' in m and 'target' in m for m in metas)


def test_dataset_loads_and_segments(project):
    from brever_tpu.data import BreverDataset
    root, dataset_dir = project
    dataset = BreverDataset(path=dataset_dir, segment_length=0.0)
    assert len(dataset) > 0
    item = dataset[0]
    assert item.ndim == 3 and item.shape[0] == 2 and item.shape[1] == 2

    file_lengths = [dataset.get_segment_length(i)
                    for i in range(len(dataset))]

    seg = round(0.5 * 16000)
    for strategy in ('drop', 'pass', 'pad', 'overlap'):
        ds = BreverDataset(path=dataset_dir, segment_length=0.5,
                           segment_strategy=strategy)
        expected = 0
        for n in file_lengths:
            full = (n - seg) // seg + 1
            if strategy == 'drop':
                expected += full
            else:
                expected += full + (0 if full * seg == n else 1)
        assert len(ds) == expected, strategy
        # segments have the declared length (decode a sample of
        # indices — first, interior, boundary-adjacent, last — rather
        # than every segment; the full sweep is O(dataset) FLAC
        # decodes x 4 strategies)
        probe = sorted({0, 1, len(ds) // 2, len(ds) - 2, len(ds) - 1}
                       & set(range(len(ds))))
        for i in probe:
            want = ds.get_segment_length(i)
            assert ds[i].shape[-1] == want
        if strategy in ('drop', 'pad'):
            assert all(ds.get_segment_length(i) == seg
                       for i in range(len(ds)))


def test_dataset_random_strategy(project):
    from brever_tpu.data import BreverDataset
    root, dataset_dir = project
    ds = BreverDataset(path=dataset_dir, segment_length=0.5,
                       segment_strategy='random')
    assert all(ds.get_segment_length(i) == 8000 for i in range(len(ds)))
    assert ds[0].shape[-1] == 8000


def test_dataset_no_tar_equivalent(project):
    from brever_tpu.data import BreverDataset
    root, dataset_dir = project
    ds_tar = BreverDataset(path=dataset_dir)
    # extract to directory and compare
    import tarfile
    alt = os.path.join(dataset_dir, 'untarred')
    if not os.path.exists(alt):
        os.makedirs(alt)
        with tarfile.open(os.path.join(dataset_dir, 'audio.tar')) as tar:
            tar.extractall(alt)
    ds_dir = BreverDataset(path=alt, tar=False)
    assert len(ds_tar) == len(ds_dir)
    np.testing.assert_array_equal(ds_tar[0], ds_dir[0])


def test_collate_and_bucket_batching(project):
    from brever_tpu.batching import BatchSamplerRegistry
    from brever_tpu.data import BreverDataLoader, BreverDataset
    root, dataset_dir = project
    ds = BreverDataset(path=dataset_dir)
    sampler = BatchSamplerRegistry.get('bucket')(
        dataset=ds, batch_size=8.0, dynamic=True, num_buckets=4)
    loader = BreverDataLoader(ds, sampler, pad_to_multiple=4000)
    loader.set_epoch(0)
    seen = 0
    for batch, lengths in loader:
        assert batch.ndim == 4  # (B, sources, channels, samples)
        assert batch.shape[-1] % 4000 == 0
        assert (lengths <= batch.shape[-1]).all()
        # padding is zeros
        for i, n in enumerate(lengths):
            assert np.all(batch[i, ..., n:] == 0)
        seen += batch.shape[0]
    assert seen == len(ds)
    # dynamic budget respected
    sizes, _ = sampler.calc_batch_stats()
    assert all(s <= 8.0 * 16000 for s in sizes)


def test_batching_requires_set_epoch(project):
    from brever_tpu.batching import BatchSamplerRegistry
    from brever_tpu.data import BreverDataset
    root, dataset_dir = project
    ds = BreverDataset(path=dataset_dir)
    sampler = BatchSamplerRegistry.get('random')(
        dataset=ds, batch_size=2)
    sampler.set_epoch(0)
    list(sampler)
    with pytest.raises(ValueError, match='set_epoch'):
        list(sampler)


def test_sampler_epoch_shuffling(project):
    from brever_tpu.batching import BatchSamplerRegistry
    from brever_tpu.data import BreverDataset
    root, dataset_dir = project
    ds = BreverDataset(path=dataset_dir, segment_length=0.3)
    sampler = BatchSamplerRegistry.get('random')(
        dataset=ds, batch_size=2)
    orders = []
    for epoch in (0, 1, 0):
        sampler.set_epoch(epoch)
        sampler._previous_epoch = -1
        orders.append([tuple(b) for b in sampler])
    assert orders[0] == orders[2]  # same epoch -> same order
    assert orders[0] != orders[1]  # different epoch -> different order


def test_scripted_training_slice(project, tmp_path):
    """init_model -> train_model on the created dataset (the PR1
    end-to-end contract, CPU)."""
    root, dataset_dir = project
    cwd = os.getcwd()
    os.chdir(root)
    try:
        from brever_tpu.config import ModelInitializer
        rel_dataset = os.path.relpath(dataset_dir, root)
        init = ModelInitializer()
        model_dir = init.init_from_kwargs(
            arch='ffnn',
            train_path=rel_dataset,
            val_path=rel_dataset,
            hidden_layers=[32],
            epochs=1,
            device='cpu',
            batch_size=8,
            val_period=1,
            val_metrics={'snr'},
            workers=0,
        )
        train_model = _load_script('train_model')
        argv = sys.argv
        sys.argv = ['train_model.py', model_dir]
        try:
            train_model.main()
        finally:
            sys.argv = argv
        assert os.path.exists(os.path.join(model_dir, 'losses.npz'))
        assert os.path.exists(
            os.path.join(model_dir, 'checkpoints', 'last.ckpt'))
        assert os.path.exists(os.path.join(model_dir, 'training_curve.png'))
    finally:
        os.chdir(cwd)


def test_dynamic_mixing(project):
    from brever_tpu.data import BreverDataset
    root, dataset_dir = project
    cwd = os.getcwd()
    os.chdir(root)
    try:
        ds = BreverDataset(path=dataset_dir, dynamic_mixing=True,
                           dynamic_mixtures_per_epoch=3)
        assert len(ds) == 3
        first = ds[0]
        assert first.ndim == 3
        lengths_epoch0 = [ds.get_segment_length(i) for i in range(3)]
        ds.set_epoch(1)
        lengths_epoch1 = [ds.get_segment_length(i) for i in range(3)]
        assert lengths_epoch0 != lengths_epoch1
    finally:
        os.chdir(cwd)


def test_scripted_eval_slice(project):
    """test_model + validate_model CLIs on the trained model from
    test_scripted_training_slice (scores.hdf5 contract)."""
    import h5py
    root, dataset_dir = project
    cwd = os.getcwd()
    os.chdir(root)
    try:
        # find the trained model from the training-slice test
        models_dir = root / 'models'
        if not models_dir.exists():
            pytest.skip('training slice test has not run')
        model_dirs = [
            d for d in models_dir.iterdir()
            if (d / 'losses.npz').exists()
        ]
        if not model_dirs:
            pytest.skip('no trained model available')
        model_dir = str(model_dirs[0])
        rel_dataset = os.path.relpath(dataset_dir, root)

        test_model = _load_script('test_model')
        argv = sys.argv
        sys.argv = ['test_model.py', '-i', model_dir, '-t', rel_dataset,
                    '--metrics', 'snr', 'sisnr', '--batch_size', '8']
        try:
            test_model.main()
        finally:
            sys.argv = argv

        score_file = os.path.join(model_dir, 'scores.hdf5')
        assert os.path.exists(score_file)
        with h5py.File(score_file) as h5f:
            assert list(h5f['metrics'].asstr()) == ['snr', 'sisnr']
            test_name = os.path.basename(os.path.normpath(rel_dataset))
            scores = h5f[f'last.ckpt/{test_name}'][:]
            assert scores.shape[1:] == (2, 2)
            assert np.isfinite(scores).all()
            assert h5f[f'last.ckpt/{test_name}'].dims[0].label == 'mixture'

        # validate_model writes val.npz
        validate_model = _load_script('validate_model')
        import argparse
        args = argparse.Namespace(
            inputs=[model_dir], force=False, no_train_check=False,
            batch_size=8.0, workers=0)
        validate_model.run(args)
        assert os.path.exists(os.path.join(model_dir, 'val.npz'))
        data = np.load(os.path.join(model_dir, 'val.npz'),
                       allow_pickle=True)
        assert 'last.ckpt' in data
        assert np.isfinite(float(data['last.ckpt']))
    finally:
        os.chdir(cwd)


def test_find_scripts(project):
    root, dataset_dir = project
    cwd = os.getcwd()
    os.chdir(root)
    try:
        from brever_tpu.config import DatasetFinder, ModelFinder
        dsets, configs = DatasetFinder().find(kind='train')
        assert any(os.path.normpath(d) == os.path.normpath(
            os.path.relpath(dataset_dir, root)) for d in dsets)
        models, _ = ModelFinder().find(arch='ffnn')
        # the training-slice test may or may not have run yet
        assert isinstance(models, list)
    finally:
        os.chdir(cwd)


def test_check_sanity_script(project):
    root, dataset_dir = project
    cwd = os.getcwd()
    os.chdir(root)
    try:
        check_sanity = _load_script('check_sanity')
        argv = sys.argv
        sys.argv = ['check_sanity.py']
        try:
            check_sanity.main()
        except SystemExit as e:
            assert e.code == 0
        finally:
            sys.argv = argv
    finally:
        os.chdir(cwd)


def test_write_scores_pesq_provenance(tmp_path):
    """scores.hdf5 written with a pesq metric carries the
    pesq_implementation provenance attr (the in-repo P.862 is a
    from-scratch approximation, not the ITU C library the reference
    scores with)."""
    import h5py

    write = _load_script('test_model').write_scores
    f = str(tmp_path / 'scores.hdf5')
    scores = np.zeros((3, 2, 2))

    write(f, 'last.ckpt/testset', scores, ['snr', 'sisnr'])
    with h5py.File(f) as h5f:
        assert 'pesq_implementation' not in h5f.attrs

    f2 = str(tmp_path / 'scores_pesq.hdf5')
    write(f2, 'last.ckpt/testset', scores, ['pesq', 'estoi'])
    with h5py.File(f2) as h5f:
        assert 'approximation' in h5f.attrs['pesq_implementation']
        assert list(h5f['metrics'].asstr()) == ['pesq', 'estoi']
        dset = h5f['last.ckpt/testset']
        assert dset.dims[1].label == 'metric'
