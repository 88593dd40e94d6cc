"""Offline tests for scripts/download_databases.py: the archive /
layout mechanics run against local fixtures; network steps are covered
by --dry-run (asserted to touch nothing)."""

import os
import sys
import tarfile
import zipfile

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'scripts'))

import download_databases as dl  # noqa: E402


def test_untar_strip_components(tmp_path):
    src = tmp_path / 'src'
    (src / 'top' / 'sub').mkdir(parents=True)
    (src / 'top' / 'sub' / 'a.txt').write_text('hello')
    archive = tmp_path / 'a.tar.gz'
    with tarfile.open(archive, 'w:gz') as tf:
        tf.add(src / 'top', arcname='top')
    out = tmp_path / 'out'
    out.mkdir()
    dl.Ops().untar(str(archive), str(out), strip=1)
    assert (out / 'sub' / 'a.txt').read_text() == 'hello'
    assert not archive.exists()  # consumed


def test_unzip_member(tmp_path):
    archive = tmp_path / 'a.zip'
    with zipfile.ZipFile(archive, 'w') as zf:
        zf.writestr('NOISE/ch01.wav', b'RIFFdata')
        zf.writestr('NOISE/ch02.wav', b'unused')
    dest = tmp_path / 'NOISE_ch01.wav'
    dl.Ops().unzip_member(str(archive), 'NOISE/ch01.wav', str(dest))
    assert dest.read_bytes() == b'RIFFdata'
    assert not archive.exists()


def test_move_children_flattens(tmp_path):
    top = tmp_path / 'repo-master'
    (top / 'rooms').mkdir(parents=True)
    (top / 'README.md').write_text('x')
    (top / 'rooms' / 'b.wav').write_text('y')
    dl.Ops().move_children(str(top), str(tmp_path))
    assert (tmp_path / 'README.md').exists()
    assert (tmp_path / 'rooms' / 'b.wav').exists()
    assert not top.exists()


def test_dry_run_touches_nothing(tmp_path, capsys):
    ops = dl.Ops(dry_run=True)
    for name, prep in dl.CORPORA.items():
        prep(ops, str(tmp_path / name))
    out = capsys.readouterr().out
    assert 'would download' in out
    # nothing created anywhere
    assert list(tmp_path.iterdir()) == []


def test_corpus_registry_matches_paths_config():
    from brever_tpu.config import get_config
    paths = get_config('config/paths.yaml')
    for name in dl.CORPORA:
        assert hasattr(paths, name.upper())
