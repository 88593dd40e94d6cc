"""Download and prepare the external speech/noise/BRIR databases.

Python equivalent of the reference's ``download_databases.sh``
(reference repo root; same corpora, same target layout under
``config/paths.yaml``): LibriSpeech, VCTK, Clarity, TAU/DCASE, DEMAND,
ARTE, Surrey, ASH, CATT and BRAS. Each corpus is prepared exactly the
way the loaders in :mod:`brever_tpu.mixture.io` expect:

* LIBRI: ``train-clean-100/`` FLAC tree as shipped by OpenSLR
* VCTK: mic-1 FLACs resampled to 16 kHz under ``16kHz_mic1/<speaker>/``
* CLARITY: ``audio/*.flac`` at 16 kHz mono
* DCASE (TAU): ``audio/*.flac`` at 16 kHz mono
* DEMAND: ``<NOISE>_ch01.wav`` per noise type
* ARTE: ``<scene>_withEQ.wav`` binaural recordings
* SURREY / ASH / CATT: BRIR wav trees; BRAS: ``*.sofa`` files

All steps are idempotent (a corpus whose target exists is skipped) and
``--dry-run`` prints the planned actions without touching the network
— which is also how the script is tested offline.

Usage::

    python scripts/download_databases.py [--dry-run] [corpus ...]

Requires ``ffmpeg`` on PATH for the resampling corpora (VCTK, Clarity,
TAU, DEMAND/SCAFE) and ``7z`` for ARTE.
"""

import argparse
import os
import shutil
import subprocess
import sys
import tarfile
import urllib.request
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.config import get_config  # noqa: E402

DEMAND_NOISES = [
    'DKITCHEN', 'DLIVING', 'DWASHING', 'NFIELD', 'NPARK', 'NRIVER',
    'OHALLWAY', 'OMEETING', 'OOFFICE', 'PCAFETER', 'PRESTO', 'PSTATION',
    'SCAFE', 'SPSQUARE', 'STRAFFIC', 'TBUS', 'TCAR', 'TMETRO',
]

ARTE_SCENES = [
    '01_Library_binaural', '02_Office_binaural', '03_Church_1_binaural',
    '04_Living_Room_binaural', '05_Church_2_binaural',
    '06_Diffuse_noise_binaural', '07_Cafe_1_binaural',
    '08_Cafe_2_binaural', '09_Dinner_party_binaural',
    '10_Street_Balcony_binaural', '11_Train_station_binaural',
    '12_Food_Court_1_binaural', '13_Food_Court_2_binaural',
]

# (download URL, path of the .sofa member inside the zip)
BRAS_ITEMS = [
    ('https://depositonce.tu-berlin.de/bitstreams/'
     '53c3cf64-3547-4aa6-946b-1b4755729f2a/download',
     '1 Scene descriptions/CR2 small room (seminar room)/BRIRs/'
     'CR2_BRIRs.sofa'),
    ('https://depositonce.tu-berlin.de/bitstreams/'
     'e7b13112-0306-4596-9d9f-c6db057b0552/download',
     '1 Scene descriptions/CR3 medium room (chamber music hall)/BRIRs/'
     'CR3_BRIRs.sofa'),
    ('https://depositonce.tu-berlin.de/bitstreams/'
     'bad0610b-293c-47cb-9926-c30c32f9b4c8/download',
     '1 Scene descriptions/CR4 large room (auditorium)/BRIRs/'
     'CR4_BRIRs.sofa'),
    ('https://depositonce.tu-berlin.de/bitstreams/'
     'ccce535a-c508-4046-8748-4458b8e73d13/download',
     '1 Scene descriptions/RS5 diffraction (infinite wedge)/BRIRs/'
     'RS5_BRIRs.sofa'),
]


class Ops:
    """Filesystem/network operations, swappable for --dry-run."""

    def __init__(self, dry_run=False):
        self.dry_run = dry_run

    def _log(self, msg):
        print(msg, flush=True)

    def download(self, dest_dir, url, filename=None):
        filename = filename or url.rsplit('/', 1)[-1]
        dest = os.path.join(dest_dir, filename)
        if self.dry_run:
            self._log(f'would download {url} -> {dest}')
            return dest
        os.makedirs(dest_dir, exist_ok=True)
        self._log(f'downloading {url}')
        part = dest + '.part'
        with urllib.request.urlopen(url) as r, open(part, 'wb') as f:
            shutil.copyfileobj(r, f, length=1 << 20)
        os.replace(part, dest)
        return dest

    def untar(self, archive, dest_dir, strip=1):
        if self.dry_run:
            self._log(f'would untar {archive} -> {dest_dir} '
                      f'(strip {strip})')
            return
        self._log(f'extracting {archive}')
        with tarfile.open(archive) as tf:
            for member in tf.getmembers():
                parts = member.name.split('/')[strip:]
                if not parts:
                    continue
                member.name = '/'.join(parts)
                tf.extract(member, dest_dir, filter='data')
        os.remove(archive)

    def unzip(self, archive, dest_dir):
        if self.dry_run:
            self._log(f'would unzip {archive} -> {dest_dir}')
            return
        self._log(f'extracting {archive}')
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(dest_dir)
        os.remove(archive)

    def unzip_member(self, archive, member, dest):
        if self.dry_run:
            self._log(f'would extract {member} from {archive} -> {dest}')
            return
        self._log(f'extracting {member} from {archive}')
        with zipfile.ZipFile(archive) as zf, zf.open(member) as src, \
                open(dest, 'wb') as out:
            shutil.copyfileobj(src, out)
        os.remove(archive)

    def un7z(self, archive, member, dest_dir):
        if self.dry_run:
            self._log(f'would 7z-extract {member} from {archive}')
            return
        subprocess.run(['7z', 'x', archive, member, f'-o{dest_dir}',
                        '-y'], check=True, stdout=subprocess.DEVNULL)
        os.remove(archive)

    def resample(self, src, dest):
        """16 kHz mono via ffmpeg; the source is removed."""
        if self.dry_run:
            self._log(f'would resample {src} -> {dest}')
            return
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        subprocess.run(
            ['ffmpeg', '-i', src, '-ac', '1', '-ar', '16000',
             '-hide_banner', '-loglevel', 'error', '-y', dest],
            check=True)
        os.remove(src)

    def move_children(self, src_dir, dest_dir):
        if self.dry_run:
            self._log(f'would move {src_dir}/* -> {dest_dir}')
            return
        os.makedirs(dest_dir, exist_ok=True)
        for name in os.listdir(src_dir):
            shutil.move(os.path.join(src_dir, name),
                        os.path.join(dest_dir, name))
        shutil.rmtree(src_dir)

    def delete(self, path):
        if self.dry_run:
            self._log(f'would delete {path}')
            return
        shutil.rmtree(path, ignore_errors=True)


def _exists(path, what='directory'):
    if os.path.exists(path):
        print(f'{what} {path} already exists, skipping')
        return True
    return False


def _resample_tree(ops, files, label, to_flac=False, dest_fn=None):
    n = len(files)
    for i, src in enumerate(files):
        dest = dest_fn(src) if dest_fn else src
        if to_flac:
            dest = os.path.splitext(dest)[0] + '.flac'
        print(f'\rresampling {label}: {i + 1}/{n}', end='', flush=True)
        ops.resample(src, dest)
    if n:
        print()


def _find(root, suffix):
    out = []
    for dirpath, _, names in os.walk(root):
        out += [os.path.join(dirpath, f) for f in names
                if f.endswith(suffix)]
    return sorted(out)


# ---------------------------------------------------------------------------
# per-corpus preparation

def prep_libri(ops, root):
    if _exists(os.path.join(root, 'train-clean-100')):
        return
    archive = ops.download(
        root, 'https://www.openslr.org/resources/12/train-clean-100.tar.gz')
    ops.untar(archive, root, strip=1)


def prep_vctk(ops, root):
    resampled = os.path.join(root, '16kHz_mic1')
    raw = os.path.join(root, 'wav48_silence_trimmed')
    if _exists(resampled):
        return
    if not os.path.isdir(raw):
        archive = ops.download(
            root, 'https://datashare.ed.ac.uk/download/DS_10283_3443.zip')
        ops.unzip(archive, root)
        inner = os.path.join(root, 'VCTK-Corpus-0.92.zip')
        if os.path.exists(inner) or ops.dry_run:
            ops.unzip(inner, root)
    if ops.dry_run:
        print(f'would resample {raw}/**_mic1.flac -> {resampled}/'
              '<speaker>/')
        return
    files = _find(raw, '_mic1.flac')

    def dest_fn(src):
        speaker = os.path.basename(os.path.dirname(src))
        return os.path.join(resampled, speaker, os.path.basename(src))

    _resample_tree(ops, files, 'VCTK', dest_fn=dest_fn)
    ops.delete(raw)


def prep_clarity(ops, root):
    audio = os.path.join(root, 'audio')
    if not os.path.isdir(audio):
        archive = ops.download(
            root, 'https://salford.figshare.com/ndownloader/files/33974840')
        ops.untar(archive, root, strip=1)
    if ops.dry_run:
        print(f'would resample {audio}/*.wav -> 16 kHz mono flac')
        return
    _resample_tree(ops, _find(audio, '.wav'), 'Clarity', to_flac=True)


def prep_dcase(ops, root):
    audio = os.path.join(root, 'audio')
    if _exists(audio):
        return
    base = ('https://zenodo.org/records/2589280/files/'
            'TAU-urban-acoustic-scenes-2019-development.audio')
    staging = os.path.join(root, 'TAU-urban-acoustic-scenes-2019-'
                                 'development')
    for i in range(1, 22):
        part = f'{audio}_{i}'
        if not os.path.isdir(part):
            archive = ops.download(root, f'{base}.{i}.zip')
            ops.unzip(archive, root)
            if not ops.dry_run:
                os.rename(os.path.join(staging, 'audio'), part)
        # resample outside the download guard so an interrupted run
        # resumes with the remaining wavs
        wavs = _find(part, '.wav') if not ops.dry_run else []
        _resample_tree(ops, wavs, f'TAU part {i}', to_flac=True)
    if ops.dry_run:
        print(f'would merge {audio}_1..21 -> {audio}')
        return
    os.makedirs(audio, exist_ok=True)
    for i in range(1, 22):
        ops.move_children(f'{audio}_{i}', audio)
    ops.delete(staging)


def prep_demand(ops, root):
    for noise in DEMAND_NOISES:
        out = os.path.join(root, f'{noise}_ch01.wav')
        if _exists(out, 'file'):
            continue
        fs = '48k' if noise == 'SCAFE' else '16k'  # no 16 kHz SCAFE
        archive = ops.download(
            root, f'https://zenodo.org/records/1227121/files/'
                  f'{noise}_{fs}.zip')
        if noise == 'SCAFE':
            raw = os.path.join(root, f'{noise}_ch01_48k.wav')
            ops.unzip_member(archive, f'{noise}/ch01.wav', raw)
            ops.resample(raw, out)
        else:
            ops.unzip_member(archive, f'{noise}/ch01.wav', out)


def prep_arte(ops, root):
    for scene in ARTE_SCENES:
        # the train-station archive capitalizes Station differently
        member = ('11_Train_Station_binaural_withEQ.wav'
                  if scene == '11_Train_station_binaural'
                  else f'{scene}_withEQ.wav')
        if _exists(os.path.join(root, member), 'file'):
            continue
        archive = ops.download(
            root, f'https://zenodo.org/records/3386569/files/{scene}.7z')
        ops.un7z(archive, member, root)


def _prep_github(ops, root, repo_url, top):
    if _exists(os.path.join(root, 'README.md'), 'file'):
        return
    archive = ops.download(root, repo_url, filename='master.zip')
    ops.unzip(archive, root)
    ops.move_children(os.path.join(root, top), root)


def prep_surrey(ops, root):
    _prep_github(
        ops, root,
        'https://github.com/philgzl/iosr-real-brirs-wav/archive/'
        'master.zip',
        'iosr-real-brirs-wav-master')


def prep_ash(ops, root):
    _prep_github(
        ops, root,
        'https://github.com/ShanonPearce/ASH-IR-Dataset/archive/'
        'master.zip',
        'ASH-IR-Dataset-master')


def prep_catt(ops, root):
    if _exists(os.path.join(root, '0_0s')):
        return
    archive = ops.download(
        root, 'https://iosr.surrey.ac.uk/software/downloads/CATT_RIRs.zip')
    ops.unzip(archive, root)
    ops.move_children(os.path.join(root, 'CATT_RIRs', 'Binaural', '16k'),
                      root)
    ops.delete(os.path.join(root, 'CATT_RIRs'))


def prep_bras(ops, root):
    for url, member in BRAS_ITEMS:
        name = os.path.basename(member)
        if _exists(os.path.join(root, name), 'file'):
            continue
        archive = ops.download(root, url, filename='download')
        ops.unzip_member(archive, member, os.path.join(root, name))


CORPORA = {
    'libri': prep_libri,
    'vctk': prep_vctk,
    'clarity': prep_clarity,
    'dcase': prep_dcase,
    'demand': prep_demand,
    'arte': prep_arte,
    'surrey': prep_surrey,
    'ash': prep_ash,
    'catt': prep_catt,
    'bras': prep_bras,
}


def main():
    parser = argparse.ArgumentParser(
        description='download and prepare the external databases')
    parser.add_argument('corpora', nargs='*', choices=[[], *CORPORA],
                        default=[],
                        help='corpora to prepare (default: all)')
    parser.add_argument('--dry-run', action='store_true',
                        help='print planned actions without downloading')
    args = parser.parse_args()

    paths = get_config('config/paths.yaml')
    ops = Ops(dry_run=args.dry_run)
    for name in (args.corpora or list(CORPORA)):
        root = getattr(paths, name.upper())
        print(f'== {name} -> {root}')
        CORPORA[name](ops, root)


if __name__ == '__main__':
    main()
