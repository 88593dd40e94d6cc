"""Create a dataset: roll mixtures until the target duration is
reached, writing per-source audio into ``audio.tar`` (or a directory)
plus ``mixture_info.json`` and ``log.log``.

Reference behavior: scripts/create_dataset.py:19-100. Audio format is
FLAC by default like the reference (written by the in-repo codec,
brever_tpu/flac.py); ``--format wav`` writes float32 WAV instead
(larger, faster to encode).
"""

import argparse
import io
import json
import logging
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.audio import write_audio  # noqa: E402
from brever_tpu.config import get_config  # noqa: E402
from brever_tpu.logger import set_logger  # noqa: E402
from brever_tpu.mixture import RandomMixtureMaker  # noqa: E402


def create_dataset(dataset_dir, no_tar=False, format='flac'):
    mixture_info_path = os.path.join(dataset_dir, 'mixture_info.json')
    if os.path.exists(mixture_info_path):
        raise FileExistsError(
            f'dataset already created: {mixture_info_path}')

    config = get_config(os.path.join(dataset_dir, 'config.yaml'))
    set_logger(os.path.join(dataset_dir, 'log.log'))
    logging.info(f'Creating dataset {dataset_dir}')
    logging.info(config.to_dict())

    rmm = RandomMixtureMaker(**config.rmm.to_dict())
    sources = config.sources
    fs = config.rmm.fs

    tar = None
    if no_tar:
        audio_dir = os.path.join(dataset_dir, 'audio')
        os.makedirs(audio_dir, exist_ok=True)
    else:
        tar = tarfile.open(os.path.join(dataset_dir, 'audio.tar'), 'w')

    metadatas = []
    total_samples = 0
    target_samples = config.duration * fs
    start = time.time()
    i = 0
    while total_samples < target_samples:
        mix, metadata = rmm()
        for source in sources:
            x = getattr(mix, source).astype('float32')
            name = f'audio/{i:05d}_{source}.{format}'
            if tar is None:
                write_audio(
                    os.path.join(audio_dir, f'{i:05d}_{source}.{format}'),
                    x, fs, name=name)
            else:
                buf = io.BytesIO()
                write_audio(buf, x, fs, name=name)
                data = buf.getvalue()
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        metadatas.append(metadata)
        total_samples += len(mix)
        i += 1
    if tar is not None:
        tar.close()

    with open(mixture_info_path, 'w') as f:
        json.dump(metadatas, f, default=str)
    logging.info(f'Wrote {i} mixtures '
                 f'({total_samples / fs:.1f} s) in '
                 f'{time.time() - start:.1f} s')
    return i


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('input', help='dataset directory')
    parser.add_argument('--no-tar', action='store_true',
                        help='write audio files to a directory instead '
                        'of a tar archive')
    parser.add_argument('--format', default='flac',
                        choices=['flac', 'wav'],
                        help='audio encoding (default: flac, like the '
                        'reference)')
    args = parser.parse_args()
    create_dataset(args.input, no_tar=args.no_tar, format=args.format)


if __name__ == '__main__':
    main()
