"""Convert VoiceBank+DEMAND to the brever dataset layout.

Reference behavior: scripts/vbdemand_to_brever.py — resample the 48 kHz
corpus to 16 kHz and write ``audio/{i:05d}_{mixture,foreground}`` pairs
plus ``mixture_info.json``, with speakers p226/p287 held out for
validation. The download step requires network access; point ``--input``
at an already-downloaded copy (noisy_trainset_28spk_wav /
clean_trainset_28spk_wav / noisy_testset_wav / clean_testset_wav).
Output format is WAV in this environment (FLAC when soundfile is
available).
"""

import argparse
import io
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.audio import read_audio, write_wav  # noqa: E402
from brever_tpu.mixture.io import resample  # noqa: E402

VAL_SPEAKERS = ('p226', 'p287')
SPLITS = {
    'train': ('noisy_trainset_28spk_wav', 'clean_trainset_28spk_wav',
              lambda spk: spk not in VAL_SPEAKERS),
    'val': ('noisy_trainset_28spk_wav', 'clean_trainset_28spk_wav',
            lambda spk: spk in VAL_SPEAKERS),
    'test': ('noisy_testset_wav', 'clean_testset_wav', lambda spk: True),
}


def convert_split(input_dir, output_dir, noisy_name, clean_name, keep,
                  fs=16000, no_tar=False):
    noisy_dir = os.path.join(input_dir, noisy_name)
    clean_dir = os.path.join(input_dir, clean_name)
    if not os.path.exists(noisy_dir):
        raise FileNotFoundError(
            f'{noisy_dir} not found; download VoiceBank+DEMAND first')
    files = sorted(
        f for f in os.listdir(noisy_dir)
        if f.endswith('.wav') and keep(f.split('_')[0])
    )
    os.makedirs(output_dir, exist_ok=True)
    tar = None
    if no_tar:
        os.makedirs(os.path.join(output_dir, 'audio'), exist_ok=True)
    else:
        tar = tarfile.open(os.path.join(output_dir, 'audio.tar'), 'w')

    metadata = []
    for i, filename in enumerate(files):
        pairs = []
        for source, src_dir in [('mixture', noisy_dir),
                                ('foreground', clean_dir)]:
            x, file_fs = read_audio(os.path.join(src_dir, filename))
            if file_fs != fs:
                x = resample(x, file_fs, fs)
            pairs.append((source, x))
        # trim both sources to a common length after resampling
        n = min(len(x) for _, x in pairs)
        for source, x in pairs:
            name = f'audio/{i:05d}_{source}.wav'
            if tar is None:
                write_wav(os.path.join(output_dir, name), x[:n], fs)
            else:
                buf = io.BytesIO()
                write_wav(buf, x[:n], fs)
                data = buf.getvalue()
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        metadata.append({'file': filename, 'frames': n})
    if tar is not None:
        tar.close()
    with open(os.path.join(output_dir, 'mixture_info.json'), 'w') as f:
        json.dump(metadata, f)
    print(f'{output_dir}: {len(files)} files')


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--input', required=True,
                        help='downloaded VoiceBank+DEMAND root')
    parser.add_argument('--output', default='data/datasets',
                        help='output datasets root')
    parser.add_argument('--fs', type=int, default=16000)
    parser.add_argument('--no-tar', action='store_true')
    args = parser.parse_args()

    for kind, (noisy, clean, keep) in SPLITS.items():
        convert_split(
            args.input,
            os.path.join(args.output, kind, 'vbdemand'),
            noisy, clean, keep, fs=args.fs, no_tar=args.no_tar,
        )


if __name__ == '__main__':
    main()
