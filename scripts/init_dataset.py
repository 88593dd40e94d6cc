"""Initialize a hashed dataset config directory.

Per-kind defaults mirror the reference (scripts/init_dataset.py:44-77):
seeds train=0/val=1337/test=42, file-range splits (train 0-0.8,
test 0.8-1.0), room-angle parity even (train/val) vs odd (test).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.args import DatasetArgParser  # noqa: E402
from brever_tpu.config import DatasetInitializer  # noqa: E402

KIND_DEFAULTS = {
    'train': dict(seed=0, speech_files=(0.0, 0.8), noise_files=(0.0, 0.8),
                  room_files='even'),
    'val': dict(seed=1337, speech_files=(0.0, 0.8), noise_files=(0.0, 0.8),
                room_files='even'),
    'test': dict(seed=42, speech_files=(0.8, 1.0), noise_files=(0.8, 1.0),
                 room_files='odd'),
}


def main():
    parser = DatasetArgParser(description=__doc__)
    parser.add_argument('kind', choices=['train', 'val', 'test'])
    parser.add_argument('--force', action='store_true')
    args = parser.parse_args()

    for key, value in KIND_DEFAULTS[args.kind].items():
        if getattr(args, key) is None:
            setattr(args, key, value)

    initializer = DatasetInitializer()
    path = initializer.init_from_args(args)
    print(path)


if __name__ == '__main__':
    main()
