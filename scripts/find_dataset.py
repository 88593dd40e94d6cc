"""Find dataset directories whose configs match CLI filters
(reference scripts/find_dataset.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.args import DatasetArgParser  # noqa: E402
from brever_tpu.config import DatasetFinder  # noqa: E402


def main():
    parser = DatasetArgParser(description=__doc__)
    parser.add_argument('--kind', choices=['train', 'val', 'test'])
    parser.add_argument('--created', action='store_true',
                        help='only show created datasets')
    parser.add_argument('--uncreated', action='store_true',
                        help='only show uncreated datasets')
    args = parser.parse_args()

    finder = DatasetFinder()
    dsets, configs = finder.find_from_args(args)
    for dset in dsets:
        created = os.path.exists(os.path.join(dset, 'mixture_info.json'))
        if args.created and not created:
            continue
        if args.uncreated and created:
            continue
        print(dset)


if __name__ == '__main__':
    main()
