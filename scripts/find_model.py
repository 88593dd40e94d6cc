"""Find model directories whose configs match CLI filters
(reference scripts/find_model.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.args import ModelArgParser  # noqa: E402
from brever_tpu.config import ModelFinder  # noqa: E402


def main():
    parser = ModelArgParser(required=False, description=__doc__)
    parser.add_argument('--trained', action='store_true',
                        help='only show trained models')
    parser.add_argument('--untrained', action='store_true',
                        help='only show untrained models')
    args = parser.parse_args()

    finder = ModelFinder()
    models, configs = finder.find_from_args(args)
    for model in models:
        trained = os.path.exists(os.path.join(model, 'losses.npz'))
        if args.trained and not trained:
            continue
        if args.untrained and trained:
            continue
        print(model)


if __name__ == '__main__':
    main()
