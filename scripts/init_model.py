"""Initialize a hashed model config directory from an architecture's
defaults plus CLI overrides (reference scripts/init_model.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.args import ModelArgParser  # noqa: E402
from brever_tpu.config import ModelInitializer  # noqa: E402


def main():
    parser = ModelArgParser(description=__doc__)
    parser.add_argument('--force', action='store_true')
    args = parser.parse_args()
    initializer = ModelInitializer()
    path = initializer.init_from_args(args)
    print(path)


if __name__ == '__main__':
    main()
