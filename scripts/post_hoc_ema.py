"""Reconstruct arbitrary EMA profiles from a checkpoint series
(reference scripts/post_hoc_ema.py; Karras et al. 2023)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402,E501
from brever_tpu.ops import EMAKarras  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('input', help='checkpoint directory')
    parser.add_argument('--sigma-rels', type=float, nargs='+',
                        default=[0.05, 0.1],
                        help='sigma_rel values tracked during training')
    parser.add_argument('--sigma-rel-r', type=float, required=True,
                        help='target sigma_rel to reconstruct')
    parser.add_argument('--output', help='output checkpoint path')
    args = parser.parse_args()

    ema = EMAKarras(sigma_rels=args.sigma_rels)
    params = ema.post_hoc_ema(args.input, args.sigma_rel_r)
    output = args.output or os.path.join(
        args.input, f'post_hoc_sigma_rel={args.sigma_rel_r}.ckpt')
    # wrap like a trainer checkpoint so test_model.py can load it
    base = sorted(
        f for f in os.listdir(args.input) if f.endswith('.ckpt')
    )
    template = load_checkpoint(os.path.join(args.input, base[-1]))
    template['params'] = params
    template.pop('ema', None)
    save_checkpoint(output, template)
    print(f'wrote {output}')


if __name__ == '__main__':
    main()
