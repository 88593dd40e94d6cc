"""Benchmark the input pipeline: time epochs for a sampler/batch-size/
workers combination (reference scripts/benchmark_dataset.py)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.batching import BatchSamplerRegistry  # noqa: E402
from brever_tpu.data import BreverDataLoader, BreverDataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('input', help='dataset directory')
    parser.add_argument('--epochs', type=int, default=2)
    parser.add_argument('--batch_size', type=float, default=16.0)
    parser.add_argument('--batch_sampler', default='bucket')
    parser.add_argument('--dynamic', action='store_true', default=True)
    parser.add_argument('--workers', type=int, default=0)
    parser.add_argument('--pad_quantum', type=float, default=0.5)
    args = parser.parse_args()

    dataset = BreverDataset(path=args.input)
    sampler_kwargs = dict(batch_size=args.batch_size, dynamic=args.dynamic)
    if args.batch_sampler == 'bucket':
        sampler_kwargs['num_buckets'] = 10
    sampler = BatchSamplerRegistry.get(args.batch_sampler)(
        dataset=dataset, **sampler_kwargs)
    loader = BreverDataLoader(
        dataset, sampler, num_workers=args.workers,
        pad_to_multiple=round(args.pad_quantum * dataset.fs) or None)

    total_items = 0
    shapes = set()
    start = time.perf_counter()
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        t0 = time.perf_counter()
        n_batches = 0
        for batch, lengths in loader:
            n_batches += 1
            total_items += lengths.shape[0]
            first = batch[0] if isinstance(batch, list) else batch
            shapes.add(first.shape)
        print(f'epoch {epoch}: {n_batches} batches in '
              f'{time.perf_counter() - t0:.2f} s')
    elapsed = time.perf_counter() - start
    print(f'total: {total_items} items in {elapsed:.2f} s '
          f'({total_items / elapsed:.1f} items/s)')
    print(f'distinct batch shapes (XLA compile cache pressure): '
          f'{len(shapes)}')


if __name__ == '__main__':
    main()
