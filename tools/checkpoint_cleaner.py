#!/usr/bin/env python
"""Prune old checkpoints under a work dir (reference
``tools/checkpoint_cleaner.py``): keep the newest N steps plus any multiple
of --keep-every."""

import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint_dir')
    p.add_argument('--keep-last', type=int, default=2)
    p.add_argument('--keep-every', type=int, default=0,
                   help='steps at multiples of this are kept forever')
    p.add_argument('--dry-run', action='store_true')
    args = p.parse_args()

    steps = sorted(int(d) for d in os.listdir(args.checkpoint_dir)
                   if d.isdigit())
    keep = set(steps[-args.keep_last:]) if args.keep_last else set()
    if args.keep_every:
        keep |= {s for s in steps if s % args.keep_every == 0}
    for s in steps:
        if s in keep:
            continue
        path = os.path.join(args.checkpoint_dir, str(s))
        print(('DRY-RUN would remove ' if args.dry_run else 'removing ') + path)
        if not args.dry_run:
            shutil.rmtree(path)


if __name__ == '__main__':
    main()
