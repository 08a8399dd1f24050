"""Compute FID reference statistics (mu, sigma) over a class-conditional zip
dataset and save them as the ``*.npz`` the FID sweep consumes.

Counterpart of the EDM-repo reference npz files the upstream downloads
(``/root/reference/scripts/fid/fid.py:103-122`` loads
``fid-refs/cifar10-32x32.npz``); zero-egress environments generate them from
the local dataset instead:

    python scripts/fid/compute_dataset_ref_stats.py \
        --dataset FASTGEN_OUTPUT/DATA/procgen-32x32.zip \
        --out FASTGEN_OUTPUT/DATA/fid-refs/procgen-32x32.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# Module-level so the SIGUSR1 stack-dump handler (scripts/fid/fid.py) covers
# the whole process — a liveness probe must never terminate a stats run.
import scripts.fid.fid  # noqa: E402,F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, help="class-cond zip dataset")
    p.add_argument("--out", required=True, help="output npz path")
    p.add_argument("--batch", type=int, default=250)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--detector", default="auto")
    p.add_argument("--detector_path", default=None)
    args = p.parse_args()

    from fastgen_tpu.data.class_cond_dataset import ImageFolderDataset
    from scripts.fid.fid import calculate_inception_stats, get_detector

    ds = ImageFolderDataset(args.dataset, use_labels=False, cache=False)
    n = len(ds) if args.max_samples is None else min(len(ds), args.max_samples)
    # fixed-size batches only: a ragged tail batch would trigger a second
    # multi-minute detector compile through the TPU tunnel. The trim is
    # logged, never silent.
    if n % args.batch:
        print(f"trimming {n % args.batch} tail images so every batch is "
              f"{args.batch} (one compiled shape)", flush=True)
        n -= n % args.batch

    def batches():
        for start in range(0, n, args.batch):
            imgs = [np.asarray(ds[i][0])
                    for i in range(start, start + args.batch)]
            yield np.stack(imgs)
            if start % (10 * args.batch) == 0:
                print(f"{start}/{n}", flush=True)

    detector = get_detector(args.detector, args.detector_path)
    mu, sigma = calculate_inception_stats(batches(), detector)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    # atomic write: a timeout mid-save must not leave a corrupt npz the
    # pipeline's [ ! -f ] guard would later treat as valid reference stats
    tmp = args.out + ".tmp.npz"
    np.savez(tmp, mu=mu, sigma=sigma)
    os.replace(tmp, args.out)
    print(f"wrote mu/sigma over {n} images -> {args.out}")


if __name__ == "__main__":
    main()
