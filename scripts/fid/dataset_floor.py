"""Split-half FID floor of a dataset — the calibration row for fid.json.

FID scale depends entirely on the detector (for FID-RandNet the features are
an arbitrary random projection), so absolute numbers mean nothing without two
anchors: the dataset-vs-itself floor (this script: FID between two disjoint
halves of the real data) and the teacher upper bound
(``compute_fid_from_ckpts.py --sampler teacher``). The reference ships
precomputed cifar10 npz stats and never needs this
(``/root/reference/scripts/fid/fid.py:103-122``); zero-egress procgen runs do.

    python scripts/fid/dataset_floor.py \
        --dataset FASTGEN_OUTPUT/DATA/procgen-32x32.zip --detector_path=random:0
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# Module-level so the SIGUSR1 stack-dump handler (registered at
# scripts/fid/fid.py import) is active for the WHOLE process lifetime —
# v7b's floor run was killed (rc=138) by a liveness probe that landed
# before main()'s lazy import installed it.
import scripts.fid.fid  # noqa: E402,F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--detector", default="auto")
    p.add_argument("--detector_path", default=None)
    p.add_argument("--out", default=None, help="optional floor.json path")
    args = p.parse_args()

    from fastgen_tpu.data.class_cond_dataset import ImageFolderDataset
    from scripts.fid.fid import (calculate_fid_from_inception_stats,
                                 calculate_inception_stats, get_detector)

    ds = ImageFolderDataset(args.dataset, use_labels=False, cache=False)
    n = len(ds)
    detector = get_detector(args.detector, args.detector_path)
    print(f"Detector: {type(detector).__name__}; {n} images, halves of {n // 2}")

    def half_iter(start, stop):
        for lo in range(start, stop, args.batch):
            hi = min(lo + args.batch, stop)
            yield np.stack([ds[i][0] for i in range(lo, hi)])

    mu_a, sig_a = calculate_inception_stats(half_iter(0, n // 2), detector)
    mu_b, sig_b = calculate_inception_stats(half_iter(n // 2, n), detector)
    floor = calculate_fid_from_inception_stats(mu_a, sig_a, mu_b, sig_b)
    print(f"split-half FID floor: {floor:.6g}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"floor": floor, "num_images": n,
                       "protocol": {"dataset": args.dataset,
                                    "detector": type(detector).__name__,
                                    "detector_path": args.detector_path,
                                    "feature_dim": int(detector.feature_dim),
                                    "split": "first-half vs second-half"}},
                      f, indent=2)


if __name__ == "__main__":
    main()
