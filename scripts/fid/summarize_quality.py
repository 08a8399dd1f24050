"""Render the committed FID artifacts as the QUALITY.md results table.

Reads every fid_*.json under the given quality log dirs, normalizes step
labels to EFFECTIVE iterations (v7b student +0 at 14599 scale carried from
v7; v8b student labels are +25,000; teacher v7b labels are +15,000 from the
v7 warm start), divides by the committed native floor, and prints a markdown
table sorted by effective iteration — the single source for the QUALITY.md
results section, so the prose can never drift from the artifacts.

Usage: python scripts/fid/summarize_quality.py quality/v8 quality/v8b
"""

from __future__ import annotations

import glob
import json
import os
import sys

FLOOR_PATH = "quality/v8/floor.json"

# label offset -> effective iterations, keyed by run_name
OFFSETS = {
    "sft_edm_procgen_v7b": 15000,   # v7 teacher warm start
    "dmd2_procgen_v7b": 0,          # v7b student trained from 0 in-run
    "dmd2_procgen_v8b": 25000,      # npz warm start at the v7b 25k snapshot
}


def main(dirs):
    with open(FLOOR_PATH) as f:
        floor = json.load(f)["floor"]
    rows = []
    for d in dirs:
        for path in sorted(glob.glob(os.path.join(d, "fid_*.json"))):
            with open(path) as f:
                payload = json.load(f)
            proto = payload.get("protocol", {})
            name = proto.get("run_name", "?")
            for step, fid in payload.items():
                if step == "protocol":
                    continue
                eff = int(step) + OFFSETS.get(name, 0)
                rows.append((proto.get("sampler", "student"), name, eff,
                             int(step), float(fid), path))
    # keep the best (latest artifact wins) per (sampler, effective step)
    dedup = {}
    for sampler, name, eff, step, fid, path in rows:
        dedup[(sampler, eff)] = (sampler, name, eff, step, fid, path)
    print(f"| Model | eff. iters | label | FID-RandNet | x floor | artifact |")
    print(f"|---|---|---|---|---|---|")
    for (sampler, eff), (s, name, _, step, fid, path) in sorted(
            dedup.items(), key=lambda kv: (kv[0][0] != "teacher", kv[0][1])):
        print(f"| {s} ({name}) | {eff:,} | {step} | {fid:,.0f} | "
              f"{fid / floor:.1f} | `{path}` |")
    print(f"\nfloor: {floor:,.0f} (`{FLOOR_PATH}`)")


if __name__ == "__main__":
    main(sys.argv[1:] or ["quality/v7b", "quality/v8", "quality/v8b"])
