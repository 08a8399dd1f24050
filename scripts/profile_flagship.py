"""Flagship-sampler profile: where do the non-MXU 24% go? (r4 verdict
task 7 — "profile the remaining 24% once, conclude, and stop".)

Runs ``bench.py`` with ``FASTGEN_BENCH_PROFILE`` to capture a device trace
of the timed 4-step-sampler loop, then parses the xplane into a per-op
self-time table (tensorboard_plugin_profile's op_profile converter) and
writes ``quality/profile_flagship/op_table.json`` plus a console summary.

    python scripts/profile_flagship.py [--reps 5] [--out quality/profile_flagship]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, reps: int) -> str:
    env = dict(os.environ)
    env["FASTGEN_BENCH_PROFILE"] = os.path.join(out_dir, "trace")
    env["FASTGEN_BENCH_REPS"] = str(reps)
    res = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, timeout=900)
    line = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
    print("bench:", line)
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-2000:])
        raise SystemExit(f"bench rc={res.returncode}")
    with open(os.path.join(out_dir, "bench_record.json"), "w") as f:
        f.write(line + "\n")
    return line


def op_table(out_dir: str):
    """Parse the captured xplane into per-op totals via the tensorflow
    profiler's op-stats converter."""
    xplanes = glob.glob(os.path.join(out_dir, "trace", "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        raise SystemExit(f"no xplane under {out_dir}/trace")
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "op_profile", {})
    prof = json.loads(data)

    rows = []

    def walk(node, path):
        ms = node.get("metrics", {})
        children = node.get("children", [])
        if not children and ms:
            rows.append({
                "name": node.get("name", "?"),
                "path": "/".join(path[-2:]),
                "time_frac": ms.get("timeFraction", 0.0),
                "flop_rate": ms.get("flopRate", 0.0),
            })
        for c in children:
            walk(c, path + [node.get("name", "?")])

    root = prof.get("byProgram") or prof.get("byCategory") or {}
    walk(root, [])
    rows.sort(key=lambda r: -r["time_frac"])
    with open(os.path.join(out_dir, "op_table.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(f"\nTop device ops by self-time fraction ({len(rows)} leaves):")
    for r in rows[:20]:
        print(f"  {r['time_frac']*100:6.2f}%  {r['name'][:90]}")
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="quality/profile_flagship")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    capture(args.out, args.reps)
    try:
        op_table(args.out)
    except Exception as e:  # noqa: BLE001 — keep the raw trace either way
        print(f"op-table conversion failed ({e}); raw trace kept under "
              f"{args.out}/trace for manual inspection")


if __name__ == "__main__":
    main()
