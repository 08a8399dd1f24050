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
    """Parse the captured xplane directly (the tensorboard_plugin_profile
    converter is broken against this TF build): per-plane, per-event-name
    total durations — on the TPU device plane those are XLA op/fusion
    executions, which is exactly the attribution we need."""
    xplanes = glob.glob(os.path.join(out_dir, "trace", "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        raise SystemExit(f"no xplane under {out_dir}/trace")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(sorted(xplanes)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    report = {}
    for plane in xs.planes:
        totals: dict = {}
        md = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = (md[ev.metadata_id].name
                        if ev.metadata_id in md else "?")
                totals[name] = totals.get(name, 0) + ev.duration_ps
        if not totals:
            continue
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        plane_total = sum(totals.values())
        report[plane.name] = {
            "total_ms": plane_total / 1e9,
            "ops": [{"name": n, "ms": d / 1e9,
                     "frac": d / plane_total} for n, d in rows[:60]],
        }
        # device planes are the interesting ones
        if "TPU" in plane.name or "device" in plane.name.lower():
            print(f"\n== {plane.name}: {plane_total/1e9:.2f} ms total")
            for n, d in rows[:25]:
                print(f"  {100*d/plane_total:6.2f}%  {d/1e9:9.3f} ms  {n[:85]}")
    with open(os.path.join(out_dir, "op_table.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


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
