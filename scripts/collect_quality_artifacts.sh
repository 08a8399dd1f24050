#!/bin/bash
# Snapshot quality-pipeline evidence into the repo (quality/) so it survives
# machine loss. Run after any scripts/run_quality_v3.sh stage completes; safe
# to re-run (idempotent copy of whatever exists).
#
# Collected:
#   quality/fid_teacher.json / fid_student.json  — per-ckpt FID sweeps
#   quality/floor.json                           — dataset split-half FID floor
#   quality/logs/*.log                           — tail of each stage log
set -eo pipefail
cd /root/repo
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
OUT=quality
mkdir -p "$OUT/logs"

cp_if() { [ -f "$1" ] && cp "$1" "$2" && echo "collected $2" || true; }

cp_if "$ROOT/DATA/fid-refs/procgen-floor.json" "$OUT/floor.json"
cp_if "$ROOT/fastgen/procgen/sft_edm_procgen/checkpoints/fid.json" "$OUT/fid_teacher.json"
cp_if "$ROOT/fastgen/procgen/dmd2_procgen_v2/checkpoints/fid.json" "$OUT/fid_student.json"

for f in "$ROOT"/qlogs/*.log; do
    [ -f "$f" ] || continue
    tail -n 200 "$f" > "$OUT/logs/$(basename "$f")"
done
echo "quality artifacts snapshotted into $OUT/"
