#!/bin/bash
# Post-quality-pipeline TPU bench batch: runs the wan_train config sweep and
# the fused-GroupNorm A/B as soon as the chip is free, committing results.
# Budgeted for ~75 min of chip time (sweep points ~6-8 min each).
set -u
cd /root/repo
OUT=${1:-quality/wan_train_sweep.jsonl}
mkdir -p "$(dirname "$OUT")" quality/bench

note() { echo "[postbench $(date +%H:%M:%S)] $*"; }

run_point() {  # mode group resf32 [batch]
    local mode=$1 group=$2 resf32=$3 batch=${4:-1}
    note "wan_train mode=$mode group=$group residual_f32=$resf32 batch=$batch"
    local line
    line=$(FASTGEN_BENCH=wan_train \
        FASTGEN_BENCH_REMAT_MODE=$mode \
        FASTGEN_BENCH_SCAN_GROUP=$group \
        FASTGEN_BENCH_RESIDUAL_F32=$resf32 \
        FASTGEN_BENCH_BATCH=$batch \
        FASTGEN_BENCH_REPS=3 \
        timeout 900 python bench.py 2>/dev/null | tail -1)
    if [ -n "$line" ] && echo "$line" | head -c1 | grep -q '{'; then
        echo "$line" | python -c "
import json,sys
rec = json.loads(sys.stdin.read())
rec.update(mode='$mode', scan_group=$group, residual_f32=$resf32, batch=$batch)
print(json.dumps(rec))" >> "$OUT"
        tail -1 "$OUT"
    else
        echo "{\"mode\": \"$mode\", \"scan_group\": $group, \"residual_f32\": $resf32, \"batch\": $batch, \"error\": \"no output (OOM/timeout?)\"}" >> "$OUT"
        note "  -> no output (OOM/timeout?)"
    fi
    git add "$OUT" 2>/dev/null && git commit -q -m "wan_train sweep: $mode/g$group/f32=$resf32 (auto)" 2>/dev/null
}

# ordered by expected information value; baseline confirm first
run_point save_attn 2 1          # round-3 best: 0.118 steps/s, 35.7% MFU
run_point save_attn 2 0          # bf16 residual stream
run_point save_attn_noffn 2 0    # FFN fwd 2x instead of 3x (may OOM)
run_point offload_attn 2 0       # attn saves in pinned host (unbenchmarked)
run_point offload_attn_noffn 2 0 # offloaded HBM spent on FFN bwd workspace
run_point offload_attn 3 0       # offload frees HBM -> bigger groups
run_point save_attn 3 0
run_point save_attn 4 0

# (the fused-GroupNorm A/B loop is gone: round 4 concluded the experiment
# at -34% and DELETED the kernel + its FASTGEN_FUSED_GN hook, so re-running
# it would silently benchmark the identical config twice — advisor r4 #3)
git add quality/bench "$OUT" 2>/dev/null
git commit -q -m "Post-quality bench batch: wan_train sweep" 2>/dev/null
note "done"
