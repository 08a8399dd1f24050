#!/bin/bash
# wan_train config sweep: run the flagship training bench across remat /
# scan-group / residual-dtype configurations, one fresh process per point
# (compile caches persist across processes; HBM does not fragment).
#
# Usage: bash scripts/sweep_wan_train.sh [out.jsonl]
# Each line of the output is the bench's JSON record + the config fields.
set -u
cd /root/repo
OUT=${1:-quality/wan_train_sweep.jsonl}
mkdir -p "$(dirname "$OUT")"

run_point() {  # mode group resf32 [batch]
    local mode=$1 group=$2 resf32=$3 batch=${4:-1}
    echo "=== mode=$mode group=$group residual_f32=$resf32 batch=$batch ===" >&2
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
        tail -1 "$OUT" >&2
    else
        echo "{\"mode\": \"$mode\", \"scan_group\": $group, \"residual_f32\": $resf32, \"batch\": $batch, \"error\": \"no output (OOM/timeout?)\"}" >> "$OUT"
    fi
}

# current best first (baseline sanity), then the unexplored axes
run_point save_attn 2 1          # round-3 best: 0.118 steps/s, 35.7% MFU
run_point save_attn 2 0          # bf16 residual stream
run_point save_attn_noffn 2 1    # FFN fwd 2x instead of 3x (may OOM)
run_point save_attn_noffn 2 0
run_point offload_attn 2 1       # attn saves in pinned host (unbenchmarked)
run_point offload_attn 2 0
run_point offload_attn_noffn 2 0 # offloaded HBM spent on FFN bwd workspace
run_point offload_attn 3 0       # offload frees HBM -> bigger groups
run_point save_attn 3 0
run_point save_attn 5 0
echo "sweep complete -> $OUT" >&2
