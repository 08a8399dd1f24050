#!/bin/bash
# Round-5 wan_train sweep: the group_unroll axis (named-offload remat now
# compiles outside scan bodies — WanVideoDiT.group_unroll) plus batch=2 with
# the HBM the offload frees, and a backward-grid fine-tune point.
#
# Usage: bash scripts/sweep_wan_train_v8.sh [out.jsonl]
# One fresh process per point; persistent compile cache across points.
set -u
cd /root/repo
OUT=${1:-quality/wan_train_sweep_v8.jsonl}
mkdir -p "$(dirname "$OUT")"

run_point() {  # mode group resf32 batch unroll [capq capk]
    local mode=$1 group=$2 resf32=$3 batch=$4 unroll=$5
    local capq=${6:-} capk=${7:-}
    echo "=== mode=$mode g=$group resf32=$resf32 b=$batch unroll=$unroll capq=${capq:--} capk=${capk:--} ===" >&2
    local line
    line=$(FASTGEN_BENCH=wan_train \
        FASTGEN_BENCH_REMAT_MODE=$mode \
        FASTGEN_BENCH_SCAN_GROUP=$group \
        FASTGEN_BENCH_RESIDUAL_F32=$resf32 \
        FASTGEN_BENCH_BATCH=$batch \
        FASTGEN_BENCH_GROUP_UNROLL=$unroll \
        ${capq:+FASTGEN_FLASH_BWD_CAP_Q=$capq} \
        ${capk:+FASTGEN_FLASH_BWD_CAP_K=$capk} \
        FASTGEN_BENCH_REPS=3 \
        timeout 1500 python bench.py 2>/dev/null | tail -1)
    if [ -n "$line" ] && echo "$line" | head -c1 | grep -q '{'; then
        echo "$line" | python -c "
import json,sys
rec = json.loads(sys.stdin.read())
rec.update(mode='$mode', scan_group=$group, residual_f32=$resf32,
           batch=$batch, group_unroll=$unroll,
           cap_q='${capq:-}', cap_k='${capk:-}')
print(json.dumps(rec))" >> "$OUT"
        tail -1 "$OUT" >&2
    else
        echo "{\"mode\": \"$mode\", \"scan_group\": $group, \"residual_f32\": $resf32, \"batch\": $batch, \"group_unroll\": $unroll, \"error\": \"no output (OOM/timeout/compile-reject?)\"}" >> "$OUT"
        tail -1 "$OUT" >&2
    fi
    git add "$OUT" 2>/dev/null
    git commit -q -m "wan_train v8 sweep: $mode/g$group/b$batch/unroll$unroll (auto)" 2>/dev/null || true
}

# 1. r4 committed best, re-measured (baseline for this box/session)
run_point save_attn 2 0 1 0
# 2. does the unrolled loop itself cost anything vs the scan?
run_point save_attn 2 0 1 1
# 3. THE new point: offload compiles under group_unroll -> ~2.8 GB HBM freed
run_point offload_attn 2 0 1 1
run_point offload_attn 3 0 1 1
# 4. spend the freed HBM on batch=2 (better MXU utilization per token)
run_point offload_attn 2 0 2 1
run_point save_attn 2 0 2 0      # does b=2 even fit without offload?
# 5. backward-grid fine-tune under the new liveness (r4 found (936,936);
#    (1560,936) was 0.3% faster standalone but 192KB over VMEM in-step)
run_point offload_attn 2 0 1 1 1560 936
echo "sweep complete -> $OUT" >&2
