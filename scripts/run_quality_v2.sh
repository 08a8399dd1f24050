#!/bin/bash
# Quality pipeline v2 (extends scripts/run_quality_pipeline.sh): the round-2
# sweep showed both curves still falling at their iteration caps (teacher
# 12k, student 20k), so v2 trains the teacher to 42k, distills a fresh
# student (dmd2_procgen_v2) from it for 30k, and re-anchors fid.json with the
# dataset split-half floor.
#   bash scripts/run_quality_v2.sh [floor|teacher|refresh_teacher_fid|student|fid]
set -eo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=$ROOT/qlogs
mkdir -p "$LOGS"
STAGE=${1:-floor}

log() { echo "[quality-v2 $(date +%H:%M:%S)] $*"; }
run_stage() {
    [ "$ORDER_REACHED" = 1 ] && return 0
    [ "$1" = "$STAGE" ] && ORDER_REACHED=1 && return 0
    return 1
}
ORDER_REACHED=0

if run_stage floor; then
    log "stage: floor (split-half FID of the dataset, CPU)"
    python scripts/fid/dataset_floor.py \
        --dataset "$DATA/procgen-32x32.zip" --detector_path=random:0 \
        --out "$DATA/fid-refs/procgen-floor.json" \
        > "$LOGS/floor.log" 2>&1
    tail -1 "$LOGS/floor.log"
fi

if run_stage teacher; then
    log "stage: teacher 12k -> 42k (auto-resumes from the latest ckpt, ~2h)"
    timeout 10800 python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        - trainer.max_iter=42000 trainer.save_ckpt_iter=6000 \
        > "$LOGS/teacher_v2.log" 2>&1
    log "teacher v2 done"
fi

if run_stage refresh_teacher_fid; then
    log "stage: teacher FID row at 42k"
    timeout 3600 python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher --min_ckpt 42000 \
        - trainer.max_iter=42000 \
        > "$LOGS/fid_teacher_v2.log" 2>&1
    cat "$ROOT"/fastgen/procgen/sft_edm_procgen/checkpoints/fid.json || true
fi

if run_stage student; then
    log "stage: student v2 (30k-iter DMD2 from the 42k teacher, ~3h)"
    timeout 14400 python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        - trainer.max_iter=30000 trainer.save_ckpt_iter=5000 \
          log_config.name=dmd2_procgen_v2 \
        > "$LOGS/student_v2.log" 2>&1
    log "student v2 done"
fi

if run_stage fid; then
    log "stage: student v2 FID sweep"
    timeout 7200 python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        - log_config.name=dmd2_procgen_v2 \
        > "$LOGS/fid_student_v2.log" 2>&1
    cat "$ROOT"/fastgen/procgen/dmd2_procgen_v2/checkpoints/fid.json || true
fi
log "quality v2 complete"
