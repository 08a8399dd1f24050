#!/bin/bash
# Session-bounded quality refresh (QUALITY.md v4): the v2/v3 long runs did
# not survive their session (checkpoints lived outside the repo), so this
# variant is sized to complete inside one driver session (~45 min on one
# v5e chip) and copies every artifact it produces into quality/v4/ so the
# evidence is committed, not just referenced.
#
# Stages: dataset -> teacher (bounded DSM) -> refstats -> teacher FID row
#         -> student (bounded DMD2 distill) -> student FID row.
# Every stage is timeout-bounded; later stages tolerate earlier ones having
# been cut short (they use whatever checkpoints exist).
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=quality/v4
mkdir -p "$DATA/fid-refs" "$LOGS"

TEACHER_ITERS=${TEACHER_ITERS:-5000}
STUDENT_ITERS=${STUDENT_ITERS:-1500}
FID_SAMPLES=${FID_SAMPLES:-10000}

log() { echo "[v4 $(date +%H:%M:%S)] $*"; }

log "stage: dataset"
if [ ! -f "$DATA/procgen-32x32.zip" ]; then
    timeout 600 python scripts/make_procedural_dataset.py \
        --out "$DATA/procgen-32x32.zip" --num 50000 --res 32 \
        > "$LOGS/dataset.log" 2>&1 || log "dataset stage rc=$?"
fi

log "stage: teacher (${TEACHER_ITERS} iters, bounded)"
timeout 1500 python train.py \
    --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
    - trainer.max_iter=$TEACHER_ITERS trainer.save_ckpt_iter=1000 \
      log_config.name=sft_edm_procgen_v4 \
    > "$LOGS/teacher.log" 2>&1 || log "teacher stage rc=$? (using last ckpt)"

log "stage: refstats"
if [ ! -f "$DATA/fid-refs/procgen-32x32.npz" ]; then
    timeout 600 python scripts/fid/compute_dataset_ref_stats.py \
        --dataset "$DATA/procgen-32x32.zip" \
        --out "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        > "$LOGS/refstats.log" 2>&1 || log "refstats rc=$?"
fi

TCKPT=$ROOT/fastgen/procgen/sft_edm_procgen_v4/checkpoints
log "stage: teacher FID (35-step, ${FID_SAMPLES} samples, last ckpt only)"
LAST=$(ls "$TCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
timeout 900 python scripts/fid/compute_fid_from_ckpts.py \
    --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
    --ref "$DATA/fid-refs/procgen-32x32.npz" \
    --detector_path=random:0 --sampler teacher \
    --num_samples $FID_SAMPLES ${LAST:+--min_ckpt $LAST} \
    - log_config.name=sft_edm_procgen_v4 \
    > "$LOGS/fid_teacher.log" 2>&1 || log "teacher fid rc=$?"
cp -f "$TCKPT/fid.json" "$LOGS/fid_teacher.json" 2>/dev/null || true

log "stage: student (${STUDENT_ITERS}-iter DMD2 distill from v4 teacher)"
timeout 1200 python train.py \
    --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
    - trainer.max_iter=$STUDENT_ITERS trainer.save_ckpt_iter=500 \
      log_config.name=dmd2_procgen_v4 \
      model.pretrained_model_path="$TCKPT" \
    > "$LOGS/student.log" 2>&1 || log "student stage rc=$? (using last ckpt)"

SCKPT=$ROOT/fastgen/procgen/dmd2_procgen_v4/checkpoints
log "stage: student FID (1-step, ${FID_SAMPLES} samples, last ckpt only)"
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
timeout 900 python scripts/fid/compute_fid_from_ckpts.py \
    --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
    --ref "$DATA/fid-refs/procgen-32x32.npz" \
    --detector_path=random:0 \
    --num_samples $FID_SAMPLES ${SLAST:+--min_ckpt $SLAST} \
    - log_config.name=dmd2_procgen_v4 \
    > "$LOGS/fid_student.log" 2>&1 || log "student fid rc=$?"
cp -f "$SCKPT/fid.json" "$LOGS/fid_student.json" 2>/dev/null || true

log "v4 complete"
