#!/bin/bash
# Zero-egress quality-evidence pipeline (QUALITY.md): procgen dataset ->
# EDM teacher -> DMD2 1-step student -> FID-RandNet sweep -> fid.json.
# Counterpart of the reference's DMD2 CIFAR-10 recipe
# (/root/reference/fastgen/methods/distribution_matching/README.md:21-23).
#
# Stages are idempotent-ish: pass a stage name to resume from it.
#   bash scripts/run_quality_pipeline.sh [dataset|smoke|teacher|refstats|student|fid]
set -eo pipefail
cd /root/repo
# NB: append — the session env may carry a sitecustomize dir (TPU plugin
# registration) in PYTHONPATH that must not be clobbered.
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=$ROOT/qlogs
mkdir -p "$DATA/fid-refs" "$LOGS"
STAGE=${1:-dataset}

log() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

run_stage() { # name -> 0 if it should run
    [ "$ORDER_REACHED" = 1 ] && return 0
    [ "$1" = "$STAGE" ] && ORDER_REACHED=1 && return 0
    return 1
}
ORDER_REACHED=0

if run_stage dataset; then
    log "stage: dataset (50k procgen images)"
    python scripts/make_procedural_dataset.py \
        --out "$DATA/procgen-32x32.zip" --num 50000 --res 32 \
        > "$LOGS/dataset.log" 2>&1
fi

if run_stage smoke; then
    log "stage: smoke (3-iter teacher + student on TPU)"
    timeout 900 python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        - trainer.max_iter=3 trainer.save_ckpt_iter=3 log_config.name=smoke_teacher \
        > "$LOGS/smoke_teacher.log" 2>&1
    timeout 900 python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        - trainer.max_iter=3 trainer.save_ckpt_iter=3 log_config.name=smoke_student \
          model.pretrained_model_path="$ROOT/fastgen/procgen/smoke_teacher/checkpoints" \
        > "$LOGS/smoke_student.log" 2>&1
    log "smoke OK"
fi

if run_stage teacher; then
    log "stage: teacher (12k-iter EDM DSM, ~1h)"
    python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        > "$LOGS/teacher.log" 2>&1
    log "teacher done"
fi

if run_stage refstats; then
    log "stage: reference stats (FID-RandNet over the dataset)"
    python scripts/fid/compute_dataset_ref_stats.py \
        --dataset "$DATA/procgen-32x32.zip" \
        --out "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        > "$LOGS/refstats.log" 2>&1
fi

if run_stage student; then
    log "stage: student (20k-iter DMD2, ~2.5h)"
    python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        > "$LOGS/student.log" 2>&1
    log "student done"
fi

if run_stage fid; then
    log "stage: FID sweep (student ckpts + teacher upper bound)"
    python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        > "$LOGS/fid_student.log" 2>&1
    python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher --min_ckpt 12000 \
        > "$LOGS/fid_teacher.log" 2>&1
    log "FID done:"
    cat "$ROOT"/fastgen/procgen/*/fid.json 2>/dev/null || true
fi
log "pipeline complete"
