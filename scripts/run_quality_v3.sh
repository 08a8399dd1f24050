#!/bin/bash
# Quality pipeline v3: the full zero-egress quality-evidence chain in one
# resumable run (supersedes run_quality_pipeline.sh + run_quality_v2.sh,
# which remain as the stage-by-stage documentation). The v1/v2 split existed
# because the first round sized budgets to prove the pipeline; v3 goes
# straight to the v2 budgets (teacher 42k iters, student 30k) and is designed
# to be restarted after a machine loss: each completed stage drops a marker
# file and is skipped on re-run, and train.py auto-resumes from the latest
# checkpoint inside a stage.
#   bash scripts/run_quality_v3.sh
set -eo pipefail
cd /root/repo
# NB: append — the session env may carry a sitecustomize dir (TPU plugin
# registration) in PYTHONPATH that must not be clobbered.
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=$ROOT/qlogs
MARK=$ROOT/qstages
mkdir -p "$DATA/fid-refs" "$LOGS" "$MARK"

log() { echo "[quality-v3 $(date +%H:%M:%S)] $*"; }
done_stage() { touch "$MARK/$1.done"; log "stage $1 done"; }
skip() { [ -f "$MARK/$1.done" ] && log "stage $1 already done, skipping" && return 0 || return 1; }

if ! skip dataset; then
    log "stage: dataset (50k procgen images)"
    python scripts/make_procedural_dataset.py \
        --out "$DATA/procgen-32x32.zip" --num 50000 --res 32 \
        > "$LOGS/dataset.log" 2>&1
    done_stage dataset
fi

if ! skip smoke; then
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
    done_stage smoke
fi

if ! skip refstats; then
    log "stage: reference stats (FID-RandNet over the dataset)"
    timeout 3600 python scripts/fid/compute_dataset_ref_stats.py \
        --dataset "$DATA/procgen-32x32.zip" \
        --out "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        > "$LOGS/refstats.log" 2>&1
    done_stage refstats
fi

if ! skip floor; then
    log "stage: floor (split-half FID of the dataset)"
    timeout 3600 python scripts/fid/dataset_floor.py \
        --dataset "$DATA/procgen-32x32.zip" --detector_path=random:0 \
        --out "$DATA/fid-refs/procgen-floor.json" \
        > "$LOGS/floor.log" 2>&1
    tail -1 "$LOGS/floor.log"
    done_stage floor
fi

if ! skip teacher; then
    log "stage: teacher (42k-iter EDM DSM, ~3h; auto-resumes from latest ckpt)"
    timeout 14400 python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        - trainer.max_iter=42000 trainer.save_ckpt_iter=6000 \
        > "$LOGS/teacher.log" 2>&1
    done_stage teacher
fi

if ! skip teacher_fid; then
    log "stage: teacher FID row at 42k (35-step sampler)"
    timeout 7200 python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher --min_ckpt 42000 \
        - trainer.max_iter=42000 \
        > "$LOGS/fid_teacher.log" 2>&1
    cat "$ROOT"/fastgen/procgen/sft_edm_procgen/checkpoints/fid.json || true
    done_stage teacher_fid
fi

if ! skip student; then
    log "stage: student (30k-iter DMD2 from the 42k teacher, ~3h)"
    timeout 18000 python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        - trainer.max_iter=30000 trainer.save_ckpt_iter=5000 \
          log_config.name=dmd2_procgen_v2 \
        > "$LOGS/student.log" 2>&1
    done_stage student
fi

if ! skip student_fid; then
    log "stage: student FID sweep (1-step, every retained ckpt)"
    timeout 7200 python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        - log_config.name=dmd2_procgen_v2 \
        > "$LOGS/fid_student.log" 2>&1
    cat "$ROOT"/fastgen/procgen/dmd2_procgen_v2/checkpoints/fid.json || true
    done_stage student_fid
fi
log "quality v3 complete"
