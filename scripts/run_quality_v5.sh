#!/bin/bash
# Quality pipeline v5 (QUALITY.md): the committed-FID-evidence run.
#
# Differences from v4 (whose three FID stages all failed — see QUALITY.md):
#   * persistent JAX compilation cache (fastgen_tpu/__init__.py) + the
#     detector-variable disk cache mean repeat stages skip the multi-minute
#     InceptionV3 compiles that ate v4's refstats/FID budgets;
#   * FID stages are guarded on the ref npz existing (a missing ref used to
#     waste the full sampling budget before failing at the load);
#   * the student FID stage no longer needs the teacher's pretrained path:
#     compute_fid_from_ckpts passes load_pretrained=False (a full checkpoint
#     restore follows);
#   * producers write atomically (tmp+rename), so a timeout can't leave a
#     corrupt zip/npz that reruns silently consume;
#   * every fid.json is copied into quality/v5/ the moment it lands.
#
# Stages: dataset -> teacher (bounded DSM) -> refstats -> teacher FID
#         -> student (bounded DMD2 distill) -> student FID.
# Stages skip work that already exists, so the script is resumable: rerun it
# and it continues from the last incomplete stage.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=${QUALITY_LOGS:-quality/v5}
RUN_TAG=${RUN_TAG:-v5}
# the student run can carry its own tag so an extended-teacher rerun can
# distill a FRESH student (instead of resuming one trained against the
# shorter teacher)
STUDENT_TAG=${STUDENT_TAG:-$RUN_TAG}
mkdir -p "$DATA/fid-refs" "$LOGS"

TEACHER_ITERS=${TEACHER_ITERS:-12000}
STUDENT_ITERS=${STUDENT_ITERS:-6000}
# device->host checkpoint snapshots cost ~5 min/GB through the TPU tunnel, so
# the save cadence is budget-critical: default to endpoint-only saves
TEACHER_SAVE_ITER=${TEACHER_SAVE_ITER:-$TEACHER_ITERS}
STUDENT_SAVE_ITER=${STUDENT_SAVE_ITER:-$STUDENT_ITERS}
FID_SAMPLES=${FID_SAMPLES:-10000}
TEACHER_BUDGET=${TEACHER_BUDGET:-5400}
STUDENT_BUDGET=${STUDENT_BUDGET:-5400}
FID_BUDGET=${FID_BUDGET:-2400}

log() { echo "[$RUN_TAG $(date +%H:%M:%S)] $*"; }

# Touch the FileAutoResume sentinel well before a training stage's hard
# timeout: the run then saves-and-exits cleanly (checkpoint snapshots take
# ~5 min/GB through the TPU tunnel; a SIGKILL mid-save leaves only an
# .orbax-checkpoint-tmp dir, which is what killed v4's student row).
SENTINEL=/tmp/fastgen_terminate
with_graceful_budget() {  # $1=budget_secs, rest=command
    local budget=$1; shift
    rm -f "$SENTINEL"
    ( sleep $((budget - 700)) && touch "$SENTINEL" ) &
    local watchdog=$!
    timeout "$budget" "$@"
    local rc=$?
    kill "$watchdog" 2>/dev/null
    rm -f "$SENTINEL"
    return $rc
}

log "stage: dataset"
if [ ! -f "$DATA/procgen-32x32.zip" ]; then
    timeout 900 python scripts/make_procedural_dataset.py \
        --out "$DATA/procgen-32x32.zip" --num 50000 --res 32 \
        > "$LOGS/dataset.log" 2>&1 || log "dataset stage rc=$?"
fi
[ -f "$DATA/procgen-32x32.zip" ] || { log "FATAL: no dataset"; exit 1; }

TCKPT=$ROOT/fastgen/procgen/sft_edm_procgen_$RUN_TAG/checkpoints
TLAST=$(ls "$TCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -z "$TLAST" ] || [ "$TLAST" -lt "$TEACHER_ITERS" ]; then
    # TEACHER_WARM_START: a committed quality/ckpt/*.npz param snapshot
    # (scripts/export_ckpt_params.py) seeds a FRESH run when the Orbax
    # output root did not survive the previous session (iteration restarts
    # at 0 — set TEACHER_ITERS to the *additional* budget in that case)
    WARM=""
    if [ -z "$TLAST" ] && [ -n "${TEACHER_WARM_START:-}" ] \
            && [ -f "$TEACHER_WARM_START" ]; then
        WARM="model.pretrained_model_path=$TEACHER_WARM_START"
        log "teacher warm-start from $TEACHER_WARM_START"
    fi
    log "stage: teacher (resume at ${TLAST:-0} -> ${TEACHER_ITERS} iters)"
    with_graceful_budget $TEACHER_BUDGET python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        - trainer.max_iter=$TEACHER_ITERS trainer.save_ckpt_iter=$TEACHER_SAVE_ITER \
          trainer.validation_iter=0 \
          log_config.name=sft_edm_procgen_$RUN_TAG $WARM \
        > "$LOGS/teacher.log" 2>&1 || log "teacher stage rc=$? (using last ckpt)"
else
    log "stage: teacher — already at $TLAST iters, skipping"
fi

# COMMIT_CKPT=1: pack the teacher endpoint's EMA params into a committable
# single-file snapshot the moment it exists, so the trained teacher survives
# the session (QUALITY.md v6 lost an 8.4k-iter extension to a dead session)
TLAST=$(ls "$TCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ "${COMMIT_CKPT:-0}" = "1" ] && [ -n "$TLAST" ] \
        && [ ! -f "quality/ckpt/teacher_${RUN_TAG}_${TLAST}.npz" ]; then
    log "stage: export teacher ckpt @$TLAST -> quality/ckpt/"
    timeout 600 python scripts/export_ckpt_params.py --ckpt "$TCKPT" \
        --out "quality/ckpt/teacher_${RUN_TAG}_${TLAST}.npz" \
        > "$LOGS/export_ckpt.log" 2>&1 || log "ckpt export rc=$?"
fi

log "stage: refstats"
if [ ! -f "$DATA/fid-refs/procgen-32x32.npz" ]; then
    timeout 1800 python scripts/fid/compute_dataset_ref_stats.py \
        --dataset "$DATA/procgen-32x32.zip" \
        --out "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        > "$LOGS/refstats.log" 2>&1 || log "refstats rc=$?"
fi
if [ ! -f "$DATA/fid-refs/procgen-32x32.npz" ]; then
    log "FATAL: no reference stats — skipping all FID stages"
    exit 1
fi

log "stage: dataset floor (split-half, same detector as the FID rows)"
if [ ! -f "$LOGS/floor.json" ]; then
    timeout 1800 python scripts/fid/dataset_floor.py \
        --dataset "$DATA/procgen-32x32.zip" \
        --detector_path=random:0 \
        --out "$LOGS/floor.json" \
        > "$LOGS/floor.log" 2>&1 || log "floor rc=$?"
fi

log "stage: teacher FID (35-step, ${FID_SAMPLES} samples, last ckpt only)"
TLAST=$(ls "$TCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$TLAST" ] && [ ! -f "$LOGS/fid_teacher_${TLAST}.json" ]; then
    timeout $FID_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher \
        --num_samples $FID_SAMPLES --min_ckpt $TLAST \
        - log_config.name=sft_edm_procgen_$RUN_TAG \
        > "$LOGS/fid_teacher.log" 2>&1 || log "teacher fid rc=$?"
    cp -f "$TCKPT/fid.json" "$LOGS/fid_teacher_${TLAST}.json" 2>/dev/null || true
fi

log "stage: student (${STUDENT_ITERS}-iter DMD2 distill from $RUN_TAG teacher)"
SCKPT=$ROOT/fastgen/procgen/dmd2_procgen_$STUDENT_TAG/checkpoints
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -z "$SLAST" ] || [ "$SLAST" -lt "$STUDENT_ITERS" ]; then
    with_graceful_budget $STUDENT_BUDGET python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        - trainer.max_iter=$STUDENT_ITERS trainer.save_ckpt_iter=$STUDENT_SAVE_ITER \
          trainer.validation_iter=0 \
          log_config.name=dmd2_procgen_$STUDENT_TAG \
          model.pretrained_model_path="$TCKPT" \
        > "$LOGS/student.log" 2>&1 || log "student stage rc=$? (using last ckpt)"
else
    log "stage: student — already at $SLAST iters, skipping"
fi

# STUDENT_FID_MIN_CKPT=0 sweeps every saved student checkpoint (the
# per-checkpoint convergence curve); default keeps the cheap last-ckpt row.
log "stage: student FID (1-step, ${FID_SAMPLES} samples)"
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$SLAST" ] && [ ! -f "$LOGS/fid_student_${SLAST}.json" ]; then
    timeout $FID_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        --num_samples $FID_SAMPLES --min_ckpt ${STUDENT_FID_MIN_CKPT:-$SLAST} \
        - log_config.name=dmd2_procgen_$STUDENT_TAG \
        > "$LOGS/fid_student.log" 2>&1 || log "student fid rc=$?"
    cp -f "$SCKPT/fid.json" "$LOGS/fid_student_${SLAST}.json" 2>/dev/null || true
fi

log "$RUN_TAG complete"
