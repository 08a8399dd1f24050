#!/bin/bash
# Quality pipeline v7 (QUALITY.md): the converged-student run.
#
# Differences from v5 (whose FID rows are committed but whose v6 teacher
# extension died uncommitted at iter 20.4k):
#   * trainer-side snapshots: every checkpoint save ALSO packs the EMA params
#     into quality/ckpt/<name>_<iter>.npz (trainer.snapshot_dir) — written
#     synchronously from the live state, so a session kill mid-stage keeps
#     every completed cadence, not just a post-stage export;
#   * a background committer git-commits each new snapshot/log within
#     minutes of it landing — trained weights now survive ANY session death;
#   * TEACHER_WARM_START pointing at a missing file is a hard error (it used
#     to silently train from scratch for the full multi-hour budget);
#   * the student FID stage sweeps EVERY saved student checkpoint (the
#     convergence curve), not just the endpoint;
#   * fid.json / floor.json are self-describing (detector, seed, sample
#     count, ref path embedded — see compute_fid_from_ckpts.py).
#
# Stages: dataset -> teacher (bounded DSM) -> refstats -> floor
#         -> teacher FID -> student (bounded DMD2 distill) -> student FID.
# Every stage no-ops if its artifact exists, so the script is resumable.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
# bound the async dispatch queue: deep post-restart queues correlate with the
# axon relay dropping the client, wedging the next device_get forever (see
# scripts/supervise_quality.sh header). <2% overhead at ~250 ms steps.
export FASTGEN_SYNC_EVERY_ITER=${FASTGEN_SYNC_EVERY_ITER:-1}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=${QUALITY_LOGS:-quality/v7}
RUN_TAG=${RUN_TAG:-v7}
STUDENT_TAG=${STUDENT_TAG:-$RUN_TAG}
mkdir -p "$DATA/fid-refs" "$LOGS" quality/ckpt

TEACHER_ITERS=${TEACHER_ITERS:-30000}
STUDENT_ITERS=${STUDENT_ITERS:-20000}
# each save also writes a ~105 MB bf16 npz snapshot that the committer loop
# git-commits — cadence trades git-history weight against the training lost
# if the session dies (at 5k iters ≈ 21 min of teacher time at ~4 it/s)
TEACHER_SAVE_ITER=${TEACHER_SAVE_ITER:-5000}
STUDENT_SAVE_ITER=${STUDENT_SAVE_ITER:-5000}
FID_SAMPLES=${FID_SAMPLES:-10000}
TEACHER_BUDGET=${TEACHER_BUDGET:-11000}
STUDENT_BUDGET=${STUDENT_BUDGET:-9500}
FID_BUDGET=${FID_BUDGET:-2400}
FID_SWEEP_BUDGET=${FID_SWEEP_BUDGET:-5400}

log() { echo "[$RUN_TAG $(date +%H:%M:%S)] $*"; }

# ------------------------------------------------------------------ committer
# Background loop: git-commit new quality artifacts (snapshots, logs, fid
# rows) every few minutes while the pipeline runs. `git add` of explicit
# paths only — never `-A` — so it cannot swallow unrelated working-tree
# changes from a concurrent interactive session.
committer() {
    local tdir=$ROOT/fastgen/procgen/sft_edm_procgen_$RUN_TAG/checkpoints
    local sdir=$ROOT/fastgen/procgen/dmd2_procgen_$STUDENT_TAG/checkpoints
    while true; do
        sleep 240
        # fid.json is rewritten after every checkpoint row — mirror the live
        # copy into the committed log dir so a mid-sweep kill keeps the rows
        # cp -u: only copy when the SOURCE is newer — an unconditional cp -f
        # refreshes the live-copy mtimes every cycle, which feeds the stall
        # supervisor's newest-mtime liveness probe and masks real wedges
        # (observed 2026-08-21: student blocked 12+ min, supervisor silent)
        cp -u "$tdir/fid.json" "$LOGS/fid_teacher_live.json" 2>/dev/null || true
        cp -u "$sdir/fid.json" "$LOGS/fid_student_live.json" 2>/dev/null || true
        git add quality/ckpt "$LOGS" 2>/dev/null
        if ! git diff --cached --quiet 2>/dev/null; then
            git commit -q -m "quality $RUN_TAG: checkpoint snapshots + logs (auto)" \
                2>/dev/null || git reset -q 2>/dev/null
        fi
    done
}
committer &
COMMITTER_PID=$!
trap 'kill $COMMITTER_PID 2>/dev/null' EXIT

# Touch the FileAutoResume sentinel well before a training stage's hard
# timeout so the run saves-and-exits cleanly (a SIGKILL mid-save leaves only
# an .orbax-checkpoint-tmp dir — what killed v4's student row).
SENTINEL=/tmp/fastgen_terminate
with_graceful_budget() {  # $1=budget_secs, rest=command
    local budget=$1; shift
    rm -f "$SENTINEL"
    ( sleep $((budget - 700)) && touch "$SENTINEL" ) &
    local watchdog=$!
    timeout --foreground "$budget" "$@"
    local rc=$?
    kill "$watchdog" 2>/dev/null
    rm -f "$SENTINEL"
    return $rc
}

log "stage: dataset"
if [ ! -f "$DATA/procgen-32x32.zip" ]; then
    timeout --foreground 1200 python scripts/make_procedural_dataset.py \
        --out "$DATA/procgen-32x32.zip" --num 50000 --res 32 \
        > "$LOGS/dataset.log" 2>&1 || log "dataset stage rc=$?"
fi
[ -f "$DATA/procgen-32x32.zip" ] || { log "FATAL: no dataset"; exit 1; }

TCKPT=$ROOT/fastgen/procgen/sft_edm_procgen_$RUN_TAG/checkpoints
TLAST=$(ls "$TCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -z "$TLAST" ] || [ "$TLAST" -lt "$TEACHER_ITERS" ]; then
    # TEACHER_WARM_START: a committed quality/ckpt/*.npz param snapshot seeds
    # a FRESH run when the Orbax output root did not survive the previous
    # session (iteration restarts at 0 — set TEACHER_ITERS to the
    # *additional* budget in that case). A set-but-missing path is a hard
    # error: silently training from random init for the full budget is the
    # most expensive possible outcome of a typo.
    WARM=()
    if [ -z "$TLAST" ] && [ -n "${TEACHER_WARM_START:-}" ]; then
        if [ ! -f "$TEACHER_WARM_START" ]; then
            log "FATAL: TEACHER_WARM_START=$TEACHER_WARM_START is not a file"
            exit 1
        fi
        WARM=("model.pretrained_model_path=$TEACHER_WARM_START")
        log "teacher warm-start from $TEACHER_WARM_START"
    fi
    log "stage: teacher (resume at ${TLAST:-0} -> ${TEACHER_ITERS} iters)"
    with_graceful_budget $TEACHER_BUDGET python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        - trainer.max_iter=$TEACHER_ITERS trainer.save_ckpt_iter=$TEACHER_SAVE_ITER \
          trainer.validation_iter=0 \
          trainer.snapshot_dir=quality/ckpt \
          log_config.name=sft_edm_procgen_$RUN_TAG "${WARM[@]}" \
        > "$LOGS/teacher.log" 2>&1 || log "teacher stage rc=$? (using last ckpt)"
else
    log "stage: teacher — already at $TLAST iters, skipping"
fi
TLAST=$(ls "$TCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$TLAST" ] || { log "FATAL: teacher produced no checkpoint"; exit 1; }

log "stage: refstats"
if [ ! -f "$DATA/fid-refs/procgen-32x32.npz" ]; then
    timeout --foreground 1800 python scripts/fid/compute_dataset_ref_stats.py \
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
    timeout --foreground 1800 python scripts/fid/dataset_floor.py \
        --dataset "$DATA/procgen-32x32.zip" \
        --detector_path=random:0 \
        --out "$LOGS/floor.json" \
        > "$LOGS/floor.log" 2>&1 || log "floor rc=$?"
fi

log "stage: teacher FID (35-step, ${FID_SAMPLES} samples, last ckpt only)"
if [ ! -f "$LOGS/fid_teacher_${TLAST}.json" ]; then
    timeout --foreground $FID_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher \
        --num_samples $FID_SAMPLES --min_ckpt $TLAST \
        - log_config.name=sft_edm_procgen_$RUN_TAG \
        > "$LOGS/fid_teacher.log" 2>&1 || log "teacher fid rc=$?"
    cp -f "$TCKPT/fid.json" "$LOGS/fid_teacher_${TLAST}.json" 2>/dev/null || true
fi

log "stage: student (${STUDENT_ITERS}-iter DMD2 distill from $RUN_TAG teacher @$TLAST)"
SCKPT=$ROOT/fastgen/procgen/dmd2_procgen_$STUDENT_TAG/checkpoints
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -z "$SLAST" ] || [ "$SLAST" -lt "$STUDENT_ITERS" ]; then
    with_graceful_budget $STUDENT_BUDGET python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        - trainer.max_iter=$STUDENT_ITERS trainer.save_ckpt_iter=$STUDENT_SAVE_ITER \
          trainer.validation_iter=0 \
          trainer.snapshot_dir=quality/ckpt \
          log_config.name=dmd2_procgen_$STUDENT_TAG \
          model.pretrained_model_path="$TCKPT" \
        > "$LOGS/student.log" 2>&1 || log "student stage rc=$? (using last ckpt)"
else
    log "stage: student — already at $SLAST iters, skipping"
fi

log "stage: student FID (1-step, ${FID_SAMPLES} samples, full checkpoint sweep)"
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$SLAST" ] && [ ! -f "$LOGS/fid_student_${SLAST}.json" ]; then
    timeout --foreground $FID_SWEEP_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        --num_samples $FID_SAMPLES --min_ckpt ${STUDENT_FID_MIN_CKPT:-0} \
        - log_config.name=dmd2_procgen_$STUDENT_TAG \
        > "$LOGS/fid_student.log" 2>&1 || log "student fid rc=$?"
    cp -f "$SCKPT/fid.json" "$LOGS/fid_student_${SLAST}.json" 2>/dev/null || true
fi

# final sweep of any artifacts the committer loop hasn't picked up yet
git add quality/ckpt "$LOGS" 2>/dev/null
git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "quality $RUN_TAG: final artifacts" 2>/dev/null || true
log "$RUN_TAG complete"
