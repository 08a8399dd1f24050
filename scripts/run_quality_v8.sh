#!/bin/bash
# Quality pipeline v8 (QUALITY.md): EXTEND the v7b curves in place.
#
# Round-4 verdict task 1: "Extend — don't restart — the quality runs".
# The v7b Orbax run dirs survived under FASTGEN_OUTPUT/fastgen/procgen/
# ({sft_edm,dmd2}_procgen_v7b, last ckpts 14000 / 14599), so this pipeline
# RESUMES those exact runs (same log_config.name) with raised max_iter —
# optimizer state, EMA, and iteration numbering all continue; no npz
# warm-start and no restart from zero. v7b labels are offset +15,000 from
# effective teacher iterations (v7 warm start), so teacher label 30000 =
# 45k effective.
#
# Differences from run_quality_v7.sh:
#   * fixed run names (sft_edm_procgen_v7b / dmd2_procgen_v7b) — resume, not
#     a fresh tag;
#   * a NATIVE floor recompute (v7b borrowed v5's; the SIGUSR1-kill that
#     caused that is fixed — scripts/fid/*.py all register the handler at
#     import time now);
#   * teacher FID: final ckpt right after training (the ratio anchor), then
#     a FULL snapshot sweep as the last stage (a row per committed snapshot,
#     verdict task 6);
#   * student FID sweeps only NEW checkpoints (>14599; the v7b rows are
#     committed in quality/v7b and the protocol is unchanged).
#
# Stage order puts student training before the expensive teacher sweep:
# if wall-clock runs out, the student curve rows (the round's primary
# deliverable) land first.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export FASTGEN_SYNC_EVERY_ITER=${FASTGEN_SYNC_EVERY_ITER:-1}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=${QUALITY_LOGS:-quality/v8}
RUN_TAG=v8
TEACHER_NAME=sft_edm_procgen_v7b
STUDENT_NAME=dmd2_procgen_v7b
mkdir -p "$DATA/fid-refs" "$LOGS" quality/ckpt

TEACHER_ITERS=${TEACHER_ITERS:-30000}
STUDENT_ITERS=${STUDENT_ITERS:-36000}
TEACHER_SAVE_ITER=${TEACHER_SAVE_ITER:-4000}
STUDENT_SAVE_ITER=${STUDENT_SAVE_ITER:-2500}
FID_SAMPLES=${FID_SAMPLES:-10000}
TEACHER_BUDGET=${TEACHER_BUDGET:-7200}
STUDENT_BUDGET=${STUDENT_BUDGET:-10800}
FID_BUDGET=${FID_BUDGET:-2400}
FID_SWEEP_BUDGET=${FID_SWEEP_BUDGET:-7200}
# batch-size overrides (v8 probe: see quality/v8/batch_probe.md)
TEACHER_BS=${TEACHER_BS:-128}
STUDENT_BS=${STUDENT_BS:-128}

log() { echo "[$RUN_TAG $(date +%H:%M:%S)] $*"; }

# ------------------------------------------------------------------ committer
committer() {
    local tdir=$ROOT/fastgen/procgen/$TEACHER_NAME/checkpoints
    local sdir=$ROOT/fastgen/procgen/$STUDENT_NAME/checkpoints
    while true; do
        sleep 240
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

TCKPT=$ROOT/fastgen/procgen/$TEACHER_NAME/checkpoints
TLAST=$(ls "$TCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
# v8 is resume-only: the v7b run dir must exist (a missing dir means the
# output root was lost and the npz warm-start path of run_quality_v7.sh
# should be used instead — failing hard beats silently training from scratch)
[ -n "$TLAST" ] || { log "FATAL: $TCKPT has no checkpoints — v8 is resume-only"; exit 1; }
TSTART=$TLAST
if [ "$TLAST" -lt "$TEACHER_ITERS" ]; then
    log "stage: teacher (resume at $TLAST -> ${TEACHER_ITERS} iters, bs=$TEACHER_BS)"
    with_graceful_budget $TEACHER_BUDGET python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        - trainer.max_iter=$TEACHER_ITERS trainer.save_ckpt_iter=$TEACHER_SAVE_ITER \
          trainer.validation_iter=0 \
          trainer.snapshot_dir=quality/ckpt \
          dataloader_train.batch_size=$TEACHER_BS trainer.batch_size_global=$TEACHER_BS \
          log_config.name=$TEACHER_NAME \
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

log "stage: native dataset floor (split-half, same detector as the FID rows)"
if [ ! -f "$LOGS/floor.json" ]; then
    timeout --foreground 1800 python scripts/fid/dataset_floor.py \
        --dataset "$DATA/procgen-32x32.zip" \
        --detector_path=random:0 \
        --out "$LOGS/floor.json" \
        > "$LOGS/floor.log" 2>&1 || log "floor rc=$?"
fi

log "stage: teacher FID (35-step, ${FID_SAMPLES} samples, final ckpt $TLAST)"
if [ ! -f "$LOGS/fid_teacher_${TLAST}.json" ]; then
    timeout --foreground $FID_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher \
        --num_samples $FID_SAMPLES --min_ckpt $TLAST \
        - log_config.name=$TEACHER_NAME \
        > "$LOGS/fid_teacher.log" 2>&1 || log "teacher fid rc=$?"
    cp -f "$TCKPT/fid.json" "$LOGS/fid_teacher_${TLAST}.json" 2>/dev/null || true
fi

SCKPT=$ROOT/fastgen/procgen/$STUDENT_NAME/checkpoints
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$SLAST" ] || { log "FATAL: $SCKPT has no checkpoints — v8 is resume-only"; exit 1; }
# FID-sweep base: everything ABOVE the v7b endpoint is a v8 row. Fixed (not
# $SLAST) so a supervisor restart mid-student cannot shrink the sweep range.
SSTART=${STUDENT_FID_BASE:-14599}
if [ "$SLAST" -lt "$STUDENT_ITERS" ]; then
    log "stage: student (resume at $SLAST -> ${STUDENT_ITERS} iters, bs=$STUDENT_BS, teacher @$TLAST)"
    with_graceful_budget $STUDENT_BUDGET python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        - trainer.max_iter=$STUDENT_ITERS trainer.save_ckpt_iter=$STUDENT_SAVE_ITER \
          trainer.validation_iter=0 \
          trainer.snapshot_dir=quality/ckpt \
          dataloader_train.batch_size=$STUDENT_BS trainer.batch_size_global=$STUDENT_BS \
          log_config.name=$STUDENT_NAME \
          model.pretrained_model_path="$TCKPT" \
        > "$LOGS/student.log" 2>&1 || log "student stage rc=$? (using last ckpt)"
else
    log "stage: student — already at $SLAST iters, skipping"
fi

log "stage: student FID (1-step, ${FID_SAMPLES} samples, new ckpts > $SSTART)"
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$SLAST" ] && [ "$SLAST" -gt "$SSTART" ] && [ ! -f "$LOGS/fid_student_${SLAST}.json" ]; then
    timeout --foreground $FID_SWEEP_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        --num_samples $FID_SAMPLES --min_ckpt $((SSTART + 1)) \
        - log_config.name=$STUDENT_NAME \
        > "$LOGS/fid_student.log" 2>&1 || log "student fid rc=$?"
    cp -f "$SCKPT/fid.json" "$LOGS/fid_student_${SLAST}.json" 2>/dev/null || true
fi

log "stage: teacher FID snapshot sweep (a row per saved ckpt, verdict task 6)"
if [ ! -f "$LOGS/fid_teacher_sweep.json" ]; then
    timeout --foreground $FID_SWEEP_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher \
        --num_samples $FID_SAMPLES --min_ckpt 0 \
        - log_config.name=$TEACHER_NAME \
        > "$LOGS/fid_teacher_sweep.log" 2>&1 || log "teacher sweep rc=$?"
    cp -f "$TCKPT/fid.json" "$LOGS/fid_teacher_sweep.json" 2>/dev/null || true
fi

git add quality/ckpt "$LOGS" 2>/dev/null
git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "quality $RUN_TAG: final artifacts" 2>/dev/null || true
log "$RUN_TAG complete"
