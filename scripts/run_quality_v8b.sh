#!/bin/bash
# Quality pipeline v8b (QUALITY.md): recover from the machine restart that
# wiped FASTGEN_OUTPUT mid-v8.
#
# v8 state at the wipe: teacher DONE at 30000 labels (45k effective,
# FID 8.03x floor — quality/v8/fid_teacher_30000.json, committed); student
# resumed 25000 -> 36000 and died mid-run. The Orbax run dirs, dataset and
# refstats are gone; the committed quality/ckpt/*.npz param snapshots are the
# surviving state — exactly the failure mode they were added for (round-4
# verdict, trainer._save_param_snapshot).
#
# v8b therefore:
#   * regenerates the dataset (make_procedural_dataset.py is seeded — same
#     bytes, so refstats/floor/FID rows stay comparable; floor.json is
#     already committed in quality/v8 and is NOT recomputed);
#   * warm-starts the student as a NEW run dmd2_procgen_v8b: net from
#     dmd2_procgen_v7b_025000.npz, teacher (and via post_init fake_score)
#     from sft_edm_procgen_v7b_030000.npz. Optimizer moments, discriminator
#     and fake_score training state are lost with the Orbax dir — the one
#     real cost of the wipe; labels restart at 0 with a +25,000 offset
#     (mirrors the v7 -> v7b +15,000 teacher offset);
#   * recovers the four v7b student FID rows (17500..25000) that died with
#     the output root, directly from the committed npz snapshots
#     (compute_fid_from_ckpts.py --npz);
#   * FIDs the new v8b snapshots;
#   * teacher npz snapshot sweep last (verdict task 6), newest-first rows
#     written incrementally so a timeout keeps completed rows.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export FASTGEN_SYNC_EVERY_ITER=${FASTGEN_SYNC_EVERY_ITER:-1}
ROOT=${FASTGEN_OUTPUT_ROOT:-FASTGEN_OUTPUT}
DATA=$ROOT/DATA
LOGS=${QUALITY_LOGS:-quality/v8b}
RUN_TAG=v8b
STUDENT_NAME=dmd2_procgen_v8b
TEACHER_NPZ=quality/ckpt/sft_edm_procgen_v7b_030000.npz
STUDENT_WARM_NPZ=quality/ckpt/dmd2_procgen_v7b_025000.npz
mkdir -p "$DATA/fid-refs" "$LOGS" quality/ckpt

STUDENT_ITERS=${STUDENT_ITERS:-11000}      # labels 0..11000 = 25k..36k effective
STUDENT_SAVE_ITER=${STUDENT_SAVE_ITER:-2000}
FID_SAMPLES=${FID_SAMPLES:-10000}
STUDENT_BUDGET=${STUDENT_BUDGET:-5400}
FID_BUDGET=${FID_BUDGET:-3600}
STUDENT_BS=${STUDENT_BS:-128}

log() { echo "[$RUN_TAG $(date +%H:%M:%S)] $*"; }

# ------------------------------------------------------------------ committer
committer() {
    while true; do
        sleep 240
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

[ -f "$TEACHER_NPZ" ] || { log "FATAL: $TEACHER_NPZ missing"; exit 1; }
[ -f "$STUDENT_WARM_NPZ" ] || { log "FATAL: $STUDENT_WARM_NPZ missing"; exit 1; }

log "stage: dataset (deterministic regen, seed 0)"
if [ ! -f "$DATA/procgen-32x32.zip" ]; then
    timeout --foreground 1200 python scripts/make_procedural_dataset.py \
        --out "$DATA/procgen-32x32.zip" --num 50000 --res 32 \
        > "$LOGS/dataset.log" 2>&1 || log "dataset stage rc=$?"
fi
[ -f "$DATA/procgen-32x32.zip" ] || { log "FATAL: no dataset"; exit 1; }

SCKPT=$ROOT/fastgen/procgen/$STUDENT_NAME/checkpoints
SLAST=$(ls "$SCKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -z "$SLAST" ] || [ "$SLAST" -lt "$STUDENT_ITERS" ]; then
    log "stage: student (warm-start net=$STUDENT_WARM_NPZ teacher=$TEACHER_NPZ -> ${STUDENT_ITERS} iters, bs=$STUDENT_BS)"
    with_graceful_budget $STUDENT_BUDGET python train.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        - trainer.max_iter=$STUDENT_ITERS trainer.save_ckpt_iter=$STUDENT_SAVE_ITER \
          trainer.validation_iter=0 \
          trainer.snapshot_dir=quality/ckpt \
          dataloader_train.batch_size=$STUDENT_BS trainer.batch_size_global=$STUDENT_BS \
          log_config.name=$STUDENT_NAME \
          model.pretrained_model_path="$TEACHER_NPZ" \
          model.pretrained_student_net_path="$STUDENT_WARM_NPZ" \
        > "$LOGS/student.log" 2>&1 || log "student stage rc=$? (using last ckpt)"
else
    log "stage: student — already at $SLAST iters, skipping"
fi

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

log "stage: recover v7b student FID rows 17500..25000 from npz snapshots"
if [ ! -f "$LOGS/fid_student_v7b_recovered.json" ]; then
    timeout --foreground $FID_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 \
        --num_samples $FID_SAMPLES --min_ckpt 15000 \
        --npz 'quality/ckpt/dmd2_procgen_v7b_*.npz' \
        --out "$LOGS/fid_student_v7b_recovered.json" \
        - log_config.name=dmd2_procgen_v7b \
        > "$LOGS/fid_student_v7b.log" 2>&1 || log "v7b recovery fid rc=$?"
fi

log "stage: v8b student FID (1-step, ${FID_SAMPLES} samples, all new snapshots)"
timeout --foreground $FID_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
    --config=fastgen_tpu/configs/experiments/EDM/config_dmd2_procgen.py \
    --ref "$DATA/fid-refs/procgen-32x32.npz" \
    --detector_path=random:0 \
    --num_samples $FID_SAMPLES --min_ckpt 0 \
    --npz "quality/ckpt/${STUDENT_NAME}_*.npz" \
    --out "$LOGS/fid_student_v8b.json" \
    - log_config.name=$STUDENT_NAME \
    > "$LOGS/fid_student_v8b.log" 2>&1 || log "v8b student fid rc=$?"

log "stage: teacher npz snapshot sweep (35-step; verdict task 6)"
if [ ! -f "$LOGS/fid_teacher_sweep.json" ]; then
    timeout --foreground $FID_BUDGET python scripts/fid/compute_fid_from_ckpts.py \
        --config=fastgen_tpu/configs/experiments/EDM/config_sft_edm_procgen.py \
        --ref "$DATA/fid-refs/procgen-32x32.npz" \
        --detector_path=random:0 --sampler teacher \
        --num_samples $FID_SAMPLES --min_ckpt 16000 --max_ckpt 29999 \
        --npz 'quality/ckpt/sft_edm_procgen_v7b_*.npz' \
        --out "$LOGS/fid_teacher_sweep.json" \
        - log_config.name=sft_edm_procgen_v7b \
        > "$LOGS/fid_teacher_sweep.log" 2>&1 || log "teacher sweep rc=$?"
fi

git add quality/ckpt "$LOGS" 2>/dev/null
git diff --cached --quiet 2>/dev/null || \
    git commit -q -m "quality $RUN_TAG: final artifacts" 2>/dev/null || true
log "$RUN_TAG complete"
