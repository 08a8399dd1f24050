#!/bin/bash
# Supervisor for the resumable quality pipeline (run_quality_v7.sh).
#
# Failure mode observed in round 4: the axon TPU tunnel drops a client
# session mid-run ("grant unclaimed past timeout — client lost") and the
# training process blocks forever inside a device_get with the device idle —
# the process is alive, the stage's `timeout` hasn't fired, and nothing
# progresses. The SIGUSR1 stack dump shows the main thread parked in
# jax device_get (quality/v7b/teacher.log, 2026-08-20).
#
# Remedy: watch the newest mtime under the log dir; if NOTHING has been
# written for STALL_SECS, kill the whole pipeline process group and relaunch.
# Every stage of run_quality_v7.sh is resumable (training resumes from the
# last Orbax checkpoint; finished stages no-op), so a relaunch costs at most
# one save cadence of training time.
#
# Usage: env-vars are passed through to the pipeline script.
#   PIPELINE     (default scripts/run_quality_v7.sh)  which pipeline to run
#   STALL_SECS   (default 900)  silence threshold
#   MAX_ATTEMPTS (default 8)
set -u
cd /root/repo
PIPELINE=${PIPELINE:-scripts/run_quality_v7.sh}
LOGS=${QUALITY_LOGS:-quality/v7}
# Round-4 calibration: the tunnel FREEZES for up to ~8 minutes and then
# recovers (quality/v7b/teacher.log iter 10300: host 4315 ms/iter over a
# 7.5-min gap) — killing at 450-600 s aborts runs that would have resumed,
# and the restart's full-state Orbax restore is itself freeze-prone. 900 s
# only catches true wedges (observed: >10 min with the main thread parked in
# device_get and the device idle).
STALL_SECS=${STALL_SECS:-900}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}
mkdir -p "$LOGS"
SUPLOG=$LOGS/supervisor.log

note() { echo "[sup $(date +%H:%M:%S)] $*" | tee -a "$SUPLOG"; }

newest_mtime() {
    # newest artifact under the log dir OR the live training output roots
    find "$LOGS" FASTGEN_OUTPUT -type f -newer /tmp/.sup_epoch 2>/dev/null \
        | head -1
}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
    note "attempt $attempt: launching pipeline"
    setsid bash "$PIPELINE" >> "$LOGS/pipeline_sup.log" 2>&1 &
    PIPE=$!
    PGID=$(ps -o pgid= -p "$PIPE" | tr -d ' ')
    done_flag=""
    while kill -0 "$PIPE" 2>/dev/null; do
        sleep 60
        touch -d "-${STALL_SECS} seconds" /tmp/.sup_epoch
        if [ -z "$(newest_mtime)" ]; then
            note "no artifact written in ${STALL_SECS}s — killing pgid $PGID"
            kill -TERM -- "-$PGID" 2>/dev/null
            sleep 10
            kill -KILL -- "-$PGID" 2>/dev/null
            break
        fi
    done
    wait "$PIPE" 2>/dev/null
    rc=$?
    if tail -5 "$LOGS/pipeline_sup.log" 2>/dev/null | grep -q "complete"; then
        note "pipeline complete (rc=$rc)"
        exit 0
    fi
    note "pipeline exited rc=$rc — retrying"
    sleep 15
done
note "giving up after $MAX_ATTEMPTS attempts"
exit 1
