#!/bin/bash
# Adopt an already-running run_quality_v7.sh (launched by a supervisor whose
# session died) and keep supervising it: kill-on-stall + relaunch through
# scripts/supervise_quality.sh until the pipeline logs "complete".
#
# Usage: ADOPT_PGID=<pgid> [env for run_quality_v7.sh] bash scripts/babysit_v7b.sh
set -u
cd /root/repo
LOGS=${QUALITY_LOGS:-quality/v7b}
STALL_SECS=${STALL_SECS:-900}
SUPLOG=$LOGS/supervisor.log
note() { echo "[babysit $(date +%H:%M:%S)] $*" | tee -a "$SUPLOG"; }

PGID=${ADOPT_PGID:-}
if [ -n "$PGID" ]; then
    note "adopting live pipeline pgid $PGID"
    while kill -0 -- "-$PGID" 2>/dev/null; do
        sleep 60
        touch -d "-${STALL_SECS} seconds" /tmp/.sup_epoch_babysit
        if [ -z "$(find "$LOGS" FASTGEN_OUTPUT -type f -newer /tmp/.sup_epoch_babysit 2>/dev/null | head -1)" ]; then
            note "no artifact written in ${STALL_SECS}s — killing adopted pgid $PGID"
            kill -TERM -- "-$PGID" 2>/dev/null
            sleep 10
            kill -KILL -- "-$PGID" 2>/dev/null
            break
        fi
    done
    note "adopted pipeline gone"
fi
if tail -5 "$LOGS/pipeline_sup.log" 2>/dev/null | grep -q "complete"; then
    note "pipeline already complete"
    exit 0
fi
note "handing off to supervise_quality.sh"
exec bash scripts/supervise_quality.sh
