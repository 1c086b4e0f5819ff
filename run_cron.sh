#!/usr/bin/env bash
# Cron wrapper (reference: run_cron.sh): run the pipeline, tee logs,
# propagate the pipeline's exit code through the pipe.
set -u
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
LOG_DIR="${LOG_DIR:-$SCRIPT_DIR/logs}"
mkdir -p "$LOG_DIR"
TS="$(date +%Y%m%d_%H%M%S)"

cd "$SCRIPT_DIR"
python -m audio_processor_tpu.cli \
    --config "${CONFIG_FILE:-config.yaml}" \
    --save-mode database --performance-report --load-metadata \
    2>&1 | tee "$LOG_DIR/cron_run_$TS.log"
exit "${PIPESTATUS[0]}"
