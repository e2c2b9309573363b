#!/bin/bash
# Post-fix re-measurements: TTS sustained with the batched script-op
# flush (SCRIPT.apply_ops) — the tick p99 / TTFB fix. Run after the
# followup queue exits; same skip-if-exists contract.
set -u
cd /root/repo
OUT=docs/chipq
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

run() {
  local art="$1" to="$2"; shift 2
  local tmp="$OUT/$(basename "$art").tmp"
  if [ -s "$art" ]; then return 0; fi
  log "RUN [$to s] -> $art : $*"
  if timeout "$to" "$@" > "$tmp" 2> "$OUT/$(basename "$art").err"; then
    mv "$tmp" "$art"; log "done: $art"
  else
    log "FAILED ($?): $art"
    tail -3 "$OUT/$(basename "$art").err" | tee -a "$OUT/queue.log"
  fi
}

run "docs/SUSTAINED_TTS_r03_b32_fuse4_opsbatch.json" 3600 \
  env DSM_TTS_FUSE=4 python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 32

run "docs/SUSTAINED_TTS_r03_b64_fuse4_opsbatch.json" 3600 \
  env DSM_TTS_CA_INT8=1 DSM_TTS_FUSE=4 \
  python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64
