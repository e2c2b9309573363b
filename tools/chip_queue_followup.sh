#!/bin/bash
# Follow-up chip measurements not covered by tools/chip_queue.sh:
# the W8A8 leg of the quant-divergence study (the actual headline
# serving profile; the main queue measures the W8A8-off leg).
# Run after the main queue exits; same skip-if-exists contract.
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

run "$OUT/divergence_stt1b_w8a8.json" 3600 \
  env DSM_W8A8=1 python tools/quant_divergence.py --model stt-1b --steps 750 --batch 4

# stt-2.6b e2e: B=64 needs 17.3 GB HBM (no donation in this env) — B=32
# is the honest single-chip batch for the 2.6B preset.
run "$OUT/stt26b_e2e_b32.json" 3600 \
  python -m dsm_tpu.bench_perf --e2e --serving --model stt-2.6b --batch 32

run "docs/SUSTAINED_DUPLEX_r03_b24_pipe2.json" 3600 \
  env DSM_DUPLEX_PIPELINE=2 \
  python -m dsm_tpu.bench_perf --duplex-sustained 45 --batch 24

run "$OUT/divergence_s2s2b.json" 3600 \
  python tools/quant_divergence.py --model s2s-2b --steps 750 --batch 2
