#!/bin/bash
# Round-5 queue, part f — swapped in after the fresh headline landed:
#   1. Instrumented+probed TTS B=64 leg (gather sub-phase split + RTT
#      probe landed AFTER part e's probe leg ran) — decides the tick-p99
#      stall attribution: lock wait vs upload dispatches vs tunnel.
#   2. Fused-attn headline A/B at B=224.
#   3. B=160 probe leg (completes the served-SLO sweep).
#   4. LM phase profiles (longest, last; may be cut by round end).
set -u
cd /root/repo
OUT=docs/chipq
LOG="$OUT/queue_r05.log"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }
wait_for_tpu() {
  until timeout 240 python - <<'PYEOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
PYEOF
  do log "TPU unavailable; retrying in 180 s"; sleep 180; done
  log "TPU is UP"
}
MISSING=0
run() {
  local art="$1" to="$2"; shift 2
  local tmp="$OUT/$(basename "$art").tmp"
  if [ -s "$art" ]; then return 0; fi
  log "RUN [$to s] -> $art : $*"
  if timeout "$to" "$@" > "$tmp" 2> "$OUT/$(basename "$art").err"; then
    mv "$tmp" "$art"; log "done: $art"
  else
    log "FAILED ($?): $art"; MISSING=$((MISSING + 1))
  fi
}
post() {
  local art="$1"; shift
  if [ -s "$art" ]; then return 0; fi
  log "POST -> $art : $*"
  if "$@" > "$art.tmp" 2> "$OUT/$(basename "$art").err"; then
    mv "$art.tmp" "$art"; log "done: $art"
  else
    log "POST FAILED ($?): $art"; rm -f "$art.tmp"; MISSING=$((MISSING + 1))
  fi
}
pass() {
  MISSING=0
  run "docs/SUSTAINED_TTS_r05_b64_subphase.json" 5400 \
    env DSM_TTS_FUSE=4 DSM_TTS_PIPELINE=2 DSM_TTS_CA_INT8=1 \
        DSM_RTT_PROBE_HZ=5 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64 \
      --events docs/SUSTAINED_TTS_r05_b64_subphase_events.json
  if [ -s "docs/SUSTAINED_TTS_r05_b64_subphase.json" ]; then
    post "$OUT/tail_correlation_tts_b64.json" \
      python tools/tail_correlation.py \
        "docs/SUSTAINED_TTS_r05_b64_subphase.json" \
        "docs/SUSTAINED_TTS_r05_b64_subphase_events.json" \
        --budget-ms 320
  fi
  run "$OUT/headline_b224_fused.json" 5400 \
    env DSM_FUSED_ATTN=1 BENCH_BATCH=224 python bench.py
  run "docs/SUSTAINED_r05_b160_probe2.json" 5400 \
    env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 DSM_RTT_PROBE_HZ=5 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 160 \
      --events docs/SUSTAINED_r05_b160_probe2_events.json
  if [ -s "docs/SUSTAINED_r05_b160_probe2.json" ]; then
    post "$OUT/tail_correlation_b160_v2.json" \
      python tools/tail_correlation.py \
        "docs/SUSTAINED_r05_b160_probe2.json" \
        "docs/SUSTAINED_r05_b160_probe2_events.json"
  fi
  run "$OUT/lm_profile_b128.json" 7200 \
    python tools/lm_profile.py --batch 128 --steps 20
  run "$OUT/lm_profile_26b_b48.json" 7200 \
    python tools/lm_profile.py --model stt-2.6b --batch 48 --steps 20
}
wait_for_tpu
log "queue-r05f start"
pass
log "queue-r05f finished with $MISSING missing"
