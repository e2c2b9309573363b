#!/bin/bash
# Round-5 measurement queue, part d — the remainder after the session
# reset killed part c mid-run (VM restart; cold compile cache, so every
# leg pays a fresh compile).  Priority order:
#   1. B=224/192/128 v2 probe legs — corrected client-clock delivery
#      metric; the B=224 leg arbitrates the served-SLO majority rule.
#   2. TTS B=64 GC-fix validation (tick p99 <= 2x p50 pass bar).
#   3. stt-2.6b w8a8-off divergence (decides that model's default).
#   4. Fresh plain headline at B=224 (also warms the driver's bench.py
#      compile cache) + fused-attn headline A/B.
#   5. B=160 probe leg (completes the sweep), LM phase profiles.
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
probe_leg() {  # probe_leg <batch>
  local B="$1"
  run "docs/SUSTAINED_r05_b${B}_probe2.json" 5400 \
    env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 DSM_RTT_PROBE_HZ=5 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch "$B" \
      --events "docs/SUSTAINED_r05_b${B}_probe2_events.json"
  if [ -s "docs/SUSTAINED_r05_b${B}_probe2.json" ]; then
    post "$OUT/tail_correlation_b${B}_v2.json" \
      python tools/tail_correlation.py \
        "docs/SUSTAINED_r05_b${B}_probe2.json" \
        "docs/SUSTAINED_r05_b${B}_probe2_events.json"
  fi
}
pass() {
  MISSING=0
  probe_leg 224
  probe_leg 192
  run "docs/SUSTAINED_TTS_r05_b64_gcfix.json" 5400 \
    env DSM_TTS_FUSE=4 DSM_TTS_PIPELINE=2 DSM_TTS_CA_INT8=1 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64 \
      --events docs/SUSTAINED_TTS_r05_b64_gcfix_events.json
  probe_leg 128
  run "$OUT/divergence_stt26b_w8a8off.json" 5400 \
    env DSM_W8A8=0 python tools/quant_divergence.py --model stt-2.6b \
      --steps 400 --batch 4
  run "$OUT/headline_b224_r05.json" 5400 \
    env BENCH_BATCH=224 python bench.py
  run "$OUT/headline_b224_fused.json" 5400 \
    env DSM_FUSED_ATTN=1 BENCH_BATCH=224 python bench.py
  probe_leg 160
  run "$OUT/lm_profile_b128.json" 7200 \
    python tools/lm_profile.py --batch 128 --steps 20
  run "$OUT/lm_profile_26b_b48.json" 7200 \
    python tools/lm_profile.py --model stt-2.6b --batch 48 --steps 20
}
for i in 1 2 3; do
  wait_for_tpu
  log "queue-r05d pass $i/3"
  pass
  [ "$MISSING" -eq 0 ] && { log "queue-r05d complete"; exit 0; }
  sleep 60
done
log "queue-r05d finished with $MISSING missing"
