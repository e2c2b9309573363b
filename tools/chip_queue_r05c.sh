#!/bin/bash
# Round-5 measurement queue, part c — runs after chip_queue_r05b.sh.
# Ordered by priority (the round may end mid-queue):
#   1. v2 probe re-captures at every batch — they carry the corrected
#      client-clock delivery metric and arbitrate the B=224 served claim
#      (majority rule in bench.py served_slo); all compile-cached, ~5 min
#      each.
#   2. Fused-attn headline A/B at B=224 (flip-the-default evidence).
#   3. LM phase profiles (longest; transport-retry hardened).
# Safe to edit UNTIL launched (the chain runner execs it fresh).
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
  # -- Priority 1: v2 delivery-metric probe legs (arbitrate served SLO;
  #    the B=128/192 probe legs and the plain sustained legs predate the
  #    delivery-lag off-by-one fix; B=224 splits 1/2 across runs). --
  for B in 224 192 128 160; do
    run "docs/SUSTAINED_r05_b${B}_probe2.json" 3600 \
      env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 DSM_RTT_PROBE_HZ=5 \
      python -m dsm_tpu.bench_perf --server-sustained 45 --batch "$B" \
        --events "docs/SUSTAINED_r05_b${B}_probe2_events.json"
    if [ -s "docs/SUSTAINED_r05_b${B}_probe2.json" ]; then
      post "$OUT/tail_correlation_b${B}_v2.json" \
        python3 -S tools/tail_correlation.py \
          "docs/SUSTAINED_r05_b${B}_probe2.json" \
          "docs/SUSTAINED_r05_b${B}_probe2_events.json"
    fi
  done

  # -- Priority 1.5: TTS B=64 with the GC freeze (the 1.4 s tick-p99
  #    stall attributed to a gen2 sweep in the gather phase; pass bar is
  #    tick p99 <= 2x p50). Compile-cached from the r05b legs. --
  run "docs/SUSTAINED_TTS_r05_b64_gcfix.json" 3600 \
    env DSM_TTS_FUSE=4 DSM_TTS_PIPELINE=2 DSM_TTS_CA_INT8=1 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64 \
      --events docs/SUSTAINED_TTS_r05_b64_gcfix_events.json

  # -- Priority 2: fused commit+attend at the headline batch.  B=128 A/B
  #    measured 12.62 vs 13.16 ms (-4.1%, bit-exact); if the gain holds
  #    at B=224 the serving default flips for stt-1b. --
  run "$OUT/headline_b224_fused.json" 5400 \
    env DSM_FUSED_ATTN=1 BENCH_BATCH=224 python bench.py

  # -- Priority 3: LM phase profiles (VERDICT #2).  The b128 profile died
  #    twice on transient remote_compile broken pipes (after attn_read
  #    8.87 ms / attn 9.93 ms landed on stderr); lm_profile now retries
  #    transport errors per phase and emits partial JSON. --
  run "$OUT/lm_profile_b128.json" 7200 \
    python tools/lm_profile.py --batch 128 --steps 20
  # stt-2.6b sits at ~3x its arithmetic floor (25.6 ms at B=48 vs ~9 ms:
  # 3.5 GB rings + 2.6 GB weights at the measured 749 GB/s) — attribute
  # before optimising (Dh=64 lane waste, matmul stack, or host overhead?).
  run "$OUT/lm_profile_26b_b48.json" 7200 \
    python tools/lm_profile.py --model stt-2.6b --batch 48 --steps 20
}
for i in 1 2 3; do
  wait_for_tpu
  log "queue-r05c pass $i/3"
  pass
  [ "$MISSING" -eq 0 ] && { log "queue-r05c complete"; exit 0; }
  sleep 60
done
log "queue-r05c finished with $MISSING missing"
