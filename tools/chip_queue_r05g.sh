#!/bin/bash
# Round-5 queue, part g — the TTS voice-write-batching validation leg.
# The subphase leg root-caused the tick-p99 stall (gw_voice 1417 ms,
# n_voice 64 at the completion wave); the fix batches the zero-voice
# writes into one scatter per bucket.  Pass bar (VERDICT r4 #4):
# tick p99 <= 2x p50 at B=64.
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
run() {
  local art="$1" to="$2"; shift 2
  local tmp="$OUT/$(basename "$art").tmp"
  if [ -s "$art" ]; then return 0; fi
  log "RUN [$to s] -> $art : $*"
  if timeout "$to" "$@" > "$tmp" 2> "$OUT/$(basename "$art").err"; then
    mv "$tmp" "$art"; log "done: $art"
  else
    log "FAILED ($?): $art"
  fi
}
wait_for_tpu
log "queue-r05g start"
run "docs/SUSTAINED_TTS_r05_b64_batchedvoice.json" 5400 \
  env DSM_TTS_FUSE=4 DSM_TTS_PIPELINE=2 DSM_TTS_CA_INT8=1 \
      DSM_RTT_PROBE_HZ=5 \
  python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64 \
    --events docs/SUSTAINED_TTS_r05_b64_batchedvoice_events.json
log "queue-r05g done"
