#!/bin/bash
# Round-4 final measurement legs (after chip_queue_r04b.sh).
set -u
cd /root/repo
OUT=docs/chipq
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/queue_r04.log"; }
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
pass() {
  MISSING=0
  # int16 wire at depth 1: the best-dt config (grace gate p50 69.5 - ~8 ms
  # upload saving); pipe2 keeps cadence but queues dt (p50 81, late 0.51).
  run "docs/SUSTAINED_r04_i16.json" 3600 \
    env DSM_PCM_INT16=1 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 128 \
      --events docs/SUSTAINED_r04_i16_events.json

  # B=192 with the int16 wire too (upload 2.9 MB -> 1.5 MB/tick; the
  # depth-2 f32 leg holds realtime at dt p50 99.4).
  run "docs/SUSTAINED_r04_b192_pipe2_i16.json" 3600 \
    env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 192
}
for i in 1 2 3; do
  wait_for_tpu
  log "queue-c pass $i/3"
  pass
  [ "$MISSING" -eq 0 ] && { log "queue-c complete"; exit 0; }
  sleep 60
done
