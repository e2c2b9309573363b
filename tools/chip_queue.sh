#!/bin/bash
# Round-3 queued chip measurements, in priority order (STATUS.md).
# Waits for the TPU tunnel to return, then runs each job bounded by a
# timeout; every job logs to docs/chipq/. Safe to re-run — jobs that
# already produced their artifact are skipped — and resilient to a flaky
# tunnel: the whole queue loops (re-probing the chip between passes)
# until every artifact exists or MAX_PASSES is hit.
set -u
cd /root/repo
OUT=docs/chipq
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

wait_for_tpu() {
  until timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
import jax.numpy as jnp
(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
EOF
  do
    log "TPU unavailable; retrying in 180 s"
    sleep 180
  done
  log "TPU is UP"
}

MISSING=0
run() {  # run <artifact> <timeout_s> <cmd...>
  local art="$1" to="$2"; shift 2
  local tmp="$OUT/$(basename "$art").tmp"  # keep partials in the ignored dir
  if [ -s "$art" ]; then return 0; fi
  log "RUN [$to s] -> $art : $*"
  if timeout "$to" "$@" > "$tmp" 2> "$OUT/$(basename "$art").err"; then
    mv "$tmp" "$art"; log "done: $art"
  else
    log "FAILED ($?): $art  (stderr tail:)"
    tail -3 "$OUT/$(basename "$art").err" | tee -a "$OUT/queue.log"
    MISSING=$((MISSING + 1))
  fi
}

pass() {
  MISSING=0

  # End-of-round priority order: each artifact proves a distinct VERDICT-r2
  # item; earlier rows are strictly more valuable.  Sustained runs dropped
  # to 45 s to fit more jobs in the remaining window.

  # 1. server-sustained b128 (host-tail-latency proof; the original r03
  #    artifact was lost to a workspace reset)
  run "docs/SUSTAINED_r03.json" 3600 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 128 \
      --events docs/SUSTAINED_r03_events.json

  # 2. fused-tick TTS at B=32 (the depformer/tick headroom lever)
  run "docs/SUSTAINED_TTS_r03_b32_fuse4.json" 3600 \
    env DSM_TTS_FUSE=4 python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 32

  # 3. duplex with dispatch-ahead at B=16 (b16 depth-1 p50 was 93.8 ms)
  run "docs/SUSTAINED_DUPLEX_r03_b16_pipe2.json" 3600 \
    env DSM_DUPLEX_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --duplex-sustained 45 --batch 16

  # 4. flagship quant-divergence study (headline-profile quality bound)
  run "$OUT/divergence_stt1b.json" 3600 \
    python tools/quant_divergence.py --model stt-1b --steps 750 --batch 4

  # 5. stt-2.6b e2e (hd=64 → flash kernel path, newly live on chip)
  run "$OUT/stt26b_e2e.json" 3600 \
    python -m dsm_tpu.bench_perf --e2e --serving --model stt-2.6b --batch 64

  # 6. flash-decode kernel probe full sweep (s2s + mono64 + headline shapes)
  run "$OUT/flash_probe.json" 2400 \
    python tools/flash_probe.py --steps 50 --batch 8

  # 7. TTS B=64 with int8-native voice CA (fused)
  run "docs/SUSTAINED_TTS_r03_b64_fuse4.json" 3600 \
    env DSM_TTS_CA_INT8=1 DSM_TTS_FUSE=4 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64

  # 8. LM W8A8 on-leg A/B (off leg already measured: 13.73 ms)
  run "$OUT/lm_w8a8_on.json" 5400 \
    env DSM_W8A8=1 python -m dsm_tpu.bench_perf --lm --serving --batch 128

  # 9. remaining divergence models + duplex b24
  run "$OUT/divergence_tts16b.json" 3600 \
    python tools/quant_divergence.py --model tts-1.6b --steps 750 --batch 4
  run "docs/SUSTAINED_DUPLEX_r03_b24_pipe2.json" 3600 \
    env DSM_DUPLEX_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --duplex-sustained 45 --batch 24
  run "$OUT/divergence_s2s2b.json" 3600 \
    python tools/quant_divergence.py --model s2s-2b --steps 750 --batch 2
}

MAX_PASSES="${MAX_PASSES:-4}"
for i in $(seq 1 "$MAX_PASSES"); do
  wait_for_tpu
  log "queue pass $i/$MAX_PASSES"
  pass
  if [ "$MISSING" -eq 0 ]; then
    log "queue complete"
    exit 0
  fi
  log "pass $i finished with $MISSING job(s) missing; re-probing the chip"
  sleep 60
done
log "queue gave up after $MAX_PASSES passes with $MISSING job(s) missing"
