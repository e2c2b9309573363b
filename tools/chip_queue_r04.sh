#!/bin/bash
# Round-4 queued chip measurements, in priority order (VERDICT r3 items).
# Same harness contract as tools/chip_queue.sh: waits for the TPU tunnel,
# bounds each job with a timeout, logs to docs/chipq/, skips jobs whose
# artifact already exists, and loops until done or MAX_PASSES.
set -u
cd /root/repo
OUT=docs/chipq
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/queue_r04.log"; }

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
  local tmp="$OUT/$(basename "$art").tmp"
  if [ -s "$art" ]; then return 0; fi
  log "RUN [$to s] -> $art : $*"
  if timeout "$to" "$@" > "$tmp" 2> "$OUT/$(basename "$art").err"; then
    mv "$tmp" "$art"; log "done: $art"
  else
    log "FAILED ($?): $art  (stderr tail:)"
    tail -3 "$OUT/$(basename "$art").err" | tee -a "$OUT/queue_r04.log"
    MISSING=$((MISSING + 1))
  fi
}

pass() {
  MISSING=0

  # 1. VERDICT #1: server-sustained B=128 with fill gating (target:
  #    late_frac < 1%, p99 <= 80 ms in-env).
  run "docs/SUSTAINED_r04.json" 3600 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 128 \
      --events docs/SUSTAINED_r04_events.json

  # 2. VERDICT #2: TTS B=64 rerun now that donation halves the state
  #    footprint (the 3.9 s tick-p99 suspect was allocator pressure).
  run "docs/SUSTAINED_TTS_r04_b64_fuse4.json" 3600 \
    env DSM_TTS_CA_INT8=1 DSM_TTS_FUSE=4 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64

  # 3. VERDICT #3: single-chip batch ceiling probe between 224 and 256.
  run "$OUT/headline_b240.json" 3600 \
    env BENCH_BATCH=240 BENCH_REPS=4 python bench.py

  # 4. VERDICT #3: sustained serving capacity beyond 128 (the honest
  #    engine-loop version of the 672-stream headline).
  run "docs/SUSTAINED_r04_b192.json" 3600 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 192

  # 5. VERDICT #4: stt-2.6b at B=64 (fits single-buffered: ~7.4 GB state
  #    + 2.6 GB weights).
  run "$OUT/stt26b_e2e_b64.json" 3600 \
    python -m dsm_tpu.bench_perf --e2e --serving --model stt-2.6b --batch 64

  # 6. VERDICT #5: duplex B=24 (the r03 attempt died), then B=32.
  run "docs/SUSTAINED_DUPLEX_r04_b24_pipe2.json" 3600 \
    env DSM_DUPLEX_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --duplex-sustained 45 --batch 24
  run "docs/SUSTAINED_DUPLEX_r04_b32_pipe2.json" 3600 \
    env DSM_DUPLEX_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --duplex-sustained 45 --batch 32

  # 7. TTS capacity probe above 64 (state halved by donation).
  run "docs/SUSTAINED_TTS_r04_b96_fuse4.json" 3600 \
    env DSM_TTS_CA_INT8=1 DSM_TTS_FUSE=4 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 96

  # 8. VERDICT #7: flagship-shape serving-profile golden fixture (writes
  #    tests/fixtures/golden_serving_stt1b.npz; the json is the summary).
  run "$OUT/serving_golden.json" 3600 \
    python tools/make_serving_golden.py --steps 40 --batch 4

  # 9. VERDICT #6: per-site W8A8 sensitivity sweep (mixed profile).
  run "$OUT/w8a8_site_sweep.json" 7200 \
    python tools/quant_divergence.py --model stt-1b --steps 300 --batch 4 \
      --w8a8-sweep

  # 10. VERDICT #4: stt-2.6b serving-profile quality bound.
  run "$OUT/divergence_stt26b.json" 3600 \
    env DSM_W8A8=1 \
    python tools/quant_divergence.py --model stt-2.6b --steps 500 --batch 2
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
