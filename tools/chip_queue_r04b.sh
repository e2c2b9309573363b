#!/bin/bash
# Round-4 follow-up measurements (run after chip_queue_r04.sh drains):
# the dispatch-ahead A/B for the sustained STT tail, and anything the
# first queue left missing.  Same harness contract.
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

  # Dispatch-ahead depth 2 leg of the sustained-tail fix (grace-gated
  # depth-1 leg: docs/SUSTAINED_r04.json — util 0.994, p95 81.6, but p99
  # 159.7 from RTT/upload jitter on the ~10 ms budget headroom).
  run "docs/SUSTAINED_r04_pipe2.json" 3600 \
    env DSM_ASR_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 128 \
      --events docs/SUSTAINED_r04_pipe2_events.json

  # + int16 pcm wire: halves the ~1 MB/tick upload at B=128.
  run "docs/SUSTAINED_r04_pipe2_i16.json" 3600 \
    env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 128 \
      --events docs/SUSTAINED_r04_pipe2_i16_events.json

  # TTS B=64 with dispatch-ahead: the depth-1 run's tick is fetch-bound
  # (phase p50 gather/dispatch/fetch/post = 0.1/3.9/230.3/1.6 ms,
  # docs/SUSTAINED_TTS_r04_b64_fuse4.json); depth 2 overlaps the fetch with
  # the next device step.  TTFB (3.02 s p50, the text-audio delay paced by
  # the tick) dominates the per-session rtf at 50-word sessions — pipe2
  # speeds both.
  run "docs/SUSTAINED_TTS_r04_b64_fuse4_pipe2.json" 3600 \
    env DSM_TTS_CA_INT8=1 DSM_TTS_FUSE=4 DSM_TTS_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64

  # fuse 8: halve the per-tick host+RTT amortisation again.
  run "docs/SUSTAINED_TTS_r04_b64_fuse8_pipe2.json" 3600 \
    env DSM_TTS_CA_INT8=1 DSM_TTS_FUSE=8 DSM_TTS_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64

  # B=192 with dispatch-ahead: the depth-1 run (docs/SUSTAINED_r04_b192.json)
  # holds realtime (all 192 slots, markers complete) but the engine cycle
  # is ~100 ms — device 23 ms + RTT 26 ms + host gather/fetch serialized.
  # Depth 2 overlaps fetch+post with the next gather+dispatch.
  run "docs/SUSTAINED_r04_b192_pipe2.json" 3600 \
    env DSM_ASR_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 192

  # stt-2.6b capacity: int8 KV OOMs at B=64 (ring alone ~9.7 GB over 48
  # layers; 17.26 GB program).  The honest int8 midpoint, then the int4-KV
  # legs (VERDICT r3 #4: packed rings halve the KV) toward >=250 streams.
  run "$OUT/stt26b_e2e_b48.json" 3600 \
    python -m dsm_tpu.bench_perf --e2e --serving --model stt-2.6b --batch 48
  run "$OUT/stt26b_e2e_b64_kv4.json" 3600 \
    env DSM_KV_BITS=4 \
    python -m dsm_tpu.bench_perf --e2e --serving --model stt-2.6b --batch 64
  run "$OUT/stt26b_e2e_b96_kv4.json" 3600 \
    env DSM_KV_BITS=4 \
    python -m dsm_tpu.bench_perf --e2e --serving --model stt-2.6b --batch 96

  # Quality bound for the int4 capacity route.
  run "$OUT/divergence_stt26b_kv4.json" 3600 \
    env DSM_W8A8=1 \
    python tools/quant_divergence.py --model stt-2.6b --steps 500 --batch 2 \
      --kv-bits 4

  # Duplex B=32 with int4 rings (int8 OOMs at 12.1 GB of rings).
  run "docs/SUSTAINED_DUPLEX_r04_b32_pipe2_kv4.json" 3600 \
    env DSM_DUPLEX_PIPELINE=2 DSM_KV_BITS=4 \
    python -m dsm_tpu.bench_perf --duplex-sustained 45 --batch 32

  # The three jobs the original r04 queue never parsed (added after launch):
  # flagship serving golden, W8A8 site sweep, 2.6b divergence.
  run "$OUT/serving_golden.json" 3600 \
    python tools/make_serving_golden.py --steps 40 --batch 4
  run "$OUT/w8a8_site_sweep.json" 7200 \
    python tools/quant_divergence.py --model stt-1b --steps 300 --batch 4 \
      --w8a8-sweep
  run "$OUT/divergence_stt26b.json" 3600 \
    env DSM_W8A8=1 \
    python tools/quant_divergence.py --model stt-2.6b --steps 500 --batch 2
}

MAX_PASSES="${MAX_PASSES:-3}"
for i in $(seq 1 "$MAX_PASSES"); do
  wait_for_tpu
  log "queue-b pass $i/$MAX_PASSES"
  pass
  if [ "$MISSING" -eq 0 ]; then
    log "queue-b complete"
    exit 0
  fi
  sleep 60
done
