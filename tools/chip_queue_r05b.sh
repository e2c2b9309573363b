#!/bin/bash
# Round-5 measurement queue, part b (VERDICT r4 items 1/2/3/4/5/6).
# Supersedes chip_queue_r05.sh (same artifacts, skip-if-exists) and adds
# the RTT-probe legs + tail-correlation analyses (#6) and probe variants
# for the SLO sweep (#1).  Run EXCLUSIVELY: no concurrent CPU-heavy work
# (r3/r4 pollution lesson).
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
# Pure-CPU post-processing (no chip): failures do not count as MISSING
# retries beyond pass bookkeeping, but log them.
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

  # -- VERDICT #2: LM-step phase attribution before optimising --
  run "$OUT/lm_profile_b128.json" 5400 \
    python tools/lm_profile.py --batch 128 --steps 20

  # -- VERDICT #2: fused commit+attend kernel — chip equivalence gate
  #    (small batch, fast compile), then the B=128 timing A/B --
  run "$OUT/fused_probe_b8.json" 3600 \
    python tools/fused_probe.py --batch 8 --steps 12
  if [ -s "$OUT/fused_probe_b8.json" ]; then
    run "$OUT/lm_fused_b128.json" 3600 \
      env DSM_FUSED_ATTN=1 \
      python -m dsm_tpu.bench_perf --lm --batch 128
    run "$OUT/lm_split_b128.json" 3600 \
      python -m dsm_tpu.bench_perf --lm --batch 128
  fi
  # Head-major fused body (stt-2.6b h=32/Dh=64): equivalence + whether the
  # ring reshape around the aliased custom call stays a bitcast (timing).
  run "$OUT/fused_probe_26b_b8.json" 3600 \
    python tools/fused_probe.py --model stt-2.6b --batch 8 --steps 12

  # -- VERDICT #1/#6: served SLO sweep, pipe2+i16 profile, with the
  #    per-step host-phase split in the events files --
  run "docs/SUSTAINED_r05_b160_pipe2_i16.json" 3600 \
    env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 160 \
      --events docs/SUSTAINED_r05_b160_pipe2_i16_events.json
  run "docs/SUSTAINED_r05_b192_pipe2_i16.json" 3600 \
    env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 192 \
      --events docs/SUSTAINED_r05_b192_pipe2_i16_events.json
  run "docs/SUSTAINED_r05_b224_pipe2_i16.json" 3600 \
    env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 \
    python -m dsm_tpu.bench_perf --server-sustained 45 --batch 224 \
      --events docs/SUSTAINED_r05_b224_pipe2_i16_events.json

  # -- VERDICT #6: probe legs — same profile + concurrent 5 Hz RTT probe,
  #    then the late-step/tunnel-stall correlation (compile-cached after
  #    the plain legs, so each is ~3 min) --
  for B in 128 192 224; do
    run "docs/SUSTAINED_r05_b${B}_probe.json" 3600 \
      env DSM_ASR_PIPELINE=2 DSM_PCM_INT16=1 DSM_RTT_PROBE_HZ=5 \
      python -m dsm_tpu.bench_perf --server-sustained 45 --batch "$B" \
        --events "docs/SUSTAINED_r05_b${B}_probe_events.json"
    if [ -s "docs/SUSTAINED_r05_b${B}_probe.json" ]; then
      post "$OUT/tail_correlation_b${B}.json" \
        python3 -S tools/tail_correlation.py \
          "docs/SUSTAINED_r05_b${B}_probe.json" \
          "docs/SUSTAINED_r05_b${B}_probe_events.json"
    fi
  done

  # -- VERDICT #4: TTS B=64 tick-p99 stall attribution (+ the i16 leg,
  #    now cache-stable: the wire toggle is a separate tiny jit) --
  run "docs/SUSTAINED_TTS_r05_b64_fuse4_pipe2.json" 4800 \
    env DSM_TTS_FUSE=4 DSM_TTS_PIPELINE=2 DSM_TTS_CA_INT8=1 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64 \
      --events docs/SUSTAINED_TTS_r05_b64_fuse4_pipe2_events.json
  run "docs/SUSTAINED_TTS_r05_b64_i16.json" 3600 \
    env DSM_TTS_FUSE=4 DSM_TTS_PIPELINE=2 DSM_TTS_CA_INT8=1 DSM_TTS_PCM_I16=1 \
    python -m dsm_tpu.bench_perf --tts-sustained 45 --batch 64 \
      --events docs/SUSTAINED_TTS_r05_b64_i16_events.json

  # -- VERDICT #5: duplex B=24 tail attribution --
  run "docs/SUSTAINED_DUPLEX_r05_b24_pipe2.json" 4800 \
    env DSM_DUPLEX_PIPELINE=2 \
    python -m dsm_tpu.bench_perf --duplex-sustained 45 --batch 24 \
      --events docs/SUSTAINED_DUPLEX_r05_b24_pipe2_events.json

  # -- VERDICT #3: duplex quant quality — audio-ranked per-site W8A8
  #    sweep (teacher-forced) + the stt-2.6b w8a8-off default decision --
  run "$OUT/w8a8_sweep_s2s2b.json" 7200 \
    python tools/quant_divergence.py --model s2s-2b --w8a8-sweep \
      --steps 400 --batch 4
  run "$OUT/divergence_stt26b_w8a8off.json" 5400 \
    env DSM_W8A8=0 \
    python tools/quant_divergence.py --model stt-2.6b --steps 400 --batch 4
}
for i in 1 2 3; do
  wait_for_tpu
  log "queue-r05b pass $i/3"
  pass
  [ "$MISSING" -eq 0 ] && { log "queue-r05b complete"; exit 0; }
  sleep 60
done
log "queue-r05b finished with $MISSING missing"
