#!/usr/bin/env bash
# Launch wrapper for the dsm-tpu worker (reference: ops/run-moshi-server.sh).
#
# The reference script (a) builds/validates its sentencepiece native dep,
# (b) reports GPU memory + lets the operator free stuck processes, then
# (c) installs and execs `moshi-server worker`.  TPU analogue:
#   (a) no native tokenizer build is needed — the tokenizer is pure python
#       (dsm_tpu/utils/tokenizer.py); we instead build the optional C++
#       mailbox packer if the toolchain is present,
#   (b) report TPU visibility + HBM usage and surface processes holding
#       the accelerator devices,
#   (c) exec `python -m dsm_tpu.cli worker`.
#
# Usage: ops/run-dsm-server.sh [config.toml] [extra worker args...]

set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_ROOT="$(dirname "$SCRIPT_DIR")"
CONFIG="${1:-$REPO_ROOT/configs/config-stt.toml}"
shift || true

cd "$REPO_ROOT"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"

# (a) optional native packer build (server falls back to the python packer
# when the shared object is absent; see server/native.py).
if command -v g++ >/dev/null 2>&1 && [ -f native/packer.cpp ] \
   && [ ! -f native/libdsm_packer.so ]; then
  echo "[INFO] building native mailbox packer"
  make -C native >/dev/null 2>&1 || \
    echo "[WARN] native packer build failed; python fallback will be used"
fi

# (b) accelerator visibility + memory (nvidia-smi analogue).
python - <<'EOF' || true
import json
try:
    import jax
    devs = jax.devices()
    print(f"[INFO] accelerators: {[str(d) for d in devs]}")
    for d in devs:
        stats = d.memory_stats() or {}
        used = stats.get("bytes_in_use", 0) / 1e9
        lim = stats.get("bytes_limit", 0) / 1e9
        if lim:
            print(f"[INFO]   {d}: {used:.2f} / {lim:.2f} GB HBM in use")
except Exception as e:
    print(f"[WARN] accelerator probe failed: {e}")
EOF

# Surface processes holding the TPU device nodes (the operator decides —
# never kill by pattern).
if ls /dev/accel* >/dev/null 2>&1 && command -v fuser >/dev/null 2>&1; then
  holders=$(fuser /dev/accel* 2>/dev/null | tr -s ' ' '\n' | sort -u) || true
  if [ -n "${holders:-}" ]; then
    echo "[WARN] processes holding TPU devices:"
    for pid in $holders; do
      echo "  $pid  $(ps -o user= -p "$pid" 2>/dev/null)  $(ps -o args= -p "$pid" 2>/dev/null | head -c 120)"
    done
    read -r -p "Enter PIDs to terminate (space-separated) or press Enter to continue: " pids
    if [ -n "${pids:-}" ]; then kill $pids || true; fi
  fi
fi

# (c) serve.
echo "[INFO] starting worker with $CONFIG"
exec python -m dsm_tpu.cli worker --config "$CONFIG" "$@"
