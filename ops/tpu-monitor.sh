#!/usr/bin/env bash
# Live serving monitor (reference: ops/gpu-monitor.sh nvidia-smi TUI).
# Polls /api/status, /metrics and device memory; renders a compact dashboard.
set -euo pipefail

HOST="${DSM_HOST:-127.0.0.1:8080}"
INTERVAL="${INTERVAL:-2}"

while true; do
  clear
  echo "dsm-tpu monitor — $HOST — $(date '+%H:%M:%S')"
  echo "────────────────────────────────────────────"
  status=$(curl -sf "http://$HOST/api/status" || echo '{}')
  python3 - "$status" <<'EOF'
import json, sys
s = json.loads(sys.argv[1] or "{}")
cap = s.get("capacity", {})
print(f" instance : {s.get('instance_name','-')}")
print(f" uptime   : {s.get('uptime_s','-')} s")
used, total = cap.get("used", 0), cap.get("total", 0)
bar = "#" * used + "." * max(total - used, 0)
print(f" slots    : [{bar}] {used}/{total}")
EOF
  echo "────────────────────────────────────────────"
  curl -sf "http://$HOST/metrics" | grep -E \
    "^(asr_open_channels|lm_batch_utilization|device_memory|tts_rtf)" \
    | sed 's/^/ /' || echo " (metrics unavailable)"
  sleep "$INTERVAL"
done
