#!/usr/bin/env bash
# tpu-monitor — live terminal monitor for a dsm-tpu serving host.
#
# TPU-native analogue of ops/gpu-monitor.sh (reference: an nvidia-smi TUI
# with process selection/kill, per-process detail, history graphs): where
# the GPU monitor polls the driver, a TPU host exposes its accelerator
# state through the serving process itself, so this monitor reads the
# server's /api/status JSON + /metrics Prometheus text (HBM gauges, step
# latency histogram, batch utilization, open channels) plus /proc for host
# CPU/RAM and the process table for serving workers.
#
# Usage: tpu-monitor.sh [interval_seconds]
#        tpu-monitor.sh --once          single frame to stdout (no TUI;
#                                       scripts/tests)
#   DSM_SERVER=http://127.0.0.1:8088  target server (default)
#   SHOW_PROCS=1                       python process table
#   NO_COLOR=1                         disable colors
# Keys: q quit, p toggle processes, r force refresh,
#       j/k (or arrows) select process, d detail pane, K kill selected
#       (with confirmation), x clear alerts

set -uo pipefail

ONCE=0
if [[ "${1:-}" == "--once" ]]; then ONCE=1; shift || true; fi
INTERVAL_SECONDS="${1:-2}"
SERVER="${DSM_SERVER:-http://127.0.0.1:8088}"
SHOW_PROCS="${SHOW_PROCS:-1}"
BAR_WIDTH="${BAR_WIDTH:-24}"
SPARK_WIDTH="${SPARK_WIDTH:-40}"

if ! [[ "$INTERVAL_SECONDS" =~ ^[0-9]+$ ]]; then
  echo "Interval must be an integer number of seconds." >&2
  exit 1
fi

COLOR=1
[[ -n "${NO_COLOR:-}" || "${TERM:-}" == "dumb" || ! -t 1 ]] && COLOR=0

c() { # c <code> <text>
  if [[ $COLOR -eq 1 ]]; then printf '\033[%sm%s\033[0m' "$1" "$2"; else printf '%s' "$2"; fi
}

cleanup() {
  if [[ $ONCE -eq 0 ]]; then
    printf '\033[?25h\033[?1049l'
    stty sane 2>/dev/null || true
  fi
  exit 0
}
trap cleanup INT TERM EXIT

make_bar() { # make_bar <pct> <width>
  local pct=$1 width=$2 filled rest color
  (( pct > 100 )) && pct=100
  (( pct < 0 )) && pct=0
  filled=$(( pct * width / 100 ))
  rest=$(( width - filled ))
  if (( pct >= 90 )); then color="31"; elif (( pct >= 70 )); then color="33"; else color="32"; fi
  printf '['
  c "$color" "$(printf '%*s' "$filled" '' | tr ' ' '#')"
  printf '%*s] %3d%%' "$rest" '' "$pct"
}

# History rings for the sparklines (space-separated value strings, newest
# last, trimmed to SPARK_WIDTH) — the reference keeps per-GPU utilization
# history for its graphs; here: step p50 / capacity / host CPU.
HIST_P50=""
HIST_CAP=""
HIST_CPU=""

hist_push() { # hist_push <varname> <value>
  local v="${!1} $2"
  v=$(printf '%s' "$v" | awk -v w="$SPARK_WIDTH" '
    { n = split($0, a, " "); s = ""; start = (n > w ? n - w + 1 : 1)
      for (i = start; i <= n; i++) s = s (s == "" ? "" : " ") a[i]; print s }')
  printf -v "$1" '%s' "$v"
}

sparkline() { # sparkline <values...> -> unicode blocks scaled to max
  python3 -S - "$@" <<'PYEOF' 2>/dev/null
import sys
vals = [float(v) for v in sys.argv[1:] if v not in ("", "nan")]
if not vals:
    sys.exit()
blocks = " ▁▂▃▄▅▆▇█"
hi = max(vals) or 1.0
print("".join(blocks[min(8, int(v / hi * 8 + 0.5))] for v in vals)
      + f"  max {hi:.0f}")
PYEOF
}

fetch() { # fetch <path> -> stdout (empty on failure)
  curl -ks --max-time 2 "$SERVER$1" 2>/dev/null || true
}

json_get() { # json_get <json> <python-expr over d>
  python3 -S - "$2" <<PYEOF 2>/dev/null
import json, sys
try:
    d = json.loads('''$1''')
    v = eval(sys.argv[1], {"d": d})
    print(v if v is not None else "")
except Exception:
    print("")
PYEOF
}

metric() { # metric <metrics-text-file> <name> -> last value
  awk -v n="$2" '$1 == n { v=$2 } END { if (v != "") print v }' "$1" 2>/dev/null
}

metric_sum() { # metric_sum <file> <prefix> -> sum of matching series
  awk -v n="$2" 'index($1, n) == 1 { s += $2 } END { printf "%.0f", s }' "$1" 2>/dev/null
}

hist_pcts() { # hist_pcts <file> <histogram-name> -> "p50 p95 p99" (ms)
  python3 -S - "$1" "$2" <<'PYEOF' 2>/dev/null
import sys, re
path, name = sys.argv[1], sys.argv[2]
buckets = []
count = 0
try:
    for line in open(path):
        m = re.match(rf'{re.escape(name)}_bucket{{.*le="([^"]+)"}} (\S+)', line)
        if m:
            le = float('inf') if m.group(1) == '+Inf' else float(m.group(1))
            buckets.append((le, float(m.group(2))))
        m = re.match(rf'{re.escape(name)}_count(?:{{[^}}]*}})? (\S+)', line)
        if m:
            count = float(m.group(1))
except OSError:
    sys.exit()
if not buckets or count == 0:
    sys.exit()
buckets.sort()
out = []
for q in (0.5, 0.95, 0.99):
    target = q * count
    val = buckets[-1][0]
    for le, c_ in buckets:
        if c_ >= target:
            val = le
            break
    out.append('inf' if val == float('inf') else f'{val*1000:.0f}')
print(' '.join(out))
PYEOF
}

# Sets HOST_CPU_PCT / HOST_MEM_USED / HOST_MEM_TOTAL globals.  Must NOT run
# in a command substitution: the CPU gauge needs PREV_CPU to persist across
# renders, and a subshell would drop it (gauge would read 0% forever).
host_stats() {
  local cpu mem
  cpu=$(awk -v prev="${PREV_CPU:-}" '
    /^cpu / {
      idle=$5; total=0; for(i=2;i<=NF;i++) total+=$i
      if (prev != "") {
        split(prev, p, ",")
        dt = total - p[1]; di = idle - p[2]
        if (dt > 0) printf "%.0f %d,%d", (1 - di/dt) * 100, total, idle
        else printf "0 %d,%d", total, idle
      } else printf "0 %d,%d", total, idle
      exit
    }' /proc/stat)
  PREV_CPU="${cpu#* }"
  mem=$(awk '/MemTotal/{t=$2}/MemAvailable/{a=$2} END{printf "%d %d", (t-a)/1024, t/1024}' /proc/meminfo)
  HOST_CPU_PCT="${cpu%% *}"
  HOST_MEM_USED="${mem%% *}"
  HOST_MEM_TOTAL="${mem##* }"
}

# -- process table with selection / detail / kill (gpu-monitor.sh
#    load_process_entries / render_selected_process_detail / prompt_kill) --
PROC_PIDS=()
PROC_LINES=()
SEL=0
DETAIL=0
ALERTS=""
PREV_ERRS=""

load_procs() {
  PROC_PIDS=()
  PROC_LINES=()
  local line pid
  while IFS= read -r line; do
    pid="${line%% *}"
    PROC_PIDS+=("$pid")
    PROC_LINES+=("$line")
  done < <(ps -eo pid,pcpu,rss,args --sort=-rss 2>/dev/null \
    | awk '/dsm_tpu|moshi|bench/ && !/awk|tpu-monitor/ {printf "%s %s %d %.80s\n", $1, $2, $3/1024, substr($0, index($0,$4))}' \
    | head -n 8)
  (( SEL >= ${#PROC_PIDS[@]} )) && SEL=$(( ${#PROC_PIDS[@]} > 0 ? ${#PROC_PIDS[@]} - 1 : 0 ))
}

render_procs() {
  printf '\n'; c "1;35" "SERVING PROCESSES"; printf ' (j/k select, d detail, K kill)\n'
  printf '  %-8s %-6s %-9s %s\n' PID 'CPU%' RSS_MB CMD
  local i line marker
  for i in "${!PROC_LINES[@]}"; do
    line="${PROC_LINES[$i]}"
    marker='  '
    if (( i == SEL )); then marker='> '; fi
    if (( i == SEL )) && [[ $COLOR -eq 1 ]]; then
      printf '\033[7m%s%s\033[0m\n' "$marker" "$line"
    else
      printf '%s%s\n' "$marker" "$line"
    fi
  done
  [[ ${#PROC_LINES[@]} -eq 0 ]] && printf '  (no serving processes)\n'
  if (( DETAIL == 1 )) && [[ ${#PROC_PIDS[@]} -gt 0 ]]; then
    local pid="${PROC_PIDS[$SEL]}"
    printf '\n'; c "1;35" "DETAIL pid $pid"; printf '\n'
    if [[ -r "/proc/$pid/status" ]]; then
      awk '/^(State|Threads|VmRSS|VmHWM|voluntary_ctxt)/ {printf "  %-24s %s %s\n", $1, $2, ($3 ? $3 : "")}' \
        "/proc/$pid/status"
      printf '  %-24s %s\n' "open_fds:" "$(ls "/proc/$pid/fd" 2>/dev/null | wc -l)"
      printf '  %-24s %.120s\n' "cmdline:" "$(tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null)"
    else
      printf '  (gone)\n'
    fi
  fi
}

prompt_kill() {
  [[ ${#PROC_PIDS[@]} -eq 0 ]] && return
  local pid="${PROC_PIDS[$SEL]}"
  printf '\n'
  c "1;31" "kill pid $pid? [y/N] "
  stty sane 2>/dev/null || true
  local ans
  read -r -n 1 ans || true
  stty -echo -icanon time 0 min 0 2>/dev/null || true
  if [[ "$ans" == "y" || "$ans" == "Y" ]]; then
    kill "$pid" 2>/dev/null && ALERTS="${ALERTS}sent SIGTERM to $pid; "
  fi
}

check_alerts() { # check_alerts <pcts "p50 p95 p99"> <errs> <used> <batch>
  local pcts="$1" errs="$2" used="$3" batch="$4" p99
  p99="${pcts##* }"
  if [[ -n "$p99" && "$p99" != "inf" && "$p99" -gt 80 ]] 2>/dev/null; then
    ALERTS="${ALERTS}step p99 ${p99}ms > 80ms budget; "
  fi
  if [[ -n "$PREV_ERRS" && -n "$errs" ]] && (( errs > PREV_ERRS )); then
    ALERTS="${ALERTS}connection errors +$(( errs - PREV_ERRS )); "
  fi
  PREV_ERRS="$errs"
  if [[ -n "$batch" && "$batch" != "0" && -n "$used" ]] && (( used >= batch )); then
    ALERTS="${ALERTS}at capacity ($used/$batch); "
  fi
  # keep the alert line bounded
  ALERTS=$(printf '%s' "$ALERTS" | tail -c 200)
}

render() {
  local mfile status rows cols line
  rows=$(tput lines 2>/dev/null || echo 40)
  cols=$(tput cols 2>/dev/null || echo 100)
  mfile=$(mktemp)
  fetch /metrics > "$mfile"
  status=$(fetch /api/status)

  [[ $ONCE -eq 0 ]] && printf '\033[H\033[2J'
  # -- header --
  line="dsm-tpu monitor — $SERVER — $(date '+%H:%M:%S') — ${INTERVAL_SECONDS}s"
  c "1;36" "$line"; printf '\n'
  printf '%s\n' "$(printf '%*s' "$cols" '' | tr ' ' '-')"

  # -- server status --
  local uptime batch used modules
  batch=""; used=""
  if [[ -n "$status" ]]; then
    uptime=$(json_get "$status" "int(d.get('uptime_s', d.get('uptime_secs', 0)))")
    modules=$(json_get "$status" "', '.join(m.get('path', m.get('name', m.get('type','?'))) for m in d.get('modules', []))")
    batch=$(json_get "$status" "sum(m.get('total_slots', m.get('batch_size', 0)) for m in d.get('modules', []))")
    used=$(json_get "$status" "sum(m.get('used_slots', 0) for m in d.get('modules', []))")
    printf '%-10s up %ss   modules: %s\n' "$(c '1;32' 'SERVER ok')" "${uptime:-?}" "${modules:-none}"
    if [[ -n "$batch" && "$batch" != "0" ]]; then
      local pct=$(( ${used:-0} * 100 / batch ))
      printf '%-10s %s/%s slots ' 'capacity' "${used:-0}" "$batch"
      make_bar "$pct" "$BAR_WIDTH"; printf '\n'
      hist_push HIST_CAP "${used:-0}"
    fi
  else
    printf '%s — is the server running at %s?\n' "$(c '1;31' 'SERVER DOWN')" "$SERVER"
  fi

  # -- accelerator (HBM gauges exported by the server) --
  local hbm_used hbm_total util
  hbm_used=$(metric "$mfile" moshi_system_vram_used_mb)
  hbm_total=$(metric "$mfile" moshi_system_vram_total_mb)
  util=$(metric "$mfile" moshi_lm_batch_utilization)
  printf '\n'; c "1;35" "ACCELERATOR"; printf '\n'
  if [[ -n "$hbm_used" && -n "$hbm_total" && "${hbm_total%.*}" -gt 0 ]]; then
    local pct=$(( ${hbm_used%.*} * 100 / ${hbm_total%.*} ))
    printf '  HBM %6s / %6s MB ' "${hbm_used%.*}" "${hbm_total%.*}"
    make_bar "$pct" "$BAR_WIDTH"; printf '\n'
  else
    printf '  HBM: n/a (server exports moshi_system_vram_* when a chip is attached)\n'
  fi
  if [[ -n "$util" ]]; then
    printf '  batch utilization      '
    make_bar "$(python3 -S -c "print(int(float('$util')*100))" 2>/dev/null || echo 0)" "$BAR_WIDTH"
    printf '\n'
  fi

  # -- latency histograms --
  printf '\n'; c "1;35" "LATENCY (ms: p50/p95/p99 from histogram buckets)"; printf '\n'
  local name label pcts asr_pcts=""
  for name in moshi_asr_model_step_duration_seconds moshi_lm_step_duration_seconds \
              moshi_mimi_encode_duration_seconds moshi_mimi_decode_duration_seconds; do
    label=${name#moshi_}; label=${label%_duration_seconds}
    pcts=$(hist_pcts "$mfile" "$name")
    [[ "$name" == moshi_asr_model_step_duration_seconds ]] && asr_pcts="$pcts"
    [[ -n "$pcts" ]] && printf '  %-22s %s\n' "$label" "$pcts"
  done
  local conns steps errs
  conns=$(metric_sum "$mfile" moshi_asr_open_channels)
  steps=$(metric_sum "$mfile" moshi_asr_model_step_duration_seconds_count)
  errs=$(metric_sum "$mfile" moshi_connection_errors)
  printf '  open channels %s   engine steps %s   errors %s\n' \
    "${conns:-0}" "${steps:-0}" "${errs:-0}"
  [[ -n "$asr_pcts" ]] && hist_push HIST_P50 "${asr_pcts%% *}"
  check_alerts "$asr_pcts" "${errs:-0}" "${used:-0}" "${batch:-0}"

  # -- trends (history sparklines; gpu-monitor's utilization graphs) --
  local spark
  printf '\n'; c "1;35" "TRENDS"; printf '\n'
  spark=$(sparkline $HIST_P50); [[ -n "$spark" ]] && printf '  step p50 ms  %s\n' "$spark"
  spark=$(sparkline $HIST_CAP); [[ -n "$spark" ]] && printf '  slots used   %s\n' "$spark"
  spark=$(sparkline $HIST_CPU); [[ -n "$spark" ]] && printf '  host cpu %%   %s\n' "$spark"

  # -- host --
  printf '\n'; c "1;35" "HOST"; printf '\n'
  host_stats
  hist_push HIST_CPU "${HOST_CPU_PCT:-0}"
  printf '  CPU  '; make_bar "${HOST_CPU_PCT:-0}" "$BAR_WIDTH"; printf '\n'
  if [[ -n "$HOST_MEM_TOTAL" && "$HOST_MEM_TOTAL" -gt 0 ]]; then
    printf '  RAM  '; make_bar "$(( HOST_MEM_USED * 100 / HOST_MEM_TOTAL ))" "$BAR_WIDTH"
    printf '  %d / %d MB\n' "$HOST_MEM_USED" "$HOST_MEM_TOTAL"
  fi

  # -- processes --
  if [[ "$SHOW_PROCS" == "1" ]]; then
    load_procs
    render_procs
  fi

  # -- alerts --
  if [[ -n "$ALERTS" ]]; then
    printf '\n'; c "1;31" "ALERTS: $ALERTS"; printf '  (x clears)\n'
  fi

  printf '\n%s\n' "$(c '2' 'q quit  p procs  j/k select  d detail  K kill  x clear alerts  r refresh')"
  rm -f "$mfile"
}

if [[ $ONCE -eq 1 ]]; then
  COLOR=0
  render
  exit 0
fi

printf '\033[?1049h\033[?25l'
stty -echo -icanon time 0 min 0 2>/dev/null || true

while true; do
  render
  # keypress poll during the sleep interval
  for _ in $(seq $(( INTERVAL_SECONDS * 10 ))); do
    key=$(dd bs=1 count=1 2>/dev/null || true)
    case "$key" in
      q) cleanup ;;
      p) if [[ "$SHOW_PROCS" == "1" ]]; then SHOW_PROCS=0; else SHOW_PROCS=1; fi; break ;;
      j|B) SEL=$(( SEL + 1 )); break ;;
      k|A) (( SEL > 0 )) && SEL=$(( SEL - 1 )); break ;;
      d) DETAIL=$(( 1 - DETAIL )); break ;;
      K) prompt_kill; break ;;
      x) ALERTS=""; break ;;
      r) break ;;
    esac
    sleep 0.1
  done
done
