#!/usr/bin/env bash
# Deploy the Caddyfile + systemd override for the reverse proxy fronting
# dsm-tpu (reference: ops/deploy-caddy.sh — same flow: copy config,
# install the auto-restart override, validate, graceful reload, verify).
# Usage: sudo ops/deploy-caddy.sh

set -euo pipefail

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

log_info()  { echo -e "\033[0;32m[INFO]\033[0m $1"; }
log_error() { echo -e "\033[0;31m[ERROR]\033[0m $1"; }

if [[ $EUID -ne 0 ]]; then
  log_error "This script must be run as root (use sudo)"
  exit 1
fi
if ! command -v caddy &>/dev/null; then
  log_error "Caddy is not installed. Install with: sudo apt install caddy"
  exit 1
fi

log_info "Validating Caddyfile syntax (before touching the live config)"
caddy validate --config "$SCRIPT_DIR/Caddyfile" --adapter caddyfile

log_info "Copying Caddyfile to /etc/caddy/Caddyfile"
install -o root -g root -m 644 "$SCRIPT_DIR/Caddyfile" /etc/caddy/Caddyfile

log_info "Installing systemd auto-restart override"
mkdir -p /etc/systemd/system/caddy.service.d
install -o root -g root -m 644 \
  "$SCRIPT_DIR/systemd/caddy.service.d/override.conf" \
  /etc/systemd/system/caddy.service.d/override.conf
systemctl daemon-reload

log_info "Reloading Caddy (graceful)"
systemctl reload caddy || systemctl restart caddy

if systemctl is-active --quiet caddy; then
  log_info "Caddy is running"
else
  log_error "Caddy failed to start!"
  systemctl status caddy --no-pager
  exit 1
fi
systemctl show caddy --property=Restart,RestartSec,WatchdogSec
log_info "Deployment complete"
