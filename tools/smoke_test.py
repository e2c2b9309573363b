#!/usr/bin/env python3
"""Server smoke test (reference: tools/smoke-test): launch the worker with a
config, poll /api/health until ready, optionally POST a request, kill it.

  python tools/smoke_test.py --config configs/config-stt-smoke.toml
  python tools/smoke_test.py --simulate-success       # CI without devices
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time
import urllib.request


def wait_health(port: int, timeout_s: float) -> bool:
    deadline = time.time() + timeout_s
    url = f"http://127.0.0.1:{port}/api/health"
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(url, timeout=2) as r:
                if r.status == 200:
                    return True
        except Exception:
            time.sleep(0.5)
    return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config")
    p.add_argument("--port", type=int, default=8091)
    p.add_argument("--timeout", type=float, default=180.0)
    p.add_argument("--simulate-success", action="store_true")
    args = p.parse_args()

    if args.simulate_success:
        print(json.dumps({"ok": True, "simulated": True}))
        return 0
    if not args.config:
        print("--config required (or --simulate-success)", file=sys.stderr)
        return 2

    proc = subprocess.Popen(
        [sys.executable, "-m", "dsm_tpu.cli", "worker",
         "--config", args.config, "--port", str(args.port)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        ok = wait_health(args.port, args.timeout)
        status = None
        if ok:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{args.port}/api/status", timeout=5
            ) as r:
                status = json.load(r)
        print(json.dumps({"ok": ok, "status": status}))
        return 0 if ok else 1
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    sys.exit(main())
