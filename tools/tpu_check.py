#!/usr/bin/env python3
"""Accelerator capability report (reference: tools/gpu-check).

Reports platform, device kind, HBM, and gates CI with --fail-on-cpu (the
analogue of --fail-on-pre-ampere).
"""

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fail-on-cpu", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The environment's sitecustomize force-registers the TPU backend;
        # an explicit config update is what actually honours the env var.
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    devs = jax.devices()
    d = devs[0]
    stats = {}
    try:
        stats = d.memory_stats() or {}
    except Exception:
        pass
    info = {
        "backend": jax.default_backend(),
        "n_devices": len(devs),
        "device_kind": getattr(d, "device_kind", str(d)),
        "platform": d.platform,
        "hbm_total_gib": round((stats.get("bytes_limit") or 0) / 2**30, 2),
        "hbm_used_gib": round((stats.get("bytes_in_use") or 0) / 2**30, 2),
    }
    if args.json:
        print(json.dumps(info))
    else:
        for k, v in info.items():
            print(f"{k:>14}: {v}")
    if args.fail_on_cpu and jax.default_backend() == "cpu":
        print("FAIL: no accelerator available", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
