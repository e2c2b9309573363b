"""Generate the flagship-shape SERVING-PROFILE golden fixture (VERDICT r3
#7).

Runs the stt-1b serving step — int8 KV rings + weight-only int8 LM with
W8A8 dots + both Pallas kernels — on the TPU backend with deterministic
weights (PRNGKey(0), bf16) and a seeded pcm stream, and records the text
tokens + VAD probs of a short stream to
tests/fixtures/golden_serving_stt1b.npz.

tests/test_golden_serving.py replays the identical computation and compares
bit-exact, so quant-path and kernel regressions at FLAGSHIP shapes are
caught by a chip test instead of only by full re-benching (the small-shape
goldens in tests/test_golden.py cannot see kernels that gate on production
head counts / ring sizes).

Usage (on the chip):
  python tools/make_serving_golden.py [--steps 40] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden_serving_stt1b.npz",
)


def run_stream(steps: int, batch: int):
    """The exact computation the golden pins (shared with the test)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from dsm_tpu.ops import ring_kernels as rk
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import asr as ASR

    # Pin the W8A8 profile for THIS trace only — leaking the env var into
    # the rest of a pytest process would flip later traces' quant paths
    # (w8a8_enabled reads it at trace time).
    saved_w8a8 = os.environ.get("DSM_W8A8")
    os.environ["DSM_W8A8"] = "1"
    cfg, _, (params, state, _pcm, mask, reset, _rng) = ge._asr_setup(
        batch, jnp.bfloat16, jnp.bfloat16, kv_quant=True,
        mimi_dtype="bfloat16",
    )
    params = dict(params)
    params["lm"] = T.quantize_weights(params["lm"])

    def _step(params, state, pcm, mask, reset, k):
        with rk.kernels_forced(True):
            return ASR.step(cfg, params, state, pcm, mask, reset, k)

    try:
        fn = jax.jit(_step, donate_argnums=(1,))
        rng = np.random.default_rng(7)
        k0 = jax.random.PRNGKey(123)
        toks, prs = [], []
        for _ in range(steps):
            pcm = (rng.standard_normal((batch, 1, cfg.mimi.frame_size)) * 0.1
                   ).astype(np.float32)
            out, state = fn(params, state, pcm, mask, reset, k0)
            toks.append(np.asarray(out["text_token"]))
            if out["prs"].shape[-1]:
                prs.append(np.asarray(out["prs"], np.float32))
        return np.stack(toks), (np.stack(prs) if prs else np.zeros((0,)))
    finally:
        if saved_w8a8 is None:
            os.environ.pop("DSM_W8A8", None)
        else:
            os.environ["DSM_W8A8"] = saved_w8a8


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args(argv)

    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print("refusing to generate the TPU golden on CPU", file=sys.stderr)
        return 1

    from dsm_tpu.utils.compile_cache import enable_if_tpu

    enable_if_tpu()
    toks, prs = run_stream(args.steps, args.batch)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez(
        FIXTURE,
        text_tokens=toks,
        prs=prs,
        steps=args.steps,
        batch=args.batch,
        backend=backend,
    )
    print(json.dumps({
        "fixture": os.path.relpath(FIXTURE),
        "steps": args.steps,
        "batch": args.batch,
        "backend": backend,
        "token_sample": toks[:4].tolist(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
