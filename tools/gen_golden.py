"""Generate the golden token-sequence fixtures (tests/fixtures/*.json).

Deterministic small-shape runs of the ASR and TTS streaming stacks at fixed
seeds on the CPU backend.  The committed fixtures pin the end-to-end
numerical behaviour (delays, ring caches, sampling, word logic); regenerate
ONLY when a numerical change is intentional:

    python tools/gen_golden.py --write
"""

from __future__ import annotations

import argparse
import json
import os

import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

FIXTURES = os.path.join(_ROOT, "tests", "fixtures")


def _force_cpu():
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def run_asr_golden() -> dict:
    """20 deterministic ASR steps on synthetic audio (greedy text path)."""
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from dsm_tpu.sessions import asr as ASR

    cfg, fn, (params, state, _pcm, mask, reset, rng) = ge._asr_setup(
        batch=2, lm_dtype=jnp.float32, cache_dtype=jnp.float32, small=True
    )
    pcm = jnp.asarray(
        np.sin(
            np.arange(2 * cfg.mimi.frame_size, dtype=np.float32).reshape(
                2, 1, -1
            )
            * 0.01
        )
        * 0.3
    )
    step = jax.jit(fn, donate_argnums=(1,))
    text, codes_head, prs_tail = [], [], None
    rng = jax.random.PRNGKey(7)
    for i in range(20):
        out, state = step(params, state, pcm, mask, reset, rng)
        text.append([int(t) for t in np.asarray(out["text_token"])])
        codes_head.append([int(c) for c in np.asarray(out["codes"])[:, 0]])
        prs_tail = [float(x) for x in np.asarray(out["prs"]).reshape(-1)]
    return {"text_tokens": text, "codes_head": codes_head, "prs_tail": prs_tail}


def run_tts_golden() -> dict:
    """24 deterministic TTS steps with per-slot seeds + CFG doubled rows."""
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsm_tpu.models import lm as LM
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import tts as TTS

    from tests.test_tts import small_tts_cfg

    cfg = small_tts_cfg(max_steps=96)
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    half = 2
    rows = 2 * half
    state = TTS.init_state(cfg, rows, jnp.float32)
    ca_tokens = jax.random.normal(jax.random.PRNGKey(2), (rows, 6, 16))
    ca_kv = T.precompute_ca_kv(
        cfg.lm.transformer, params["lm"]["transformer"], ca_tokens
    )
    seeds = jnp.asarray([11, 12, 11, 12], jnp.uint32)
    alpha = jnp.asarray([1.0, 2.5], jnp.float32)
    modes = jnp.full((rows,), TTS.ALLOW_PAD_OR_EPAD, jnp.int32)
    toks = jnp.zeros((rows,), jnp.int32)
    rng = jax.random.PRNGKey(3)

    @jax.jit
    def step(params, state, rng):
        return TTS.step(
            cfg, params, state, modes, toks, rng, ca_kv=ca_kv,
            seeds=seeds, cfg_alpha=alpha,
        )

    text, frames = [], []
    for _ in range(24):
        out, state = step(params, state, rng)
        text.append([int(t) for t in np.asarray(out["text_token"])])
        fv = np.asarray(out["frame_valid"])
        fr = np.asarray(out["frame"])
        frames.append(
            [[int(x) for x in fr[b]] if fv[b] else None for b in range(rows)]
        )
    return {"text_tokens": text, "audio_frames": frames}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--write", action="store_true")
    args = p.parse_args()
    os.makedirs(FIXTURES, exist_ok=True)
    for name, fn in [
        ("golden_asr_small.json", run_asr_golden),
        ("golden_tts_small.json", run_tts_golden),
    ]:
        data = fn()
        path = os.path.join(FIXTURES, name)
        if args.write:
            with open(path, "w") as f:
                json.dump(data, f)
            print(f"wrote {path}")
        else:
            print(f"{name}: {str(data)[:200]}...")


if __name__ == "__main__":
    main()
