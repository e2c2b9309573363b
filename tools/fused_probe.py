"""On-chip validation + timing of the fused commit+attend decode kernel.

The fused path (DSM_FUSED_ATTN=1; ops/decode_attn.decode_attend_commit)
must (a) lower on the real TPU backend — it is the first kernel here
using a dynamic sublane slice (`pl.ds`) inside the body and a scalar-
prefetch-driven out-spec index map on an aliased output — and (b) produce
the same tokens and bit-exact rings as the split
quantize -> scale_commit/ring_commit -> decode_attend pipeline it
replaces.  Interpret-mode equivalence is covered by
tests/test_decode_attn.py; this probe is the chip-side gate before the
flag defaults on (VERDICT r4 #2; reference hot loop analogue
moshi-core/src/batched_transformer.rs:64-121).

Usage:
  python tools/fused_probe.py [--batch 8] [--steps 12] [--time-steps 20]
Prints one JSON line: equivalence + per-step ms for both modes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--time-steps", type=int, default=20)
    ap.add_argument("--model", default="stt-1b",
                    choices=["stt-1b", "stt-2.6b"],
                    help="stt-2.6b exercises the head-major fused body "
                         "(h=32 / Dh=64)")
    ap.add_argument("--small", action="store_true",
                    help="tiny fused-shape config (CPU smoke of the "
                         "probe harness; kernels run in interpret mode)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import lm as LM
    from dsm_tpu.ops import transformer as TT

    if args.small:
        os.environ.setdefault("DSM_RING_KERNEL", "1")
        os.environ.setdefault("DSM_DECODE_ATTN", "1")
        cfg = LM.LmConfig(
            transformer=TT.TransformerConfig(
                d_model=1024, num_heads=8, num_layers=2,
                dim_feedforward=512, context=250,
                positional_embedding="rope",
            ),
            depformer=None,
            text_in_vocab_size=33, text_out_vocab_size=32,
            audio_vocab_size=17, audio_codebooks=2,
        )
    elif args.model == "stt-2.6b":
        cfg = LM.stt_2_6b_en()
    else:
        cfg = LM.stt_1b_en_fr()
    params = TT.quantize_weights(
        LM.init(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    B = args.batch
    # Varying per-step tokens so ring content and attention actually move.
    rng = np.random.default_rng(0)
    texts = rng.integers(0, cfg.text_in_vocab_size, (args.steps, B))
    audios = rng.integers(
        0, cfg.audio_vocab_size - 1, (args.steps, B, cfg.audio_codebooks)
    )

    out = {"batch": B, "model": args.model,
           "platform": jax.devices()[0].platform}

    def run(fused: bool):
        os.environ["DSM_FUSED_ATTN"] = "1" if fused else "0"

        # Distinct traced callables per mode: the env gate is read at
        # trace time, so each mode needs its own jit cache entry.
        def stepper(p, st, text, audio):
            logits, _h, st = LM.step(cfg, p, st, text, audio)
            return logits, st

        fn = jax.jit(stepper, donate_argnums=(1,))
        st = LM.init_state(cfg, B, jnp.bfloat16, kv_quant=True)
        toks, last_logits = [], None
        for i in range(args.steps):
            logits, st = fn(
                params, st,
                jnp.asarray(texts[i], jnp.int32),
                jnp.asarray(audios[i], jnp.int32),
            )
            last_logits = np.asarray(logits, np.float32)
            toks.append(last_logits.argmax(-1))
        rings = jax.tree_util.tree_map(np.asarray, st["t"]["layers"])
        return np.stack(toks), last_logits, rings

    toks_split, logits_split, rings_split = run(False)
    toks_fused, logits_fused, rings_fused = run(True)

    out["tokens_equal"] = bool((toks_split == toks_fused).all())
    out["logits_max_abs_diff"] = float(
        np.max(np.abs(logits_split - logits_fused))
    )
    ring_exact = True
    for a, b in zip(rings_split, rings_fused):
        for key in ("k", "v", "ks", "vs"):
            if not np.array_equal(a[key], b[key]):
                ring_exact = False
    out["rings_bit_exact"] = ring_exact

    # Timing: scanned multi-step program per mode (tunnel RTT amortised).
    def timed(fused: bool):
        os.environ["DSM_FUSED_ATTN"] = "1" if fused else "0"
        text = jnp.zeros((B,), jnp.int32)
        audio = jnp.zeros((B, cfg.audio_codebooks), jnp.int32)

        def multi(p, st):
            def body(st, _):
                logits, _h, st = LM.step(cfg, p, st, text, audio)
                return st, logits.argmax(-1)

            st, t = jax.lax.scan(body, st, None, length=args.time_steps)
            return t, st

        fn = jax.jit(multi, donate_argnums=(1,))
        st = LM.init_state(cfg, B, jnp.bfloat16, kv_quant=True)
        t, st = fn(params, st)
        np.asarray(t)
        t0 = time.perf_counter()
        t, st = fn(params, st)
        np.asarray(t)
        return (time.perf_counter() - t0) / args.time_steps * 1e3

    out["split_ms"] = round(timed(False), 3)
    out["fused_ms"] = round(timed(True), 3)
    print(json.dumps(out))
    ok = out["tokens_equal"] and out["rings_bit_exact"]
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
