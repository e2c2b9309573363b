"""Long-stream token-divergence study of the serving profile.

Measures, at real model shapes with random weights, how far the serving
profile (int8 KV rings + weight-only int8 LM + Pallas kernels, optionally
W8A8 activations) diverges from the bf16 all-XLA path over a long stream —
the quality bound that backs every headline number in docs/PERFORMANCE.md.

Both profiles consume the SAME pcm stream; greedy (temperature 0) text
decode makes the comparison deterministic.  Reported: per-step text-token
match fraction, first-divergence step, VAD-prob max abs diff.

Usage:
  python tools/quant_divergence.py --model stt-1b --steps 750 --batch 4
  python tools/quant_divergence.py --model tts-1.6b --steps 750 --batch 2
  DSM_W8A8=1 python tools/quant_divergence.py ...   # include W8A8 dots

Committed CI-speed bound: tests/test_quant_quality.py (mid shapes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DSM_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["DSM_PLATFORM"])


def run_asr(lm_cfg, steps: int, batch: int, seed: int = 0,
            kernels: bool = True, kv_bits: int = 8) -> dict:
    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import lm as LM
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.ops import ring_kernels as rk
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import asr as ASR

    mimi_cfg = MIMI.v0_1(lm_cfg.audio_codebooks)
    key = jax.random.PRNGKey(seed)
    lm_bf16 = LM.init(lm_cfg, key, dtype=jnp.bfloat16)
    mimi_params = MIMI.init(mimi_cfg, jax.random.fold_in(key, 1))
    rng = np.random.default_rng(seed)

    def make(profile: str):
        quant = profile == "serving"
        cfg = ASR.AsrConfig(lm=lm_cfg, mimi=mimi_cfg, kv_quant=quant,
                            kv_bits=kv_bits if quant else 8)
        params = {
            "mimi": mimi_params,
            "lm": T.quantize_weights(lm_bf16) if quant else lm_bf16,
        }
        state = ASR.init_state(cfg, batch, jnp.bfloat16)

        def _step(params, state, pcm, mask, reset, k):
            with rk.kernels_forced(quant and kernels):
                return ASR.step(cfg, params, state, pcm, mask, reset, k)

        return cfg, params, state, jax.jit(_step, donate_argnums=(1,))

    profiles = {p: make(p) for p in ("bf16", "serving")}
    mask = np.ones(batch, bool)
    reset = np.zeros(batch, bool)
    frame = mimi_cfg.frame_size
    k0 = jax.random.PRNGKey(123)

    toks = {p: [] for p in profiles}
    prs = {p: [] for p in profiles}
    t0 = time.time()
    for i in range(steps):
        pcm = (rng.standard_normal((batch, 1, frame)) * 0.1).astype(np.float32)
        bf16_tok = None
        for p, (cfg, params, state, fn) in profiles.items():
            out, state = fn(params, state, pcm, mask, reset, k0)
            if p == "bf16":
                bf16_tok = out["text_token"]
            else:
                # Teacher-force the text feedback with the bf16 stream so
                # the comparison measures quantisation perturbation, not
                # chaotic trajectory divergence after one argmax flip
                # (see tests/test_quant_quality.py rationale).
                state = dict(state, text_token=bf16_tok)
            profiles[p] = (cfg, params, state, fn)
            toks[p].append(np.asarray(out["text_token"]))
            if out["prs"].shape[-1]:
                prs[p].append(np.asarray(out["prs"], np.float32))
        if i % 100 == 0:
            print(f"  step {i}/{steps} ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    a = np.stack(toks["bf16"])       # (steps, B)
    b = np.stack(toks["serving"])
    match = a == b
    first_div = int(np.argmin(match.all(axis=1))) if not match.all() else -1
    out = {
        "steps": steps,
        "batch": batch,
        "mode": "teacher-forced (bf16 text stream)",
        "token_match_frac": round(float(match.mean()), 5),
        "streams_fully_matching": int(match.all(axis=0).sum()),
        "first_divergence_step": first_div,
    }
    if prs["bf16"]:
        out["vad_prob_max_abs_diff"] = round(
            float(np.abs(np.stack(prs["bf16"]) - np.stack(prs["serving"])).max()),
            5,
        )
    return out


def run_asr_w8a8_sweep(lm_cfg, steps: int, batch: int, seed: int = 0,
                       kernels: bool = True) -> dict:
    """Per-SITE W8A8 sensitivity sweep (VERDICT r3 #6).

    Teacher-forced ASR divergence with the full serving profile, where each
    leg drops ONE matmul site from W8A8 back to the weight-only dequant
    path (ops/qmm.set_w8a8_sites).  The bf16 stream is computed once; every
    leg compares against it.  The output ranks sites by how much excluding
    them recovers token match — the mixed serving profile keeps W8A8
    everywhere except the top offenders."""
    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.models import lm as LM
    from dsm_tpu.ops import qmm
    from dsm_tpu.ops import ring_kernels as rk
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import asr as ASR

    mimi_cfg = MIMI.v0_1(lm_cfg.audio_codebooks)
    key = jax.random.PRNGKey(seed)
    lm_bf16 = LM.init(lm_cfg, key, dtype=jnp.bfloat16)
    mimi_params = MIMI.init(mimi_cfg, jax.random.fold_in(key, 1))
    lm_q = T.quantize_weights(lm_bf16)
    frame = mimi_cfg.frame_size
    k0 = jax.random.PRNGKey(123)
    mask = np.ones(batch, bool)
    reset = np.zeros(batch, bool)

    def stream():
        # The same pcm for every leg.
        r = np.random.default_rng(seed)
        for _ in range(steps):
            yield (r.standard_normal((batch, 1, frame)) * 0.1).astype(
                np.float32
            )

    # -- bf16 reference stream (tokens per step) --
    cfg_bf = ASR.AsrConfig(lm=lm_cfg, mimi=mimi_cfg, kv_quant=False)

    def _step_bf(params, state, pcm, mask, reset, k):
        with rk.kernels_forced(False):
            return ASR.step(cfg_bf, params, state, pcm, mask, reset, k)

    fn_bf = jax.jit(_step_bf, donate_argnums=(1,))
    st = ASR.init_state(cfg_bf, batch, jnp.bfloat16)
    ref_toks = []
    t0 = time.time()
    for i, pcm in enumerate(stream()):
        out, st = fn_bf({"mimi": mimi_params, "lm": lm_bf16}, st, pcm, mask,
                        reset, k0)
        ref_toks.append(np.asarray(out["text_token"]))
        if i % 100 == 0:
            print(f"  bf16 step {i}/{steps} ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
    ref = np.stack(ref_toks)  # (steps, B)

    cfg_q = ASR.AsrConfig(lm=lm_cfg, mimi=mimi_cfg, kv_quant=True)
    all_sites = ["in_proj", "out_proj", "mlp_in", "mlp_out", "text_linear"]
    if lm_cfg.depformer is not None:
        # low_rank embeddings + the depformer linears only exist (and
        # only trace) with a depformer — sweeping them on stt models
        # would burn a full chip leg re-measuring the all-W8A8 config.
        all_sites += ["low_rank", "dep_in", "dep_out"]

    def leg(excluded) -> float:
        """Token match of the serving profile with ``excluded`` sites on
        the weight-only path instead of W8A8."""
        sites = None if not excluded else frozenset(
            s for s in all_sites if s not in excluded
        )
        qmm.set_w8a8_sites(sites)
        try:
            def _step(params, state, pcm, mask, reset, k):
                with rk.kernels_forced(kernels):
                    return ASR.step(cfg_q, params, state, pcm, mask, reset, k)

            fn = jax.jit(_step, donate_argnums=(1,))
            st = ASR.init_state(cfg_q, batch, jnp.bfloat16)
            matches = []
            t0 = time.time()
            for i, pcm in enumerate(stream()):
                out, st = fn({"mimi": mimi_params, "lm": lm_q}, st, pcm,
                             mask, reset, k0)
                # Teacher-force the text feedback with the bf16 stream.
                st = dict(st, text_token=jnp.asarray(ref[i]))
                matches.append(np.asarray(out["text_token"]) == ref[i])
                if i % 200 == 0:
                    print(
                        f"  leg -{excluded or 'none'} step {i}/{steps} "
                        f"({time.time()-t0:.0f}s)",
                        file=sys.stderr, flush=True,
                    )
            return float(np.stack(matches).mean())
        finally:
            qmm.set_w8a8_sites(None)

    results = {"all_w8a8": round(leg([]), 5)}
    for s in all_sites:
        results[f"minus_{s}"] = round(leg([s]), 5)

    # Mixed-profile proposal: exclude sites in descending recovery order
    # until >= 0.99 (or all are excluded, which is plain weight-only int8).
    base = results["all_w8a8"]
    gains = sorted(
        ((results[f"minus_{s}"] - base, s) for s in all_sites), reverse=True
    )
    excluded, mixed = [], base
    for gain, s in gains:
        if mixed >= 0.99 or gain <= 0:
            break
        excluded.append(s)
        mixed = leg(excluded)
    results["mixed_profile_excluded"] = excluded
    results["mixed_profile_match"] = round(mixed, 5)
    return {
        "steps": steps,
        "batch": batch,
        "mode": "teacher-forced per-site W8A8 sweep",
        "sites": all_sites,
        "results": results,
    }


def run_duplex_w8a8_sweep(lm_cfg, steps: int, batch: int, seed: int = 0,
                          kernels: bool = True) -> dict:
    """Per-site W8A8 sensitivity sweep for the DUPLEX profile (VERDICT r4
    #3): the s2s audio stream IS the product output, so the sweep ranks
    sites by AUDIO-token match, not text.

    Teacher-forced: after each serving-leg step, the state's text/audio
    feedback writes are overwritten with the bf16 leg's step-i outputs
    (prev_text + text_tokens[:, i] + the delayed audio_tokens writes), so
    every step's match is independent instead of compounding after the
    first flip (the free-run metric run_duplex reports).  The raw step-i
    depformer samples ride in out["audio_tokens"] (sessions/lm_gen.py)."""
    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import lm as LM
    from dsm_tpu.ops import qmm
    from dsm_tpu.ops import ring_kernels as rk
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import lm_gen

    key = jax.random.PRNGKey(seed)
    lm_bf16 = LM.init(lm_cfg, key, dtype=jnp.bfloat16)
    lm_q = T.quantize_weights(lm_bf16)
    rng = np.random.default_rng(seed)
    in_cb = lm_cfg.audio_codebooks // 2
    gen = in_cb
    delay = 2
    k0 = jax.random.PRNGKey(11)

    user_stream = rng.integers(
        0, lm_cfg.audio_vocab_size - 1, (steps, batch, in_cb)
    ).astype(np.int32)

    def make(quant: bool):
        cfg = lm_gen.DuplexConfig(
            lm=lm_cfg, generated_audio_codebooks=gen,
            input_audio_codebooks=in_cb, acoustic_delay=delay,
            max_steps=steps + 64,
            audio_temperature=0.0, text_temperature=0.0,
        )
        params = {"lm": lm_q if quant else lm_bf16}
        state = lm_gen.init_state(cfg, batch, jnp.bfloat16, kv_quant=quant)

        def _step(params, state, user_tokens, k):
            with rk.kernels_forced(quant and kernels):
                return lm_gen.step(cfg, params, state, user_tokens, k)

        return cfg, params, state, jax.jit(_step, donate_argnums=(1,))

    # Jitted teacher-force: rewrite step-i feedback with the bf16 outputs
    # (same index arithmetic as lm_gen.step's buffer writes).
    def _force(state, i, ref_text, ref_audio):
        b = ref_text.shape[0]
        b_col = jnp.arange(b)[:, None]
        g = jnp.arange(gen)
        wdel = jnp.where(g == 0, 0, delay)
        wp = jnp.maximum(i - wdel[None, :], 0)  # (1, gen) -> bcast (b, gen)
        wp = jnp.broadcast_to(wp, (b, gen))
        buf = state["audio_tokens"].at[
            b_col, wp, g[None, :]
        ].set(ref_audio)
        tb = state["text_tokens"].at[:, i].set(ref_text)
        return dict(
            state, audio_tokens=buf, text_tokens=tb, prev_text=ref_text
        )

    force = jax.jit(_force, donate_argnums=(0,))

    # -- bf16 reference leg (records raw per-step samples) --
    _, params_bf, st, fn_bf = make(False)
    ref_text, ref_audio = [], []
    t0 = time.time()
    for i in range(steps):
        out, st = fn_bf(params_bf, st, user_stream[i], k0)
        ref_text.append(np.asarray(out["text_token"]))
        ref_audio.append(np.asarray(out["audio_tokens"]))
        if i % 100 == 0:
            print(f"  bf16 step {i}/{steps} ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
    ref_text = np.stack(ref_text)    # (steps, B)
    ref_audio = np.stack(ref_audio)  # (steps, B, gen)

    all_sites = ["in_proj", "out_proj", "mlp_in", "mlp_out", "text_linear",
                 "low_rank", "dep_in", "dep_out"]

    def leg(excluded) -> dict:
        sites = (
            None if excluded is None
            else frozenset(s for s in all_sites if s not in excluded)
        )
        qmm.set_w8a8_sites(sites)
        try:
            _, params_q, st, fn = make(True)
            tmatch, amatch = [], []
            t0 = time.time()
            for i in range(steps):
                out, st = fn(params_q, st, user_stream[i], k0)
                tmatch.append(np.asarray(out["text_token"]) == ref_text[i])
                amatch.append(np.asarray(out["audio_tokens"]) == ref_audio[i])
                st = force(st, jnp.int32(i), jnp.asarray(ref_text[i]),
                           jnp.asarray(ref_audio[i]))
                if i % 200 == 0:
                    print(
                        f"  leg -{excluded or 'none'} step {i}/{steps} "
                        f"({time.time()-t0:.0f}s)",
                        file=sys.stderr, flush=True,
                    )
            return {
                "text": round(float(np.stack(tmatch).mean()), 5),
                "audio": round(float(np.stack(amatch).mean()), 5),
            }
        finally:
            qmm.set_w8a8_sites(None)

    results = {"all_w8a8": leg([])}
    # Pure weight-only profile (w8a8 = false): the one-knob quality lever.
    results["w8a8_off"] = leg(list(all_sites))
    for s in all_sites:
        results[f"minus_{s}"] = leg([s])

    # Mixed-profile proposal ranked by AUDIO-match recovery, target >= 0.95
    # (the duplex product bound; text is already high).
    base = results["all_w8a8"]["audio"]
    gains = sorted(
        ((results[f"minus_{s}"]["audio"] - base, s) for s in all_sites),
        reverse=True,
    )
    excluded, mixed = [], results["all_w8a8"]
    for gain, s in gains:
        if mixed["audio"] >= 0.95 or gain <= 0:
            break
        excluded.append(s)
        mixed = leg(excluded)
    results["mixed_profile_excluded"] = excluded
    results["mixed_profile_match"] = mixed
    return {
        "steps": steps,
        "batch": batch,
        "mode": "teacher-forced per-site W8A8 sweep (duplex, audio-ranked)",
        "sites": all_sites,
        "results": results,
    }


def run_tts(lm_cfg, steps: int, batch: int, seed: int = 0,
            kernels: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import lm as LM
    from dsm_tpu.ops import ring_kernels as rk
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import tts as TTS

    key = jax.random.PRNGKey(seed)
    lm_bf16 = LM.init(lm_cfg, key, dtype=jnp.bfloat16)

    # A rotating word feed, same constraints for both profiles.
    vocab = lm_cfg.text_in_vocab_size
    words = [40 + (i * 7) % max(vocab - 41, 1) for i in range(steps)]

    def make(profile: str):
        quant = profile == "serving"
        # temperature 0: greedy text+audio so the comparison is exact.
        cfg = TTS.TtsConfig(lm=lm_cfg, kv_quant=quant, max_steps=steps + 64,
                            temperature=0.0, text_temperature=0.0)
        params = {"lm": T.quantize_weights(lm_bf16) if quant else lm_bf16}
        state = TTS.init_state(cfg, batch, jnp.bfloat16)

        def _step(params, state, modes, toks, k):
            with rk.kernels_forced(quant and kernels):
                return TTS.step(cfg, params, state, modes, toks, k)

        return cfg, params, state, jax.jit(_step, donate_argnums=(1,))

    profiles = {p: make(p) for p in ("bf16", "serving")}
    k0 = jax.random.PRNGKey(7)
    text = {p: [] for p in profiles}
    audio = {p: [] for p in profiles}
    t0 = time.time()
    for i in range(steps):
        mode = TTS.ALLOW_TEXT if i % 3 == 0 else TTS.ALLOW_PAD_OR_EPAD
        modes = np.full(batch, mode, np.int32)
        tok_in = np.full(batch, words[i % len(words)], np.int32)
        for p, (cfg, params, state, fn) in profiles.items():
            out, state = fn(params, state, modes, tok_in, k0)
            profiles[p] = (cfg, params, state, fn)
            text[p].append(np.asarray(out["text_token"]))
            audio[p].append(np.asarray(out["frame"]))
        if i % 100 == 0:
            print(f"  step {i}/{steps} ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    ta, tb = np.stack(text["bf16"]), np.stack(text["serving"])
    aa, ab = np.stack(audio["bf16"]), np.stack(audio["serving"])
    return {
        "steps": steps,
        "batch": batch,
        "text_token_match_frac": round(float((ta == tb).mean()), 5),
        "audio_token_match_frac": round(float((aa == ab).mean()), 5),
        "first_text_divergence_step": (
            int(np.argmin((ta == tb).all(axis=1)))
            if not (ta == tb).all() else -1
        ),
    }


def run_duplex(lm_cfg, steps: int, batch: int, seed: int = 0,
               kernels: bool = True) -> dict:
    """s2s duplex profile: greedy text + audio over lm_gen.step with a
    shared random user-token stream (the Mimi encode stage is bf16 in both
    profiles and deterministic, so feeding tokens directly isolates the
    LM/depformer quantisation effect)."""
    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import lm as LM
    from dsm_tpu.ops import ring_kernels as rk
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import lm_gen

    key = jax.random.PRNGKey(seed)
    lm_bf16 = LM.init(lm_cfg, key, dtype=jnp.bfloat16)
    rng = np.random.default_rng(seed)
    in_cb = lm_cfg.audio_codebooks // 2

    def make(profile: str):
        quant = profile == "serving"
        cfg = lm_gen.DuplexConfig(
            lm=lm_cfg, generated_audio_codebooks=in_cb,
            input_audio_codebooks=in_cb, max_steps=steps + 64,
            audio_temperature=0.0, text_temperature=0.0,
        )
        params = {"lm": T.quantize_weights(lm_bf16) if quant else lm_bf16}
        state = lm_gen.init_state(cfg, batch, jnp.bfloat16, kv_quant=quant)

        def _step(params, state, user_tokens, k):
            with rk.kernels_forced(quant and kernels):
                return lm_gen.step(cfg, params, state, user_tokens, k)

        return cfg, params, state, jax.jit(_step, donate_argnums=(1,))

    profiles = {p: make(p) for p in ("bf16", "serving")}
    k0 = jax.random.PRNGKey(11)
    text = {p: [] for p in profiles}
    audio = {p: [] for p in profiles}
    t0 = time.time()
    for i in range(steps):
        user = rng.integers(
            0, lm_cfg.audio_vocab_size - 1, (batch, in_cb)
        ).astype(np.int32)
        # Both profiles free-run on the same user stream at temperature 0:
        # the duplex text AND audio feedbacks are autoregressive (teacher-
        # forcing text via force_text_token would replace the sampled token
        # and trivialise the metric), so match fractions compound after the
        # first argmax flip — first_text_divergence_step ("N frames
        # bit-exact") is the primary quality bound here.
        for p, (cfg, params, state, fn) in profiles.items():
            out, state = fn(params, state, user, k0)
            profiles[p] = (cfg, params, state, fn)
            text[p].append(np.asarray(out["text_token"]))
            audio[p].append(np.asarray(out["frame"]))
        if i % 100 == 0:
            print(f"  step {i}/{steps} ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    ta, tb = np.stack(text["bf16"]), np.stack(text["serving"])
    aa, ab = np.stack(audio["bf16"]), np.stack(audio["serving"])
    return {
        "steps": steps,
        "batch": batch,
        "text_token_match_frac": round(float((ta == tb).mean()), 5),
        "audio_token_match_frac": round(float((aa == ab).mean()), 5),
        "first_text_divergence_step": (
            int(np.argmin((ta == tb).all(axis=1)))
            if not (ta == tb).all() else -1
        ),
    }


def main(argv=None):
    from dsm_tpu.utils.compile_cache import enable_if_tpu

    enable_if_tpu()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="stt-1b",
                   choices=["stt-1b", "stt-2.6b", "tts-1.6b", "s2s-2b",
                            "small"])
    p.add_argument("--steps", type=int, default=750)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--no-kernels", action="store_true",
                   help="serving profile without the Pallas kernels "
                        "(kernels default ON only on TPU: interpret-mode "
                        "pallas on CPU is orders slower and numerically "
                        "identical — tests/test_ring_kernel.py)")
    p.add_argument("--kv-bits", type=int, default=8, choices=[8, 4],
                   help="serving-profile KV ring width (4 = packed int4 — "
                        "the stt-2.6b capacity route)")
    p.add_argument("--w8a8-sweep", action="store_true",
                   help="per-site W8A8 sensitivity sweep (ASR models): one "
                        "leg per matmul site dropped from W8A8, plus a "
                        "mixed-profile proposal targeting >= 99%% match")
    args = p.parse_args(argv)

    import jax

    on_tpu = jax.default_backend() != "cpu"  # axon = the tunneled TPU

    from dsm_tpu.models import lm as LM

    if args.w8a8_sweep:
        os.environ["DSM_W8A8"] = "1"
        if args.model == "s2s-2b":
            res = run_duplex_w8a8_sweep(
                LM.s2s_2b_16rvq_202501(), args.steps, args.batch,
                kernels=on_tpu and not args.no_kernels,
            )
        else:
            cfg = {
                "stt-1b": LM.stt_1b_en_fr,
            }.get(args.model)
            if cfg is None:
                p.error("--w8a8-sweep supports --model stt-1b or s2s-2b")
            res = run_asr_w8a8_sweep(cfg(), args.steps, args.batch,
                                     kernels=on_tpu and not args.no_kernels)
        res["model"] = args.model
        res["w8a8"] = True
        print(json.dumps(res))
        return
    if args.model == "stt-1b":
        res = run_asr(LM.stt_1b_en_fr(), args.steps, args.batch,
                      kernels=on_tpu and not args.no_kernels,
                      kv_bits=args.kv_bits)
    elif args.model == "stt-2.6b":
        res = run_asr(LM.stt_2_6b_en(), args.steps, args.batch,
                      kernels=on_tpu and not args.no_kernels,
                      kv_bits=args.kv_bits)
    elif args.model == "tts-1.6b":
        res = run_tts(LM.tts_1_6b_en_fr(), args.steps, args.batch,
                      kernels=on_tpu and not args.no_kernels)
    elif args.model == "s2s-2b":
        res = run_duplex(LM.s2s_2b_16rvq_202501(), args.steps, args.batch,
                         kernels=on_tpu and not args.no_kernels)
    else:
        import dataclasses

        cfg = LM.stt_1b_en_fr()
        cfg = dataclasses.replace(
            cfg,
            transformer=dataclasses.replace(
                cfg.transformer, d_model=512, num_layers=4,
                dim_feedforward=2048, num_heads=8,
            ),
        )
        res = run_asr(cfg, args.steps, args.batch,
                      kernels=on_tpu and not args.no_kernels)
    res["model"] = args.model
    res["w8a8"] = os.environ.get("DSM_W8A8") not in (None, "", "0", "false")
    res["kv_bits"] = args.kv_bits
    print(json.dumps(res))


if __name__ == "__main__":
    main()
