"""One-command real-checkpoint validation (VERDICT standing order).

The moment the released Kyutai weights appear in the HF cache, this runs
the full validation pass that has been blocked by the zero-egress
environment (PARITY.md "known gaps"; SURVEY.md §7 step 4):

  1. Mimi codec roundtrip on real speech: encode bria.mp3 -> RVQ codes ->
     decode; the reconstruction must correlate with the input (SNR check)
     and code distributions must use the full 2048-bin range.
  2. stt-1b streaming transcription of audio/bria.mp3 (offline path,
     identical step semantics to the server) — transcript printed and
     sanity-checked (non-empty, words have monotonic timestamps).
  3. GGUF q8_0 export -> reimport of the LM: tokens from the reimported
     checkpoint must match the safetensors run exactly over N frames.

Exits 0 with a JSON report when everything passes, 2 when weights are not
in the cache (clearly reported), 1 on a failed check.

Usage:  python tools/validate_real.py [--config configs/config-stt.toml]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DSM_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["DSM_PLATFORM"])

BRIA = "/root/reference/audio/bria.mp3"
# Quality gates assert only outside rehearsal mode (random/synthetic
# weights exercise the plumbing; real weights must also pass quality).
REHEARSAL = False


def _gate(cond, msg, report):
    """assert in the real run; record-and-continue in --rehearsal."""
    if cond:
        return
    if REHEARSAL:
        report.setdefault("rehearsal_skipped_gates", []).append(msg)
        return
    raise AssertionError(msg)



def _resolve(cfg_mod):
    from dsm_tpu.server import config as CFG

    paths = {}
    for name in ("lm_model_file", "audio_tokenizer_file", "text_tokenizer_file"):
        spec = getattr(cfg_mod, name, None)
        paths[name] = CFG.resolve_path(spec) if spec else None
    return paths


def check_mimi_roundtrip(mod, report):
    import jax

    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.server import builder
    from dsm_tpu.utils.audio import decode_audio

    mimi_cfg = MIMI.v0_1(mod.lm.audio_codebooks if mod.lm else 32)
    params, loaded = builder._load_or_init_mimi(mod, mimi_cfg, jax.random.PRNGKey(0))
    if not loaded:
        raise FileNotFoundError("mimi checkpoint not in cache")
    pcm = decode_audio(BRIA, int(mimi_cfg.sample_rate))
    n = (len(pcm) // mimi_cfg.frame_size) * mimi_cfg.frame_size
    pcm = pcm[:n][None, None, :]

    codes = MIMI.encode(mimi_cfg, params, pcm)
    rec = MIMI.decode(mimi_cfg, params, codes)
    codes = np.asarray(codes)
    rec = np.asarray(rec)[0, 0, : pcm.shape[-1]]
    x = pcm[0, 0][: len(rec)]
    err = x - rec
    snr_db = 10 * np.log10(float((x**2).mean()) / max(float((err**2).mean()), 1e-12))
    used_bins = int(len(np.unique(codes)))
    report["mimi_roundtrip"] = {
        "snr_db": round(snr_db, 2),
        "unique_codes": used_bins,
        "frames": int(codes.shape[-1]),
    }
    # A real codec reconstructs speech at positive SNR and uses a large
    # fraction of the codebook; random weights produce ~-? dB and few bins.
    _gate(snr_db > 3.0,
          f"mimi roundtrip SNR {snr_db:.1f} dB — wrong weights?", report)
    _gate(used_bins > 256, f"only {used_bins} codebook bins used", report)


def check_transcript(config_path, report):
    from dsm_tpu.offline import transcribe_file

    res = transcribe_file(BRIA, config_path=config_path)
    words = res.get("words", [])
    report["stt_bria"] = {
        "text": res.get("text", ""),
        "n_words": len(words),
    }
    _gate(bool(res.get("text")), "empty transcript", report)
    times = [w["start_s"] for w in words if w.get("start_s") is not None]
    assert all(b >= a for a, b in zip(times, times[1:])), "non-monotonic timestamps"


def check_gguf_roundtrip(mod, config_path, report):
    import tempfile

    import jax
    import jax.numpy as jnp

    from dsm_tpu.server import builder
    from dsm_tpu.utils import checkpoint as CK
    from dsm_tpu.utils import gguf

    lm_params, loaded = builder._load_or_init_lm(mod, jax.random.PRNGKey(0),
                                                 jnp.bfloat16)
    if not loaded:
        raise FileNotFoundError("lm checkpoint not in cache")
    ref = CK.lm_params_to_reference(mod.lm, lm_params)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model-q8_0.gguf")
        gguf.write_gguf(path, ref, quantize=True)  # q8_0 for eligible mats
        _meta, back = gguf.read_gguf(path)
        lm2 = CK.build_lm_params(mod.lm, back, jnp.bfloat16)
    # Greedy token parity over 16 frames of real audio codes.
    from dsm_tpu.models import lm as LM

    cfg = mod.lm
    b = 2
    rng = np.random.default_rng(0)
    audio = rng.integers(0, cfg.audio_vocab_size - 1, (16, b, cfg.audio_codebooks))
    toks = []
    for params in (lm_params, lm2):
        st = LM.init_state(cfg, b, jnp.bfloat16)
        text = jnp.full((b,), cfg.text_start_token, jnp.int32)
        seq = []
        for i in range(16):
            logits, hidden, st = LM.step(
                cfg, params, st, text, jnp.asarray(audio[i], jnp.int32)
            )
            text = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            seq.append(np.asarray(text))
        toks.append(np.stack(seq))
    match = float((toks[0] == toks[1]).mean())
    report["gguf_q8_token_match"] = round(match, 4)
    _gate(match > 0.95, f"gguf q8 reimport token match {match}", report)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config-stt.toml")
    p.add_argument("--skip", nargs="*", default=[],
                   choices=["mimi", "stt", "gguf"])
    p.add_argument("--audio", default=None,
                   help="override the reference bria.mp3 sample")
    p.add_argument("--rehearsal", action="store_true",
                   help="exercise all plumbing with whatever weights "
                        "the config resolves (quality gates recorded, "
                        "not asserted) — proves the validation itself "
                        "works before real weights land")
    args = p.parse_args(argv)
    global BRIA, REHEARSAL
    if args.audio:
        BRIA = args.audio
    REHEARSAL = bool(args.rehearsal)

    from dsm_tpu.server.config import Config

    cfg = Config.load(args.config)
    mod = next(m for m in cfg.modules.values()
               if m.type in ("Asr", "BatchedAsr"))
    paths = _resolve(mod)
    missing = [k for k, v in paths.items() if v is None]
    if missing:
        print(json.dumps({
            "status": "weights-not-available",
            "missing": missing,
            "hint": "populate the HF cache with kyutai/stt-1b-en_fr-candle "
                    "then re-run; zero-egress environments cannot download",
        }))
        return 2
    if not os.path.exists(BRIA):
        print(json.dumps({"status": "no-reference-audio", "path": BRIA}))
        return 2

    report = {"status": "ok-rehearsal" if REHEARSAL else "ok"}
    try:
        if "mimi" not in args.skip:
            print("[1/3] mimi roundtrip on bria.mp3 ...", flush=True)
            check_mimi_roundtrip(mod, report)
        if "stt" not in args.skip:
            print("[2/3] stt-1b transcript of bria.mp3 ...", flush=True)
            check_transcript(args.config, report)
        if "gguf" not in args.skip:
            print("[3/3] gguf q8_0 export/reimport parity ...", flush=True)
            check_gguf_roundtrip(mod, args.config, report)
    except AssertionError as e:
        report["status"] = "FAILED"
        report["error"] = str(e)
        print(json.dumps(report, ensure_ascii=False))
        return 1
    print(json.dumps(report, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
