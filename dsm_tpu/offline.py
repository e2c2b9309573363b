"""Offline (file-to-file) STT and TTS drivers — the minimum end-to-end slice.

STT: decode audio -> frame-by-frame Mimi encode + LM step -> word events
with timestamps, exactly the streaming path run at file speed, plus trailing
silence so the delayed tokens flush (the reference client streams 10 s of
silence + a marker for the same purpose; kyutai-cli stt.rs:305-433).

Without local model weights (zero-egress dev) the pipeline runs with
random-init weights: transcripts are then meaningless but the full path —
codec, delays, word assembly, VAD — is exercised end to end.
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

log = logging.getLogger("dsm.offline")


def _default_asr_module():
    from .models import lm as LM
    from .server.config import ModuleConfig

    return ModuleConfig(
        name="asr", type="BatchedAsr", path="/api/asr-streaming", raw={},
        lm=LM.stt_1b_en_fr(),
        lm_model_file="hf://kyutai/stt-1b-en_fr-candle/model.safetensors",
        text_tokenizer_file="hf://kyutai/stt-1b-en_fr-candle/tokenizer_en_fr_audio_8000.model",
        audio_tokenizer_file="hf://kyutai/stt-1b-en_fr-candle/mimi-pytorch-e351c8d8@125.safetensors",
        asr_delay_in_tokens=6, batch_size=1, temperature=0.0,
    )


def transcribe_file(
    path: str,
    config_path: Optional[str] = None,
    vad: bool = False,
    module_name: Optional[str] = None,
    engine=None,
) -> dict:
    import jax

    from .sessions import asr as ASR
    from .server import builder
    from .server.config import Config
    from .utils.audio import decode_audio

    if engine is None:
        if config_path:
            cfg = Config.load(config_path)
            mods = [m for m in cfg.modules.values() if m.type in ("BatchedAsr", "Asr")]
            mod = next((m for m in mods if m.name == module_name), mods[0])
        else:
            mod = _default_asr_module()
        mod.batch_size = 1
        engine = builder.build_batched_asr(mod)
    acfg = engine.cfg
    frame = acfg.mimi.frame_size

    pcm = decode_audio(path, int(acfg.mimi.sample_rate))
    # Trailing silence so delayed words flush (delay tokens + padding).
    tail = (acfg.asr_delay_in_tokens + 8) * frame
    pcm = np.concatenate([pcm, np.zeros(tail, np.float32)])
    n_frames = len(pcm) // frame

    # Meshed engines hold tp-PERMUTED params (parallel/mesh.py) that only
    # the engine's own shard_map step interprets correctly, and a custom
    # step_fn must be honoured — both fall back to the per-frame loop.
    if engine.mesh is not None or not engine._seeded_step:
        state = ASR.init_state(acfg, 1, engine.cache_dtype)
        words_state = ASR.WordState(acfg, 1)
        return _transcribe_per_frame(
            engine, acfg, pcm, n_frames, frame, state, words_state, vad
        )
    return _scan_transcribe(engine, acfg, [pcm], vad)[0]


def transcribe_files(
    paths,
    config_path: Optional[str] = None,
    vad: bool = False,
    module_name: Optional[str] = None,
    engine=None,
    batch_cap: int = 16,
) -> list:
    """Bulk transcription: N files batch over the model's batch dimension
    and scan at device speed (shorter files freeze behind their masks once
    exhausted).  Returns one transcribe_file-style dict per input path, in
    order.  The reference has no offline batch mode at all — its closest
    analogue is one `moshi-cli` run per file."""
    from .sessions import asr as ASR
    from .server import builder
    from .server.config import Config
    from .utils.audio import decode_audio

    if engine is None:
        if config_path:
            cfg = Config.load(config_path)
            mods = [m for m in cfg.modules.values() if m.type in ("BatchedAsr", "Asr")]
            mod = next((m for m in mods if m.name == module_name), mods[0])
        else:
            mod = _default_asr_module()
        mod.batch_size = 1  # compute runs through the scan, not the engine
        engine = builder.build_batched_asr(mod)
    acfg = engine.cfg
    frame = acfg.mimi.frame_size
    tail = (acfg.asr_delay_in_tokens + 8) * frame

    if engine.mesh is not None or not engine._seeded_step:
        return [
            transcribe_file(p, vad=vad, engine=engine) for p in paths
        ]

    pcms = []
    for p in paths:
        pcm = decode_audio(p, int(acfg.mimi.sample_rate))
        pcms.append(np.concatenate([pcm, np.zeros(tail, np.float32)]))

    results = []
    for g0 in range(0, len(pcms), batch_cap):
        results.extend(
            _scan_transcribe(engine, acfg, pcms[g0 : g0 + batch_cap], vad)
        )
    return results


def _scan_transcribe(engine, acfg, pcms, vad) -> list:
    """Shared scan core: ``pcms`` (already tail-padded) ride the batch dim;
    K frames per jitted dispatch (one lax.scan — offline input is fully
    known upfront, so there is no frame-cadence dependency; a 60 s file is
    15 dispatches instead of 750, and each extra file in the batch is
    nearly free on the MXU).  K is fixed so the program compiles once per
    group size; trailing chunks/short files pad with masked (state-frozen)
    frames."""
    import jax
    import jax.numpy as jnp

    from .ops import ring_kernels as _rk
    from .sessions import asr as ASR

    B = len(pcms)
    frame = acfg.mimi.frame_size
    frames_per = [len(p) // frame for p in pcms]
    n_frames = max(frames_per)
    K = min(50, max(1, n_frames))
    n_prs = (acfg.lm.extra_heads or (0, 0))[0]

    state = ASR.init_state(acfg, B, engine.cache_dtype)
    words_state = ASR.WordState(acfg, B)
    rng = jax.random.PRNGKey(0)

    def scan_chunk(params, state, pcm_k, mask_k, base_key):
        with _rk.kernels_forced(_rk.kernels_override()):
            def body(st, x):
                pcm_f, mask_f, i = x
                out, st = ASR.step(
                    acfg, params, st, pcm_f, mask_f,
                    jnp.zeros((B,), bool), jax.random.fold_in(base_key, i),
                    engine.condition,
                    seeds=jnp.zeros((B,), jnp.uint32),
                )
                return st, (out["text_token"], out["step_idx"], out["prs"])

            state, ys = jax.lax.scan(
                body, state,
                (pcm_k, mask_k, jnp.arange(K, dtype=jnp.uint32)),
            )
        return ys, state

    # One compile per (B, K) per engine: groups of the same size reuse the
    # program (compiles are minutes at flagship shapes on TPU).
    cache = getattr(engine, "_offline_scan_cache", None)
    if cache is None:
        cache = engine._offline_scan_cache = {}
    scan_jit = cache.get((B, K))
    if scan_jit is None:
        scan_jit = cache[(B, K)] = jax.jit(scan_chunk, donate_argnums=(1,))

    words = [[] for _ in range(B)]
    vad_steps = [[] for _ in range(B)]
    open_word = [None] * B
    for c0 in range(0, n_frames, K):
        nk = min(K, n_frames - c0)
        pcm_k = np.zeros((K, B, 1, frame), np.float32)
        mask_k = np.zeros((K, B), bool)
        for b, (pcm, nf) in enumerate(zip(pcms, frames_per)):
            hi = min(c0 + nk, nf)
            for j in range(c0, hi):
                pcm_k[j - c0, b, 0, :] = pcm[j * frame : (j + 1) * frame]
            mask_k[: max(hi - c0, 0), b] = True
        rng, sub = jax.random.split(rng)
        (text_k, steps_k, prs_k), state = scan_jit(
            engine.params, state, jnp.asarray(pcm_k), jnp.asarray(mask_k), sub
        )
        text_k = np.asarray(text_k)
        steps_k = np.asarray(steps_k)
        prs_k = np.asarray(prs_k)
        for i in range(nk):
            if vad and n_prs:
                for b in range(B):
                    if mask_k[i, b]:
                        vad_steps[b].append(
                            {"step_idx": int(steps_k[i, b]),
                             "prs": prs_k[i, b].tolist()}
                        )
            for ev in words_state.process(text_k[i], steps_k[i], mask_k[i]):
                b = ev.batch_idx
                if isinstance(ev, ASR.WordEvent):
                    open_word[b] = {
                        "text": engine.tokenizer.decode(ev.tokens),
                        "start_s": ev.start_time,
                        "stop_s": None,
                    }
                    words[b].append(open_word[b])
                elif isinstance(ev, ASR.EndWordEvent) and open_word[b] is not None:
                    open_word[b]["stop_s"] = ev.stop_time
                    open_word[b] = None

    out = []
    for b in range(B):
        result = {
            "words": [
                {"text": w["text"], "start_s": w["start_s"], "stop_s": w["stop_s"]}
                for w in words[b]
            ],
            "text": " ".join(w["text"] for w in words[b]),
        }
        if vad:
            result["vad"] = vad_steps[b]
        out.append(result)
    return out


def _transcribe_per_frame(engine, acfg, pcm, n_frames, frame, state,
                          words_state, vad) -> dict:
    """Frame-at-a-time fallback through ``engine.step_fn`` — required for
    meshed engines (tp-permuted params) and custom step functions."""
    import jax

    from .sessions import asr as ASR

    rng = jax.random.PRNGKey(0)
    mask = np.ones(1, bool)
    reset = np.zeros(1, bool)
    words = []
    vad_steps = []
    open_word = None
    step = engine.step_fn
    for i in range(n_frames):
        chunk = pcm[i * frame : (i + 1) * frame][None, None, :]
        rng, sub = jax.random.split(rng)
        if engine._seeded_step:
            out, state = step(
                engine.params, state, chunk, mask, reset, sub,
                np.zeros(1, np.uint32),
            )
        else:
            out, state = step(engine.params, state, chunk, mask, reset, sub)
        text = np.asarray(out["text_token"])
        steps = np.asarray(out["step_idx"])
        if vad and out["prs"].shape[-1]:
            vad_steps.append(
                {"step_idx": int(steps[0]),
                 "prs": np.asarray(out["prs"])[0].tolist()}
            )
        for ev in words_state.process(text, steps, mask):
            if isinstance(ev, ASR.WordEvent):
                open_word = {
                    "text": engine.tokenizer.decode(ev.tokens),
                    "start_s": ev.start_time,
                    "stop_s": None,
                }
                words.append(open_word)
            elif isinstance(ev, ASR.EndWordEvent) and open_word is not None:
                open_word["stop_s"] = ev.stop_time
                open_word = None
    result = {
        "words": [
            {"text": w["text"], "start_s": w["start_s"], "stop_s": w["stop_s"]}
            for w in words
        ],
        "text": " ".join(w["text"] for w in words),
    }
    if vad:
        result["vad"] = vad_steps
    return result


def _build_tts_engine(config_path: Optional[str]):
    from .server import builder
    from .server.config import Config, ModuleConfig

    if config_path:
        cfg = Config.load(config_path)
        mod = next(m for m in cfg.modules.values() if m.type == "Tts")
    else:
        from .models import lm as LM

        mod = ModuleConfig(
            name="tts", type="Tts", path="/api/tts", raw={},
            lm=LM.tts_1_6b_en_fr(),
            lm_model_file="hf://kyutai/tts-1.6b-en_fr/dsm_tts_1e68beda@240.safetensors",
            audio_tokenizer_file="hf://kyutai/tts-1.6b-en_fr/tokenizer-e351c8d8-checkpoint125.safetensors",
            text_tokenizer_file="hf://kyutai/tts-1.6b-en_fr/tokenizer_spm_8k_en_fr_audio.model",
        )
    return builder.build_tts(mod)


def synthesize_file(text: str, out_path: str, config_path: Optional[str] = None) -> dict:
    from .utils.audio import write_wav

    engine = _build_tts_engine(config_path)
    pcm, transcript = engine.synthesize(text)
    write_wav(out_path, pcm, 24_000)
    return {
        "out": out_path,
        "duration_s": round(len(pcm) / 24_000.0, 3),
        "transcript": [
            {"text": w.text, "start_s": w.start_s, "stop_s": w.stop_s}
            for w in transcript
        ],
    }


def synthesize_jsonl(
    jsonl_path: str,
    out_dir: str,
    config_path: Optional[str] = None,
    engine=None,
) -> list:
    """Batch synthesis from the reference's audio/tts.jsonl input format:
    one JSON object per line with ``id``, ``turns`` (list of utterances) and
    ``voices`` (voice specs resolved like ?voice=).  Writes ``<id>.wav``
    per line and returns a manifest."""
    import inspect
    import json
    import os

    from .utils.audio import write_wav

    if engine is None:
        engine = _build_tts_engine(config_path)
    os.makedirs(out_dir, exist_ok=True)

    def item_kwargs(item):
        voice = (item.get("voices") or [None])[0]
        kw = {}
        sig = inspect.signature(engine.synthesize).parameters
        if voice:
            try:
                if "voice" in sig:
                    kw["voice"] = voice
                elif "ca_kv" in sig and hasattr(engine, "voice_kv"):
                    kw["ca_kv"] = engine.voice_kv(voice)
                elif "voice_ca" in sig and hasattr(engine, "voice_kv"):
                    kw["voice_ca"] = engine.voice_kv(voice)
            except FileNotFoundError:
                pass  # voice files absent locally: synthesize unconditioned
        return kw

    with open(jsonl_path) as f:
        items = [json.loads(ln) for ln in f if ln.strip()]

    # Continuous-batching engines run the whole jsonl CONCURRENTLY: each
    # synthesize() occupies one slot and the engine loop steps every live
    # session in lock-step, so wall-clock is ~len(items)/batch_size of the
    # sequential walk (the reference's tts.jsonl path is one-at-a-time
    # behind its batch=1 mutex).
    manifest = []

    def emit(item, pcm, transcript):
        out_path = os.path.join(out_dir, f"{item.get('id', len(manifest))}.wav")
        write_wav(out_path, pcm, 24_000)  # write as produced: O(1) pcm held
        manifest.append({
            "id": item.get("id"),
            "out": out_path,
            "duration_s": round(len(pcm) / 24_000.0, 3),
            "words": len(transcript),
        })

    batched = hasattr(engine, "open_session")
    if batched and len(items) > 1:
        from concurrent.futures import ThreadPoolExecutor

        started = not engine.running
        if started:
            engine.start()
        try:
            def run(i):
                item = items[i]
                text = " ".join(item.get("turns", []))
                # Per-item deterministic seed: output independent of batch
                # composition (sampling is keyed (seed, step)).
                return engine.synthesize(
                    text, seed=i + 1, **item_kwargs(item)
                )

            with ThreadPoolExecutor(
                max_workers=min(engine.batch_size, len(items))
            ) as ex:
                # ex.map yields in input order: write each wav as soon as
                # its item completes instead of buffering all audio.
                for i, (pcm, transcript) in enumerate(
                    ex.map(run, range(len(items)))
                ):
                    emit(items[i], pcm, transcript)
        finally:
            if started:
                engine.stop()
    else:
        for item in items:
            text = " ".join(item.get("turns", []))
            pcm, transcript = engine.synthesize(text, **item_kwargs(item))
            emit(item, pcm, transcript)
    return manifest
