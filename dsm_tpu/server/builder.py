"""Build serving modules from a TOML config (main.rs:377-538 Module::new).

Loads checkpoints when the artifacts are available in the local cache;
otherwise (zero-egress dev) falls back to random-init weights with the
configured shapes and records that in the module report — the serving
stack, protocols and benchmarks are identical either way.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional, Tuple

import numpy as np

from ..models import lm as LM
from ..models import mimi as MIMI
from ..sessions import asr as ASR
from ..sessions import tts as TTS
from ..utils import checkpoint as CK
from ..utils.tokenizer import load_tokenizer
from . import config as CFG
from .autoconfig import auto_batch_size
from .batched_asr import BatchedAsrEngine
from .tts_module import TtsEngine

log = logging.getLogger("dsm.builder")


def _load_or_init_lm(mod: CFG.ModuleConfig, key, dtype):
    import jax

    path = CFG.resolve_path(mod.lm_model_file) if mod.lm_model_file else None
    if path:
        log.info("loading LM weights from %s", path)
        return CK.build_lm_params(mod.lm, CK.load_tensors(path), dtype), True
    log.warning(
        "LM weights %s not available locally; using random init",
        mod.lm_model_file,
    )
    return LM.init(mod.lm, key, dtype=dtype), False


def _load_or_init_mimi(mod: CFG.ModuleConfig, cfg_mimi, key):
    path = (
        CFG.resolve_path(mod.audio_tokenizer_file) if mod.audio_tokenizer_file else None
    )
    if path:
        log.info("loading Mimi weights from %s", path)
        return CK.build_mimi_params(cfg_mimi, CK.load_tensors(path)), True
    log.warning(
        "Mimi weights %s not available locally; using random init",
        mod.audio_tokenizer_file,
    )
    return MIMI.init(cfg_mimi, key), False


def build_batched_asr(mod: CFG.ModuleConfig) -> BatchedAsrEngine:
    import jax
    import jax.numpy as jnp

    on_accel = jax.default_backend() != "cpu"
    mimi_cfg = MIMI.v0_1(mod.lm.audio_codebooks)
    asr_cfg = ASR.AsrConfig(
        lm=mod.lm,
        mimi=mimi_cfg,
        asr_delay_in_tokens=mod.asr_delay_in_tokens,
        temperature=mod.temperature,
        # Serving profile on accelerators: int8 KV rings + bf16 codec
        # (385.5 realtime streams/chip at batch 128 on v5e; bench.py).
        kv_quant=on_accel and mod.raw.get("kv_quant", True),
        mimi_dtype="bfloat16" if on_accel else "float32",
    )
    dtype = jnp.bfloat16 if on_accel else jnp.float32
    key = jax.random.PRNGKey(0)
    lm_params, _ = _load_or_init_lm(mod, key, dtype)
    mimi_params, _ = _load_or_init_mimi(mod, mimi_cfg, jax.random.fold_in(key, 1))
    if on_accel:
        mimi_params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.bfloat16), mimi_params
        )
        if mod.raw.get("weight_quant", True):
            # Weight-only int8 LM matmuls: the rest of the serving profile
            # (bench.py headline) — halves the weight read and feeds the
            # fused dequant kernel (ops/qmm.py).
            from ..ops import qmm, transformer as T

            lm_params = T.quantize_weights(lm_params)
            # W8A8 dynamic-activation int8 dots complete the profile
            # (DSM_W8A8 env or TOML w8a8=false overrides).
            qmm.set_w8a8_default(mod.raw.get("w8a8", True))
            # Mixed profile: TOML `w8a8_sites = ["in_proj", ...]` keeps
            # W8A8 only on the listed matmul sites (the rest fall back to
            # weight-only dequant) — the knob the per-site sensitivity
            # sweep (tools/quant_divergence.py --w8a8-sweep) tunes.
            sites = mod.raw.get("w8a8_sites")
            if sites is not None:
                if isinstance(sites, str):
                    sites = [s.strip() for s in sites.split(",") if s.strip()]
                qmm.set_w8a8_sites(sites)
    params = {"mimi": mimi_params, "lm": lm_params}

    batch = auto_batch_size(mod.batch_size, mod.lm)
    mesh = build_mesh_from_config(mod)
    # TOML `pcm_wire = "int16"` enables the measured low-latency upload
    # profile (docs/SUSTAINED_r04_pipe2_i16.json: p50/p95 60.3/76.2 ms at
    # B=128 with pipeline_depth=2).  Passed as a constructor arg so the
    # TOML value wins over ambient DSM_PCM_INT16 and never leaks into
    # other modules built in the same process.
    wire = str(mod.raw.get("pcm_wire", "")).lower()
    engine = BatchedAsrEngine(
        asr_cfg, params, batch_size=batch, mesh=mesh,
        pipeline_depth=int(mod.raw.get(
            "pipeline_depth", os.environ.get("DSM_ASR_PIPELINE", "1")
        )),
        fill_gate_frac=float(mod.raw.get("fill_gate_frac", 0.2)),
        pcm_wire_int16={"int16": True, "f32": False, "float32": False}.get(
            wire
        ),
    )
    tok_path = (
        CFG.resolve_path(mod.text_tokenizer_file) if mod.text_tokenizer_file else None
    )
    engine.tokenizer = load_tokenizer(tok_path)
    return engine


def build_mesh_from_config(mod: CFG.ModuleConfig):
    """TOML ``[modules.X.mesh] dp = N [tp = M]`` -> a jax device Mesh.

    Multi-chip serving as configuration, not a harness: the continuous
    batch shards over dp (ICI), attention heads/MLP over tp when asked
    (parallel/mesh.py rules).  Returns None when the section is absent or
    asks for a single device; raises when more devices are requested than
    exist (a silent fallback would misreport capacity)."""
    spec = mod.raw.get("mesh")
    if not spec:
        return None
    import jax

    from ..parallel import mesh as M

    dp = int(spec.get("dp", 1))
    tp = int(spec.get("tp", 1))
    if dp * tp <= 1:
        return None
    n_dev = len(jax.devices())
    if dp * tp > n_dev:
        raise ValueError(
            f"mesh dp={dp} x tp={tp} needs {dp * tp} devices, "
            f"have {n_dev}"
        )
    log.info("serving mesh: dp=%d tp=%d over %d devices", dp, tp, dp * tp)
    return M.make_mesh(dp=dp, tp=tp)


def build_tts(mod: CFG.ModuleConfig) -> TtsEngine:
    import jax
    import jax.numpy as jnp

    gen = mod.generation or {}
    tts_cfg = TTS.TtsConfig(
        lm=mod.lm,
        acoustic_delay=gen.get("acoustic_delay", 2),
        text_pad_token=gen.get("text_pad_token", 3),
        text_bos_token=gen.get("text_bos_token", 1),
        text_eos_token=gen.get("text_eos_token", 2),
        text_eop_token=gen.get("text_eop_token", 0),
        text_start_token=gen.get("text_start_token", 8000),
        text_audio_delay_in_tokens=gen.get("text_audio_delay_in_tokens", 25),
        max_consecutive_pads=gen.get("max_consecutive_pads", 10),
        extra_steps=gen.get("extra_steps", 5),
        speaker_cond_duration_s=gen.get("speaker_cond_duration_s", 10.0),
        speaker_cond_dim=gen.get("speaker_cond_dim", 2048),
        speaker_cond_n_speakers=gen.get("speaker_cond_n_speakers", 5),
        # Serving profile on accelerators (same as the ASR builder + the
        # TTS bench): int8 KV rings.
        kv_quant=jax.default_backend() != "cpu"
        and bool(mod.raw.get("kv_quant", True)),
    )
    mimi_cfg = MIMI.v0_1(mod.lm.generated_codebooks or mod.lm.audio_codebooks)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    key = jax.random.PRNGKey(0)
    lm_params, _ = _load_or_init_lm(mod, key, dtype)
    mimi_params, _ = _load_or_init_mimi(mod, mimi_cfg, jax.random.fold_in(key, 1))
    tok_path = (
        CFG.resolve_path(mod.text_tokenizer_file) if mod.text_tokenizer_file else None
    )
    tokenizer = load_tokenizer(tok_path)
    tts_batch = int(mod.raw.get("batch_size", 1))
    if jax.default_backend() != "cpu":
        mimi_params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.bfloat16), mimi_params
        )
        if mod.raw.get("weight_quant", True):
            # Serving profile, like the ASR builder: weight-only int8 LM
            # + W8A8 dynamic-activation int8 dots.
            from ..ops import qmm, transformer as T

            lm_params = T.quantize_weights(lm_params)
            qmm.set_w8a8_default(mod.raw.get("w8a8", True))

    # Voice sources: preloaded embeddings + voice dir (tts.rs:304-365).
    from ..models import speaker as SPK
    from .voices import VoiceResolver

    voice_dir = CFG.resolve_path(mod.voice_dir) if mod.voice_dir else None
    if voice_dir is not None and not os.path.isdir(voice_dir):
        voice_dir = os.path.dirname(voice_dir)
    preloaded = {
        name: CFG.resolve_path(spec)
        for name, spec in (mod.voices or {}).items()
        if CFG.resolve_path(spec)
    }
    spk_cfg = SPK.SpeakerEncoderConfig(
        cond_dim=tts_cfg.speaker_cond_dim,
        n_speakers=tts_cfg.speaker_cond_n_speakers,
        duration_s=tts_cfg.speaker_cond_duration_s,
        mimi=mimi_cfg,
    )
    spk_params = SPK.init(spk_cfg, jax.random.fold_in(key, 2))
    resolver = VoiceResolver(
        voice_dir=voice_dir, preloaded=preloaded,
        speaker_cfg=spk_cfg, speaker_params=spk_params, mimi_params=mimi_params,
    )
    # Optional attribute conditioners ([modules.tts.model.conditioners],
    # e.g. config-tts-realtime's `description` quality Lut).  The provider's
    # weights come from the checkpoint when present (condition_provider.*
    # keys); default attribute = the last listed value ("very_good").
    default_condition = None
    cond_provider = None
    cond_cfgs_raw = (mod.raw.get("model") or {}).get("conditioners")
    if cond_cfgs_raw:
        from ..models import conditioner as COND

        cond_provider = COND.ConditionProvider(
            mod.lm.transformer.d_model,
            COND.configs_from_toml(cond_cfgs_raw),
            jax.random.fold_in(key, 3),
        )
        lm_path = CFG.resolve_path(mod.lm_model_file) if mod.lm_model_file else None
        if lm_path:
            adopted = cond_provider.load_params(CK.load_tensors(lm_path))
            log.info("conditioner weights adopted from checkpoint: %d", adopted)
        for name, c in cond_cfgs_raw.items():
            if c.get("type") == "Lut" and c.get("possible_values"):
                default_condition = cond_provider.condition_lut(
                    name, c["possible_values"][-1]
                )
                break

    if tts_batch > 1:
        # Continuous TTS batching (beyond the reference's batch=1 mutex).
        from .tts_batched import BatchedTtsEngine

        # TOML `pcm_wire = "int16"` enables the int16 audio download wire
        # (halves the per-tick device->host fetch) — constructor arg, same
        # precedence rule as the ASR builder.
        tts_wire = str(mod.raw.get("pcm_wire", "")).lower()

        engine = BatchedTtsEngine(
            tts_cfg, {"lm": lm_params}, mimi_cfg, mimi_params, tokenizer,
            batch_size=tts_batch,
            # CFG in batched mode doubles the model rows; enabled when the
            # config allows guidance (reference serves cfg_alpha per request,
            # main.rs:1045-1074).
            cfg_enabled=bool(mod.raw.get("cfg_enabled", False)),
            # int8-native voice-CA store: halves the CA KV (the buffer
            # gating batch >= 64 in 16 GiB HBM), perf-neutral at B=32.
            ca_quant=bool(mod.raw.get("ca_int8", False)),
            mesh=build_mesh_from_config(mod),
            # Fused multi-tick serving: K frames per dispatch via the
            # device script machine (sessions/tts_script.py) — amortises
            # host round-trips across K frames.
            fuse_ticks=int(mod.raw.get(
                "fuse_ticks", os.environ.get("DSM_TTS_FUSE", "1")
            )),
            # Dispatch-ahead (fused path): keep D-1 fused dispatches in
            # flight so the device step overlaps the previous fetch+post;
            # costs fuse*(D-1) frames of delivery latency.
            pipeline_depth=int(mod.raw.get(
                "pipeline_depth", os.environ.get("DSM_TTS_PIPELINE", "1")
            )),
            pcm_wire_int16={"int16": True, "f32": False,
                            "float32": False}.get(tts_wire),
        )
        engine.voices = resolver
        engine.condition_provider = cond_provider
        engine.default_condition = default_condition
        return engine
    engine = TtsEngine(
        tts_cfg, {"lm": lm_params}, mimi_cfg, mimi_params, tokenizer
    )
    engine.voices = resolver
    engine.condition_provider = cond_provider
    engine.default_condition = default_condition
    return engine


def build_mimi_rooms(mod: CFG.ModuleConfig):
    """Mimi codec-as-a-service rooms module (moshi-server/src/mimi.rs)."""
    from .mimi_rooms import MimiRoomsEngine

    import jax

    mimi_cfg = MIMI.v0_1(mod.n_q or 16)
    params, _ = _load_or_init_mimi(mod, mimi_cfg, jax.random.PRNGKey(0))
    return MimiRoomsEngine(cfg=mimi_cfg, params=params)


def build_duplex(mod: CFG.ModuleConfig):
    """Full-duplex dialogue module (moshi-server/src/lm.rs /api/lm-streaming)."""
    import jax
    import jax.numpy as jnp

    from ..sessions import lm_gen
    from .duplex import DuplexEngine

    lm_cfg = mod.lm or LM.moshi_v0_1_streaming(16)
    gen = mod.raw.get("generation", {})
    cfg = lm_gen.DuplexConfig(
        lm=lm_cfg,
        generated_audio_codebooks=gen.get("generated_audio_codebooks",
                                          lm_cfg.generated_codebooks or 8),
        input_audio_codebooks=gen.get("input_audio_codebooks", 8),
        acoustic_delay=gen.get("acoustic_delay", 2),
        text_start_token=lm_cfg.text_start_token,
    )
    mimi_cfg = MIMI.v0_1(cfg.input_audio_codebooks)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    key = jax.random.PRNGKey(0)
    lm_params, _ = _load_or_init_lm(mod, key, dtype)
    mimi_params, _ = _load_or_init_mimi(mod, mimi_cfg, jax.random.fold_in(key, 1))
    tok_path = (
        CFG.resolve_path(mod.text_tokenizer_file) if mod.text_tokenizer_file else None
    )
    batch = mod.raw.get("batch_size", 1)
    if batch and int(batch) > 1:
        # Continuous batching for dialogues (beyond the reference, which
        # serves one dialogue per model instance; lm.rs:77-318).
        from .duplex_batched import BatchedDuplexEngine

        return BatchedDuplexEngine(
            cfg, {"lm": lm_params, "mimi": mimi_params}, mimi_cfg,
            mimi_params, load_tokenizer(tok_path), batch_size=int(batch),
            # [modules.X.mesh] dp = N shards dialogues over a device mesh,
            # same TOML surface as the ASR/TTS modules.
            mesh=build_mesh_from_config(mod),
            # pipeline_depth = 2 overlaps the device step with the previous
            # tick's fetch (+1 frame delivery latency); default 1 keeps the
            # reference's lowest-latency loop.
            pipeline_depth=int(mod.raw.get(
                "pipeline_depth", os.environ.get("DSM_DUPLEX_PIPELINE", "1")
            )),
            # kv_bits = 4 packs the dialogue rings int4 — the HBM lever
            # for B > 24 at s2s-2b ctx-3000 shapes.  TOML kv_quant
            # overrides the backend default (quantised rings on
            # accelerators, bf16/f32 on CPU) — without it kv_bits would
            # silently no-op on CPU meshes.
            kv_quant=mod.raw.get("kv_quant"),
            kv_bits=int(mod.raw.get(
                "kv_bits", os.environ.get("DSM_KV_BITS", "8")
            )),
        )
    return DuplexEngine(
        cfg, {"lm": lm_params, "mimi": mimi_params}, mimi_cfg, mimi_params,
        load_tokenizer(tok_path),
    )
