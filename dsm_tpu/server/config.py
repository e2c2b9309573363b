"""Server configuration: reference-compatible TOML configs.

Parses the exact TOML schema of the reference server
(moshi-server/src/main.rs:94-211): top-level ``static_dir``/``log_dir``/
``instance_name``/``authorized_ids`` plus a ``[modules.<name>]`` table per
module with ``type`` in {Asr, BatchedAsr, Tts, Mimi, Lm} and nested
``model`` / ``model.transformer`` / ``model.depformer`` / ``model.extra_heads``
hyperparameter tables — e.g. configs/stt/config-stt-en_fr-hf.toml and
configs/tts/config-tts.toml load unchanged.

Artifact references support ``hf://org/repo/file`` and
``hf-snapshot://org/repo/glob`` with ``$ENV`` substitution
(moshi-server/src/utils.rs:44-186).  This build is offline: hf:// paths
resolve through a local cache directory (``DSM_HF_CACHE`` or
``~/.cache/huggingface``) and missing artifacts are reported, not fetched.
"""

from __future__ import annotations

import dataclasses
import glob as globlib
import os
import re
import tomllib
from typing import Any, Dict, List, Optional

from ..models import lm as LM
from ..ops import transformer as T


def expand_env(s: str) -> str:
    """$VAR substitution (utils.rs:44-51)."""
    return re.sub(r"\$([A-Za-z_][A-Za-z0-9_]*)", lambda m: os.environ.get(m.group(1), ""), s)


def resolve_path(spec: str, cache_dir: Optional[str] = None) -> Optional[str]:
    """Resolve a model-file reference to a local path.

    ``hf://org/repo/file`` -> ``<cache>/org/repo/file`` if present.
    ``hf-snapshot://org/repo/glob`` -> first match under the cache.
    Plain paths pass through env expansion.  Returns None when the artifact
    is not available locally (zero-egress environment).
    """
    spec = expand_env(spec)
    cache = cache_dir or os.environ.get(
        "DSM_HF_CACHE", os.path.expanduser("~/.cache/huggingface/dsm")
    )
    hub = os.environ.get(
        "HF_HUB_CACHE", os.path.expanduser("~/.cache/huggingface/hub")
    )
    if spec.startswith("hf://"):
        rel = spec[len("hf://"):]
        p = os.path.join(cache, rel)
        if os.path.exists(p):
            return p
        # Standard huggingface_hub snapshot layout too, so real checkpoints
        # are picked up the moment they land in the local cache
        # (hub/models--org--repo/snapshots/<rev>/<file>).
        parts = rel.split("/", 2)
        if len(parts) == 3:
            org, repo, fname = parts
            pat = os.path.join(
                hub, f"models--{org}--{repo}", "snapshots", "*", fname
            )
            matches = sorted(globlib.glob(pat))
            if matches:
                return matches[0]
        return _maybe_download(spec)
    if spec.startswith("hf-snapshot://"):
        rel = spec[len("hf-snapshot://"):]
        matches = sorted(globlib.glob(os.path.join(cache, rel), recursive=True))
        if matches:
            return matches[0]
        parts = rel.split("/", 2)
        if len(parts) == 3:
            org, repo, pattern = parts
            pat = os.path.join(
                hub, f"models--{org}--{repo}", "snapshots", "*", pattern
            )
            matches = sorted(globlib.glob(pat, recursive=True))
            if matches:
                return matches[0]
        return _maybe_download(spec)
    return spec if os.path.exists(spec) else None


def _maybe_download(spec: str) -> Optional[str]:
    """Network leg on local-cache miss (utils.rs resolve_or_download
    :53-186), gated off in zero-egress environments (DSM_HF_DOWNLOAD=1
    opens it)."""
    from . import hf_download

    if not hf_download.download_enabled():
        return None
    got = hf_download.resolve_or_download(spec)
    if got is None:
        return None
    # download_snapshot returns the snapshot DIRECTORY (the reference's
    # contract); the local-cache branch above returns the first matching
    # FILE.  Keep the two cache states consistent: re-glob the pattern
    # inside the fresh snapshot and hand back a file when the spec names
    # one (builder voice maps expect file paths).
    if spec.startswith("hf-snapshot://") and os.path.isdir(got):
        _, pattern = hf_download.split_snapshot_spec(
            spec[len("hf-snapshot://"):]
        )
        if pattern is not None:
            matches = sorted(
                globlib.glob(os.path.join(got, pattern), recursive=True)
            ) or sorted(
                globlib.glob(os.path.join(got, "**", pattern), recursive=True)
            )
            if matches:
                return matches[0]
    return got


def _norm_kind(v: str) -> str:
    return {"RmsNorm": "rms_norm", "LayerNorm": "layer_norm"}[v]


def _pe_kind(v: str) -> str:
    return {"Rope": "rope", "Sin": "sin", "None": "none"}[v.capitalize() if v else "None"]


def transformer_from_toml(
    t: Dict[str, Any], cross_attention: bool = False, ca_norm: Optional[str] = None
) -> T.TransformerConfig:
    return T.TransformerConfig(
        d_model=t["d_model"],
        num_heads=t["num_heads"],
        num_layers=t["num_layers"],
        dim_feedforward=t["dim_feedforward"],
        context=t["context"],
        gating=t.get("gating") is not None and t.get("gating") != "none",
        norm=_norm_kind(t.get("norm", "RmsNorm")),
        positional_embedding=_pe_kind(t.get("positional_embedding", "None")),
        max_period=float(t.get("max_period", 10_000)),
        bias_ff=t.get("bias_ff", False),
        bias_attn=t.get("bias_attn", False),
        head_dim=t.get("head_dim"),
        cross_attention=cross_attention,
        ca_norm=ca_norm,
        max_seq_len=t.get("max_seq_len", 4096),
    )


def lm_from_toml(m: Dict[str, Any], cross_attention: bool = False) -> LM.LmConfig:
    dep = None
    if "depformer" in m:
        d = m["depformer"]
        dep = LM.DepFormerConfig(
            transformer=transformer_from_toml(d["transformer"]),
            num_slices=d["num_slices"],
            low_rank_embeddings=d.get("low_rank_embeddings"),
        )
    extra = None
    if "extra_heads" in m:
        extra = (m["extra_heads"]["num_heads"], m["extra_heads"]["dim"])
    return LM.LmConfig(
        transformer=transformer_from_toml(
            m["transformer"],
            cross_attention=cross_attention,
            ca_norm="layer_norm" if cross_attention else None,
        ),
        depformer=dep,
        text_in_vocab_size=m["text_in_vocab_size"],
        text_out_vocab_size=m["text_out_vocab_size"],
        audio_vocab_size=m["audio_vocab_size"],
        audio_codebooks=m["audio_codebooks"],
        extra_heads=extra,
    )


@dataclasses.dataclass
class ModuleConfig:
    name: str
    type: str  # Asr | BatchedAsr | Tts | Mimi | Lm
    path: str
    raw: Dict[str, Any]
    lm: Optional[LM.LmConfig] = None
    lm_model_file: Optional[str] = None
    text_tokenizer_file: Optional[str] = None
    audio_tokenizer_file: Optional[str] = None
    speaker_tokenizer_file: Optional[str] = None
    asr_delay_in_tokens: int = 6
    batch_size: int = 8
    temperature: float = 0.0
    conditioning_delay: Optional[float] = None
    voice_dir: Optional[str] = None
    voices: Optional[Dict[str, str]] = None
    generation: Optional[Dict[str, Any]] = None
    n_q: Optional[int] = None
    dtype_override: Optional[str] = None


@dataclasses.dataclass
class Config:
    instance_name: str
    static_dir: Optional[str]
    log_dir: Optional[str]
    authorized_ids: List[str]
    modules: Dict[str, ModuleConfig]

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path, "rb") as f:
            raw = tomllib.load(f)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        modules: Dict[str, ModuleConfig] = {}
        for name, m in raw.get("modules", {}).items():
            typ = m["type"]
            lm_cfg = None
            if "model" in m:
                lm_cfg = lm_from_toml(m["model"], cross_attention=(typ == "Tts"))
            modules[name] = ModuleConfig(
                name=name,
                type=typ,
                path=m.get("path", f"/api/{name}"),
                raw=m,
                lm=lm_cfg,
                lm_model_file=m.get("lm_model_file"),
                text_tokenizer_file=m.get("text_tokenizer_file"),
                audio_tokenizer_file=m.get("audio_tokenizer_file"),
                speaker_tokenizer_file=m.get("speaker_tokenizer_file"),
                asr_delay_in_tokens=m.get("asr_delay_in_tokens", 6),
                batch_size=m.get("batch_size", 8),
                temperature=float(m.get("temperature", 0.0)),
                conditioning_delay=m.get("conditioning_delay"),
                voice_dir=m.get("voice_dir"),
                voices=m.get("voices"),
                generation=m.get("generation"),
                n_q=m.get("n_q"),
                dtype_override=m.get("dtype_override"),
            )
        return cls(
            instance_name=raw.get("instance_name", "dsm-tpu"),
            static_dir=raw.get("static_dir"),
            log_dir=raw.get("log_dir"),
            authorized_ids=raw.get("authorized_ids", []),
            modules=modules,
        )

    def validate(self) -> List[str]:
        """`moshi-server validate` equivalent: report problems, no throw."""
        problems = []
        for name, m in self.modules.items():
            if m.type not in ("Asr", "BatchedAsr", "Tts", "Mimi", "Lm"):
                problems.append(f"module {name}: unknown type {m.type}")
            if m.type in ("Asr", "BatchedAsr", "Tts") and m.lm is None:
                problems.append(f"module {name}: missing [modules.{name}.model]")
            for label, spec in (
                ("lm_model_file", m.lm_model_file),
                ("audio_tokenizer_file", m.audio_tokenizer_file),
                ("text_tokenizer_file", m.text_tokenizer_file),
            ):
                if spec and resolve_path(spec) is None:
                    problems.append(
                        f"module {name}: {label} {spec!r} not available locally"
                    )
        return problems
