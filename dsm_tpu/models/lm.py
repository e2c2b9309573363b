"""Delayed-streams LM: temporal transformer + DepFormer, TPU-native.

Reference: moshi-core/src/lm.rs.  The model consumes one frame per step —
a text token plus one token per audio codebook, all embedded and summed —
through a streaming temporal transformer, producing text logits and a hidden
vector; the DepFormer then emits the audio codebooks for the frame, one
sequential "slice" per codebook.

TPU-first redesigns vs the reference:
  * The temporal transformer is the scan-over-stacked-layers streaming
    transformer from ops/transformer.py with ring KV caches — the whole LM
    step jits to one program, batched over all streams.
  * The DepFormer's num_slices sequential micro-steps are a ``lax.scan`` over
    stacked per-slice weights; the reference instead copies KV state between
    per-slice transformer objects (lm.rs:651-657 "copy_state") — carrying the
    KV cache through the scan is the same semantics with zero copies.
  * "Absent" token inputs (reference ``Option<Tensor>`` per codebook,
    lm.rs:990-995) are the sentinel ``-1``: their embedding contribution is
    masked to zero, keeping shapes static.
  * Sampling is batched Gumbel-argmax on device (no host loop over slots).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import mlp as mlp_mod
from ..ops import sampling as S
from ..ops import transformer as T


@dataclasses.dataclass(frozen=True)
class DepFormerConfig:
    transformer: T.TransformerConfig
    num_slices: int
    low_rank_embeddings: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class LmConfig:
    transformer: T.TransformerConfig
    depformer: Optional[DepFormerConfig]
    text_in_vocab_size: int
    text_out_vocab_size: int
    audio_vocab_size: int
    audio_codebooks: int
    extra_heads: Optional[Tuple[int, int]] = None  # (num_heads, dim)

    @property
    def audio_pad_token(self) -> int:
        return self.audio_vocab_size - 1

    @property
    def text_start_token(self) -> int:
        return self.text_in_vocab_size - 1

    @property
    def generated_codebooks(self) -> int:
        return self.depformer.num_slices if self.depformer else 0

    @property
    def d_model(self) -> int:
        return self.transformer.d_model


# ---------------------------------------------------------------------------
# Config presets (lm.rs:84-460; hyperparameters, not code)
# ---------------------------------------------------------------------------


def _tf(d, heads, layers, ff, context, max_period=10_000.0, norm="rms_norm",
        gating=True, pe="rope", ca=False, ca_norm=None, ca_dim=None,
        head_dim=None, layer_scale=None, max_seq_len=4096):
    return T.TransformerConfig(
        d_model=d, num_heads=heads, num_layers=layers, dim_feedforward=ff,
        context=context, gating=gating, norm=norm, positional_embedding=pe,
        max_period=max_period, cross_attention=ca, ca_norm=ca_norm, ca_dim=ca_dim,
        head_dim=head_dim, layer_scale=layer_scale, max_seq_len=max_seq_len,
    )


def _depformer(num_slices, d=1024, heads=16, layers=6, ff=None,
               low_rank=None, head_dim=None):
    return DepFormerConfig(
        transformer=_tf(
            d, heads, layers, ff or 4 * d, context=num_slices,
            pe="none", norm="rms_norm", gating=True, head_dim=head_dim,
        ),
        num_slices=num_slices,
        low_rank_embeddings=low_rank,
    )


def stt_1b_en_fr() -> LmConfig:
    """kyutai/stt-1b-en_fr (configs/stt/config-stt-en_fr-hf.toml:27-56)."""
    return LmConfig(
        transformer=_tf(2048, 16, 16, 8192, context=750, max_period=100_000.0),
        depformer=None,
        text_in_vocab_size=8001,
        text_out_vocab_size=8000,
        audio_vocab_size=2049,
        audio_codebooks=32,
        extra_heads=(4, 6),  # semantic VAD
    )


def stt_2_6b_en() -> LmConfig:
    """kyutai/stt-2.6b-en (configs/stt/config-stt-en-hf.toml)."""
    return LmConfig(
        transformer=_tf(2048, 32, 48, 8192, context=375, max_period=100_000.0),
        depformer=None,
        text_in_vocab_size=4001,
        text_out_vocab_size=4000,
        audio_vocab_size=2049,
        audio_codebooks=32,
    )


def asr_300m_202501() -> LmConfig:
    """lm.rs:336-374."""
    return LmConfig(
        transformer=_tf(1024, 8, 16, 4096, context=750, max_period=100_000.0),
        depformer=None,
        text_in_vocab_size=48001,
        text_out_vocab_size=48000,
        audio_vocab_size=2049,
        audio_codebooks=32,
    )


def asr_v0_1_1b() -> LmConfig:
    """lm.rs:296-334."""
    return LmConfig(
        transformer=_tf(2048, 16, 16, 8192, context=750, max_period=100_000.0),
        depformer=None,
        text_in_vocab_size=48001,
        text_out_vocab_size=48000,
        audio_vocab_size=2049,
        audio_codebooks=8,
    )


def tts_v0_1() -> LmConfig:
    """Legacy T5-conditioned TTS 7B-family config (lm.rs:199-241): GELU MLP
    (no gating), LayerNorm, cross-attention, 16 codebooks, audio vocab 2050
    (2048 bins + end-of-gen + pad)."""
    return LmConfig(
        transformer=_tf(
            2048, 32, 48, 8192, context=4096, norm="layer_norm", gating=False,
            ca=True, ca_norm="layer_norm",
        ),
        depformer=_depformer(16),
        text_in_vocab_size=32001,
        text_out_vocab_size=32001,
        audio_vocab_size=2050,
        audio_codebooks=16,
    )


def tts_1_6b_en_fr() -> LmConfig:
    """kyutai/tts-1.6b-en_fr (configs/tts/config-tts.toml:34-88).

    Cross-attention (voice conditioning) uses LayerNorm for norm_cross while
    the blocks use RmsNorm (lm.rs tts_202501 :377-419 passes
    (Normal, LayerNorm, None)).
    """
    return LmConfig(
        transformer=_tf(
            2048, 16, 16, 8192, context=1024, max_period=100_000.0,
            ca=True, ca_norm="layer_norm",
        ),
        depformer=_depformer(
            32, d=1024, heads=11, layers=4, ff=3072, low_rank=128, head_dim=None
        ),
        text_in_vocab_size=8001,
        text_out_vocab_size=8000,
        audio_vocab_size=2049,
        audio_codebooks=32,
    )


def tts_202501() -> LmConfig:
    """lm.rs:377-419 (48-layer TTS)."""
    return LmConfig(
        transformer=_tf(
            2048, 32, 48, 8192, context=500, ca=True, ca_norm="layer_norm"
        ),
        depformer=_depformer(32),
        text_in_vocab_size=8001,
        text_out_vocab_size=8000,
        audio_vocab_size=2049,
        audio_codebooks=32,
    )


def moshi_v0_1() -> LmConfig:
    """Moshi 7B (lm.rs:84-122)."""
    return LmConfig(
        transformer=_tf(4096, 32, 32, 16384, context=3000),
        depformer=_depformer(8),
        text_in_vocab_size=32001,
        text_out_vocab_size=32000,
        audio_vocab_size=2049,
        audio_codebooks=8,
    )


def moshi_v0_1_streaming(num_slices: int = 16) -> LmConfig:
    cfg = moshi_v0_1()
    return dataclasses.replace(
        cfg, audio_codebooks=16, depformer=_depformer(num_slices)
    )


def s2s_2b_16rvq_202501() -> LmConfig:
    """lm.rs:422-460."""
    return LmConfig(
        transformer=_tf(2560, 20, 24, 10240, context=3000, max_period=100_000.0),
        depformer=_depformer(16),
        text_in_vocab_size=48001,
        text_out_vocab_size=48000,
        audio_vocab_size=2049,
        audio_codebooks=32,
    )


# ---------------------------------------------------------------------------
# Params / state
# ---------------------------------------------------------------------------


def _emb_init(key, vocab, dim, dtype):
    return jax.random.normal(key, (vocab, dim), dtype) * 0.02


def init(cfg: LmConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    d = cfg.d_model
    from ..ops import norm as norm_mod

    params = {
        "text_emb": _emb_init(keys[0], cfg.text_in_vocab_size, d, dtype),
        "audio_embs": _emb_init(
            keys[1], cfg.audio_codebooks * cfg.audio_vocab_size, d, dtype
        ).reshape(cfg.audio_codebooks, cfg.audio_vocab_size, d),
        "transformer": T.init(cfg.transformer, keys[2], dtype),
        "out_norm": norm_mod.norm_init(cfg.transformer.norm, d, dtype),
        "text_linear": _emb_init(keys[3], cfg.text_out_vocab_size, d, dtype),
    }
    if cfg.extra_heads is not None:
        n, hd = cfg.extra_heads
        params["extra_heads"] = _emb_init(keys[4], n * hd, d, dtype).reshape(n, hd, d)
    if cfg.depformer is not None:
        params["depformer"] = depformer_init(cfg, keys[5], dtype)
    return params


def depformer_init(cfg: LmConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    dep = cfg.depformer
    dcfg = dep.transformer
    s = dep.num_slices
    d_dep = dcfg.d_model
    emb_dim = dep.low_rank_embeddings or d_dep
    keys = jax.random.split(key, 6)

    slice_keys = jax.random.split(keys[0], s)
    params = {
        # per-slice transformers, stacked: leaves (S, L, ...)
        "transformer": jax.vmap(lambda k: T.init(dcfg, k, dtype))(slice_keys),
        "linear_in": jax.vmap(
            lambda k: _emb_init(k, d_dep, cfg.d_model, dtype)
        )(jax.random.split(keys[1], s)),
        "linear_out": jax.vmap(
            # Depformer cannot emit the audio pad token (lm.rs:626).
            lambda k: _emb_init(k, cfg.audio_vocab_size - 1, d_dep, dtype)
        )(jax.random.split(keys[2], s)),
        # Slice 0 embeds the text token; slices 1.. embed the previous
        # codebook's audio token (lm.rs:506-510).
        "text_emb": _emb_init(keys[3], cfg.text_in_vocab_size, emb_dim, dtype),
        "audio_embs": jax.vmap(
            lambda k: _emb_init(k, cfg.audio_vocab_size, emb_dim, dtype)
        )(jax.random.split(keys[4], s - 1)),
    }
    if dep.low_rank_embeddings is not None:
        lr = dep.low_rank_embeddings
        params["low_rank"] = jax.vmap(lambda k: _emb_init(k, d_dep, lr, dtype))(
            jax.random.split(keys[5], s)
        )
    return params


def init_state(
    cfg: LmConfig, batch: int, cache_dtype=jnp.bfloat16, kv_quant: bool = False,
    kv_bits: int = 8
) -> dict:
    return {
        "t": T.init_state(cfg.transformer, batch, cache_dtype,
                          kv_quant=kv_quant, kv_bits=kv_bits)
    }


def reset_state(state: dict, reset_mask) -> dict:
    """Per-slot reset at zero HBM cost (lm.rs reset_batch_idx :1108-1110)."""
    return {"t": T.reset_state(state["t"], reset_mask)}


# ---------------------------------------------------------------------------
# Forward step
# ---------------------------------------------------------------------------


def _masked_embed(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Embedding lookup where id == -1 contributes zeros (Option::None)."""
    safe = jnp.maximum(ids, 0)
    emb = table[safe]
    return jnp.where((ids >= 0)[..., None], emb, 0.0)


def embed_inputs(
    cfg: LmConfig,
    params: dict,
    text_ids: jax.Array,
    audio_ids: jax.Array,
    condition: Optional[jax.Array] = None,
) -> jax.Array:
    """Sum text + per-codebook audio embeddings -> (B, 1, D).

    ``text_ids (B,)``, ``audio_ids (B, K)`` with -1 = absent.
    """
    emb = _masked_embed(params["text_emb"], text_ids)  # (B, D)
    k_in = cfg.audio_codebooks
    # One gather over the stacked codebook tables.
    audio = jax.vmap(_masked_embed, in_axes=(0, 1), out_axes=1)(
        params["audio_embs"][:k_in], audio_ids
    )  # (B, K, D)
    emb = emb + jnp.sum(audio, axis=1)
    if condition is not None:
        emb = emb + condition
    return emb[:, None, :]


def step(
    cfg: LmConfig,
    params: dict,
    state: dict,
    text_ids: jax.Array,
    audio_ids: jax.Array,
    mask: Optional[jax.Array] = None,
    condition: Optional[jax.Array] = None,
    ca_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """One LM frame step.

    Returns ``(text_logits (B, V_out), hidden (B, D), state')`` — the hidden
    is the post-out_norm transformer output fed to the DepFormer and the
    extra heads, mirroring lm.rs:957-1008 forward_cond / :1018-1071 forward_ca.
    """
    emb = embed_inputs(cfg, params, text_ids, audio_ids, condition)
    ys, t_state = T.step(
        cfg.transformer, params["transformer"], state["t"], emb, mask, ca_kv=ca_kv
    )
    from ..ops import norm as norm_mod

    ys = norm_mod.apply_norm(cfg.transformer.norm, params["out_norm"], ys)
    hidden = ys[:, 0, :]
    text_logits = T.mm(hidden, params["text_linear"], site="text_linear")
    return text_logits, hidden, {"t": t_state}


def extra_heads_probs(cfg: LmConfig, params: dict, hidden: jax.Array) -> jax.Array:
    """Semantic-VAD head probabilities: softmax over each head's dim, first
    component (asr.rs:195-206).  Returns (B, num_heads)."""
    w = params["extra_heads"]  # (n, hd, D)
    logits = jnp.einsum("bd,nhd->bnh", hidden.astype(jnp.float32), w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    return probs[..., 0]


# ---------------------------------------------------------------------------
# DepFormer sampling (lm.rs:640-732)
# ---------------------------------------------------------------------------


def _tree_index(tree, i: int):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def _dep_lean_enabled() -> bool:
    """The lean DepFormer path (T.micro_step + hoisted linear_in) is the
    default; ``DSM_DEP_LEAN=0`` falls back to the generic ring-cache path
    (same semantics, measured ~2x slower per TTS frame at batch 32)."""
    import os

    return os.environ.get("DSM_DEP_LEAN", "1") not in ("0", "false", "")


def _dep_unroll() -> int:
    """Slice-scan unroll factor (scheduling only; semantics invariant —
    test_depformer_lean_unroll_invariant).  Default 1: an unroll=4 trace
    at flagship TTS shapes blew the trace/compile budget (>45 min on this
    host without completing) while the scan body is weight-read-bound, so
    XLA's double-buffered scanned-weight loads already overlap; treat
    unroll as an opt-in experiment, not a default."""
    import os

    try:
        return max(1, int(os.environ.get("DSM_DEP_UNROLL", "1")))
    except ValueError:
        return 1


def _mm_all_slices(hidden: jax.Array, w) -> jax.Array:
    """``hidden (B, D) @ linear_in_s.T`` for every slice in ONE einsum ->
    ``(S, B, d_dep)``.  The per-slice input projections do not depend on
    sampled tokens, so hoisting them out of the sequential slice chain
    replaces S serial (B,D)x(D,d) matmuls with one MXU-sized
    (B,D)x(D,S*d) — numerics identical to per-slice T.mm."""
    if isinstance(w, dict) and "q" in w:
        y = jnp.einsum("bi,soi->sbo", hidden, w["q"].astype(hidden.dtype))
        return y * w["s"].astype(hidden.dtype)[:, None, :]
    return jnp.einsum("bi,soi->sbo", hidden, w.astype(hidden.dtype))


def _dep_embed(dep_params, slice_params, token, low_rank_w):
    emb = slice_params[token]
    if low_rank_w is not None:
        emb = T.mm(emb, low_rank_w, site="low_rank")
    return emb


def depformer_sample(
    cfg: LmConfig,
    params: dict,
    hidden: jax.Array,
    text_token: jax.Array,
    forced_next: jax.Array,
    key: jax.Array,
    samp: S.SamplingConfig,
    cfg_alpha=None,
    temperature: Optional[jax.Array] = None,
    slot_keys: Optional[jax.Array] = None,
) -> jax.Array:
    """Sample all audio codebooks for the current frame.

    ``hidden (B, D)`` is the temporal transformer output; ``text_token (B,)``
    the frame's sampled/forced text token; ``forced_next`` — ``(S,)`` or
    per-slot ``(B, S)`` — overrides the token fed to the *next* slice
    (-1 = use the sample), the ForcedAudioTokens mechanism that
    teacher-forces audio pads during the acoustic delay (lm.rs:1196-1221).

    With ``cfg_alpha`` set (static float or traced per-slot (B/2,) array),
    rows are [cond..., uncond...] halves and logits combine as
    a*cond - (a-1)*uncond (lm.rs:687-732); every row then receives the same
    sampled token.  ``slot_keys (B',2)`` (B' = cond rows) switches sampling
    to independent per-slot PRNG streams (per-request seeds).

    Returns ``tokens (B, S)`` int32.
    """
    dp = params["depformer"]
    dep = cfg.depformer
    dcfg = dep.transformer
    b = hidden.shape[0]
    n_slices = dep.num_slices
    forced_next = jnp.asarray(forced_next)
    if forced_next.ndim == 1:
        forced_next = jnp.broadcast_to(forced_next[None, :], (b, n_slices))

    lean = _dep_lean_enabled()
    if lean:
        kv = T.micro_init(dcfg, b, n_slices, hidden.dtype)
        # All slices' input projections of the (fixed) temporal hidden in
        # one batched matmul, outside the sequential chain.
        x_base = _mm_all_slices(hidden, dp["linear_in"]).astype(hidden.dtype)
    else:
        kv = T.init_state(dcfg, b, cache_dtype=hidden.dtype)
    if slot_keys is not None:
        # (n_slices, B', 2): per-slot streams, draw index = slice index.
        keys = jnp.stack(
            [S.fold_keys(slot_keys, 100 + i) for i in range(n_slices)]
        )
    else:
        keys = jax.random.split(key, n_slices)
    n_draw = b // 2 if cfg_alpha is not None else b

    def slice_logits(i_params, kv, x_in, idx):
        if lean:
            h, kv = T.micro_step(dcfg, i_params["transformer"], kv, x_in, idx)
            logits = T.mm(h, i_params["linear_out"], site="dep_out")
        else:
            h, kv = T.step(dcfg, i_params["transformer"], kv, x_in[:, None, :])
            logits = T.mm(h[:, 0], i_params["linear_out"], site="dep_out")
        return logits, kv

    def _draw(logits, k):
        # Per-slot keyed streams, traced per-slot temperature, or static cfg.
        if slot_keys is not None:
            t = (
                temperature[:n_draw]
                if temperature is not None
                else jnp.full((n_draw,), samp.temperature, jnp.float32)
            )
            return S.sample_per_slot(logits, k, t, samp.top_k)
        if temperature is not None:
            return S.sample_dynamic(logits, k, temperature[:n_draw], samp.top_k)
        return S.sample(samp, logits, k)

    def combine_and_sample(logits, k):
        if cfg_alpha is not None:
            half = b // 2
            a = jnp.asarray(cfg_alpha, jnp.float32)
            if a.ndim == 1:
                a = a[:, None]
            lc = logits[:half].astype(jnp.float32)
            lu = logits[half:].astype(jnp.float32)
            mixed = a * lc - (a - 1.0) * lu
            tok = _draw(mixed, k)
            return jnp.concatenate([tok, tok], axis=0)
        return _draw(logits, k)

    # Slice 0: text-token embedding, own weights (unrolled: different vocab).
    p0 = _tree_index(
        {
            "transformer": dp["transformer"],
            "linear_in": dp["linear_in"],
            "linear_out": dp["linear_out"],
        },
        0,
    )
    lr0 = _tree_index(dp["low_rank"], 0) if "low_rank" in dp else None
    x0_base = x_base[0] if lean else T.mm(hidden, p0["linear_in"], site="dep_in")
    x0 = x0_base + _dep_embed(
        dp, dp["text_emb"], text_token, lr0
    ).astype(hidden.dtype)
    logits0, kv = slice_logits(p0, kv, x0, jnp.int32(0))
    tok0 = combine_and_sample(logits0, keys[0])
    last0 = jnp.where(forced_next[:, 0] >= 0, forced_next[:, 0], tok0)

    if n_slices == 1:
        return tok0[:, None]

    tail = lambda t: jax.tree_util.tree_map(lambda a: a[1:], t)  # noqa: E731
    rest = {
        "transformer": tail(dp["transformer"]),
        # tree_map: weight-only int8 leaves are {"q", "s"} dicts.
        "linear_out": tail(dp["linear_out"]),
        "emb": dp["audio_embs"],
    }
    if lean:
        rest["x_base"] = x_base[1:]
    else:
        rest["linear_in"] = tail(dp["linear_in"])
    if "low_rank" in dp:
        rest["low_rank"] = tail(dp["low_rank"])

    def body(carry, xs):
        kv, last, idx = carry
        sp, forced_i, k_i = xs
        lr = sp.get("low_rank")
        base = sp["x_base"] if lean else T.mm(hidden, sp["linear_in"], site="dep_in")
        x = base + _dep_embed(dp, sp["emb"], last, lr).astype(hidden.dtype)
        logits, kv = slice_logits(sp, kv, x, idx)
        tok = combine_and_sample(logits, k_i)
        nxt = jnp.where(forced_i >= 0, forced_i, tok)
        return (kv, nxt, idx + 1), tok

    (_, _, _), toks = jax.lax.scan(
        body, (kv, last0, jnp.int32(1)),
        (rest, forced_next[:, 1:].T, keys[1:]),
        unroll=_dep_unroll() if lean else 1,
    )
    return jnp.concatenate([tok0[:, None], toks.T.astype(jnp.int32)], axis=1)


def forced_audio_tokens(cfg: LmConfig, step_idx_lt_delay: bool) -> jax.Array:
    """ForcedAudioTokens.forced_tokens as a static (S,) array (lm.rs:1196-1221)."""
    s = cfg.generated_codebooks
    if not step_idx_lt_delay:
        return jnp.full((s,), -1, jnp.int32)
    toks = [-1] + [cfg.audio_pad_token] * (s - 1)
    return jnp.array(toks, jnp.int32)
