"""Checkpoint loading: reference safetensors layouts -> dsm_tpu param trees.

Key layouts follow the reference loaders exactly (the VarBuilder paths in
moshi-core):
  * Mimi codec (mimi.rs:249-276 load; seanet.rs / conv.rs / transformer.rs /
    quantization.rs path structure):
      encoder.model.{i}.conv.conv.{weight|weight_g+weight_v,bias}
      decoder.model.{i}.convtr.convtr.{weight|weight_g+weight_v,bias}
      {en,de}coder_transformer.transformer.layers.{l}.{self_attn.in_proj_weight,
          self_attn.out_proj.weight, norm1.{alpha,bias}, norm2.{alpha,bias},
          linear1.weight, linear2.weight, layer_scale_1.scale, ...}
      downsample.conv.conv.conv.weight / upsample.convtr.convtr.convtr.weight
      quantizer.rvq_{first,rest}.{input_proj,output_proj}.weight and
      .vq.layers.{q}._codebook.{embedding_sum,cluster_usage}
  * LM (lm.rs:812-897 + DepFormerSlice fallback chains :529-580):
      text_emb.weight, emb.{k}.weight, out_norm.alpha, text_linear.weight,
      transformer.layers.{l}..., extra_heads.{i}.weight,
      depformer: per-slice or shared-with-root fallbacks
      (depformer_text_emb / depformer_emb.{k} / depformer_in.{j} /
      linears.{k} / depformer.layers...).

Weight-norm tensors are re-materialised at load like conv.rs:27-45
(weight = g * v / ||v||_{in,k}).

Everything returns numpy/jnp trees matching models/{mimi,lm}.init exactly
(shape-checked), so random-init and loaded models are interchangeable.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..models import lm as LM
from ..models import mimi as MIMI
from ..ops import mlp as mlp_mod


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def load_tensors(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint: safetensors or GGUF by extension.

    The reference dispatches the same way (moshi-core/src/lm.rs:1113-1124):
    ``.gguf`` goes through the quantized loader (released q8 checkpoints,
    same tensor names), anything else is mmap'd safetensors.  GGUF quantized
    tensors dequantise here; the serving profile re-quantises weight-only
    int8 in the TPU-friendly per-output-channel layout afterwards.
    """
    if str(path).endswith(".gguf"):
        from . import gguf

        return gguf.read_gguf(path)[1]
    return load_safetensors(path)


# ---------------------------------------------------------------------------
# Native checkpoints: our param trees flattened to path-keyed safetensors
# (training/finetuning output; distinct from the reference-layout loaders)
# ---------------------------------------------------------------------------


def save_native(path: str, tree) -> None:
    import jax
    from safetensors.numpy import save_file

    flat = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(p)
        flat[key] = np.asarray(leaf)
    save_file(flat, path)


def load_native(path: str, like_tree):
    """Load a native checkpoint back into the structure of ``like_tree``."""
    import jax
    from safetensors.numpy import load_file

    flat = load_file(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(like_tree)
    leaves = []
    for p, like in leaves_paths:
        key = jax.tree_util.keystr(p)
        if key not in flat:
            raise KeyError(f"native checkpoint missing {key}")
        leaves.append(np.asarray(flat[key]).astype(like.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


class KeyResolver:
    def __init__(self, tensors: Dict[str, np.ndarray]):
        self.t = tensors
        self.used = set()
        self.missing: List[str] = []

    def has(self, key: str) -> bool:
        return key in self.t

    def get(self, *candidates: str, shape=None) -> Optional[np.ndarray]:
        for k in candidates:
            if k in self.t:
                self.used.add(k)
                v = np.asarray(self.t[k], np.float32)
                if shape is not None and tuple(v.shape) != tuple(shape):
                    raise ValueError(
                        f"{k}: shape {v.shape} != expected {tuple(shape)}"
                    )
                return v
        self.missing.append(candidates[0])
        return None

    def conv_weight(self, prefix: str, shape=None) -> Optional[np.ndarray]:
        """Plain or weight-norm conv weight (conv.rs:27-45)."""
        if f"{prefix}.weight" in self.t:
            return self.get(f"{prefix}.weight", shape=shape)
        if f"{prefix}.weight_v" in self.t:
            g = self.get(f"{prefix}.weight_g")
            v = self.get(f"{prefix}.weight_v", shape=shape)
            norm = np.sqrt(np.sum(v * v, axis=(1, 2), keepdims=True))
            return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)
        self.missing.append(f"{prefix}.weight")
        return None

    def unused_keys(self) -> List[str]:
        return sorted(set(self.t) - self.used)


def _maybe(dst: dict, key: str, val) -> None:
    if val is not None:
        dst[key] = val


# ---------------------------------------------------------------------------
# Transformer layers
# ---------------------------------------------------------------------------


def _norm_params(r: KeyResolver, prefix: str, kind: str, d: int) -> dict:
    if kind == "rms_norm":
        alpha = r.get(f"{prefix}.alpha", f"{prefix}.weight")
        if alpha is not None:
            alpha = alpha.reshape(d)
        return {"alpha": alpha}
    alpha = r.get(f"{prefix}.alpha", f"{prefix}.weight")
    bias = r.get(f"{prefix}.bias")
    return {
        "alpha": alpha.reshape(d) if alpha is not None else None,
        "bias": bias,
    }


def transformer_layers_params(
    r: KeyResolver, prefix: str, cfg, n_layers: Optional[int] = None
) -> dict:
    """Load + stack transformer layers into our (L, ...) layout."""
    import jax.numpy as jnp

    n_layers = n_layers or cfg.num_layers
    d = cfg.d_model
    stacked: Dict[str, list] = {}

    def push(path: str, val):
        stacked.setdefault(path, []).append(val)

    for l in range(n_layers):
        p = f"{prefix}.layers.{l}"
        push("in_proj_w", r.get(f"{p}.self_attn.in_proj_weight",
                                f"{p}.self_attn.in_proj.weight"))
        push("out_proj_w", r.get(f"{p}.self_attn.out_proj.weight"))
        for nm in ("norm1", "norm2"):
            val = _norm_params(r, f"{p}.{nm}", cfg.norm, d)
            for k2, v2 in val.items():
                push(f"{nm}/{k2}", v2)
        if cfg.gating:
            gp = f"{p}.gating"
            push("mlp/linear_in", r.get(f"{gp}.linear_in.weight",
                                        f"{gp}.0.linear_in.weight"))
            push("mlp/linear_out", r.get(f"{gp}.linear_out.weight",
                                         f"{gp}.0.linear_out.weight"))
        else:
            push("mlp/linear1", r.get(f"{p}.linear1.weight"))
            push("mlp/linear2", r.get(f"{p}.linear2.weight"))
        if cfg.layer_scale is not None:
            push("layer_scale_1", r.get(f"{p}.layer_scale_1.scale"))
            push("layer_scale_2", r.get(f"{p}.layer_scale_2.scale"))
        if cfg.cross_attention:
            cp = f"{p}.cross_attention"
            push("ca_q_w", r.get(f"{cp}.in_proj_weight_q"))
            push("ca_kv_w", r.get(f"{cp}.in_proj_weight_kv"))
            push("ca_out_w", r.get(f"{cp}.out_proj.weight"))
            ncr = _norm_params(
                r, f"{p}.norm_cross", cfg.ca_norm or cfg.norm, d
            )
            for k2, v2 in ncr.items():
                push(f"norm_cross/{k2}", v2)

    out: dict = {}
    for path, vals in stacked.items():
        if any(v is None for v in vals):
            continue
        arr = jnp.asarray(np.stack(vals))
        cur = out
        parts = path.split("/")
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        cur[parts[-1]] = arr
    return out


# ---------------------------------------------------------------------------
# Mimi
# ---------------------------------------------------------------------------


def _seanet_enc_indices(cfg: MIMI.SeaNetConfig):
    """Sequential module indices (seanet.rs:168-253 layer_idx walk, which
    skips the activation slots of the original torch Sequential)."""
    idx = 0
    init_idx = idx
    idx += 1
    stages = []
    for _ratio in reversed(cfg.ratios):
        res = []
        for _j in range(cfg.n_residual_layers):
            res.append(idx)
            idx += 1
        down = idx + 1
        idx += 2
        stages.append((res, down))
    final_idx = idx + 1
    return init_idx, stages, final_idx


def _seanet_dec_indices(cfg: MIMI.SeaNetConfig):
    """Decoder walk (seanet.rs:321-399): upsample first, then residuals."""
    idx = 0
    init_idx = idx
    idx += 1
    stages = []
    for _ratio in cfg.ratios:
        up = idx + 1
        idx += 2
        res = []
        for _j in range(cfg.n_residual_layers):
            res.append(idx)
            idx += 1
        stages.append((up, res))
    final_idx = idx + 1
    return init_idx, stages, final_idx


def _conv_p(r: KeyResolver, prefix: str) -> dict:
    out = {}
    _maybe(out, "w", r.conv_weight(f"{prefix}.conv.conv"))
    _maybe(out, "b", r.get(f"{prefix}.conv.conv.bias"))
    return out


def _convtr_p(r: KeyResolver, prefix: str) -> dict:
    out = {}
    _maybe(out, "w", r.conv_weight(f"{prefix}.convtr.convtr"))
    _maybe(out, "b", r.get(f"{prefix}.convtr.convtr.bias"))
    return out


def _resblock_p(r: KeyResolver, prefix: str) -> dict:
    return {
        "b1": _conv_p(r, f"{prefix}.block.1"),
        "b2": _conv_p(r, f"{prefix}.block.3"),
    }


def _rvq_p(r: KeyResolver, prefix: str, n_q: int) -> dict:
    embeds = []
    for q in range(n_q):
        cb = f"{prefix}.vq.layers.{q}._codebook"
        es = r.get(f"{cb}.embedding_sum", f"{cb}.embed_sum")
        usage = r.get(f"{cb}.cluster_usage", f"{cb}.cluster_size")
        if es is None or usage is None:
            embeds.append(None)
            continue
        # embedding = embedding_sum / max(cluster_usage, eps)
        # (quantization.rs:85-107)
        embeds.append(es / np.maximum(usage, 1e-5)[:, None])
    out = {}
    if all(e is not None for e in embeds):
        out["embed"] = np.stack(embeds)
    ip = r.get(f"{prefix}.input_proj.weight")
    op = r.get(f"{prefix}.output_proj.weight")
    # candle stores 1x1 conv weights (out, in, 1).
    if ip is not None:
        out["input_proj"] = ip[:, :, 0] if ip.ndim == 3 else ip
    if op is not None:
        out["output_proj"] = op[:, :, 0] if op.ndim == 3 else op
    return out


def build_mimi_params(cfg: MIMI.MimiConfig, tensors: Dict[str, np.ndarray]):
    import jax

    r = KeyResolver(tensors)
    sn = cfg.seanet

    init_i, enc_stages, final_i = _seanet_enc_indices(sn)
    encoder = {
        "init": _conv_p(r, f"encoder.model.{init_i}"),
        "layers": [
            {
                "res": [_resblock_p(r, f"encoder.model.{ri}") for ri in res],
                "down": _conv_p(r, f"encoder.model.{di}"),
            }
            for res, di in enc_stages
        ],
        "final": _conv_p(r, f"encoder.model.{final_i}"),
    }
    init_i, dec_stages, final_i = _seanet_dec_indices(sn)
    decoder = {
        "init": _conv_p(r, f"decoder.model.{init_i}"),
        "layers": [
            {
                "up": _convtr_p(r, f"decoder.model.{ui}"),
                "res": [_resblock_p(r, f"decoder.model.{ri}") for ri in res],
            }
            for ui, res in dec_stages
        ],
        "final": _conv_p(r, f"decoder.model.{final_i}"),
    }

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "encoder_transformer": transformer_layers_params(
            r, "encoder_transformer.transformer", cfg.transformer
        ),
        "decoder_transformer": transformer_layers_params(
            r, "decoder_transformer.transformer", cfg.transformer
        ),
        "downsample": {"w": r.conv_weight("downsample.conv.conv.conv")},
        "upsample": {"w": r.conv_weight("upsample.convtr.convtr.convtr")},
        "quantizer": {
            "rvq_first": _rvq_p(r, "quantizer.rvq_first", 1),
            "rvq_rest": _rvq_p(r, "quantizer.rvq_rest", cfg.n_q - 1),
        },
    }
    if r.missing:
        raise KeyError(f"mimi checkpoint missing {len(r.missing)} keys, "
                       f"e.g. {r.missing[:8]}")
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), params)


# ---------------------------------------------------------------------------
# LM
# ---------------------------------------------------------------------------


def build_lm_params(cfg: LM.LmConfig, tensors: Dict[str, np.ndarray], dtype=None):
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    r = KeyResolver(tensors)
    d = cfg.d_model

    params = {
        "text_emb": r.get("text_emb.weight", shape=(cfg.text_in_vocab_size, d)),
        "audio_embs": np.stack(
            [
                r.get(f"emb.{k}.weight", shape=(cfg.audio_vocab_size, d))
                for k in range(cfg.audio_codebooks)
            ]
        ),
        "transformer": transformer_layers_params(r, "transformer", cfg.transformer),
        "out_norm": _norm_params(r, "out_norm", cfg.transformer.norm, d),
        "text_linear": r.get("text_linear.weight", shape=(cfg.text_out_vocab_size, d)),
    }
    if cfg.extra_heads is not None:
        n, hd = cfg.extra_heads
        params["extra_heads"] = np.stack(
            [r.get(f"extra_heads.{i}.weight", shape=(hd, d)) for i in range(n)]
        )
    if cfg.depformer is not None:
        params["depformer"] = _depformer_params(r, cfg)
    if r.missing:
        raise KeyError(f"lm checkpoint missing {len(r.missing)} keys, "
                       f"e.g. {r.missing[:8]}")
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


def _depformer_params(r: KeyResolver, cfg: LM.LmConfig) -> dict:
    """DepFormer with the reference's fallback chains (lm.rs:529-580):
    per-slice weights when present, otherwise root-level shared tensors
    (depformer_in has fewer entries than slices; the transformer itself may
    be shared across slices with per-slice gating indices)."""
    dep = cfg.depformer
    dcfg = dep.transformer
    s = dep.num_slices
    d_dep = dcfg.d_model
    shared_tf = r.has("depformer.layers.0.norm1.alpha")

    tfs = []
    for i in range(s):
        if shared_tf:
            gp = f"depformer.layers"
            # Shared stack; per-slice gating index (lm.rs:527 idx*11/slices).
            gidx = (i * 11) // s
            layers = transformer_layers_params(r, "depformer", dcfg)
            # Swap in the indexed gating weights when present.
            import jax.numpy as jnp

            lin_in, lin_out = [], []
            ok = True
            for l in range(dcfg.num_layers):
                a = r.get(f"{gp}.{l}.gating.{gidx}.linear_in.weight")
                b = r.get(f"{gp}.{l}.gating.{gidx}.linear_out.weight")
                if a is None or b is None:
                    ok = False
                    break
                lin_in.append(a)
                lin_out.append(b)
            if ok:
                layers["mlp"] = {
                    "linear_in": jnp.asarray(np.stack(lin_in)),
                    "linear_out": jnp.asarray(np.stack(lin_out)),
                }
            tfs.append(layers)
        else:
            tfs.append(
                transformer_layers_params(
                    r, f"depformer.slices.{i}.transformer", dcfg
                )
            )

    import jax

    transformer = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *tfs)

    n_in = 11 if r.has("depformer_in.0.weight") else s
    linear_in = np.stack(
        [
            r.get(
                f"depformer.slices.{i}.linear_in.weight",
                f"depformer_in.{(i * n_in) // s}.weight",
                shape=(d_dep, cfg.d_model),
            )
            for i in range(s)
        ]
    )
    linear_out = np.stack(
        [
            r.get(
                f"depformer.slices.{i}.linear_out.weight",
                f"linears.{i}.weight",
                shape=(cfg.audio_vocab_size - 1, d_dep),
            )
            for i in range(s)
        ]
    )
    emb_dim = dep.low_rank_embeddings or d_dep
    text_emb = r.get(
        "depformer.slices.0.emb.weight",
        "depformer_text_emb.weight",
        shape=(cfg.text_in_vocab_size, emb_dim),
    )
    audio_embs = np.stack(
        [
            r.get(
                f"depformer.slices.{i + 1}.emb.weight",
                f"depformer_emb.{i}.weight",
                shape=(cfg.audio_vocab_size, emb_dim),
            )
            for i in range(s - 1)
        ]
    )
    out = {
        "transformer": transformer,
        "linear_in": linear_in,
        "linear_out": linear_out,
        "text_emb": text_emb,
        "audio_embs": audio_embs,
    }
    if dep.low_rank_embeddings is not None:
        lr = np.stack(
            [
                r.get(
                    f"depformer.slices.{i}.emb.low_rank.weight",
                    "depformer_text_emb.low_rank.weight" if i == 0
                    else f"depformer_emb.{i - 1}.low_rank.weight",
                    shape=(d_dep, dep.low_rank_embeddings),
                )
                for i in range(s)
            ]
        )
        out["low_rank"] = lr
    return out


# ---------------------------------------------------------------------------
# Reference-style export (round-trip testing; also lets users convert our
# trees back to candle-compatible checkpoints)
# ---------------------------------------------------------------------------


def lm_params_to_reference(cfg: LM.LmConfig, params: dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    d = cfg.d_model

    def np32(a):
        return np.asarray(a, np.float32)

    out["text_emb.weight"] = np32(params["text_emb"])
    for k in range(cfg.audio_codebooks):
        out[f"emb.{k}.weight"] = np32(params["audio_embs"][k])
    out["out_norm.alpha"] = np32(params["out_norm"]["alpha"]).reshape(1, 1, d)
    if "bias" in params["out_norm"]:
        out["out_norm.bias"] = np32(params["out_norm"]["bias"])
    out["text_linear.weight"] = np32(params["text_linear"])
    if "extra_heads" in params:
        for i in range(params["extra_heads"].shape[0]):
            out[f"extra_heads.{i}.weight"] = np32(params["extra_heads"][i])
    _layers_to_reference(out, "transformer", cfg.transformer, params["transformer"])
    if cfg.depformer is not None:
        dp = params["depformer"]
        s = cfg.depformer.num_slices
        for i in range(s):
            import jax

            tf_i = jax.tree_util.tree_map(lambda a: a[i], dp["transformer"])
            _layers_to_reference(
                out, f"depformer.slices.{i}.transformer", cfg.depformer.transformer, tf_i
            )
            out[f"depformer.slices.{i}.linear_in.weight"] = np32(dp["linear_in"][i])
            out[f"depformer.slices.{i}.linear_out.weight"] = np32(dp["linear_out"][i])
            if i == 0:
                out["depformer.slices.0.emb.weight"] = np32(dp["text_emb"])
            else:
                out[f"depformer.slices.{i}.emb.weight"] = np32(dp["audio_embs"][i - 1])
            if "low_rank" in dp:
                out[f"depformer.slices.{i}.emb.low_rank.weight"] = np32(dp["low_rank"][i])
    return out


def _layers_to_reference(out, prefix, tcfg, layers):
    import jax

    n = tcfg.num_layers
    d = tcfg.d_model
    for l in range(n):
        lp = jax.tree_util.tree_map(lambda a: a[l], layers)
        p = f"{prefix}.layers.{l}"
        out[f"{p}.self_attn.in_proj_weight"] = np.asarray(lp["in_proj_w"], np.float32)
        out[f"{p}.self_attn.out_proj.weight"] = np.asarray(lp["out_proj_w"], np.float32)
        for nm in ("norm1", "norm2"):
            out[f"{p}.{nm}.alpha"] = np.asarray(
                lp[nm]["alpha"], np.float32
            ).reshape(1, 1, d)
            if "bias" in lp[nm]:
                out[f"{p}.{nm}.bias"] = np.asarray(lp[nm]["bias"], np.float32)
        if "linear_in" in lp["mlp"]:
            out[f"{p}.gating.linear_in.weight"] = np.asarray(
                lp["mlp"]["linear_in"], np.float32
            )
            out[f"{p}.gating.linear_out.weight"] = np.asarray(
                lp["mlp"]["linear_out"], np.float32
            )
        else:
            out[f"{p}.linear1.weight"] = np.asarray(lp["mlp"]["linear1"], np.float32)
            out[f"{p}.linear2.weight"] = np.asarray(lp["mlp"]["linear2"], np.float32)
        if "layer_scale_1" in lp:
            out[f"{p}.layer_scale_1.scale"] = np.asarray(lp["layer_scale_1"], np.float32)
            out[f"{p}.layer_scale_2.scale"] = np.asarray(lp["layer_scale_2"], np.float32)
        if "ca_q_w" in lp:
            out[f"{p}.cross_attention.in_proj_weight_q"] = np.asarray(
                lp["ca_q_w"], np.float32
            )
            out[f"{p}.cross_attention.in_proj_weight_kv"] = np.asarray(
                lp["ca_kv_w"], np.float32
            )
            out[f"{p}.cross_attention.out_proj.weight"] = np.asarray(
                lp["ca_out_w"], np.float32
            )
            out[f"{p}.norm_cross.alpha"] = np.asarray(
                lp["norm_cross"]["alpha"], np.float32
            ).reshape(1, 1, d)
            if "bias" in lp["norm_cross"]:
                out[f"{p}.norm_cross.bias"] = np.asarray(
                    lp["norm_cross"]["bias"], np.float32
                )
    return out


def mimi_params_to_reference(
    cfg: MIMI.MimiConfig, params: dict
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`build_mimi_params`: emit the reference (candle)
    key layout so Mimi checkpoints roundtrip export -> reimport exactly —
    the same contract :func:`lm_params_to_reference` provides for the LM
    (and the missing piece that kept tools/validate_real.py's codec check
    unrehearsed before real weights arrive)."""
    out: Dict[str, np.ndarray] = {}
    sn = cfg.seanet

    def np32(a):
        return np.asarray(a, np.float32)

    def conv(prefix, p):
        out[f"{prefix}.conv.conv.weight"] = np32(p["w"])
        if "b" in p:
            out[f"{prefix}.conv.conv.bias"] = np32(p["b"])

    def convtr(prefix, p):
        out[f"{prefix}.convtr.convtr.weight"] = np32(p["w"])
        if "b" in p:
            out[f"{prefix}.convtr.convtr.bias"] = np32(p["b"])

    def resblock(prefix, p):
        conv(f"{prefix}.block.1", p["b1"])
        conv(f"{prefix}.block.3", p["b2"])

    init_i, enc_stages, final_i = _seanet_enc_indices(sn)
    enc = params["encoder"]
    conv(f"encoder.model.{init_i}", enc["init"])
    for (res_is, down_i), stage in zip(enc_stages, enc["layers"]):
        for ri, rp in zip(res_is, stage["res"]):
            resblock(f"encoder.model.{ri}", rp)
        conv(f"encoder.model.{down_i}", stage["down"])
    conv(f"encoder.model.{final_i}", enc["final"])

    init_i, dec_stages, final_i = _seanet_dec_indices(sn)
    dec = params["decoder"]
    conv(f"decoder.model.{init_i}", dec["init"])
    for (up_i, res_is), stage in zip(dec_stages, dec["layers"]):
        convtr(f"decoder.model.{up_i}", stage["up"])
        for ri, rp in zip(res_is, stage["res"]):
            resblock(f"decoder.model.{ri}", rp)
    conv(f"decoder.model.{final_i}", dec["final"])

    _layers_to_reference(
        out, "encoder_transformer.transformer", cfg.transformer,
        params["encoder_transformer"],
    )
    _layers_to_reference(
        out, "decoder_transformer.transformer", cfg.transformer,
        params["decoder_transformer"],
    )

    out["downsample.conv.conv.conv.weight"] = np32(params["downsample"]["w"])
    out["upsample.convtr.convtr.convtr.weight"] = np32(params["upsample"]["w"])

    def rvq(prefix, p, n_q):
        embed = np32(p["embed"])  # (n_q, bins, dim)
        for q in range(n_q):
            cb = f"{prefix}.vq.layers.{q}._codebook"
            # cluster_usage == 1 makes embedding_sum / max(usage, eps)
            # reproduce the embedding bit-exactly on reimport.
            out[f"{cb}.embedding_sum"] = embed[q]
            out[f"{cb}.cluster_usage"] = np.ones(embed.shape[1], np.float32)
        # candle stores the 1x1 projs as (out, in, 1).
        out[f"{prefix}.input_proj.weight"] = np32(p["input_proj"])[:, :, None]
        out[f"{prefix}.output_proj.weight"] = np32(p["output_proj"])[:, :, None]

    rvq("quantizer.rvq_first", params["quantizer"]["rvq_first"], 1)
    rvq("quantizer.rvq_rest", params["quantizer"]["rvq_rest"], cfg.n_q - 1)
    return out
