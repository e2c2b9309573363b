"""Condition providers (reference: moshi-core/src/conditioner.rs).

Two conditioner families, both producing an additive (1, D) bias on the LM
input embedding (Condition::AddToInput):
  * LutConditioner — discrete attribute -> embedding -> output_proj
    (conditioner.rs:31-60); used e.g. by the TTS "description" attribute.
  * ContinuousAttributeConditioner — scalar -> sinusoidal features ->
    output_proj (conditioner.rs:62-111); used by the STT delay conditioning
    (`delay` with value -conditioning_delay, moshi-server/src/asr.rs:55-60).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LutConfig:
    n_bins: int
    dim: int
    possible_values: Tuple[str, ...]


@dataclasses.dataclass(frozen=True)
class ContinuousAttributeConfig:
    dim: int
    scale_factor: float
    max_period: float


ConditionerConfig = Union[LutConfig, ContinuousAttributeConfig]


def lut_init(cfg: LutConfig, output_dim: int, key: jax.Array, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embed": jax.random.normal(k1, (cfg.n_bins + 1, cfg.dim), dtype) * 0.02,
        "output_proj": jax.random.normal(k2, (output_dim, cfg.dim), dtype)
        * (1.0 / jnp.sqrt(cfg.dim)),
        "learnt_padding": jax.random.normal(k3, (1, output_dim), dtype) * 0.02,
    }


def lut_condition(cfg: LutConfig, params: dict, value: str) -> jax.Array:
    """value -> (1, D) additive condition."""
    try:
        idx = cfg.possible_values.index(value)
    except ValueError:
        raise KeyError(f"unknown value for lut conditioner {value!r}")
    emb = params["embed"][idx]
    return (emb @ params["output_proj"].T)[None, :]


def continuous_init(
    cfg: ContinuousAttributeConfig, output_dim: int, key: jax.Array, dtype=jnp.float32
):
    k1, k2 = jax.random.split(key)
    return {
        "output_proj": jax.random.normal(k1, (output_dim, cfg.dim), dtype)
        * (1.0 / jnp.sqrt(cfg.dim)),
        "learnt_padding": jax.random.normal(k2, (1, output_dim), dtype) * 0.02,
    }


def continuous_condition(
    cfg: ContinuousAttributeConfig, params: dict, value: float
) -> jax.Array:
    """Sinusoidal embedding of scale_factor*value -> (1, D)
    (conditioner.rs:88-110)."""
    v = value * cfg.scale_factor
    half = cfg.dim // 2
    idx = jnp.arange(half, dtype=jnp.float32)
    inv_freq = 1.0 / (cfg.max_period ** (idx / (half - 1)))
    freqs = v * inv_freq
    feat = jnp.concatenate([jnp.cos(freqs), jnp.sin(freqs)])[None, :]
    return feat @ params["output_proj"].T


class ConditionProvider:
    """Registry keyed by conditioner name (conditioner.rs:119-176)."""

    def __init__(self, output_dim: int, configs: Dict[str, ConditionerConfig], key):
        self.configs = configs
        self.params: Dict[str, dict] = {}
        for i, (name, cfg) in enumerate(sorted(configs.items())):
            sub = jax.random.fold_in(key, i)
            if isinstance(cfg, LutConfig):
                self.params[name] = lut_init(cfg, output_dim, sub)
            else:
                self.params[name] = continuous_init(cfg, output_dim, sub)

    def condition_lut(self, name: str, value: str) -> jax.Array:
        cfg = self.configs[name]
        if not isinstance(cfg, LutConfig):
            raise TypeError(f"conditioner {name} is not a Lut")
        return lut_condition(cfg, self.params[name], value)

    def condition_cont(self, name: str, value: float) -> jax.Array:
        cfg = self.configs[name]
        if not isinstance(cfg, ContinuousAttributeConfig):
            raise TypeError(f"conditioner {name} is not continuous")
        return continuous_condition(cfg, self.params[name], value)

    def learnt_padding(self, name: str) -> jax.Array:
        return self.params[name]["learnt_padding"]

    def load_params(
        self, tensors: Dict[str, jnp.ndarray],
        prefix: str = "condition_provider.conditioners",
    ) -> int:
        """Overwrite provider weights from a checkpoint tensor dict
        (reference key layout conditioner.rs:41-44,74-76:
        ``<prefix>.<name>.{embed.weight,output_proj.weight,learnt_padding}``).
        Returns the number of tensors adopted."""
        n = 0
        for name in self.params:
            for ours, theirs in (
                ("embed", f"{prefix}.{name}.embed.weight"),
                ("output_proj", f"{prefix}.{name}.output_proj.weight"),
                ("learnt_padding", f"{prefix}.{name}.learnt_padding"),
            ):
                if theirs in tensors and ours in self.params[name]:
                    t = jnp.asarray(tensors[theirs])
                    if ours == "learnt_padding":
                        t = t.reshape(1, -1)
                    self.params[name][ours] = t
                    n += 1
        return n


def configs_from_toml(raw: Dict[str, dict]) -> Dict[str, ConditionerConfig]:
    """Parse a [modules.x.conditioners] table (serde tag `type`)."""
    out: Dict[str, ConditionerConfig] = {}
    for name, c in raw.items():
        typ = c.get("type")
        if typ == "Lut":
            out[name] = LutConfig(
                n_bins=c["n_bins"], dim=c["dim"],
                possible_values=tuple(c["possible_values"]),
            )
        elif typ == "ContinuousAttribute":
            out[name] = ContinuousAttributeConfig(
                dim=c["dim"], scale_factor=c["scale_factor"],
                max_period=c["max_period"],
            )
        else:
            raise ValueError(f"unknown conditioner type {typ!r}")
    return out
