"""RVQ encode/decode semantics (reference: quantization.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.ops import rvq


def test_rvq_encode_matches_bruteforce():
    cfg = rvq.RvqConfig(dim=8, input_dim=12, output_dim=12, n_q=4, bins=16)
    params = rvq.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 5))
    codes = rvq.encode(cfg, params, x)
    assert codes.shape == (2, 4, 5)

    # Brute-force reference: residual loop with explicit distances.
    xp = np.einsum("bdt,cd->btc", np.asarray(x), np.asarray(params["input_proj"]))
    res = xp.copy()
    for q in range(4):
        e = np.asarray(params["embed"][q])
        d = ((res[..., None, :] - e[None, None]) ** 2).sum(-1)
        idx = d.argmin(-1)
        np.testing.assert_array_equal(np.asarray(codes[:, q]), idx)
        res = res - e[idx]


def test_rvq_roundtrip_reduces_error():
    cfg = rvq.RvqConfig(dim=8, input_dim=8, output_dim=8, n_q=8, bins=64)
    params = rvq.init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 20))
    err = []
    for n_q in [1, 4, 8]:
        c = rvq.RvqConfig(dim=8, input_dim=8, output_dim=8, n_q=n_q, bins=64)
        p = {
            "embed": params["embed"][:n_q],
            "input_proj": params["input_proj"],
            "output_proj": params["output_proj"],
        }
        codes = rvq.encode(c, p, x)
        # Measure in projected space (output_proj is random, compare pre-proj).
        xp = jnp.einsum("bdt,cd->btc", x, p["input_proj"])
        deq = p["embed"][jnp.arange(n_q)[None, :, None], codes].sum(1)
        err.append(float(jnp.mean((xp - deq) ** 2)))
    assert err[0] > err[1] > err[2]


def test_split_rvq_semantic_plus_acoustic():
    cfg = rvq.SplitRvqConfig(dim=8, input_dim=12, output_dim=12, n_q=4, bins=16)
    params = rvq.split_init(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 3))
    codes = rvq.split_encode(cfg, params, x)
    assert codes.shape == (2, 4, 3)
    # First codebook encodes xs itself, not the residual of rvq_rest
    # (quantization.rs:366-378): it must equal a standalone 1-stage encode.
    solo = rvq.encode(cfg.first, params["rvq_first"], x)
    np.testing.assert_array_equal(np.asarray(codes[:, :1]), np.asarray(solo))
    out = rvq.split_decode(cfg, params, codes)
    assert out.shape == (2, 12, 3)
