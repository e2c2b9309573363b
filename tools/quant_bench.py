#!/usr/bin/env python3
"""Quantization benchmark (reference: tools/quant-bench, which is a stub
printing "not yet implemented" — this one actually measures).

Compares bf16 vs int8(weight-only, per-channel scales) matmul latency and
accuracy at LM-layer shapes.

  python tools/quant_bench.py --d-model 2048 --ff 8192 --batch 64
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d-model", type=int, default=2048)
    p.add_argument("--ff", type=int, default=8192)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    d, f, b = args.d_model, args.ff, args.batch
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (f, d), jnp.float32) * 0.02
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, d), jnp.bfloat16)

    w_bf16 = w.astype(jnp.bfloat16)
    scales = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scales), -127, 127).astype(jnp.int8)

    @jax.jit
    def mm_bf16(x):
        return x @ w_bf16.T

    @jax.jit
    def mm_i8(x):
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w_i8.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return (y * scales[:, 0]).astype(jnp.bfloat16)

    def timeit(fn):
        out = fn(x); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    t_bf16 = timeit(mm_bf16)
    t_i8 = timeit(mm_i8)
    ref = np.asarray(x.astype(jnp.float32) @ w.T)
    got = np.asarray(mm_i8(x), np.float32)
    rel_err = float(np.abs(ref - got).mean() / (np.abs(ref).mean() + 1e-9))
    print(json.dumps({
        "bf16_ms": round(t_bf16 * 1e3, 3),
        "int8_ms": round(t_i8 * 1e3, 3),
        "weight_bytes_bf16": int(w_bf16.size * 2),
        "weight_bytes_int8": int(w_i8.size + scales.size * 4),
        "mean_rel_err": round(rel_err, 5),
    }))


if __name__ == "__main__":
    main()
