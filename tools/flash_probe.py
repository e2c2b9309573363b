"""On-chip equivalence + timing probe for the decode-attention variants.

Round-3 kernel landings that need chip validation (interpret mode already
covered by tests/test_decode_attn.py):

* ``_decode_attend_q_flash`` — c-blocked streaming-softmax lowering used by
  s2s-2b duplex shapes (20 heads, ring 3072) where the whole ring cannot
  live in one VMEM block and h % 8 != 0.
* the 64-wide-head mono path (stt-2.6b / tts_202501 / tts_v0_1 shapes),
  enabled this round by relaxing the ``dh == 128`` gate.

For each shape: commit a step's rows via ring_kernels.ring_commit, then
compare decode_attend against attention.attend_global_split_q on the SAME
device, and time both over a fused lax.scan (tunnel-dispatch amortised).

Prints one JSON line per shape; exits nonzero on equivalence failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(B, H, C, Dh, pos, window, steps, label):
    import jax
    import jax.numpy as jnp
    from dsm_tpu.ops import attention as attn
    from dsm_tpu.ops import decode_attn as da
    from dsm_tpu.ops import ring_kernels as rk

    on_tpu = jax.devices()[0].platform == "tpu"
    key = jax.random.PRNGKey(pos + B)
    ks = jax.random.split(key, 8)
    q = (jax.random.normal(ks[0], (B, H, 1, Dh)) * 0.5).astype(jnp.bfloat16)
    k_new = (jax.random.normal(ks[1], (B, H, 1, Dh)) * 0.5).astype(jnp.bfloat16)
    v_new = (jax.random.normal(ks[2], (B, H, 1, Dh)) * 0.5).astype(jnp.bfloat16)
    kc = jax.random.randint(ks[3], (B, H, C, Dh), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[4], (B, H, C, Dh), -127, 128, jnp.int8)
    ksc = jax.random.uniform(ks[5], (B, H, C), jnp.float32, 0.001, 0.02)
    vsc = jax.random.uniform(ks[6], (B, H, C), jnp.float32, 0.001, 0.02)
    valid = jax.random.uniform(ks[7], (B, C)) < 0.9
    plan = attn.global_ring_plan(jnp.int32(pos), C, 1)

    assert da.supported(q, kc, plan), f"{label}: kernel does not claim shape"

    y_ref = attn.attend_global_split_q(
        q, kc, vc, ksc, vsc, k_new, v_new, plan, valid, window=window
    )
    kq, vq, ksn, vsn = attn.quantize_kv_rows(k_new, v_new)
    kc2, vc2, ksc2, vsc2 = rk.ring_commit(
        kc, vc, kq, vq, plan["w"][0], ksc, vsc, ksn, vsn,
        interpret=not on_tpu,
    )
    y_kern = da.decode_attend(
        q, kc2, vc2, ksc2, vsc2, k_new, v_new, plan, valid,
        window=window, interpret=not on_tpu,
    )
    err = float(
        jnp.max(jnp.abs(y_kern.astype(jnp.float32) - y_ref.astype(jnp.float32)))
    )
    denom = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) or 1.0
    ok = err <= 2e-2 + 2e-2 * denom

    # Timing: scan `steps` attend calls (static ring/plan; q varies per step
    # so XLA cannot hoist the work out of the loop).
    def timed(fn_name, fn):
        def body(carry, x):
            qq = q + x.astype(q.dtype) * 1e-3
            y = fn(qq)
            return carry + y.astype(jnp.float32).sum(), None

        stepper = jax.jit(
            lambda xs: jax.lax.scan(body, jnp.float32(0.0), xs)[0]
        )
        xs = jnp.arange(steps, dtype=jnp.int32)[:, None, None, None, None]
        stepper(xs).block_until_ready()  # compile
        reps, best = 3, float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            stepper(xs).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1e3

    kern_ms = timed(
        "kernel",
        lambda qq: da.decode_attend(
            qq, kc2, vc2, ksc2, vsc2, k_new, v_new, plan, valid,
            window=window, interpret=not on_tpu,
        ),
    )
    xla_ms = timed(
        "xla",
        lambda qq: attn.attend_global_split_q(
            qq, kc, vc, ksc, vsc, k_new, v_new, plan, valid, window=window
        ),
    )
    row = {
        "label": label, "B": B, "H": H, "C": C, "Dh": Dh,
        "on_tpu": on_tpu, "equiv_ok": ok, "max_abs_err": err,
        "kernel_ms": round(kern_ms, 4), "xla_ms": round(xla_ms, 4),
        "speedup": round(xla_ms / kern_ms, 2) if kern_ms else None,
    }
    print(json.dumps(row), flush=True)
    return ok


def main():
    from dsm_tpu.utils.compile_cache import enable_if_tpu

    enable_if_tpu()
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    shapes = [
        # s2s-2b duplex: 20 heads, ring 3072 -> flash (c-blocked) variant.
        (args.batch, 20, 3072, 128, 4000, 3000, "s2s-2b-flash"),
        # stt-2.6b: 32 heads, dh=64, ring 384 (ctx 375 rounded) -> mono-64.
        (args.batch, 32, 384, 64, 1000, 375, "stt-2.6b-mono64"),
        # tts_202501 CA-era main transformer: 32 heads dh=64 ring 512.
        (args.batch, 32, 512, 64, 700, 500, "tts202501-mono64"),
        # Production headline shapes (revalidate after the head-major
        # reshape-free restructure): stt-1b and tts-1.6b main transformer.
        (args.batch, 16, 768, 128, 1000, 750, "stt-1b-mono"),
        (args.batch, 16, 1024, 128, 1500, 1000, "tts-1.6b-mono"),
    ]
    ok = True
    for B, H, C, Dh, pos, window, label in shapes:
        ok &= probe(B, H, C, Dh, pos, window, args.steps, label)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
