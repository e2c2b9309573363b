"""Decompose the serving-profile LM step cost at a given batch size.

The round-4 headline step (stt-1b, B=224, int8 KV + W8A8) measures 26.6 ms
against an arithmetic floor of ~19 ms (13.7 ms ring read + ~4 ms matmuls +
~1 ms Mimi).  This tool splits the step into independently-timed phases so
the slack is attributable before optimising:

  attn_read — decode_attend only, over pre-committed rings (the pure
              attention HBM read; compare against bytes/819 GB/s)
  attn      — quantize_kv_rows + ring_commit + decode_attend per layer
              (the full per-layer attention sub-path, no matmuls)
  proj      — the L-layer matmul stack (norm1 + QKV + out_proj + MLP) with
              attention replaced by identity, + out_norm + text_linear
              (the pure matmul/W8A8 cost, no ring traffic)
  lm        — the real LM.step
  e2e       — the full ASR.step (mimi + delay + sampling + VAD)

Each phase is its own jitted donated ``lax.scan`` over --steps steps, timed
after one warmup run, reported as ms/step.  Run phases in one process; the
compile cache keeps re-runs cheap.

Usage:
  python tools/lm_profile.py --batch 224 --steps 20 --phases attn_read,attn,proj,lm,e2e
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bytes_gb(n):
    return n / 1e9


def _slope_ms(run_at, steps):
    """Marginal per-step ms via two-point slope: the ~24 ms tunnel RTT and
    any fixed dispatch cost cancel out.  ``run_at(n)`` must compile, execute
    and FETCH an n-step program (np.asarray — block_until_ready does not
    block on this tunneled backend)."""
    n1, n2 = steps, steps * 3
    run_at(n1)  # warm both compiles
    run_at(n2)
    t1 = min(run_at(n1) for _ in range(2))
    t2 = min(run_at(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1) * 1e3


def make_attn_inputs(cfg, batch, key):
    import jax
    import jax.numpy as jnp

    from dsm_tpu.ops import transformer as T

    tcfg = cfg
    state = T.init_state(tcfg, batch, jnp.bfloat16, kv_quant=True)
    h, hd = tcfg.num_heads, tcfg.hd
    import jax.random as jr

    k1, k2, k3 = jr.split(key, 3)
    q = jr.normal(k1, (batch, h, 1, hd), jnp.bfloat16)
    k = jr.normal(k2, (batch, h, 1, hd), jnp.bfloat16)
    v = jr.normal(k3, (batch, h, 1, hd), jnp.bfloat16)
    # Mark every ring row valid so the read masks nothing out.
    state["valid"] = jnp.ones_like(state["valid"])
    state["pos"] = jnp.int32(state["layers"][0]["k"].shape[2] + 5)
    return state, (q, k, v)


def phase_attn_read(cfg, batch, steps):
    """decode_attend over fixed committed rings, L layers per step."""
    import jax
    import jax.numpy as jnp

    from dsm_tpu.ops import attention as attn
    from dsm_tpu.ops import decode_attn as dattn

    state, (q, k, v) = make_attn_inputs(cfg, batch, jax.random.PRNGKey(0))
    cap = state["layers"][0]["k"].shape[2]

    fns = {}

    def run_at(n):
        if n not in fns:
            def run(state, q, k, v):
                plan = attn.global_ring_plan(state["pos"], cap, 1)
                valid = state["valid"]

                def body(acc, _):
                    y = acc
                    for l in range(cfg.num_layers):
                        st = state["layers"][l]
                        y = dattn.decode_attend(
                            q + 0.001 * y, st["k"], st["v"], st["ks"],
                            st["vs"], k, v, plan, valid, window=cfg.context,
                        )
                    return y, ()

                y, _ = jax.lax.scan(body, jnp.zeros_like(q), None, length=n)
                return y

            fns[n] = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fns[n](state, q, k, v))
        return time.perf_counter() - t0

    ms = _slope_ms(run_at, steps)
    dt = ms / 1e3
    h, hd = cfg.num_heads, cfg.hd
    ring_bytes = 2 * cfg.num_layers * batch * h * cap * hd  # K+V int8
    scale_bytes = 2 * cfg.num_layers * batch * h * cap * 4
    return {
        "ms": round(ms, 3),
        "ring_gb": round(_bytes_gb(ring_bytes + scale_bytes), 3),
        "achieved_gbps": round(_bytes_gb(ring_bytes + scale_bytes) / dt, 1),
    }


def phase_attn(cfg, batch, steps):
    """Full attention sub-path: quantize rows + ring_commit + decode_attend."""
    import jax
    import jax.numpy as jnp

    from dsm_tpu.ops import attention as attn
    from dsm_tpu.ops import decode_attn as dattn
    from dsm_tpu.ops import ring_kernels as rkern

    state, (q, k, v) = make_attn_inputs(cfg, batch, jax.random.PRNGKey(1))
    cap = state["layers"][0]["k"].shape[2]

    fns = {}
    box = {"layers": state["layers"]}

    def run_at(n):
        if n not in fns:
            def run(layers0, valid, pos0, q, k, v):
                def body(carry, _):
                    layers, pos, y = carry
                    plan = attn.global_ring_plan(pos, cap, 1)
                    new_layers = []
                    for l in range(cfg.num_layers):
                        st = layers[l]
                        kq, vq, ks_new, vs_new = attn.quantize_kv_rows(
                            k + 0.001 * y, v, dtype=st["k"].dtype
                        )
                        k_l, v_l, ks, vs = rkern.ring_commit(
                            st["k"], st["v"], kq, vq, plan["w"][0],
                            st["ks"], st["vs"], ks_new, vs_new,
                        )
                        y = dattn.decode_attend(
                            q, k_l, v_l, ks, vs, k, v, plan, valid,
                            window=cfg.context,
                        )
                        new_layers.append(
                            {"k": k_l, "v": v_l, "ks": ks, "vs": vs}
                        )
                    return (new_layers, plan["new_pos"], y), ()

                (layers, pos, y), _ = jax.lax.scan(
                    body, (layers0, pos0, jnp.zeros_like(q)),
                    None, length=n,
                )
                return y, layers

            fns[n] = jax.jit(run, donate_argnums=(0,))
        t0 = time.perf_counter()
        y, layers = fns[n](box["layers"], state["valid"], state["pos"], q, k, v)
        np.asarray(y)
        dt = time.perf_counter() - t0
        box["layers"] = layers
        return dt

    ms = _slope_ms(run_at, steps)
    return {"ms": round(ms, 3)}


def phase_proj(cfg, batch, steps, params_t, out_norm, text_linear):
    """Matmul stack only: norm1+QKV / out_proj / MLP per layer (attention ->
    identity on the fresh q), + out_norm + text_linear."""
    import jax
    import jax.numpy as jnp

    from dsm_tpu.ops import norm as norm_mod
    from dsm_tpu.ops import transformer as T

    x0 = jax.random.normal(
        jax.random.PRNGKey(2), (batch, 1, cfg.d_model), jnp.bfloat16
    )

    fns = {}

    def run_at(n):
        if n not in fns:
            def run(x0):
                def body(x, _):
                    b, t, _ = x.shape
                    for l in range(cfg.num_layers):
                        lp = jax.tree_util.tree_map(lambda a: a[l], params_t)
                        xn = norm_mod.apply_norm(cfg.norm_kind, lp["norm1"], x)
                        q, k, v = T._qkv(cfg, lp, xn)
                        y = T._proj_out(cfg, lp, q, b, t)
                        x = x + y
                        x = T._mlp_block(cfg, lp, x)
                    h = norm_mod.apply_norm(cfg.norm_kind, out_norm, x)[:, 0]
                    logits = T.mm(h, text_linear, site="text_linear")
                    return x * 0.5, logits.argmax(-1)

                x, toks = jax.lax.scan(body, x0, None, length=n)
                return toks

            fns[n] = jax.jit(run)
        t0 = time.perf_counter()
        np.asarray(fns[n](x0))
        return time.perf_counter() - t0

    ms = _slope_ms(run_at, steps)
    return {"ms": round(ms, 3)}


def phase_lm(cfg_lm, batch, steps, params):
    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import lm as LM

    state = LM.init_state(cfg_lm, batch, jnp.bfloat16, kv_quant=True)
    text = jnp.zeros((batch,), jnp.int32)
    audio = jnp.zeros((batch, cfg_lm.audio_codebooks), jnp.int32)

    fns = {}
    box = {"st": state}

    def run_at(n):
        if n not in fns:
            def multi(p, st):
                def body(st, _):
                    logits, _h, st = LM.step(cfg_lm, p, st, text, audio)
                    return st, logits.argmax(-1)

                st, toks = jax.lax.scan(body, st, None, length=n)
                return toks, st

            fns[n] = jax.jit(multi, donate_argnums=(1,))
        t0 = time.perf_counter()
        toks, st = fns[n](params, box["st"])
        np.asarray(toks)
        dt = time.perf_counter() - t0
        box["st"] = st
        return dt

    ms = _slope_ms(run_at, steps)
    return {"ms": round(ms, 3)}


def phase_e2e(batch, steps, model):
    from dsm_tpu.bench_perf import bench_e2e

    r = bench_e2e(batch, steps, model=model, serving=True)
    return {"ms": r["e2e_step_ms"], "streams": r["realtime_streams"]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=224)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--model", default="stt-1b")
    p.add_argument("--phases", default="attn_read,attn,proj,lm,e2e")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dsm_tpu.models import lm as LM
    from dsm_tpu.ops import transformer as T

    cfg_lm = LM.stt_2_6b_en() if args.model == "stt-2.6b" else LM.stt_1b_en_fr()
    tcfg = cfg_lm.transformer
    out = {
        "batch": args.batch,
        "model": args.model,
        "platform": jax.devices()[0].platform,
    }
    phases = args.phases.split(",")
    params = None
    if "proj" in phases or "lm" in phases:
        params = T.quantize_weights(
            LM.init(cfg_lm, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        )
    failed = 0
    for ph in phases:
        t0 = time.perf_counter()
        # The tunneled backend's remote_compile endpoint drops connections
        # transiently (broken pipe mid-compile killed two full runs); retry
        # the phase rather than losing the 30+ min of phases already timed.
        for attempt in range(3):
            try:
                if ph == "attn_read":
                    out[ph] = phase_attn_read(tcfg, args.batch, args.steps)
                elif ph == "attn":
                    out[ph] = phase_attn(tcfg, args.batch, args.steps)
                elif ph == "proj":
                    out[ph] = phase_proj(
                        tcfg, args.batch, args.steps, params["transformer"],
                        params["out_norm"], params["text_linear"],
                    )
                elif ph == "lm":
                    out[ph] = phase_lm(cfg_lm, args.batch, args.steps, params)
                elif ph == "e2e":
                    out[ph] = phase_e2e(args.batch, args.steps, args.model)
                else:
                    raise SystemExit(f"unknown phase {ph}")
                break
            except jax.errors.JaxRuntimeError as e:
                msg = str(e)
                if "UNAVAILABLE" not in msg and "Network Error" not in msg:
                    raise
                print(f"# {ph}: transport error (attempt {attempt + 1}/3): "
                      f"{msg.splitlines()[0]}", file=sys.stderr, flush=True)
                if attempt == 2:
                    out[ph] = {"error": msg.splitlines()[0]}
                    failed += 1
                else:
                    time.sleep(60)
        out[ph]["wall_s"] = round(time.perf_counter() - t0, 1)
        print(f"# {ph}: {out[ph]}", flush=True)
    print(json.dumps(out))
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    main()
