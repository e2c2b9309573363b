#!/usr/bin/env python3
"""Minimal finetuning loop over delayed-streams frames (dsm_tpu/train.py).

Expects pre-tokenized data: a .safetensors file with `text (N, T)` and
`audio (N, T, K)` int32 tensors (e.g. produced from session token logs via
dsm_tpu.utils.session_log).

  python examples/finetune.py data.safetensors --steps 100 --out ckpt.safetensors
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--preset", default="stt_1b_en_fr")
    p.add_argument("--init", default=None, help="native checkpoint to start from")
    p.add_argument("--out", default="ckpt.safetensors")
    args = p.parse_args()

    from safetensors.numpy import load_file

    from dsm_tpu import train
    from dsm_tpu.models import lm as LM
    from dsm_tpu.utils import checkpoint as CK

    data = load_file(args.data)
    text, audio = data["text"], data["audio"]

    lm_cfg = getattr(LM, args.preset)()
    cfg = train.TrainConfig(lm=lm_cfg, learning_rate=args.lr)
    params = LM.init(lm_cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if args.init:
        params = CK.load_native(args.init, params)

    opt = train.make_optimizer(cfg)
    opt_state = opt.init(params)
    step = train.make_train_step(cfg, opt)

    rng = np.random.default_rng(0)
    for i in range(args.steps):
        idx = rng.integers(0, len(text), args.batch)
        batch = {
            "text": jnp.asarray(text[idx], jnp.int32),
            "audio": jnp.asarray(audio[idx], jnp.int32),
        }
        params, opt_state, loss, aux = step(params, opt_state, batch)
        if i % 10 == 0:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"(text {float(aux['text_loss']):.4f})")

    CK.save_native(args.out, params)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
