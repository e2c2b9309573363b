#!/usr/bin/env python3
"""Safetensors dtype converter (reference: tools/bf16-to-fp16 + sm75-prep).

Converts checkpoint tensors between bf16/f16/f32 — on TPU the relevant
direction is f16/f32 -> bf16 (the MXU-native type), the reverse of the
reference's pre-Ampere downgrade path, but both work:

  python tools/dtype_convert.py in.safetensors out.safetensors --dtype bf16
"""

import argparse

import numpy as np


def convert(src: str, dst: str, dtype: str, keep_f32_norms: bool = True) -> dict:
    import ml_dtypes
    from safetensors.numpy import load_file, save_file

    target = {"bf16": ml_dtypes.bfloat16, "f16": np.float16, "f32": np.float32}[dtype]
    tensors = load_file(src)
    out = {}
    stats = {"converted": 0, "kept": 0}
    for k, v in tensors.items():
        # Norm/scale parameters stay f32 for stability (mirrors the
        # reference keeping biases unquantized; nn.rs).
        small = v.ndim <= 1
        if (keep_f32_norms and small) or v.dtype.kind in "iu":
            out[k] = v
            stats["kept"] += 1
        else:
            out[k] = v.astype(np.float32).astype(target)
            stats["converted"] += 1
    save_file(out, dst)
    return stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f16", "f32"])
    p.add_argument("--convert-all", action="store_true",
                   help="also convert 1-D tensors (norms, biases)")
    args = p.parse_args()
    stats = convert(args.src, args.dst, args.dtype, not args.convert_all)
    print(f"converted {stats['converted']} tensors, kept {stats['kept']}")


if __name__ == "__main__":
    main()
