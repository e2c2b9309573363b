"""Rehearsal of tools/validate_real.py with synthetic reference-layout
checkpoints.

The real-weight validation (SURVEY §7 step 4) gets exactly one chance when
the released checkpoints land; this proves the whole pipeline — config
resolution, safetensors in the reference key layout for BOTH models
(lm_params_to_reference / mimi_params_to_reference), SentencePiece model
loading, mp3 decode, Mimi encode/decode, offline transcription, GGUF q8
export→reimport parity — executes end-to-end today.  Quality gates are
recorded, not asserted (--rehearsal): random weights cannot reconstruct
speech, and that is the one thing only real weights can prove.
"""

import json
import os
import struct
import sys

import jax
import numpy as np
import pytest

from dsm_tpu.models import lm as LM
from dsm_tpu.models import mimi as MIMI
from dsm_tpu.utils import checkpoint as CK

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b_ = n & 0x7F
        n >>= 7
        out += bytes([b_ | (0x80 if n else 0)])
        if not n:
            return out


def _piece(text, score, typ=1):
    body = b"\x0a" + _varint(len(text.encode())) + text.encode()
    body += b"\x15" + struct.pack("<f", score)
    if typ != 1:
        body += b"\x18" + _varint(typ)
    return b"\x0a" + _varint(len(body)) + body


def _write_spm(path, vocab):
    data = _piece("<unk>", 0.0, typ=2)
    # Enough real pieces that any sampled id decodes without IndexError.
    for i in range(1, vocab):
        data += _piece(f"▁w{i}", -float(1 + (i % 7)))
    with open(path, "wb") as f:
        f.write(data)


@pytest.mark.slow
def test_validate_real_rehearsal(tmp_path):
    from safetensors.numpy import save_file

    cfg_path = tmp_path / "cfg.toml"
    cfg_path.write_text(f"""
instance_name = "rehearsal"
authorized_ids = []

[modules.asr]
path = "/api/asr-streaming"
type = "BatchedAsr"
asr_delay_in_tokens = 2
batch_size = 1
temperature = 0.0
lm_model_file = "{tmp_path}/lm.safetensors"
audio_tokenizer_file = "{tmp_path}/mimi.safetensors"
text_tokenizer_file = "{tmp_path}/tok.model"

[modules.asr.model]
audio_vocab_size = 2049
text_in_vocab_size = 8001
text_out_vocab_size = 8000
audio_codebooks = 8

[modules.asr.model.transformer]
d_model = 128
num_heads = 4
num_layers = 2
dim_feedforward = 512
context = 64
max_period = 100000
gating = "silu"
norm = "RmsNorm"
positional_embedding = "Rope"
""")

    from dsm_tpu.server.config import Config

    mod = next(
        m for m in Config.load(str(cfg_path)).modules.values()
        if m.type == "BatchedAsr"
    )

    # Reference-layout checkpoints for exactly the shapes the config asks.
    lm_params = LM.init(mod.lm, jax.random.PRNGKey(0))
    save_file(
        CK.lm_params_to_reference(
            mod.lm, jax.tree_util.tree_map(np.asarray, lm_params)
        ),
        str(tmp_path / "lm.safetensors"),
    )
    mimi_cfg = MIMI.v0_1(mod.lm.audio_codebooks)
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    save_file(
        CK.mimi_params_to_reference(
            mimi_cfg, jax.tree_util.tree_map(np.asarray, mimi_params)
        ),
        str(tmp_path / "mimi.safetensors"),
    )
    _write_spm(str(tmp_path / "tok.model"), vocab=8001)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import validate_real

    rc = validate_real.main([
        "--config", str(cfg_path),
        "--audio", os.path.join(REPO, "audio", "speech-synthetic.mp3"),
        "--rehearsal",
    ])
    assert rc == 0, "rehearsal run failed"
