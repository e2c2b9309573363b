"""Flagship-shape serving-profile golden (TPU backend only).

Replays the exact stt-1b serving-profile stream pinned by
tools/make_serving_golden.py — int8 KV + W8A8 + both Pallas kernels at
production shapes — and compares the text tokens bit-exactly.  Catches
quant-path/kernel regressions the small-shape goldens cannot (the
production kernels gate on head counts and ring sizes the small configs
never reach).  Skipped off-TPU: the fixture pins TPU arithmetic.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "golden_serving_stt1b.npz",
)


def _backend():
    import jax

    return jax.default_backend()


@pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="serving golden fixture not generated yet "
           "(tools/make_serving_golden.py on the chip)",
)
def test_flagship_serving_profile_golden():
    if _backend() == "cpu":
        pytest.skip("fixture pins TPU arithmetic (generate/compare on chip)")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.make_serving_golden import run_stream

    fx = np.load(FIXTURE)
    toks, prs = run_stream(int(fx["steps"]), int(fx["batch"]))
    np.testing.assert_array_equal(toks, fx["text_tokens"])
    if fx["prs"].size:
        # VAD probs: tiny tolerance (bf16 accumulation is deterministic on
        # one chip generation, but compiler updates may legally reassociate).
        np.testing.assert_allclose(prs, fx["prs"], atol=5e-3)
