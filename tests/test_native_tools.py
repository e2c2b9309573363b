"""Native packer + tools smoke tests."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_native_packer_roundtrip():
    from dsm_tpu.server.native import FramePacker, load_lib

    if load_lib() is None:
        pytest.skip("no compiler")
    p = FramePacker(batch=3, frame=8, capacity_frames=4)
    # Slot 0: exactly one frame; slot 1: 1.5 frames; slot 2: starved.
    p.push(0, np.arange(8, dtype=np.float32))
    p.push(1, np.arange(12, dtype=np.float32) + 100)
    active = np.array([True, True, True])
    out, mask, n = p.pack(active)
    assert n == 2
    assert mask.tolist() == [True, True, False]
    np.testing.assert_array_equal(out[0], np.arange(8))
    np.testing.assert_array_equal(out[1], np.arange(8) + 100)
    np.testing.assert_array_equal(out[2], np.zeros(8))
    # Residual 4 samples on slot 1; next pack only succeeds after a push.
    assert p.available(1) == 4
    out, mask, n = p.pack(active)
    assert n == 0
    p.push(1, np.arange(4, dtype=np.float32) + 200)
    out, mask, n = p.pack(active)
    assert n == 1 and mask.tolist() == [False, True, False]
    np.testing.assert_array_equal(out[1][:4], np.arange(4) + 108)
    np.testing.assert_array_equal(out[1][4:], np.arange(4) + 200)
    # Reset drops buffered samples.
    p.push(2, np.ones(20, np.float32))
    p.reset_slot(2)
    assert p.available(2) == 0


def test_native_packer_wraparound():
    from dsm_tpu.server.native import FramePacker, load_lib

    if load_lib() is None:
        pytest.skip("no compiler")
    p = FramePacker(batch=1, frame=8, capacity_frames=2)  # tiny ring: 16
    active = np.array([True])
    for it in range(5):
        p.push(0, np.full(8, it, np.float32))
        out, mask, n = p.pack(active)
        assert n == 1
        np.testing.assert_array_equal(out[0], np.full(8, it))
    # Overfill: pushes beyond capacity are truncated, not corrupted.
    accepted = p.push(0, np.zeros(100, np.float32))
    assert accepted == 16


def _run(args, **kw):
    return subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, **kw,
    )


def test_dtype_convert_tool(tmp_path):
    from safetensors.numpy import load_file, save_file

    src = str(tmp_path / "in.safetensors")
    dst = str(tmp_path / "out.safetensors")
    save_file(
        {"w": np.random.randn(4, 4).astype(np.float32),
         "norm.alpha": np.ones(4, np.float32)},
        src,
    )
    r = _run(["tools/dtype_convert.py", src, dst, "--dtype", "bf16"])
    assert r.returncode == 0, r.stderr
    out = load_file(dst)
    assert str(out["w"].dtype) == "bfloat16"
    assert out["norm.alpha"].dtype == np.float32  # norms kept f32


def test_log_formatter_tool(tmp_path):
    log = tmp_path / "x.log"
    log.write_text(
        "✓ started fine\n"
        '{"ts": 1.0, "level": "error", "target": "asr", "message": "boom"}\n'
        "⚠ watch out\n"
    )
    r = _run(["tools/log_formatter.py", str(log), "--level", "WARN"])
    assert "boom" in r.stdout and "watch out" in r.stdout
    assert "started fine" not in r.stdout


def test_archive_logs_tool(tmp_path):
    log = tmp_path / "a.log"
    log.write_text("hello\n")
    r = _run(["tools/archive_logs.py", str(log), "--out-dir", str(tmp_path / "arch")])
    out = json.loads(r.stdout)
    assert os.path.exists(out["archive"])
    assert os.path.exists(out["archive"] + ".manifest.json")


def test_smoke_test_simulate():
    r = _run(["tools/smoke_test.py", "--simulate-success"])
    assert json.loads(r.stdout)["ok"] is True


def test_tpu_check_tool():
    r = _run(["tools/tpu_check.py", "--json"])
    info = json.loads(r.stdout)
    assert info["backend"] == "cpu" and info["n_devices"] >= 1
