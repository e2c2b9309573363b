"""Pure-python FLAC decoder (utils/flac.py) against hand-built streams.

No FLAC encoder exists in this environment, so the tests build spec-level
bitstreams directly — one per subframe type (constant, verbatim, fixed,
LPC) and per channel assignment (independent, left/side, mid/side) — and
assert sample-exact reconstruction (lossless is the format's contract).
Reference behavior: moshi-server/src/utils.rs:263-305 accepts flac via
symphonia on its HTTP upload paths.
"""

import numpy as np
import pytest

from dsm_tpu.utils.flac import decode_flac


class W:
    """MSB-first bit writer."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, val, bits):
        val &= (1 << bits) - 1
        self.acc = (self.acc << bits) | val
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def ws(self, val, bits):  # signed
        self.w(val & ((1 << bits) - 1), bits)

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self):
        self.align()
        return bytes(self.buf)


def streaminfo(sr, channels, bps, block=None):
    w = W()
    w.w(0x80, 8)  # last block, type STREAMINFO
    w.w(34, 24)
    w.w(block or 4096, 16)
    w.w(block or 4096, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(sr, 20)
    w.w(channels - 1, 3)
    w.w(bps - 1, 5)
    w.w(0, 36)
    for _ in range(16):
        w.w(0, 8)
    return w.bytes()


def frame_header(w, block_size, ch_code, bps_code=4, frame_no=0):
    w.w(0x3FFE, 14)  # sync
    w.w(0, 1)  # reserved
    w.w(0, 1)  # fixed blocking
    w.w(6, 4)  # block size: 8-bit value follows
    w.w(0, 4)  # sample rate: from STREAMINFO
    w.w(ch_code, 4)
    w.w(bps_code, 3)  # 4 = 16-bit
    w.w(0, 1)
    w.w(frame_no, 8)  # coded number (frame_no < 128 -> single byte)
    w.w(block_size - 1, 8)
    w.w(0, 8)  # header crc8 (decoder does not verify)


def subframe_constant(w, value, bps=16):
    w.w(0, 1)
    w.w(0, 6)
    w.w(0, 1)
    w.ws(value, bps)


def subframe_verbatim(w, samples, bps=16):
    w.w(0, 1)
    w.w(1, 6)
    w.w(0, 1)
    for s in samples:
        w.ws(s, bps)


def rice_residual(w, residuals, param):
    w.w(0, 2)  # method 0 (4-bit params)
    w.w(0, 4)  # partition order 0
    w.w(param, 4)
    for r in residuals:
        z = (r << 1) ^ (r >> 63) if r < 0 else (r << 1)
        z = (abs(r) << 1) - (1 if r < 0 else 0)
        q, rem = divmod(z, 1 << param) if param else (z, 0)
        w.w(0, q) if q else None
        w.w(1, 1)
        if param:
            w.w(rem, param)


def subframe_fixed(w, samples, order, bps=16):
    """Encode with the fixed predictor of the given order."""
    w.w(0, 1)
    w.w(8 + order, 6)
    w.w(0, 1)
    coeffs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    for s in samples[:order]:
        w.ws(s, bps)
    residuals = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
        residuals.append(samples[i] - pred)
    rice_residual(w, residuals, param=6)


def subframe_lpc(w, samples, coeffs, shift, precision, bps=16):
    order = len(coeffs)
    w.w(0, 1)
    w.w(32 + order - 1, 6)
    w.w(0, 1)
    for s in samples[:order]:
        w.ws(s, bps)
    w.w(precision - 1, 4)
    w.ws(shift, 5)
    for c in coeffs:
        w.ws(c, precision)
    residuals = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs)) >> shift
        residuals.append(samples[i] - pred)
    rice_residual(w, residuals, param=6)


def crc16(w):
    w.align()
    w.w(0, 16)  # decoder does not verify


def test_constant_and_verbatim_mono():
    block = 16
    const = [-123] * block
    verb = list(range(-8, 8))
    w = W()
    frame_header(w, block, ch_code=0, frame_no=0)
    subframe_constant(w, -123)
    crc16(w)
    frame_header(w, block, ch_code=0, frame_no=1)
    subframe_verbatim(w, verb)
    crc16(w)
    data = b"fLaC" + streaminfo(16000, 1, 16, block) + w.bytes()
    pcm, sr = decode_flac(data)
    assert sr == 16000 and pcm.shape == (2 * block, 1)
    got = np.round(pcm[:, 0] * (1 << 15)).astype(int)
    assert got.tolist() == const + verb


def test_fixed_orders_roundtrip():
    rng = np.random.default_rng(0)
    block = 64
    # A smooth signal keeps fixed-predictor residuals small.
    t = np.arange(block)
    samples = (1000 * np.sin(t / 5.0)).astype(int).tolist()
    for order in (0, 1, 2, 3, 4):
        w = W()
        frame_header(w, block, ch_code=0)
        subframe_fixed(w, samples, order)
        crc16(w)
        data = b"fLaC" + streaminfo(24000, 1, 16, block) + w.bytes()
        pcm, sr = decode_flac(data)
        got = np.round(pcm[:, 0] * (1 << 15)).astype(int)
        assert got.tolist() == samples, f"fixed order {order}"


def test_lpc_roundtrip():
    block = 48
    t = np.arange(block)
    samples = (2000 * np.cos(t / 7.0) + 50 * np.sin(t)).astype(int).tolist()
    w = W()
    frame_header(w, block, ch_code=0)
    # Arbitrary quantised predictor; the encoder computes exact residuals,
    # so ANY coefficients roundtrip losslessly.
    subframe_lpc(w, samples, coeffs=[900, -300, 120], shift=9, precision=12)
    crc16(w)
    data = b"fLaC" + streaminfo(24000, 1, 16, block) + w.bytes()
    pcm, _ = decode_flac(data)
    got = np.round(pcm[:, 0] * (1 << 15)).astype(int)
    assert got.tolist() == samples


def test_stereo_channel_assignments():
    block = 32
    t = np.arange(block)
    left = (3000 * np.sin(t / 4.0)).astype(int)
    right = (2500 * np.cos(t / 6.0)).astype(int)

    # independent
    w = W()
    frame_header(w, block, ch_code=1)
    subframe_verbatim(w, left.tolist())
    subframe_verbatim(w, right.tolist())
    crc16(w)
    # left/side: side = L - R, side subframe is bps+1
    w2 = W()
    frame_header(w2, block, ch_code=8)
    subframe_verbatim(w2, left.tolist())
    subframe_verbatim(w2, (left - right).tolist(), bps=17)
    crc16(w2)
    # mid/side: mid = (L+R)>>1
    w3 = W()
    frame_header(w3, block, ch_code=10)
    subframe_verbatim(w3, ((left + right) >> 1).tolist())
    subframe_verbatim(w3, (left - right).tolist(), bps=17)
    crc16(w3)

    for enc in (w, w2, w3):
        data = b"fLaC" + streaminfo(48000, 2, 16, block) + enc.bytes()
        pcm, sr = decode_flac(data)
        assert sr == 48000 and pcm.shape == (block, 2)
        got = np.round(pcm * (1 << 15)).astype(int)
        assert got[:, 0].tolist() == left.tolist()
        assert got[:, 1].tolist() == right.tolist()


def test_decode_audio_dispatch(tmp_path):
    """decode_audio resolves .flac and resamples to the target rate."""
    from dsm_tpu.utils.audio import decode_audio

    block = 240
    t = np.arange(block)
    samples = (5000 * np.sin(2 * np.pi * 440 * t / 48000)).astype(int).tolist()
    w = W()
    frame_header(w, block, ch_code=0)
    subframe_verbatim(w, samples)
    crc16(w)
    p = tmp_path / "x.flac"
    p.write_bytes(b"fLaC" + streaminfo(48000, 1, 16, block) + w.bytes())
    pcm = decode_audio(str(p), 24000)
    assert len(pcm) == block // 2
    assert np.isfinite(pcm).all()


def test_truncated_stream_raises():
    w = W()
    frame_header(w, 16, ch_code=0)
    data = b"fLaC" + streaminfo(16000, 1, 16, 16) + w.bytes()[:6]
    with pytest.raises(ValueError):
        decode_flac(data)
