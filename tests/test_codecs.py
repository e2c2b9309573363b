"""Compressed-audio decode (utils/codecs.py) — the pcm_decode parity
surface (moshi-server/src/utils.rs:263-305).

The mp3 path is verified with a REAL round-trip vector: libmp3lame
encodes a known sine, libmpg123 decodes it back, and the spectrum/energy
must match the source — plus structural checks on the reference's actual
speech samples (audio/bria.mp3 et al.)."""

import os

import numpy as np
import pytest

from dsm_tpu.utils import codecs
from dsm_tpu.utils.audio import decode_audio

REF_AUDIO = "/root/reference/audio"


def sine(freq=440.0, sr=24_000, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def dominant_freq(pcm, sr):
    spec = np.abs(np.fft.rfft(pcm * np.hanning(len(pcm))))
    return np.fft.rfftfreq(len(pcm), 1 / sr)[int(spec.argmax())]


@pytest.mark.skipif(
    not (codecs.mp3_available() and codecs.lame_available()),
    reason="libmpg123/libmp3lame unavailable",
)
def test_mp3_roundtrip_sine():
    sr = 24_000
    src = sine(440.0, sr, 1.0)
    data = codecs.encode_mp3(src, sr, bitrate_kbps=128)
    assert data[:2] in (b"\xff\xfb", b"\xff\xf3", b"ID"), data[:2]
    pcm, out_sr = codecs.decode_mp3(data)
    assert out_sr == sr
    mono = pcm.mean(axis=1)
    # Codec delay pads the ends; compare duration loosely, spectrum tightly.
    assert abs(len(mono) - len(src)) < sr * 0.2
    body = mono[sr // 4 : -sr // 4]
    assert abs(dominant_freq(body, sr) - 440.0) < 5.0
    # RMS of a sine at amp .5 is .3536; lossy codec keeps it within ~5%.
    assert abs(float(np.sqrt((body**2).mean())) - 0.3536) < 0.02


@pytest.mark.skipif(
    not (codecs.mp3_available() and codecs.lame_available()),
    reason="libmpg123/libmp3lame unavailable",
)
def test_mp3_roundtrip_via_decode_audio(tmp_path):
    sr = 24_000
    src = sine(1000.0, sr, 0.5)
    p = tmp_path / "tone.mp3"
    p.write_bytes(codecs.encode_mp3(src, sr))
    out = decode_audio(str(p), target_rate=24_000)
    assert out.dtype == np.float32 and out.ndim == 1
    body = out[sr // 8 : -sr // 8]
    assert abs(dominant_freq(body, sr) - 1000.0) < 10.0
    # Resample path: decode at 16 kHz too.
    out16 = decode_audio(str(p), target_rate=16_000)
    assert abs(len(out16) / 16_000 - len(out) / 24_000) < 0.05


@pytest.mark.skipif(not codecs.mp3_available(), reason="libmpg123 unavailable")
@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_AUDIO, "bria.mp3")),
    reason="reference samples not present",
)
def test_reference_speech_samples_decode():
    """Every reference sample decodes to finite, speech-like pcm — this is
    the prerequisite that unblocks the bria.mp3 transcript comparison the
    moment real weights land (SURVEY.md §7 step 4)."""
    for name in ("bria.mp3", "loona.mp3", "sample_fr_hibiki_crepes.mp3"):
        path = os.path.join(REF_AUDIO, name)
        if not os.path.exists(path):
            continue
        pcm = decode_audio(path, target_rate=24_000)
        assert pcm.ndim == 1 and pcm.dtype == np.float32
        assert len(pcm) > 24_000, f"{name}: under a second of audio?"
        assert np.isfinite(pcm).all()
        peak = float(np.abs(pcm).max())
        assert 0.01 < peak <= 1.5, f"{name}: implausible peak {peak}"
        # Speech has most energy well below 8 kHz.
        spec = np.abs(np.fft.rfft(pcm[: 24_000 * 5]))
        freqs = np.fft.rfftfreq(min(len(pcm), 24_000 * 5), 1 / 24_000)
        low = float((spec[freqs < 4_000] ** 2).sum())
        total = float((spec**2).sum())
        assert low / total > 0.5, f"{name}: not speech-shaped"


@pytest.mark.skipif(not codecs.mp3_available(), reason="libmpg123 unavailable")
def test_mp3_garbage_rejected():
    with pytest.raises((ValueError, RuntimeError)):
        codecs.decode_mp3(b"this is not an mpeg stream at all" * 10)


def test_decode_audio_unknown_extension():
    # .flac gained a decoder in round 3 (utils/flac.py, tests/test_flac.py)
    # — use a genuinely unsupported container.
    with pytest.raises(NotImplementedError):
        decode_audio("x.aiff")


@pytest.mark.skipif(not codecs.vorbis_available(), reason="libvorbisfile unavailable")
def test_ogg_opus_file_via_decode_audio(tmp_path):
    """.ogg containing opus routes through the opus decoder."""
    from dsm_tpu.utils import opus as opus_mod

    if not opus_mod.available():
        pytest.skip("libopus unavailable")
    sr = 24_000
    src = sine(700.0, sr, 0.5)
    enc = opus_mod.OggOpusEncoder()
    data = enc.encode(src, eos=True)
    p = tmp_path / "tone.ogg"
    p.write_bytes(data)
    out = decode_audio(str(p), target_rate=24_000)
    assert len(out) > sr // 4
    body = out[len(out) // 4 : -len(out) // 4]
    assert abs(dominant_freq(body, sr) - 700.0) < 10.0


@pytest.mark.skipif(
    not os.path.exists("/root/reference/audio/bria.mp3"),
    reason="reference samples not mounted",
)
def test_reference_mp3_samples_decode():
    """The actual reference speech samples decode (utils.rs:263-305
    pcm_decode parity) — the last builder-side prerequisite of the
    real-weights bria.mp3 transcript comparison (tools/validate_real.py)."""
    from dsm_tpu.utils.audio import decode_audio

    if not codecs.mp3_available():
        pytest.skip("libmpg123 unavailable")
    pcm = decode_audio("/root/reference/audio/bria.mp3", 24_000)
    assert 40 < len(pcm) / 24_000 < 50  # 44.9 s clip
    assert 0.05 < float(np.sqrt((pcm ** 2).mean())) < 0.3
