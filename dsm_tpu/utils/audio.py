"""Audio I/O: WAV read/write, resampling, mono downmix.

Covers the reference's kaudio/symphonia usage for the PCM paths
(moshi-core/src/wav.rs write_pcm_as_wav; moshi-server/src/utils.rs:263-305
pcm_decode; client resamplers in kyutai-client-core/src/audio.rs).
Compressed formats: mp3 via libmpg123, ogg vorbis via libvorbisfile,
ogg opus via libopus (utils/codecs.py, utils/opus.py), flac via the
pure-python decoder (utils/flac.py).
"""

from __future__ import annotations

import struct
import wave
from typing import Tuple

import numpy as np


def write_wav(path: str, pcm: np.ndarray, sample_rate: int = 24_000) -> None:
    """Write mono float [-1, 1] pcm as 16-bit WAV (wav.rs write_pcm_as_wav)."""
    pcm = np.asarray(pcm, np.float32).reshape(-1)
    data = np.clip(pcm * 32768.0, -32768, 32767).astype("<i2").tobytes()
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(data)


def wav_bytes(pcm: np.ndarray, sample_rate: int = 24_000) -> bytes:
    """In-memory 16-bit WAV bytes (for the HTTP TTS response)."""
    pcm = np.asarray(pcm, np.float32).reshape(-1)
    data = np.clip(pcm * 32768.0, -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                 sample_rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (mono float32 [-1,1], sample_rate)."""
    with wave.open(path, "rb") as w:
        return _decode_wave_obj(w)


def _decode_wave_obj(w) -> Tuple[np.ndarray, int]:
    """Shared 8/16/32-bit + multichannel decode for file and bytes paths."""
    sr = w.getframerate()
    ch = w.getnchannels()
    sw = w.getsampwidth()
    raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        x = (np.frombuffer(raw, "u1").astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)  # mono downmix
    return x, sr


def resample(pcm: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Polyphase resampling (the 'High' quality path of the reference's
    client resampler)."""
    if src_rate == dst_rate:
        return np.asarray(pcm, np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(src_rate, dst_rate)
    return resample_poly(
        np.asarray(pcm, np.float64), dst_rate // g, src_rate // g
    ).astype(np.float32)


def audio_level_db(pcm: np.ndarray) -> float:
    """RMS level in dBFS (client-core AudioLevel metering)."""
    rms = float(np.sqrt(np.mean(np.square(np.asarray(pcm, np.float64))) + 1e-12))
    return 20.0 * np.log10(max(rms, 1e-9))


def decode_audio(path: str, target_rate: int = 24_000) -> np.ndarray:
    """Decode an audio file to mono float pcm at target_rate.

    The pcm_decode surface (moshi-server/src/utils.rs:263-305): WAV
    natively, mp3 via libmpg123, ogg/vorbis via libvorbisfile, ogg/opus
    via libopus (utils/codecs.py, utils/opus.py).  Multi-channel input is
    downmixed to mono like the reference (utils.rs:283-296 averages
    channels)."""
    low = path.lower()
    if low.endswith(".wav"):
        pcm, sr = read_wav(path)
        return resample(pcm, sr, target_rate)
    if low.endswith((".mp3", ".mp2", ".mpga")):
        from . import codecs

        if not codecs.mp3_available():
            raise NotImplementedError(
                f"cannot decode {path!r}: libmpg123 not available"
            )
        pcm, sr = codecs.decode_mp3_file(path)
        return resample(pcm.mean(axis=1), sr, target_rate)
    if low.endswith((".ogg", ".oga")):
        from . import codecs, opus as opus_mod

        if codecs.vorbis_available():
            try:
                pcm, sr = codecs.decode_vorbis_file(path)
                return resample(pcm.mean(axis=1), sr, target_rate)
            except ValueError:
                pass  # not vorbis; fall through to opus
        if opus_mod.available():
            with open(path, "rb") as f:
                pcm = opus_mod.OggOpusDecoder().decode(f.read())
            if len(pcm):
                return resample(pcm, opus_mod.SAMPLE_RATE, target_rate)
        raise NotImplementedError(
            f"cannot decode {path!r}: no ogg codec available"
        )
    if low.endswith(".flac"):
        from . import flac as flac_mod

        pcm, sr = flac_mod.decode_flac_file(path)
        return resample(pcm.mean(axis=1), sr, target_rate)
    raise NotImplementedError(
        f"no codec backend available for {path!r}; supported: wav, mp3, "
        "ogg (vorbis/opus), flac"
    )


def decode_audio_bytes(data: bytes, target_rate: int = 24_000) -> np.ndarray:
    """Decode an in-memory audio payload to mono float pcm at target_rate,
    sniffing the container by magic bytes — the upload-body analogue of
    :func:`decode_audio` (reference pcm_decode consumes HTTP bodies the
    same way, utils.rs:263-305)."""
    if data[:4] == b"RIFF":
        import io

        with wave.open(io.BytesIO(data)) as w:
            pcm, sr = _decode_wave_obj(w)
        return resample(pcm, sr, target_rate)
    if data[:4] == b"fLaC":
        from .flac import decode_flac

        pcm, sr = decode_flac(data)
        return resample(pcm.mean(axis=1), sr, target_rate)
    if data[:4] == b"OggS":
        # Same codec order as decode_audio: vorbis first (ValueError means
        # "not vorbis" and falls through), then opus — so identical content
        # resolves identically via path or bytes, and real opus decode
        # errors surface instead of being swallowed.
        from . import codecs, opus as opus_mod

        if codecs.vorbis_available():
            import os
            import tempfile

            fd, tmp = tempfile.mkstemp(suffix=".ogg")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(data)
                try:
                    pcm, sr = codecs.decode_vorbis_file(tmp)
                    return resample(pcm.mean(axis=1), sr, target_rate)
                except ValueError:
                    pass  # not vorbis; try opus
            finally:
                os.unlink(tmp)
        if opus_mod.available():
            pcm = opus_mod.OggOpusDecoder().decode(data)
            if len(pcm):
                return resample(pcm, opus_mod.SAMPLE_RATE, target_rate)
        raise NotImplementedError("no ogg codec available")
    if data[:3] == b"ID3" or (
        len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        from . import codecs

        if not codecs.mp3_available():
            raise NotImplementedError("libmpg123 not available")
        pcm, sr = codecs.decode_mp3(data)
        if pcm.ndim > 1:
            pcm = pcm.mean(axis=1)
        return resample(pcm, sr, target_rate)
    raise NotImplementedError(
        "unrecognised audio payload (supported: wav, flac, ogg, mp3)"
    )
