"""Live-audio plumbing (client/audio_io.py): the logic-bearing parts run
without hardware — streaming resampler, prebuffered playback ring, level
meter, graceful degradation when no backend exists.

Reference: kyutai-client/src/stt/audio/mic.rs (capture -> 24 kHz 1920-sample
chunks), kyutai-client-core/src/audio.rs (AudioPlayer ring + resamplers).
"""

import numpy as np
import pytest

from dsm_tpu.client import audio_io as aio


def test_resampler_identity():
    r = aio.StreamingResampler(24_000, 24_000)
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(r.process(x), x)


@pytest.mark.parametrize("src,dst", [(48_000, 24_000), (44_100, 24_000),
                                     (16_000, 24_000), (24_000, 48_000)])
def test_resampler_chunked_equals_oneshot(src, dst):
    """Streaming in odd-sized chunks ≡ one-shot resample of the whole signal
    (the conv.rs:608 equivalence pattern applied to the client resampler)."""
    t = np.arange(src) / src
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    one = aio.StreamingResampler(src, dst).process(x)

    r = aio.StreamingResampler(src, dst)
    outs, i = [], 0
    rng = np.random.default_rng(1)
    while i < len(x):
        n = int(rng.integers(1, 1024))
        outs.append(r.process(x[i : i + n]))
        i += n
    streamed = np.concatenate(outs)

    n = min(len(one), len(streamed))
    assert n > 0.9 * dst  # ~1 s of output
    np.testing.assert_allclose(streamed[:n], one[:n], atol=1e-6)


def test_resampler_rate_and_content():
    src, dst = 48_000, 24_000
    t = np.arange(src) / src
    x = np.sin(2 * np.pi * 100.0 * t).astype(np.float32)
    y = aio.StreamingResampler(src, dst).process(x)
    assert abs(len(y) - dst) <= 2
    # A 100 Hz tone survives 2:1 decimation nearly unchanged.
    t2 = np.arange(len(y)) / dst
    np.testing.assert_allclose(y, np.sin(2 * np.pi * 100.0 * t2), atol=1e-2)


def test_playback_prebuffer_and_underrun():
    ring = aio.PlaybackBuffer(prebuffer=100)
    # Before prebuffer fills: silence, nothing consumed.
    ring.push(np.ones(60, np.float32))
    np.testing.assert_array_equal(ring.pull(50), np.zeros(50))
    assert ring.buffered == 60
    # Crossing the prebuffer threshold starts playback.
    ring.push(np.full(50, 2.0, np.float32))
    out = ring.pull(80)
    np.testing.assert_array_equal(out[:60], np.ones(60))
    np.testing.assert_array_equal(out[60:], np.full(20, 2.0))
    # Draining past the buffer zero-fills, counts one underrun, and
    # re-enters prebuffering.
    out = ring.pull(64)
    np.testing.assert_array_equal(out[:30], np.full(30, 2.0))
    np.testing.assert_array_equal(out[30:], np.zeros(34))
    assert ring.underruns == 1
    ring.push(np.ones(10, np.float32))
    np.testing.assert_array_equal(ring.pull(10), np.zeros(10))  # re-prebuffering


def test_playback_drop_on_overflow():
    ring = aio.PlaybackBuffer(prebuffer=10, max_buffer=100)
    ring.push(np.ones(90, np.float32))
    ring.push(np.ones(20, np.float32))  # would exceed max_buffer
    assert ring.dropped == 20
    assert ring.buffered == 90


def test_level_meter():
    lvl = aio.AudioLevel(smoothing=0.0)
    assert lvl.update(np.zeros(100, np.float32)) == pytest.approx(-120.0)
    assert lvl.update(np.ones(100, np.float32)) == pytest.approx(0.0, abs=1e-3)
    half = lvl.update(np.full(100, 0.5, np.float32))
    assert half == pytest.approx(-6.02, abs=0.1)


def test_graceful_degradation_without_backend(monkeypatch):
    """With no sounddevice on the host, MicSource/SpeakerSink raise
    AudioUnavailable with an actionable message; backend_name() is None."""
    monkeypatch.setattr(aio, "_sounddevice", lambda: None)
    assert aio.backend_name() is None
    with pytest.raises(aio.AudioUnavailable, match="sounddevice"):
        aio.MicSource()
    with pytest.raises(aio.AudioUnavailable, match="sounddevice"):
        aio.SpeakerSink()


def test_cli_mic_degrades(monkeypatch, capsys):
    """`cli stt-client --mic` exits with a clear error, not a traceback."""
    from dsm_tpu import cli

    rc = cli.main(["stt-client", "--mic", "--url", "ws://127.0.0.1:1/x"])
    # SystemExit from the frames generator is raised inside asyncio.run;
    # main returns nonzero or raises SystemExit — accept either surface.
    assert rc != 0


def test_mic_source_with_fake_backend(monkeypatch):
    """MicSource end-to-end against a fake sounddevice: device-rate capture
    chunks come out as 24 kHz 1920-sample frames."""

    class FakeStream:
        def __init__(self, samplerate, channels, device, callback):
            self.callback = callback
            self.samplerate = samplerate
            self.channels = channels

        def start(self):
            pass

        def stop(self):
            pass

        def close(self):
            pass

    class FakeSd:
        def query_devices(self, device, kind):
            return {"default_samplerate": 48_000.0, "max_input_channels": 2}

        InputStream = FakeStream

    monkeypatch.setattr(aio, "_sounddevice", lambda: FakeSd())
    assert aio.backend_name() == "sounddevice"
    with aio.MicSource() as mic:
        # Feed 48 kHz stereo blocks through the callback.
        t = np.arange(48_000) / 48_000
        x = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
        block = np.stack([x, x], axis=1)
        for i in range(0, len(x), 4800):
            mic._stream.callback(block[i : i + 4800], 4800, None, None)
        frames = []
        for _ in range(12):
            f = mic.read_frame(timeout=0.1)
            if f is None:
                break
            frames.append(f)
    assert len(frames) == 12  # 1 s at 48k -> ~24000 samples -> 12.5 frames
    assert all(f.shape == (1920,) for f in frames)
    got = np.concatenate(frames)
    t2 = np.arange(len(got)) / 24_000
    np.testing.assert_allclose(got, np.sin(2 * np.pi * 220.0 * t2), atol=2e-2)
