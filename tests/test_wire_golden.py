"""Byte-exact golden corpus for every message variant on all three wires.

Mirrors the reference's client-side golden test
(kyutai-client/src/stt/protocol.rs:64-110) but covers the FULL variant set
in both directions:

  * ASR msgpack — server OutMsg {Word, EndWord, Marker, Step, Error, Ready}
    (moshi-server/src/asr.rs:27-34) and client InMsg {Init, Audio, OggOpus,
    Marker, Ping} (asr.rs:17-23, kyutai-client/src/stt/protocol.rs:6-16).
  * TTS msgpack — server OutMsg {Text, Audio, OggOpus, Error, Ready}
    (moshi-server/src/tts.rs:171-177); input is raw text words + the b"\\0"
    binary EOS sentinel (tts.rs:468-472), not msgpack.
  * Duplex byte-tag protocol — all 10 MsgType tags
    (moshi-server/src/protocol.rs:105-148) with the 9-byte handshake
    (moshi-backend/src/stream_both.rs:258-268).

Expected bytes are hand-assembled from the msgpack spec (not produced by
the library under test), matching what rmp_serde with .with_struct_map()
emits: fixmap, declaration-order keys with "type" first, f64 timestamps,
f32 pcm/prs vectors.  rmp_serde (no serde_bytes) encodes Vec<u8> as an
ARRAY of ints while msgpack-python uses bin — decoders on both sides must
accept both; the corpus pins ours.
"""

import struct

import numpy as np
import pytest

from dsm_tpu.server import protocol as proto


# -- tiny spec-level msgpack assembler (independent of msgpack-python) ------

def _s(text: str) -> bytes:
    b = text.encode()
    assert len(b) < 32
    return bytes([0xA0 | len(b)]) + b


def _map(n: int) -> bytes:
    assert n < 16
    return bytes([0x80 | n])


def _arr(n: int) -> bytes:
    assert n < 16
    return bytes([0x90 | n])


def _f64(x: float) -> bytes:
    return b"\xcb" + struct.pack(">d", x)


def _f32(x: float) -> bytes:
    return b"\xca" + struct.pack(">f", x)


def _int(v: int) -> bytes:
    # Smallest-representation ints, as rmp_serde emits them.
    if 0 <= v < 128:
        return bytes([v])
    if -32 <= v < 0:
        return struct.pack("b", v)
    if 128 <= v < 256:
        return b"\xcc" + bytes([v])
    if 256 <= v < 65536:
        return b"\xcd" + struct.pack(">H", v)
    raise NotImplementedError(v)


def _bin(data: bytes) -> bytes:
    assert len(data) < 256
    return b"\xc4" + bytes([len(data)]) + data


# -- ASR server -> client (OutMsg) ------------------------------------------

ASR_OUT_GOLDEN = [
    # (encoder result, expected bytes)
    (
        proto.asr_word("hello", 1.5),
        _map(3) + _s("type") + _s("Word") + _s("text") + _s("hello")
        + _s("start_time") + _f64(1.5),
    ),
    (
        proto.asr_end_word(2.0),
        _map(2) + _s("type") + _s("EndWord") + _s("stop_time") + _f64(2.0),
    ),
    (
        proto.asr_marker(123),
        _map(2) + _s("type") + _s("Marker") + _s("id") + _int(123),
    ),
    (
        proto.asr_step(5, [0.25, 0.5], 1920),
        _map(4) + _s("type") + _s("Step") + _s("step_idx") + _int(5)
        + _s("prs") + _arr(2) + _f32(0.25) + _f32(0.5)
        + _s("buffered_pcm") + _int(1920),
    ),
    (
        proto.asr_error("boom"),
        _map(2) + _s("type") + _s("Error") + _s("message") + _s("boom"),
    ),
    (proto.asr_ready(), _map(1) + _s("type") + _s("Ready")),
]


@pytest.mark.parametrize("got,want", ASR_OUT_GOLDEN,
                         ids=["Word", "EndWord", "Marker", "Step", "Error",
                              "Ready"])
def test_asr_out_golden_bytes(got, want):
    assert got == want


def test_asr_word_matches_reference_client_fixture():
    """The exact byte vector from the Rust client's own golden test
    (kyutai-client/src/stt/protocol.rs:80-93)."""
    bytes_from_rust_test = bytes(
        [0x83, 0xA4] + list(b"type") + [0xA4] + list(b"Word")
        + [0xA4] + list(b"text") + [0xA5] + list(b"hello")
        + [0xAA] + list(b"start_time")
        + [0xCB, 0x3F, 0xF8, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00]
    )
    assert proto.asr_word("hello", 1.5) == bytes_from_rust_test


# -- ASR client -> server (InMsg): reference-canonical encodings our decoder
#    must accept ------------------------------------------------------------

ASR_IN_GOLDEN = [
    # (wire bytes as the Rust client emits them, expected decoded message)
    (_map(1) + _s("type") + _s("Init"), {"type": "Init"}),
    (
        _map(2) + _s("type") + _s("Marker") + _s("id") + _int(7),
        {"type": "Marker", "id": 7},
    ),
    (
        _map(2) + _s("type") + _s("Marker") + _s("id") + _int(-3),
        {"type": "Marker", "id": -3},
    ),
    (
        _map(2) + _s("type") + _s("Audio") + _s("pcm")
        + _arr(4) + _f32(0.0) + _f32(-0.25) + _f32(0.5) + _f32(1.0),
        {"type": "Audio", "pcm": [0.0, -0.25, 0.5, 1.0]},
    ),
    # Vec<u8> as rmp_serde emits it: an ARRAY of ints.
    (
        _map(2) + _s("type") + _s("OggOpus") + _s("data")
        + _arr(3) + _int(1) + _int(2) + _int(255),
        {"type": "OggOpus", "data": [1, 2, 255]},
    ),
    # Vec<u8> as msgpack-python emits it: bin.  bytes(payload) must work on
    # both forms (app.py:373 does exactly that).
    (
        _map(2) + _s("type") + _s("OggOpus") + _s("data")
        + _bin(b"\x01\x02\xff"),
        {"type": "OggOpus", "data": b"\x01\x02\xff"},
    ),
    (_map(1) + _s("type") + _s("Ping"), {"type": "Ping"}),
]


@pytest.mark.parametrize("wire,want", ASR_IN_GOLDEN,
                         ids=["Init", "Marker", "MarkerNeg", "Audio",
                              "OggOpusArray", "OggOpusBin", "Ping"])
def test_asr_in_decodes_reference_encoding(wire, want):
    got = proto.asr_in_msg(wire)
    assert got["type"] == want["type"]
    for k, v in want.items():
        if k == "pcm":
            np.testing.assert_allclose(got[k], v, rtol=0, atol=0)
        else:
            assert got[k] == v
    if got["type"] == "OggOpus":
        # Both the array-of-ints and bin forms must coerce to bytes the way
        # the server consumes them.
        assert bytes(got["data"]) == b"\x01\x02\xff"


def test_asr_in_missing_type_rejected():
    with pytest.raises(ValueError):
        proto.asr_in_msg(_map(1) + _s("id") + _int(1))


# -- TTS server -> client (OutMsg) -------------------------------------------

TTS_OUT_GOLDEN = [
    (
        proto.tts_text("hi", 0.5, 1.0),
        _map(4) + _s("type") + _s("Text") + _s("text") + _s("hi")
        + _s("start_s") + _f64(0.5) + _s("stop_s") + _f64(1.0),
    ),
    (
        proto.tts_audio([0.0, 0.5]),
        _map(2) + _s("type") + _s("Audio") + _s("pcm")
        + _arr(2) + _f32(0.0) + _f32(0.5),
    ),
    # OggOpusMessagePack is a DISTINCT OggOpus variant (tts.rs:174), not
    # Audio-with-data; we emit bin for the payload (decoders accept both
    # bin and the array form rmp_serde would emit).
    (
        proto.tts_audio_opus(b"OggS\x00"),
        _map(2) + _s("type") + _s("OggOpus") + _s("data") + _bin(b"OggS\x00"),
    ),
    (
        proto.tts_error("bad"),
        _map(2) + _s("type") + _s("Error") + _s("message") + _s("bad"),
    ),
    (proto.tts_ready(), _map(1) + _s("type") + _s("Ready")),
]


@pytest.mark.parametrize("got,want", TTS_OUT_GOLDEN,
                         ids=["Text", "Audio", "OggOpus", "Error", "Ready"])
def test_tts_out_golden_bytes(got, want):
    assert got == want


def test_tts_eos_sentinel():
    # Binary single NUL, not msgpack (tts.rs:468-472).
    assert proto.TTS_EOS == b"\x00"


# -- duplex byte-tag protocol -------------------------------------------------

def test_duplex_tag_values():
    """All 10 tags, exactly protocol.rs:120-131."""
    want = {
        "HANDSHAKE": 0, "AUDIO": 1, "TEXT": 2, "CONTROL": 3, "METADATA": 4,
        "ERROR": 5, "PING": 6, "COLORED_TEXT": 7, "IMAGE": 8, "CODES": 9,
    }
    got = {m.name: int(m) for m in proto.MsgType}
    assert got == want


def test_duplex_handshake_frame():
    """9 bytes: tag 0 + protocol version u32 (always 0) + model version u32
    (stream_both.rs:258-268)."""
    frame = bytes([proto.MsgType.HANDSHAKE]) + b"\x00" * 8
    assert len(frame) == 9
    assert frame[0] == 0
    proto_version = struct.unpack("<I", frame[1:5])[0]
    assert proto_version == 0


DUPLEX_FRAMES = [
    ("HANDSHAKE", b"\x00" + b"\x00" * 8),
    ("AUDIO", b"\x01" + b"\x12\x34opuspayload"),
    ("TEXT", b"\x02" + "héllo".encode()),
    ("CONTROL", b"\x03" + b"\x01"),
    ("METADATA", b"\x04" + b'{"model": "x"}'),
    ("ERROR", b"\x05" + b"oops"),
    ("PING", b"\x06"),
    ("COLORED_TEXT", b"\x07" + b"\x02word"),
    ("IMAGE", b"\x08" + b"\x89PNG"),
    ("CODES", b"\x09" + np.arange(4, dtype="<i4").tobytes()),
]


@pytest.mark.parametrize("name,frame", DUPLEX_FRAMES,
                         ids=[n for n, _ in DUPLEX_FRAMES])
def test_duplex_frame_roundtrip(name, frame):
    from dsm_tpu.server import duplex as dpx

    tag, payload = dpx.parse_frame(frame)
    assert tag == proto.MsgType[name]
    assert payload == frame[1:]


def test_duplex_frame_builders():
    from dsm_tpu.server import duplex as dpx

    pcm = np.asarray([0.0, 0.5, -0.5], np.float32)
    assert dpx.audio_frame(pcm) == b"\x01" + pcm.astype("<f4").tobytes()
    assert dpx.text_frame("ok") == b"\x02ok"
