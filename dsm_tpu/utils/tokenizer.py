"""SentencePiece-compatible text tokenizer (no sentencepiece dependency).

The reference loads `.model` files (SentencePiece ModelProto) via the
sentencepiece C++ library (moshi-server tokenizers, e.g. batched_asr.rs word
decode, tts.rs:450-498 word encode).  This module parses the protobuf
directly (it's a simple tagged wire format) and implements unigram Viterbi
segmentation, which is what all the Kyutai tokenizers use.

Supports: piece/score vocab, unknown pieces, byte-fallback (<0xNN>), the
whitespace marker '▁', and id<->piece/text round-trips sufficient for
the STT word decoding and TTS word encoding paths.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

_WS = "▁"


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val, pos = buf[pos : pos + 8], pos + 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val, pos = buf[pos : pos + ln], pos + ln
        elif wire == 5:  # 32-bit
            val, pos = buf[pos : pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


class SentencePieceModel:
    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    BYTE = 6
    UNUSED = 5

    def __init__(self, pieces: List[Tuple[str, float, int]]):
        self.pieces = pieces
        self.piece_to_id: Dict[str, int] = {}
        self.byte_to_id: Dict[int, int] = {}
        self.unk_id = 0
        for i, (p, _s, t) in enumerate(pieces):
            if p not in self.piece_to_id:
                self.piece_to_id[p] = i
            if t == self.UNKNOWN:
                self.unk_id = i
            if t == self.BYTE and len(p) == 6 and p.startswith("<0x"):
                self.byte_to_id[int(p[3:5], 16)] = i
        self.max_piece_len = max((len(p) for p, _, _ in pieces), default=1)

    # -- loading ----------------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "SentencePieceModel":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    @classmethod
    def from_bytes(cls, data: bytes) -> "SentencePieceModel":
        pieces: List[Tuple[str, float, int]] = []
        for field, wire, val in _iter_fields(data):
            if field == 1 and wire == 2:  # repeated SentencePiece
                piece, score, typ = "", 0.0, cls.NORMAL
                for f2, w2, v2 in _iter_fields(val):
                    if f2 == 1 and w2 == 2:
                        piece = v2.decode("utf-8", errors="replace")
                    elif f2 == 2 and w2 == 5:
                        import struct

                        score = struct.unpack("<f", v2)[0]
                    elif f2 == 3 and w2 == 0:
                        typ = v2
                pieces.append((piece, score, typ))
        if not pieces:
            raise ValueError("no pieces found; not a SentencePiece model?")
        return cls(pieces)

    # -- encoding ---------------------------------------------------------

    def vocab_size(self) -> int:
        return len(self.pieces)

    def encode(self, text: str, add_dummy_prefix: bool = True) -> List[int]:
        """Unigram Viterbi segmentation over the normalised text."""
        if not text:
            return []
        s = text.replace(" ", _WS)
        if add_dummy_prefix and not s.startswith(_WS):
            s = _WS + s
        n = len(s)
        best = [-math.inf] * (n + 1)
        back: List[Optional[Tuple[int, int]]] = [None] * (n + 1)
        best[0] = 0.0
        unk_penalty = min(sc for _, sc, _ in self.pieces) - 10.0
        for i in range(n):
            if best[i] == -math.inf:
                continue
            for j in range(i + 1, min(n, i + self.max_piece_len) + 1):
                pid = self.piece_to_id.get(s[i:j])
                if pid is not None:
                    sc = best[i] + self.pieces[pid][1]
                    if sc > best[j]:
                        best[j] = sc
                        back[j] = (i, pid)
            # unknown single char fallback
            sc = best[i] + unk_penalty
            if sc > best[i + 1]:
                best[i + 1] = sc
                back[i + 1] = (i, -1)
        ids: List[int] = []
        j = n
        rev: List[int] = []
        while j > 0:
            i, pid = back[j]
            if pid == -1:
                ch = s[i:j]
                bs = ch.encode("utf-8")
                if self.byte_to_id:
                    rev.extend(self.byte_to_id.get(b, self.unk_id) for b in reversed(bs))
                else:
                    rev.append(self.unk_id)
            else:
                rev.append(pid)
            j = i
        ids = list(reversed(rev))
        return ids

    # -- decoding ---------------------------------------------------------

    def id_to_piece(self, i: int) -> str:
        return self.pieces[i][0]

    def decode(self, ids: List[int]) -> str:
        out: List[str] = []
        byte_acc: List[int] = []

        def flush_bytes():
            if byte_acc:
                out.append(bytes(byte_acc).decode("utf-8", errors="replace"))
                byte_acc.clear()

        for i in ids:
            if i < 0 or i >= len(self.pieces):
                continue
            piece, _sc, typ = self.pieces[i]
            if typ == self.BYTE:
                byte_acc.append(int(piece[3:5], 16))
                continue
            flush_bytes()
            if typ in (self.CONTROL, self.UNKNOWN):
                continue
            out.append(piece)
        flush_bytes()
        text = "".join(out).replace(_WS, " ")
        return text.lstrip(" ")


class FallbackTokenizer:
    """Byte-level tokenizer used when no .model file is available (tests,
    offline dev).  ids = bytes + 3 (0..2 reserved like spm control ids)."""

    def __init__(self, vocab_size: int = 8000):
        self._vocab = vocab_size

    def vocab_size(self) -> int:
        return self._vocab

    def encode(self, text: str, add_dummy_prefix: bool = True) -> List[int]:
        return [3 + b for b in text.encode("utf-8")]

    def decode(self, ids: List[int]) -> str:
        return bytes(max(0, i - 3) & 0xFF for i in ids if i >= 3).decode(
            "utf-8", errors="replace"
        )


def load_tokenizer(path: Optional[str]):
    if path is None:
        return FallbackTokenizer()
    return SentencePieceModel.load(path)
