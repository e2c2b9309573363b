"""TTS text preprocessing (reference: moshi-server/src/tts_preprocess.rs).

Normalisation, ``<break time="1.5s"/>`` SSML-ish parsing into pad-token runs
at 12.5 tokens/s (capped at 10 s), word tokenization with a single leading
bos.
"""

from __future__ import annotations

import dataclasses
import re
from typing import List, Union

_BREAK_RE = re.compile(r'<break\s+time="([0-9.]+)s"\s*/>')


def normalize(text: str) -> str:
    return (
        text.replace("’", "'")
        .replace("–", "")
        .replace(":", " ")
        .replace("(", "")
        .replace(")", "")
    )


@dataclasses.dataclass
class BreakTime:
    seconds: float


Segment = Union[str, BreakTime]


def parse_segments(text: str) -> List[Segment]:
    segments: List[Segment] = []
    last = 0
    for m in _BREAK_RE.finditer(text):
        if m.start() > last:
            chunk = text[last : m.start()]
            if chunk.strip():
                segments.append(chunk)
        try:
            segments.append(BreakTime(float(m.group(1))))
        except ValueError:
            pass
        last = m.end()
    if last < len(text):
        chunk = text[last:].strip()
        if chunk:
            segments.append(chunk)
    return segments


@dataclasses.dataclass
class WordWithTokens:
    word: str
    tokens: List[int]


class Preprocessor:
    def __init__(self, tokenizer, text_bos_token: int, text_pad_token: int = 3):
        self.tok = tokenizer
        self.inserted_bos = False
        self.bos = text_bos_token
        self.pad = text_pad_token

    def preprocess(self, query: str) -> List[WordWithTokens]:
        out: List[WordWithTokens] = []
        for seg in parse_segments(query):
            if isinstance(seg, BreakTime):
                if seg.seconds > 0:
                    npad = max(int(min(seg.seconds, 10.0) * 12.5), 1)
                    out.append(
                        WordWithTokens(
                            word=f'<break time="{seg.seconds:.2f}s">',
                            tokens=[self.pad] * npad,
                        )
                    )
                continue
            for word in normalize(seg).split():
                tokens = list(self.tok.encode(word))
                if not self.inserted_bos:
                    self.inserted_bos = True
                    tokens.insert(0, self.bos)
                out.append(WordWithTokens(word=word, tokens=tokens))
        return out
