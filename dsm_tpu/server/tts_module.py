"""TTS serving engine: streaming session driver + offline synthesis.

Reference: moshi-server/src/tts.rs.  The host drives the per-frame word
feeding exactly like the reference process_loop (tts.rs:566-628):

  * while inside a word: force its next sentencepiece id (AllowedTokens::Text)
  * after a word: PadOrEpad until the model emits end-of-word
  * on eop: emit the word with [last_eop, now] 12.5 Hz timestamps, pull the
    next word; at end of input teacher-force a pad over the final eop
  * once input is exhausted: Pad for extra_steps + text_audio_delay frames

Audio frames come back from the device step already delay-resolved
(sessions/tts.step) and are Mimi-decoded to 1920-sample pcm chunks once
``step >= text_audio_delay + acoustic_delay`` (tts.rs:528-546).

The reference serialises all TTS inference behind one mutex (tts.rs:31,374;
batch=1 only).  Here the device step is batched (B sessions in lock-step)
— the engine exposes the same one-session API but the step function is
shared and jitted once; widening to continuous TTS batching is a scheduler
change, not a model change.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, Iterable, List, Optional, Tuple

import numpy as np

from ..models import lm as LM
from ..models import mimi as MIMI
from ..ops import transformer as T
from ..sessions import tts as TTS
from . import metrics


@dataclasses.dataclass
class WordEvent:
    text: str
    start_s: float
    stop_s: float


@dataclasses.dataclass
class AudioEvent:
    pcm: np.ndarray  # (1920,) float32


class TtsSession:
    """One streaming TTS generation (word queue in, events out)."""

    def __init__(self, engine: "TtsEngine", ca_kv=None, condition=None, seed: int = 0):
        import jax

        self.engine = engine
        cfg = engine.cfg
        self.cfg = cfg
        self.state = TTS.init_state(cfg, 1, engine.cache_dtype)
        self.mimi_state = MIMI.init_decode_state(engine.mimi_cfg, 1)
        self.ca_kv = ca_kv
        self.condition = condition
        self.rng = jax.random.PRNGKey(seed)
        self.word_queue: List[Optional[List[int]]] = []
        self.queue_lock = threading.Lock()
        self.queue_cv = threading.Condition(self.queue_lock)
        # Start with an empty token list so the first real word is awaited
        # (tts.rs:578 'start with an empty list').
        self.word_tokens: Optional[List[int]] = []
        self.token_idx = 0
        self.step_past_last = 0
        self.last_eop_step = 0
        self.step_idx = 0
        self.done = False

    # -- input side --

    def feed_words(self, words: Iterable[List[int]]) -> None:
        with self.queue_cv:
            for w in words:
                self.word_queue.append(list(w))
            self.queue_cv.notify_all()

    def end_input(self) -> None:
        with self.queue_cv:
            self.word_queue.append(None)
            self.queue_cv.notify_all()

    def _next_word(self, timeout: Optional[float]) -> Optional[List[int]]:
        with self.queue_cv:
            while not self.word_queue:
                if not self.queue_cv.wait(timeout=timeout):
                    raise TimeoutError("word queue starved")
            return self.word_queue.pop(0)

    # -- generation --

    def run(
        self,
        on_event: Callable[[object], None],
        max_steps: Optional[int] = None,
        word_timeout: Optional[float] = None,
    ) -> None:
        """Drive the session to completion, calling on_event with
        WordEvent/AudioEvent as they materialise."""
        import jax

        cfg = self.cfg
        eng = self.engine
        max_steps = max_steps or cfg.max_steps - cfg.acoustic_delay - 1
        t_start = time.perf_counter()
        pcm_out = 0

        for step_idx in range(max_steps):
            if self.word_tokens is None:
                self.step_past_last += 1
                if self.step_past_last > cfg.extra_steps + cfg.text_audio_delay_in_tokens:
                    break
                mode, tok = TTS.ALLOW_PAD, 0
            elif self.token_idx < len(self.word_tokens):
                mode, tok = TTS.ALLOW_TEXT, self.word_tokens[self.token_idx]
            else:
                mode, tok = TTS.ALLOW_PAD_OR_EPAD, 0

            self.rng, sub = jax.random.split(self.rng)
            out, self.state = eng.step_fn(
                eng.params, self.state,
                np.array([mode], np.int32), np.array([tok], np.int32),
                sub, self.ca_kv, self.condition,
            )
            text_token = int(out["text_token"][0])

            if text_token == cfg.text_eop_token:
                if self.word_tokens is not None and self.word_tokens:
                    text = eng.tokenizer.decode(self.word_tokens)
                    on_event(WordEvent(
                        text=text,
                        start_s=self.last_eop_step / 12.5,
                        stop_s=step_idx / 12.5,
                    ))
                self.last_eop_step = step_idx
                self.word_tokens = self._next_word(word_timeout)
                if self.word_tokens is None:
                    # Teacher-force pad over the final eop (tts.rs:607-610).
                    self.state = TTS.overwrite_last_text_token(
                        self.state, cfg.text_pad_token
                    )
                self.token_idx = 0
            elif text_token != cfg.text_pad_token:
                self.token_idx += 1

            # Audio out once past the combined delay (tts.rs:528-538).
            if (
                bool(out["frame_valid"][0])
                and step_idx >= cfg.text_audio_delay_in_tokens + cfg.acoustic_delay
            ):
                codes = np.asarray(out["frame"][0], np.int32)[None, :, None]
                pcm, self.mimi_state = eng.mimi_decode(
                    eng.mimi_params, self.mimi_state, codes
                )
                pcm = np.asarray(pcm[0, 0], np.float32)
                pcm_out += len(pcm)
                on_event(AudioEvent(pcm=pcm))
            self.step_idx = step_idx + 1

        self.done = True
        wall = time.perf_counter() - t_start
        metrics.TTS_SYNTHESIS_DURATION.observe(wall)
        metrics.TTS_REQUESTS_TOTAL.inc()
        if pcm_out:
            metrics.TTS_AUDIO_DURATION.inc(pcm_out / 24_000.0)
            metrics.TTS_RTF.set((pcm_out / 24_000.0) / max(wall, 1e-9))


class TtsEngine:
    """Model bundle + compiled step shared by all sessions."""

    def __init__(
        self,
        cfg: TTS.TtsConfig,
        params: dict,
        mimi_cfg: MIMI.MimiConfig,
        mimi_params: dict,
        tokenizer,
    ):
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        self.params = params
        self.mimi_cfg = mimi_cfg
        self.mimi_params = mimi_params
        self.tokenizer = tokenizer
        self.cache_dtype = (
            jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
        )
        self.lock = threading.Lock()  # single-inference (tts.rs:31)
        self.voices = None  # optional server.voices.VoiceResolver
        self.condition_provider = None  # models.conditioner.ConditionProvider
        self.default_condition = None  # (1, D) attribute embedding or None

        def _step(params, state, mode, tok, rng, ca_kv, condition):
            return TTS.step(cfg, params, state, mode, tok, rng, ca_kv, condition)

        self.step_fn = jax.jit(_step, donate_argnums=(1,))

        def _decode(p, s, codes):
            return MIMI.decode_step(mimi_cfg, p, s, codes)

        self.mimi_decode = jax.jit(_decode, donate_argnums=(1,))

    def voice_kv(self, spec: Optional[str]):
        """Resolve a ``?voice=`` spec to per-layer cross-attention K/V
        (tts.rs voice_ca_src :692-779)."""
        if not spec or self.voices is None:
            return None
        import jax.numpy as jnp

        from ..ops import transformer as T

        ca = self.voices.resolve(spec)
        if ca is None:
            return None
        return T.precompute_ca_kv(
            self.cfg.lm.transformer,
            self.params["lm"]["transformer"],
            jnp.asarray(ca, self.cache_dtype),
        )

    def encode_words(self, text: str, inserted_bos: bool) -> Tuple[List[List[int]], bool]:
        """Text -> per-word sentencepiece ids with a single leading bos
        (tts.rs recv_loop :480-494)."""
        words = []
        for word in text.split(" "):
            if not word:
                continue
            ids = list(self.tokenizer.encode(word))
            if not inserted_bos:
                ids.insert(0, self.cfg.text_bos_token)
                inserted_bos = True
            words.append(ids)
        return words, inserted_bos

    def synthesize(
        self, text: str, ca_kv=None, condition=None, seed: int = 0
    ) -> Tuple[np.ndarray, List[WordEvent]]:
        """Offline HTTP TTS (tts.rs run :781-943): full generation then
        concatenated pcm + word transcript."""
        with self.lock:
            session = TtsSession(self, ca_kv=ca_kv, condition=condition, seed=seed)
            words, _ = self.encode_words(text, inserted_bos=False)
            session.feed_words(words)
            session.end_input()
            pcm_chunks: List[np.ndarray] = []
            transcript: List[WordEvent] = []

            def sink(ev):
                if isinstance(ev, AudioEvent):
                    pcm_chunks.append(ev.pcm)
                else:
                    transcript.append(ev)

            session.run(sink)
        pcm = (
            np.concatenate(pcm_chunks)
            if pcm_chunks
            else np.zeros(0, np.float32)
        )
        return pcm, transcript
