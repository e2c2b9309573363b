"""Full-duplex Moshi dialogue serving (reference: moshi-backend
stream_both.rs + moshi-server/src/lm.rs /api/lm-streaming).

One websocket speaks the byte-tag protocol (protocol.rs MsgType), wire-
compatible with reference duplex clients (moshi-cli multistream.rs):
AUDIO frames carry OggOpus in both directions (lm.rs:77-318 decodes
incoming opus and re-encodes model speech; stream_both.rs:221-319 MsgSender
packetizes one opus packet per ogg page).  ``?format=pcm`` selects raw
float32 pcm frames instead (our extension for codec-less clients/tests).
The server runs the 80 ms loop

  Mimi.encode_step(user pcm) -> lm_gen.step -> Mimi.decode_step(model frame)

and sends back AUDIO (model speech) + TEXT (model words) frames.  The model
loop runs on a dedicated thread at frame cadence, exactly the reference's
run_with_state structure (stream_both.rs:385-445) with the whole numeric
path fused into jitted steps.  ``asr_delay_in_tokens`` switches a session
into the ASR-only delay mode (run_with_state_asr, stream_both.rs:329-383):
text transcription only, no audio out.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional

import numpy as np

from ..models import mimi as MIMI
from ..sessions import lm_gen
from .protocol import MsgType


class DuplexEngine:
    def __init__(
        self,
        cfg: lm_gen.DuplexConfig,
        params: dict,
        mimi_cfg: MIMI.MimiConfig,
        mimi_params: dict,
        tokenizer,
        kv_quant: Optional[bool] = None,
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
        # Serving profile on accelerators, like the other engines: int8 KV
        # rings + weight-only int8 LM (moshi-7B duplex at batch 1 is
        # weight-read-bound; int8 halves it).
        if kv_quant is None:
            kv_quant = jax.default_backend() != "cpu"
        self.kv_quant = kv_quant
        if self.kv_quant:
            from ..ops import transformer as TT

            params = dict(params)
            params["lm"] = TT.quantize_weights(params["lm"])
            self.params = params
        self.lock = threading.Lock()  # one dialogue at a time per engine

        self._enc = jax.jit(
            lambda p, s, x: MIMI.encode_step(mimi_cfg, p, s, x), donate_argnums=(1,)
        )
        self._dec = jax.jit(
            lambda p, s, c: MIMI.decode_step(mimi_cfg, p, s, c), donate_argnums=(1,)
        )
        self._step = jax.jit(
            lambda p, s, a, k, d: lm_gen.step(cfg, p, s, a, k, asr_delay=d),
            donate_argnums=(1,),
        )

    def warmup(self) -> None:
        """Compile encode/step/decode before serving (main.rs module
        warmup) so the first chat frame pays no XLA compile in-request."""
        import jax
        import numpy as np

        sess = DuplexSession(self)
        enc_state = MIMI.init_encode_state(self.mimi_cfg, 1)
        pcm = np.zeros((1, 1, self.mimi_cfg.frame_size), np.float32)
        codes, enc_state = self._enc(self.mimi_params, enc_state, pcm)
        user_tokens = np.asarray(codes[..., 0], np.int32)[
            :, : self.cfg.input_audio_codebooks
        ]
        out, _ = self._step(self.params, sess.state, user_tokens,
                            jax.random.PRNGKey(0), np.int32(0))
        dec_state = MIMI.init_decode_state(self.mimi_cfg, 1)
        frame = np.zeros(
            (1, self.cfg.generated_audio_codebooks, 1), np.int32
        )
        pcm_out, _ = self._dec(self.mimi_params, dec_state, frame)
        np.asarray(pcm_out)


class DuplexSession:
    """One dialogue: pcm frames in, (pcm, text) out via callback."""

    def __init__(self, engine: DuplexEngine, seed: int = 0,
                 asr_delay_in_tokens: int = 0):
        import jax

        self.engine = engine
        self.in_q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(maxsize=100)
        self.rng = jax.random.PRNGKey(seed)
        self.enc_state = MIMI.init_encode_state(engine.mimi_cfg, 1)
        self.dec_state = MIMI.init_decode_state(engine.mimi_cfg, 1)
        self.state = lm_gen.init_state(
            engine.cfg, 1, engine.cache_dtype, kv_quant=engine.kv_quant
        )
        self.steps = 0
        # ASR-only delay mode (stream_both.rs:329-383): > 0 suppresses the
        # text input during the delay window and mutes audio output.
        self.asr_delay = int(asr_delay_in_tokens)

    def push_pcm(self, pcm: np.ndarray) -> None:
        self.in_q.put(np.asarray(pcm, np.float32))

    def close(self) -> None:
        self.in_q.put(None)

    def run(self, on_audio: Callable[[np.ndarray], None],
            on_text: Callable[[str], None]) -> None:
        import jax

        eng = self.engine
        frame = eng.mimi_cfg.frame_size
        buf = np.zeros(0, np.float32)
        text_acc = []
        with eng.lock:
            while True:
                item = self.in_q.get()
                if item is None:
                    break
                buf = np.concatenate([buf, item])
                while len(buf) >= frame:
                    chunk, buf = buf[:frame], buf[frame:]
                    codes, self.enc_state = eng._enc(
                        eng.params["mimi"], self.enc_state, chunk[None, None, :]
                    )
                    user_tokens = np.asarray(codes[..., 0], np.int32)[
                        :, : eng.cfg.input_audio_codebooks
                    ]
                    self.rng, sub = jax.random.split(self.rng)
                    out, self.state = eng._step(
                        eng.params, self.state, user_tokens, sub,
                        np.int32(self.asr_delay),
                    )
                    self.steps += 1
                    tok = int(out["text_token"][0])
                    if tok not in (
                        eng.cfg.text_pad_token,
                        eng.cfg.text_eop_token,
                        eng.cfg.text_start_token,
                    ):
                        text_acc.append(tok)
                    elif text_acc:
                        on_text(eng.tokenizer.decode(text_acc))
                        text_acc = []
                    if self.asr_delay <= 0 and bool(out["frame_valid"][0]):
                        # ASR-delay mode sends text only
                        # (run_with_state_asr emits no StreamOut::Pcm).
                        frame_codes = np.asarray(out["frame"], np.int32)[:, :, None]
                        pcm, self.dec_state = eng._dec(
                            eng.params["mimi"], self.dec_state, frame_codes
                        )
                        on_audio(np.asarray(pcm[0, 0], np.float32))
            if text_acc:
                on_text(eng.tokenizer.decode(text_acc))


def audio_frame(pcm: np.ndarray) -> bytes:
    return bytes([MsgType.AUDIO]) + np.asarray(pcm, "<f4").tobytes()


def text_frame(text: str) -> bytes:
    return bytes([MsgType.TEXT]) + text.encode()


def parse_frame(data: bytes):
    """-> (MsgType, payload)"""
    if not data:
        raise ValueError("empty frame")
    return MsgType(data[0]), data[1:]
