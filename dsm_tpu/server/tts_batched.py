"""Continuously-batched TTS serving engine.

Goes beyond the reference, which serialises all TTS inference behind a
batch=1 mutex (tts.rs:31,374): here N independent TTS sessions run
lock-step in one jitted step (sessions/tts.py carries per-slot step
counters), sharing the model exactly like the batched ASR path.  Per-slot
voices work because the cross-attention KV source is batched (L, B, H, S,
Dh) — opening a session writes its voice into that slot.

Host side per slot: the word-feeding state machine of the reference's
process_loop (tts.rs:566-628) — Text/Pad/PadOrEpad constraint selection,
eop timestamps, final-word pad forcing, extra-steps drain — plus a batched
Mimi decode for completed frames.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import threading
import time
from collections import deque
from typing import Callable, List, Optional

import numpy as np

from ..models import mimi as MIMI
from ..ops import transformer as T
from ..sessions import tts as TTS
from ..sessions import tts_script as SCRIPT
from . import metrics
from .tts_module import AudioEvent, WordEvent

log = logging.getLogger("dsm.tts")


@dataclasses.dataclass
class DoneEvent:
    pass


class TtsSlot:
    """Host word-feeding driver for one session (tts.rs process_loop)."""

    def __init__(self, slot: int, deliver: Callable[[object], None],
                 fused: bool = False):
        self.slot = slot
        self.deliver = deliver
        self.lock = threading.Lock()
        self.word_queue: deque = deque()
        self.eos = False
        # Empty current word -> await the first real word (tts.rs:578).
        self.word_tokens: Optional[List[int]] = []
        self.token_idx = 0
        self.step_past_last = 0
        self.last_eop_step = 0
        self.steps = 0
        self.finished = False
        self.closed = False
        self.pcm_samples = 0
        self.started = time.time()
        # Fused (multi-tick) mode: the device script machine
        # (sessions/tts_script.py) drives constraints; this object becomes
        # the deterministic host MIRROR.  New words/eos land in ``pending_*``
        # and only become visible (word_queue / eos) when the engine uploads
        # them at a dispatch boundary — so mirror replay and the device see
        # the same script prefix.
        self.fused = fused
        self.pending_words: deque = deque()
        self.pending_eos = False
        self.up_toks = 0  # absolute script tokens uploaded to the device
        self.up_words = 0
        self.consumed = 0  # script tokens consumed (mirror accounting)

    def feed_words(self, words) -> None:
        with self.lock:
            tgt = self.pending_words if self.fused else self.word_queue
            for w in words:
                tgt.append(list(w))

    def end_input(self) -> None:
        with self.lock:
            if self.fused:
                self.pending_eos = True
            else:
                self.eos = True

    def next_constraint(self, cfg: TTS.TtsConfig):
        """-> (mode, token, stalled): the AllowedTokens decision."""
        if self.word_tokens is None:
            self.step_past_last += 1
            if self.step_past_last > cfg.extra_steps + cfg.text_audio_delay_in_tokens:
                return None  # session complete
            return (TTS.ALLOW_PAD, 0, False)
        if self.token_idx < len(self.word_tokens):
            return (TTS.ALLOW_TEXT, self.word_tokens[self.token_idx], False)
        return (TTS.ALLOW_PAD_OR_EPAD, 0, False)

    def on_text_token(self, cfg: TTS.TtsConfig, tok: int, tokenizer):
        """Advance the driver with the sampled/forced token.  Returns
        'overwrite_pad' when the final eop must be patched to a pad."""
        patch = None
        if tok == cfg.text_eop_token:
            if self.word_tokens:
                text = tokenizer.decode(self.word_tokens)
                self.deliver(
                    WordEvent(
                        text=text,
                        start_s=self.last_eop_step / 12.5,
                        stop_s=self.steps / 12.5,
                    )
                )
            self.last_eop_step = self.steps
            with self.lock:
                if self.word_queue:
                    self.word_tokens = list(self.word_queue.popleft())
                elif self.eos:
                    self.word_tokens = None
                    patch = "overwrite_pad"
                else:
                    # Starved: stay on an empty word -> PadOrEpad again.
                    self.word_tokens = []
            self.token_idx = 0
        elif tok != cfg.text_pad_token:
            self.token_idx += 1
            self.consumed += 1
        return patch


class BatchedTtsEngine:
    def __init__(
        self,
        cfg: TTS.TtsConfig,
        params: dict,
        mimi_cfg: MIMI.MimiConfig,
        mimi_params: dict,
        tokenizer,
        batch_size: int = 8,
        ca_len: Optional[int] = None,
        tick_sleep: float = 0.002,
        cfg_enabled: bool = False,
        ca_quant: Optional[bool] = None,
        mesh=None,
        fuse_ticks: int = 1,
        script_cap: int = 1024,
        pipeline_depth: int = 1,
        pcm_wire_int16: Optional[bool] = None,
    ):
        """``mesh``: optional jax Mesh (dp[, tp]) — session state (and the
        doubled CFG rows) shard over dp; with tp > 1 the LM weights take
        the Megatron column/row split and KV + voice-CA heads shard over
        tp (GSPMD inserts the psum joins).  Pallas kernels are
        trace-disabled under a mesh (GSPMD cannot partition pallas_call;
        same rule as BatchedAsrEngine)."""
        import jax
        import jax.numpy as jnp

        assert cfg.cfg_alpha is None, (
            "set cfg_enabled=True for batched CFG (per-request alpha); the "
            "static session-level cfg_alpha is for unbatched sessions"
        )
        self.cfg = cfg
        self.mimi_cfg = mimi_cfg
        self.params = params
        self.mimi_params = mimi_params
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.tick_sleep = tick_sleep
        self.condition_provider = None
        self.default_condition = None
        # Classifier-free guidance in continuous batching: the model batch is
        # doubled [cond rows..., uncond rows...] (uncond = zero voice CA);
        # per-request alpha rides as a traced vector, alpha=1 slots reduce to
        # unguided output, so guided and unguided sessions share the program.
        # The reference serves cfg_alpha per request but only batch=1
        # (main.rs:1045-1074, tts.rs:31,374).
        self.cfg_enabled = cfg_enabled
        self.rows = batch_size * 2 if cfg_enabled else batch_size
        self.cache_dtype = (
            jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
        )
        # int8 voice source: perf-neutral at batch 32 (the frame is
        # depformer-bound, measured 31.8 vs 30.6 ms) and HALVES the CA
        # memory — the buffer that gates larger batches.  The store is
        # int8-NATIVE (per-slot quantised writes; no bf16 twin buffer) —
        # opt-in via TOML `ca_int8 = true` / DSM_TTS_CA_INT8 for
        # memory-bound deployments (B>=64).
        self.ca_quant = bool(ca_quant)

        tcfg = cfg.lm.transformer
        self.ca_len = ca_len or (125 * cfg.speaker_cond_n_speakers)
        # Voice-conditioning source lives ON DEVICE; open_session touches
        # only its slot via a jitted dynamic_update_slice.  (Keeping a host
        # mirror and re-uploading on change moves the full L x rows x H x S
        # x Dh buffer — 5.2 GB at dsm-tts-1.6b B=32 — per slot churn; the
        # reference keeps per-connection ca_src on device too, tts.rs:304.)
        ca_shape = (
            tcfg.num_layers, self.rows, tcfg.num_heads, self.ca_len, tcfg.hd
        )
        if not self.ca_quant:
            self._ca_raw = (
                jnp.zeros(ca_shape, self.cache_dtype),
                jnp.zeros(ca_shape, self.cache_dtype),
            )
        self._zero_voice = jnp.zeros(
            (tcfg.num_layers, 1, tcfg.num_heads, self.ca_len, tcfg.hd),
            self.cache_dtype,
        )
        self._ca_write = jax.jit(
            lambda ca, kv, slot: jax.lax.dynamic_update_slice(
                ca, kv.astype(ca.dtype), (0, slot, 0, 0, 0)
            ),
            donate_argnums=(0,),
        )
        if self.ca_quant:
            # int8-NATIVE store: the served buffer IS the quantised form
            # (int8 K/V + f32 per-row scales, source rows padded to the
            # 128-lane tile).  Per-slot voice writes quantise the incoming
            # slot's bf16 KV on device and dynamic_update_slice into the
            # int8 buffers — no bf16 twin buffer lives alongside (the
            # earlier requantise-on-dirty design kept both, so "int8 CA"
            # GREW peak HBM by 1.5x instead of halving it; the halving is
            # what gates B>=64).
            s_pad = self.ca_len + ((-self.ca_len) % 128)
            qz = jnp.zeros(
                (tcfg.num_layers, self.rows, tcfg.num_heads, s_pad, tcfg.hd),
                jnp.int8,
            )
            sz = jnp.zeros(
                (tcfg.num_layers, self.rows, tcfg.num_heads, s_pad),
                jnp.float32,
            )
            self._ca_raw = {
                "k": qz, "v": jnp.zeros_like(qz),
                "ks": sz, "vs": jnp.zeros_like(sz),
                "s_len": jnp.int32(self.ca_len),
            }

            def _wq(bufs, k, v, slot):
                qd = T.quantize_ca_kv(
                    (k.astype(self.cache_dtype), v.astype(self.cache_dtype)),
                    s_len=self.ca_len,
                )
                return {
                    "k": jax.lax.dynamic_update_slice(
                        bufs["k"], qd["k"], (0, slot, 0, 0, 0)
                    ),
                    "v": jax.lax.dynamic_update_slice(
                        bufs["v"], qd["v"], (0, slot, 0, 0, 0)
                    ),
                    "ks": jax.lax.dynamic_update_slice(
                        bufs["ks"], qd["ks"], (0, slot, 0, 0)
                    ),
                    "vs": jax.lax.dynamic_update_slice(
                        bufs["vs"], qd["vs"], (0, slot, 0, 0)
                    ),
                    "s_len": bufs["s_len"],
                }

            self._ca_write_q = jax.jit(_wq, donate_argnums=(0,))

            def _zq(bufs, slots):
                # Batched zero-write: one scatter over a slot-index vector
                # (padded with an out-of-range index, mode="drop").  A
                # session-completion WAVE otherwise issues one tunneled
                # dispatch PER reopened slot — measured as the 1.4 s
                # gather stall at B=64 (gw_voice_ms 1417 with n_voice 64,
                # docs/SUSTAINED_TTS_r05_b64_subphase_events.json).
                # Scatter the QUANTISED zero voice (q=0 rows with the
                # quantiser's eps scale) so the buffers stay bit-identical
                # to the per-slot _ca_write_q path.
                zq = T.quantize_ca_kv(
                    (self._zero_voice, self._zero_voice), s_len=self.ca_len
                )
                return {
                    "k": bufs["k"].at[:, slots].set(zq["k"], mode="drop"),
                    "v": bufs["v"].at[:, slots].set(zq["v"], mode="drop"),
                    "ks": bufs["ks"].at[:, slots].set(
                        zq["ks"], mode="drop"
                    ),
                    "vs": bufs["vs"].at[:, slots].set(
                        zq["vs"], mode="drop"
                    ),
                    "s_len": bufs["s_len"],
                }

            self._ca_zero_q = jax.jit(_zq, donate_argnums=(0,))
        self._ca_zero = jax.jit(
            lambda ca, slots: ca.at[:, slots].set(0, mode="drop"),
            donate_argnums=(0,),
        )
        # Zero-write slot vectors are padded to a few bucket sizes so the
        # batched path compiles O(1) variants, not O(batch).
        self._zero_buckets = tuple(sorted({8, self.rows}))
        # Voice writes are queued and applied ON THE ENGINE LOOP THREAD at
        # the top of tick(): _ca_write donates the CA buffer in place, and
        # donating from the WS thread could race an in-flight step that is
        # still reading it (same hazard the reference avoids by keeping
        # ca_src per-connection; tts.rs:304-365).
        self._pending_voice: List[tuple] = []

        self.state = TTS.init_state(cfg, self.rows, self.cache_dtype)
        self.mimi_state = MIMI.init_decode_state(mimi_cfg, batch_size)
        # Per-slot sampling params (traced -> no recompiles across requests;
        # reference TtsQuery temp/seed/cfg_alpha params).
        self._text_temp = np.full(batch_size, cfg.text_temperature, np.float32)
        self._audio_temp = np.full(batch_size, cfg.temperature, np.float32)
        self._cfg_alpha = np.ones(batch_size, np.float32)
        self._seeds = np.zeros(batch_size, np.uint32)
        self._seed_counter = int(time.time()) & 0x7FFFFFFF
        self.rng = jax.random.PRNGKey(int(time.time()))

        self.slots: List[Optional[TtsSlot]] = [None] * batch_size
        self.free: deque = deque(range(batch_size))
        self.pending_resets = np.zeros(batch_size, bool)
        self.slot_lock = threading.Lock()
        self.running = False
        self.thread = None
        # Optional (gather_s, dispatch_s, fetch_s, post_s) per-tick callback
        # (the sustained bench reports phase percentiles).
        self.tick_observer = None

        self.mesh = mesh
        if mesh is not None:
            from ..parallel import mesh as M

            tp = mesh.shape.get("tp", 1)
            if self.rows % mesh.shape["dp"]:
                raise ValueError(
                    f"rows {self.rows} not divisible by dp={mesh.shape['dp']}"
                )
            if tp > 1 and cfg.lm.transformer.num_heads % tp:
                raise ValueError(
                    f"num_heads {cfg.lm.transformer.num_heads} not divisible "
                    f"by tp={tp}"
                )
            # tp > 1: Megatron-split LM weights over tp (GSPMD inserts the
            # psum joins; parallel/mesh._spec_for_param rules, incl. the
            # depformer's (S, L, out, in) stacks and the voice-CA
            # projections).  The Pallas kernels are already trace-disabled
            # under any mesh, so the XLA paths partition cleanly.
            self.params = (
                M.shard_transformer_params(mesh, self.params)
                if tp > 1 else M.replicate(mesh, self.params)
            )
            self.mimi_params = M.replicate(mesh, self.mimi_params)
            self.state = M.shard_batched_state(mesh, self.state, self.rows)
            self.mimi_state = M.shard_batched_state(
                mesh, self.mimi_state, batch_size
            )
            # Voice CA: rows ride on axis 1 of (L, rows, H, S, Dh); heads
            # follow the attention tp split.
            from jax.sharding import NamedSharding, PartitionSpec as P

            tp_ax = "tp" if tp > 1 else None
            ca_sh = NamedSharding(mesh, P(None, "dp", tp_ax, None, None))
            if self.ca_quant:
                ca_sh4 = NamedSharding(mesh, P(None, "dp", tp_ax, None))
                self._ca_raw = {
                    "k": jax.device_put(self._ca_raw["k"], ca_sh),
                    "v": jax.device_put(self._ca_raw["v"], ca_sh),
                    "ks": jax.device_put(self._ca_raw["ks"], ca_sh4),
                    "vs": jax.device_put(self._ca_raw["vs"], ca_sh4),
                    "s_len": self._ca_raw["s_len"],
                }
            else:
                self._ca_raw = tuple(
                    jax.device_put(a, ca_sh) for a in self._ca_raw
                )

        n = batch_size
        delay = cfg.text_audio_delay_in_tokens + cfg.acoustic_delay

        # Opt-in int16 audio DOWNLOAD wire (DSM_TTS_PCM_I16=1): the tick's
        # fetch is its dominant phase and mostly audio payload (B x K x
        # 1920 f32 ≈ 2 MB at B=64/fuse4 over a ~40 MB/s dev tunnel);
        # quantising to int16 pairs on device halves it.  -96 dB on OUTPUT
        # audio (inaudible; client DACs are 16-bit anyway), but not the
        # default: the fused/unfused bit-identity tests pin the f32 wire.
        # The conversion lives in a SEPARATE tiny jit applied to the step's
        # packed output — NOT inside the step program — so flipping the
        # wire never invalidates the flagship compile (the r4 i16 TTS leg
        # paid a fresh >2400 s compile because the toggle was traced into
        # the fused scan; docs/chipq/tts_i16_leg_attempt.json).
        import os as _os

        # Constructor arg (TOML pcm_wire via the builder) beats the
        # DSM_TTS_PCM_I16 env knob, same precedence rule as every other
        # preset key.
        pcm_wire_i16 = (
            pcm_wire_int16
            if pcm_wire_int16 is not None
            else _os.environ.get("DSM_TTS_PCM_I16", "0") not in (
                "0", "", "false"
            )
        )
        self._pcm_wire_i16 = pcm_wire_i16

        def _pack_frame(out, active_n, mimi_params, mimi_state):
            """Shared tail of a tick: delay-gated masked Mimi decode + the
            single packed int32 host-bound array (text, steps, dec_mask,
            bitcast pcm).  Both the single-tick and the fused-scan paths
            MUST use this — their bit-identity is the correctness contract
            of tests/test_tts_fused.py."""
            steps = out["step_idx"][:n]
            dec_mask = (
                out["frame_valid"][:n] & (steps > delay) & active_n
            )
            codes = out["frame"][:n, :, None].astype(jnp.int32)
            pcm, mimi_state = MIMI.decode_step(
                mimi_cfg, mimi_params, mimi_state, codes, dec_mask
            )
            row = pcm[:, 0, :].astype(jnp.float32)
            pcm_words = jax.lax.bitcast_convert_type(
                row, jnp.int32
            ).reshape(-1)
            packed = jnp.concatenate([
                out["text_token"][:n].astype(jnp.int32),
                steps.astype(jnp.int32),
                dec_mask.astype(jnp.int32),
                pcm_words,
            ])
            return packed, mimi_state

        def _step(params, state, mimi_params, mimi_state, mode, tok, rng,
                  ca_kv, mask, reset, temps, seeds, alpha):
            """One fused tick: LM step + (masked) Mimi decode, all host-bound
            outputs packed into ONE int32 array — a TTS tick is inherently
            serial (the sampled text token drives the next constraint), so
            per-frame latency is the realtime bound and every extra
            device->host fetch pays a full round-trip (~29 ms over this
            env's dev tunnel)."""
            from ..ops import ring_kernels as _rk

            with _rk.kernels_forced(
                False if mesh is not None else _rk.kernels_override()
            ):
                if cfg_enabled:
                    out, state = TTS.step(
                        cfg, params, state, mode, tok, rng, ca_kv=ca_kv,
                        mask=mask, reset=reset, temps=temps, seeds=seeds,
                        cfg_alpha=alpha,
                    )
                else:
                    out, state = TTS.step(
                        cfg, params, state, mode, tok, rng, ca_kv=ca_kv,
                        mask=mask, reset=reset, temps=temps, seeds=seeds,
                    )
            packed, mimi_state = _pack_frame(
                out, mask[:n], mimi_params, mimi_state
            )
            return packed, state, mimi_state

        self._step = jax.jit(_step, donate_argnums=(1, 3))

        fs = mimi_cfg.frame_size

        def _wire_i16(packed):
            """Device-side wire epilogue: rewrite the packed tail (f32-bit
            pcm words) as int16 pairs, halving the fetch.  A few-μs
            elementwise program compiled separately from the step, so the
            wire toggle shares the step's compile cache."""
            head = packed[..., : 3 * n]
            pcm = jax.lax.bitcast_convert_type(
                packed[..., 3 * n :], jnp.float32
            )
            p16 = jnp.clip(pcm * 32767.0, -32767.0, 32767.0).astype(jnp.int16)
            words = jax.lax.bitcast_convert_type(
                p16.reshape(packed.shape[:-1] + (n * fs // 2, 2)), jnp.int32
            )
            return jnp.concatenate([head, words], axis=-1)

        self._wire_fn = jax.jit(_wire_i16) if pcm_wire_i16 else None

        # -- fused multi-tick path: the device script machine
        # (sessions/tts_script.py) computes the AllowedTokens constraint
        # per frame, so ``fuse_ticks`` frames run inside ONE lax.scan
        # dispatch — the host round-trip that bounds the per-frame tick in
        # the reference design (tts.rs:560-610 walks the script on the
        # host) amortises across K frames.
        self.fuse = max(1, int(fuse_ticks))
        self.script_cap = int(script_cap)
        # Dispatch-ahead (fused path only; same design as
        # BatchedDuplexEngine.pipeline_depth): the device script machine
        # means tick N+1's INPUTS never depend on tick N's fetched output
        # — the host mirror only replays tokens for event emission and a
        # conservative upload-space view — so depth D keeps D-1 dispatches
        # in flight and the device step overlaps the previous fetch + post.
        # Trades up to fuse*(D-1) frames of delivery latency for cadence.
        self.pipeline_depth = max(1, int(pipeline_depth))
        if self.pipeline_depth > 1 and self.fuse == 1:
            # _tick_single ignores pipeline_depth; warn so a misconfigured
            # bench (DSM_TTS_PIPELINE=2 without DSM_TTS_FUSE>1) isn't
            # silently measuring the unpipelined path.
            log.warning(
                "tts: pipeline_depth=%d has no effect with fuse_ticks=1; "
                "set fuse_ticks>1 to enable dispatch-ahead",
                self.pipeline_depth,
            )
        self._inflight_f: deque = deque()
        self._last_fetch_t: Optional[float] = None
        if self.fuse > 1:
            cc = SCRIPT.ScriptConsts.from_cfg(cfg)
            self._mstate = SCRIPT.init(n, self.script_cap)
            if mesh is not None:
                from ..parallel import mesh as M

                self._mstate = M.shard_batched_state(mesh, self._mstate, n)
            # Queued ops are flushed in ONE batched dispatch per bucket
            # (SCRIPT.apply_ops).  One jitted dispatch PER op — the
            # original design — cost ~52 dispatches per session open
            # (init + one chunk per word + eos), which stalled the tick
            # for seconds at session churn (the measured tick p99 in
            # docs/SUSTAINED_TTS_r03_b*_fuse4.json).
            self._m_ops = jax.jit(SCRIPT.apply_ops, donate_argnums=(0,))
            self._op_buckets = (8, 64, 512)
            self._pending_script: List[tuple] = []
            K = self.fuse

            def dup_rows(a):
                return jnp.concatenate([a, a]) if cfg_enabled else a

            def _fused(params, state, mimi_params, mimi_state, mstate, rng,
                       ca_kv, reset, temps, seeds, alpha):
                from ..ops import ring_kernels as _rk

                with _rk.kernels_forced(
                    False if mesh is not None else _rk.kernels_override()
                ):
                    state = TTS.reset_slots(cfg, state, dup_rows(reset))

                    def body(carry, k):
                        state, mimi_state, mstate = carry
                        mode, tok, step_mask, mstate = SCRIPT.constraint(
                            cc, mstate
                        )
                        sub = jax.random.fold_in(rng, k)
                        out, state = TTS.step(
                            cfg, params, state, dup_rows(mode),
                            dup_rows(tok), sub, ca_kv=ca_kv,
                            mask=dup_rows(step_mask), reset=None,
                            temps=temps, seeds=seeds,
                            cfg_alpha=alpha if cfg_enabled else None,
                        )
                        mstate, patch = SCRIPT.advance(
                            cc, mstate, out["text_token"][:n], step_mask
                        )
                        # Final-eop -> pad patch applies INSIDE the scan so
                        # the corrected text history feeds frame k+1
                        # (tts.rs:607-610; the unfused path patches between
                        # dispatches — same program order).
                        state = TTS.overwrite_last_text_token(
                            state, cfg.text_pad_token, dup_rows(patch)
                        )
                        packed_k, mimi_state = _pack_frame(
                            out, step_mask, mimi_params, mimi_state
                        )
                        return (state, mimi_state, mstate), packed_k

                    (state, mimi_state, mstate), packed = jax.lax.scan(
                        body, (state, mimi_state, mstate),
                        jnp.arange(K, dtype=jnp.uint32),
                    )
                return packed, state, mimi_state, mstate

            self._fused_step = jax.jit(_fused, donate_argnums=(1, 3, 4))

    # -- slots --

    def used_slots(self) -> int:
        with self.slot_lock:
            return self.batch_size - len(self.free)

    def open_session(
        self, deliver: Callable[[object], None], voice_ca=None,
        text_temperature=None, audio_temperature=None,
        cfg_alpha=None, seed=None,
    ) -> Optional[TtsSlot]:
        """voice_ca: per-layer (L, 1, H, S, Dh) K/V pair or None (no voice).

        ``cfg_alpha`` (guidance strength, needs ``cfg_enabled``) and ``seed``
        are per-request, matching TtsQuery (main.rs:1045-1074)."""
        if cfg_alpha is not None and not self.cfg_enabled:
            raise ValueError("engine built without cfg_enabled")
        with self.slot_lock:
            if not self.free:
                return None
            slot = self.free.popleft()
            self._text_temp[slot] = (
                self.cfg.text_temperature if text_temperature is None
                else float(text_temperature)
            )
            self._audio_temp[slot] = (
                self.cfg.temperature if audio_temperature is None
                else float(audio_temperature)
            )
            self._cfg_alpha[slot] = 1.0 if cfg_alpha is None else float(cfg_alpha)
            if seed is None:
                self._seed_counter = (self._seed_counter + 1) & 0xFFFFFFFF
                seed = self._seed_counter
            self._seeds[slot] = np.uint32(int(seed) & 0xFFFFFFFF)
            drv = TtsSlot(slot, deliver, fused=self.fuse > 1)
            self.slots[slot] = drv
            self.pending_resets[slot] = True
            if self.fuse > 1:
                # Machine re-init is a host-side device write applied at
                # the next gather (before the dispatch whose k=0 reset
                # clears the model state).
                self._pending_script.append(("init", slot, None))
            if voice_ca is not None:
                k, v = voice_ca
                if k.shape[3] != self.ca_len:
                    raise ValueError(
                        f"voice source length {k.shape[3]} != engine ca_len "
                        f"{self.ca_len}"
                    )
                self._pending_voice.append((slot, k, v))
            else:
                self._pending_voice.append((slot, None, None))
            # The uncond twin row (CFG) always runs without the voice.
            if self.cfg_enabled:
                self._pending_voice.append(
                    (self.batch_size + slot, None, None)
                )
        return drv

    def _apply_voice_writes(self, pending=None) -> None:
        """Engine-loop-thread only: flush queued per-slot voice updates
        (jitted in-place dynamic_update_slice on the device CA buffer).

        ``pending`` may be a list already drained under ``slot_lock`` —
        tick() drains inside the same lock block as the slot gather so a
        session opened concurrently is never stepped before its voice write
        lands (open_session enqueues the voice before publishing the slot
        under that lock)."""
        if pending is None:
            with self.slot_lock:
                pending, self._pending_voice = self._pending_voice, []
        if not pending:
            return
        # Coalesce to the LAST write per slot (each entry is a full-slot
        # overwrite, so earlier ones in the same batch are dead), then
        # batch all zero-writes into ONE scatter dispatch per bucket —
        # a completion wave otherwise costs one tunneled dispatch per
        # reopened slot (the measured 1.4 s B=64 gather stall).
        last: dict = {}
        for slot, k, v in pending:
            last[slot] = (k, v)
        zero_slots = np.asarray(
            [s for s, (k, _) in last.items() if k is None], np.int32
        )
        data = [(s, k, v) for s, (k, v) in last.items() if k is not None]
        if os.environ.get("DSM_TTS_BATCH_VOICE", "1") in ("0", "false"):
            # A/B lever: fall back to one dispatch per slot.
            zero_slots = np.asarray([], np.int32)
            data = [(s, k, v) for s, (k, v) in last.items()]
        if self.ca_quant:
            bufs = self._ca_raw
            if zero_slots.size:
                for off in range(0, zero_slots.size, self._zero_buckets[-1]):
                    chunk = zero_slots[off : off + self._zero_buckets[-1]]
                    n = next(b for b in self._zero_buckets
                             if b >= chunk.size)
                    # Pad with an out-of-range slot; mode="drop" skips it.
                    padded = np.full(n, self.rows, np.int32)
                    padded[: chunk.size] = chunk
                    bufs = self._ca_zero_q(bufs, padded)
            for slot, k, v in data:
                if k is None:
                    k = v = self._zero_voice
                bufs = self._ca_write_q(bufs, k, v, slot)
            self._ca_raw = bufs
            return
        ck, cv = self._ca_raw
        if zero_slots.size:
            for off in range(0, zero_slots.size, self._zero_buckets[-1]):
                chunk = zero_slots[off : off + self._zero_buckets[-1]]
                n = next(b for b in self._zero_buckets if b >= chunk.size)
                padded = np.full(n, self.rows, np.int32)
                padded[: chunk.size] = chunk
                ck = self._ca_zero(ck, padded)
                cv = self._ca_zero(cv, padded)
        for slot, k, v in data:
            if k is None:
                ck = self._ca_write(ck, self._zero_voice, slot)
                cv = self._ca_write(cv, self._zero_voice, slot)
            else:
                ck = self._ca_write(ck, k, slot)
                cv = self._ca_write(cv, v, slot)
        self._ca_raw = (ck, cv)

    def close_session(self, drv: TtsSlot) -> None:
        with self.slot_lock:
            drv.closed = True
            if self.slots[drv.slot] is drv:
                self.slots[drv.slot] = None
                self.free.append(drv.slot)
                if self.fuse > 1:
                    self._pending_script.append(("deact", drv.slot, None))

    # -- device loop --

    def start(self) -> None:
        self.running = True
        self.thread = threading.Thread(
            target=self._loop, name="tts-model-loop", daemon=True
        )
        self.thread.start()

    def stop(self) -> None:
        self.running = False
        if self.thread:
            self.thread.join(timeout=5)
        # Deliver anything still in the dispatch-ahead pipeline so no
        # session loses its final frames/Done at shutdown — but only once
        # the loop thread has actually exited; draining while it is still
        # alive would have both threads popping/posting concurrently and
        # could interleave a session's frame/Done delivery out of order.
        if self.thread is None or not self.thread.is_alive():
            while self._inflight_f:
                self._post_fused(self._inflight_f.popleft())

    def _unpack_pcm(self, words, n, frame):
        """Decode the packed audio words from a tick fetch: f32 bitcast by
        default, int16 pairs under the DSM_TTS_PCM_I16 wire."""
        if self._pcm_wire_i16:
            return (
                words.view(np.int16).astype(np.float32) / 32767.0
            ).reshape(n, frame)
        return words.view(np.float32).reshape(n, frame)

    def _ca(self):
        # Both modes keep the SERVED form in _ca_raw — bf16 (k, v) tuple,
        # or the int8 dict written in place per slot (ca_quant).
        return self._ca_raw

    def warmup(self, steps: int = 2) -> None:
        """Compile the step + decode before serving (main.rs module warmup;
        same contract as BatchedAsrEngine.warmup): all-inactive ticks run
        the full jitted programs so no request pays XLA compile."""
        import jax

        n = self.rows
        modes = np.full(n, TTS.ALLOW_PAD, np.int32)
        toks = np.zeros(n, np.int32)
        mask = np.zeros(n, bool)
        reset = np.zeros(n, bool)
        temps = {
            "text": np.full(n, self.cfg.text_temperature, np.float32),
            "audio": np.full(n, self.cfg.temperature, np.float32),
        }
        seeds = np.zeros(n, np.uint32)
        try:
            for _ in range(steps):
                self.rng, sub = jax.random.split(self.rng)
                if self.fuse > 1:
                    packed, self.state, self.mimi_state, self._mstate = (
                        self._fused_step(
                            self.params, self.state, self.mimi_params,
                            self.mimi_state, self._mstate, sub, self._ca(),
                            reset[: self.batch_size], temps, seeds,
                            self._cfg_alpha.copy(),
                        )
                    )
                else:
                    packed, self.state, self.mimi_state = self._step(
                        self.params, self.state, self.mimi_params,
                        self.mimi_state, modes, toks, sub, self._ca(),
                        mask, reset, temps, seeds, self._cfg_alpha.copy(),
                    )
            if self.fuse > 1:
                # Precompile every op-batch bucket so the first session
                # open never pays XLA compile inside a tick.
                z = np.zeros
                for b in self._op_buckets:
                    self._mstate = self._m_ops(
                        self._mstate, z(b, np.int32), z(b, np.int32),
                        z((b, SCRIPT.WORD_CHUNK), np.int32), z(b, np.int32),
                        z(b, np.int32), z(b, np.int32),
                    )
                jax.block_until_ready(self._mstate)
            # Precompile the batched zero-voice scatters (both buckets):
            # the first session-completion wave otherwise pays XLA
            # compile inside a serving tick.
            for b in self._zero_buckets:
                padded = np.full(b, self.rows, np.int32)  # all dropped
                if self.ca_quant:
                    self._ca_raw = self._ca_zero_q(self._ca_raw, padded)
                else:
                    ck, cv = self._ca_raw
                    self._ca_raw = (
                        self._ca_zero(ck, padded), self._ca_zero(cv, padded)
                    )
            jax.block_until_ready(self._ca_raw)
            if self._wire_fn is not None:
                # The wire-format conversion is its own tiny jit (keeps
                # the big program cache-stable); compile it here too — it
                # otherwise compiles inside the first session's first
                # tick (measured +1.3 s TTFB on the i16 sustained leg).
                packed = self._wire_fn(packed)
            jax.block_until_ready(packed)
            metrics.WARMUP_SUCCESS.inc()
        except Exception:
            metrics.WARMUP_FAILURE.inc()
            raise
        # Freeze the post-warmup heap (serving hygiene; utils/gc_tune.py.
        # NOTE: the 1.4 s gather stall first blamed on GC was actually
        # per-slot voice-write dispatches at a session-completion wave —
        # see _apply_voice_writes' batched zero path).
        from ..utils.gc_tune import freeze_after_warmup

        freeze_after_warmup()

    def tick(self) -> bool:
        if self.fuse > 1:
            return self._tick_fused()
        return self._tick_single()

    def _apply_script_actions(self, actions) -> None:
        """Engine-loop-thread only: flush queued script-machine updates
        (same donation-safety rule as _apply_voice_writes)."""
        if not actions:
            return
        KIND = {"init": SCRIPT.OP_INIT, "deact": SCRIPT.OP_DEACT,
                "eos": SCRIPT.OP_EOS, "word": SCRIPT.OP_WORD}
        m = self._mstate
        cap = self._op_buckets[-1]
        for off in range(0, len(actions), cap):
            chunk = actions[off : off + cap]
            n = next(b for b in self._op_buckets if b >= len(chunk))
            kinds = np.zeros(n, np.int32)  # OP_NOP pads
            slots = np.zeros(n, np.int32)
            toks = np.zeros((n, SCRIPT.WORD_CHUNK), np.int32)
            counts = np.zeros(n, np.int32)
            wids = np.zeros(n, np.int32)
            starts = np.zeros(n, np.int32)
            for i, (kind, slot, payload) in enumerate(chunk):
                kinds[i] = KIND[kind]
                slots[i] = slot
                if kind == "word":
                    t, c, w, s = payload
                    toks[i] = t
                    counts[i], wids[i], starts[i] = c, w, s
            m = self._m_ops(m, kinds, slots, toks, counts, wids, starts)
        self._mstate = m

    def _tick_fused(self) -> bool:
        """K frames per dispatch: gather/upload script state, run the fused
        scan, then replay the fetched text tokens through the host mirror
        machines for word/audio event delivery."""
        import jax

        t_gather0 = time.perf_counter()
        n = self.batch_size
        reset = np.zeros(n, bool)
        drivers: List[Optional[TtsSlot]] = [None] * n
        # Gather sub-phase attribution (the B=64 tick-p99 stall lives in
        # this phase and survived both the GC fix and a healthy tunnel
        # probe — instrument lock wait/hold, upload calls, queue depths).
        self.slot_lock.acquire()
        t_lock = time.perf_counter()
        try:
            pending_voice, self._pending_voice = self._pending_voice, []
            actions, self._pending_script = self._pending_script, []
            reset[:] = self.pending_resets
            self.pending_resets[:] = False
            for slot, drv in enumerate(self.slots):
                if drv is None or drv.closed or drv.finished:
                    continue
                drivers[slot] = drv
                with drv.lock:
                    # Move words pending -> visible while the device ring
                    # has room (consumed positions free their space).
                    while drv.pending_words:
                        w = drv.pending_words[0]
                        if len(w) > self.script_cap:
                            # A single word can never outgrow the ring —
                            # waiting for space would hang the session
                            # (eos is only promoted once pending empties).
                            log.warning(
                                "tts slot %d: word of %d tokens truncated "
                                "to script_cap=%d",
                                slot, len(w), self.script_cap,
                            )
                            w = w[: self.script_cap]
                            drv.pending_words[0] = w
                        space = self.script_cap - (drv.up_toks - drv.consumed)
                        if len(w) > space:
                            break
                        drv.pending_words.popleft()
                        drv.word_queue.append(list(w))
                        start, wid = drv.up_toks, drv.up_words
                        if not w:
                            actions.append((
                                "word", slot,
                                (np.zeros(SCRIPT.WORD_CHUNK, np.int32),
                                 0, wid, start),
                            ))
                        for off in range(0, len(w), SCRIPT.WORD_CHUNK):
                            chunk = w[off : off + SCRIPT.WORD_CHUNK]
                            buf = np.zeros(SCRIPT.WORD_CHUNK, np.int32)
                            buf[: len(chunk)] = chunk
                            actions.append(
                                ("word", slot,
                                 (buf, len(chunk), wid, start + off))
                            )
                        drv.up_toks += len(w)
                        drv.up_words += 1
                    # eos becomes visible only once every fed word is
                    # uploaded (otherwise the device would drain early).
                    if drv.pending_eos and not drv.pending_words and not drv.eos:
                        drv.eos = True
                        actions.append(("eos", slot, None))
        finally:
            self.slot_lock.release()
        t_hold = time.perf_counter()
        self._apply_voice_writes(pending_voice)
        t_voice = time.perf_counter()
        self._apply_script_actions(actions)
        t_script = time.perf_counter()
        gather_detail = (
            t_lock - t_gather0,      # lock wait
            t_hold - t_lock,         # lock hold (word promotion)
            t_voice - t_hold,        # voice-write dispatches
            t_script - t_voice,      # script-op dispatches
            len(pending_voice),
            len(actions),
        )
        if not any(d is not None for d in drivers) and not reset.any():
            if self._inflight_f:  # drain the pipeline when input pauses
                self._post_fused(self._inflight_f.popleft())
                return True
            return False

        t_disp0 = time.perf_counter()
        self.rng, sub = jax.random.split(self.rng)
        if self.cfg_enabled:
            dup = lambda a: np.concatenate([a, a])
            temps = {"text": dup(self._text_temp), "audio": dup(self._audio_temp)}
            seeds_m = dup(self._seeds)
        else:
            temps = {
                "text": self._text_temp.copy(),
                "audio": self._audio_temp.copy(),
            }
            seeds_m = self._seeds.copy()
        t0 = time.perf_counter()
        packed_dev, self.state, self.mimi_state, self._mstate = (
            self._fused_step(
                self.params, self.state, self.mimi_params, self.mimi_state,
                self._mstate, sub, self._ca(), reset, temps, seeds_m,
                self._cfg_alpha.copy(),
            )
        )
        if self._wire_fn is not None:
            packed_dev = self._wire_fn(packed_dev)
        t_fetch0 = time.perf_counter()
        self._inflight_f.append(
            (packed_dev, drivers, t_gather0, t_disp0, t0, t_fetch0,
             gather_detail)
        )
        # depth 1: fetch immediately; depth D: keep D-1 dispatches in
        # flight so the device step overlaps the previous fetch + post.
        if len(self._inflight_f) >= self.pipeline_depth:
            self._post_fused(self._inflight_f.popleft())
        return True

    def _post_fused(self, item) -> None:
        (packed_dev, drivers, t_gather0, t_disp0, t0, t_fetch0,
         gather_detail) = item
        n = self.batch_size
        packed = np.asarray(packed_dev)  # ONE fetch for all K frames
        t_fetch1 = time.perf_counter()
        frame = self.mimi_cfg.frame_size
        # With pipelining, dispatch->fetch of one item spans OTHER items'
        # host work; the honest per-tick cost is the service interval
        # (completion-to-completion; equals t_fetch1-t0 at depth 1 / cold).
        dt = min(t_fetch1 - t0, t_fetch1 - self._last_fetch_t) if (
            self._last_fetch_t is not None
        ) else t_fetch1 - t0
        self._last_fetch_t = t_fetch1
        metrics.LM_STEP_DURATION.observe(dt / self.fuse)
        metrics.LM_STEPS_TOTAL.inc(self.fuse)
        for k in range(self.fuse):
            row = packed[k]
            text_tokens = row[:n]
            steps = row[n : 2 * n]
            dec_mask = row[2 * n : 3 * n].astype(bool)
            pcm = (
                self._unpack_pcm(row[3 * n :], n, frame)
                if dec_mask.any()
                else None
            )
            metrics.MIMI_FRAMES_DECODED.inc(int(dec_mask.sum()))
            for slot, drv in enumerate(drivers):
                if drv is None or drv.finished or drv.closed:
                    continue
                c = drv.next_constraint(self.cfg)
                if c is None:
                    drv.finished = True
                    drv.deliver(DoneEvent())
                    continue
                drv.steps = int(steps[slot])
                # The final-eop pad patch already happened on device inside
                # the scan; the mirror's return value is ignored.
                drv.on_text_token(self.cfg, int(text_tokens[slot]), self.tokenizer)
                if pcm is not None and dec_mask[slot]:
                    drv.pcm_samples += frame
                    drv.deliver(AudioEvent(pcm=pcm[slot].copy()))
        if self.tick_observer is not None:
            t_end = time.perf_counter()
            self.tick_observer(
                t_disp0 - t_gather0,
                t_fetch0 - t_disp0,
                t_fetch1 - t_fetch0,
                t_end - t_fetch1,
                *gather_detail,
            )

    def _tick_single(self) -> bool:
        import jax

        t_gather0 = time.perf_counter()
        modes = np.full(self.batch_size, TTS.ALLOW_PAD, np.int32)
        toks = np.zeros(self.batch_size, np.int32)
        mask = np.zeros(self.batch_size, bool)
        reset = np.zeros(self.batch_size, bool)
        drivers: List[Optional[TtsSlot]] = [None] * self.batch_size

        with self.slot_lock:
            # Drain voice writes in the SAME lock block as the gather: any
            # gathered slot's queued write is applied before it is stepped.
            pending_voice, self._pending_voice = self._pending_voice, []
            reset[:] = self.pending_resets
            self.pending_resets[:] = False
            for slot, drv in enumerate(self.slots):
                if drv is None or drv.closed or drv.finished:
                    continue
                c = drv.next_constraint(self.cfg)
                if c is None:
                    drv.finished = True
                    drv.deliver(DoneEvent())
                    continue
                modes[slot], toks[slot], _ = c
                mask[slot] = True
                drivers[slot] = drv

        self._apply_voice_writes(pending_voice)
        if not mask.any() and not reset.any():
            return False

        t0 = time.perf_counter()
        self.rng, sub = jax.random.split(self.rng)
        if self.cfg_enabled:
            # Doubled layout: the uncond twin rows mirror tokens/masks/resets
            # so both halves stay in lock-step (tts_streaming.rs:161-173).
            dup = lambda a: np.concatenate([a, a])
            modes_m, toks_m, mask_m, reset_m = map(dup, (modes, toks, mask, reset))
            temps = {"text": dup(self._text_temp), "audio": dup(self._audio_temp)}
            seeds_m = dup(self._seeds)
        else:
            modes_m, toks_m, mask_m, reset_m = modes, toks, mask, reset
            temps = {"text": self._text_temp.copy(), "audio": self._audio_temp.copy()}
            seeds_m = self._seeds.copy()
        t_disp0 = time.perf_counter()
        packed_dev, self.state, self.mimi_state = self._step(
            self.params, self.state, self.mimi_params, self.mimi_state,
            modes_m, toks_m, sub, self._ca(), mask_m, reset_m, temps,
            seeds_m, self._cfg_alpha.copy(),
        )
        if self._wire_fn is not None:
            packed_dev = self._wire_fn(packed_dev)
        t_fetch0 = time.perf_counter()
        n = self.batch_size
        packed = np.asarray(packed_dev)  # the tick's ONE device->host fetch
        t_fetch1 = time.perf_counter()
        text_tokens = packed[:n]
        steps = packed[n : 2 * n]
        dec_mask = packed[2 * n : 3 * n].astype(bool)
        frame = self.mimi_cfg.frame_size
        pcm = (
            self._unpack_pcm(packed[3 * n :], n, frame)
            if dec_mask.any()
            else None
        )
        metrics.LM_STEP_DURATION.observe(time.perf_counter() - t0)
        metrics.LM_STEPS_TOTAL.inc()
        metrics.MIMI_FRAMES_DECODED.inc(int(dec_mask.sum()))

        overwrite_slots = np.zeros(self.batch_size, bool)
        for slot, drv in enumerate(drivers):
            if drv is None:
                continue
            drv.steps = int(steps[slot])
            patch = drv.on_text_token(self.cfg, int(text_tokens[slot]), self.tokenizer)
            if patch == "overwrite_pad":
                overwrite_slots[slot] = True
            if pcm is not None and dec_mask[slot]:
                drv.pcm_samples += pcm.shape[1]
                drv.deliver(AudioEvent(pcm=pcm[slot]))
        if overwrite_slots.any():
            # Teacher-force a pad over the final eop (tts.rs:607-610).
            ow = (
                np.concatenate([overwrite_slots, overwrite_slots])
                if self.cfg_enabled
                else overwrite_slots
            )
            self.state = TTS.overwrite_last_text_token(
                self.state, self.cfg.text_pad_token, ow
            )
        if self.tick_observer is not None:
            t_end = time.perf_counter()
            self.tick_observer(
                t_disp0 - t_gather0,   # host gather + constraint walk
                t_fetch0 - t_disp0,    # dispatch (async) time
                t_fetch1 - t_fetch0,   # device step + fetch round-trip
                t_end - t_fetch1,      # host post-process + delivery
            )
        return True

    def _loop(self) -> None:
        while self.running:
            try:
                if not self.tick():
                    time.sleep(self.tick_sleep)
            except Exception:
                metrics.record_connection_error("internal", "tts")
                import traceback

                traceback.print_exc()
                time.sleep(0.1)

    # -- compatibility surface shared with the single-session TtsEngine --

    voices = None  # optional server.voices.VoiceResolver

    def voice_kv(self, spec):
        if not spec or self.voices is None:
            return None
        import jax.numpy as jnp

        ca = self.voices.resolve(spec)
        if ca is None:
            return None
        return T.precompute_ca_kv(
            self.cfg.lm.transformer,
            self.params["lm"]["transformer"],
            jnp.asarray(ca, self.cache_dtype),
        )

    def encode_words(self, text: str, inserted_bos: bool):
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

    def synthesize(self, text: str, voice_ca=None, seed: int = 0, timeout_s=300.0,
                   cfg_alpha=None):
        """Offline HTTP TTS over the batched engine: occupies one slot."""
        done = threading.Event()
        pcm_chunks: List[np.ndarray] = []
        transcript: List[WordEvent] = []

        def sink(ev):
            if isinstance(ev, AudioEvent):
                pcm_chunks.append(ev.pcm)
            elif isinstance(ev, WordEvent):
                transcript.append(ev)
            elif isinstance(ev, DoneEvent):
                done.set()

        slot = None
        deadline = time.time() + timeout_s
        while slot is None and time.time() < deadline:
            slot = self.open_session(
                sink, voice_ca=voice_ca, seed=seed if seed else None,
                cfg_alpha=cfg_alpha,
            )
            if slot is None:
                time.sleep(0.05)
        if slot is None:
            raise TimeoutError("no free TTS slot")
        try:
            words, _ = self.encode_words(text, inserted_bos=False)
            slot.feed_words(words)
            slot.end_input()
            if self.running:
                done.wait(timeout=timeout_s)
            else:
                while not done.is_set() and time.time() < deadline:
                    if not self.tick():
                        time.sleep(self.tick_sleep)
        finally:
            self.close_session(slot)
        pcm = (
            np.concatenate(pcm_chunks) if pcm_chunks else np.zeros(0, np.float32)
        )
        return pcm, transcript
