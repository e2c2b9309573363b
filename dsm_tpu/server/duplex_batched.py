"""Continuously-batched full-duplex dialogue engine.

Beyond the reference: moshi-server's duplex module locks the model per
connection (lm.rs:77-318 runs one `State` end-to-end; moshi-backend is
likewise one dialogue per process) — here N independent dialogues run
lock-step in one fused jitted step, the same continuous-batching design as
the ASR/TTS engines:

  Mimi.encode_step(user pcm) -> lm_gen.step -> masked Mimi.decode_step

with per-slot step counters / mask / reset as data (sessions/lm_gen.py),
so slot lifecycle never recompiles.  The tick's host-bound outputs are
packed into ONE array — a single device->host fetch per 80 ms frame.
"""

from __future__ import annotations

import dataclasses
import threading
import time
import os
from collections import deque
from typing import Callable, List, Optional

import numpy as np

from ..models import mimi as MIMI
from ..sessions import lm_gen
from . import metrics


@dataclasses.dataclass
class DuplexTextEvent:
    text: str


@dataclasses.dataclass
class DuplexAudioEvent:
    pcm: np.ndarray


@dataclasses.dataclass
class DuplexDoneEvent:
    pass


class DuplexSlot:
    """Per-connection mailbox + incremental text decoder."""

    def __init__(self, slot: int, deliver: Callable[[object], None],
                 asr_delay: int = 0):
        self.slot = slot
        self.deliver = deliver
        self.asr_delay = asr_delay
        self.lock = threading.Lock()
        self.pcm = deque()
        self.pcm_samples = 0
        self.text_acc: List[int] = []
        self.closed = False
        self.finished = False
        self.eos = False
        self.steps = 0

    def push_pcm(self, pcm: np.ndarray) -> None:
        with self.lock:
            self.pcm.append(np.asarray(pcm, np.float32))
            self.pcm_samples += len(pcm)

    def end_input(self) -> None:
        with self.lock:
            self.eos = True

    def take_frame(self, frame: int) -> Optional[np.ndarray]:
        with self.lock:
            if self.pcm_samples < frame:
                return None
            out = np.empty(frame, np.float32)
            need, pos = frame, 0
            while need > 0:
                chunk = self.pcm[0]
                if len(chunk) <= need:
                    out[pos : pos + len(chunk)] = chunk
                    pos += len(chunk)
                    need -= len(chunk)
                    self.pcm.popleft()
                else:
                    out[pos:] = chunk[:need]
                    self.pcm[0] = chunk[need:]
                    pos += need
                    need = 0
            self.pcm_samples -= frame
            return out


class BatchedDuplexEngine:
    """Slot pool + fused device step for N concurrent dialogues."""

    def __init__(
        self,
        cfg: lm_gen.DuplexConfig,
        params: dict,
        mimi_cfg: MIMI.MimiConfig,
        mimi_params: dict,
        tokenizer,
        batch_size: int = 8,
        tick_sleep: float = 0.002,
        kv_quant: Optional[bool] = None,
        mesh=None,
        pipeline_depth: int = 1,
        kv_bits: Optional[int] = None,
    ):
        """``mesh``: optional jax Mesh (dp[, tp]) — dialogue state shards
        over dp; with tp > 1 the LM weights take the Megatron column/row
        split and KV heads shard over tp (same contract as
        BatchedAsrEngine / BatchedTtsEngine; Pallas kernels are
        trace-disabled under a mesh since GSPMD cannot partition
        pallas_call).

        ``pipeline_depth``: 1 = fetch each tick's outputs before the next
        dispatch (lowest latency — the default, matching the reference
        loop).  2 = dispatch-ahead: tick N's device step overlaps tick
        N-1's device->host fetch + post-process.  The duplex input (the
        next mic frame) never depends on the previous tick's *fetched*
        outputs — the model hears its own reply through device-resident
        state — so pipelining is semantically free; it trades up to one
        frame of delivery latency for throughput where step+fetch
        overruns the 80 ms cadence."""
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        self.mimi_cfg = mimi_cfg
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.tick_sleep = tick_sleep
        self.cache_dtype = (
            jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
        )
        if kv_quant is None:
            kv_quant = jax.default_backend() != "cpu"
        self.kv_quant = kv_quant
        if self.kv_quant:
            from ..ops import qmm, transformer as TT

            params = dict(params)
            params["lm"] = TT.quantize_weights(params["lm"])
            # W8A8 completes the serving profile (s2s-2b is weight-read
            # heavy at small batch; measured win on v5e, see
            # docs/PERFORMANCE.md).  DSM_W8A8=0 overrides.  Accel-only:
            # flipping the process-global default on CPU would leak the
            # profile into unrelated exact-dtype test traces.
            if jax.default_backend() != "cpu":
                qmm.set_w8a8_default(True)
        self.params = params
        self.mimi_params = mimi_params

        # kv_bits=4: packed-int4 dialogue rings — the HBM lever for batches
        # the ctx-3000 int8 rings can't fit (B=32 OOMs at 12.1 GB of rings;
        # docs/SUSTAINED_DUPLEX_r04_b32_pipe2.json).  Env DSM_KV_BITS or
        # TOML kv_bits override; the attention path auto-detects the packed
        # uint8 ring dtype (ops/transformer.py:482).
        if kv_bits is None:
            kv_bits = int(os.environ.get("DSM_KV_BITS", "8"))
        self.kv_bits = kv_bits if self.kv_quant else 8
        self.state = lm_gen.init_state(
            cfg, batch_size, self.cache_dtype, kv_quant=self.kv_quant,
            kv_bits=self.kv_bits,
        )
        self.enc_state = MIMI.init_encode_state(mimi_cfg, batch_size)
        self.dec_state = MIMI.init_decode_state(mimi_cfg, batch_size)
        self.rng = jax.random.PRNGKey(0)

        self.mesh = mesh
        if mesh is not None:
            from ..parallel import mesh as M

            tp = mesh.shape.get("tp", 1)
            if batch_size % mesh.shape["dp"]:
                raise ValueError(
                    f"batch {batch_size} not divisible by dp="
                    f"{mesh.shape['dp']}"
                )
            if tp > 1 and cfg.lm.transformer.num_heads % tp:
                raise ValueError(
                    f"num_heads {cfg.lm.transformer.num_heads} not divisible "
                    f"by tp={tp}"
                )
            # tp > 1: Megatron-split LM weights (quantised {"q","s"} dicts
            # included — parallel/mesh._spec_for_param shards "q" like the
            # dense weight and "s" along the out channel); GSPMD inserts
            # the psum joins over ICI.
            self.params = (
                M.shard_transformer_params(mesh, self.params)
                if tp > 1 else M.replicate(mesh, self.params)
            )
            self.state = M.shard_batched_state(mesh, self.state, batch_size)
            self.enc_state = M.shard_batched_state(
                mesh, self.enc_state, batch_size
            )
            self.dec_state = M.shard_batched_state(
                mesh, self.dec_state, batch_size
            )

        self.slots: List[Optional[DuplexSlot]] = [None] * batch_size
        self.free = deque(range(batch_size))
        self.pending_resets = np.zeros(batch_size, bool)
        self._asr_delay = np.zeros(batch_size, np.int32)
        self.slot_lock = threading.Lock()
        self.running = False
        self.thread: Optional[threading.Thread] = None
        # (dt_s, n_active, (gather, dispatch, fetch, post) s) per stepped tick
        self.tick_observer = None

        frame = mimi_cfg.frame_size
        in_cb = cfg.input_audio_codebooks
        gen_cb = cfg.generated_audio_codebooks

        def _fused(params, state, enc_state, dec_state, pcm, mask, reset,
                   rng, asr_delay):
            from ..ops import ring_kernels as _rk

            with _rk.kernels_forced(
                False if mesh is not None else _rk.kernels_override()
            ):
                return _fused_body(params, state, enc_state, dec_state, pcm,
                                   mask, reset, rng, asr_delay)

        def _fused_body(params, state, enc_state, dec_state, pcm, mask,
                        reset, rng, asr_delay):
            codes, enc_state = MIMI.encode_step(
                mimi_cfg, params["mimi"], enc_state, pcm, mask
            )
            user_tokens = codes[:, :in_cb, 0].astype(jnp.int32)
            out, state = lm_gen.step(
                cfg, params, state, user_tokens, rng,
                asr_delay=asr_delay, mask=mask, reset=reset,
            )
            # Per-slot mimi reset rides the same tick (kv_cache.rs:111-117
            # analogue); ASR-delay slots skip decode (text-only sessions).
            enc_state = MIMI.reset_encode_state(enc_state, reset)
            dec_state = MIMI.reset_decode_state(dec_state, reset)
            dec_mask = jnp.logical_and(out["frame_valid"], asr_delay <= 0)
            frame_codes = jnp.where(
                dec_mask[:, None], out["frame"], 0
            )[:, :, None]
            pcm_out, dec_state = MIMI.decode_step(
                mimi_cfg, params["mimi"], dec_state, frame_codes, dec_mask
            )
            packed = jnp.concatenate([
                out["text_token"].astype(jnp.int32),
                state["step_idx"].astype(jnp.int32),
                dec_mask.astype(jnp.int32),
                # float pcm bitcast so the fetch is one int32 array
                jax.lax.bitcast_convert_type(
                    pcm_out[:, 0, :].astype(jnp.float32), jnp.int32
                ).reshape(-1),
            ])
            return packed, state, enc_state, dec_state

        self._step = jax.jit(_fused, donate_argnums=(1, 2, 3))
        self._pcm_buf = np.zeros((batch_size, 1, frame), np.float32)
        self.pipeline_depth = max(1, int(pipeline_depth))
        # (packed_dev, drivers, n_active, t_gather0, t_disp0, t_disp1)
        self._inflight: deque = deque()
        self._last_fetch_t = None  # completion-to-completion step timing

    # -- session lifecycle --

    def open_session(
        self, deliver: Callable[[object], None], asr_delay_in_tokens: int = 0
    ) -> Optional[DuplexSlot]:
        with self.slot_lock:
            if not self.free:
                return None
            slot = self.free.popleft()
            drv = DuplexSlot(slot, deliver, asr_delay=asr_delay_in_tokens)
            self.slots[slot] = drv
            self.pending_resets[slot] = True
            self._asr_delay[slot] = np.int32(asr_delay_in_tokens)
            return drv

    def close_session(self, drv: DuplexSlot) -> None:
        with self.slot_lock:
            drv.closed = True
            if self.slots[drv.slot] is drv:
                self.slots[drv.slot] = None
                self.free.append(drv.slot)

    # -- device loop --

    def start(self) -> None:
        self.running = True
        self.thread = threading.Thread(
            target=self._loop, name="duplex-model-loop", daemon=True
        )
        self.thread.start()

    def stop(self) -> None:
        self.running = False
        if self.thread:
            self.thread.join(timeout=5)
        while self._inflight:  # deliver trailing pipelined outputs
            self._post_process(self._inflight.popleft())

    def warmup(self, steps: int = 2) -> None:
        import jax

        mask = np.zeros(self.batch_size, bool)
        reset = np.zeros(self.batch_size, bool)
        try:
            for _ in range(steps):
                self.rng, sub = jax.random.split(self.rng)
                packed, self.state, self.enc_state, self.dec_state = self._step(
                    self.params, self.state, self.enc_state, self.dec_state,
                    self._pcm_buf, mask, reset, sub, self._asr_delay.copy(),
                )
            jax.block_until_ready(packed)
            metrics.WARMUP_SUCCESS.inc()
        except Exception:
            metrics.WARMUP_FAILURE.inc()
            raise
        # Freeze the post-warmup heap: a gen2 GC sweep over the jax-trace
        # object graph measured as a 1.4 s gather stall mid-serving
        # (utils/gc_tune.py has the full story).
        from ..utils.gc_tune import freeze_after_warmup

        freeze_after_warmup()

    def tick(self) -> bool:
        import jax

        mask = np.zeros(self.batch_size, bool)
        reset = np.zeros(self.batch_size, bool)
        drivers: List[Optional[DuplexSlot]] = [None] * self.batch_size
        frame = self.mimi_cfg.frame_size

        t_tick0 = time.perf_counter()
        with self.slot_lock:
            reset[:] = self.pending_resets
            self.pending_resets[:] = False
            for slot, drv in enumerate(self.slots):
                if drv is None or drv.closed or drv.finished:
                    continue
                f = drv.take_frame(frame)
                if f is None:
                    if drv.eos and not any(
                        it[1][slot] is drv for it in self._inflight
                    ):  # don't emit Done ahead of in-flight audio/text
                        drv.finished = True
                        if drv.text_acc:
                            # Flush the trailing partial word so the
                            # dialogue's last tokens are not dropped.
                            drv.deliver(DuplexTextEvent(
                                text=self.tokenizer.decode(drv.text_acc)
                            ))
                            drv.text_acc = []
                        drv.deliver(DuplexDoneEvent())
                    continue
                self._pcm_buf[slot, 0, :] = f
                mask[slot] = True
                drivers[slot] = drv
            asr_delay = self._asr_delay.copy()

        if not mask.any() and not reset.any():
            if self._inflight:  # drain the pipeline when input pauses
                self._post_process(self._inflight.popleft())
                return True
            return False

        t0 = time.perf_counter()
        self.rng, sub = jax.random.split(self.rng)
        pcm_in = (
            self._pcm_buf.copy()
            if self.pipeline_depth > 1
            else self._pcm_buf
        )  # the shared gather buffer is mutated before a deep fetch lands
        packed_dev, self.state, self.enc_state, self.dec_state = self._step(
            self.params, self.state, self.enc_state, self.dec_state,
            pcm_in, mask, reset, sub, asr_delay,
        )
        t1 = time.perf_counter()
        self._inflight.append(
            (packed_dev, drivers, int(mask.sum()), t_tick0, t0, t1)
        )
        # depth 1: fetch immediately (reference loop); depth D: keep D-1
        # dispatches in flight so the device step overlaps the previous
        # fetch + post-process.
        if len(self._inflight) >= self.pipeline_depth:
            self._post_process(self._inflight.popleft())
        return True

    def _post_process(self, item) -> None:
        packed_dev, drivers, n_active, t_tick0, t0, t1 = item
        frame = self.mimi_cfg.frame_size
        packed = np.asarray(packed_dev)  # the tick's ONE device->host fetch
        t2 = time.perf_counter()
        # With pipelining, dispatch->fetch of one item spans OTHER items'
        # host work, so t2-t0 would double-count the overlap and misreport
        # the optimisation it measures.  The honest per-tick cost is the
        # service interval: completion-to-completion once the pipeline is
        # warm (equals t2-t0 exactly at depth 1 / cold pipeline).
        dt = min(t2 - t0, t2 - self._last_fetch_t) if (
            self._last_fetch_t is not None
        ) else t2 - t0
        self._last_fetch_t = t2
        metrics.LM_STEP_DURATION.observe(dt)
        metrics.LM_STEPS_TOTAL.inc()

        n = self.batch_size
        text_tokens = packed[:n]
        steps = packed[n : 2 * n]
        dec_mask = packed[2 * n : 3 * n].astype(bool)
        pcm = packed[3 * n :].view(np.float32).reshape(n, frame)
        metrics.MIMI_FRAMES_DECODED.inc(int(dec_mask.sum()))

        eng_cfg = self.cfg
        for slot, drv in enumerate(drivers):
            if drv is None:
                continue
            drv.steps = int(steps[slot])
            tok = int(text_tokens[slot])
            if tok not in (eng_cfg.text_pad_token, eng_cfg.text_eop_token,
                           eng_cfg.text_start_token):
                drv.text_acc.append(tok)
            elif drv.text_acc:
                drv.deliver(DuplexTextEvent(
                    text=self.tokenizer.decode(drv.text_acc)
                ))
                drv.text_acc = []
            if dec_mask[slot]:
                drv.deliver(DuplexAudioEvent(pcm=pcm[slot].copy()))
        if self.tick_observer is not None:
            # (total step s, n_active, (gather, dispatch, fetch, post) s) —
            # same phase split the TTS engine reports; localises whether a
            # missed 80 ms cadence is device time or host path.  With
            # pipeline_depth > 1 the fetch phase includes the overlapped
            # wait behind newer dispatches.
            t3 = time.perf_counter()
            self.tick_observer(
                dt, n_active,
                (t0 - t_tick0, t1 - t0, t2 - t1, t3 - t2),
            )

    def _loop(self) -> None:
        while self.running:
            try:
                if not self.tick():
                    time.sleep(self.tick_sleep)
            except Exception:
                metrics.record_connection_error("internal", "lm")
                import traceback

                traceback.print_exc()
