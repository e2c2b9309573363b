"""Continuous-batching streaming ASR engine.

Reference: moshi-server/src/batched_asr.rs — a fixed slot pool with free/
active tracking, per-connection pcm mailboxes, a persistent model loop that
packs one (B, 1, 1920) frame per tick, markers flushed at the right step,
and per-slot reset on reuse.

TPU-native split: the reference runs three pipeline threads (mimi encode /
LM step / post-process) because those are separate GPU calls; here Mimi +
delay logic + LM + sampling are ONE fused jitted step (sessions/asr.step),
so the engine needs a single device thread: gather mailboxes -> step ->
scatter events.  Slot lifecycle (mask/reset vectors) is data, not control
flow — no recompilation ever happens after warmup.

The engine is transport-agnostic: WebSocket wiring lives in app.py, and
tests drive the engine directly (the reference has no equivalent test; its
batching is only exercised in production).
"""

from __future__ import annotations

import dataclasses
import heapq
import itertools
import threading
import time
from collections import deque
from typing import Callable, Dict, List, Optional

import numpy as np

from ..sessions import asr as ASR
from . import metrics

FRAME_SIZE = 1920  # 80 ms at 24 kHz (batched_asr.rs:26)


@dataclasses.dataclass
class Events:
    """Per-tick events for one slot, delivered to its connection."""

    slot: int
    channel_id: int
    words: List[object]
    markers: List[int]
    step_idx: int
    prs: Optional[np.ndarray]


class Channel:
    """Per-connection mailbox (batched_asr.rs Channel :70-124).

    The pcm buffer lives either in the native SPSC ring (native/packer.cpp,
    GIL-free, preferred) or in a python deque fallback.
    """

    _ids = itertools.count(1)

    def __init__(
        self,
        slot: int,
        deliver: Callable[[Events], None],
        packer=None,
        frame_size: Optional[int] = None,
    ):
        self.slot = slot
        self.channel_id = next(Channel._ids)
        self.packer = packer
        self.frame_size = frame_size or FRAME_SIZE
        self.pcm = deque()  # float chunks (fallback path)
        self.pcm_samples = 0
        # Cumulative samples ever pushed (WS-thread only): the marker-due
        # arithmetic uses this instead of steps+buffered, which undercounts
        # by the in-flight dispatch-ahead frames (gathered from the buffer
        # but not yet drained into ch.steps) — a race that fired markers
        # 1-2 frames early and nondeterministically dropped trailing words.
        self.samples_pushed = 0
        self.markers: List[tuple] = []  # (due_step, marker_id) heap
        self.deliver = deliver
        self.lock = threading.Lock()
        self.closed = False
        self.steps = 0
        self.created = time.time()
        self.last_data = time.time()

    def push_pcm(self, pcm: np.ndarray) -> None:
        self.last_data = time.time()
        self.samples_pushed += len(pcm)
        if self.packer is not None:
            self.packer.push(self.slot, pcm)
            return
        with self.lock:
            self.pcm.append(np.asarray(pcm, np.float32))
            self.pcm_samples += len(pcm)

    def buffered_samples(self) -> int:
        if self.packer is not None:
            return int(self.packer.available(self.slot))
        return self.pcm_samples

    def take_frame(self) -> Optional[np.ndarray]:
        frame = self.frame_size
        with self.lock:
            if self.pcm_samples < frame:
                return None
            out = np.empty(frame, np.float32)
            need = frame
            pos = 0
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


class BatchedAsrEngine:
    """Slot pool + device loop.  One instance per ASR module."""

    def __init__(
        self,
        cfg: ASR.AsrConfig,
        params,
        batch_size: int,
        condition=None,
        step_fn=None,
        tick_sleep: float = 0.002,
        use_native_packer: Optional[bool] = None,
        pipeline_depth: int = 1,
        mesh=None,
        session_logger=None,
        fill_gate_frac: float = 0.2,
        pcm_wire_int16: Optional[bool] = None,
    ):
        """``mesh``: optional jax.sharding.Mesh (dp[, tp]) — shards the
        continuous batch across chips over ICI and (optionally) attention
        heads/MLP over tp; params/state are placed accordingly and the
        jitted step runs SPMD (parallel/mesh.py rules)."""
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        self.batch_size = batch_size
        self.condition = condition
        self.tick_sleep = tick_sleep
        self.mesh = mesh
        # Fill gating (see tick()): hold partial-batch dispatches for up to
        # this fraction of a frame period from the moment the partial batch
        # was first observed (the straggler grace window).  0 disables.
        # DSM_ASR_FILL_GATE overrides (bench A/B lever).
        import os as _os

        self._fill_gate_frac = float(
            _os.environ.get("DSM_ASR_FILL_GATE", fill_gate_frac)
        )
        self._frame_period_s = cfg.mimi.frame_size / 24000.0
        self._gate_t0 = None

        self._seeded_step = step_fn is None
        self.cache_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
        state = ASR.init_state(cfg, batch_size, self.cache_dtype)
        dp_only = mesh is not None and mesh.shape.get("tp", 1) == 1
        tp = 1 if mesh is None else mesh.shape.get("tp", 1)
        if mesh is not None:
            from ..parallel import mesh as M

            if tp > 1:
                # shard_map tp: heads/MLP-hidden sharded with the Pallas
                # kernels LIVE per shard (dp_tp_shard_step) — the fused
                # projections are pre-permuted so a contiguous tp split is
                # per-shard [q|k|v]/[a|b] blocks.
                params = M.place_tp_params(
                    mesh, M.permute_tp_params(params, tp)
                )
                state = M.place_dp_tp_state(
                    mesh, state, batch_size, cfg.lm.transformer.num_heads
                )
            else:
                params = {
                    "mimi": M.replicate(mesh, params["mimi"]),
                    "lm": {
                        k: (
                            M.shard_transformer_params(mesh, v)
                            if k == "transformer"
                            else M.replicate(mesh, v)
                        )
                        for k, v in params["lm"].items()
                    },
                }
                state = M.shard_batched_state(mesh, state, batch_size)
        self._pcm_wire_int16 = False
        if step_fn is None:
            # Packing concatenates batch segments, which would interleave
            # per-shard blocks under dp shard_map — single-device only
            # (sharded serving runs local PJRT where per-array fetch is
            # cheap anyway).
            pack_outputs = mesh is None

            from ..ops import ring_kernels as _rk

            # Opt-in int16 PCM wire (DSM_PCM_INT16=1): the per-tick
            # host->device upload is B x 1920 f32 (1.5 MB at B=192 — ~15 ms
            # of the in-env tick over the dev tunnel); shipping int16 and
            # dequantising on device halves it.  -96 dB quantisation noise
            # on input audio that mostly arrived as int16/opus anyway, but
            # it perturbs tokens at the ulp level, so it is NOT default —
            # token-exactness tests and goldens run the f32 wire.
            # Constructor arg (TOML pcm_wire via the builder) takes
            # precedence over the DSM_PCM_INT16 env knob — config must
            # not be silently overridden by ambient process state.
            pcm_int16 = mesh is None and (
                pcm_wire_int16
                if pcm_wire_int16 is not None
                else _os.environ.get("DSM_PCM_INT16", "0")
                not in ("0", "", "false")
            )
            self._pcm_wire_int16 = pcm_int16
            if pcm_int16:
                # Device-side dequant prologue in its OWN tiny jit: the
                # flagship step always traces f32 pcm, so the wire toggle
                # shares the step's persistent compile-cache entry instead
                # of forcing a fresh flagship compile (the r4 TTS i16 leg's
                # >2400 s compile was this defect on the TTS side).
                self._wire_in = jax.jit(
                    lambda p: p.astype(jnp.float32) * (1.0 / 32767.0)
                )

            def _step(params, state, pcm, mask, reset, rng, seeds):
                with _rk.kernels_forced(_rk.kernels_override()):
                    out, st = ASR.step(
                        cfg, params, state, pcm, mask, reset, rng, condition,
                        seeds=seeds,
                    )
                if not pack_outputs:
                    return out, st
                # Pack the per-tick host-bound outputs into ONE int32 array
                # so the post-process fetch is a single device->host
                # transfer (each separate fetch pays a full round-trip —
                # ~28 ms each over this env's dev tunnel; batched_asr.rs
                # avoids the same hazard with its pinned output buffer).
                # prs ride as 1e-6 fixed-point, ample for VAD probabilities.
                parts = [
                    out["text_token"].astype(jnp.int32),
                    out["step_idx"].astype(jnp.int32),
                ]
                if out["prs"].shape[-1]:
                    parts.append(
                        (out["prs"].astype(jnp.float32) * 1e6)
                        .astype(jnp.int32).reshape(-1)
                    )
                out = dict(out)
                out["packed"] = jnp.concatenate(parts)
                return out, st

            base = _step
            if mesh is not None:
                from ..parallel import mesh as M

                examples = (
                    params, state,
                    jnp.zeros((batch_size, 1, cfg.mimi.frame_size), jnp.float32),
                    jnp.zeros((batch_size,), bool),
                    jnp.zeros((batch_size,), bool),
                    jax.random.PRNGKey(0),
                    jnp.zeros((batch_size,), jnp.uint32),
                )
                if dp_only:
                    # Each chip steps its own B/dp slots — full serving
                    # step, Pallas kernels included, zero collectives.
                    base = M.dp_shard_step(mesh, _step, batch_size, *examples)
                else:
                    # Head-sharded tp: the per-shard step runs against a
                    # reduced-head config with psum joins; kernels stay
                    # live (their h%8 gate applies to the LOCAL heads).
                    import dataclasses

                    cfg_local = dataclasses.replace(
                        cfg,
                        lm=dataclasses.replace(
                            cfg.lm,
                            transformer=M.tp_local_transformer_cfg(
                                cfg.lm.transformer, tp
                            ),
                        ),
                    )

                    def _local_step(params, state, pcm, mask, reset, rng,
                                    seeds):
                        with _rk.kernels_forced(_rk.kernels_override()):
                            return ASR.step(
                                cfg_local, params, state, pcm, mask, reset,
                                rng, condition, seeds=seeds,
                            )

                    base = M.dp_tp_shard_step(
                        mesh, _local_step, _step, batch_size,
                        cfg.lm.transformer.num_heads, *examples,
                    )
            step_fn = jax.jit(base, donate_argnums=(1,))
        self.step_fn = step_fn
        self.params = params
        self.state = state
        self.word_state = ASR.WordState(cfg, batch_size)
        self.rng = jax.random.PRNGKey(int(time.time()))

        self.slots: List[Optional[Channel]] = [None] * batch_size
        self.free: deque = deque(range(batch_size))
        self.pending_resets = np.zeros(batch_size, bool)
        self._seeds = np.zeros(batch_size, np.uint32)
        self._seed_counter = int(time.time()) & 0x7FFFFFFF
        self.slot_lock = threading.Lock()
        self.running = False
        self.thread: Optional[threading.Thread] = None
        self.step_count = 0
        self.frame_size = cfg.mimi.frame_size
        # Dispatch-ahead pipelining: keep up to N steps in flight and drain
        # results one tick later, overlapping host gather/scatter with the
        # device step (the reference's 3-thread pipeline achieves the same
        # overlap; batched_asr.rs:291-524).
        self.pipeline_depth = max(pipeline_depth, 0)
        self._pending: deque = deque()
        # Threaded post-process (the reference's post_process_loop,
        # batched_asr.rs:655-717): result transfer + word decode + dispatch
        # run on their own thread so the next tick's frame gather/upload
        # overlaps them.  Over this env's dev tunnel that overlap is worth
        # ~3 host round-trips per tick.  tick()-driven tests (no start())
        # keep the inline drain.
        self._pending_cv = threading.Condition()
        self._inflight = 0
        self._drain_thread: Optional[threading.Thread] = None
        # Optional (dt_seconds, batch_utilization) callback per drained step
        # (the bench harness records percentiles; metrics.rs:21-26 analogue).
        self.step_observer = None
        # Optional dict callback with the host-side phase split of each
        # drained step: queue_ms (dispatch -> drain-thread dequeue),
        # fetch_ms (device->host transfer incl. remaining device compute),
        # post_ms (word decode + delivery).  Device compute is
        # shape-constant per batch, so a late step whose excess lives in
        # fetch_ms beyond the device floor is a transfer/tunnel stall and
        # one whose excess lives in queue_ms/post_ms is host contention —
        # the attribution artifact for sustained-tail analysis.
        self.phase_observer = None
        # Optional utils.session_log.SessionLogger: per-slot text+audio
        # token dumps for offline replay (batched_asr.rs Logger :133-214).
        self.session_logger = session_logger
        self._pcm_buf = np.zeros((batch_size, 1, self.frame_size), np.float32)
        self.packer = None
        if use_native_packer or use_native_packer is None:
            try:
                from .native import FramePacker

                self.packer = FramePacker(batch_size, self.frame_size)
            except Exception:
                if use_native_packer:
                    raise
                self.packer = None

    # -- slot lifecycle (batched_asr.rs channels() :795-808) --

    def used_slots(self) -> int:
        with self.slot_lock:
            return self.batch_size - len(self.free)

    def open_channel(
        self, deliver: Callable[[Events], None], seed: Optional[int] = None
    ) -> Optional[Channel]:
        """``seed``: per-request sampling seed (``?seed=`` query param) — with
        temperature > 0 the text sampling stream is then keyed by (seed,
        step), so a session replays identically from its token log whatever
        the co-resident batch looks like."""
        with self.slot_lock:
            if not self.free:
                return None
            slot = self.free.popleft()
            if seed is None:
                self._seed_counter = (self._seed_counter + 1) & 0xFFFFFFFF
                seed = self._seed_counter
            self._seeds[slot] = np.uint32(int(seed) & 0xFFFFFFFF)
            if self.packer is not None:
                self.packer.reset_slot(slot)
            ch = Channel(slot, deliver, packer=self.packer,
                         frame_size=self.frame_size)
            self.slots[slot] = ch
            self.pending_resets[slot] = True
            self.word_state.reset_slot(slot)
        if self.session_logger is not None:
            self.session_logger.open_session(f"asr-{ch.channel_id}")
        metrics.ASR_OPEN_CHANNELS.set(self.used_slots())
        return ch

    def close_channel(self, ch: Channel) -> None:
        with self.slot_lock:
            ch.closed = True
            if self.slots[ch.slot] is ch:
                self.slots[ch.slot] = None
                self.free.append(ch.slot)
        if self.session_logger is not None:
            self.session_logger.close_session(f"asr-{ch.channel_id}")
        metrics.ASR_OPEN_CHANNELS.set(self.used_slots())
        metrics.ASR_STEPS_PER_CONNECTION.observe(max(ch.steps, 0))

    def add_marker(self, ch: Channel, marker_id: int) -> None:
        """Marker is due once all audio sent *before* it has been decoded
        plus the ASR delay (batched_asr.rs marker heap :405-430).

        Computed from the channel's cumulative pushed samples — NOT
        steps + buffered: with dispatch-ahead, frames already gathered
        from the buffer but not yet drained into ch.steps are counted by
        neither term, which fired markers 1-2 frames early and
        nondeterministically dropped trailing words (the reference
        computes steps + data in its single preprocess thread where the
        two are consistent; here the marker lands on the WS thread)."""
        frames_sent = ch.samples_pushed // self.frame_size
        due = frames_sent + self.cfg.asr_delay_in_tokens
        heapq.heappush(ch.markers, (due, marker_id))

    # -- device loop --

    def start(self) -> None:
        self.running = True
        self._drain_thread = threading.Thread(
            target=self._drain_loop, name="asr-post-loop", daemon=True
        )
        self._drain_thread.start()
        self.thread = threading.Thread(target=self._loop, name="asr-model-loop", daemon=True)
        self.thread.start()

    def stop(self) -> None:
        self.running = False
        with self._pending_cv:
            self._pending_cv.notify_all()
        if self.thread:
            self.thread.join(timeout=5)
        if self._drain_thread:
            self._drain_thread.join(timeout=5)
            self._drain_thread = None

    def _invoke_step(self, pcm, mask, reset):
        """Dispatch one jitted step (per-slot seeds when supported)."""
        import jax

        if self._pcm_wire_int16:
            # Upload int16 (half the bytes), dequantise on device in the
            # tiny prologue jit; the flagship step sees f32 either way.
            pcm = self._wire_in(
                (np.clip(pcm, -1.0, 1.0) * 32767.0).astype(np.int16)
            )
        self.rng, sub = jax.random.split(self.rng)
        if self._seeded_step:
            out, self.state = self.step_fn(
                self.params, self.state, pcm, mask, reset, sub,
                self._seeds.copy(),
            )
        else:
            out, self.state = self.step_fn(
                self.params, self.state, pcm, mask, reset, sub
            )
        return out

    def warmup(self, steps: int = 2) -> None:
        """Run zero-frames through the full stack (batched_asr.rs:227-240)."""
        import jax

        zeros = np.zeros((self.batch_size, 1, self.frame_size), np.float32)
        mask = np.zeros(self.batch_size, bool)
        reset = np.zeros(self.batch_size, bool)
        try:
            for _ in range(steps):
                out = self._invoke_step(zeros, mask, reset)
            jax.block_until_ready(out["text_token"])
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
        """One engine tick; returns True if any slot stepped."""
        import jax

        t_pre0 = time.perf_counter()
        mask = np.zeros(self.batch_size, bool)
        reset = np.zeros(self.batch_size, bool)
        chans: List[Optional[Channel]] = [None] * self.batch_size

        # Cadence-aware fill gating: clients push one frame per 80 ms in a
        # near-simultaneous burst, but a tick that races the burst catches
        # only the first arrivals and burns a FULL-batch-cost device step at
        # ~5% utilization — the stragglers then ride the NEXT step and the
        # loop falls one step of cadence debt behind (measured: the >80 ms
        # tail steps of docs/SUSTAINED_r03.json correlate with util 0.07-
        # 0.45 steps).  When some but not all open slots have a frame
        # ready, hold the dispatch for a short straggler GRACE window from
        # the moment the partial batch was first observed — the burst's
        # intra-arrival spread is milliseconds, so the window aligns the
        # dispatch to the CLIENTS' clock (a deadline relative to the last
        # dispatch would drift against the 80 ms burst cadence and cut
        # 8 ms early every frame).  A stalled client delays a tick by at
        # most the grace window; it can never block the batch.
        if self._fill_gate_frac > 0:
            now = t_pre0
            n_open = 0
            n_ready = 0
            catchup = False
            stale_cutoff = time.time() - 2 * self._frame_period_s
            with self.slot_lock:
                any_reset = bool(self.pending_resets.any())
                for ch in self.slots:
                    if ch is not None and not ch.closed:
                        buf = ch.buffered_samples()
                        if buf >= self.frame_size:
                            n_open += 1
                            n_ready += 1
                            if buf >= 2 * self.frame_size:
                                # A slot with 2+ frames queued is catching
                                # up (file upload / reconnect backlog), not
                                # pacing a live 80 ms cadence — gating it
                                # to one dispatch per frame period would
                                # throttle the catch-up to realtime.
                                catchup = True
                        elif ch.last_data >= stale_cutoff:
                            # No frame yet but data flowed within the last
                            # two frame periods: a live straggler worth
                            # waiting for.  Channels idle longer than that
                            # (muted mic, stalled peer) do NOT hold the
                            # gate — otherwise one silent connection would
                            # tax EVERY dispatch with the full grace
                            # window forever.
                            n_open += 1
            if 0 < n_ready < n_open and not catchup and not any_reset:
                if self._gate_t0 is None:
                    self._gate_t0 = now
                if (
                    now - self._gate_t0
                    < self._frame_period_s * self._fill_gate_frac
                ):
                    # Still flush any finished in-flight step while gated
                    # (tick()-driven mode has no drain thread; a ready
                    # result must not sit on the device for the window).
                    if self._pending and self._drain_thread is None:
                        self._drain_one()
                    return False
            self._gate_t0 = None

        with self.slot_lock:
            reset[:] = self.pending_resets
            self.pending_resets[:] = False
            if self.packer is not None:
                active = np.zeros(self.batch_size, bool)
                for slot, ch in enumerate(self.slots):
                    if ch is not None and not ch.closed:
                        active[slot] = True
                        chans[slot] = ch
                out, mask, _n = self.packer.pack(active)
                self._pcm_buf[:, 0, :] = out
                chans = [
                    ch if mask[s] else None for s, ch in enumerate(chans)
                ]
            else:
                for slot, ch in enumerate(self.slots):
                    if ch is None or ch.closed:
                        continue
                    frame = ch.take_frame()
                    if frame is not None:
                        self._pcm_buf[slot, 0, :] = frame
                        mask[slot] = True
                        chans[slot] = ch

        if not mask.any() and not reset.any():
            if any(ch is not None and not ch.closed for ch in self.slots):
                # Open sessions but no frame ready: input starvation
                # (pipeline_stalls_total; metrics.rs:418-420).
                metrics.PIPELINE_STALLS.inc()
            # Idle tick: flush any in-flight results so events don't stall
            # (the drain thread handles this when running).
            if self._pending and self._drain_thread is None:
                self._drain_one()
                return True
            return False

        t0 = time.perf_counter()
        metrics.PIPELINE_PREPROCESS_DURATION.observe(t0 - t_pre0)
        out = self._invoke_step(self._pcm_buf, mask, reset)
        self.step_count += 1
        metrics.LM_STEPS_TOTAL.inc()
        n_active = int(mask.sum())
        # The fused step encodes one Mimi frame per active slot
        # (mimi_frames_encoded_total; metrics.rs:264-266).
        metrics.MIMI_FRAMES_ENCODED.inc(n_active)
        metrics.LM_BATCH_UTILIZATION.observe(float(mask.mean()))
        with self._pending_cv:
            self._pending.append((out, mask.copy(), chans, t0))
            self._inflight += 1
            metrics.LM_QUEUE_DEPTH.set(self._inflight)
            metrics.PIPELINE_CHANNEL_QUEUE_DEPTH.set(self._inflight)
            self._pending_cv.notify_all()
            if self._drain_thread is not None:
                # Backpressure: bound dispatch-ahead, overlapping this
                # tick's post-process (drain thread) with the next tick's
                # frame gather + upload.
                while self._inflight > self.pipeline_depth and self.running:
                    self._pending_cv.wait(timeout=0.5)
        if self._drain_thread is None:
            while self._inflight > self.pipeline_depth:
                self._drain_one()
        return True

    def _drain_loop(self) -> None:
        """Post-process thread (batched_asr.rs post_process_loop)."""
        while True:
            with self._pending_cv:
                while not self._pending and self.running:
                    self._pending_cv.wait(timeout=0.5)
                if not self._pending:
                    if not self.running:
                        return
                    continue
                item = self._pending.popleft()
            try:
                self._process_item(item)
            except Exception:
                metrics.record_connection_error("internal", "asr")
                import traceback

                traceback.print_exc()
            finally:
                with self._pending_cv:
                    self._inflight -= 1
                    self._pending_cv.notify_all()

    def _drain_one(self) -> None:
        """Inline transfer + post-process of the oldest in-flight step
        (tick()-driven tests and shutdown; the drain thread otherwise)."""
        with self._pending_cv:
            if not self._pending:
                return
            item = self._pending.popleft()
        try:
            self._process_item(item)
        finally:
            with self._pending_cv:
                self._inflight -= 1
                self._pending_cv.notify_all()

    def _process_item(self, item) -> None:
        out, mask, chans, t0 = item
        t_deq = time.perf_counter()
        if "packed" in out:
            packed = np.asarray(out["packed"])  # one transfer
            b = self.batch_size
            text_tokens = packed[:b]
            step_idx = packed[b : 2 * b]
            prs = (
                packed[2 * b :].reshape(b, -1).astype(np.float32) * 1e-6
                if packed.shape[0] > 2 * b
                else None
            )
        else:
            text_tokens = np.asarray(out["text_token"])
            step_idx = np.asarray(out["step_idx"])
            prs = np.asarray(out["prs"]) if out["prs"].shape[-1] else None
        dt = time.perf_counter() - t0
        metrics.ASR_MODEL_STEP_DURATION.observe(dt)
        metrics.PIPELINE_BATCH_DURATION.observe(dt)
        if dt > 0:
            # Text tokens emitted this step across the active batch
            # (lm_tokens_per_second; metrics.rs:201-206).
            metrics.LM_TOKENS_PER_SECOND.set(float(mask.sum()) / dt)
        if self.step_observer is not None:
            self.step_observer(dt, float(mask.mean()))
        t_post0 = time.perf_counter()

        if self.session_logger is not None:
            codes = np.asarray(out["codes"])
            for slot, ch in enumerate(chans):
                if ch is not None and mask[slot]:
                    self.session_logger.log_step(
                        f"asr-{ch.channel_id}", int(text_tokens[slot]), codes[slot]
                    )

        events = self.word_state.process(text_tokens, step_idx, mask)
        by_slot: Dict[int, List[object]] = {}
        for ev in events:
            by_slot.setdefault(ev.batch_idx, []).append(ev)

        for slot, ch in enumerate(chans):
            if ch is None:
                continue
            ch.steps = int(step_idx[slot])
            due_markers = []
            while ch.markers and ch.markers[0][0] <= ch.steps:
                due_markers.append(heapq.heappop(ch.markers)[1])
            ev = Events(
                slot=slot,
                channel_id=ch.channel_id,
                words=by_slot.get(slot, []),
                markers=due_markers,
                step_idx=ch.steps,
                prs=prs[slot] if prs is not None else None,
            )
            # Generation check against stale sends (batched_asr.rs:115-123):
            # deliver only if the slot still belongs to this channel.
            if not ch.closed and self.slots[slot] is ch:
                ch.deliver(ev)
        t_post = time.perf_counter() - t_post0
        if self.phase_observer is not None:
            self.phase_observer({
                "t0": t0,
                "queue_ms": (t_deq - t0) * 1e3,
                "fetch_ms": (t_post0 - t_deq) * 1e3,
                "post_ms": t_post * 1e3,
                "util": float(mask.mean()),
            })
        metrics.PIPELINE_POSTPROCESS_DURATION.observe(t_post)
        # Overlap efficiency: fraction of the step window not spent in
        # serial host post-processing — 1.0 when the drain thread fully
        # hides post-process behind the next dispatch (metrics.rs:423-429).
        if dt + t_post > 0:
            overlapped = 1.0 if self._drain_thread is not None else dt / (dt + t_post)
            metrics.PIPELINE_OVERLAP_EFFICIENCY.observe(overlapped)

    def flush(self) -> None:
        """Drain every in-flight step (tests / shutdown)."""
        if self._drain_thread is not None:
            with self._pending_cv:
                while self._inflight > 0:
                    # Liveness guard: if the drain thread died (stop() join
                    # timeout, crash), fall back to inline draining instead
                    # of waiting forever on a cv nobody will notify.
                    if not self._drain_thread.is_alive():
                        break
                    self._pending_cv.wait(timeout=0.5)
            if self._drain_thread.is_alive():
                return
        while self._pending:
            self._drain_one()

    def _loop(self) -> None:
        while self.running:
            try:
                if not self.tick():
                    time.sleep(self.tick_sleep)
            except Exception:
                metrics.record_connection_error("internal", "asr")
                import traceback

                traceback.print_exc()
                time.sleep(0.1)
