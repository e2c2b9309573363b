"""Mesh + sharding rules on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dsm_tpu.models import lm as LM
from dsm_tpu.ops import transformer as T
from dsm_tpu.parallel import mesh as M


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return M.make_mesh(dp=4, tp=2)


def small_tcfg():
    return T.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=96, context=16
    )


def test_param_sharding_specs(mesh):
    cfg = small_tcfg()
    params = T.init(cfg, jax.random.PRNGKey(0))
    sharded = M.shard_transformer_params(mesh, params)
    # Column-parallel in_proj over tp; row-parallel out_proj.
    assert sharded["in_proj_w"].sharding.spec == P(None, "tp", None)
    assert sharded["out_proj_w"].sharding.spec == P(None, None, "tp")
    assert sharded["mlp"]["linear_in"].sharding.spec == P(None, "tp", None)
    assert sharded["mlp"]["linear_out"].sharding.spec == P(None, None, "tp")
    # Norms replicated.
    assert sharded["norm1"]["alpha"].sharding.spec == P()


def test_state_sharding_and_sharded_step(mesh):
    cfg = small_tcfg()
    params = M.shard_transformer_params(mesh, T.init(cfg, jax.random.PRNGKey(0)))
    b = 8
    state = M.shard_batched_state(mesh, T.init_state(cfg, b, jnp.float32), b)
    assert state["layers"][0]["k"].sharding.spec == P("dp", "tp", None, None)
    assert state["valid"].sharding.spec == P("dp", None)

    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (b, 1, 32)),
        M.batch_sharding(mesh),
    )
    step = jax.jit(lambda p, s, x: T.step(cfg, p, s, x))
    y, state2 = step(params, state, x)
    assert y.shape == (b, 1, 32)
    # Batch stays dp-sharded through the step.
    assert "dp" in str(y.sharding)
    # Result matches the unsharded step.
    y_ref, _ = T.step(cfg, jax.device_get(params) and T.init(cfg, jax.random.PRNGKey(0)),
                      T.init_state(cfg, b, jnp.float32), jax.device_get(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5, rtol=1e-4)


def test_sharded_lm_step_runs(mesh):
    cfg = LM.LmConfig(
        transformer=small_tcfg(), depformer=None,
        text_in_vocab_size=17, text_out_vocab_size=16,
        audio_vocab_size=9, audio_codebooks=2,
    )
    params = LM.init(cfg, jax.random.PRNGKey(0))
    params = {
        k: (M.shard_transformer_params(mesh, v) if k == "transformer"
            else M.replicate(mesh, v))
        for k, v in params.items()
    }
    b = 8
    state = M.shard_batched_state(mesh, LM.init_state(cfg, b, jnp.float32), b)
    bs = M.batch_sharding(mesh)
    text = jax.device_put(jnp.zeros((b,), jnp.int32), bs)
    audio = jax.device_put(jnp.zeros((b, 2), jnp.int32), bs)
    logits, hidden, state = jax.jit(
        lambda p, s, t, a: LM.step(cfg, p, s, t, a)
    )(params, state, text, audio)
    assert logits.shape == (b, 16)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_mesh_validation():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    # Oversubscription is an error; a SUBSET mesh is valid (two modules
    # from one TOML may each mesh part of the machine).
    with pytest.raises(ValueError):
        M.make_mesh(dp=9, tp=1)
    m = M.make_mesh(dp=3, tp=2)
    assert m.shape == {"dp": 3, "tp": 2}


def test_batched_asr_engine_on_mesh(mesh):
    """Full continuous-batching engine sharded dp x tp on the virtual mesh."""
    import numpy as np

    from dsm_tpu.server import batched_asr as eng
    from tests.test_asr import make_params, small_asr_cfg

    cfg = small_asr_cfg()
    saved = eng.FRAME_SIZE
    eng.FRAME_SIZE = cfg.mimi.frame_size
    try:
        params = make_params(cfg, jax.random.PRNGKey(0))
        e = eng.BatchedAsrEngine(cfg, params, batch_size=8, mesh=mesh)
        # State landed sharded.
        assert "dp" in str(e.state["lm"]["t"]["layers"][0]["k"].sharding)
        events = []
        ch = e.open_channel(events.append)
        pcm = np.random.default_rng(0).standard_normal(
            cfg.mimi.frame_size * 2
        ).astype(np.float32) * 0.1
        ch.push_pcm(pcm)
        while e.tick():
            pass
        assert len(events) == 2
        assert events[-1].step_idx == 2
    finally:
        eng.FRAME_SIZE = saved


def test_dp_shard_step_engine_with_kernels(monkeypatch):
    """Pure-dp mesh: the engine wraps its step with shard_map so the Pallas
    serving kernels run PER SHARD (parallel/mesh.dp_shard_step) — forced on
    here (interpret mode on CPU) and compared against an unsharded engine
    step with kernels off.  This is the multi-chip path that keeps the
    kernels; GSPMD-only meshes (tp>1) fall back to the XLA KV paths."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.sessions import asr as ASR
    from dsm_tpu.server.batched_asr import BatchedAsrEngine
    from tests.test_mimi import small_cfg as small_mimi_cfg

    monkeypatch.setenv("DSM_RING_KERNEL", "1")
    monkeypatch.setenv("DSM_DECODE_ATTN", "1")

    mesh_dp = M.make_mesh(dp=8, tp=1)
    mimi_cfg = small_mimi_cfg()
    # Shapes that satisfy decode_attn.supported (C>=256 via context, Dh=128,
    # H=8) while staying CPU-feasible at batch 8.
    lm_cfg = LM.LmConfig(
        transformer=T.TransformerConfig(
            d_model=1024, num_heads=8, num_layers=1, dim_feedforward=256,
            context=250,
        ),
        depformer=None,
        text_in_vocab_size=33, text_out_vocab_size=32,
        audio_vocab_size=mimi_cfg.bins + 1, audio_codebooks=mimi_cfg.n_q,
    )
    acfg = ASR.AsrConfig(lm=lm_cfg, mimi=mimi_cfg, asr_delay_in_tokens=1,
                         temperature=0.0, kv_quant=True)
    key = jax.random.PRNGKey(0)
    params = {
        "lm": LM.init(lm_cfg, key, dtype=jnp.float32),
        "mimi": MIMI.init(mimi_cfg, jax.random.fold_in(key, 1)),
    }
    b = 8
    pcm = (np.random.default_rng(0)
           .standard_normal((b, 1, mimi_cfg.frame_size)).astype(np.float32) * 0.1)
    mask = jnp.ones((b,), bool)
    reset = jnp.zeros((b,), bool)
    rng = jax.random.PRNGKey(7)
    seeds = jnp.arange(b, dtype=jnp.uint32)

    eng = BatchedAsrEngine(acfg, params, batch_size=b, mesh=mesh_dp,
                           use_native_packer=False)
    toks_sharded = []
    state = eng.state
    for i in range(3):
        out, state = eng.step_fn(eng.params, state, jnp.asarray(pcm), mask,
                                 reset, rng, seeds)
        toks_sharded.append(np.asarray(out["text_token"]))

    # Unsharded reference with kernels off (the XLA path).
    monkeypatch.setenv("DSM_RING_KERNEL", "0")
    monkeypatch.setenv("DSM_DECODE_ATTN", "0")
    state_ref = ASR.init_state(acfg, b, jnp.float32)
    toks_ref = []
    for i in range(3):
        out_ref, state_ref = ASR.step(acfg, params, state_ref,
                                      jnp.asarray(pcm), mask, reset, rng,
                                      seeds=seeds)
        toks_ref.append(np.asarray(out_ref["text_token"]))

    # Greedy text tokens must agree exactly across all steps.
    np.testing.assert_array_equal(np.stack(toks_sharded), np.stack(toks_ref))


def test_batched_duplex_engine_on_mesh():
    """Continuously-batched duplex dialogues shard over a pure-dp mesh
    (TOML [modules.X.mesh] dp = N surface; kernels trace-disabled)."""
    import numpy as np

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dsm_tpu.server.duplex_batched import (
        BatchedDuplexEngine, DuplexAudioEvent,
    )
    from tests.test_duplex_server import make_duplex_engine

    mesh_dp = M.make_mesh(dp=8, tp=1)
    single, mimi_cfg = make_duplex_engine()
    eng = BatchedDuplexEngine(
        single.cfg, single.params, mimi_cfg, single.mimi_params,
        single.tokenizer, batch_size=8, mesh=mesh_dp,
    )
    assert "dp" in str(eng.state["lm"]["t"]["layers"][0]["k"].sharding)
    eng.warmup()
    events = []
    drv = eng.open_session(events.append)
    rng = np.random.default_rng(0)
    drv.push_pcm(
        rng.standard_normal(mimi_cfg.frame_size * 6).astype(np.float32) * 0.1
    )
    for _ in range(8):
        eng.tick()
    audio = [e for e in events if isinstance(e, DuplexAudioEvent)]
    assert len(audio) >= 1
    assert np.isfinite(audio[0].pcm).all()

    # tp meshes are supported since round 4 (Megatron-split weights), but
    # the batch must divide dp — 6 % 4 != 0 rejects.
    with pytest.raises(ValueError, match="not divisible by dp"):
        BatchedDuplexEngine(
            single.cfg, single.params, mimi_cfg, single.mimi_params,
            single.tokenizer, batch_size=6, mesh=M.make_mesh(dp=4, tp=2),
        )


def test_tts_engine_mesh_with_int8_ca():
    """dp-meshed TTS engine with the int8-native voice-CA store: dict
    leaves land dp-sharded on axis 1 and sessions still synthesize."""
    import numpy as np

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dsm_tpu.server.tts_batched import BatchedTtsEngine
    from dsm_tpu.server.tts_module import AudioEvent
    from dsm_tpu.utils.tokenizer import FallbackTokenizer
    from tests.test_mimi import small_cfg as small_mimi_cfg
    from tests.test_tts import small_tts_cfg
    from dsm_tpu.models import mimi as MIMI

    mesh_dp = M.make_mesh(dp=8, tp=1)
    cfg = small_tts_cfg(max_steps=96)
    mimi_cfg = small_mimi_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    eng = BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=8, ca_len=6, ca_quant=True, mesh=mesh_dp,
    )
    assert isinstance(eng._ca_raw, dict)
    assert "dp" in str(eng._ca_raw["k"].sharding)
    evs = []
    s = eng.open_session(evs.append)
    s.feed_words([[31, 5]])
    s.end_input()
    n = 0
    while eng.tick() and n < 200:
        n += 1
    assert any(isinstance(e, AudioEvent) for e in evs)


def test_tts_engine_mesh_fused_ticks():
    """dp-meshed FUSED engine: the device script machine's scatter writes
    and the K-tick lax.scan partition under GSPMD and sessions complete."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dsm_tpu.server.tts_batched import BatchedTtsEngine, DoneEvent
    from dsm_tpu.server.tts_module import AudioEvent
    from dsm_tpu.utils.tokenizer import FallbackTokenizer
    from tests.test_mimi import small_cfg as small_mimi_cfg
    from tests.test_tts import small_tts_cfg
    from dsm_tpu.models import mimi as MIMI

    mesh_dp = M.make_mesh(dp=8, tp=1)
    cfg = small_tts_cfg(max_steps=96)
    mimi_cfg = small_mimi_cfg()
    params = {"lm": LM.init(cfg.lm, jax.random.PRNGKey(0))}
    mimi_params = MIMI.init(mimi_cfg, jax.random.PRNGKey(1))
    eng = BatchedTtsEngine(
        cfg, params, mimi_cfg, mimi_params, FallbackTokenizer(),
        batch_size=8, ca_len=6, mesh=mesh_dp, fuse_ticks=3, script_cap=32,
    )
    evs = []
    s = eng.open_session(evs.append, seed=4)
    s.feed_words([[31, 5], [9]])
    s.end_input()
    n = 0
    while eng.tick() and n < 120:
        n += 1
    assert any(isinstance(e, AudioEvent) for e in evs)
    assert any(isinstance(e, DoneEvent) for e in evs)


def test_dp_tp_shard_map_kernels_token_exact(monkeypatch):
    """dp=4 x tp=2 shard_map serving with the Pallas kernels LIVE per shard
    (head-sharded KV rings, Megatron-split projections, psum joins) is
    token-exact vs the unsharded XLA path — the tp analogue of stage 5."""
    import dataclasses

    import numpy as np

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.sessions import asr as ASR

    monkeypatch.setenv("DSM_RING_KERNEL", "1")
    monkeypatch.setenv("DSM_DECODE_ATTN", "1")
    mesh = M.make_mesh(dp=4, tp=2)
    mimi_cfg = MIMI.MimiConfig(
        seanet=MIMI.SeaNetConfig(
            dimension=32, channels=1, n_filters=4, n_residual_layers=1,
            ratios=(4, 3, 2), kernel_size=7, residual_kernel_size=3,
            last_kernel_size=3,
        ),
        transformer=T.TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            context=16, gating=False, norm="layer_norm",
            positional_embedding="rope", layer_scale=0.01,
        ),
        n_q=4, bins=32, q_dim=16, sample_rate=600.0, frame_rate=12.5,
    )
    # 16 heads x hd 64: local 8 heads under tp=2 — the decode-attention
    # kernel's h%8 gate stays satisfied PER SHARD.
    lm_cfg = LM.LmConfig(
        transformer=T.TransformerConfig(
            d_model=1024, num_heads=16, num_layers=1,
            dim_feedforward=256, context=250,
        ),
        depformer=None,
        text_in_vocab_size=33, text_out_vocab_size=32,
        audio_vocab_size=mimi_cfg.bins + 1, audio_codebooks=mimi_cfg.n_q,
    )
    acfg = ASR.AsrConfig(
        lm=lm_cfg, mimi=mimi_cfg, asr_delay_in_tokens=1,
        temperature=0.0, kv_quant=True,
    )
    acfg_local = dataclasses.replace(
        acfg,
        lm=dataclasses.replace(
            lm_cfg,
            transformer=M.tp_local_transformer_cfg(lm_cfg.transformer, 2),
        ),
    )
    key = jax.random.PRNGKey(0)
    params = {
        "lm": LM.init(lm_cfg, key, dtype=jnp.float32),
        "mimi": MIMI.init(mimi_cfg, jax.random.fold_in(key, 1)),
    }
    pparams = M.permute_tp_params(params, 2)

    b = 8
    pcm = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((b, 1, mimi_cfg.frame_size))
        .astype(np.float32) * 0.1
    )
    mask = jnp.ones((b,), bool)
    reset = jnp.zeros((b,), bool)
    rng = jax.random.PRNGKey(7)
    seeds = jnp.arange(b, dtype=jnp.uint32)

    def local_fn(p, s, x, m, r, k, sd):
        return ASR.step(acfg_local, p, s, x, m, r, k, seeds=sd)

    def global_fn(p, s, x, m, r, k, sd):
        return ASR.step(acfg, p, s, x, m, r, k, seeds=sd)

    state0 = ASR.init_state(acfg, b, jnp.float32)
    wrapped = jax.jit(M.dp_tp_shard_step(
        mesh, local_fn, global_fn, b, lm_cfg.transformer.num_heads,
        pparams, state0, pcm, mask, reset, rng, seeds,
    ))

    state = state0
    toks_tp = []
    for i in range(3):
        out, state = wrapped(
            pparams, state, pcm + i * 0.01, mask, reset, rng, seeds
        )
        toks_tp.append(np.asarray(out["text_token"]))

    monkeypatch.setenv("DSM_RING_KERNEL", "0")
    monkeypatch.setenv("DSM_DECODE_ATTN", "0")
    state_ref = ASR.init_state(acfg, b, jnp.float32)
    for i in range(3):
        out_ref, state_ref = ASR.step(
            acfg, params, state_ref, pcm + i * 0.01, mask, reset, rng,
            seeds=seeds,
        )
        assert np.array_equal(toks_tp[i], np.asarray(out_ref["text_token"])), (
            f"step {i}: tp tokens diverge from unsharded"
        )


def test_dp_tp_shard_map_quantized_weights_token_exact(monkeypatch):
    """The serving profile's int8 weight dicts ({q, s}) permute and shard
    correctly under tp (rows of q and their per-row scales move together):
    dp=4 x tp=2 with quantised weights is token-exact vs the unsharded
    quantised path."""
    import dataclasses

    import numpy as np

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.sessions import asr as ASR

    mesh = M.make_mesh(dp=4, tp=2)
    from tests.test_asr import make_params, small_asr_cfg

    acfg = small_asr_cfg()
    acfg = dataclasses.replace(acfg, temperature=0.0)
    acfg_local = dataclasses.replace(
        acfg,
        lm=dataclasses.replace(
            acfg.lm,
            transformer=M.tp_local_transformer_cfg(acfg.lm.transformer, 2),
        ),
    )
    params = make_params(acfg, jax.random.PRNGKey(0))
    # min_size=0 scoped to the main transformer: quantise every projection
    # at these tiny shapes (the production profile's min_size skips
    # non-matmul leaves like extra_heads that a blanket min_size=0 would
    # wrongly dict-ify).
    params_q = {
        "mimi": params["mimi"],
        "lm": {
            **params["lm"],
            "transformer": T.quantize_weights(
                params["lm"]["transformer"], min_size=0
            ),
        },
    }
    pparams = M.permute_tp_params(params_q, 2)

    b = 8
    pcm = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((b, 1, acfg.mimi.frame_size))
        .astype(np.float32) * 0.1
    )
    mask = jnp.ones((b,), bool)
    reset = jnp.zeros((b,), bool)
    rng = jax.random.PRNGKey(7)
    seeds = jnp.arange(b, dtype=jnp.uint32)

    def local_fn(p, s, x, m, r, k, sd):
        return ASR.step(acfg_local, p, s, x, m, r, k, seeds=sd)

    def global_fn(p, s, x, m, r, k, sd):
        return ASR.step(acfg, p, s, x, m, r, k, seeds=sd)

    state0 = ASR.init_state(acfg, b, jnp.float32)
    wrapped = jax.jit(M.dp_tp_shard_step(
        mesh, local_fn, global_fn, b, acfg.lm.transformer.num_heads,
        pparams, state0, pcm, mask, reset, rng, seeds,
    ))
    out, _ = wrapped(pparams, state0, pcm, mask, reset, rng, seeds)

    state_ref = ASR.init_state(acfg, b, jnp.float32)
    out_ref, _ = ASR.step(
        acfg, params_q, state_ref, pcm, mask, reset, rng, seeds=seeds
    )
    assert np.array_equal(
        np.asarray(out["text_token"]), np.asarray(out_ref["text_token"])
    )


def test_tts_and_duplex_engines_under_tp2():
    """Continuous TTS + duplex SERVER engines on a dp x tp=2 mesh
    (round-4: Megatron-split LM weights incl. the depformer's
    (S, L, out, in) stacks; KV + voice-CA heads over tp) — the pytest
    mirror of dryrun stage 8, so CI covers the tp path without running
    __graft_entry__."""
    import numpy as np

    from dsm_tpu.models import lm as LM
    from dsm_tpu.models import mimi as MIMI
    from dsm_tpu.ops import transformer as T
    from dsm_tpu.server import tts_batched as btts
    from dsm_tpu.sessions import tts as TTS
    from dsm_tpu.utils.tokenizer import FallbackTokenizer

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = M.make_mesh(dp=4, tp=2)

    tcfg = T.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=32, cross_attention=True, ca_norm="layer_norm",
    )
    dep = LM.DepFormerConfig(
        transformer=T.TransformerConfig(
            # ff=48 -> GLU hidden 32: tp=2-divisible per-shard blocks.
            d_model=16, num_heads=2, num_layers=2, dim_feedforward=48,
            context=2, positional_embedding="none",
        ),
        num_slices=2,
    )
    lm_cfg = LM.LmConfig(
        transformer=tcfg, depformer=dep,
        text_in_vocab_size=33, text_out_vocab_size=32,
        audio_vocab_size=17, audio_codebooks=2,
    )
    tts_cfg = TTS.TtsConfig(
        lm=lm_cfg, text_audio_delay_in_tokens=2, max_steps=64,
        text_temperature=0.0, temperature=0.0,
    )
    seanet = MIMI.SeaNetConfig(
        dimension=32, channels=1, n_filters=4, n_residual_layers=1,
        ratios=(4, 3, 2), kernel_size=7, residual_kernel_size=3,
        last_kernel_size=3,
    )
    mtf = T.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=16, gating=False, norm="layer_norm",
        positional_embedding="rope", layer_scale=0.01,
    )
    mimi_cfg = MIMI.MimiConfig(
        seanet=seanet, transformer=mtf, n_q=2, bins=16, q_dim=16,
        sample_rate=600.0, frame_rate=12.5,
    )
    key = jax.random.PRNGKey(13)
    teng = btts.BatchedTtsEngine(
        tts_cfg, {"lm": LM.init(lm_cfg, key)}, mimi_cfg,
        MIMI.init(mimi_cfg, jax.random.fold_in(key, 1)), FallbackTokenizer(),
        batch_size=8, ca_len=8, cfg_enabled=True, mesh=mesh,
        fuse_ticks=2, script_cap=32,
    )
    # Weights took the tp split (column-parallel in_proj sharded over tp).
    in_proj = teng.params["lm"]["transformer"]["in_proj_w"]
    assert "tp" in str(in_proj.sharding)
    tevents = []
    drv = teng.open_session(tevents.append, cfg_alpha=2.0, seed=1)
    drv.feed_words([[5], [6]])
    drv.end_input()
    for _ in range(tts_cfg.text_audio_delay_in_tokens + 10):
        teng.tick()
    assert any(
        isinstance(ev, btts.AudioEvent) for ev in tevents
    ) or drv.steps > 0

    # -- duplex under tp=2 --
    from dsm_tpu.server.duplex_batched import (
        BatchedDuplexEngine, DuplexAudioEvent,
    )
    from dsm_tpu.sessions import lm_gen

    dlm = LM.LmConfig(
        transformer=T.TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            context=32,
        ),
        depformer=dep,
        text_in_vocab_size=33, text_out_vocab_size=32,
        audio_vocab_size=17, audio_codebooks=4,
    )
    dcfg = lm_gen.DuplexConfig(
        lm=dlm, generated_audio_codebooks=2, input_audio_codebooks=2,
        acoustic_delay=1, text_start_token=dlm.text_start_token,
    )
    dkey = jax.random.PRNGKey(17)
    dparams = {
        "lm": LM.init(dlm, dkey),
        "mimi": MIMI.init(mimi_cfg, jax.random.fold_in(dkey, 1)),
    }
    deng = BatchedDuplexEngine(
        dcfg, dparams, mimi_cfg, dparams["mimi"], FallbackTokenizer(),
        batch_size=8, mesh=mesh,
    )
    devents = []
    ddrv = deng.open_session(devents.append)
    ddrv.push_pcm(
        np.random.default_rng(4).standard_normal(
            mimi_cfg.frame_size * 4
        ).astype(np.float32) * 0.1
    )
    for _ in range(6):
        deng.tick()
    assert any(
        isinstance(ev, DuplexAudioEvent) for ev in devents
    ) or ddrv.steps > 0
