"""LM step + DepFormer sampling semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from dsm_tpu.models import lm
from dsm_tpu.ops import sampling as S
from dsm_tpu.ops import transformer as T


def small_lm(depformer=True, extra_heads=None, ca=False):
    tf = T.TransformerConfig(
        d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
        context=16, cross_attention=ca, ca_dim=24 if ca else None,
    )
    dep = None
    if depformer:
        dep = lm.DepFormerConfig(
            transformer=T.TransformerConfig(
                d_model=16, num_heads=2, num_layers=2, dim_feedforward=32,
                context=4, positional_embedding="none",
            ),
            num_slices=4,
        )
    return lm.LmConfig(
        transformer=tf, depformer=dep,
        text_in_vocab_size=11, text_out_vocab_size=10,
        audio_vocab_size=9, audio_codebooks=3,
        extra_heads=extra_heads,
    )


def test_lm_step_shapes_and_state():
    cfg = small_lm(extra_heads=(2, 6))
    params = lm.init(cfg, jax.random.PRNGKey(0))
    state = lm.init_state(cfg, 2, cache_dtype=jnp.float32)
    text = jnp.array([10, 3], jnp.int32)
    audio = jnp.full((2, 3), 8, jnp.int32)
    logits, hidden, state = lm.step(cfg, params, state, text, audio)
    assert logits.shape == (2, 10)
    assert hidden.shape == (2, 32)
    assert int(state["t"]["pos"]) == 1  # global tick counter
    prs = lm.extra_heads_probs(cfg, params, hidden)
    assert prs.shape == (2, 2)
    assert jnp.all((prs >= 0) & (prs <= 1))


def test_masked_embedding_absent_tokens():
    cfg = small_lm(depformer=False)
    params = lm.init(cfg, jax.random.PRNGKey(0))
    # -1 audio ids contribute nothing: equal to text-only embedding.
    text = jnp.array([5], jnp.int32)
    e1 = lm.embed_inputs(cfg, params, text, jnp.full((1, 3), -1, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(e1[:, 0]), np.asarray(params["text_emb"][5][None]), atol=1e-6
    )
    # -1 text id -> zeros + audio embeddings.
    e2 = lm.embed_inputs(
        cfg, params, jnp.array([-1], jnp.int32), jnp.array([[2, -1, -1]], jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(e2[:, 0]), np.asarray(params["audio_embs"][0, 2][None]), atol=1e-6
    )


def test_depformer_sample_shapes_and_forcing():
    cfg = small_lm()
    params = lm.init(cfg, jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    text_tok = jnp.array([1, 2], jnp.int32)
    samp = S.SamplingConfig(temperature=0.0)

    toks = lm.depformer_sample(
        cfg, params, hidden, text_tok,
        lm.forced_audio_tokens(cfg, False),
        jax.random.PRNGKey(2), samp,
    )
    assert toks.shape == (2, 4)
    # Depformer can never emit the audio pad token (vocab V-1; lm.rs:626).
    assert int(toks.max()) < cfg.audio_pad_token

    # Greedy sampling is deterministic.
    toks2 = lm.depformer_sample(
        cfg, params, hidden, text_tok,
        lm.forced_audio_tokens(cfg, False),
        jax.random.PRNGKey(99), samp,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))

    # During the acoustic delay, slices > 0 are fed forced pads, which changes
    # the conditioning of later slices (teacher forcing; lm.rs:1196-1221).
    toks_forced = lm.depformer_sample(
        cfg, params, hidden, text_tok,
        lm.forced_audio_tokens(cfg, True),
        jax.random.PRNGKey(2), samp,
    )
    assert toks_forced.shape == (2, 4)
    # Slice 0 sees identical inputs either way.
    np.testing.assert_array_equal(np.asarray(toks[:, 0]), np.asarray(toks_forced[:, 0]))


def test_depformer_cfg_guidance_rows_agree():
    cfg = small_lm()
    params = lm.init(cfg, jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 32))  # [cond, uncond]
    toks = lm.depformer_sample(
        cfg, params, hidden, jnp.array([1, 1], jnp.int32),
        lm.forced_audio_tokens(cfg, False),
        jax.random.PRNGKey(2), S.SamplingConfig(temperature=0.0), cfg_alpha=2.0,
    )
    np.testing.assert_array_equal(np.asarray(toks[0]), np.asarray(toks[1]))


def test_lm_step_with_cross_attention():
    cfg = small_lm(ca=True)
    params = lm.init(cfg, jax.random.PRNGKey(0))
    state = lm.init_state(cfg, 1, cache_dtype=jnp.float32)
    ca_tokens = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 24))
    ca_kv = T.precompute_ca_kv(cfg.transformer, params["transformer"], ca_tokens)
    logits, hidden, state = lm.step(
        cfg, params, state,
        jnp.array([1], jnp.int32), jnp.full((1, 3), 8, jnp.int32), ca_kv=ca_kv,
    )
    assert jnp.all(jnp.isfinite(logits))


def test_presets_construct():
    for preset in [
        lm.stt_1b_en_fr, lm.stt_2_6b_en, lm.asr_300m_202501, lm.asr_v0_1_1b,
        lm.tts_1_6b_en_fr, lm.tts_202501, lm.moshi_v0_1, lm.s2s_2b_16rvq_202501,
    ]:
        cfg = preset()
        assert cfg.audio_pad_token == cfg.audio_vocab_size - 1
        assert cfg.text_start_token == cfg.text_in_vocab_size - 1
    assert lm.stt_1b_en_fr().extra_heads == (4, 6)
    assert lm.tts_1_6b_en_fr().generated_codebooks == 32


def test_depformer_lean_path_matches_generic(monkeypatch):
    """The lean DepFormer path (T.micro_step dense micro-cache + hoisted
    linear_in einsum) samples the SAME tokens as the generic ring-cache
    path — greedy and with per-slot keyed sampling, with and without CFG
    and low-rank embeddings."""
    for low_rank, cfg_alpha in ((None, None), (8, None), (8, 2.0)):
        tf = T.TransformerConfig(
            d_model=32, num_heads=4, num_layers=2, dim_feedforward=64,
            context=16,
        )
        dep = lm.DepFormerConfig(
            transformer=T.TransformerConfig(
                d_model=16, num_heads=2, num_layers=2, dim_feedforward=32,
                context=6, positional_embedding="none",
            ),
            num_slices=6,
            low_rank_embeddings=low_rank,
        )
        cfg = lm.LmConfig(
            transformer=tf, depformer=dep,
            text_in_vocab_size=11, text_out_vocab_size=10,
            audio_vocab_size=9, audio_codebooks=3,
        )
        params = lm.init(cfg, jax.random.PRNGKey(3))
        b = 4
        hidden = jax.random.normal(jax.random.PRNGKey(4), (b, 32))
        text = jnp.array([1, 2, 3, 4], jnp.int32)
        forced = jnp.full((dep.num_slices,), -1, jnp.int32)
        key = jax.random.PRNGKey(5)
        kw = dict(cfg_alpha=cfg_alpha)

        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("DSM_DEP_LEAN", flag)
            outs[flag] = np.asarray(lm.depformer_sample(
                cfg, params, hidden, text, forced, key,
                S.SamplingConfig(0.0, 1), **kw,
            ))
        np.testing.assert_array_equal(
            outs["1"], outs["0"],
            err_msg=f"greedy mismatch (low_rank={low_rank}, cfg={cfg_alpha})",
        )

        # Per-slot keyed sampling with temperature: same keys -> same draws
        # (the lean path must not perturb the logits enough to flip draws
        # at these magnitudes; identical math up to reassociation).
        slot_keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(b // 2 if cfg_alpha else b, dtype=jnp.uint32) + 7
        )
        outs = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("DSM_DEP_LEAN", flag)
            outs[flag] = np.asarray(lm.depformer_sample(
                cfg, params, hidden, text, forced, key,
                S.SamplingConfig(0.8, 5), slot_keys=slot_keys, **kw,
            ))
        np.testing.assert_array_equal(outs["1"], outs["0"])


def test_depformer_lean_unroll_invariant(monkeypatch):
    """Scan unroll is a scheduling knob, not a semantics knob."""
    cfg = small_lm()
    params = lm.init(cfg, jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    text = jnp.array([1, 2], jnp.int32)
    forced = jnp.full((4,), -1, jnp.int32)
    outs = []
    for u in ("1", "2", "4"):
        monkeypatch.setenv("DSM_DEP_UNROLL", u)
        outs.append(np.asarray(lm.depformer_sample(
            cfg, params, hidden, text, forced, jax.random.PRNGKey(2),
            S.SamplingConfig(0.0, 1),
        )))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
