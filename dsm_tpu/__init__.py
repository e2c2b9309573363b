"""dsm_tpu — TPU-native delayed-streams-modeling framework.

A from-scratch JAX/XLA/Pallas rebuild of the Kyutai delayed-streams stack
(reference: grantjr1842/delayed-streams-modeling): the Mimi streaming neural
audio codec, the delayed-streams temporal+depth transformer LMs for streaming
STT/TTS, and a production WebSocket server with TPU-resident continuous
batching.

Design notes (TPU-first, not a port):
  * Every streaming module is a pure function pair
    ``init_state(cfg, batch) -> state`` / ``step(cfg, params, state, x, mask)
    -> (y, state')`` over static-shape pytrees, so the full per-frame session
    step compiles to exactly one XLA program (reference keeps dynamic
    ``StreamTensor`` buffers on the host instead —
    moshi-core/src/streaming.rs).
  * KV caches are fixed ring buffers ``(B, H, context, Dh)`` with per-slot
    positions; per-slot reset is a masked ``jnp.where`` over the state pytree,
    never a recompile (reference: moshi-core/src/kv_cache.rs ScatteredKvCache).
  * The continuous batch dimension shards across TPU chips over ICI via
    ``jax.sharding``/pjit (reference is single-GPU only).
"""

__version__ = "0.1.0"
