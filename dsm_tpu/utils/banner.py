"""Startup banner + config summary box (reference: moshi-server/src/banner.rs)."""

from __future__ import annotations


LOGO = r"""
     _                   _
  __| |___ _ __ ___     | |_ _ __  _   _
 / _` / __| '_ ` _ \ ____| __| '_ \| | | |
| (_| \__ \ | | | | |____| |_| |_) | |_| |
 \__,_|___/_| |_| |_|     \__| .__/ \__,_|
                             |_|
 delayed-streams-modeling · TPU-native
"""


def print_banner(cfg, asr_engine, tts_engine, port: int) -> None:
    import jax

    lines = [
        f"instance : {cfg.instance_name}",
        f"backend  : {jax.default_backend()} ({len(jax.devices())} device(s))",
        f"port     : {port}",
    ]
    for name, m in cfg.modules.items():
        extra = ""
        if m.type in ("Asr", "BatchedAsr") and asr_engine is not None:
            extra = f" batch={asr_engine.batch_size} delay={m.asr_delay_in_tokens}"
        lines.append(f"module   : {name} [{m.type}] {m.path}{extra}")
    width = max(len(l) for l in lines) + 2
    print(LOGO)
    print("┌" + "─" * width + "┐")
    for l in lines:
        print("│ " + l.ljust(width - 1) + "│")
    print("└" + "─" * width + "┘")
