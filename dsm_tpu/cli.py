"""dsm-tpu command line.

Subcommands mirror the reference binaries:
  worker     run the server from a TOML config   (moshi-server worker)
  validate   check a config                      (moshi-server validate)
  stt        offline file transcription          (kyutai-cli stt file)
  tts        offline synthesis to WAV            (kyutai-cli tts)
  token-gen  mint a Better Auth JWT              (tools/token-gen)
  bench      run the serving benchmark           (bench_perf)

Usage: python -m dsm_tpu.cli <subcommand> [...]
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def cmd_validate(args) -> int:
    from .server.config import Config

    cfg = Config.load(args.config)
    problems = cfg.validate()
    print(f"instance: {cfg.instance_name}")
    for name, m in cfg.modules.items():
        print(f"  module {name}: type={m.type} path={m.path}")
    if problems:
        print("problems:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print("config ok")
    return 0


def cmd_worker(args) -> int:
    from .server import builder
    from .server.app import App
    from .server.auth import AuthContext
    from .server.config import Config
    from .utils.compile_cache import enable_if_tpu
    from .utils.logging import setup_logging

    setup_logging(args.log_style)
    enable_if_tpu()
    cfg = Config.load(args.config)
    asr_engine = None
    tts_engine = None
    duplex_engine = None
    mimi_rooms_engine = None
    asr_path = "/api/asr-streaming"
    for name, m in cfg.modules.items():
        if m.type in ("BatchedAsr", "Asr") and asr_engine is None:
            asr_engine = builder.build_batched_asr(m)
            asr_path = m.path
        elif m.type == "Tts" and tts_engine is None:
            tts_engine = builder.build_tts(m)
        elif m.type == "Lm" and duplex_engine is None:
            duplex_engine = builder.build_duplex(m)
        elif m.type == "Mimi" and mimi_rooms_engine is None:
            mimi_rooms_engine = builder.build_mimi_rooms(m)
    if asr_engine is not None:
        asr_engine.warmup()
        asr_engine.start()
    if tts_engine is not None and hasattr(tts_engine, "warmup"):
        tts_engine.warmup()
    if tts_engine is not None and hasattr(tts_engine, "start"):
        tts_engine.start()
    if duplex_engine is not None:
        duplex_engine.warmup()
        if hasattr(duplex_engine, "start"):
            duplex_engine.start()  # batched engine device loop
    if mimi_rooms_engine is not None:
        mimi_rooms_engine.warmup()
    import os

    auth_ctx = AuthContext(enabled=bool(os.environ.get("BETTER_AUTH_SECRET")))
    from .utils.banner import print_banner

    print_banner(cfg, asr_engine, tts_engine, args.port)
    static_dir = cfg.static_dir if cfg.static_dir and os.path.isdir(cfg.static_dir) else None
    app = App(
        asr_engine=asr_engine,
        tts_engine=tts_engine,
        duplex_engine=duplex_engine,
        mimi_rooms_engine=mimi_rooms_engine,
        auth_ctx=auth_ctx,
        instance_name=cfg.instance_name,
        asr_path=asr_path,
        static_dir=static_dir,
    )
    cert, key = args.ssl_cert, args.ssl_key
    if args.self_signed_tls and not (cert and key):
        import tempfile

        from .server.app import make_self_signed_cert

        d = tempfile.mkdtemp(prefix="dsm-tls-")
        cert, key = f"{d}/cert.pem", f"{d}/key.pem"
        make_self_signed_cert(cert, key)
        logging.getLogger(__name__).info("self-signed TLS cert at %s", cert)
    app.run(host=args.host, port=args.port, ssl_cert=cert, ssl_key=key)
    return 0


def cmd_stt(args) -> int:
    from .offline import transcribe_file, transcribe_files
    from .utils.compile_cache import enable_if_tpu

    enable_if_tpu()

    if len(args.audio) > 1:
        # Bulk mode: files batch over the model batch dim in one scan.
        results = transcribe_files(
            args.audio, config_path=args.config, vad=args.vad,
        )
        if args.json:
            print(json.dumps(
                [{"path": p, **r} for p, r in zip(args.audio, results)]
            ))
        else:
            for p, r in zip(args.audio, results):
                print(f"== {p}")
                for w in r["words"]:
                    print(f"[{w['start_s']:7.2f}s] {w['text']}")
        return 0
    result = transcribe_file(
        args.audio[0],
        config_path=args.config,
        vad=args.vad,
    )
    if args.json:
        print(json.dumps(result))
    else:
        for w in result["words"]:
            print(f"[{w['start_s']:7.2f}s] {w['text']}")
        print(result["text"])
    return 0


def cmd_tts(args) -> int:
    from .utils.compile_cache import enable_if_tpu

    enable_if_tpu()
    if args.jsonl:
        from .offline import synthesize_jsonl

        manifest = synthesize_jsonl(args.text, args.out, config_path=args.config)
        print(json.dumps(manifest))
        return 0
    from .offline import synthesize_file

    out = synthesize_file(args.text, args.out, config_path=args.config)
    print(json.dumps(out))
    return 0


def cmd_token_gen(args) -> int:
    from .server.auth import generate_token

    print(generate_token(args.user, args.email, ttl_s=args.ttl))
    return 0


def cmd_bench(args) -> int:
    import subprocess

    return subprocess.call([sys.executable, "bench.py"])


def cmd_stt_client(args) -> int:
    """Stream a wav file to a server (kyutai-cli stt file equivalent)."""
    import asyncio

    from .client.stt import SttClient

    client = SttClient(args.url, token=args.token)

    def on_event(ev):
        if ev.type == "word" and (args.mic or args.verbose):
            print(ev.text, end=" ", flush=True, file=sys.stderr)
        elif args.verbose and ev.type == "step":
            print(f"\rstep {ev.step_idx}", end="", file=sys.stderr)

    if args.mic:
        # Live capture (kyutai-cli `stt mic`): one 80 ms frame per read,
        # optionally bounded by --duration.  Degrades with a clear error
        # when no audio backend exists on this host.
        from .client.audio_io import AudioUnavailable, MicSource, require_backend

        try:
            require_backend()
        except AudioUnavailable as e:
            print(f"error: {e}", file=sys.stderr)
            return 2

        def frames():
            import time as _t

            try:
                with MicSource() as mic:
                    t_end = _t.monotonic() + args.duration if args.duration else None
                    while t_end is None or _t.monotonic() < t_end:
                        f = mic.read_frame()
                        if f is None:
                            break
                        yield f
            except AudioUnavailable as e:
                raise SystemExit(f"error: {e}")

        transcript = asyncio.run(
            client.transcribe_frames(frames(), on_event=on_event)
        )
        print(file=sys.stderr)
    else:
        if not args.audio:
            print("error: audio file required without --mic", file=sys.stderr)
            return 2
        from .utils.audio import decode_audio

        pcm = decode_audio(args.audio, 24_000)
        transcript = asyncio.run(
            client.transcribe_pcm(pcm, rtf=args.rtf, on_event=on_event)
        )
    if args.json:
        print(json.dumps({
            "text": transcript.text,
            "words": [
                {"text": w.text, "start_s": w.start_s, "stop_s": w.stop_s}
                for w in transcript.words
            ],
        }))
    else:
        print(transcript.text)
    return 0


def cmd_tts_client(args) -> int:
    """Synthesize via a server, write wav, print TTFB/RTF benchmark JSON
    (kyutai-cli tts.rs:81-94 output format)."""
    import asyncio

    from .client.tts import TtsClient
    from .utils.audio import write_wav

    on_audio = None
    sink = None
    if args.play:
        # Live playback through the prebuffered ring (client-core
        # audio.rs AudioPlayer); gated on the optional backend.
        from .client.audio_io import AudioUnavailable, SpeakerSink

        try:
            sink = SpeakerSink().__enter__()
        except AudioUnavailable as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        on_audio = sink.push

    try:
        result = asyncio.run(
            TtsClient(args.url, token=args.token).synthesize(
                args.text, on_audio=on_audio
            )
        )
    finally:
        # Close the PortAudio stream on failure too (connection refused,
        # server error) — otherwise the output stream leaks.
        if sink is not None:
            sink.__exit__(None, None, None)
    write_wav(args.out, result.pcm, 24_000)
    print(json.dumps({
        "out": args.out,
        "duration_s": round(len(result.pcm) / 24_000.0, 3),
        "ttfb_s": result.ttfb_s,
        "rtf": result.rtf,
        "words": result.words,
    }))
    return 0


def cmd_gen(args) -> int:
    """Offline duplex generation, file -> tokens/audio (moshi-cli gen.rs);
    --trace captures a device profile (moshi-cli --tracing equivalent)."""
    import contextlib

    import numpy as np

    from .models import lm as LM
    from .sessions import lm_gen_simple as G
    from .utils.compile_cache import enable_if_tpu

    enable_if_tpu()

    import jax
    import jax.numpy as jnp

    lm_cfg = getattr(LM, args.preset)()
    delays = tuple(
        [0] + [2] * (lm_cfg.generated_codebooks - 1)
    ) if lm_cfg.generated_codebooks else (0,)
    cfg = G.GenConfig(
        lm=lm_cfg, audio_delays=delays,
        text_start_token=lm_cfg.text_start_token, max_steps=args.steps + 8,
    )
    params = {"lm": LM.init(lm_cfg, jax.random.PRNGKey(args.seed),
                            dtype=jnp.bfloat16)}
    if args.trace:
        from .utils.tracing import device_trace

        tracer = device_trace(args.trace)
    else:
        tracer = contextlib.nullcontext()
    with tracer:
        texts, frames = G.generate(cfg, params, args.steps, seed=args.seed)
    print(json.dumps({
        "text_tokens": texts,
        "audio_frames": int(frames.shape[0]),
        "codebooks": int(frames.shape[1]) if frames.size else 0,
    }))
    if args.out_tokens:
        from safetensors.numpy import save_file

        save_file(
            {"text_tokens": np.asarray(texts, np.int32),
             "audio_tokens": frames.astype(np.int32)},
            args.out_tokens,
        )
    return 0


def cmd_tui(args) -> int:
    """Terminal duplex client (moshi-cli tui)."""
    from .client.tui import run_tui

    st = run_tui(args.url, token=args.token, wav_path=args.audio,
                 seconds=args.seconds)
    print(json.dumps({
        "transcript": st.transcript,
        "frames_sent": st.frames_sent,
        "frames_recv": st.frames_recv,
        "rx_seconds": round(st.rx_seconds, 2),
    }))
    return 0


def cmd_auth_server(args) -> int:
    from .server.auth_server import AuthServer

    srv = AuthServer(db_path=args.db)
    print(f"admin secret: {srv.admin_secret}")
    srv.run(host=args.host, port=args.port)
    return 0


def _apply_platform_env() -> None:
    """Honour DSM_PLATFORM=cpu|tpu (the sitecustomize in some environments
    force-registers a TPU backend, so the JAX_PLATFORMS env var alone is
    not reliable — the config update is)."""
    import os

    plat = os.environ.get("DSM_PLATFORM")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def _load_dotenv(path: str = ".env") -> None:
    """Load KEY=VALUE lines from a .env file in the working directory into
    the environment (existing variables win) — the reference server does
    the same via dotenvy at startup (moshi-server main.rs), so secrets
    like BETTER_AUTH_SECRET need no manual sourcing."""
    import os

    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip().strip("'\"")
        if key:
            os.environ.setdefault(key, val)


def main(argv=None) -> int:
    _load_dotenv()
    _apply_platform_env()
    p = argparse.ArgumentParser(prog="dsm-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("worker", help="run the server")
    w.add_argument("--config", required=True)
    w.add_argument("--host", default="0.0.0.0")
    w.add_argument("--port", type=int, default=8080)
    w.add_argument("--log-style", default="compact",
                   choices=["compact", "pretty", "verbose", "json"])
    w.add_argument("--ssl-cert", default=None, help="TLS certificate PEM")
    w.add_argument("--ssl-key", default=None, help="TLS private key PEM")
    w.add_argument("--self-signed-tls", action="store_true",
                   help="generate a throwaway self-signed cert (dev only)")
    w.set_defaults(fn=cmd_worker)

    v = sub.add_parser("validate", help="validate a config")
    v.add_argument("config")
    v.set_defaults(fn=cmd_validate)

    s = sub.add_parser("stt", help="offline transcription")
    s.add_argument("audio", nargs="+",
                   help="audio file(s); several batch in one device scan")
    s.add_argument("--config", default=None)
    s.add_argument("--vad", action="store_true")
    s.add_argument("--json", action="store_true")
    s.set_defaults(fn=cmd_stt)

    t = sub.add_parser("tts", help="offline synthesis")
    t.add_argument("text", help="text, or a tts.jsonl path with --jsonl")
    t.add_argument("out", help="output wav, or a directory with --jsonl")
    t.add_argument("--config", default=None)
    t.add_argument("--jsonl", action="store_true",
                   help="batch mode: input is the reference tts.jsonl format")
    t.set_defaults(fn=cmd_tts)

    g = sub.add_parser("token-gen", help="mint a JWT")
    g.add_argument("--user", default="cli-user")
    g.add_argument("--email", default="cli@localhost")
    g.add_argument("--ttl", type=int, default=7 * 24 * 3600)
    g.set_defaults(fn=cmd_token_gen)

    b = sub.add_parser("bench", help="serving benchmark")
    b.set_defaults(fn=cmd_bench)

    sc = sub.add_parser("stt-client", help="stream a wav (or live mic) to a server")
    sc.add_argument("audio", nargs="?", default=None)
    sc.add_argument("--url", default="ws://127.0.0.1:8080/api/asr-streaming")
    sc.add_argument("--token", default=None)
    sc.add_argument("--rtf", type=float, default=None,
                    help="pace upload (1.0 = realtime)")
    sc.add_argument("--mic", action="store_true",
                    help="capture from the default input device "
                         "(requires the optional sounddevice backend)")
    sc.add_argument("--duration", type=float, default=None,
                    help="stop mic capture after N seconds")
    sc.add_argument("--json", action="store_true")
    sc.add_argument("--verbose", action="store_true")
    sc.set_defaults(fn=cmd_stt_client)

    tc = sub.add_parser("tts-client", help="synthesize via a server")
    tc.add_argument("text")
    tc.add_argument("out")
    tc.add_argument("--url", default="ws://127.0.0.1:8080/api/tts_streaming")
    tc.add_argument("--token", default=None)
    tc.add_argument("--play", action="store_true",
                    help="play audio live through the default output device "
                         "(requires the optional sounddevice backend)")
    tc.set_defaults(fn=cmd_tts_client)

    gn = sub.add_parser("gen", help="offline duplex generation (token-level)")
    gn.add_argument("--preset", default="moshi_v0_1_streaming")
    gn.add_argument("--steps", type=int, default=50)
    gn.add_argument("--seed", type=int, default=0)
    gn.add_argument("--out-tokens", default=None)
    gn.add_argument("--trace", default=None,
                    help="capture a device profile to this dir (Perfetto)")
    gn.set_defaults(fn=cmd_gen)

    tu = sub.add_parser("tui", help="terminal duplex client")
    tu.add_argument("--url", default="ws://127.0.0.1:8080/api/chat")
    tu.add_argument("--token", default=None)
    tu.add_argument("--audio", default=None, help="WAV to stream (else silence)")
    tu.add_argument("--seconds", type=float, default=30.0)
    tu.set_defaults(fn=cmd_tui)

    a = sub.add_parser("auth-server", help="run the JWT issuance service")
    a.add_argument("--host", default="0.0.0.0")
    a.add_argument("--port", type=int, default=8081)
    a.add_argument("--db", default="auth.sqlite3")
    a.set_defaults(fn=cmd_auth_server)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
