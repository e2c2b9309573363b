#!/usr/bin/env python3
"""Stream a WAV file to a running dsm-tpu server and print live words.

  python examples/stt_streaming.py audio.wav --url ws://host:8080/api/asr-streaming
"""

import argparse
import asyncio
import sys

sys.path.insert(0, ".")

from dsm_tpu.client.stt import SttClient
from dsm_tpu.utils.audio import decode_audio


async def main():
    p = argparse.ArgumentParser()
    p.add_argument("audio")
    p.add_argument("--url", default="ws://127.0.0.1:8080/api/asr-streaming")
    p.add_argument("--token", default=None)
    p.add_argument("--rtf", type=float, default=None)
    args = p.parse_args()

    pcm = decode_audio(args.audio, 24_000)

    def on_event(ev):
        if ev.type == "word":
            print(f"[{ev.start_time:7.2f}s] {ev.text}", flush=True)
        elif ev.type == "step" and ev.prs:
            pass  # semantic-VAD probabilities per frame

    transcript = await SttClient(args.url, token=args.token).transcribe_pcm(
        pcm, rtf=args.rtf, on_event=on_event
    )
    print("---")
    print(transcript.text)


if __name__ == "__main__":
    asyncio.run(main())
