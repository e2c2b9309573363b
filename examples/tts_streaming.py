#!/usr/bin/env python3
"""Synthesize speech through a running dsm-tpu server.

  python examples/tts_streaming.py "hello there" out.wav \
      --url ws://host:8080/api/tts_streaming --voice expresso/ex03
"""

import argparse
import asyncio
import sys

sys.path.insert(0, ".")

from dsm_tpu.client.tts import TtsClient
from dsm_tpu.utils.audio import write_wav


async def main():
    p = argparse.ArgumentParser()
    p.add_argument("text")
    p.add_argument("out")
    p.add_argument("--url", default="ws://127.0.0.1:8080/api/tts_streaming")
    p.add_argument("--voice", default=None)
    p.add_argument("--token", default=None)
    args = p.parse_args()

    url = args.url + (f"?voice={args.voice}" if args.voice else "")
    result = await TtsClient(url, token=args.token).synthesize(args.text)
    write_wav(args.out, result.pcm, 24_000)
    print(f"{args.out}: {len(result.pcm)/24_000:.2f}s  "
          f"ttfb={result.ttfb_s:.3f}s rtf={result.rtf:.2f}")
    for w in result.words:
        print(f"[{w['start_s']:6.2f} - {w['stop_s']:6.2f}] {w['text']}")


if __name__ == "__main__":
    asyncio.run(main())
