#!/usr/bin/env python3
"""Full-duplex dialogue (Moshi) against a running dsm-tpu server.

Streams a WAV (or silence) to /api/chat at the 80 ms real-time cadence,
prints the model's words as they arrive, and writes what the model spoke to
an output WAV.  The wire is OggOpus both ways when libopus is available
(the reference moshi-cli client format), PCM otherwise.

  python examples/duplex_chat.py --url ws://host:8080/api/chat \
      --wav question.wav --seconds 20 --out reply.wav
"""

import argparse
import asyncio
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="ws://127.0.0.1:8080/api/chat")
    p.add_argument("--wav", default=None,
                   help="input audio (wav/mp3/ogg); silence if omitted")
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--out", default=None, help="write the model's speech here")
    p.add_argument("--token", default=None, help="Bearer token")
    p.add_argument("--format", dest="fmt", choices=["opus", "pcm"],
                   default=None)
    args = p.parse_args()

    from dsm_tpu.client.tui import SAMPLE_RATE, DuplexTuiClient, TuiState

    class CaptureState(TuiState):
        """TuiState that also keeps the model's pcm + prints words live."""

        def __init__(self):
            super().__init__()
            self.rx_pcm = []

        def on_text(self, text):
            super().on_text(text)
            print(text, end="", flush=True)

        def on_audio(self, pcm):
            super().on_audio(pcm)
            self.rx_pcm.append(np.asarray(pcm, np.float32))

    client = DuplexTuiClient(
        args.url, token=args.token, wav_path=args.wav,
        seconds=args.seconds, fmt=args.fmt,
    )
    client.state = CaptureState()
    st = asyncio.run(client.run())
    print()
    print(f"heard {st.rx_seconds:.1f}s of model speech; sent "
          f"{st.frames_sent} frames; transcript {len(st.transcript)} chars")
    if args.out and st.rx_pcm:
        from dsm_tpu.utils.audio import write_wav

        pcm = np.concatenate(st.rx_pcm)
        write_wav(args.out, pcm, int(SAMPLE_RATE))
        print(f"wrote {args.out} ({len(pcm) / SAMPLE_RATE:.1f}s)")


if __name__ == "__main__":
    main()
