"""Summarise the chip-queue measurement artifacts into markdown tables.

Reads everything tools/chip_queue.sh produced (docs/chipq/*.json +
docs/SUSTAINED_*_r03*.json) and prints the PERFORMANCE.md-ready summary,
flagging anything missing.  Purely a reporting helper — safe anywhere.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    try:
        with open(path) as f:
            txt = f.read()
        # flash_probe emits one JSON object per line
        lines = [ln for ln in txt.splitlines() if ln.strip().startswith("{")]
        if len(lines) > 1:
            return [json.loads(ln) for ln in lines]
        try:
            return json.loads(txt)
        except Exception:
            # tools that print progress lines before the result JSON
            # (e.g. quant_divergence's "step N/750" heartbeat)
            return json.loads(lines[-1])
    except Exception as e:
        return {"_error": str(e)}


def main():
    chipq = os.path.join(REPO, "docs", "chipq")
    docs = os.path.join(REPO, "docs")
    missing = []

    def get(path):
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            missing.append(os.path.relpath(path, REPO))
            return None
        return _load(path)

    print("# Round-3 chip measurement summary\n")

    fp = get(f"{chipq}/flash_probe.json")
    if fp:
        print("## Flash-decode probe (kernel vs XLA, on chip)\n")
        print("| shape | equiv | kernel ms | xla ms | speedup |")
        print("|---|---|---|---|---|")
        for row in fp if isinstance(fp, list) else [fp]:
            print(f"| {row.get('label')} | {row.get('equiv_ok')} "
                  f"| {row.get('kernel_ms')} | {row.get('xla_ms')} "
                  f"| {row.get('speedup')}x |")
        print()

    on, off = get(f"{chipq}/lm_w8a8_on.json"), get(f"{chipq}/lm_w8a8_off.json")
    if on or off:
        print("## LM step W8A8 A/B (B=128, serving profile)\n")
        for name, d in (("W8A8 on", on), ("W8A8 off", off)):
            if d:
                print(f"* {name}: {json.dumps(d.get('lm', d))}")
        print()

    hl = get(f"{chipq}/headline.json")
    if hl:
        print(f"## Headline\n\n```json\n{json.dumps(hl)}\n```\n")

    print("## Sustained artifacts\n")
    # Expected set mirrors tools/chip_queue.sh so absences are FLAGGED
    # (a glob over existing files can never report what's missing).
    expected = [
        f"{docs}/SUSTAINED_r03.json",
        f"{docs}/SUSTAINED_TTS_r03_b32.json",
        f"{docs}/SUSTAINED_TTS_r03_b32_fuse4.json",
        f"{docs}/SUSTAINED_TTS_r03_b64.json",
        f"{docs}/SUSTAINED_TTS_r03_b64_fuse4.json",
        f"{docs}/SUSTAINED_DUPLEX_r03_b8.json",
        f"{docs}/SUSTAINED_DUPLEX_r03_b12.json",
        f"{docs}/SUSTAINED_DUPLEX_r03_b16.json",
        f"{docs}/SUSTAINED_DUPLEX_r03_b16_pipe2.json",
        f"{docs}/SUSTAINED_DUPLEX_r03_b24_pipe2.json",
        f"{chipq}/stt26b_e2e.json",
    ]
    extra = sorted(
        set(glob.glob(f"{docs}/SUSTAINED_*r03*.json")) - set(expected)
    )
    for path in expected + extra:
        d = get(path)
        if d is not None:
            print(f"* `{os.path.relpath(path, REPO)}`: "
                  f"{json.dumps(d)[:400]}")
    print()

    print("## Quant divergence\n")
    for m in ("stt1b", "tts16b", "s2s2b"):
        d = get(f"{chipq}/divergence_{m}.json")
        if d:
            print(f"* {m}: {json.dumps(d)}")
    print()

    if missing:
        print("## MISSING (queue incomplete)\n")
        for m in missing:
            print(f"* {m}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
