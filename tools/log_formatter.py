#!/usr/bin/env python3
"""Log normalizer (reference: tools/log-formatter): parse mixed raw/JSON log
lines into a uniform `ts level target message` form, with filters.

  python tools/log_formatter.py server.log --level WARN --grep asr
"""

import argparse
import json
import re
import sys

_LINE = re.compile(
    r"^(?P<ts>\d{2}:\d{2}:\d{2}(?:\.\d+)?)?\s*(?P<icon>[·✓⚠✗‼])?\s*"
    r"(?P<level>DEBUG|INFO|WARN(?:ING)?|ERROR|CRITICAL)?\s*(?P<rest>.*)$"
)
_LEVELS = {"DEBUG": 10, "INFO": 20, "WARN": 30, "WARNING": 30, "ERROR": 40,
           "CRITICAL": 50}
_ICON_LEVEL = {"·": "DEBUG", "✓": "INFO", "⚠": "WARNING", "✗": "ERROR", "‼": "CRITICAL"}


def parse_line(line: str) -> dict:
    line = line.rstrip("\n")
    if line.startswith("{"):
        try:
            j = json.loads(line)
            return {
                "ts": str(j.get("ts", "")),
                "level": str(j.get("level", "INFO")).upper(),
                "target": j.get("target", ""),
                "message": j.get("message", ""),
            }
        except json.JSONDecodeError:
            pass
    m = _LINE.match(line)
    level = (m.group("level") or _ICON_LEVEL.get(m.group("icon") or "", "INFO")).upper()
    return {
        "ts": m.group("ts") or "",
        "level": level,
        "target": "",
        "message": m.group("rest"),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="*", default=["-"])
    p.add_argument("--level", default="DEBUG")
    p.add_argument("--grep", default=None)
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    min_level = _LEVELS.get(args.level.upper(), 10)
    for path in args.files:
        fh = sys.stdin if path == "-" else open(path)
        for line in fh:
            if not line.strip():
                continue
            rec = parse_line(line)
            if _LEVELS.get(rec["level"], 20) < min_level:
                continue
            if args.grep and args.grep not in rec["message"]:
                continue
            if args.json:
                print(json.dumps(rec))
            else:
                print(f"{rec['ts']:>12} {rec['level']:<8} {rec['message']}")
        if fh is not sys.stdin:
            fh.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
