"""Collect every FINAL/BEST/SCAN_FINAL line from logs/*.log.

The driver's between-session clean wipes gitignored paths (CLAUDE.md,
queue hygiene) — run this before a round ends and paste the output into
RESULTS.md / commit the configs/best/ winners so nothing is lost.

    PYTHONPATH=/root/repo python scripts/harvest_finals.py
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

MARKERS = re.compile(r"^(FINAL:?|BEST:|SCAN_FINAL|=== ROUND\d+ QUEUE\d+ DONE)")


def main(log_dir: str = "logs") -> int:
    hits = 0
    for log in sorted(Path(log_dir).glob("*.log")):
        lines = [l for l in log.read_text(errors="replace").splitlines()
                 if MARKERS.match(l)]
        if lines:
            print(f"== {log} ==")
            for l in lines:
                print(l)
            hits += len(lines)
    if not hits:
        print(f"no FINAL/BEST lines under {log_dir}/", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
