#!/usr/bin/env python
"""Segment PROGRESS.jsonl into monotonic runs (ADVICE r9 / VERDICT r9
task 7).

The driver appends ``{ts, wall_s, round, commits, loc, turns, stalled}``
rows; ``wall_s``/``turns`` reset whenever its session restarts, so raw
aggregation double-counts or goes negative across restarts.  The writer
is the driver's (not in this repo), so the fix is a DERIVED view: a
segment boundary is any row where ``wall_s`` or ``turns`` decreases (or
``round`` changes).  Emits one JSON line per segment with the id,
round, row span, and the per-segment deltas — downstream aggregation
over segments is monotonic by construction.

Usage: python scripts/progress_segments.py [PROGRESS.jsonl]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def segments(rows: list[dict]) -> list[dict]:
    out: list[dict] = []
    cur: list[dict] = []

    def flush() -> None:
        if not cur:
            return
        first, last = cur[0], cur[-1]
        out.append(
            {
                "segment": len(out),
                "round": first.get("round"),
                "rows": len(cur),
                "ts_start": first.get("ts"),
                "ts_end": last.get("ts"),
                "wall_s": last.get("wall_s", 0.0),
                "turns": last.get("turns", 0),
                "commits_delta": (last.get("commits", 0) or 0)
                - (first.get("commits", 0) or 0),
                "loc_end": last.get("loc"),
            }
        )

    prev: dict | None = None
    for row in rows:
        reset = prev is not None and (
            (row.get("wall_s", 0) or 0) < (prev.get("wall_s", 0) or 0)
            or (row.get("turns", 0) or 0) < (prev.get("turns", 0) or 0)
            or row.get("round") != prev.get("round")
        )
        if reset:
            flush()
            cur = []
        cur.append(row)
        prev = row
    flush()
    return out


def main() -> None:
    path = Path(sys.argv[1] if len(sys.argv) > 1 else "PROGRESS.jsonl")
    rows = [
        json.loads(line)
        for line in path.read_text().splitlines()
        if line.strip()
    ]
    for seg in segments(rows):
        print(json.dumps(seg, sort_keys=True))


if __name__ == "__main__":
    main()
