"""Benchmark history: dated, append-only records + drift reporting.

Round-2 lesson: benchmarks overwrote results.json in place, so a 7%
headline drift between rounds could not be distinguished from noise —
nothing recorded when each number was taken or at which commit. Every
benchmark run now ALSO appends one JSON line to benchmarks/history.jsonl
(never rewritten), and reruns print the delta vs the previous record so a
regression is visible the moment it happens.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "history.jsonl")


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def append_history(kind: str, payload: dict, path: str = HISTORY) -> dict:
    """Append one dated record; returns the record written."""
    rec = {
        "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "git": _git_rev(),
        "kind": kind,
        **payload,
    }
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def last_record(kind: str, path: str = HISTORY) -> dict | None:
    """Most recent record of `kind`, or None."""
    if not os.path.exists(path):
        return None
    last = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("kind") == kind:
                last = rec
    return last


def drift_lines(prev: dict | None, cur: dict, keys=("frame_ms", "mrays",
                                                    "total_s", "spp_per_s",
                                                    "fps")) -> list[str]:
    """Human-readable per-config deltas between two results dicts."""
    if not prev:
        return ["(no prior history record — first entry)"]
    out = []
    for cfg_name, cur_v in cur.items():
        prev_v = prev.get(cfg_name)
        if not isinstance(cur_v, dict) or not isinstance(prev_v, dict):
            continue
        parts = []
        for k in keys:
            if k in cur_v and k in prev_v and prev_v[k]:
                delta = (cur_v[k] - prev_v[k]) / prev_v[k] * 100.0
                parts.append(f"{k} {prev_v[k]} -> {cur_v[k]} ({delta:+.1f}%)")
        if parts:
            out.append(f"{cfg_name}: " + ", ".join(parts))
    return out
