#!/usr/bin/env python
"""Regime-normalized round-over-round bench deltas (r09 verdict #6).

This host's absolute walls drift ~1.3-1.4x HOST-WIDE across days
("regimes"), so raw cross-round deltas mostly measure the weather.
The stable quantity is the ratio to a SAME-DAY anchor: each bench
artifact records a ``regime_anchor`` triplet (flagship sf0.1 +
markets_x100 in-tier + post-hygiene, all measured in one JVM run), and
this script divides every per-query delta by the anchor shift before
applying the noise rule.

Usage:
    python tools/regime_delta.py OLD.json NEW.json [--threshold 0.2]

Prints one line per section entry that moved past the threshold AFTER
regime normalization — those are the candidates for solo arbitration;
everything else is the regime. Artifacts without a regime_anchor field
(pre-r10) fall back to the flagship headline entry.
"""

from __future__ import annotations

import argparse
import json


def _anchor(payload: dict) -> float | None:
    a = payload.get("regime_anchor") or {}
    vals = [
        v
        for v in (
            a.get("flagship_sf01"),
            payload.get("queries", {}).get("weekly_volatility"),
        )
        if v
    ]
    return vals[0] if vals else None


def _sections(payload: dict):
    yield "headline", payload.get("queries", {})
    for key, val in payload.items():
        if isinstance(val, dict) and (
            key.endswith(("_x10", "_x100"))
            or key.endswith("_dedup")
        ):
            yield key, val


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold",
        type=float,
        default=0.2,
        help="flag normalized deltas beyond this fraction (default 0.2; "
        "the bench noise rule uses 0.5 for sub-second entries)",
    )
    args = ap.parse_args()

    def load(path: str) -> dict:
        with open(path) as f:
            payload = json.load(f)
        # the driver's BENCH_r{N}.json wraps the compact stdout line
        # under "parsed" (headline queries only); BENCH_LOCAL.json is
        # the full artifact with sections + regime_anchor
        if "parsed" in payload and isinstance(payload["parsed"], dict):
            return payload["parsed"]
        return payload

    old, new = load(args.old), load(args.new)

    a_old, a_new = _anchor(old), _anchor(new)
    if a_old and a_new:
        regime = a_new / a_old
        print(
            f"regime factor (new/old flagship anchor): {regime:.3f}  "
            f"[{a_old} -> {a_new}]"
        )
    else:
        regime = 1.0
        print("regime factor: 1.000 (no anchor in one artifact)")

    flagged = 0
    new_secs = dict(_sections(new))
    for sec, old_q in _sections(old):
        new_q = new_secs.get(sec, {})
        for name, t_old in sorted(old_q.items()):
            t_new = new_q.get(name)
            if not isinstance(t_old, (int, float)) or not t_new:
                continue
            raw = t_new / t_old - 1.0
            norm = t_new / (t_old * regime) - 1.0
            # sub-second entries carry a wider noise band (bench.py rule)
            thr = max(args.threshold, 0.5 if t_old < 1.0 else 0.0)
            if abs(norm) > thr:
                flagged += 1
                print(
                    f"  {sec}/{name}: {t_old:.3f} -> {t_new:.3f}  "
                    f"raw {raw:+.0%}  regime-normalized {norm:+.0%}"
                )
    if not flagged:
        print("no entries past the threshold after regime normalization")


if __name__ == "__main__":
    main()
