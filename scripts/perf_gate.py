#!/usr/bin/env python
"""Perf-regression gate between per-round benchmark ledgers.

Round N's ``PERF_r{N}.json`` (written by ``python -m eovax.cli.benchmark
--all``) is compared against the previous round's ledger; any tracked
throughput metric that regresses beyond tolerance fails loudly (exit 1).
Without this gate the frozen rooflines (ARCHITECTURE.md) are only
enforceable by a human diffing JSON — VERDICT r4 next-item 3.

Tracked metrics: every numeric leaf whose key marks it as a throughput
("higher is better") — ``*imgs_per_sec*``, ``*pairs_per_sec*``,
``*patches*per_sec*``, ``throughput*``. Latency twins (``ms_per_*``) are
reciprocals of the same measurements and are not double-counted.

Rules:
- tracked metric regresses > tolerance (default 3%)       -> FAIL
- tracked metric present before, absent now                -> FAIL
  (dropping a metric is how a regression hides)
- new metric (absent in the previous ledger)               -> note, pass
- ``--waive dotted.key`` skips one metric, for intentional
  changes; the waiver prints so it lands in the round record.

Usage:
    python scripts/perf_gate.py PERF_r05.json            # vs latest r<5
    python scripts/perf_gate.py PERF_r05.json --against PERF_r04.json
    python scripts/perf_gate.py PERF_r05.json --tolerance 0.05 \
        --waive train_step_bf16.imgs_per_sec
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_THROUGHPUT = re.compile(r"(per_sec|^throughput|throughput_)")


def tracked_leaves(ledger: dict, prefix: str = "") -> dict[str, float]:
    """Flatten to {dotted.key: value} keeping only throughput metrics."""
    out: dict[str, float] = {}
    for k, v in ledger.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(tracked_leaves(v, f"{path}."))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            if _THROUGHPUT.search(k):
                out[path] = float(v)
    return out


def previous_ledger(current_path: str) -> str | None:
    """Latest PERF_r{M}.json with M < the current round, same directory."""
    m = re.search(r"PERF_r(\d+)\.json$", os.path.basename(current_path))
    if not m:
        return None
    n = int(m.group(1))
    d = os.path.dirname(os.path.abspath(current_path))
    rounds = []
    for p in glob.glob(os.path.join(d, "PERF_r*.json")):
        pm = re.search(r"PERF_r(\d+)\.json$", os.path.basename(p))
        if pm and int(pm.group(1)) < n:
            rounds.append((int(pm.group(1)), p))
    return max(rounds)[1] if rounds else None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("current", help="this round's PERF_r{N}.json")
    ap.add_argument("--against", default=None,
                    help="previous ledger (default: latest PERF_r{M<N}.json "
                    "next to the current one)")
    ap.add_argument("--tolerance", type=float, default=0.03,
                    help="relative regression tolerance (default 0.03)")
    ap.add_argument("--waive", action="append", default=[],
                    metavar="DOTTED.KEY",
                    help="skip one metric (intentional change); repeatable")
    args = ap.parse_args(argv)

    against = args.against or previous_ledger(args.current)
    if against is None:
        print(f"perf_gate: no previous ledger found for {args.current} — "
              "nothing to gate (first round).")
        return 0
    with open(args.current) as f:
        cur = tracked_leaves(json.load(f))
    with open(against) as f:
        prev = tracked_leaves(json.load(f))
    if not cur:
        print(f"perf_gate: FAIL — {args.current} has no tracked metrics")
        return 1

    failures: list[str] = []
    unknown_waivers = set(args.waive) - (set(prev) | set(cur))
    if unknown_waivers:
        # A typo'd waiver must not silently gate nothing.
        failures.append(f"waiver(s) match no metric: {sorted(unknown_waivers)}")
    for key in sorted(prev):
        if key in args.waive:
            print(f"perf_gate: WAIVED  {key} (was {prev[key]:g})")
            continue
        if key not in cur:
            failures.append(f"{key}: present in {against} ({prev[key]:g}) "
                            "but missing now — dropped metrics hide "
                            "regressions")
            continue
        rel = (cur[key] - prev[key]) / prev[key] if prev[key] else 0.0
        status = "OK     "
        if rel < -args.tolerance:
            status = "REGRESS"
            failures.append(
                f"{key}: {prev[key]:g} -> {cur[key]:g} "
                f"({rel * 100:+.1f}% < -{args.tolerance * 100:.0f}%)")
        print(f"perf_gate: {status} {key}: {prev[key]:g} -> {cur[key]:g} "
              f"({rel * 100:+.1f}%)")
    for key in sorted(set(cur) - set(prev)):
        print(f"perf_gate: NEW     {key}: {cur[key]:g} (no baseline)")

    if failures:
        print(f"\nperf_gate: FAIL vs {against} "
              f"(tolerance {args.tolerance * 100:.0f}%):")
        for msg in failures:
            print(f"  - {msg}")
        return 1
    print(f"\nperf_gate: PASS vs {against} "
          f"(tolerance {args.tolerance * 100:.0f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
