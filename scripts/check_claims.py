#!/usr/bin/env python3
"""Ledger <-> bench drift check.

Policy (round 5): the driver's ``BENCH_r*.json`` is the number of record.
``CLAIMS.json`` at the repo root holds the numbers README.md/PERFORMANCE.md
publish; this script compares each claim against the newest driver bench
capture (or an explicit ``--bench file/dict``) and flags any claim that is
more than ``--tol`` (default 15%) BETTER than what was measured — the
round-4 failure mode, where README advertised ~530 tok/s while the driver
could only reproduce 339.

Exit code 1 when a claim drifts, so CI/test wiring can assert on it.

Usage:  python scripts/check_claims.py [--bench BENCH_r05.json] [--tol 0.15]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

# keys where LARGER is better; everything else in CLAIMS.json is
# smaller-is-better (rtf_*, ttfa_*, init_*)
LARGER_IS_BETTER = re.compile(
    r"tok_per_sec|frames_per_sec|x_realtime|semantic_tokens_per_sec|value"
)


def newest_bench() -> tuple[str, dict] | None:
    best = None
    for f in ROOT.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json", f.name)
        if not m:
            continue
        try:
            parsed = json.loads(f.read_text()).get("parsed") or {}
        except Exception:
            continue
        if "tpu" not in str(parsed.get("device", "")).lower():
            continue  # CPU-fallback lines are not the number of record
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), f.name, parsed)
    return (best[1], best[2]) if best else None


def check(claims: dict, bench: dict, tol: float) -> list[str]:
    """Return drift messages: claims that beat the measurement by > tol."""
    drift = []
    for key, claimed in claims.items():
        if key.startswith("_") or not isinstance(claimed, (int, float)):
            continue
        measured = bench.get(key)
        if not isinstance(measured, (int, float)) or measured == 0:
            continue
        if LARGER_IS_BETTER.search(key):
            ratio = claimed / measured          # >1 means claim is rosier
        else:
            ratio = measured / claimed          # smaller-is-better metrics
        if ratio > 1.0 + tol:
            drift.append(
                f"{key}: claimed {claimed} vs measured {measured} "
                f"({(ratio - 1) * 100:.0f}% rosier than the record)")
    return drift


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None,
                    help="bench JSON file (default: newest BENCH_r*.json)")
    ap.add_argument("--tol", type=float, default=0.15)
    args = ap.parse_args()

    claims_path = ROOT / "CLAIMS.json"
    if not claims_path.exists():
        print("# no CLAIMS.json — nothing to check", file=sys.stderr)
        return 0
    claims = json.loads(claims_path.read_text())

    if args.bench:
        raw = json.loads(pathlib.Path(args.bench).read_text())
        bench = raw.get("parsed", raw)
        src = args.bench
    else:
        nb = newest_bench()
        if nb is None:
            print("# no TPU BENCH_r*.json found — nothing to check",
                  file=sys.stderr)
            return 0
        src, bench = nb

    drift = check(claims, bench, args.tol)
    if drift:
        print(f"# CLAIMS DRIFT vs {src} (tol {args.tol:.0%}):",
              file=sys.stderr)
        for d in drift:
            print(f"#   {d}", file=sys.stderr)
        return 1
    print(f"# claims consistent with {src} (tol {args.tol:.0%})",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
