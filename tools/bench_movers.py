"""Mechanical bench-stability diff: movers between two committed bench
JSONs, with plan-hash correlation.

VERDICT r14 ask #3: the round-14 README claimed "zero >1.25x movers"
between BENCH_LOCAL_r13 and BENCH_LOCAL_r14, but computing the ratio
from the committed files gives several — stability claims must come
from the artifacts, not prose. This tool is the required mechanical
check: it diffs the per-query fields of two bench JSONs (either the
BENCH_LOCAL_r* median-of-readings files or the driver BENCH_r* files —
both carry a "queries" map), prints every mover past the threshold in
EITHER direction, and — when two PLANHASHES snapshots are supplied —
annotates each mover with whether its normalized plan hash changed
(hash unchanged ⇒ the mover is ambient noise or data, not a plan
regression).

Run:  python tools/bench_movers.py OLD.json NEW.json
        [--threshold 1.25] [--plans-old PH_OLD.json --plans-new PH_NEW.json]
Prints one JSON document; exits 0 always (reporting, not gating — the
round log quotes its output).
"""

from __future__ import annotations

import argparse
import json


def movers(
    old: dict[str, float],
    new: dict[str, float],
    threshold: float,
    plans_old: dict[str, str] | None = None,
    plans_new: dict[str, str] | None = None,
) -> dict:
    shared = sorted(k for k in old if k in new and old[k] > 0)
    total_old = sum(old[k] for k in shared)
    total_new = sum(new[k] for k in shared)
    out = []
    for k in shared:
        r = new[k] / old[k]
        if r > threshold or r < 1.0 / threshold:
            row = {
                "query": k,
                "t_old": old[k],
                "t_new": new[k],
                "ratio": round(r, 3),
            }
            if plans_old is not None and plans_new is not None:
                if k in plans_old and k in plans_new:
                    row["plan_hash_changed"] = plans_old[k] != plans_new[k]
                else:
                    row["plan_hash_changed"] = None  # not plan-hashed
            out.append(row)
    out.sort(key=lambda r: -max(r["ratio"], 1.0 / r["ratio"]))
    return {
        "shared_queries": len(shared),
        "total_ratio": round(total_new / total_old, 3) if total_old else None,
        "threshold": threshold,
        "n_movers": len(out),
        "movers": out,
    }


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        payload = json.load(f)
    q = payload.get("queries", payload)
    if not isinstance(q, dict):
        raise SystemExit(f"{path}: no 'queries' map")
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def _plans(path: str | None) -> dict[str, str] | None:
    if path is None:
        return None
    with open(path) as f:
        payload = json.load(f)
    return payload.get("plans", payload)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--plans-old", default=None)
    ap.add_argument("--plans-new", default=None)
    args = ap.parse_args()
    print(
        json.dumps(
            movers(
                _queries(args.old),
                _queries(args.new),
                args.threshold,
                _plans(args.plans_old),
                _plans(args.plans_new),
            ),
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
