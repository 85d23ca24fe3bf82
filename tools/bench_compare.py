"""Compare two BENCH_FULL.json sweeps and report per-query movement.

    python tools/bench_compare.py OLD.json [NEW.json]   # NEW defaults to
                                                        # ./BENCH_FULL.json

Prints queries slower than THRESHOLD× (default 1.5, env BENCH_THRESHOLD),
new/removed queries, and the batch/streaming wall deltas. Exit code 1 when
any PRE-EXISTING query breaches the threshold — new queries only report
(they have no old datum to regress from). Sub-0.5 s queries are excluded
from failure (fixed per-job overhead dominates them; they still print).

This is the round-over-round guard the bench JSON exists for: plan
regressions show up here per operator, not just in the headline number.
"""

from __future__ import annotations

import json
import os
import sys


def load(path: str) -> dict:
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    old = load(sys.argv[1])
    new = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json")
    threshold = float(os.environ.get("BENCH_THRESHOLD", "1.5"))
    o, n = old["queries_full"], new["queries_full"]

    regressions: list[tuple[float, str, float, float]] = []
    for name, t_new in sorted(n.items()):
        t_old = o.get(name)
        if not t_old or not t_new:
            continue
        ratio = t_new / t_old
        if ratio >= threshold:
            regressions.append((ratio, name, t_old, t_new))
    regressions.sort(reverse=True)

    added = sorted(set(n) - set(o))
    removed = sorted(set(o) - set(n))
    for label, names in (("added", added), ("removed", removed)):
        if names:
            print(f"{label} ({len(names)}): {', '.join(names)}")

    fail = False
    for ratio, name, t_old, t_new in regressions:
        hard = t_new >= 0.5
        flag = "REGRESSION" if hard else "noise-range"
        print(f"{flag} {name}: {t_old:.3f}s -> {t_new:.3f}s ({ratio:.2f}x)")
        fail = fail or hard

    for wall in ("full_wall_batch", "full_wall_streaming"):
        if wall in old and wall in new:
            print(f"{wall}: {old[wall]:.1f}s -> {new[wall]:.1f}s")
    # headline_value lands in BENCH_FULL.json from r5 on; older artifacts
    # predate it, so report one-sided when only the new side has it
    if "headline_value" in new:
        if "headline_value" in old:
            hv_o, hv_n = old["headline_value"], new["headline_value"]
            print(f"headline: {hv_o:.2f}s -> {hv_n:.2f}s ({hv_n / hv_o:.2f}x)")
        else:
            print(f"headline: (absent in old) -> {new['headline_value']:.2f}s")
    if not regressions:
        print(f"no queries over {threshold}x")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
