"""Generate the README scale-growth table from the three per-scale
oracle artifacts (sf0.001 / sf0.01 / sf0.1).

Each artifact records per-query Spark wall seconds measured by the
same harness on the same machine (tools/check_oracle.py --json, which
warms the session before timing). Comparing walls across a 100x data
range shows how the plans respond to data growth — the
empirically-checkable end of the "designed for 100 TB" claim: a
family whose wall grows ~1x-3x across 10x data growth is dominated by
fixed plan overhead and scan parallelism (healthy); one growing >=10x
is data-bound (expected only for genuinely quadratic baselines).

    python tools/scaling_table.py [--round N] [--update-readme]

Without --round it uses the NEWEST round for which all three per-SF
artifacts exist — the r08/r09 hardcode made the committed scaling
table silently lag the baseline table by a round (round-9 verdict);
the generated block now also names its source artifacts so the README
can never show unattributed numbers.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from baseline_table import family  # noqa: E402

_MARK_BEGIN = "<!-- SCALING-TABLE:BEGIN (tools/scaling_table.py) -->"
_MARK_END = "<!-- SCALING-TABLE:END -->"


def artifact_names(round_n: int) -> list[tuple[str, str]]:
    return [
        ("sf0.001", f"ORACLE_FULL_r{round_n:02d}_sf0001.json"),
        ("sf0.01", f"ORACLE_FULL_r{round_n:02d}.json"),
        ("sf0.1", f"ORACLE_FULL_r{round_n:02d}_sf01.json"),
    ]


def newest_round(root: Path) -> int:
    """Largest N for which all three per-SF artifacts are committed."""
    rounds = sorted(
        (
            int(m.group(1))
            for p in root.glob("ORACLE_FULL_r*_sf01.json")
            if (m := re.match(r"ORACLE_FULL_r(\d+)_sf01\.json", p.name))
        ),
        reverse=True,
    )
    for n in rounds:
        if all((root / f).exists() for _, f in artifact_names(n)):
            return n
    raise FileNotFoundError("no complete ORACLE_FULL_r{N} 3-SF artifact set")


def build_table(root: Path, round_n: int) -> str:
    artifacts = artifact_names(round_n)
    walls: dict[str, dict[str, float]] = {}
    for sf, fname in artifacts:
        data = json.loads((root / fname).read_text())
        for name, rec in data.items():
            if name.startswith("_") or not isinstance(rec, dict):
                continue
            sec = rec.get("spark_sec")
            if sec is None:
                continue
            walls.setdefault(family(name), {}).setdefault(sf, 0.0)
            walls[family(name)][sf] += sec
    lines = [
        _MARK_BEGIN,
        "",
        "Source artifacts (round {:02d}): {}".format(
            round_n, ", ".join(f"`{f}`" for _, f in artifacts)
        ),
        "",
        "| family | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | 10x data (0.01→0.1) |",
        "|---|---|---|---|---|",
    ]
    tot = {sf: 0.0 for sf, _ in artifacts}
    for fam in sorted(walls):
        w = walls[fam]
        for sf, _ in artifacts:
            tot[sf] += w.get(sf, 0.0)
        growth = w["sf0.1"] / w["sf0.01"] if w.get("sf0.01") else float("nan")
        lines.append(
            f"| {fam} | {w.get('sf0.001', 0):.1f} | {w.get('sf0.01', 0):.1f} "
            f"| {w.get('sf0.1', 0):.1f} | {growth:.2f}x |"
        )
    growth = tot["sf0.1"] / tot["sf0.01"]
    lines.append(
        f"| **total** | **{tot['sf0.001']:.1f}** | **{tot['sf0.01']:.1f}** "
        f"| **{tot['sf0.1']:.1f}** | **{growth:.2f}x** |"
    )
    lines += ["", _MARK_END]
    return "\n".join(lines)


def main() -> int:
    root = Path(__file__).resolve().parent.parent
    if "--round" in sys.argv:
        round_n = int(sys.argv[sys.argv.index("--round") + 1])
    else:
        round_n = newest_round(root)
    table = build_table(root, round_n)
    print(table)
    if "--update-readme" in sys.argv:
        readme = root / "README.md"
        text = readme.read_text()
        pat = re.compile(re.escape(_MARK_BEGIN) + ".*?" + re.escape(_MARK_END), re.S)
        if pat.search(text):
            text = pat.sub(table, text)
            readme.write_text(text)
            print(f"\nspliced into {readme}")
        else:
            print("\nREADME has no SCALING-TABLE markers; add them first")
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
