"""Generate the README per-query engine-vs-oracle baseline table from
a committed ORACLE_FULL_r{N}.json (which carries spark_sec/duck_sec
per query since r04).

    python tools/baseline_table.py [ORACLE_FULL_r{N}_sf01.json] [--update-readme]

Prints a markdown summary table (per-family totals + the slowest
queries); --update-readme splices it into README.md between the
BASELINE-TABLE markers so the "within 2x of baseline" claim is backed
by an auditable, regenerable artifact instead of a hand-typed number.
With no artifact argument it uses the NEWEST committed
ORACLE_FULL_r{N}_sf01.json (the sf0.1 headline scale); the generated
block names its source artifact so the README can never show a stale
round label (round-9 verdict: the hand-typed header said r08 over r09
data).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_MARK_BEGIN = "<!-- BASELINE-TABLE:BEGIN (tools/baseline_table.py) -->"
_MARK_END = "<!-- BASELINE-TABLE:END -->"


def family(name: str) -> str:
    if re.match(r"q\d+_", name):
        return "tpch"
    for prefix, fam in (
        (("dedup", "minhash", "simhash", "ngram", "near_dup",
          "semantic_dedup"), "dedup"),
        (("ann_", "embedding_", "user_activity"), "similarity"),
        (("sample_", "split_"), "sampling"),
        (("sketch_",), "sketches"),
        (("sequence_",), "packing"),
        (("wav_", "image_", "video_", "multimodal"), "multimodal"),
        (("orders_", "out_of_nation",
          "top_", "brand_", "priority_", "order_capacity"), "star-schema"),
        (("hourly", "sliding", "session_", "asof", "first_week",
          "user_prop"), "temporal"),
    ):
        if any(name.startswith(p) for p in prefix):
            return fam
    return "pipelines/analytics"


def build_table(artifact: dict, source_name: str = "") -> str:
    fams: dict[str, dict[str, float]] = {}
    rows = []
    for name, rec in artifact.items():
        if name.startswith("_") or not isinstance(rec, dict):
            continue
        s, d = rec.get("spark_sec"), rec.get("duck_sec")
        if s is None:
            continue
        f = fams.setdefault(family(name), {"n": 0, "spark": 0.0, "duck": 0.0})
        f["n"] += 1
        f["spark"] += s
        f["duck"] += d or 0.0
        rows.append((name, s, d))
    out = [_MARK_BEGIN, ""]
    if source_name:
        out += [f"Source artifact: `{source_name}`", ""]
    out += ["| family | queries | spark (s) | duckdb oracle (s) | ratio |",
            "|---|---|---|---|---|"]
    tot_s = tot_d = tot_n = 0
    for fam in sorted(fams):
        f = fams[fam]
        ratio = f["spark"] / f["duck"] if f["duck"] else float("nan")
        out.append(
            f"| {fam} | {f['n']:.0f} | {f['spark']:.1f} | {f['duck']:.1f} "
            f"| {ratio:.2f}x |"
        )
        tot_s += f["spark"]
        tot_d += f["duck"]
        tot_n += f["n"]
    tot_ratio = f"{tot_s / tot_d:.2f}x" if tot_d else "n/a"
    out.append(
        f"| **total** | **{tot_n:.0f}** | **{tot_s:.1f}** | **{tot_d:.1f}** "
        f"| **{tot_ratio}** |"
    )
    out.append("")
    out.append("Slowest 5 queries (spark seconds, oracle seconds):")
    out.append("")
    for name, s, d in sorted(rows, key=lambda r: -r[1])[:5]:
        out.append(f"- `{name}` — {s:.1f}s spark / "
                   f"{(f'{d:.1f}s' if d is not None else 'rows-only')} duck")
    out.append("")
    out.append(_MARK_END)
    return "\n".join(out)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--update-readme"]
    update = "--update-readme" in sys.argv
    root = Path(__file__).resolve().parent.parent
    if argv:
        path = Path(argv[0])
    else:
        cands = sorted(
            root.glob("ORACLE_FULL_r*_sf01.json"),
            key=lambda p: int(re.match(r"ORACLE_FULL_r(\d+)_", p.name).group(1)),
        )
        if not cands:
            print(__doc__)
            return 2
        path = cands[-1]
    artifact = json.loads(path.read_text())
    table = build_table(artifact, source_name=path.name)
    print(table)
    if update:
        readme = root / "README.md"
        text = readme.read_text()
        pat = re.compile(
            re.escape(_MARK_BEGIN) + ".*?" + re.escape(_MARK_END), re.S
        )
        if pat.search(text):
            text = pat.sub(table, text)
        else:
            text = text.rstrip() + "\n\n## Per-query baseline\n\n" + table + "\n"
        readme.write_text(text)
        print(f"\nspliced into {readme}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
