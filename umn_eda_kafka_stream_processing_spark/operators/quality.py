"""Declarative data-quality constraint checking — the contract gate a
production table needs before anything downstream trusts it (the
expectations/dbt-test shape, re-expressed as Spark aggregates).

The reference app trusts its topics implicitly; at 100 TB an ingest
contract is enforced by a CENSUS, not a scan-and-throw: every
constraint evaluates to (n_rows, n_violations, pass) and the caller
decides whether to quarantine, alert, or proceed. Scale shape:

* all ROW-LOCAL checks (not_null / range / accepted_values / regex)
  compile to conditional-sum expressions evaluated in ONE aggregate
  over ONE scan — adding a tenth check costs zero extra passes;
* ``unique`` is one hash-agg on the key (duplicate rows = n_rows −
  n_keys, exact, map-side combined);
* ``fk`` (referential integrity) is one LEFT ANTI hash join against
  the dimension's distinct keys — orphan count, never a full join;
* output is a LONG frame (one row per constraint) so censuses append
  into monitoring tables and diff across runs.

Violation semantics: a NULL value VIOLATES not_null but does NOT
violate range/accepted_values/regex (compose with not_null to forbid
NULLs — SQL's own three-valued convention, and what makes each check
independently meaningful). All counters BIGINT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_LOCAL = {"not_null", "range", "accepted_values", "regex"}


def _violation_expr(check: tuple) -> Column:
    kind = check[0]
    col = F.col(check[1])
    if kind == "not_null":
        return col.isNull().cast("long")
    if kind == "range":
        lo, hi = check[2], check[3]
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (col < F.lit(lo))
        if hi is not None:
            bad = bad | (col > F.lit(hi))
        return F.coalesce(bad.cast("long"), F.lit(0))
    if kind == "accepted_values":
        return F.coalesce(
            (~col.isin(*check[2])).cast("long"), F.lit(0)
        )
    if kind == "regex":
        return F.coalesce((~col.rlike(check[2])).cast("long"), F.lit(0))
    raise ValueError(f"unknown row-local check kind {kind!r}")


def _label(check: tuple) -> tuple[str, str]:
    kind = check[0]
    if kind == "unique":
        cols = [check[1]] if isinstance(check[1], str) else list(check[1])
        return kind, ",".join(cols)
    if kind == "fk":
        cols = [check[1]] if isinstance(check[1], str) else list(check[1])
        return kind, ",".join(cols)
    return kind, check[1]


def check_constraints(
    df: DataFrame,
    checks: Sequence[tuple],
    dims: "dict[str, DataFrame] | None" = None,
) -> DataFrame:
    """Evaluate ``checks`` against ``df``; returns one row per check:
    (check, target, n_rows, n_violations, ok).

    Check forms (plain tuples — declarative, serializable):

    * ``("not_null", col)``
    * ``("range", col, lo, hi)`` — inclusive bounds; pass None to
      leave a side open
    * ``("accepted_values", col, [v1, v2, ...])``
    * ``("regex", col, pattern)`` — full rlike semantics
    * ``("unique", col | [cols])`` — violations = duplicate ROWS
      (n_rows − distinct keys); NULL keys count as a key
    * ``("fk", col | [cols], dim_name, dim_col | [dim_cols])`` —
      violations = rows whose key finds no match in
      ``dims[dim_name]`` (NULL keys never match — orphans);
      the dimension side is reduced to distinct keys first

    All row-local checks run in ONE aggregate over one scan; unique
    and fk each add one bounded extra job (hash-agg / anti join)."""
    if not checks:
        raise ValueError(
            "checks must be non-empty: an empty contract gate would "
            "silently pass everything"
        )
    dims = dims or {}
    row_local = [c for c in checks if c[0] in _ROW_LOCAL]
    rows: list[DataFrame] = []
    if row_local:
        aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
            F.sum(_violation_expr(c)).cast("long").alias(f"_v{i}")
            for i, c in enumerate(row_local)
        ]
        one = df.agg(*aggs)
        for i, c in enumerate(row_local):
            kind, label = _label(c)
            rows.append(
                one.select(
                    F.lit(kind).alias("check"),
                    F.lit(label).alias("target"),
                    F.col("_n").alias("n_rows"),
                    F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias(
                        "n_violations"
                    ),
                )
            )
    for c in checks:
        if c[0] == "unique":
            keys = [c[1]] if isinstance(c[1], str) else list(c[1])
            kind, label = _label(c)
            rows.append(
                df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .agg(
                    F.sum("_cnt").cast("long").alias("n_rows"),
                    (F.sum("_cnt") - F.count(F.lit(1)))
                    .cast("long")
                    .alias("n_violations"),
                )
                .select(
                    F.lit(kind).alias("check"),
                    F.lit(label).alias("target"),
                    "n_rows",
                    "n_violations",
                )
            )
        elif c[0] == "fk":
            keys = [c[1]] if isinstance(c[1], str) else list(c[1])
            dim_name, dim_cols = c[2], c[3]
            dcols = [dim_cols] if isinstance(dim_cols, str) else list(dim_cols)
            if dim_name not in dims:
                raise ValueError(
                    f"fk check references unknown dim {dim_name!r}; "
                    f"pass it via dims="
                )
            dim = (
                dims[dim_name]
                .select(
                    *[F.col(d).alias(k) for k, d in zip(keys, dcols)]
                )
                .distinct()
            )
            kind, label = _label(c)
            fact = df.select(*keys)
            orphans = fact.join(dim, keys, "left_anti")
            n_all = fact.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows")
            )
            n_bad = orphans.agg(
                F.count(F.lit(1)).cast("long").alias("n_violations")
            )
            rows.append(
                n_all.crossJoin(n_bad).select(
                    F.lit(kind).alias("check"),
                    F.lit(label).alias("target"),
                    "n_rows",
                    "n_violations",
                )
            )
        elif c[0] not in _ROW_LOCAL:
            raise ValueError(f"unknown check kind {c[0]!r}")
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.withColumn(
        "ok", (F.col("n_violations") == 0).cast("long")
    )


def upsert_constraint_census(
    spark,
    store_path: str,
    batch_df: DataFrame,
    checks: Sequence[tuple],
    batch_id: int,
    dims: "dict[str, DataFrame] | None" = None,
) -> None:
    """Streaming twin of `check_constraints` — the continuously
    maintained data-contract MONITOR (foreachBatch shape): each
    microbatch's census lands keyed by (batch_id, check, target)
    through the latest-wins upsert, so a replayed batch recomputes
    IDENTICAL rows and the write is a no-op (the replay-safe
    per-batch keying rule — never read-modify-add). The store is a
    tiny long-frame history: one row per (batch, constraint),
    diffable across batches for drift alerts."""
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        upsert_snapshot,
    )

    census = check_constraints(batch_df, checks, dims=dims).select(
        F.lit(int(batch_id)).alias("batch_id"),
        "check",
        "target",
        "n_rows",
        "n_violations",
        "ok",
    )
    upsert_snapshot(
        spark,
        store_path,
        census.withColumn("event_seq", F.lit(0)),
        key_cols=["batch_id", "check", "target"],
    )


def read_constraint_history(spark, store_path: str) -> DataFrame:
    """The monitor's history: (batch_id, check, target, n_rows,
    n_violations, ok) per batch — plus use a groupBy over it for
    totals or a window per (check, target) for drift."""
    return spark.read.parquet(store_path).select(
        "batch_id", "check", "target", "n_rows", "n_violations", "ok"
    )
