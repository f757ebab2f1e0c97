"""Bloom-filter pre-join (runtime filter) — the shuffle-volume killer
for selective fact⋈dim joins at 100 TB.

When the build side of a join is selective (e.g. urgent orders only),
most probe-side rows will not find a match — yet a plain hash join
still shuffles ALL of them. Spark's own runtime row-group filtering
(spark.sql.optimizer.runtime.bloomFilter.enabled) does this opaquely;
this operator makes the technique explicit and AUDITABLE: the bloom
bits are derived from md5 (bit-identical in any engine), so a DuckDB
oracle can rebuild the exact same filter and verify the pruned-row
census, including the false-positive count the bloom admits.

Layout: ``m_bits`` bit positions packed into 32-bit words (32, not
64: DuckDB's ``<<`` is overflow-checked, so bit 63 of a BIGINT word
is unusable there; 32-bit words keep every word positive and every
shift <= 31 in both engines). Position i of a key is the first 32
md5 bits of ``"{salt}{i}|{key}"`` mod m_bits.

The built filter is m_bits/32 longs — a few hundred bytes — and is
inlined as a literal array into the probe-side predicate (exactly
what Spark's driver-coordinated runtime filters do), so the pruning
is a narrow whole-stage-codegen filter BEFORE any exchange.

Reference scope note: the reference app joins streams to small
tables (broadcast territory); this family targets the fact⋈selective
-fact shape the builder brief's 100 TB mandate adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _positions(key: Column, m_bits: int, k_hashes: int, salt: str) -> list[Column]:
    """k bloom bit positions for a key: first 32 md5 bits of
    '{salt}{i}|{key}' mod m_bits (always non-negative)."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}{i}|"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % m_bits
        for i in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> list[int]:
    """Build the filter: distinct keys → k positions each → per-word
    bit_or. One distinct + one tiny agg; only m_bits/32 longs reach
    the driver (the same driver-coordination Spark's built-in runtime
    filter uses). Returns the dense word list."""
    if m_bits % WORD_BITS:
        raise ValueError(f"m_bits {m_bits} not a multiple of {WORD_BITS}")
    keys = df.select(F.col(key_col).cast("string").alias("_k")).distinct()
    pos = keys.select(
        F.explode(F.array(*_positions(F.col("_k"), m_bits, k_hashes, salt))).alias(
            "pos"
        )
    )
    rows = (
        pos.select(
            (F.col("pos") / WORD_BITS).cast("int").alias("w"),
            (F.col("pos") % WORD_BITS).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.call_function("shiftleft", F.lit(1).cast("long"), F.col("b"))).alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // WORD_BITS)
    for r in rows:
        words[r["w"]] = int(r["bits"])
    return words


def bloom_might_contain(
    key: Column | str,
    words: list[int],
    m_bits: int = 4096,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> Column:
    """Membership predicate over the literal word array: all k bits
    set. Pure JVM expressions — prunes before any exchange."""
    key = F.col(key) if isinstance(key, str) else key
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    checks = []
    for pos in _positions(key, m_bits, k_hashes, salt):
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + F.lit(1))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % WORD_BITS).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def duck_bloom_ctes(
    build_sql: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
    salt: str = "bloom",
) -> str:
    """DuckDB twin of bloom_build as CTE text: ``bwords`` (w, bits)
    from the distinct keys of ``build_sql`` (one varchar column named
    kk). Probe sides join per-position and demand count = k."""
    return f"""bkeys AS (SELECT DISTINCT kk FROM ({build_sql})),
    bpos AS (SELECT cast(concat('0x', substr(md5(concat('{salt}', i, '|', kk)), 1, 8)) AS BIGINT) % {m_bits} AS pos
             FROM bkeys CROSS JOIN (SELECT unnest(range(0, {k_hashes})) AS i)),
    bwords AS (SELECT CAST(pos // {WORD_BITS} AS INT) AS w,
                      bit_or(1::BIGINT << CAST(pos % {WORD_BITS} AS INT)) AS bits
               FROM bpos GROUP BY 1)"""
