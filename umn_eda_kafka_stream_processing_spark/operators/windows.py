"""Event-time windowed aggregation helpers.

The reference uses NO event time at all — no watermarks, no windowed
aggregations (SURVEY.md §2.8) — but a complete engine needs them, and
they're the scale-correct way to bound streaming state. These are
thin declarative wrappers over Spark's window/session_window so every
windowed catalog query and streaming pipeline goes through one
audited code path.

All helpers take a timestamp column name (the driver's events.ts
reads as TIMESTAMP_NTZ — see sources/parquet.py) normalized via
``event_ts``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_ts(col: str | Column) -> Column:
    """Normalize an event-time column to TIMESTAMP_NTZ.

    pyspark >= 4.1 reads the testdata's TIMESTAMP(NANOS) parquet as
    TIMESTAMP_NTZ (µs; lossless here — the generator emits µs-aligned
    values), and the legacy nanosAsLong conf is gone, so NTZ is the
    engine-wide event-time type. The cast is a no-op on NTZ input and
    keeps any LongType-nanos source honest about needing explicit
    conversion first. NTZ is timezone-free: date_format/window/
    comparisons never shift with the session timezone, which keeps
    Spark output hash-identical to the DuckDB oracles' naive
    TIMESTAMP handling regardless of the driver session's tz.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp_ntz")


def tumbling_agg(
    df: DataFrame,
    time_col: str | Column,
    duration: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Fixed non-overlapping windows: one row per (window, groups).
    Output includes window_start/window_end columns."""
    tc = F.col(time_col) if isinstance(time_col, str) else time_col
    w = F.window(tc, duration)
    aggs = list(aggs) or [F.count(F.lit(1)).alias("count")]
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    time_col: str | Column,
    duration: str,
    slide: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Overlapping windows of ``duration`` every ``slide``: each event
    lands in duration/slide windows (Spark expands them map-side)."""
    tc = F.col(time_col) if isinstance(time_col, str) else time_col
    w = F.window(tc, duration, slide)
    aggs = list(aggs) or [F.count(F.lit(1)).alias("count")]
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    time_col: str | Column,
    gap: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session windows: events of a group closer than ``gap`` merge
    into one session [first_event, last_event + gap)."""
    tc = F.col(time_col) if isinstance(time_col, str) else time_col
    w = F.session_window(tc, gap)
    aggs = list(aggs) or [F.count(F.lit(1)).alias("count")]
    return (
        df.groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def with_watermark(df: DataFrame, time_col: str, delay: str) -> DataFrame:
    """Late-data bound for streaming windowed aggs: state for windows
    older than max(event_time) - delay is finalized and dropped —
    this is what keeps streaming window state finite; the reference's
    unwindowed stores grow forever (SURVEY.md §2.8)."""
    return df.withWatermark(time_col, delay)


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: str | None = "7 days",
) -> DataFrame:
    """Ordered-funnel analysis (earliest-completion semantics): for
    each user, step k is reached at the user's EARLIEST step-k event
    STRICTLY AFTER their step-(k-1) reach time, with every step
    landing within ``window`` of the step-1 time (None = unbounded).
    Returns one row per user with ``t1..tN`` reach timestamps (NULL
    where the funnel stalled).

    Scale shape: NO per-user event-sequence window — each step is one
    filtered hash-agg (min ts per user over only that step's events)
    plus one user-keyed join against the reach frontier, so at 100 TB
    the work is k tiny aggregations over type-pruned scans (the
    event_type filter reaches the parquet scan) rather than a
    corpus-wide sort. The strict ``>`` makes same-microsecond
    step-k/step-k+1 events NOT chain — deterministic and identical in
    any engine (no tie-break needed because min() is used per side).
    """
    tc = event_ts(ts_col)
    frontier = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(tc).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            user_col, tc.alias("_ts")
        )
        cond = F.col("_ts") > F.col(f"t{k - 1}")
        if window is not None:
            cond = cond & (
                F.col("_ts") <= F.col("t1") + F.expr(f"INTERVAL {window}")
            )
        reach = (
            frontier.join(nxt.hint("shuffle_hash"), user_col)
            .where(cond)
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t{k}"))
        )
        frontier = frontier.join(
            reach.hint("shuffle_hash"), user_col, "left"
        )
    return frontier


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """First-order Markov transition matrix of the per-user event
    sequence: count (from_type -> to_type) over consecutive event
    pairs, plus ``prob_micro`` — the row-normalized transition
    probability as floor(1e6 * n / row_total + 0.5) (integer micros:
    one division per OUTPUT row of exact BIGINT aggregates, never a
    float sum — the repo's cross-engine rule).

    One lag() window partitioned BY USER (the scd2_intervals shape —
    per-key frames, never corpus-wide), ties broken by
    ``order_cols``; then two hash-aggs (pair counts + a from_type
    window sum over the already-aggregated matrix, which is
    #types² rows — trivially partition-local).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        event_ts(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    pairs = (
        events.withColumn("_next", F.lead(type_col).over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("_next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return pairs.withColumn(
        "prob_micro",
        F.expr(
            "(1000000 * n + sum(n) over (partition by from_type) div 2) "
            "div sum(n) over (partition by from_type)"
        ).cast("long"),
    )


def scd2_intervals(
    changelog: DataFrame,
    key_cols: str | list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 materialization of a
    changelog: every version row gains ``valid_from`` (its own
    timestamp), ``valid_to`` (the key's NEXT version's timestamp —
    NULL while current), and ``is_current``. The warehouse pattern
    for "what was this key's state at time T": probe with
    ``valid_from <= T AND (valid_to IS NULL OR T < valid_to)``.

    One window partitioned BY KEY (never corpus-wide) ordered by
    (ts, *order_cols) — lead() per partition, so at 100 TB this is a
    single shuffle keyed by the dimension key with per-key frames;
    ties on ts break by ``order_cols`` (pass the changelog sequence
    column — required whenever one key can change twice in one tick).
    """
    from pyspark.sql.window import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changelog.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def incremental_funnel(
    batch_df: DataFrame,
    store_path: str,
    steps: Sequence[str],
    batch_seq: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: str | None = "7 days",
    n_buckets: int = 32,
) -> DataFrame:
    """Continuously-maintained funnel frontiers — the incremental
    twin of `funnel_steps`, extending the incremental family (exact
    docs, simhash, semantic, spans) to stateful temporal analytics:
    each microbatch advances only its AFFECTED USERS' frontiers
    against a per-user (t1..tN) store, so a dashboard reads current
    funnel state without ever rescanning the event history.

    incremental == batch CONTRACT (pinned by the streaming test):
    matches `funnel_steps` over the full history when event time is
    non-decreasing across batches (within a batch, any order). Under
    that arrival order every reach time is SET-ONCE: t1 is the min
    over a prefix closed under minima, and a later batch can never
    supply an earlier step-k event that an already-set t_{k}
    should have preferred. Late data would need per-user event
    retention + watermark-bounded recompute — out of scope here, as
    in the reference's stores.

    Per batch: one store read pruned to the users' hash buckets
    (left join on the frontier), per-step min-aggs over only that
    step's batch events, one write via `compaction.upsert_snapshot`
    (bucket = pmod(hash(user), n_buckets) is stable per user, so the
    no-move contract holds; ``batch_seq`` is the latest-wins order).
    Returns the affected users' updated frontier rows.
    """
    from pyspark.sql.utils import AnalysisException

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        upsert_snapshot,
    )

    spark = batch_df.sparkSession
    tcols = [f"t{k}" for k in range(1, len(steps) + 1)]
    ev = batch_df.select(
        user_col, F.col(type_col).alias("_et"), event_ts(ts_col).alias("_ts")
    ).localCheckpoint()
    users = ev.select(user_col).distinct()
    try:
        store = spark.read.parquet(store_path)
        prior = users.join(store.hint("shuffle_hash"), user_col, "left")
    except AnalysisException:
        prior = users
        for t in tcols:
            prior = prior.withColumn(t, F.lit(None).cast("timestamp_ntz"))
    frontier = prior.select(user_col, *tcols)
    for k, step in enumerate(steps, start=1):
        # Join the step's RAW batch events to the frontier and apply
        # the chain condition PER EVENT before the per-user min — the
        # funnel_steps shape. Aggregating first (the round-7 code)
        # broke the within-batch contract: a user with a step-k event
        # before t_{k-1} and another after it had their batch min fail
        # the strict > test and the reach dropped forever (set-once).
        step_ev = ev.where(F.col("_et") == step).select(user_col, "_ts")
        j = frontier.join(step_ev.hint("shuffle_hash"), user_col, "left")
        if k == 1:
            # least() skips NULLs, so an unset store t1 takes the min
            new_t = F.least(F.max("t1"), F.min("_ts"))
        else:
            cond = F.col("_ts") > F.col(f"t{k - 1}")
            if window is not None:
                cond = cond & (
                    F.col("_ts")
                    <= F.col("t1") + F.expr(f"INTERVAL {window}")
                )
            cand = F.min(
                F.when(F.coalesce(cond, F.lit(False)), F.col("_ts"))
            )
            # set-once: keep the stored reach if present, else admit
            # the earliest batch event that chains from step k-1
            new_t = F.coalesce(F.max(F.col(f"t{k}")), cand)
        # t1..t{k-1} / t{k+1}..tN are constant per user post-join:
        # max() re-materializes them through the single hash-agg, so
        # each step costs exactly one join + one agg (no self-join of
        # the frontier — the AMBIGUOUS_REFERENCE trap).
        frontier = j.groupBy(user_col).agg(
            *[F.max(t).alias(t) for t in tcols[: k - 1]],
            new_t.alias(f"t{k}"),
            *[F.max(t).alias(t) for t in tcols[k:]],
        )
    frontier = frontier.select(
        user_col,
        *tcols,
        F.expr(f"pmod(hash({user_col}), {n_buckets})").alias("_fb"),
        F.lit(batch_seq).cast("long").alias("_seq"),
    ).localCheckpoint()
    upsert_snapshot(
        spark,
        store_path,
        frontier,
        key_cols=user_col,
        order_col="_seq",
        partition_cols=("_fb",),
    )
    return frontier.select(user_col, *tcols)


def incremental_transitions(
    batch_df: DataFrame,
    store_path: str,
    batch_seq: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("event_id",),
    n_buckets: int = 32,
) -> DataFrame:
    """Markov transition pairs over a CONTINUOUS event stream — the
    incremental twin of `transition_counts`: each microbatch emits
    its (from_type, to_type) consecutive pairs, INCLUDING the
    boundary pair that chains a user's first in-batch event to their
    last event from prior batches, held in a per-user last-event
    store. Summing the emitted pair counts over all batches equals
    `transition_counts` over the full history (the incremental ==
    batch contract, pinned by the streaming test) when event order
    (ts, *order_cols) is non-decreasing across batches per user.

    Per batch: one per-user lag window WITHIN the batch (per-key
    frames, never corpus-wide), one pruned store read joining only
    the batch's users, one `upsert_snapshot` of the new per-user
    last event (bucket = pmod(hash(user), n_buckets) — stable, so
    the no-move contract holds; latest-wins on ``batch_seq``).
    Returns this batch's pairs (from_type, to_type, n).
    """
    from pyspark.sql.utils import AnalysisException
    from pyspark.sql.window import Window

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        upsert_snapshot,
    )

    spark = batch_df.sparkSession
    ev = batch_df.select(
        user_col,
        F.col(type_col).alias("_et"),
        event_ts(ts_col).alias("_ts"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
    ).localCheckpoint()
    okeys = [f"_o{i}" for i in range(len(order_cols))]
    w = Window.partitionBy(user_col).orderBy(
        F.col("_ts").asc(), *[F.col(c).asc() for c in okeys]
    )
    seq = ev.withColumn("_prev", F.lag("_et").over(w)).withColumn(
        "_rn", F.row_number().over(w)
    )
    within = seq.where(F.col("_prev").isNotNull()).select(
        F.col("_prev").alias("from_type"), F.col("_et").alias("to_type")
    )
    firsts = seq.where(F.col("_rn") == 1).select(user_col, "_et")
    try:
        store = spark.read.parquet(store_path)
        boundary = firsts.join(
            store.select(user_col, F.col("last_type")).hint(
                "shuffle_hash"
            ),
            user_col,
        ).select(
            F.col("last_type").alias("from_type"),
            F.col("_et").alias("to_type"),
        )
        pairs = within.union(boundary)
    except AnalysisException:
        pairs = within
    # per-user new last event = max (ts, *order) in batch (arrival is
    # non-decreasing across batches, so the batch max IS the global
    # last)
    lasts = (
        seq.withColumn(
            "_rmax",
            F.row_number().over(
                Window.partitionBy(user_col).orderBy(
                    F.col("_ts").desc(),
                    *[F.col(c).desc() for c in okeys],
                )
            ),
        )
        .where(F.col("_rmax") == 1)
        .select(
            user_col,
            F.col("_et").alias("last_type"),
            F.expr(f"pmod(hash({user_col}), {n_buckets})").alias("_fb"),
            F.lit(batch_seq).cast("long").alias("_seq"),
        )
        .localCheckpoint()
    )
    out = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).localCheckpoint()
    upsert_snapshot(
        spark,
        store_path,
        lasts,
        key_cols=user_col,
        order_col="_seq",
        partition_cols=("_fb",),
    )
    return out

def incremental_retention(
    batch_df: DataFrame,
    store_path: str,
    batch_seq: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 32,
) -> DataFrame:
    """Continuously-maintained weekly retention cohorts — the
    incremental twin of the `weekly_retention_cohorts` catalog shape:
    a per-user (cohort_week, active_weeks) store advances under each
    microbatch, so a dashboard reads the current retention matrix
    (via `retention_matrix_from_store`) without rescanning history.

    incremental == batch CONTRACT (pinned by the streaming test):
    the matrix from the store equals the batch computation over the
    full history when event time is non-decreasing across batches
    (within a batch, any order). Under that order the cohort week is
    SET-ONCE (the first batch carrying a user holds their earliest
    week) and active weeks only ACCUMULATE — both closed under the
    per-batch merge below, so no reach is ever revised. Per-user
    state is bounded by the number of distinct active weeks (an
    array<date>, NOT a 64-bit bitmap — real histories outlive 64
    weeks).

    Per batch: one distinct (user, week) hash-agg collapsed to one
    row per user (min week + week set), one store read pruned to the
    batch's users, an array merge (distinct ∪, sorted for
    deterministic storage), one `upsert_snapshot` write (bucket =
    pmod(hash(user), n_buckets) — stable per user, latest-wins on
    ``batch_seq``). Returns the affected users' merged state."""
    from pyspark.sql.utils import AnalysisException

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        upsert_snapshot,
    )

    spark = batch_df.sparkSession
    uw = (
        batch_df.select(
            user_col,
            F.date_trunc("week", event_ts(ts_col)).cast("date").alias("wk"),
        )
        .distinct()
        .groupBy(user_col)
        .agg(
            F.min("wk").alias("_bcw"),
            F.collect_set("wk").alias("_bwks"),
        )
        .localCheckpoint()
    )
    try:
        store = spark.read.parquet(store_path)
        prior = uw.join(
            store.select(user_col, "cw", "weeks").hint("shuffle_hash"),
            user_col,
            "left",
        )
    except AnalysisException:
        prior = uw.withColumn("cw", F.lit(None).cast("date")).withColumn(
            "weeks", F.lit(None).cast("array<date>")
        )
    merged = prior.select(
        user_col,
        # least() skips NULLs, so an unset store cw takes the batch min
        F.coalesce(
            F.least(F.col("cw"), F.col("_bcw")), F.col("cw"), F.col("_bcw")
        ).alias("cw"),
        F.array_sort(
            F.array_distinct(
                F.concat(
                    F.coalesce(
                        F.col("weeks"), F.expr("CAST(array() AS array<date>)")
                    ),
                    F.col("_bwks"),
                )
            )
        ).alias("weeks"),
        F.expr(f"pmod(hash({user_col}), {n_buckets})").alias("_fb"),
        F.lit(batch_seq).cast("long").alias("_seq"),
    ).localCheckpoint()
    upsert_snapshot(
        spark,
        store_path,
        merged,
        key_cols=user_col,
        order_col="_seq",
        partition_cols=("_fb",),
    )
    return merged.select(user_col, "cw", "weeks")


def incremental_scd2(
    batch_df: DataFrame,
    store_path: str,
    batch_seq: int,
    key_cols: str | list[str] = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    n_buckets: int = 32,
) -> DataFrame:
    """Continuously-maintained SCD2 dimension table — the incremental
    twin of `scd2_intervals` and the KTable-HISTORY analogue of
    `compaction.upsert_snapshot` (which keeps only each key's latest
    row): under a changelog stream the store holds EVERY version of
    every key with [valid_from, valid_to) validity and is_current,
    advanced per microbatch without ever rescanning history.

    incremental == batch CONTRACT (pinned by the streaming test):
    after any sequence of batches the store equals `scd2_intervals`
    over the concatenated history — under ANY arrival order,
    including late data. Unlike the funnel/retention twins (set-once
    frontiers needing non-decreasing event time), each batch
    RECOMPUTES the full timeline of only its AFFECTED KEYS: closing
    an open interval, splicing a late version into the middle, and
    re-opening are all the same one recompute. The changelog must be
    append-only with version identity (key, ts, *order_cols)
    determining the payload — a replayed microbatch (foreachBatch is
    at-least-once) re-merges rows already in the store and dedupes
    to a no-op.

    Per batch: one store read partition-pruned to the batch keys'
    hash buckets (≤ n_buckets literal values, collected once —
    bucket ids come through the engine's own hash) and semi-joined
    to the affected keys, one per-key lead() window over prior ∪
    batch versions (the `scd2_intervals` shape — never corpus-wide),
    one `upsert_snapshot` keyed by the version identity (bucket =
    pmod(hash(key), n_buckets) is stable per key, so the no-move
    contract holds; stale valid_to rows are overwritten latest-wins
    on ``batch_seq``). Cost is O(affected keys' version counts), not
    O(|store|). Returns the affected keys' recomputed timelines.
    """
    from pyspark.sql.utils import AnalysisException

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        upsert_snapshot,
    )

    spark = batch_df.sparkSession
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ident = keys + [ts_col] + list(order_cols)
    batch = batch_df.withColumn(ts_col, event_ts(ts_col)).localCheckpoint()
    affected = batch.select(*keys).distinct()
    key_hash = "hash(" + ", ".join(keys) + ")"
    try:
        store = spark.read.parquet(store_path)
        bids = [
            r["b"]
            for r in affected.select(
                F.expr(f"pmod({key_hash}, {n_buckets})").alias("b")
            )
            .distinct()
            .collect()
        ]
        prior = (
            store.where(F.col("_vb").isin(bids))
            .join(affected, keys, "left_semi")
            .select(*batch.columns)
        )
        merged = prior.unionByName(batch).dropDuplicates(ident)
    except AnalysisException:
        merged = batch.dropDuplicates(ident)
    # no checkpoint on merged: it is consumed exactly once, and the
    # recomputed checkpoint below materializes the whole lineage
    # (including the store read) BEFORE the upsert overwrites it
    recomputed = scd2_intervals(
        merged, keys, ts_col, list(order_cols)
    ).select(
        "*",
        F.expr(f"pmod({key_hash}, {n_buckets})").alias("_vb"),
        F.lit(batch_seq).cast("long").alias("_seq"),
    ).localCheckpoint()
    upsert_snapshot(
        spark,
        store_path,
        recomputed,
        key_cols=ident,
        order_col="_seq",
        partition_cols=("_vb",),
        # cluster the write by bucket: one file per touched _vb dir
        # instead of (shuffle partitions x dirs) near-empty files —
        # the next batch's partition-pruned read lists O(buckets)
        # files, not O(batches x tasks) (measured 48 files after 3
        # batches at sf0.1 without this)
        write_coalesce=n_buckets,
    )
    return recomputed.drop("_vb", "_seq")


def scd2_from_store(spark, store_path: str) -> DataFrame:
    """Read the `incremental_scd2` store back as the dimension table
    (same schema as `scd2_intervals` over the full history). As-of-T
    probes should instead read the store directly and push
    ``valid_from <= T`` down the partition-pruned scan."""
    return spark.read.parquet(store_path).drop("_vb", "_seq")


def retention_matrix_from_store(
    spark, store_path: str
) -> DataFrame:
    """Read the `incremental_retention` store into the retention
    matrix — identical output shape (cohort_week, week_offset,
    n_active, n_cohort, retention_micro) and identical integer
    rounding to the batch `weekly_retention_cohorts` query. One
    explode + two hash-aggs over per-user state (users x active
    weeks rows — the same cardinality the batch path shuffles)."""
    st = spark.read.parquet(store_path)
    uw = st.select("cw", F.explode("weeks").alias("wk"))
    act = (
        uw.select(
            "cw",
            (F.datediff("wk", "cw") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cw", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    cs = st.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    return act.join(F.broadcast(cs), "cw").select(
        F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        "n_cohort",
        F.expr("(1000000 * n_active + n_cohort div 2) div n_cohort")
        .cast("long")
        .alias("retention_micro"),
    )
