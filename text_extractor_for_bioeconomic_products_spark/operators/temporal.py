"""Temporal operators (graft extension): distributed as-of join and
bucketized interval (range) join.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do).  The classic
distributed formulation is union-merge: tag both sides, union them into
one keyed stream, sort each key group by time, and carry the most recent
build-side payload forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding window.  That is exactly one shuffle on the join key
— no range-explosion, no per-row subquery — and it streams in sorted
order within each partition, so it survives 100 TB event histories.

Semantics (matching ``ASOF LEFT JOIN ... ON key = key AND t_right <=
t_left``): every probe row survives; the matched payload is the
build row with the greatest ``t_right <= t_left``; ties on ``t_right``
break by the greatest build-side id (deterministic).  The payload
travels as a single struct column, so all matched fields come from the
SAME build row (per-column ``last()`` could mix rows when payload
fields are null).

Skew note: a mega-key's history sorts within one partition — inherent
to as-of ordering (salting would split the history and lose earlier
events).  AQE-level skew handling plus the narrow payload struct keep
partition bytes bounded; at 100 TB the probe side would additionally be
range-bucketed by time so each bucket only unions the build rows of its
own time range plus one carry-in row per key (the standard incremental
as-of sharding).

Reference analog: the reference joins extraction results back to source
documents by id + latest-run wins (src/storage/database.py upsert path);
the as-of join generalizes "latest state no later than t" to event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    key: str,
    probe_time: str,
    build_time: str,
    payload_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """ASOF LEFT JOIN probe←build on ``key`` with ``build_time <=
    probe_time``.  Returns every probe row plus one ``asof`` struct
    column (null when no build row qualifies).

    One shuffle: both sides union into a single stream partitioned by
    ``key``; within each key group, rows sort by (time, side, tiebreak)
    with build rows (side=0) before probe rows (side=1) at equal time —
    an event AT the probe instant is visible, matching ``<=``.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    b = build.select(
        F.col(key).alias("_asof_key"),
        F.col(build_time).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        F.col(tiebreak_col).cast("long").alias("_asof_tie"),
        payload,
        *[F.lit(None).cast(t.dataType).alias(f"_p_{c}") for c, t in zip(probe.columns, probe.schema.fields)],
    )
    p = probe.select(
        F.col(key).alias("_asof_key"),
        F.col(probe_time).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(0).cast("long").alias("_asof_tie"),
        F.lit(None).cast(b.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *[F.col(c).alias(f"_p_{c}") for c in probe.columns],
    )
    w = (
        Window.partitionBy("_asof_key")
        .orderBy("_asof_t", "_asof_side", "_asof_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.unionByName(p)
        .withColumn("asof", F.last("_asof_payload", ignorenulls=True).over(w))
        .filter(F.col("_asof_side") == 1)
        .select(*[F.col(f"_p_{c}").alias(c) for c in probe.columns], "asof")
    )


def interval_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    key: str,
    probe_time: str,
    build_time: str,
    lower_exclusive_s: int,
    upper_inclusive_s: int,
    payload_cols: list[str],
) -> DataFrame:
    """Inner interval join: every (probe, build) pair with the same
    ``key`` and ``build_time`` in the half-open window
    ``(probe_time + lower, probe_time + upper]``.  Returns probe rows
    plus one ``match`` struct per qualifying build row.

    A naive formulation is an equi-join on ``key`` followed by the range
    filter — at 100 TB a hot key turns that into (key-rows)² intermediate
    pairs BEFORE the filter prunes.  Here both sides are hashed into
    fixed-width time buckets (width = window span) and the join key is
    ``(key, bucket)``: a probe's window spans at most two buckets, so the
    probe side duplicates exactly 2× while every build row joins only
    probe rows whose window can actually reach it.  Pair work per
    (key, bucket) cell is bounded by the cell's occupancy, not the key's
    total history — the standard range-join bucketing (cf. Spark's own
    range-join hints in Databricks runtime, absent from OSS).

    Bucketing uses whole-second truncation (``unix_timestamp``); the
    exact sub-second predicate on the real timestamps decides membership,
    and truncation only widens candidate buckets (proof in test
    ``test_interval_join_subsecond_boundary``).
    """
    width = int(upper_inclusive_s - lower_exclusive_s)
    if width <= 0:
        raise ValueError("upper_inclusive_s must exceed lower_exclusive_s")
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("match")
    b = build.select(
        F.col(key).alias("_iv_key"),
        F.col(build_time).alias("_iv_bt"),
        F.floor(F.unix_timestamp(F.col(build_time)) / width).alias("_iv_bucket"),
        payload,
    )
    base = F.unix_timestamp(F.col(probe_time)) + F.lit(int(lower_exclusive_s))
    p = probe.withColumn(
        "_iv_bucket",
        F.explode(F.array(F.floor(base / width), F.floor(base / width) + 1)),
    )
    joined = p.join(
        b,
        on=[
            p[key] == b["_iv_key"],
            p["_iv_bucket"] == b["_iv_bucket"],
            b["_iv_bt"] > F.col(probe_time) + F.expr(f"INTERVAL {int(lower_exclusive_s)} SECOND"),
            b["_iv_bt"] <= F.col(probe_time) + F.expr(f"INTERVAL {int(upper_inclusive_s)} SECOND"),
        ],
        how="inner",
    )
    return joined.select(*probe.columns, "match")


def q_purchase_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Follow-on activity window: for every purchase event, the count and
    value sum of the same user's events strictly after the purchase and
    within 24 h (bucketized interval join; purchases with no follow-up
    kept at 0 via the left re-join)."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    pairs = interval_join(
        purchases,
        events,
        key="user_id",
        probe_time="purchase_ts",
        build_time="ts",
        lower_exclusive_s=0,
        upper_inclusive_s=86400,
        payload_cols=["event_id", "value"],
    )
    per_purchase = pairs.groupBy("purchase_id").agg(
        F.count("*").alias("n_followups"),
        # decimal(18,10) before the round: the cross-engine rounding idiom
        F.sum(
            F.round(F.col("match.value").cast("decimal(18,10)"), 4).cast(
                "decimal(18,4)"
            )
        ).alias("_vsum"),
    )
    return (
        purchases.join(per_purchase, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.coalesce("n_followups", F.lit(0)).alias("n_followups"),
            F.coalesce(F.col("_vsum").cast("double"), F.lit(0.0)).alias("followup_value"),
        )
        .orderBy("purchase_id")
    )


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase event, the same user's
    most recent NON-purchase event at or before the purchase instant
    (ASOF LEFT JOIN purchases←touches on user_id).  A user's first-ever
    action being the purchase keeps nulls — the left semantics."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    touches = events.filter(F.col("event_type") != "purchase")
    joined = asof_join(
        purchases,
        touches,
        key="user_id",
        probe_time="purchase_ts",
        build_time="ts",
        payload_cols=["event_id", "event_type", "ts", "value"],
        tiebreak_col="event_id",
    )
    return (
        joined.select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.col("asof.event_id").alias("touch_event_id"),
            F.col("asof.event_type").alias("touch_type"),
            F.col("asof.ts").alias("touch_ts"),
            F.round(F.col("asof.value").cast("decimal(18,10)"), 4)
            .cast("double")
            .alias("touch_value"),
        )
        .orderBy("purchase_id")
    )


def markov_transitions(events: DataFrame, *, key: str, time_col: str,
                       tiebreak_col: str, state: str) -> DataFrame:
    """First-order Markov transition census over per-key event
    sequences: for every (from_state, to_state) pair, the transition
    count and the conditional probability P(to | from).  The sequence
    order is (time, tiebreak) within each key — total and deterministic.

    Scale shape: ONE shuffle (the per-key window that pairs each event
    with its successor — partitioned by key, so a 10^9-user table
    parallelizes on users); the transition matrix itself is |states|²
    rows, and the per-from totals broadcast back onto it.  No state
    crosses user boundaries — lead() returns null at the end of each
    key group and those rows drop.

    Reference analog: none — the reference processes documents as
    independent rows; sequence structure is what the transcript/event
    axis adds, and the transition matrix is the standard summary a
    behavioral-cloning or next-event-prediction pipeline trains against.
    """
    w = Window.partitionBy(key).orderBy(time_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(state).alias("from_state"),
            F.lead(state).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = pairs.groupBy("from_state").agg(
        F.sum("n_transitions").alias("_from_total")
    )
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        # counts are exact longs, so the probability double is the same
        # IEEE division in both engines; the decimal round is belt and
        # braces (the repo-wide cross-engine idiom)
        F.round(
            (F.col("n_transitions") / F.col("_from_total")).cast(
                "decimal(28,12)"
            ),
            6,
        )
        .cast("double")
        .alias("prob"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-behavior Markov matrix: P(next event type | this event
    type) across every user's time-ordered event stream — |types|² rows
    with exact counts and hash-checked probabilities."""
    events = load(spark, sf_dir, "events")
    return markov_transitions(
        events,
        key="user_id",
        time_col="ts",
        tiebreak_col="event_id",
        state="event_type",
    ).orderBy("from_state", "to_state")


def interarrival_burstiness(events: DataFrame, *, key: str, time_col: str,
                            tiebreak_col: str) -> DataFrame:
    """Per-key inter-arrival burstiness census (Goh & Barabási 2008):
    B = (σ−μ)/(σ+μ) of the whole-second gaps between a key's
    consecutive events — B→−1 periodic, B≈0 Poisson, B→1 bursty.
    Returns one histogram row per burstiness decile bin: (burst_bin,
    n_users, n_gaps, total_gap_s, avg_gap_s).

    Determinism discipline: gaps are EXACT integers (truncated epoch
    seconds), so per-key moments (n, Σg, Σg²) are exact bigint sums —
    order-free.  μ, σ, B then derive from those ints through one fixed
    IEEE expression tree written identically in the SQL twin, so even
    the float path is bit-identical and the bin edges cannot drift.
    The histogram aggregates COUNTS and integer sums only — no
    order-dependent double summation anywhere.

    Scale shape: one per-key window shuffle (gaps), one groupBy(key)
    with map-side partial moment sums, then a |bins|-row reduce.  Keys
    with < 2 gaps are excluded (sample σ undefined).
    """
    w = Window.partitionBy(key).orderBy(time_col, tiebreak_col)
    epoch = F.unix_timestamp(F.col(time_col))
    gaps = (
        events.select(
            F.col(key).alias("_k"),
            (epoch - F.lag(epoch).over(w)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    moments = (
        gaps.groupBy("_k")
        .agg(
            F.count("*").alias("n"),
            F.sum("g").alias("s1"),
            F.sum(F.col("g") * F.col("g")).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = (sd - mean) / (sd + mean)
    binned = moments.select(
        "n",
        "s1",
        F.floor(
            F.round(b.cast("decimal(28,12)"), 9) * 10
        ).cast("int").alias("burst_bin"),
    )
    return (
        binned.groupBy("burst_bin")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n").cast("long").alias("n_gaps"),
            F.sum("s1").cast("long").alias("total_gap_s"),
        )
        .select(
            "burst_bin",
            "n_users",
            "n_gaps",
            "total_gap_s",
            F.round(
                (F.col("total_gap_s") / F.col("n_gaps")).cast("decimal(28,12)"),
                4,
            ).cast("double").alias("avg_gap_s"),
        )
        .orderBy("burst_bin")
    )


def q_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness-decile histogram of user inter-event gaps — the
    temporal texture census a rate-limiter or session-synthesizer
    calibrates against."""
    events = load(spark, sf_dir, "events")
    return interarrival_burstiness(
        events, key="user_id", time_col="ts", tiebreak_col="event_id"
    )


ORACLE_SQL = {
    "event_transitions": """
        WITH seq AS (
            SELECT event_type AS from_state,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_state
            FROM events
        ),
        pairs AS (
            SELECT from_state, to_state,
                   CAST(count(*) AS BIGINT) AS n_transitions
            FROM seq WHERE to_state IS NOT NULL
            GROUP BY 1, 2
        ),
        totals AS (
            SELECT from_state, sum(n_transitions) AS from_total
            FROM pairs GROUP BY 1
        )
        SELECT p.from_state, p.to_state, p.n_transitions,
               CAST(round(CAST(CAST(p.n_transitions AS DOUBLE) / t.from_total
                               AS DECIMAL(28,12)), 6) AS DOUBLE) AS prob
        FROM pairs p JOIN totals t USING (from_state)
        ORDER BY from_state, to_state
    """,
    "user_burstiness": """
        WITH gaps AS (
            SELECT user_id AS k,
                   CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                     ) AS g
            FROM events
        ),
        moments AS (
            SELECT k, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(g) AS BIGINT) AS s1,
                   CAST(sum(g * g) AS BIGINT) AS s2
            FROM gaps WHERE g IS NOT NULL
            GROUP BY k HAVING count(*) >= 2
        ),
        binned AS (
            SELECT n, s1,
                   CAST(floor(round(CAST(
                       (sqrt(greatest(
                            (CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                               / CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) - 1.0), 0.0))
                        - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / (sqrt(greatest(
                            (CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                               / CAST(n AS DOUBLE))
                            / (CAST(n AS DOUBLE) - 1.0), 0.0))
                          + CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       AS DECIMAL(28,12)), 9) * 10) AS INT) AS burst_bin
            FROM moments
        )
        SELECT burst_bin,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(n) AS BIGINT) AS n_gaps,
               CAST(sum(s1) AS BIGINT) AS total_gap_s,
               CAST(round(CAST(CAST(sum(s1) AS DOUBLE) / sum(n)
                               AS DECIMAL(28,12)), 4) AS DOUBLE) AS avg_gap_s
        FROM binned
        GROUP BY burst_bin
        ORDER BY burst_bin
    """,
    # Naive formulation (equi-join + range filter) — correct at oracle
    # scale; the Spark side must match it while bucketing.
    "purchase_followups": """
        WITH p AS (
            SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        ),
        agg AS (
            SELECT p.purchase_id, count(*) AS n_followups,
                   SUM(CAST(round(CAST(e.value AS DECIMAL(18,10)), 4)
                            AS DECIMAL(18,4))) AS vsum
            FROM p
            JOIN events e
              ON e.user_id = p.user_id
             AND e.ts > p.purchase_ts
             AND e.ts <= p.purchase_ts + INTERVAL 86400 SECOND
            GROUP BY p.purchase_id
        )
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               COALESCE(agg.n_followups, 0) AS n_followups,
               COALESCE(CAST(agg.vsum AS DOUBLE), 0.0) AS followup_value
        FROM p LEFT JOIN agg ON p.purchase_id = agg.purchase_id
        ORDER BY p.purchase_id
    """,
    # Independent formulation: greatest qualifying touch ts per purchase
    # via a grouped join, then the max event_id at that ts (the same
    # tie-break the window variant applies), then fetch that one row.
    "purchase_attribution": """
        WITH probe AS (
            SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        ),
        touch AS (
            SELECT * FROM events WHERE event_type <> 'purchase'
        ),
        best_ts AS (
            SELECT p.purchase_id, max(e.ts) AS best_ts
            FROM probe p
            JOIN touch e ON e.user_id = p.user_id AND e.ts <= p.purchase_ts
            GROUP BY p.purchase_id
        ),
        best AS (
            SELECT b.purchase_id, max(e.event_id) AS best_event_id
            FROM best_ts b
            JOIN probe p ON p.purchase_id = b.purchase_id
            JOIN touch e ON e.user_id = p.user_id AND e.ts = b.best_ts
            GROUP BY b.purchase_id
        )
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               e.event_id AS touch_event_id,
               e.event_type AS touch_type,
               e.ts AS touch_ts,
               CAST(round(CAST(e.value AS DECIMAL(18,10)), 4) AS DOUBLE) AS touch_value
        FROM probe p
        LEFT JOIN best ON p.purchase_id = best.purchase_id
        LEFT JOIN touch e ON e.event_id = best.best_event_id
        ORDER BY p.purchase_id
    """,
}

QUERIES = {
    "purchase_attribution": q_purchase_attribution,
    "purchase_followups": q_purchase_followups,
    "event_transitions": q_event_transitions,
    "user_burstiness": q_user_burstiness,
}
