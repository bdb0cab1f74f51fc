"""Event-stream analytics over the ``events`` table: tumbling-window
aggregates, gap-based sessionization, per-day top-k — the window/time
operators the reference lacks (Flink DataSet batch only, SURVEY §2.9)
but any training-data/event pipeline needs.

The same logic runs unchanged over a stream via
``rdfind_spark.streaming`` (readStream + watermark); here it is
expressed batch-first so the DuckDB oracle can verify it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30
TOP_K_USERS = 5


def normalize_event_ts(raw: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a plain TIMESTAMP whatever
    the parquet physical type: the generated events table has shipped
    both as TIMESTAMP(MICROS) (read natively) and as TIMESTAMP(NANOS)
    (readable only as nanos-long under
    ``spark.sql.legacy.parquet.nanosAsLong``, then truncated to micros —
    the same truncation DuckDB's implicit TIMESTAMP_NS → TIMESTAMP cast
    performs, so oracle instants match)."""
    dtype = dict(raw.dtypes)["ts"]
    if dtype in ("bigint", "long"):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event type: count + value sum.
    (Streaming form: groupBy(window(ts, '1 hour'), event_type) with a
    watermark — see rdfind_spark.streaming.windows.)"""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )


def hourly_event_counts_sql() -> str:
    return """SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events, round(SUM(value), 6) AS value_sum
FROM events GROUP BY 1, 2"""


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization: a user's events belong to one session
    while consecutive gaps stay under ``gap_min`` minutes.  Classic
    lag + cumulative-sum window pattern; one shuffle by user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_breaks = events.withColumn(
        "is_break",
        F.when(gap.isNull() | (gap > gap_min * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = with_breaks.withColumn(
        "session_no", F.sum("is_break").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def sessionize_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    """DuckDB reads the events timestamps at nanosecond precision while
    the Spark path truncates to microseconds (see normalize_event_ts),
    so the oracle reproduces the same truncation chain exactly: order
    and lag on the µs value, compute gaps on whole epoch seconds (the
    Spark side casts timestamp → long seconds), and rebuild the output
    instants from the µs longs via make_timestamp."""
    return f"""WITH e AS (
  SELECT user_id, event_id,
         epoch_ns(ts) // 1000 AS us,
         (epoch_ns(ts) // 1000) // 1000000 AS sec
  FROM events
),
g AS (
  SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                  OR sec - lag(sec) OVER w > {gap_min * 60}
            THEN 1 ELSE 0 END AS is_break
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, SUM(is_break) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no, COUNT(*) AS n_events,
       make_timestamp(MIN(us)) AS session_start,
       make_timestamp(MAX(us)) AS session_end
FROM s GROUP BY 1, 2"""


def top_purchasers_per_day(events: DataFrame, k: int = TOP_K_USERS) -> DataFrame:
    """Per day: the k users with the highest summed purchase value
    (rank ties broken by user_id)."""
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .agg(F.round(F.sum("value"), 6).alias("purchase_value"))
    )
    w = Window.partitionBy("day").orderBy(
        F.col("purchase_value").desc(), F.col("user_id").asc()
    )
    return (
        daily.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("day", "user_id", "purchase_value", "rank")
    )


def top_purchasers_per_day_sql(k: int = TOP_K_USERS) -> str:
    return f"""WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
         round(SUM(value), 6) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY day
                               ORDER BY purchase_value DESC, user_id ASC) AS rank
  FROM daily
)
SELECT day, user_id, purchase_value, rank FROM ranked WHERE rank <= {k}"""


def event_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel: did the user view → click → purchase (in that
    temporal order)?  Outputs one row per funnel stage with the user
    count that reached it — a conditional min-timestamp cascade, no
    self-joins."""
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    staged = per_user.select(
        F.col("t_view").isNotNull().alias("s1"),
        (
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
        ).alias("s2"),
        (
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & F.col("t_purchase").isNotNull()
            & (F.col("t_purchase") > F.col("t_click"))
        ).alias("s3"),
    )
    return staged.agg(
        F.sum(F.col("s1").cast("long")).alias("n_viewed"),
        F.sum(F.col("s2").cast("long")).alias("n_clicked_after_view"),
        F.sum(F.col("s3").cast("long")).alias("n_purchased_after_click"),
    )


def event_funnel_sql() -> str:
    return """WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                      AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                      AND t_click > t_view AND t_purchase IS NOT NULL
                      AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click
FROM per_user"""


def user_interarrival(events: DataFrame) -> DataFrame:
    """Per-user inter-arrival statistics: lag-window gaps between
    consecutive events (seconds), aggregated to count/mean/min/max.
    The lag + groupBy pattern shares one shuffle by user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    gaps = events.withColumn("gap_s", gap).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("mean_gap_s"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


def user_interarrival_sql() -> str:
    """DuckDB reads the events timestamps at nanosecond precision; the
    Spark path stores microseconds and casts to whole epoch seconds, so
    the oracle reproduces that truncation chain exactly (µs // 1e6) and
    orders by the same µs-granularity key."""
    return """WITH e AS (
  SELECT user_id, event_id,
         epoch_ns(ts) // 1000 AS us,
         (epoch_ns(ts) // 1000) // 1000000 AS sec
  FROM events
),
g AS (
  SELECT user_id,
         sec - lag(sec) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_s
  FROM e
)
SELECT user_id, COUNT(*) AS n_gaps,
       round(AVG(gap_s), 6) AS mean_gap_s,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY user_id"""


def daily_rollup(events: DataFrame) -> DataFrame:
    """Event counts and value sums by (day, event_type) with ROLLUP
    subtotals (per-day and grand total; NULL dimensions mark subtotal
    rows, rendered as sentinel strings for stable cross-engine
    comparison)."""
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string")
    rolled = (
        events.select(day.alias("day"), "event_type", "value")
        .rollup("day", "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("value_sum"))
    )
    return rolled.select(
        F.coalesce(F.col("day"), F.lit("<all>")).alias("day"),
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        "n_events",
        "value_sum",
    )


def daily_rollup_sql() -> str:
    return """SELECT
       COALESCE(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), '<all>') AS day,
       COALESCE(event_type, '<all>') AS event_type,
       COUNT(*) AS n_events,
       round(SUM(value), 6) AS value_sum
FROM events
GROUP BY ROLLUP (CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), event_type)"""


def day_retention(events: DataFrame) -> DataFrame:
    """Day-over-day retention: for each day, how many of its active
    users are active again the next day (plus the ratio) — the standard
    cohort health metric; one distinct + one self-join on (user, day)."""
    day = F.date_trunc("day", F.col("ts")).cast("date")
    active = events.select("user_id", day.alias("day")).distinct()
    nxt = active.select(
        "user_id", F.date_sub(F.col("day"), 1).alias("day"), F.lit(1).alias("ret")
    )
    joined = active.join(nxt, on=["user_id", "day"], how="left")
    # Bit-stable ratio: integer floor-division to parts-per-million, then
    # ONE IEEE double division — identical bits in any engine, unlike
    # round(x, 6) whose tie-breaking differs between Spark and DuckDB.
    return (
        joined.groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count("*").alias("n_active"),
            F.sum(F.coalesce(F.col("ret"), F.lit(0))).alias("n_retained"),
        )
        .withColumn(
            "retention",
            F.expr("(n_retained * 1000000L) div n_active").cast("double")
            / F.lit(1000000.0),
        )
    )


def day_retention_sql() -> str:
    return """WITH active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
j AS (
  SELECT a.day, a.user_id,
         CASE WHEN n.user_id IS NOT NULL THEN 1 ELSE 0 END AS ret
  FROM active a
  LEFT JOIN active n ON n.user_id = a.user_id AND n.day = a.day + 1
)
SELECT CAST(day AS VARCHAR) AS day, COUNT(*) AS n_active,
       CAST(SUM(ret) AS BIGINT) AS n_retained,
       CAST((CAST(SUM(ret) AS BIGINT) * 1000000) // COUNT(*) AS DOUBLE)
         / 1000000.0 AS retention
FROM j GROUP BY day"""


# ------------------------------------------------- as-of / range joins
#
# The reference has no temporal joins at all (Flink DataSet batch,
# SURVEY §2.3 "notably absent": as-of/range joins) — these are the
# time-series operators a training-data/event pipeline needs, expressed
# Spark-first.


def asof_last_view(events: DataFrame) -> DataFrame:
    """As-of join: each purchase event picks the most recent view event
    of the same user at-or-before its timestamp.

    Expressed as a union + running ``last(ignorenulls)`` window rather
    than a join: both sides are interleaved per user in time order and
    the view timestamp is carried forward, so there is no join blow-up
    and no per-row probe — one shuffle on user_id, linear scan per
    partition.  Scale note: partitions by user (millions of independent
    keys at scale); a single user's history stays within one partition,
    which is the inherent as-of ordering requirement."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("kind"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("kind"), "event_id"
    )
    # kind orders views before purchases at equal ts => "<=" semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = views.unionByName(purchases).withColumn(
        "last_view_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return tagged.filter(F.col("kind") == 1).select(
        "event_id", "user_id", "ts", "last_view_ts"
    )


def asof_last_view_sql() -> str:
    return """SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts"""


RANGE_JOIN_WINDOW_S = 600


def range_join_counts(events: DataFrame, window_s: int = RANGE_JOIN_WINDOW_S) -> DataFrame:
    """Range join: for each error event, the number of click events of
    the same user in the preceding ``window_s`` seconds (exclusive
    lower bound, inclusive upper).

    Banded-join technique: both sides bucketed to ``window_s``-wide time
    bins, clicks replicated to their own and the NEXT bin, equi-join on
    (user_id, bin), exact range predicate after — every qualifying pair
    meets in exactly one bin, so the join is an equi-join Catalyst
    plans natively and the worst case is bounded by events-per-bin, not
    a per-user cross product."""
    us = F.lit(int(window_s) * 1_000_000)
    # floor(), not double-divide-then-truncate: truncation rounds toward
    # zero, so pre-1970 (negative-epoch) timestamps would land an error
    # and a qualifying click in non-adjacent bins and lose the pair.
    bin_of = lambda col: F.floor(F.unix_micros(col) / us).cast("long")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts"),
        bin_of("ts").alias("bin"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"),
        F.explode(F.array(bin_of("ts"), bin_of("ts") + 1)).alias("bin"),
    )
    cand = errors.join(clicks, on=["user_id", "bin"]).filter(
        (F.col("c_ts") <= F.col("e_ts"))
        & (F.unix_micros("c_ts") > F.unix_micros("e_ts") - us)
    )
    counts = cand.groupBy("event_id").agg(F.count("*").alias("n_clicks"))
    return (
        errors.select("event_id", "user_id", F.col("e_ts").alias("ts"))
        .join(counts, on="event_id", how="left")
        .select(
            "event_id", "user_id", "ts",
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        )
    )


def range_join_counts_sql(window_s: int = RANGE_JOIN_WINDOW_S) -> str:
    return f"""SELECT e.event_id, e.user_id, e.ts,
       COUNT(c.ts) AS n_clicks
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id AND c.ts <= e.ts
 AND epoch_us(c.ts) > epoch_us(e.ts) - {window_s} * 1000000
GROUP BY e.event_id, e.user_id, e.ts"""


# ------------------------------------------------- anomaly detection


ANOMALY_Z = 3.0
ANOMALY_MIN_EVENTS = 10


def value_anomalies(
    events: DataFrame,
    z: float = ANOMALY_Z,
    min_events: int = ANOMALY_MIN_EVENTS,
) -> DataFrame:
    """Per-user z-score outliers: events whose ``value`` exceeds the
    user's mean by more than ``z`` sample standard deviations (users
    with fewer than ``min_events`` events are skipped — no stable
    baseline).

    Plan shape: one groupBy(user_id) for the moment statistics (map-side
    partial aggregation), then a plain equi-join of the user-count-sized
    stats table back onto the stream.  The stats relation is unbounded
    in the data (one row per user, not a fixed dimension table), so no
    broadcast hint: AQE broadcasts it at runtime when it actually fits
    and falls back to a shuffled hash join when it doesn't — the only
    behavior that survives a 100× user-count scale-up."""
    stats = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean_v"),
        F.stddev_samp("value").alias("sd_v"),
    )
    scored = events.join(stats, on="user_id").filter(
        (F.col("n") >= min_events)
        & F.col("sd_v").isNotNull()
        & (F.col("sd_v") > 0)
        & (F.col("value") > F.col("mean_v") + F.lit(z) * F.col("sd_v"))
    )
    return scored.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.round((F.col("value") - F.col("mean_v")) / F.col("sd_v"), 3).alias(
            "zscore"
        ),
    )


def value_anomalies_sql(
    z: float = ANOMALY_Z, min_events: int = ANOMALY_MIN_EVENTS
) -> str:
    return f"""WITH stats AS (
  SELECT user_id, COUNT(*) AS n, AVG(value) AS mean_v,
         stddev_samp(value) AS sd_v
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, e.event_type, e.value,
       round((e.value - s.mean_v) / s.sd_v, 3) AS zscore
FROM events e JOIN stats s ON e.user_id = s.user_id
WHERE s.n >= {min_events} AND s.sd_v IS NOT NULL AND s.sd_v > 0
  AND e.value > s.mean_v + {z} * s.sd_v"""


# --------------------------------------- moving windows / pivot


MOVING_DAYS = 7
VALUE_PPM = 1_000_000


def moving_daily_value(events: DataFrame, days: int = MOVING_DAYS) -> DataFrame:
    """Per-user trailing ``days``-day moving event count and value sum
    over the daily series — the RANGE-frame window operator (frame =
    RANGE BETWEEN days-1 PRECEDING AND CURRENT ROW on the day number).

    Value sums are exact integers (floor(value·1e6) per event, summed)
    so the frame aggregation is order-independent and bit-identical
    across engines — double window sums are NOT (segment-tree vs
    incremental summation order).  One shuffle (user_id), sorted once,
    both window aggregates share the frame."""
    day_num = F.unix_date(F.date_trunc("day", F.col("ts")).cast("date"))
    daily = (
        events.select(
            "user_id",
            day_num.alias("day_num"),
            F.floor(F.col("value") * VALUE_PPM).cast("long").alias("v_ppm"),
        )
        .groupBy("user_id", "day_num")
        .agg(F.count("*").alias("n"), F.sum("v_ppm").alias("sum_ppm"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-(days - 1), 0)
    )
    return daily.select(
        "user_id",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("day_num").cast("int"))
        .cast("string")
        .alias("day"),
        F.sum("n").over(w).alias(f"n_events_{days}d"),
        F.sum("sum_ppm").over(w).alias(f"value_ppm_{days}d"),
    )


def moving_daily_value_sql(days: int = MOVING_DAYS) -> str:
    return f"""WITH daily AS (
  SELECT user_id,
         CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_num,
         COUNT(*) AS n,
         CAST(SUM(CAST(floor(value * {VALUE_PPM}) AS BIGINT)) AS BIGINT) AS sum_ppm
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(DATE '1970-01-01' + CAST(day_num AS INT) AS VARCHAR) AS day,
       CAST(SUM(n) OVER w AS BIGINT) AS n_events_{days}d,
       CAST(SUM(sum_ppm) OVER w AS BIGINT) AS value_ppm_{days}d
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day_num
             RANGE BETWEEN {days - 1} PRECEDING AND CURRENT ROW)"""


EVENT_TYPES = ("view", "click", "purchase", "error")


def events_pivot_by_type(events: DataFrame) -> DataFrame:
    """Per-day event counts pivoted to one column per event type
    (explicit value list so the plan is a single groupBy — no extra
    distinct pass to discover pivot values)."""
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string")
    pivoted = (
        events.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return pivoted.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def events_pivot_by_type_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       {cols}
FROM events GROUP BY 1"""


def distinct_users_sketch(events: DataFrame, rel_tol: float = 0.05) -> DataFrame:
    """Sketch-quality evaluation for approximate distinct counting: the
    HyperLogLog++ estimate (``approx_count_distinct``, the 100 TB path
    where an exact global distinct shuffles every key) must land within
    ``rel_tol`` of the exact count, overall and per event type.

    The sketch value itself is engine-specific, so the emitted columns
    are the exact count plus the pass/fail bit (same pattern as the ANN
    recall@k eval, similarity.knn_ivf_recall) — a sketch drifting out
    of tolerance fails the oracle comparison loudly."""
    per_type = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id").alias("n_approx"),
    )
    return per_type.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= F.lit(rel_tol) * F.col("n_exact")
        ).alias("within_tol"),
    )


def distinct_users_sketch_sql() -> str:
    return """SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS within_tol
FROM events GROUP BY event_type"""


def grouping_sets_census(events: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS census: ((event_type), (day), ()) — the
    three groupings a dashboard wants, in ONE pass (Spark expands the
    sets into a single partial-aggregated shuffle; CUBE/ROLLUP are the
    other members of the family, see daily_rollup / docs_cube_counts).
    grouping_id disambiguates which set each row belongs to."""
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string")
    base = events.select(day.alias("day"), "event_type", "value")
    grouped = base.groupingSets(
        [["event_type"], ["day"], []], "day", "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.grouping_id().alias("gid"),
    )
    return grouped.select(
        F.coalesce(F.col("day"), F.lit("<all>")).alias("day"),
        F.coalesce(F.col("event_type"), F.lit("<all>")).alias("event_type"),
        "n_events",
        "gid",
    )


def grouping_sets_census_sql() -> str:
    # DuckDB's GROUPING(a, b) bit order matches Spark's grouping_id()
    # (leftmost grouping column = most significant bit)
    return """SELECT
       COALESCE(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), '<all>') AS day,
       COALESCE(event_type, '<all>') AS event_type,
       COUNT(*) AS n_events,
       CAST(GROUPING(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), event_type) AS BIGINT) AS gid
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR)), ())"""


WAU_DAYS = 7


def dau_wau(events: DataFrame, window_days: int = WAU_DAYS) -> DataFrame:
    """Daily + trailing-7-day active users (DAU/WAU) — the standard
    engagement pair.  Rolling DISTINCT cannot ride a window frame, so
    WAU uses the banded replication: each (day, user) activity row is
    replicated to the ``window_days`` target days it supports, then one
    distinct count per target day.  Replication factor is the window
    length (bounded, shuffle-friendly) — never a per-day self-join over
    the whole history."""
    day_num = F.unix_date(F.date_trunc("day", F.col("ts")).cast("date"))
    active = (
        events.select(day_num.alias("day_num"), "user_id").distinct()
    )
    dau = active.groupBy("day_num").agg(F.count("*").alias("dau"))
    targets = active.select(
        F.explode(
            F.sequence(F.col("day_num"), F.col("day_num") + (window_days - 1))
        ).alias("day_num"),
        "user_id",
    )
    wau = (
        targets.groupBy("day_num")
        .agg(F.count_distinct("user_id").alias("wau"))
        # only days with actual activity are reported (join with dau)
    )
    return (
        dau.join(wau, on="day_num")
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"), F.col("day_num").cast("int")
            )
            .cast("string")
            .alias("day"),
            "dau",
            "wau",
        )
    )


def dau_wau_sql(window_days: int = WAU_DAYS) -> str:
    return f"""WITH active AS (
  SELECT DISTINCT
         CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day_num,
         user_id
  FROM events
),
dau AS (SELECT day_num, COUNT(*) AS dau FROM active GROUP BY day_num),
targets AS (
  SELECT day_num + d AS day_num, user_id
  FROM active, unnest(generate_series(0, {window_days - 1})) AS g(d)
),
wau AS (SELECT day_num, COUNT(DISTINCT user_id) AS wau FROM targets GROUP BY day_num)
SELECT CAST(DATE '1970-01-01' + CAST(dau.day_num AS INT) AS VARCHAR) AS day,
       dau, wau
FROM dau JOIN wau ON dau.day_num = wau.day_num"""


def hourly_activity_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day activity profile per event type (seasonality census):
    counts and distinct users for each (hour 0-23, event_type) cell."""
    return events.groupBy(
        F.hour("ts").alias("hour_of_day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


def hourly_activity_profile_sql() -> str:
    return """SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type,
       COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2"""


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition census — the empirical Markov
    chain a sequence model / simulator / funnel analysis estimates from
    the event log: count every consecutive (from_type -> to_type) step
    of each user's stream in (event-time, event_id) order and attach the
    per-from_type transition probability as truncated parts-per-million.

    Scale notes (100 TB posture): the lead() window shuffles the events
    ONCE hash-partitioned on user_id and sort-merges within partitions
    (per-user streams are bounded); the census groupBy output is
    |event_types|^2 — broadcast-sized — so the probability window runs
    over the aggregated census only, never the event stream.  The ppm
    probability uses one truncating integer division so the DuckDB
    oracle matches bit-for-bit (double division would be
    summation-order-dependent)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    census = steps.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    tot = Window.partitionBy("from_type")
    return (
        census.withColumn("total", F.sum("n").over(tot))
        .withColumn("prob_ppm", F.expr("(n * 1000000) div total"))
        .select("from_type", "to_type", "n", "prob_ppm")
    )


def event_transitions_sql() -> str:
    """Mirrors the µs truncation for the (ts, event_id) sort ties and
    casts the window SUM back to BIGINT (DuckDB sums to HUGEINT, which
    the driver's arrow-level hash can't represent)."""
    return """WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us, event_type
  FROM events
),
s AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
           AS to_type
  FROM e
),
census AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST((n * 1000000)
            // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
            AS BIGINT) AS prob_ppm
FROM census"""
