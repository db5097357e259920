"""Advanced analytics queries: as-of join, sessionization, cube, percentiles,
promo revenue, multimodal metadata extraction.

These extend the reference's surface with the operators a production event
pipeline reaches for next (SURVEY.md §2.3 'absent join types', §2.7 windows)
— each one still a single declarative plan with one shuffle where one is
unavoidable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_spark.operators.asof import asof_join, sessionize
from data_engineering_project_spark.operators.hints import broadcast_if_small
from data_engineering_project_spark.operators.multimodal import (
    attach_binary_payload,
    chunk_audio,
    decode_image_meta,
    extract_features,
    frame_intensity,
    sample_frames,
)
from data_engineering_project_spark.functions.scalars import (
    decimal_units,
    half_up_div,
    half_up_ratio,
    sql_exact_sum,
    sql_half_up_div,
    sql_half_up_ratio,
)
from data_engineering_project_spark.plans.catalog import register
from data_engineering_project_spark.sources.tables import load_table


@register(
    "events_asof_purchase_click",
    sql="""
    WITH both_sides AS (
        SELECT user_id, ts, event_id, value, event_type,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
        FROM events
        WHERE event_type IN ('click', 'purchase') AND ts IS NOT NULL
    ),
    carried AS (
        SELECT user_id, ts, event_id, value, event_type, side,
               last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w
                   AS click_ts,
               last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w
                   AS click_value
        FROM both_sides
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           click_value
    FROM carried WHERE side = 1
    """,
    doc="As-of join: each purchase matched to the user's most recent "
    "at-or-before click (union + window carry-forward — one shuffle, no "
    "range join; operators/asof.py). Purchases with no prior click keep "
    "NULLs, like a left as-of join.",
    tags=("asof", "window", "join"),
)
def events_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        carry=["value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )


@register(
    "events_sessionization",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min inactivity): lag + cumulative-sum "
    "window, then per-session aggregates. The batch equivalent of streaming "
    "session windows (operators/asof.py:sessionize).",
    tags=("window", "sessionize"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, key="user_id", time_col="ts", gap="30 minutes", order_tie_break="event_id"
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


@register(
    "lineitem_cube",
    sql="""
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) / 100.0, 2)
               AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (absent in reference — SURVEY.md §2.4): all "
    "2^2 grouping combinations in one pass (Expand + single aggregate). "
    "sum_qty rides the integer-unit device (round-10 hostile-numeric "
    "sweep: raw double sums are addition-order-dependent).",
    tags=("agg", "cube"),
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(
            F.sum(decimal_units(F.col("l_quantity"), 100)) / 100, 2
        ).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "orders_price_quantiles",
    sql="""
    SELECT o_orderpriority,
           ROUND(median(CASE WHEN isfinite(o_totalprice)
                             THEN o_totalprice END), 4) AS median_price,
           ROUND(quantile_cont(CASE WHEN isfinite(o_totalprice)
                                    THEN o_totalprice END, 0.9), 4)
               AS p90_price,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact percentiles per group (median + p90, linear interpolation). "
    "At 100 TB swap for approx_percentile and accept the sketch error — "
    "exact percentile requires a per-group sort. The rank universe is "
    "FINITE values only (round-10 hostile-numeric sweep: the engines "
    "disagree on NaN's place in the quantile universe — Spark's "
    "percentile sorts NaN greatest while DuckDB's quantile drops it — so "
    "non-finite inputs are excluded AT THE OPERATOR on both sides, the "
    "NULL-ordering precedent); n still counts every row.",
    tags=("agg", "percentile"),
)
def orders_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = F.col("o_totalprice")
    finite = (
        ~F.isnan(c) & (c != F.lit(float("inf"))) & (c != F.lit(float("-inf")))
    )
    fc = F.when(finite, c)  # percentile/median ignore NULLs on both engines
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median(fc), 4).alias("median_price"),
        F.round(F.percentile(fc, 0.9), 4).alias("p90_price"),
        F.count("*").alias("n"),
    )


_PROMO_SU = """sum(CASE WHEN p.p_type = 'PROMO'
                          THEN ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                          ELSE 0 END)"""


@register(
    "promo_revenue_by_brand",
    sql=f"""
    SELECT p.p_brand,
           {sql_half_up_div(_PROMO_SU, 10000, 2)} AS promo_revenue,
           {sql_exact_sum('l.l_extendedprice * (1 - l.l_discount)', 10000, 2)} AS total_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    GROUP BY p.p_brand
    """,
    doc="TPC-H Q14 shape: fact⋈dimension with conditional revenue split. "
    "part broadcasts below the threshold; the date filter pushes to the "
    "lineitem scan.",
    tags=("tpch", "join", "agg"),
)
def promo_revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # terms snap to integer 1/10000ths pre-sum: order-independent money sums
    # (see functions/scalars.py:exact_decimal_sum)
    rev_units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000, 0
    )
    promo_units = F.when(F.col("p_type") == "PROMO", rev_units).otherwise(F.lit(0))
    return (
        li.filter(
            F.to_date("l_shipdate").between("1996-01-01", "1996-12-31")
        )
        .join(broadcast_if_small(p), p["p_partkey"] == li["l_partkey"])
        .groupBy("p_brand")
        .agg(
            half_up_div(F.sum(promo_units), 10_000, 2).alias("promo_revenue"),
            half_up_div(F.sum(rev_units), 10_000, 2).alias("total_revenue"),
        )
    )


@register(
    "user_distinct_profile",
    sql="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="HyperLogLog profile: approx distinct users per event type, "
    "value-checked. The raw sketch estimate can't hash-match across engines "
    "(different HLL implementations), so the query emits the exact count "
    "AND the error-bound PREDICATE |approx-exact|/exact <= 5% as columns — "
    "the oracle asserts the exact count and that the bound holds (literal "
    "TRUE), so a broken HLL flips the hash. The sketch runs at rsd=0.01, so "
    "the 5% predicate is a ~5-sigma bound — a deterministic margin, not a "
    "1-sigma coin flip (the default rsd=0.05 flipped it at sf0.1). At "
    "100 TB approx_count_distinct is the default; exact countDistinct is "
    "the audit path.",
    tags=("agg", "approx"),
)
def user_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("hll_within_5pct"),
        )
    )


@register(
    "docs_multimodal_meta",
    sql="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(64 + strlen(text) % 577 AS INTEGER) AS width,
           CAST(64 + (strlen(text) * 31) % 577 AS INTEGER) AS height,
           CAST(CASE WHEN text IS NOT NULL THEN 3 END AS INTEGER) AS channels
    FROM documents
    """,
    doc="Multimodal plumbing end-to-end: text → binary payload → "
    "mapInPandas (Arrow-batched) metadata extraction with the deterministic "
    "stand-in codec (operators/multimodal.py; real codecs plug into "
    "_real_decode). The oracle restates the fake decode over byte lengths — "
    "checksums prove the payload bytes crossed the boundary intact.",
    tags=("multimodal", "udf"),
)
def docs_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return decode_image_meta(attach_binary_payload(d))


@register(
    "docs_frame_sampling",
    sql="""
    WITH f AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents),
    frames AS (
        SELECT doc_id, CAST(u.i AS INTEGER) AS frame_idx,
               CAST(u.i * 128 AS INTEGER) AS frame_offset,
               substr(hx, CAST(u.i * 256 + 1 AS BIGINT), 256) AS fhx
        FROM f, LATERAL (SELECT unnest(range(0,
            CASE WHEN n IS NULL THEN 0
                 ELSE GREATEST(CAST(ceil(n / 128.0) AS BIGINT), 1) END)) AS i) u
    )
    SELECT doc_id, frame_idx, frame_offset,
           CAST(strlen(fhx) // 2 AS INTEGER) AS frame_len,
           md5(fhx) AS frame_checksum
    FROM frames WHERE frame_idx % 2 = 0
    """,
    doc="Video-style frame sampling: binary payload → fixed 128-byte frames, "
    "every 2nd kept, one row per sampled frame via mapInPandas (the 1→N "
    "flat-map multimodal shape; operators/multimodal.py:sample_frames). The "
    "oracle restates the byte slicing with substr + generate_series — valid "
    "because the corpus is ASCII, so byte and char offsets coincide; the "
    "per-frame MD5s prove the sliced bytes crossed the Arrow boundary intact.",
    tags=("multimodal", "udf"),
)
def docs_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(d), frame_bytes=128, stride=2)


@register(
    "docs_payload_features",
    sql="""
    WITH p AS (SELECT doc_id, text,
                      GREATEST(octet_length(encode(text)), 1) AS n
               FROM documents)
    SELECT doc_id,
           ROUND(length(regexp_replace(translate(text, 'AEIOU', 'aeiou'),
                                       '[^aeiou]', '', 'g'))
                 / CAST(n AS DOUBLE), 6) AS vowel_ratio,
           ROUND(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 / CAST(n AS DOUBLE), 6) AS digit_ratio,
           ROUND(length(regexp_replace(text, '[^ ]', '', 'g'))
                 / CAST(n AS DOUBLE), 6) AS space_ratio,
           ROUND(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                 / CAST(n AS DOUBLE), 6) AS upper_ratio
    FROM p
    """,
    doc="Multimodal feature extraction: payload → fixed-dim double vector "
    "(byte-class frequency ratios as the deterministic stand-in featurizer; "
    "a CLIP/MFCC model slots into the same mapInPandas contract — "
    "operators/multimodal.py:extract_features). Ratios are exact integer "
    "divisions so both engines produce identical doubles.",
    tags=("multimodal", "udf", "features"),
)
def docs_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(d))
    return feats.select(
        "doc_id",
        *[
            F.round(F.element_at("features", i + 1), 6).alias(name)
            for i, name in enumerate(
                ("vowel_ratio", "digit_ratio", "space_ratio", "upper_ratio")
            )
        ],
    )


@register(
    "docs_payload_resize",
    sql="""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n,
               GREATEST(1, CAST(ceil(octet_length(encode(text)) / 96.0)
                                AS BIGINT)) AS stride
        FROM documents
    ),
    r AS (
        SELECT doc_id, n,
               CASE WHEN n IS NULL THEN NULL
                    ELSE COALESCE(array_to_string(list_transform(
                        range(0, CAST(ceil(n * 1.0 / stride) AS BIGINT)),
                        i -> substr(hx, CAST(i * stride * 2 + 1 AS BIGINT), 2)),
                        ''), '')
               END AS rhx
        FROM p
    )
    SELECT doc_id, CAST(n AS BIGINT) AS orig_bytes,
           CAST(strlen(rhx) // 2 AS BIGINT) AS resized_bytes,
           md5(rhx) AS resized_checksum
    FROM r
    """,
    doc="Multimodal resize plumbing: strided byte downsampling to ≤96 bytes "
    "— the nearest-neighbor-downsample access pattern — via mapInPandas "
    "(operators/multimodal.py:resize_payload; a real image codec slots into "
    "the same contract). Checksums of the resampled bytes hash-match the "
    "oracle's restatement of the stride arithmetic (ASCII corpus ⇒ byte "
    "and char indexing coincide).",
    tags=("multimodal", "udf", "resize"),
)
def docs_payload_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.operators.multimodal import resize_payload

    d = load_table(spark, sf_dir, "documents")
    return resize_payload(attach_binary_payload(d), target_bytes=96)


@register(
    "docs_audio_chunks",
    sql="""
    WITH f AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents),
    chunks AS (
        SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_idx,
               substr(hx, CAST(u.i * 64 + 1 AS BIGINT), 128) AS chx
        FROM f, LATERAL (SELECT unnest(range(0, CAST(ceil(n / 32.0) AS BIGINT))) AS i) u
    )
    SELECT doc_id, chunk_idx,
           CAST(chunk_idx * 2 AS INTEGER) AS start_ms,
           CAST(strlen(chx) // 4 AS INTEGER) AS n_samples,
           md5(chx) AS chunk_checksum
    FROM chunks
    """,
    doc="Audio-style fixed-rate chunking with 50% overlap: payload read as "
    "8 kHz/16-bit PCM, 4 ms windows every 2 ms hop → 64-byte windows every "
    "32 bytes, one row per window via mapInPandas "
    "(operators/multimodal.py:chunk_audio). Unlike frame sampling this is "
    "TIME-addressed and overlapping — the STFT front-end shape. The oracle "
    "restates the byte windows with substr (ASCII corpus ⇒ byte==char "
    "offsets); per-window MD5s prove the exact overlapping ranges crossed "
    "the Arrow boundary intact.",
    tags=("multimodal", "udf"),
)
def docs_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return chunk_audio(attach_binary_payload(d))


@register(
    "lineitem_unpivot_measures",
    sql="""
    WITH long AS (
        SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure, count(*) AS n,
           ROUND(min(val), 4) AS min_val, ROUND(max(val), 4) AS max_val,
           ROUND(SUM(ROUND(val * 100, 0)) / 100, 2) AS sum_val
    FROM long GROUP BY measure
    """,
    doc="UNPIVOT/melt (wide → long) — the inverse of the pivot the catalog "
    "already ships (events_daily_type_pivot): three measure columns unpivot "
    "into (measure, val) rows via Spark's native unpivot (Expand node — "
    "map-side row generation, no join), then per-measure profiling. Sums "
    "snap to integer cents first (order-independent across partitions, "
    "ROADMAP invariant).",
    tags=("reshape", "unpivot", "agg"),
)
def lineitem_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [], ["l_quantity", "l_discount", "l_tax"], "measure", "val"
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.round(F.min("val"), 4).alias("min_val"),
        F.round(F.max("val"), 4).alias("max_val"),
        F.round(F.sum(decimal_units(F.col("val"), 100)) / 100, 2).alias("sum_val"),
    )


@register(
    "orders_decile_stats",
    sql="""
    WITH ranked AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT CAST(decile AS INT) AS decile, count(*) AS n,
           ROUND(min(o_totalprice), 2) AS lo, ROUND(max(o_totalprice), 2) AS hi
    FROM ranked GROUP BY decile
    """,
    doc="ntile decile profiling — the distribution-bucketing window shape "
    "(complements median/percentile in orders_price_quantiles). The rank "
    "is the two-pass range-partitioned prefix scan (operators/prefix.py, "
    "sampled splits — o_totalprice is a skewed double) — parallel across "
    "value buckets, never a single-reducer ORDER BY window over the "
    "data-scaled orders table — and ntile's exact front-loaded-remainder "
    "bucket rule is restated arithmetically from (rank, n): the first "
    "n%10 buckets get ceil(n/10) rows. o_orderkey tie-break makes bucket "
    "edges deterministic. For approximate bins at extreme scale, "
    "percentile_approx bucket edges remain the cheaper alternative.",
    tags=("window", "agg"),
)
def orders_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    from data_engineering_project_spark.operators.prefix import (
        partitioned_cumsum,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()  # null-fuzz: rank/window measures must be non-null
    )
    base = o.select("o_totalprice", "o_orderkey").persist(
        StorageLevel.MEMORY_AND_DISK
    )  # 3 consumers: split sampling, scan, n
    # rank = two-pass prefix scan of 1 over the (price, orderkey) total
    # order; n rides a 1-row broadcast instead of a count() OVER () window
    ranked = partitioned_cumsum(
        base.withColumn("_one", F.lit(1)),
        order_col="o_totalprice",
        value_col="_one",
        tie_col="o_orderkey",
        out_col="rn",
        split_strategy="sampled",
    ).crossJoin(F.broadcast(base.agg(F.count("*").alias("n"))))
    # exact ntile(10): with q = n div 10 and r = n % 10, the first r
    # buckets hold q+1 rows and the rest hold q (the else branch is
    # unreachable when q = 0, so its div-by-zero never evaluates)
    decile = F.expr(
        """CAST(CASE
             WHEN rn <= (n % 10) * ((n div 10) + 1)
             THEN (rn - 1) div ((n div 10) + 1) + 1
             ELSE (n % 10)
                  + (rn - (n % 10) * ((n div 10) + 1) - 1) div (n div 10)
                  + 1
           END AS INT)"""
    )
    return (
        ranked.select("o_totalprice", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


_ROLL30_SU = """SUM(ROUND(o_totalprice * 1000, 0)) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)"""


@register(
    "orders_rolling_30d_revenue",
    sql=f"""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           {sql_half_up_div(_ROLL30_SU, 1000, 2)}
               AS revenue_30d
    FROM orders
    """,
    doc="Time-RANGE window frame (29 days preceding .. current row): rolling "
    "30-day revenue per customer. The order key is integer days-since-epoch "
    "on BOTH sides so Spark's numeric rangeBetween and the oracle agree "
    "exactly; peers (same-day orders) are included by value, so no "
    "tie-break is needed. Money sums snap to integer milli-units pre-sum "
    "(repo invariant). One shuffle on the partition key; frames never "
    "cross partitions, so the plan scales like any windowed scan.",
    tags=("window", "timeseries"),
)
def orders_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01")))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        half_up_div(
            F.sum(decimal_units(F.col("o_totalprice"), 1000)).over(w), 1000, 2
        ).alias("revenue_30d"),
    )


@register(
    "orders_grouping_sets",
    sql=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_exact_sum('o_totalprice', 1000, 2)} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
    doc="Explicit GROUPING SETS (beyond cube/rollup, SURVEY.md §2.4): three "
    "chosen aggregation levels in ONE pass with grouping_id() "
    "disambiguating NULL-as-grouped from NULL-in-data. Spark expands sets "
    "into a single shuffle — cheaper than unioning three groupBys, which "
    "would triple the scan at 100 TB.",
    tags=("agg", "groupingsets"),
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.functions import scalars as S

    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], ["o_orderstatus", "o_orderpriority"]],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n_orders"),
        S.exact_decimal_sum(F.col("o_totalprice"), 1000).alias("revenue"),
    )


@register(
    "docs_scene_change",
    sql="""
    WITH f AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n
               FROM documents),
    frames AS (
        SELECT doc_id, CAST(u.i AS INTEGER) AS frame_idx,
               substr(hx, CAST(u.i * 256 + 1 AS BIGINT), 256) AS fhx
        FROM f, LATERAL (SELECT unnest(range(0,
            CASE WHEN n IS NULL THEN 0
                 ELSE GREATEST(CAST(ceil(n / 128.0) AS BIGINT), 1) END))
                         AS i) u
    ),
    inten AS (
        SELECT doc_id, frame_idx,
               COALESCE(list_aggregate(list_transform(
                   range(0, strlen(fhx) // 2),
                   j -> CAST('0x' || substr(fhx, CAST(2 * j + 1 AS BIGINT), 2)
                             AS INTEGER)), 'sum'), 0)
               / CAST(GREATEST(strlen(fhx) // 2, 1) AS DOUBLE) AS intensity
        FROM frames
    ),
    jumps AS (
        SELECT doc_id, frame_idx, intensity,
               COALESCE(abs(intensity - lag(intensity) OVER (
                   PARTITION BY doc_id ORDER BY frame_idx)), 0.0) AS scene_jump
        FROM inten
    )
    SELECT doc_id, frame_idx, intensity, scene_jump
    FROM jumps WHERE frame_idx = 0 OR scene_jump >= 4.0
    """,
    doc="Video scene-cut detection over the frame model: per-frame mean byte "
    "value ('luminance' proxy, numpy-vectorized in mapInPandas — "
    "operators/multimodal.py:frame_intensity), then a lag window per doc "
    "flags frames whose intensity jumps >= 4.0 from the previous frame "
    "(plus frame 0, every video's first keyframe). The temporal-video "
    "shape: decode 1→N, then ORDER BY frame within doc — one narrow "
    "shuffle on doc_id. Intensities are integer-sum / length divisions, "
    "bit-identical across engines, so the oracle matches exactly with no "
    "rounding.",
    tags=("multimodal", "udf", "window"),
)
def docs_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    frames = frame_intensity(attach_binary_payload(d))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    jump = F.coalesce(
        F.abs(F.col("intensity") - F.lag("intensity").over(w)), F.lit(0.0)
    )
    return (
        frames.select(
            "doc_id", "frame_idx", "intensity", jump.alias("scene_jump")
        )
        .where((F.col("frame_idx") == 0) | (F.col("scene_jump") >= 4.0))
    )


@register(
    "events_ab_conversion_z",
    sql=f"""
    WITH assign AS (
        SELECT user_id, user_id % 2 AS arm,
               max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
        FROM assign
    )
    SELECT n0, c0, n1, c1,
           {sql_half_up_ratio('c0', 'n0', 6)} AS rate0,
           {sql_half_up_ratio('c1', 'n1', 6)} AS rate1,
           CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1
                THEN NULL
                ELSE ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                     / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                            * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                            * (1.0 / n0 + 1.0 / n1)),
                     4) END AS z
    FROM arms
    """,
    doc="Two-proportion z-test for an A/B experiment: users hash-assigned "
    "to arms (user_id parity — deterministic, the production analog is a "
    "salted hash), per-user conversion = any purchase with value > 150, "
    "pooled "
    "standard error. Shapes: one user-level aggregate (map-side "
    "combinable max) then a single scalar row — no window, no join. All "
    "inputs to the z formula are exact integers, so the closed-form "
    "double matches the oracle bit-for-bit.",
    tags=("analytics", "experiment", "aggregate"),
)
def events_ab_conversion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 150)
            ).cast("int")
        ).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = assign.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0).cast("long")).alias("c0"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0).cast("long")).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    degenerate = (
        (F.col("n0") == 0)
        | (F.col("n1") == 0)
        | (F.col("c0") + F.col("c1") == 0)
        | (F.col("c0") + F.col("c1") == F.col("n0") + F.col("n1"))
    )
    z = F.when(degenerate, F.lit(None).cast("double")).otherwise(
        F.round(
            (p0 - p1)
            / F.sqrt(
                pooled
                * (1.0 - pooled)
                * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
            ),
            4,
        )
    )
    return arms.select(
        "n0",
        "c0",
        "n1",
        "c1",
        half_up_ratio(F.col("c0"), F.col("n0"), 6).alias("rate0"),
        half_up_ratio(F.col("c1"), F.col("n1"), 6).alias("rate1"),
        z.alias("z"),
    )


@register(
    "orders_yoy_growth",
    sql="""
    WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(sum(CAST(floor(o_totalprice * 1000 + 0.5) AS BIGINT))
                    AS BIGINT) AS units
        FROM orders
        WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        GROUP BY month
    ),
    laged AS (
        SELECT month, units,
               lag(units, 12) OVER (ORDER BY month) AS prev_units
        FROM monthly
    )
    SELECT month,
           ROUND(units / 1000.0, 3) AS revenue,
           ROUND(prev_units / 1000.0, 3) AS prev_revenue,
           CAST(floor((units - prev_units) * 10000.0 / prev_units + 0.5)
                AS BIGINT) AS yoy_growth_bp
    FROM laged WHERE prev_units IS NOT NULL
    """,
    doc="Year-over-year monthly revenue growth: exact integer-unit monthly "
    "sums, a lag(12) self-alignment over the POST-AGGREGATION month "
    "series (a bounded few-hundred-row frame — the unpartitioned window "
    "is not a scale risk), growth in basis points via the portable "
    "floor(x+0.5) round. ROUND at 3 dp = the exact decimal width of the "
    "1/1000-unit sums, so the rendering is lossless on every engine.",
    tags=("analytics", "window", "trend"),
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()  # null-fuzz: rank/window measures must be non-null
    )
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(decimal_units(F.col("o_totalprice"), 1000)).alias("units"))
    lagged = monthly.select(
        "month",
        "units",
        F.lag("units", 12).over(Window.orderBy("month")).alias("prev_units"),
    )
    return lagged.filter(F.col("prev_units").isNotNull()).select(
        "month",
        F.round(F.col("units") / 1000.0, 3).alias("revenue"),
        F.round(F.col("prev_units") / 1000.0, 3).alias("prev_revenue"),
        F.floor(
            (F.col("units") - F.col("prev_units"))
            * 10000.0
            / F.col("prev_units")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("yoy_growth_bp"),
    )


@register(
    "events_session_paths",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
        FROM marked
    ),
    paths AS (
        SELECT user_id, session_id,
               array_to_string(
                   list_slice(list(coalesce(event_type, '')
                                   ORDER BY ts, event_id), 1, 3),
                   '>') AS journey
        FROM sess GROUP BY user_id, session_id
    )
    SELECT journey, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY journey
    """,
    doc="Session journey analysis: the first three event types of every "
    "30-min-gap session, concatenated as a path signature, counted "
    "globally — the 'how do sessions begin' complement of the Markov "
    "matrix (which forgets position) and the funnel (which fixes the "
    "path in advance). Sessionization is the shared lag+cumsum window "
    "(operators/asof.py:sessionize, event_id tie-break); the per-session "
    "path is a sorted-struct fold, NOT a second ordered window; the "
    "journey vocabulary is at most |types|^3 rows.",
    tags=("behavior", "sessionize", "window"),
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, key="user_id", time_col="ts", gap="30 minutes",
        order_tie_break="event_id",
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            # NULL types coalesce to '' BEFORE the join:
                            # array_join drops NULL elements entirely while
                            # the oracle's array_to_string keeps a slot —
                            # journeys would shorten (null-fuzz finding)
                            F.struct(
                                "ts",
                                "event_id",
                                F.coalesce(F.col("event_type"), F.lit("")).alias(
                                    "event_type"
                                ),
                            )
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                1,
                3,
            ),
            ">",
        ).alias("journey")
    )
    return paths.groupBy("journey").agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )


@register(
    "parts_abc_classification",
    sql="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS units
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, units,
               sum(units) OVER (ORDER BY units DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_units,
               sum(units) OVER () AS tot_units
        FROM rev
    ),
    classed AS (
        SELECT CASE WHEN cum_units * 10 <= tot_units * 8 THEN 'A'
                    WHEN cum_units * 100 <= tot_units * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               units
        FROM ranked
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           ROUND(sum(units) / 100.0, 2) AS revenue
    FROM classed GROUP BY abc_class
    """,
    doc="ABC inventory classification: parts ranked by revenue, cumulative "
    "share thresholds 80/95% — the contribution-analysis operator behind "
    "'which 20% of SKUs carry 80% of revenue'. Threshold tests are pure "
    "integer comparisons (cum*10 <= tot*8), so no floating-point share "
    "ever exists to disagree across engines. The cumulative revenue runs "
    "on the POST-AGGREGATION part ledger (|parts| rows, not line items) "
    "via the two-pass range-partitioned prefix scan "
    "(operators/prefix.py) — parallel across buckets, no single-reducer "
    "global window even at hundreds of millions of SKUs.",
    tags=("analytics", "window", "classification"),
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_project_spark.operators.prefix import (
        partitioned_cumsum,
    )

    from pyspark.storagelevel import StorageLevel

    li = load_table(spark, sf_dir, "lineitem")
    # persist the per-part ledger: the prefix scan's bounds + bucketed
    # passes and the grand-total aggregate would otherwise each replay
    # the full lineitem scan (three fact scans at 100 TB)
    rev = li.groupBy("l_partkey").agg(
        F.sum(decimal_units(F.col("l_extendedprice"), 100))
        .cast("bigint")
        .alias("units")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # two-pass parallel prefix scan (operators/prefix.py), NOT a global
    # ordered window: the part ledger scales with the DIMENSION (hundreds
    # of millions of SKUs at 100 TB) and the single-reducer window would
    # route all of it through one task (r12: same migration as the
    # weighted median's ratified shape). Descending revenue order =
    # ascending on the negated key; partkey breaks ties exactly like the
    # old (DESC units, ASC partkey) frame. Total is a 1-row broadcast.
    cum = partitioned_cumsum(
        rev.withColumn("_negu", -F.col("units")),
        order_col="_negu",
        value_col="units",
        tie_col="l_partkey",
        out_col="cum_units",
    )
    tot = rev.agg(F.sum("units").alias("tot_units"))
    ranked = cum.crossJoin(F.broadcast(tot)).select(
        "units", "cum_units", "tot_units"
    )
    classed = ranked.select(
        F.when(
            F.col("cum_units") * 10 <= F.col("tot_units") * 8, F.lit("A")
        )
        .when(
            F.col("cum_units") * 100 <= F.col("tot_units") * 95, F.lit("B")
        )
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "units",
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.round(F.sum("units") / 100.0, 2).alias("revenue"),
    )


@register(
    "events_value_mad",
    sql="""
    WITH u AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS units
        FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, units,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY units) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM u
    ),
    med AS (
        SELECT event_type,
               sum(units) / count(*) / 100.0 AS median_value
        FROM ranked
        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        GROUP BY event_type
    ),
    dev AS (
        SELECT u.event_type,
               abs(u.units - CAST(floor(m.median_value * 100 + 0.5)
                                  AS BIGINT)) AS adev,
               row_number() OVER (PARTITION BY u.event_type
                                  ORDER BY abs(u.units -
                                      CAST(floor(m.median_value * 100 + 0.5)
                                           AS BIGINT)), u.units) AS rn,
               count(*) OVER (PARTITION BY u.event_type) AS n
        FROM u JOIN med m ON u.event_type = m.event_type
    )
    SELECT d.event_type,
           ROUND(m.median_value, 3) AS median_value,
           ROUND(sum(d.adev) / count(*) / 100.0, 3) AS mad
    FROM dev d JOIN med m ON d.event_type = m.event_type
    WHERE d.rn IN ((d.n + 1) // 2, (d.n + 2) // 2)
    GROUP BY d.event_type, m.median_value
    """,
    doc="Robust statistics: EXACT per-group median and median absolute "
    "deviation — the outlier-resistant location/scale pair behind robust "
    "z-scores (the daily-anomaly query's mean/std break down under heavy "
    "tails). Both medians are restated identically on both engines as "
    "row_number selections over integer cent units (lower/upper middle "
    "averaged via sum/count — never an engine median() builtin, whose "
    "interpolation rules differ), with a units tie-break on the "
    "deviation rank. Each pass is one keyed window over hash-partitioned "
    "groups; no global sort.",
    tags=("analytics", "robust", "window"),
)
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    u = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("units"),
    )
    wt = Window.partitionBy("event_type")
    ranked = u.select(
        "event_type",
        "units",
        F.row_number().over(wt.orderBy("units")).alias("rn"),
        F.count("*").over(wt).alias("n"),
    )
    def is_middle(rn, n):
        return (rn == F.floor((n + 1) / 2).cast("long")) | (
            rn == F.floor((n + 2) / 2).cast("long")
        )

    med = (
        ranked.filter(is_middle(F.col("rn"), F.col("n")))
        .groupBy("event_type")
        .agg(
            (F.sum("units") / F.count("*") / 100.0).alias("median_value")
        )
    )
    med_units = F.floor(F.col("median_value") * 100 + F.lit(0.5)).cast(
        "bigint"
    )
    dev = u.join(F.broadcast(med), "event_type").select(
        "event_type",
        "median_value",
        F.abs(F.col("units") - med_units).alias("adev"),
        "units",
    )
    ranked2 = dev.select(
        "event_type",
        "median_value",
        "adev",
        F.row_number()
        .over(wt.orderBy("adev", "units"))
        .alias("rn"),
        F.count("*").over(wt).alias("n"),
    )
    return (
        ranked2.filter(is_middle(F.col("rn"), F.col("n")))
        .groupBy("event_type", "median_value")
        .agg(
            (F.sum("adev") / F.count("*") / 100.0).alias("mad_raw")
        )
        .select(
            "event_type",
            F.round("median_value", 3).alias("median_value"),
            F.round("mad_raw", 3).alias("mad"),
        )
    )


@register(
    "events_session_concurrency",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS session_id
        FROM marked
    ),
    bounds AS (
        SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
        FROM sess GROUP BY 1, 2
    ),
    deltas AS (
        SELECT s AS t, 1 AS d FROM bounds
        UNION ALL
        SELECT e AS t, -1 AS d FROM bounds
    ),
    agg AS (
        SELECT t, d, CAST(sum(d) AS BIGINT) AS dd FROM deltas GROUP BY t, d
    ),
    run AS (
        SELECT t,
               sum(dd) OVER (ORDER BY t, d DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS c
        FROM agg
    ),
    daily_max AS (
        SELECT CAST(t AS DATE) AS day, CAST(max(c) AS BIGINT) AS max_concurrent
        FROM run GROUP BY 1
    ),
    daily_starts AS (
        SELECT CAST(t AS DATE) AS day, CAST(sum(dd) AS BIGINT) AS n_started
        FROM agg WHERE d = 1 GROUP BY 1
    )
    SELECT m.day, m.max_concurrent, COALESCE(st.n_started, 0) AS n_started
    FROM daily_max m LEFT JOIN daily_starts st ON st.day = m.day
    """,
    doc="Peak concurrent sessions per day — the capacity-planning sweep "
    "line: each 30-min-gap session (same definition as "
    "`events_sessionization`) contributes +1 at its start and -1 at its "
    "end, and the running sum over boundary timestamps is the live "
    "concurrency. Starts order before ends at equal timestamps (d DESC), "
    "so touching sessions count as overlapping — the max-overlap "
    "convention. Boundaries collapse to the grouped (t, d) table first, "
    "but that table scales ~2×|sessions| (raw event timestamps, not a "
    "saturating cell grid), so the running sum is the two-pass "
    "range-partitioned prefix scan (operators/prefix.py, sampled splits "
    "over the timestamp key) — parallel across time buckets, never a "
    "single-reducer ORDER BY window. All counts are exact integers.",
    tags=("window", "sessionize", "sweep-line"),
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, key="user_id", time_col="ts", gap="30 minutes",
        order_tie_break="event_id",
    )
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    # a UNION of two selects over `bounds` would re-execute the whole
    # sessionization subtree per branch (two fact scans); exploding a
    # 2-element array emits both boundary deltas from ONE pass
    deltas = bounds.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("d")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("x")
    ).select(F.col("x.t").alias("t"), F.col("x.d").alias("d"))
    # both daily outputs read this grouped boundary table (distinct
    # timestamps, saturating like the KS cell table); the persist keeps
    # the sessionization subtree to ONE execution
    agg = (
        deltas.groupBy("t", "d")
        .agg(F.sum("d").cast("bigint").alias("dd"))
        .persist()
    )
    from data_engineering_project_spark.operators.prefix import (
        partitioned_cumsum,
    )

    # sweep order is (t ASC, d DESC) — starts before ends at equal t; the
    # prefix scan orders [order_col, tie_col] ascending, so negate d.
    # (t, d) is unique post-groupBy, making (t, -d) the required total
    # order; equal-t rows always share a bucket (splits are on t alone).
    run = partitioned_cumsum(
        agg.withColumn("_tb", -F.col("d")),
        order_col="t",
        value_col="dd",
        tie_col="_tb",
        out_col="c",
        split_strategy="sampled",
    ).select("t", "c")
    daily_max = run.groupBy(F.to_date("t").alias("day")).agg(
        F.max("c").cast("bigint").alias("max_concurrent")
    )
    daily_starts = (
        agg.filter(F.col("d") == 1)
        .groupBy(F.to_date("t").alias("day"))
        .agg(F.sum("dd").cast("bigint").alias("n_started"))
    )
    return daily_max.join(daily_starts, "day", "left").select(
        "day",
        "max_concurrent",
        F.coalesce(F.col("n_started"), F.lit(0)).cast("bigint").alias(
            "n_started"
        ),
    )
