"""Time-hierarchy rollups and membership sketches — the last two custom-
operator families from the brief (hypertable-style continuous aggregates;
Bloom filters as the join-pruning sketch)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


@register(
    "hypertable_time_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP), event_type)
    """,
    doc="Hypertable-style continuous aggregate: time-bucketed rollup with "
    "hierarchical subtotals (per day+type, per day, grand total) in one "
    "expand+aggregate pass — the materialized-rollup shape a time-series "
    "store would maintain incrementally (streaming shape: window() + "
    "foreachBatch upsert, streaming/ops.py).",
)
def hypertable_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket_day", F.date_trunc("day", "ts")
    )
    return ev.rollup("bucket_day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


BLOOM_BITS = 1 << 16
BLOOM_HASHES = 5


def _lanes(key_col) -> F.Column:
    return F.array(
        *[
            F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(BLOOM_BITS))
            for seed in range(BLOOM_HASHES)
        ]
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """The filter as a DataFrame of distinct set-bit positions: k xxhash64
    lanes per key, positions mod m. (Spark's internal bloom_filter_agg is
    not SQL-exposed; this is the same structure from first-principles
    DataFrame ops — at scale, pack positions into a long[] bitmap.)"""
    return keys.select(F.explode(_lanes(F.col(key_col))).alias("bit")).distinct()


def bloom_probe(probe: DataFrame, key_col: str, id_col: str, bits: DataFrame) -> DataFrame:
    """Adds ``maybe`` per probe row: True iff every hash lane's bit is set —
    no false negatives by construction; false positives bounded by
    (1-e^{-kn/m})^k.

    Probe = explode lanes -> broadcast equi-join against the bit set ->
    count matched lanes per row. A per-row array_contains scan over the bit
    set is O(|bits|) per lane (measured 40 s vs 1 s at sf0.1); the hash join
    is O(1) per lane."""
    pos = probe.select(id_col, F.explode(_lanes(F.col(key_col))).alias("bit"))
    hits = (
        pos.join(F.broadcast(bits), "bit")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__lane_hits"))
    )
    return (
        probe.join(hits, id_col, "left")
        .withColumn("maybe", F.coalesce(F.col("__lane_hits"), F.lit(0)) == BLOOM_HASHES)
        .drop("__lane_hits")
    )


@register(
    "sketch_bloom_filter",
    None,  # bloom bit patterns are hash-lane-specific — rows-only; the
    # no-false-negative guarantee is asserted in tests/test_sketches.py
    doc="Bloom-filter membership sketch built from first-principles "
    "DataFrame ops (k xxhash64 lanes -> bit set -> broadcast probe): the "
    "semi-join pruning sketch — ship the KB-sized filter instead of "
    "shuffling the fact table.",
    quality_test="tests/test_sketches.py::test_bloom_no_false_negatives",
)
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    bf = bloom_build(c.filter(F.col("c_mktsegment") == "BUILDING"), "c_custkey")
    probed = bloom_probe(o, "o_custkey", "o_orderkey", bf)
    return probed.agg(
        F.sum(F.col("maybe").cast("bigint")).cast("bigint").alias("n_maybe"),
        F.count(F.lit(1)).alias("n_probed"),
    )


@register(
    "sketch_hll_partitioned",
    None,  # HLL register contents are implementation-specific — rows-only;
    # the <=5% relative-error bound is asserted in tests/test_sketches.py
    doc="Mergeable HLL distinct-count maintenance — the incremental pattern "
    "exact COUNT(DISTINCT) cannot do: one HLL sketch per day (hll_sketch_agg, "
    "map-side mergeable), then weekly distincts by UNIONING the daily "
    "sketches (hll_union_agg) — never re-touching the event log. At 100 TB "
    "this is the difference between re-scanning history per report and "
    "merging KB-sized sketches: daily sketches persist as a tiny state "
    "table, any rollup window (week, month, trailing-28d) is a merge over "
    "it. Estimate error is ~1.6% at the default lgConfigK=12.",
    tags=("sketch",),
    quality_test="tests/test_sketches.py::test_hll_weekly_union_within_error_bound",
)
def sketch_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week")
    ).agg(F.hll_union_agg("sk").alias("wsk"), F.count("*").alias("n_days"))
    return weekly.select(
        "week",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.hll_sketch_estimate("wsk").cast("bigint").alias("est_weekly_users"),
    )


@register(
    "corpus_decontaminate_bloom",
    None,  # bloom bit lanes are xxhash64-specific — rows-only; the
    # no-false-negative guarantee vs exact corpus_decontaminate is
    # asserted in tests/test_sketches.py
    doc="Sketch-tier eval decontamination — corpus_decontaminate at eval "
    "scales where broadcasting the shingle universe stops being free: the "
    "eval set compresses into a FIXED-size bloom bit set (m = 64Ki bits "
    "regardless of eval size — the broadcast is bounded by the sketch, "
    "not the data), train shingles probe it via the lane hash-join, and "
    "flagged docs roll up per doc_id. Supersets the exact flags by "
    "construction (no false negatives; false positives bounded by the "
    "bloom formula) — run the exact tier on the flagged subset to "
    "confirm, paying the shingle join only on candidates.",
    tags=("llm", "curation", "sketch"),
    quality_test="tests/test_sketches.py::test_bloom_decontaminate_supersets_exact",
)
def corpus_decontaminate_bloom_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import spread, word_shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    ev_sh = eval_df.select(
        F.explode(word_shingles(F.col("text"), 8)).alias("shingle")
    ).distinct()
    bits = bloom_build(ev_sh, "shingle")
    # deterministic per-row key: (doc_id, shingle) is unique because
    # word_shingles dedups within a doc. (monotonically_increasing_id is
    # NOT usable here: bloom_probe evaluates its input twice, and the id
    # assignment differs across evaluations after spread()'s round-robin.)
    tr_sh = spread(train).select(
        "doc_id", F.explode(word_shingles(F.col("text"), 8)).alias("shingle")
    ).withColumn("__row", F.concat_ws("\x00", F.col("doc_id"), F.col("shingle")))
    probed = bloom_probe(tr_sh, "shingle", "__row", bits)
    hits = (
        probed.groupBy("doc_id")
        .agg(F.sum(F.col("maybe").cast("bigint")).alias("n_maybe_hits"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_maybe_hits", F.lit(0)).cast("bigint").alias("n_maybe_hits"),
            (F.coalesce("n_maybe_hits", F.lit(0)) >= 1).alias("contaminated_maybe"),
        )
    )


MG_COUNTERS = 512  # >= the 1/threshold of 200 the query uses, with margin
HH_FRACTION = 200  # report terms with frequency > n/HH_FRACTION


def misra_gries_candidates(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: a candidate superset
    of every term with global frequency > n/(MG_COUNTERS+1).

    The guarantee survives partitioning by pigeonhole: a globally heavy
    term must be locally heavy in at least one partition, and each
    partition's MG (k counters, weighted decrements) retains all locally
    heavy terms. State is k counters per partition — fixed memory no
    matter how large the stream; the union that crosses the wire is
    <= k * partitions rows. Batches are pre-aggregated with value_counts
    so the Python loop runs per DISTINCT term, not per token.
    """
    import pandas as pd_  # noqa: N813 (closure-local to keep Arrow happy)

    from pyspark.sql.types import StringType, StructField, StructType

    k = MG_COUNTERS
    schema = StructType([StructField("cand", StringType())])

    def _mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf[tok_col].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
                if len(counters) > k:
                    m = min(counters.values())
                    counters = {
                        key: v - m for key, v in counters.items() if v - m > 0
                    }
        yield pd_.DataFrame({"cand": list(counters.keys())})

    return tokens.mapInPandas(_mg, schema)


@register(
    "sketch_heavy_hitters",
    r"""
    WITH toks AS (
      SELECT unnest(string_split(
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    n AS (SELECT COUNT(*) AS total FROM toks)
    SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM toks CROSS JOIN n
    GROUP BY tok, n.total
    HAVING COUNT(*) > n.total / 200.0
    """,
    doc="Heavy hitters with an EXACT answer at sketch cost: per-partition "
    "Misra-Gries summaries (512 fixed counters, weighted decrements) give "
    "a guaranteed candidate superset of every term above n/200; the "
    "candidates (<= 512 x partitions rows, broadcast) are then exactly "
    "counted in one semi-joined scan and thresholded. Unlike top-k-by-"
    "count (a full vocabulary shuffle), the data-sized exchange here "
    "carries only candidate terms — yet the output is deterministic and "
    "fully value-oracled, because MG's superset guarantee makes the "
    "rescore exact, not approximate.",
    tags=("sketch", "llm"),
)
def sketch_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import spread

    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = (
        spread(docs)
        .filter(F.length(F.trim("text")) > 0)
        .select(
            F.explode(
                F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
            ).alias("tok")
        )
    )
    cand = misra_gries_candidates(toks).distinct()
    n = toks.select(F.count(F.lit(1)).alias("total"))
    return (
        toks.join(F.broadcast(cand), toks.tok == cand.cand, "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(n)
        .filter(F.col("cnt") > F.col("total") / 200.0)
        .select(
            F.col("tok").alias("term"),
            F.col("cnt").cast("bigint").alias("n_occurrences"),
        )
    )


# Count-min sketch geometry: d=4 lanes of w=512 counters, pairwise-
# independent integer hashes h_i(k) = ((a_i*k + b_i) mod P) mod w. The
# hashes are plain BIGINT arithmetic so the DuckDB oracle computes the
# IDENTICAL sketch — an exact-hash oracle for a sketch operator (rare:
# most sketches are rows-only because engine hash functions differ).
CMS_P = 1_000_000_007
CMS_W = 512
CMS_LANES = [(0, 31, 7), (1, 131, 23), (2, 61, 101), (3, 97, 53)]


@register(
    "sketch_count_min",
    """
    WITH lanes(lane, a, b) AS (
      VALUES (0, 31, 7), (1, 131, 23), (2, 61, 101), (3, 97, 53)
    ),
    counters AS (
      SELECT l.lane,
             ((l.a * e.user_id + l.b) % 1000000007) % 512 AS bucket,
             COUNT(*) AS cnt
      FROM events e CROSS JOIN lanes l
      GROUP BY 1, 2
    ),
    truth AS (SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY 1)
    SELECT t.user_id, t.true_n, MIN(c.cnt) AS cms_est
    FROM truth t
    CROSS JOIN lanes l
    JOIN counters c
      ON c.lane = l.lane
     AND c.bucket = ((l.a * t.user_id + l.b) % 1000000007) % 512
    GROUP BY t.user_id, t.true_n
    """,
    doc="Count-min sketch over event frequencies: d=4 x w=512 counters "
    "built in ONE pass (row-local lane explode, then a 2048-group "
    "aggregate that combines map-side — the counter table is fixed-size "
    "regardless of input rows, the whole point of the sketch at 100 TB), "
    "then point queries for every key answered by MIN over the key's d "
    "counters via a BROADCAST join of the 2048-row counter table. The "
    "deterministic (a*k+b) mod P mod w hashes make the estimate "
    "bit-reproducible in DuckDB, so this sketch gets an EXACT oracle "
    "instead of the usual rows-only check; the true counts ride along so "
    "the CMS overestimate guarantee (est >= truth, equality when no "
    "collision) is visible per row and pinned by test_sketches.",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    lane_arr = F.array(
        *[
            F.struct(
                F.lit(lane).alias("lane"),
                F.pmod(
                    F.pmod(F.lit(a) * F.col("user_id") + F.lit(b), F.lit(CMS_P)),
                    F.lit(CMS_W),
                ).alias("bucket"),
            )
            for lane, a, b in CMS_LANES
        ]
    )
    counters = (
        ev.select(F.explode(lane_arr).alias("lb"))
        .select("lb.lane", "lb.bucket")
        .groupBy("lane", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    probes = truth.select(
        "user_id", "true_n", F.explode(lane_arr).alias("lb")
    ).select("user_id", "true_n", "lb.lane", "lb.bucket")
    return (
        probes.join(F.broadcast(counters), ["lane", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cnt").alias("cms_est"))
    )


QD_PMILS = [10, 100, 250, 500, 750, 900, 990]


@register(
    "sketch_quantile_digest",
    """
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    built AS (
      SELECT day, bucket,
             SUM(CAST(value AS DECIMAL(18,6))) AS c_sum,
             COUNT(*) AS c_w
      FROM (
        SELECT day, value,
               ntile(32) OVER (PARTITION BY day ORDER BY value, event_id) AS bucket
        FROM ev
      )
      GROUP BY day, bucket
    ),
    staged AS (
      SELECT c_sum, c_w,
             SUM(c_w) OVER (ORDER BY CAST(c_sum AS DOUBLE)/c_w, day, bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c_w) OVER () AS total
      FROM built
    ),
    mrg AS (
      SELECT LEAST(((cum - c_w) * 64) // total, 63) AS mbucket,
             SUM(c_sum) AS m_sum, SUM(c_w) AS m_w
      FROM staged GROUP BY 1
    ),
    digest AS (
      SELECT mbucket, m_sum, m_w,
             SUM(m_w) OVER (ORDER BY mbucket ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(m_w) OVER () AS total_w
      FROM mrg
    ),
    qs(p_mil) AS (VALUES (10),(100),(250),(500),(750),(900),(990)),
    est AS (
      SELECT p_mil,
             ROUND(CAST(m_sum AS DOUBLE)/m_w, 6) AS est,
             CAST(total_w AS BIGINT) AS n_total
      FROM (
        SELECT q.p_mil, d.m_sum, d.m_w, d.total_w,
               ROW_NUMBER() OVER (PARTITION BY q.p_mil ORDER BY d.cum_w) AS rk
        FROM qs q JOIN digest d
          ON d.cum_w >= (q.p_mil * d.total_w + 999) // 1000
      ) WHERE rk = 1
    ),
    ranked AS (
      SELECT value, ROW_NUMBER() OVER (ORDER BY value, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM ev
    ),
    truth AS (
      SELECT q.p_mil, r.value AS truth_at_rank
      FROM qs q JOIN ranked r ON r.rn = (q.p_mil * r.n + 999) // 1000
    )
    SELECT e.p_mil, e.est, t.truth_at_rank, e.n_total
    FROM est e JOIN truth t USING (p_mil)
    """,
    doc="Mergeable stratified quantile digest with an EXACT oracle — the "
    "quantile member of the sketch family. Daily 32-strata digests "
    "(decimal-exact centroid state) merge into one 64-centroid global "
    "digest via integer-arithmetic re-stratification; seven quantiles are "
    "then answered from the 64-row digest, never re-touching events. At "
    "100 TB the daily digests persist as a b-rows/day state table and any "
    "rollup window is a centroid merge — where exact percentile is a "
    "global sort of all history. Exact rank-select truth rides along per "
    "row so the rank-error bound is visible and pinned by "
    "tests/test_sketches.py; the truth branch's global sort is oracle "
    "instrumentation only — the digest path's only global window runs "
    "over the b x days centroid table, never raw events.",
    tags=("sketch",),
)
def sketch_quantile_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from canvas_data_aws_spark.operators.quantiles import (
        quantile_digest_build,
        quantile_digest_merge,
        quantile_digest_query,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_id", "value"
    )
    daily = quantile_digest_build(ev, "value", "event_id", ["day"], b=32)
    merged = quantile_digest_merge(daily, [], ["day", "bucket"], b=64)
    est = quantile_digest_query(merged, QD_PMILS, [])

    ranked = ev.filter(F.col("value").isNotNull()).select(
        "value",
        F.row_number().over(Window.orderBy("value", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    qs = spark.createDataFrame([(p,) for p in QD_PMILS], "p_mil int")
    truth = qs.join(
        ranked, ranked.rn == F.expr("(p_mil * n + 999) div 1000")
    ).select("p_mil", F.col("value").alias("truth_at_rank"))
    return est.join(truth, "p_mil").select("p_mil", "est", "truth_at_rank", "n_total")


@register(
    "sketch_quantile_digest_rolling",
    """
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    built AS (
      SELECT day, bucket,
             SUM(CAST(value AS DECIMAL(18,6))) AS c_sum,
             COUNT(*) AS c_w
      FROM (
        SELECT day, value,
               ntile(32) OVER (PARTITION BY day ORDER BY value, event_id) AS bucket
        FROM ev
      )
      GROUP BY day, bucket
    ),
    anchors AS (SELECT DISTINCT day AS anchor_day FROM built),
    windowed AS (
      SELECT a.anchor_day, b.day, b.bucket, b.c_sum, b.c_w
      FROM anchors a
      JOIN built b ON b.day BETWEEN a.anchor_day - INTERVAL 6 DAY AND a.anchor_day
    ),
    staged AS (
      SELECT anchor_day, c_sum, c_w,
             SUM(c_w) OVER (PARTITION BY anchor_day
                            ORDER BY CAST(c_sum AS DOUBLE)/c_w, day, bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c_w) OVER (PARTITION BY anchor_day) AS total
      FROM windowed
    ),
    mrg AS (
      SELECT anchor_day,
             LEAST(((cum - c_w) * 32) // total, 31) AS mbucket,
             SUM(c_sum) AS m_sum, SUM(c_w) AS m_w
      FROM staged GROUP BY 1, 2
    ),
    digest AS (
      SELECT anchor_day, mbucket, m_sum, m_w,
             SUM(m_w) OVER (PARTITION BY anchor_day ORDER BY mbucket
                            ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(m_w) OVER (PARTITION BY anchor_day) AS total_w
      FROM mrg
    )
    SELECT anchor_day,
           ROUND(CAST(m_sum AS DOUBLE)/m_w, 6) AS p50_est,
           CAST(total_w AS BIGINT) AS n_window
    FROM (
      SELECT anchor_day, m_sum, m_w, total_w,
             ROW_NUMBER() OVER (PARTITION BY anchor_day ORDER BY cum_w) AS rk
      FROM digest
      WHERE cum_w >= (500 * total_w + 999) // 1000
    ) WHERE rk = 1
    """,
    doc="Trailing-7-day rolling median answered ENTIRELY from the daily "
    "digest state table: each anchor day range-joins the prior week's "
    "centroid rows (7 x 32 rows, never event rows), re-stratifies, and "
    "reads the median off the merged digest. The incremental-maintenance "
    "pattern for quantile dashboards at 100 TB — the alternative recomputes "
    "a per-window sort over raw history for every window. Exact oracle: "
    "the digest arithmetic is deterministic end-to-end.",
    tags=("sketch",),
)
def sketch_quantile_digest_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.quantiles import (
        quantile_digest_build,
        quantile_digest_merge,
        quantile_digest_query,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_id", "value"
    )
    daily = quantile_digest_build(ev, "value", "event_id", ["day"], b=32)
    anchors = daily.select(F.col("day").alias("anchor_day")).distinct()
    windowed = anchors.join(
        daily,
        daily.day.between(F.date_sub(anchors.anchor_day, 6), anchors.anchor_day),
    )
    merged = quantile_digest_merge(windowed, ["anchor_day"], ["day", "bucket"], b=32)
    return quantile_digest_query(merged, [500], ["anchor_day"]).select(
        "anchor_day",
        F.col("est").alias("p50_est"),
        F.col("n_total").alias("n_window"),
    )


@register(
    "sketch_quantile_digest_grouped",
    """
    WITH ev AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    built AS (
      SELECT event_type, day, bucket,
             SUM(CAST(value AS DECIMAL(18,6))) AS c_sum,
             COUNT(*) AS c_w
      FROM (
        SELECT event_type, day, value,
               ntile(32) OVER (PARTITION BY event_type, day
                               ORDER BY value, event_id) AS bucket
        FROM ev
      )
      GROUP BY event_type, day, bucket
    ),
    staged AS (
      SELECT event_type, c_sum, c_w,
             SUM(c_w) OVER (PARTITION BY event_type
                            ORDER BY CAST(c_sum AS DOUBLE)/c_w, day, bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c_w) OVER (PARTITION BY event_type) AS total
      FROM built
    ),
    mrg AS (
      SELECT event_type,
             LEAST(((cum - c_w) * 32) // total, 31) AS mbucket,
             SUM(c_sum) AS m_sum, SUM(c_w) AS m_w
      FROM staged GROUP BY 1, 2
    ),
    digest AS (
      SELECT event_type, mbucket, m_sum, m_w,
             SUM(m_w) OVER (PARTITION BY event_type ORDER BY mbucket
                            ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(m_w) OVER (PARTITION BY event_type) AS total_w
      FROM mrg
    ),
    qs(p_mil) AS (VALUES (500), (900), (990))
    SELECT event_type, p_mil,
           ROUND(CAST(m_sum AS DOUBLE)/m_w, 6) AS est,
           CAST(total_w AS BIGINT) AS n_total
    FROM (
      SELECT q.p_mil, d.event_type, d.m_sum, d.m_w, d.total_w,
             ROW_NUMBER() OVER (PARTITION BY d.event_type, q.p_mil
                                ORDER BY d.cum_w) AS rk
      FROM qs q JOIN digest d
        ON d.cum_w >= (q.p_mil * d.total_w + 999) // 1000
    ) WHERE rk = 1
    """,
    doc="Per-group quantiles from the SAME daily digest state: (event_type, "
    "day) digests merge per event_type and answer p50/p90/p99 per group — "
    "the grouped merge path of the mergeable-digest design, where adding "
    "a grouping key costs one partition column, not a new scan of "
    "history. Exact oracle, same deterministic arithmetic as "
    "sketch_quantile_digest.",
    tags=("sketch",),
)
def sketch_quantile_digest_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.quantiles import (
        quantile_digest_build,
        quantile_digest_merge,
        quantile_digest_query,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_id",
        "value",
    )
    daily = quantile_digest_build(ev, "value", "event_id", ["event_type", "day"], b=32)
    merged = quantile_digest_merge(daily, ["event_type"], ["day", "bucket"], b=32)
    return quantile_digest_query(merged, [500, 900, 990], ["event_type"]).select(
        "event_type", "p_mil", "est", "n_total"
    )


@register(
    "dq_quantile_drift",
    """
    WITH ev AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_id, value
      FROM events WHERE value IS NOT NULL
    ),
    built AS (
      SELECT day, bucket,
             SUM(CAST(value AS DECIMAL(18,6))) AS c_sum,
             COUNT(*) AS c_w
      FROM (
        SELECT day, value,
               ntile(32) OVER (PARTITION BY day ORDER BY value, event_id) AS bucket
        FROM ev
      )
      GROUP BY day, bucket
    ),
    digest AS (
      SELECT day, bucket, m_sum, m_w,
             SUM(m_w) OVER (PARTITION BY day ORDER BY
                            CAST(m_sum AS DOUBLE)/m_w, bucket
                            ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(m_w) OVER (PARTITION BY day) AS total_w
      FROM (SELECT day, bucket, c_sum AS m_sum, c_w AS m_w FROM built)
    ),
    p50 AS (
      SELECT day,
             ROUND(CAST(m_sum AS DOUBLE)/m_w, 6) AS p50_est,
             CAST(total_w AS BIGINT) AS n_day
      FROM (
        SELECT day, m_sum, m_w, total_w,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY cum_w) AS rk
        FROM digest
        WHERE cum_w >= (500 * total_w + 999) // 1000
      ) WHERE rk = 1
    )
    SELECT day, p50_est, n_day,
           ROUND(p50_est - LAG(p50_est) OVER (ORDER BY day), 6) AS p50_delta,
           CASE WHEN ABS(p50_est - LAG(p50_est) OVER (ORDER BY day))
                     > 0.25 * LAG(p50_est) OVER (ORDER BY day)
                THEN TRUE ELSE FALSE END AS drift_alert
    FROM p50
    """,
    doc="Day-over-day quantile drift monitor — the DQ consumer of the "
    "digest state table: each day's median read off its own 32-strata "
    "digest (no merge, no re-scan of history), day-over-day delta via "
    "LAG, alert when the median moves >25%% vs the prior day. At 100 TB "
    "the monitor's daily cost is the day's digest build (which the "
    "rollup pipeline already pays) plus a b-row window — distribution "
    "drift detection without a second pass over events. Exact oracle; "
    "the alert threshold is exact arithmetic on deterministic "
    "estimates.",
    tags=("sketch", "dq"),
)
def dq_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from canvas_data_aws_spark.operators.quantiles import (
        quantile_digest_build,
        quantile_digest_query,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_id", "value"
    )
    daily = quantile_digest_build(ev, "value", "event_id", ["day"], b=32)
    # per-day digests queried directly: stage the build output into the
    # merged-digest shape (cum_w/total_w per day) without re-stratifying
    w_ord = Window.partitionBy("day").orderBy(
        (F.col("c_sum").cast("double") / F.col("c_w")), "bucket"
    )
    w_all = Window.partitionBy("day")
    digest = daily.select(
        "day",
        F.col("bucket").alias("mbucket"),
        F.col("c_sum").alias("m_sum"),
        F.col("c_w").alias("m_w"),
        F.sum("c_w").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_w"),
        F.sum("c_w").over(w_all).alias("total_w"),
    )
    p50 = quantile_digest_query(digest, [500], ["day"]).select(
        "day", F.col("est").alias("p50_est"), F.col("n_total").alias("n_day")
    )
    lag = F.lag("p50_est").over(Window.orderBy("day"))
    return p50.select(
        "day",
        "p50_est",
        "n_day",
        F.round(F.col("p50_est") - lag, 6).alias("p50_delta"),
        F.coalesce(
            F.abs(F.col("p50_est") - lag) > 0.25 * lag, F.lit(False)
        ).alias("drift_alert"),
    )
