"""B.1 scans/sources/sinks + B.2 projection/filter (SURVEY.md §2).

The flagship query lives here: a TPC-H Q1-shaped pricing summary over
``lineitem`` — scan → filter → project → hash-aggregate → sort in one plan.
At 100 TB this is a pure map-side-partial + single-shuffle aggregate over a
low-cardinality key (6 groups): Catalyst plans partial aggregation before the
exchange, so shuffled bytes are O(groups × partitions), not O(rows).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table


def _sf_tag(sf_dir: str) -> str:
    """Stable per-sf_dir suffix so concurrent/alternating runs never share scratch dirs."""
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem pricing summary (TPC-H Q1 shape).

    Covers scan_parquet, filter_predicate, project_select, agg_hash_groupby,
    sort_global in a single plan — the reference's primary query pattern
    (star-schema warehousing delegated to SQL; SURVEY.md §2 Part B).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


FLAGSHIP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
  ROUND(AVG(l_discount), 4)                                          AS avg_disc,
  COUNT(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

register(
    "flagship_pricing_summary",
    FLAGSHIP_ORACLE,
    doc="TPC-H Q1-shaped lineitem pricing summary (scan+filter+agg+sort).",
    tags=("flagship", "agg"),
)(flagship_pricing_summary)


# --------------------------------------------------------------------------
# B.1 scans / sources / sinks
# --------------------------------------------------------------------------

@register(
    "scan_parquet",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="Columnar scan with explicit column order (column pruning reaches the reader).",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


@register(
    "scan_catalog_table",
    "SELECT r_regionkey, r_name FROM region",
    doc="Query a registered table by name via spark.table (catalog surface; "
    "the reference enables this via Glue registration, sync-canvas-data-files.py:170-235).",
)
def scan_catalog_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "region").createOrReplaceTempView("cda_region_view")
    return spark.table("cda_region_view").select("r_regionkey", "r_name")


@register(
    "scan_tsv_gzip",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="Raw-zone fidelity: round-trip a table through header-less gzip TSV "
    "with declared schema (the reference's at-rest format, "
    "sync-canvas-data-files.py:177-202) and read it back.",
)
def scan_tsv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.sources.tsv import read_tsv_gzip, write_tsv_gzip

    nation = load_table(spark, sf_dir, "nation")
    out = os.path.join(tempfile.gettempdir(), f"cda_raw_zone_{_sf_tag(sf_dir)}", "nation")
    write_tsv_gzip(nation, out)
    return read_tsv_gzip(spark, out, nation.schema).select("n_nationkey", "n_name", "n_regionkey")


@register(
    "sink_parquet",
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    doc="Curated-zone write + read-back (df.write.parquet).",
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = os.path.join(tempfile.gettempdir(), f"cda_curated_{_sf_tag(sf_dir)}", "supplier")
    sup.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@register(
    "sink_partitioned",
    "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders",
    doc="Partitioned layout write (partitionBy o_orderstatus) + read-back; fixes the "
    "reference's PartitionKeys:[] (sync-canvas-data-files.py:184) — at 100 TB the "
    "partition column prunes entire directories before the scan.",
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    out = os.path.join(tempfile.gettempdir(), f"cda_curated_{_sf_tag(sf_dir)}", "orders_by_status")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out)
    # partition column comes back typed as read; re-select with explicit casts for parity
    return back.select(
        "o_orderkey", "o_custkey", F.col("o_orderstatus").cast("string").alias("o_orderstatus")
    )


# --------------------------------------------------------------------------
# B.2 projection / filter / null semantics
# --------------------------------------------------------------------------

@register(
    "project_select",
    """
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1 - l_discount) AS net_price,
      CAST(l_quantity AS BIGINT)                   AS qty_int,
      UPPER(l_returnflag)                          AS flag_uc
    FROM lineitem
    """,
    doc="Column pruning + computed/renamed columns; only 5 of 11 columns should reach the scan.",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.upper("l_returnflag").alias("flag_uc"),
    )


@register(
    "filter_predicate",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority LIKE '1-%'
      AND NOT (o_custkey % 10 = 3)
    """,
    doc="Compound predicate: IN + BETWEEN + LIKE + NOT, pushed to the parquet scan.",
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderpriority").like("1-%")
        & ~(F.col("o_custkey") % 10 == 3)
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@register(
    "filter_null_semantics",
    """
    SELECT
      COUNT(*)                                            AS n_rows,
      COUNT(status_or_null)                               AS n_not_null,
      CAST(SUM(CASE WHEN status_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CAST((CASE WHEN status_or_null = 'O' THEN 1 WHEN status_or_null IS NULL THEN NULL ELSE 0 END) IS NULL AS BIGINT)) AS BIGINT) AS n_3vl_unknown
    FROM (SELECT NULLIF(o_orderstatus, 'F') AS status_or_null FROM orders)
    """,
    doc="Three-valued NULL logic: NULLIF-fabricated NULLs, COUNT(col) vs COUNT(*), UNKNOWN in comparisons.",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("status_or_null")
    )
    cmp = F.when(F.col("status_or_null") == "O", 1).when(F.col("status_or_null").isNull(), F.lit(None)).otherwise(0)
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("status_or_null").alias("n_not_null"),
        F.sum(F.when(F.col("status_or_null").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
        F.sum(cmp.isNull().cast("bigint")).cast("bigint").alias("n_3vl_unknown"),
    )


@register(
    "scan_orc",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="ORC round-trip (the other columnar at-rest format Spark reads "
    "natively): write nation as ORC, read it back with pruning intact.",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    out = os.path.join(tempfile.gettempdir(), f"cda_orc_{_sf_tag(sf_dir)}", "nation")
    nation.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select("n_nationkey", "n_name", "n_regionkey")


@register(
    "scan_jsonl",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    """,
    doc="JSON-lines round-trip: events written as JSONL, read back with an "
    "explicit schema (inference off — one pass, stable types), aggregated. "
    "Timestamps stay out of the output; JSON serializes them as strings "
    "whose parse-back is format-dependent, so the oracle pins the "
    "value-bearing columns instead.",
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = os.path.join(tempfile.gettempdir(), f"cda_jsonl_{_sf_tag(sf_dir)}", "events")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(ev.schema).json(out)
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@register(
    "join_bucketed_colocated",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Co-located join via bucketed tables: both sides bucketBy(8) on the "
    "join key, so the fact-fact join itself runs with no shuffle exchange "
    "on either input (bucket layout satisfies the join's distribution "
    "requirement) — the storage lever that deletes the biggest shuffle at "
    "100 TB. Broadcast is disabled inside the query so the bucket path is "
    "what actually executes at oracle scale; the only remaining exchange "
    "is the few-row rollup by priority. Plan asserted exchange-free in "
    "tests/test_bucketing_dpp.py.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = _sf_tag(sf_dir)
    lt, ot = f"cda_bl_{tag}", f"cda_bo_{tag}"
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    for df, name, key in ((li, lt, "l_orderkey"), (o, ot, "o_orderkey")):
        if not spark.catalog.tableExists(name):
            # a fresh session's in-memory catalog forgets the table but the
            # warehouse dir survives on disk — clear the orphan location
            shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
            df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(name)
    bl, bo = spark.table(lt), spark.table(ot)
    autob_key = "spark.sql.autoBroadcastJoinThreshold"
    old_autob = spark.conf.get(autob_key)
    spark.conf.set(autob_key, "-1")
    try:
        out = (
            bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lineitems"),
                F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"),
            )
        )
        out = out.cache()
        out.count()  # plan + execute under the no-broadcast conf
    finally:
        spark.conf.set(autob_key, old_autob)
    return out


@register(
    "sink_dynamic_overwrite",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'F'
    UNION ALL
    SELECT o_orderkey, -o_custkey AS o_custkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Dynamic partition overwrite (partitionOverwriteMode=dynamic): "
    "rewrite ONLY the partitions present in the incoming batch — the "
    "snapshot-mirror delete/replace (sync-canvas-data-files.py:104-112) as "
    "a single declarative write, and the 100 TB upsert path (static mode "
    "would truncate the whole table). The query overwrites just the "
    "status='F' partition with negated custkeys; the oracle checks the "
    "other partitions survived untouched.",
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    out = os.path.join(tempfile.gettempdir(), f"cda_dynovr_{_sf_tag(sf_dir)}", "orders")
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old_mode = spark.conf.get(mode_key)
    spark.conf.set(mode_key, "dynamic")
    try:
        replacement = orders.filter(F.col("o_orderstatus") == "F").withColumn(
            "o_custkey", -F.col("o_custkey")
        )
        replacement.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    finally:
        spark.conf.set(mode_key, old_mode)
    back = spark.read.parquet(out)
    return back.select(
        "o_orderkey", "o_custkey", F.col("o_orderstatus").cast("string").alias("o_orderstatus")
    )


@register(
    "scan_tsv_malformed",
    """
    SELECT * FROM (VALUES
      (1, 1.5, 0),
      (2, CAST(NULL AS DOUBLE), 0),
      (3, CAST(NULL AS DOUBLE), 1),
      (4, 2.25, 0),
      (CAST(NULL AS INT), 9.9, 1)
    ) AS t(id, v, is_corrupt)
    """,
    doc="Malformed-row tolerance in the raw zone: PERMISSIVE parse with a "
    "columnNameOfCorruptRecord sidecar — bad rows (unparseable type, wrong "
    "arity) surface as nulls + the raw line for quarantine instead of "
    "failing the 100 TB ingest job (FAILFAST is one flipped option when a "
    "feed must be rejected whole). Row 3 has a bad double, row 5 a bad id: "
    "both flagged, neither aborts; parsing is per-column, so the good "
    "columns of a corrupt row (row 5's v=9.9) still land typed.",
)
def scan_tsv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import gzip as _gzip

    from pyspark.sql.types import DoubleType, IntegerType, StringType, StructField, StructType

    out_dir = os.path.join(tempfile.gettempdir(), f"cda_badtsv_{_sf_tag(sf_dir)}")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    with _gzip.open(os.path.join(out_dir, "t-0.tsv.gz"), "wt") as f:
        f.write("1\t1.5\n2\t\\N\n3\tnot_a_number\n4\t2.25\nbad_id\t9.9\n")

    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("v", DoubleType()),
            StructField("_corrupt", StringType()),
        ]
    )
    raw = (
        spark.read.schema(schema)
        .options(
            sep="\t",
            header="false",
            nullValue="\\N",
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt",
        )
        .csv(out_dir)
    )
    return raw.select(
        "id", "v", F.col("_corrupt").isNotNull().cast("int").alias("is_corrupt")
    )


@register(
    "scan_schema_evolution",
    """
    SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars
    FROM documents WHERE doc_id % 2 = 1
    """,
    doc="Schema evolution across snapshots — the lakehouse reality the "
    "reference's daily re-registration sidesteps (it rewrites the Glue "
    "DDL wholesale each sync): an old snapshot written WITHOUT a column "
    "and a new snapshot WITH it are read back as one dataset via "
    "mergeSchema, absent columns null-filled. At 100 TB, footer-level "
    "schema merge is the cheap path (no data rewrite on column add — "
    "metadata only); the oracle pins the widened-schema semantics "
    "(old rows carry NULL, new rows carry values).",
    tags=("relational",),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = os.path.join(tempfile.gettempdir(), f"cda_evo_{_sf_tag(sf_dir)}")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "snap=1"))
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars"
    ).write.mode("overwrite").parquet(os.path.join(base, "snap=2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "snap=1"), os.path.join(base, "snap=2")
    )
    return back.select("doc_id", "lang", F.col("n_chars").cast("bigint"))


@register(
    "scan_jsonl_malformed",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_user
    FROM (SELECT user_id FROM events WHERE event_id < 500)
    """,
    doc="Malformed-JSONL resilience: a landing file with garbage lines "
    "interleaved reads under PERMISSIVE mode with a _corrupt_record "
    "column — bad lines quarantine into the rescue column instead of "
    "failing the job or silently vanishing, and the count of survivors "
    "equals the clean subset exactly (the oracle checks that). The "
    "dropped-line count is observable (corrupt-record IS NOT NULL) for a "
    "dead-letter sink. Same landing-zone posture as scan_tsv_malformed "
    "and the ignoreCorruptFiles parquet test.",
)
def scan_jsonl_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500).select(
        "event_id", "user_id"
    )
    out = os.path.join(tempfile.gettempdir(), f"cda_jsonl_bad_{_sf_tag(sf_dir)}")
    ev.coalesce(1).write.mode("overwrite").json(out)
    assert glob.glob(os.path.join(out, "part-*.json"))
    # a separate junk member (appending to a Spark-written part would break
    # its .crc sidecar and fail the read with ChecksumException instead)
    with open(os.path.join(out, "part-zz-junk.json"), "w", encoding="utf-8") as f:
        f.write('{"event_id": broken json here\n')
        f.write("not json at all\n")
        f.write('{"event_id": 999999, "user_id": \n')
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    back = back.cache()
    valid = back.filter(F.col("_corrupt_record").isNull())
    return valid.agg(
        F.count("*").alias("n_valid"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_user"),
    )


@register(
    "scan_csv_quoted",
    """
    SELECT * FROM (VALUES
      (1, 'plain value', CAST(10.5 AS DOUBLE)),
      (2, 'has, commas, inside', CAST(20.25 AS DOUBLE)),
      (3, 'says "hi" twice', CAST(30.75 AS DOUBLE)),
      (4, 'line one
line two', CAST(40.0 AS DOUBLE)),
      (5, CAST(NULL AS VARCHAR), CAST(50.5 AS DOUBLE))
    ) AS t(id, note, amount)
    """,
    doc="Quoted-CSV fidelity — the raw-zone cases that silently corrupt a "
    "naive split(','): embedded delimiters, RFC-4180 doubled quotes, an "
    "embedded NEWLINE inside a quoted field (requiring multiLine "
    "parsing), and a true null distinct from empty string. The fixture "
    "file is written with all four hazards and read back with "
    "quote/escape/multiLine options; the oracle is the literal expected "
    "relation. multiLine is the one knob with a 100 TB cost: it makes "
    "gzip'd CSV effectively unsplittable per file, which is exactly why "
    "ingest/compaction.py promotes raw CSV/TSV to parquet before "
    "anything heavy runs — this entry documents the BOUNDARY, the "
    "curated zone never re-pays it.",
    tags=("relational",),
)
def scan_csv_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_dir = os.path.join(tempfile.gettempdir(), f"cda_quotedcsv_{_sf_tag(sf_dir)}")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    with open(os.path.join(out_dir, "q-0.csv"), "w") as f:
        f.write(
            '1,plain value,10.5\n'
            '2,"has, commas, inside",20.25\n'
            '3,"says ""hi"" twice",30.75\n'
            '4,"line one\nline two",40.0\n'
            '5,,50.5\n'
        )
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("note", StringType()),
            StructField("amount", DoubleType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .options(
            header="false",
            quote='"',
            escape='"',  # RFC 4180: quotes escape by doubling
            multiLine="true",
            emptyValue=None,  # empty unquoted field -> null
        )
        .csv(out_dir)
    )
