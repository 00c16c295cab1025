"""Corpus-curation queries beyond pairwise ops: duplicate clustering,
deterministic sampling, and sharded export — the remaining steps between
"scored documents" and "training-ready dataset"."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.clustering import connected_components
from canvas_data_aws_spark.operators.dedup import ngram_jaccard_pairs
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_EDGE_CTE = f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split({_NORM}, ' ') AS words FROM documents)
    ),
    ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) / (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)) >= 0.2
    )
"""


@register(
    "dedup_cluster",
    _EDGE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    walk(v, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, w.lab FROM walk w JOIN bidir b ON b.src = w.v
    )
    SELECT v AS doc_id, MIN(lab) AS component
    FROM walk GROUP BY v
    """,
    doc="Near-dup clustering: connected components (min-label propagation as "
    "iterative DataFrame joins) over the exact-Jaccard pair graph; the "
    "DuckDB oracle re-derives components via a recursive CTE — an "
    "iterative algorithm value-checked end-to-end.",
    tags=("iterative",),
)
def dedup_cluster_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, k=3, threshold=0.2).select("id_a", "id_b")
    return connected_components(
        # the pair graph is unique (id_a < id_b, one row per pair from the
        # candidate groupBy) and stays so after symmetrization — skip the
        # operator's defensive full-edge-list distinct shuffle
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id",
        assume_unique=True,
    ).select(F.col("id").alias("doc_id"), "component")


@register(
    "corpus_sample_systematic",
    """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE doc_id % 10 = 3
    """,
    doc="Deterministic 10% systematic sample by key residue — reproducible "
    "across engines and runs (unlike Bernoulli sampling, whose RNG stream "
    "is engine-specific); the sampling predicate pushes down to the scan.",
)
def corpus_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 3)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "corpus_shard_export",
    """
    SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
    doc="Training-shard export: documents hashed into 8 shards, written as a "
    "partitioned dataset, read back and summarized — the write path a "
    "dataloader consumes (partitionBy = shard manifest).",
)
def corpus_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "shard", (F.col("doc_id") % 8).cast("bigint")
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"cda_shards_{tag}")
    docs.write.mode("overwrite").partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy(F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "corpus_pack_batches",
    """
    WITH toks AS (
      SELECT source, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT source, doc_id, n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS BIGINT) AS batch_id
    FROM toks
    """,
    doc="Sequence packing for training batches: per-source document streams "
    "fill 512-token batches by prefix sum in deterministic doc_id order "
    "(operators/curation.py::pack_sequences) — first-fit-on-a-stream, the "
    "shape real packing pipelines ship. One window per source group = one "
    "shuffle partitioned by the parallelism unit.",
)
def corpus_pack_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.curation import pack_sequences

    return pack_sequences(
        load_table(spark, sf_dir, "documents"), capacity=512, group_col="source"
    )


@register(
    "corpus_mix_weighted",
    """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    WHERE doc_id % 100 < CASE source
        WHEN 'src0' THEN 80 WHEN 'src1' THEN 50 WHEN 'src2' THEN 100
        WHEN 'src3' THEN 25 ELSE 0 END
    GROUP BY source
    """,
    doc="Deterministic training-mixture sampling: keep N% of each source by "
    "stable id bucket (src0 80 / src1 50 / src2 100 / src3 25; unlisted sources drop) "
    "— row-local predicate, zero shuffle before the count, reproducible "
    "run-over-run (operators/curation.py::mix_by_source_weights).",
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.curation import mix_by_source_weights

    mixed = mix_by_source_weights(
        load_table(spark, sf_dir, "documents"),
        weights={"src0": 80, "src1": 50, "src2": 100, "src3": 25},
    )
    return mixed.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))


@register(
    "layout_zorder_rewrite",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    doc="Z-order (Morton) clustering rewrite, first-principles on plain "
    "parquet (ingest/compaction.py::zorder_write): min-max normalize each "
    "clustered column to 16 bits in one stats pass, interleave bits with a "
    "codegen'd shift/or chain, repartitionByRange + local sort on the key. "
    "Per-file min/max footers then prune on ANY clustered column: measured "
    "avg per-file span custkey 0.26 / totalprice 0.49 of global, vs 0.12 / "
    "1.00 for a plain custkey sort (8-file layout, matching the 2-bit/1-bit "
    "Morton split exactly; tests/test_scale_ops.py). The oracle checks the "
    "rewrite is lossless.",
)
def layout_zorder_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from canvas_data_aws_spark.ingest.compaction import zorder_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    from canvas_data_aws_spark.plans.relational import _sf_tag

    out = os.path.join(tempfile.gettempdir(), f"cda_zorder_{_sf_tag(sf_dir)}", "orders")
    zorder_write(
        orders, out, ["o_custkey", "o_totalprice"],
        target_rows_per_file=max(2000, orders.count() // 8),
    )
    return spark.read.parquet(out)


def _pagerank_oracle(iters: int = 5, d: float = 0.85) -> str:
    sql = """
    WITH eda AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (SELECT src, dst FROM eda UNION SELECT dst, src FROM eda),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT id, 1.0 AS rank FROM nodes)"""
    for k in range(iters):
        sql += f""",
    r{k + 1} AS (
      SELECT n.id, {1 - d} + {d} * COALESCE(SUM(p.rank / p.deg), 0) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst, r.rank, d.deg
        FROM e JOIN r{k} r ON r.id = e.src JOIN deg d ON d.src = e.src
      ) p ON p.dst = n.id
      GROUP BY n.id)"""
    sql += f"""
    SELECT id, ROUND(rank, 4) AS rank FROM r{iters}"""
    return sql


@register(
    "graph_pagerank",
    _pagerank_oracle(5),
    doc="PageRank, 5 power iterations over the (customer <-> supplier) "
    "purchase graph (operators/clustering.py::pagerank): each iteration is "
    "one src-partitioned join + one dst aggregation with localCheckpoint "
    "lineage truncation — the iterative-algorithm surface with an EXACT "
    "oracle (5 chained CTEs in DuckDB; float summation-order noise ~1e-15 "
    "sits far below the ROUND(4) both sides pin).",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.clustering import pagerank

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eda = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
        # eager checkpoint: the union reads eda twice (forward + swapped);
        # without it the orders x lineitem join + distinct runs twice
        .localCheckpoint(eager=True)
    )
    bidir = eda.unionAll(eda.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    ranks = pagerank(bidir, iterations=5)
    return ranks.select("id", F.round("rank", 4).alias("rank"))


@register(
    "dedup_collapse_best",
    _EDGE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    walk(v, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, w.lab FROM walk w JOIN bidir b ON b.src = w.v
    ),
    comp AS (SELECT v AS doc_id, MIN(lab) AS component FROM walk GROUP BY v)
    SELECT doc_id, component, n_in_cluster FROM (
      SELECT d.doc_id, c.component,
             COUNT(*) OVER (PARTITION BY c.component) AS n_in_cluster,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, d.doc_id) AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ) WHERE rk = 1
    """,
    doc="Duplicate-cluster COLLAPSE — the step dedup pipelines actually ship: "
    "near-dup clusters (connected components over the exact-Jaccard pair "
    "graph) reduced to ONE survivor each, chosen deterministically by "
    "(n_chars desc, doc_id asc), with the cluster size kept for provenance. "
    "Scale shape: the survivor pick is one window over (component) — "
    "cluster sizes are bounded by the dedup threshold, so no partition is "
    "hot — and singleton docs pass through the same path untouched. The "
    "oracle re-derives components via a recursive CTE and applies the same "
    "window, value-checking the full cluster->survivor pipeline.",
    tags=("llm", "iterative"),
)
def dedup_collapse_best_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, k=3, threshold=0.2).select("id_a", "id_b")
    comp = connected_components(
        # the pair graph is unique (id_a < id_b, one row per pair from the
        # candidate groupBy) and stays so after symmetrization — skip the
        # operator's defensive full-edge-list distinct shuffle
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id",
        assume_unique=True,
    ).select(F.col("id").alias("doc_id"), "component")
    scored = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component")
    wr = w.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        scored.withColumn("n_in_cluster", F.count("*").over(w))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("doc_id", "component", "n_in_cluster")
    )


def _lpa_oracle(iters: int = 3) -> str:
    sql = """
    WITH eda AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (SELECT src, dst FROM eda UNION SELECT dst, src FROM eda),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    l0 AS (SELECT id, id AS lab FROM nodes)"""
    for k in range(iters):
        sql += f""",
    cand{k} AS (
      SELECT e.dst AS nid, l.lab, COUNT(*) AS c
      FROM e JOIN l{k} l ON l.id = e.src
      GROUP BY e.dst, l.lab
    ),
    pick{k} AS (
      SELECT nid, lab FROM (
        SELECT nid, lab,
               ROW_NUMBER() OVER (PARTITION BY nid ORDER BY c DESC, lab ASC) AS rk
        FROM cand{k}) t WHERE rk = 1
    ),
    l{k + 1} AS (
      SELECT n.id, COALESCE(p.lab, n.id) AS lab
      FROM nodes n LEFT JOIN pick{k} p ON p.nid = n.id)"""
    sql += f"""
    SELECT id, lab AS community FROM l{iters}"""
    return sql


@register(
    "graph_label_propagation",
    _lpa_oracle(3),
    doc="Community detection by synchronous label propagation over the "
    "customer <-> supplier purchase graph, 3 BSP rounds "
    "(operators/clustering.py::label_propagation): per round one "
    "co-partitioned edge x label join, one (node, label) count, one argmax "
    "window, lineage truncated by localCheckpoint. Deterministic by "
    "construction (integer counts, ties -> smallest label), so the whole "
    "iterative pipeline value-oracles against 3 unrolled CTE rounds.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.clustering import label_propagation

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eda = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
        # eager checkpoint: the union reads eda twice (forward + swapped)
        .localCheckpoint(eager=True)
    )
    bidir = eda.unionAll(
        eda.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # eda is already distinct and BIPARTITE with disjoint key ranges
    # (custkey < 1M < suppkey+1M), so the symmetrized list is
    # duplicate-free by construction and every node appears as a src —
    # both defensive shuffles inside the operator can be skipped
    labels = label_propagation(bidir, iterations=3, assume_unique=True, symmetric=True)
    return labels.select("id", F.col("lab").alias("community"))


def _cc_oracle(iters: int = 8) -> str:
    sql = """
    WITH eda AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    e AS (SELECT src, dst FROM eda UNION SELECT dst, src FROM eda),
    nodes AS (SELECT DISTINCT src AS id FROM e),
    l0 AS (SELECT id, id AS lab FROM nodes)"""
    for k in range(iters):
        sql += f""",
    l{k + 1} AS (
      SELECT t.id, MIN(t.lab) AS lab FROM (
        SELECT id, lab FROM l{k}
        UNION ALL
        SELECT e.dst AS id, l.lab FROM e JOIN l{k} l ON l.id = e.src
      ) t GROUP BY t.id)"""
    sql += f"""
    SELECT id, lab AS component FROM l{iters}"""
    return sql


@register(
    "graph_connected_components",
    _cc_oracle(8),
    doc="Connected components over the customer <-> supplier purchase graph "
    "by synchronous min-label propagation "
    "(operators/clustering.py::connected_components): component id = "
    "smallest vertex id reachable. Per BSP round one co-partitioned "
    "edge x label join + one min-agg, edge list hash-partitioned ONCE and "
    "cached, label lineage truncated by localCheckpoint, early-stop at "
    "fixpoint. The update rule is identical round-by-round to the oracle's "
    "8 unrolled CTE rounds (min is idempotent past convergence), so the "
    "whole iterative pipeline value-matches exactly. Same operator "
    "clusters near-dup document graphs in dedup_cluster/dedup_collapse_best "
    "— this entry exercises it on a graph with ONE giant component "
    "(hub-heavy, the skew shape LPA-style algorithms must survive).",
    tags=("graph", "iterative"),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eda = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # vertices + edges both read this
    )
    # every vertex is an edge endpoint by construction (the vertex set IS
    # src ∪ dst), and eda is distinct + bipartite with disjoint key ranges
    # (custkey < 1M < suppkey+1M) so symmetrization stays duplicate-free:
    # vertices=None skips the singleton join-back, assume_unique skips the
    # operator's defensive full-edge-list distinct
    return connected_components(
        None,
        eda,
        vertex_col="id",
        src_col="src",
        dst_col="dst",
        max_iterations=8,
        assume_unique=True,
    ).select("id", "component")


@register(
    "corpus_padding_waste",
    r"""
    WITH toks AS (
      SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    lens AS (SELECT * FROM (VALUES (CAST(256 AS BIGINT)), (512), (1024),
                                   (2048)) AS t(seq_len)),
    padded AS (
      SELECT l.seq_len, t.n_tokens,
             ((t.n_tokens + l.seq_len - 1) // l.seq_len) * l.seq_len
               AS padded_tokens
      FROM toks t CROSS JOIN lens l
    )
    SELECT seq_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(padded_tokens) AS BIGINT) AS total_padded,
           CAST(SUM(padded_tokens) - SUM(n_tokens) AS BIGINT) AS waste_tokens,
           (SUM(padded_tokens) - SUM(n_tokens)) * 1.0 / SUM(padded_tokens)
             AS waste_share
    FROM padded GROUP BY seq_len
    """,
    doc="Padding-waste audit for training-batch assembly: if each document "
    "were padded to its own sequence boundary (the no-packing baseline), "
    "how many pad tokens does each candidate seq_len burn? Ceil-division "
    "is pure integer arithmetic ((n + L - 1) // L), every aggregate is an "
    "exact integer sum, and waste_share is one quotient of exact counts — "
    "this is the number corpus_pack_batches' first-fit packing exists to "
    "beat, and the seq-len selector a pipeline consults before committing "
    "a batch shape. Plan: row-local token count; the 4-value seq_len "
    "spine is EXPLODED from a literal array (no join node at all — 4x "
    "amplification inside the scan stage), then a 4-group aggregate with "
    "map-side combine.",
    tags=("curation", "llm"),
)
def corpus_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens")
        )
    )
    padded = toks.select(
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in (256, 512, 1024, 2048)])
        ).alias("seq_len"),
        "n_tokens",
    ).select(
        "seq_len",
        "n_tokens",
        (
            F.expr("(n_tokens + seq_len - 1) div seq_len") * F.col("seq_len")
        ).alias("padded_tokens"),
    )
    return padded.groupBy("seq_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("padded_tokens").cast("bigint").alias("total_padded"),
        (F.sum("padded_tokens") - F.sum("n_tokens")).cast("bigint").alias("waste_tokens"),
        (
            (F.sum("padded_tokens") - F.sum("n_tokens"))
            * F.lit(1.0)
            / F.sum("padded_tokens")
        ).alias("waste_share"),
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    sql = """
    WITH eda AS (
      SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    e0 AS (SELECT src, dst FROM eda UNION ALL SELECT dst, src FROM eda)"""
    for r in range(rounds):
        sql += f""",
    v{r} AS (SELECT src AS vv FROM e{r} GROUP BY src HAVING COUNT(*) >= {k}),
    e{r + 1} AS (SELECT e.src, e.dst FROM e{r} e
                 JOIN v{r} a ON a.vv = e.src JOIN v{r} b ON b.vv = e.dst)"""
    sql += f"""
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{rounds} GROUP BY src"""
    return sql


@register(
    "graph_k_core",
    _kcore_oracle(10, 4),
    doc="k-core decomposition (k=10) of the customer <-> supplier purchase "
    "graph by iterative peeling (operators/clustering.py::k_core): drop "
    "every vertex whose degree falls below k, remove its edges, repeat — "
    "the dense-subgraph extraction behind community cores, spam-ring "
    "mining, and graph sparsification. The peel rule is idempotent past "
    "the fixpoint, so a fixed 4-round budget (fixture converges in 2) "
    "value-matches the oracle's 4 unrolled CTE rounds exactly — the same "
    "contract graph_connected_components uses. Per round: one degree "
    "aggregate + two co-partitioned semi-joins, lineage truncated by "
    "localCheckpoint; at 100 TB each round is edge-sized shuffles with "
    "no global state (survivor degrees shrink monotonically).",
    tags=("graph", "iterative"),
)
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.clustering import k_core

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eda = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    sym = eda.unionAll(
        eda.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return k_core(sym, k=10, rounds=4).withColumnRenamed("src", "id")


@register(
    "dedup_cluster_size_histogram",
    _EDGE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    walk(v, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, w.lab FROM walk w JOIN bidir b ON b.src = w.v
    ),
    comp AS (SELECT v AS doc_id, MIN(lab) AS component FROM walk GROUP BY v),
    sizes AS (
      SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY component
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    doc="Cluster-size histogram over the near-dup component graph — the "
    "one-line answer to 'how duplicated is this corpus?': singletons are "
    "unique docs, the heavy tail is boilerplate families, and "
    "sum(n_docs) - sum(n_clusters) is exactly what dedup_collapse_best "
    "will delete. Same iterative min-label-propagation componentization "
    "as dedup_cluster (value-checked against the recursive-CTE oracle "
    "end-to-end), followed by two tiny grain-reducing aggregates. At "
    "100 TB the histogram state is bounded by the largest cluster size, "
    "not the corpus.",
    tags=("iterative", "llm"),
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, k=3, threshold=0.2).select("id_a", "id_b")
    comp = connected_components(
        # the pair graph is unique (id_a < id_b, one row per pair from the
        # candidate groupBy) and stays so after symmetrization — skip the
        # operator's defensive full-edge-list distinct shuffle
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id",
        assume_unique=True,
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
    )


@register(
    "corpus_soft_dedup_weights",
    _EDGE_CTE.replace("WITH sh", "WITH RECURSIVE sh", 1)
    + """
    , bidir AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ),
    walk(v, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, w.lab FROM walk w JOIN bidir b ON b.src = w.v
    ),
    comp AS (SELECT v AS doc_id, MIN(lab) AS component FROM walk GROUP BY v)
    SELECT doc_id, component,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
             AS cluster_size,
           ROUND(1.0 / COUNT(*) OVER (PARTITION BY component), 6) AS weight
    FROM comp
    """,
    doc="SOFT dedup: instead of dropping near-duplicates, downweight every "
    "document by 1/cluster_size over the same exact-Jaccard component "
    "graph dedup_cluster builds — the family's total sampling mass becomes "
    "one document's, but intra-family variation (edits, reformattings) "
    "stays available to training. The drop-vs-downweight choice is a "
    "curation policy knob; this entry makes both policies first-class "
    "over ONE clustering. Cost on top of the components: a single "
    "count-over-window on the (doc, component) table — one "
    "component-keyed exchange, no join-back. Exact recursive-CTE oracle, "
    "same as dedup_cluster.",
    tags=("llm", "curation", "iterative"),
)
def corpus_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs, k=3, threshold=0.2).select("id_a", "id_b")
    comp = connected_components(
        # the pair graph is unique (id_a < id_b, one row per pair from the
        # candidate groupBy) and stays so after symmetrization — skip the
        # operator's defensive full-edge-list distinct shuffle
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id",
        assume_unique=True,
    ).select(F.col("id").alias("doc_id"), "component")
    size = F.count(F.lit(1)).over(Window.partitionBy("component"))
    return comp.select(
        "doc_id",
        "component",
        size.cast("bigint").alias("cluster_size"),
        F.round(F.lit(1.0) / size, 6).alias("weight"),
    )
