"""Distributed hashed-bag-of-words logistic classifier — the fastText-class
quality filter (DCLM / RedPajama-v2 style) trained INSIDE the engine.

The curation pipelines this repo models gate documents with a cheap linear
classifier over hashed token features (fastText's core trick: no vocabulary,
fixed feature dimension, hash buckets). The reference's pipeline has no
trainer at all (its analytics are delegated to Athena,
sync-canvas-data-files.py:170-235); this module supplies the missing
train-side primitive as full-batch gradient descent expressed in DataFrame
ops, so the SAME code trains on 500 rows or 100 TB:

- **Features** (`hashed_bow`): one scan, row-local tokenize + md5-bucket
  (the portable hash shared with text_hashing_vectorizer), then ONE
  (doc, bucket)-keyed aggregate with map-side combine. Long-form sparse
  output — a dense matrix never materializes. The model bias rides as a
  synthetic always-on feature (`bias_rows`, bucket=-1, x=1), so score,
  gradient, AND bias-gradient all flow through the same aggregates.
- **Training** (`logistic_gd`): T passes of deterministic full-batch GD.
  The feature table is hash-partitioned by doc once and persisted (persist,
  not localCheckpoint — the cached relation keeps hashpartitioning(id) in
  outputPartitioning, so every pass's per-doc score aggregate plans
  exchange-free); each pass is exactly ONE Spark job: score -> residual ->
  bucket-keyed gradient exchange (B+1 keys, map-side-combined) -> driver
  collect of B+1 doubles (the embed_kmeans bounded-collect contract).
  No RNG anywhere: init at zero, fixed pass count, so the fit is
  reproducible run-over-run and unrollable as chained SQL CTEs for the
  DuckDB oracle.
- **Scoring** (`logistic_score`): weights ride a broadcast map literal;
  one partitioning-reused per-doc aggregate.

Scale note (100 TB): per-pass cost is one (B+1)-key exchange over partial
aggregates — independent of corpus size after the map-side combine — plus
a scan of the cached feature table. T and B are hyperparameters (T=3,
B=64 here), so total driver traffic is T*(B+1) doubles. AUC evaluation
uses a range-partitioned two-level global rank (sort exchange + per-
partition offsets computed driver-side from one row per partition), never
a single-reducer window.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

BIAS_BUCKET = -1


def hashed_bow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    scale: float = 100.0,
) -> DataFrame:
    """Unsigned hashed-BOW features: (id, bucket, x) with x = token count
    in the bucket / ``scale``. One scan + one (doc, bucket) aggregate.

    Unsigned (not signed-hash) on purpose: the bucket counts sum to the
    document's token count, so a linear model can express length-aware
    quality rules — the signal fastText-class filters lean on hardest.
    """
    words = df.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")
        ).alias("word"),
    )
    feat = words.select(
        "id",
        _bucket_expr_from_word("word", n_buckets).alias("bucket"),
    )
    return feat.groupBy("id", "bucket").agg(
        (F.count(F.lit(1)) / F.lit(float(scale))).alias("x")
    )


def bias_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One (id, bucket=-1, x=1.0) row per document — the intercept as a
    synthetic always-on feature. Row-local on the source table (no
    exchange); union with hashed_bow so the per-doc score sum yields
    ``w[-1]`` as the bias and the gradient exchange yields its gradient
    in the same collect."""
    return df.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(id_col).alias("id"),
        F.lit(BIAS_BUCKET).cast("bigint").alias("bucket"),
        F.lit(1.0).alias("x"),
    )


def _bucket_expr_from_word(word_col: str, n_buckets: int):
    hexc = F.md5(word_col)
    nib = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(hexc, i, 1)) - 1  # noqa: E731
    return ((nib(1) * 16 + nib(2)) % n_buckets).cast("bigint")


def _weights_map(weights: dict[int, float]):
    # ONE parsed SQL map literal instead of 2*(B+1) py4j F.lit round trips:
    # the map is rebuilt EVERY GD pass with the updated weights, and the
    # create_map(*lits) form measured ~67 ms of driver-side py4j chatter
    # per build vs <1 ms for the parsed string (the literal count, not the
    # data, is the cost). repr() emits the shortest digits that round-trip
    # to the exact double and the 'D' suffix pins the DOUBLE literal type,
    # so the parsed map is value- and type-identical to the lit form
    # (pinned by test_weights_map_expr_matches_lit_form).
    items = ", ".join(f"{int(b)}, {float(weights[b])!r}D" for b in sorted(weights))
    return F.expr(f"map({items})")


def _doc_scores(features: DataFrame, weights: dict[int, float]) -> DataFrame:
    """(id, s): per-doc linear score (bias included via the bucket=-1
    feature row). groupBy('id') reuses the feature table's hash
    partitioning — no exchange after the one-time repartition."""
    wmap = _weights_map(weights)
    return features.groupBy("id").agg(
        F.sum(
            F.col("x") * F.coalesce(wmap[F.col("bucket").cast("int")], F.lit(0.0))
        ).alias("s")
    )


def materialize_features(features: DataFrame) -> DataFrame:
    """Hash-partition the feature table by doc and persist it — the layout
    every GD pass AND the final scoring pass reuse (groupBy('id') plans
    exchange-free off the cached partitioning). Callers that both fit and
    score should materialize once and pass ``materialized=True`` to
    :func:`logistic_gd`, so the explode + hash + aggregate feature build
    runs a single time instead of once for the fit and again for the
    score (the cache is released by the session's bench/driver cleanup)."""
    return features.repartition("id").persist()


def logistic_gd(
    features: DataFrame,
    labels: DataFrame,
    n_buckets: int = 64,
    lr: float = 0.5,
    passes: int = 3,
    materialized: bool = False,
) -> tuple[list[float], float]:
    """Full-batch logistic GD over long-form sparse features.

    ``features``: (id, bucket, x) INCLUDING the bias_rows; ``labels``:
    (id, y double in {0,1}). Returns (weights[b] for b in range(n_buckets),
    bias). Deterministic: zero init, fixed pass count, no sampling. Each
    pass is one job collecting B+1 doubles — bounded by the model
    dimension, never by the data (the embed_kmeans convention).

    ``materialized=True``: caller already ran :func:`materialize_features`
    and keeps using the table after the fit — skip the internal
    repartition/persist AND the unpersist (ownership stays with the
    caller).
    """
    feats = features if materialized else features.repartition("id").persist()
    # persist the label projection: every pass joins it, and at corpus
    # scale re-deriving labels per pass re-scans the corpus text (the
    # label rule reads the document body) — T scans for a table the count
    # below already materializes once. Local cost is a wash (measured);
    # the win is the T-1 avoided label-derivation scans at scale.
    labs = labels.select(F.col("id"), F.col("y").cast("double")).persist()
    n = labs.count()
    if n == 0:
        labs.unpersist()
        raise ValueError("logistic_gd: empty label set")
    w: dict[int, float] = {b: 0.0 for b in range(n_buckets)}
    w[BIAS_BUCKET] = 0.0
    for _ in range(passes):
        p_y = (
            _doc_scores(feats, w)
            .join(labs, "id")
            .select(
                "id",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s"))) - F.col("y")).alias(
                    "r"
                ),
            )
        )
        # gradient (weights AND bias): ONE (B+1)-key map-side-combined
        # exchange, ONE driver collect per pass
        grad_rows = (
            feats.join(p_y, "id")
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("r")) / F.lit(float(n))).alias("g"))
            .collect()
        )
        for row in grad_rows:
            w[int(row["bucket"])] -= lr * float(row["g"])
    if not materialized:
        feats.unpersist()
    labs.unpersist()
    return [w[b] for b in range(n_buckets)], w[BIAS_BUCKET]


def logistic_score(
    features: DataFrame, weights: list[float], bias: float
) -> DataFrame:
    """(id, s, p): linear score and sigmoid probability per document.
    ``features`` must include the bias_rows (bucket=-1 carries ``bias``)."""
    wd = {b: float(v) for b, v in enumerate(weights)}
    wd[BIAS_BUCKET] = float(bias)
    s = _doc_scores(features, wd)
    return s.select(
        "id", "s", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("s")))).alias("p")
    )


def global_rank(df: DataFrame, order_cols: list[str], out_col: str = "rank") -> DataFrame:
    """Exact global rank (1-based, input assumed unique on the order key)
    WITHOUT a single-reducer window: range-sort exchange, then
    per-partition row_number offset by the cumulative counts of earlier
    partitions. The counts table is one row per partition — collected and
    prefix-summed driver-side, re-attached as a map literal; never
    data-sized. The localCheckpoint pins the range boundaries so the
    partition ids seen by the count job and the rank job are the same
    sample. The scalable global-rank idiom for AUC / percentile jobs at
    any corpus size."""
    ordered = (
        df.orderBy(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ordered.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    # parsed map literal for the same py4j-chatter reason as _weights_map;
    # 'L' pins BIGINT offsets (the lit form was INT at test scale, LONG at
    # corpus scale — the sum below casts to bigint either way).
    off_map = F.expr(
        "map({})".format(
            ", ".join(
                f"{int(pid)}, {int(off)}L" for pid, off in sorted(offsets.items())
            )
        )
    )
    inner = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ordered.withColumn(
            out_col,
            (off_map[F.col("__pid")] + F.row_number().over(inner)).cast("bigint"),
        )
        .drop("__pid")
    )
