"""Record linkage / entity resolution over document corpora.

The classic ER pipeline — block, score, decide, cluster, merge — re-expressed
as DataFrame stages. The reference delegates all query-side analytics to
Athena (sync-canvas-data-files.py:170-235 registers tables for Presto); this
family is part of the engine-extension scope (SURVEY.md §2, training-data
pipeline ops): before training on a multi-source 100 TB corpus you must
reconcile the same logical record arriving from several feeds, not just drop
byte-identical duplicates.

Stage shapes, and why they survive 1000 executors:

- **Blocking** (``candidate_pairs``) is the fan-out bound. Two independent
  equi-join passes — a structure key (lang, first token, token-count band)
  and a content key (first-k-token prefix) — each a hash-partitioned self-join on the
  blocking key, never a cross product. Multi-pass blocking is the standard
  recall hedge (a typo in the prefix still pairs via the structure key and
  vice versa); the union of passes is deduplicated on (id_a, id_b) with
  per-pass provenance preserved. At 100 TB you tighten the keys (finer
  bands, longer prefixes, add a rare-token pass) — the knob trades recall
  against join fan-out, and block-size quantiles are one groupBy away.
- **Scoring** (``score_pairs``) is row-local on the bounded candidate set:
  every field similarity (prefix Levenshtein, 3-shingle Jaccard via
  array_intersect, length ratio, lang/source agreement) is a JVM built-in
  on the pair row — no further shuffles, no Python, no re-exploded index.
  The weighted sum is a deterministic Fellegi-Sunter-style linear score
  with each component rounded to 6dp BEFORE weighting so the composite is
  reproducible across engines (the repo's registry determinism rule).
- **Decision** thresholds split match / review / nonmatch. The thresholds
  here are calibrated on the synthetic corpus (planted near-dup pairs score
  >= 0.72 while the background tops out at ~0.42 — a clean margin); a real
  deployment learns them from labeled pairs exactly like
  corpus_quality_classifier learns its weights.
- **Clustering** reuses operators/clustering.py::connected_components
  (min-label BSP, frontier propagation) over the match edges; canonical
  entity id = min doc_id of the cluster.
- **Survivorship** (``survivorship``) builds the golden record per entity
  with per-field merge rules (longest text wins the representative slot,
  modal lang, summed chars) — one groupBy + one window over entity_id,
  partition-friendly because entities are tiny and numerous.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from canvas_data_aws_spark.operators.dedup import normalize_text, word_shingles

#: Fixed prefix length for the Levenshtein field — bounds the DP cost per
#: pair at 60x60 cells regardless of document size (edit distance on full
#: 100 KiB documents would be O(len^2) per pair, a non-starter; the prefix
#: carries most of the signal for near-identical records).
LEV_PREFIX = 60

#: Token-count band width for the structure blocking key. Width 8 at test
#: scale; at corpus scale narrow it (and/or add keys) to keep the largest
#: block's pair count ~O(block^2) within a task's budget. The structure key
#: deliberately includes the FIRST TOKEN: a key built only from bounded
#: attributes (lang x band = fixed block count) makes pair count grow
#: O(n^2) with the corpus — the 100x probe run that caught it was heading
#: to ~3e9 pairs. The content component shards blocks with corpus
#: diversity; head-heavy first tokens show up in link_blocking_stats'
#: max_block before any candidate join is paid for.
TOKEN_BAND = 8

#: Number of leading tokens in the content blocking key.
PREFIX_TOKENS = 3

#: Component weights of the linear match score (sum to 1.0).
W_JACCARD, W_LEV, W_LEN, W_LANG, W_SOURCE = 0.4, 0.3, 0.15, 0.075, 0.075

#: Decision thresholds: >= MATCH_T -> match, >= REVIEW_T -> review band
#: (clerical review in classic ER), below -> nonmatch.
MATCH_T, REVIEW_T = 0.72, 0.45

#: score_pairs output floor — pairs below this carry no signal worth a row.
EMIT_T = 0.35


def prepared(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document linkage features, computed once and reused by every pass:
    normalized text, token count, prefix key, distinct 3-shingles."""
    norm = normalize_text(F.col(text_col))
    words = F.split(norm, " ")
    return docs.select(
        F.col(id_col).alias("id"),
        norm.alias("norm"),
        F.size(words).alias("n_tok"),
        F.element_at(words, 1).alias("first_tok"),
        F.concat_ws(" ", F.slice(words, 1, PREFIX_TOKENS)).alias("prefix_key"),
        word_shingles(F.col(text_col), 3).alias("sh3"),
        "lang",
        "source",
        "n_chars",
    )


def candidate_pairs(prep: DataFrame) -> DataFrame:
    """Multi-pass blocking: union of two bounded equi-join passes.

    Returns (id_a, id_b, in_structure_block, in_prefix_block) with
    id_a < id_b; provenance flags are OR-folded across passes so a pair
    found by both keeps both.
    """
    a, b = prep.alias("a"), prep.alias("b")
    structure = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.first_tok") == F.col("b.first_tok"))
        & ((F.col("a.n_tok") / TOKEN_BAND).cast("long") == (F.col("b.n_tok") / TOKEN_BAND).cast("long"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.lit(True).alias("in_structure_block"),
        F.lit(False).alias("in_prefix_block"),
    )
    prefix = a.join(
        b,
        (F.col("a.prefix_key") == F.col("b.prefix_key")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.lit(False).alias("in_structure_block"),
        F.lit(True).alias("in_prefix_block"),
    )
    return (
        structure.unionAll(prefix)
        .groupBy("id_a", "id_b")
        .agg(
            F.max("in_structure_block").alias("in_structure_block"),
            F.max("in_prefix_block").alias("in_prefix_block"),
        )
    )


def score_pairs(
    prep: DataFrame, cand: DataFrame, prep_b: DataFrame | None = None
) -> DataFrame:
    """Field similarities + composite score + decision for candidate pairs.

    Row-local after the two join-backs; every component rounded to 6dp
    before the weighted sum (cross-engine determinism). Emits only pairs
    with score >= EMIT_T. ``prep_b`` scores an asymmetric candidate set
    (id_a drawn from ``prep``, id_b from ``prep_b`` — the incremental
    delta-vs-base shape); default is the self-linkage case.
    """
    a = prep.alias("a")
    b = (prep_b if prep_b is not None else prep).alias("b")
    # Explicit repartition of the candidate table BEFORE the join-backs —
    # this is the parallelism fix, and its placement matters: Catalyst
    # pushes the score>=EMIT_T filter (whole Levenshtein expression
    # included) down into the join-back's join condition, so the CPU-heavy
    # work runs in the stage that reads the candidate exchange. AQE's
    # byte-based coalescing sees a byte-small pair table and collapsed
    # that stage to 2 tasks at sf0.1 (measured: 10.9 s, the 60x60
    # Levenshtein DP serialized on 2 of 32 cores); an explicit
    # numPartitions repartition is exempt from AQE coalescing, so the
    # scoring stage runs cluster-wide. A repartition placed AFTER the
    # join-backs does nothing — the pushed-down filter already did the
    # work below it.
    cand = cand.repartition(prep.sparkSession.sparkContext.defaultParallelism)
    raw = (
        cand.join(a, cand.id_a == F.col("a.id"))
        .join(b, cand.id_b == F.col("b.id"))
        .select(
            "id_a",
            "id_b",
            F.substring(F.col("a.norm"), 1, LEV_PREFIX).alias("__pa"),
            F.substring(F.col("b.norm"), 1, LEV_PREFIX).alias("__pb"),
            F.col("a.sh3").alias("__sa"),
            F.col("b.sh3").alias("__sb"),
            F.col("a.n_chars").alias("__ca"),
            F.col("b.n_chars").alias("__cb"),
            (F.col("a.lang") == F.col("b.lang")).cast("int").alias("lang_match"),
            (F.col("a.source") == F.col("b.source")).cast("int").alias("source_match"),
        )
    )
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    jac = F.round(inter / (F.size("__sa") + F.size("__sb") - inter), 6)
    lev_sim = F.round(
        1.0
        - F.levenshtein("__pa", "__pb")
        / F.greatest(F.length("__pa"), F.length("__pb")),
        6,
    )
    len_ratio = F.round(F.least("__ca", "__cb") / F.greatest("__ca", "__cb"), 6)

    # The weighted sum runs in EXACT DECIMAL arithmetic, not double: the
    # 6dp-rounded components times 3dp weights land on exact 7dp values,
    # and a double sum can sit a ULP on either side of the x.xxxxxx5
    # midpoint — measured: one sf0.01 pair scored 0.377205 (Spark double)
    # vs 0.377206 (DuckDB double). Decimal makes the midpoint exact and
    # both engines round it HALF_UP identically (verified).
    def _w(w: float):
        return F.expr(f"CAST({w} AS DECIMAL(4,3))")

    def _d6(c):
        return c.cast("decimal(18,6)")

    scored = raw.select(
        "id_a",
        "id_b",
        jac.alias("jac3"),
        lev_sim.alias("lev_sim"),
        len_ratio.alias("len_ratio"),
        "lang_match",
        "source_match",
    ).withColumn(
        "score",
        F.round(
            _w(W_JACCARD) * _d6(F.col("jac3"))
            + _w(W_LEV) * _d6(F.col("lev_sim"))
            + _w(W_LEN) * _d6(F.col("len_ratio"))
            + _w(W_LANG) * F.col("lang_match")
            + _w(W_SOURCE) * F.col("source_match"),
            6,
        ),
    )
    return scored.filter(F.col("score") >= _w(EMIT_T)).withColumn(
        "decision",
        F.when(F.col("score") >= _w(MATCH_T), F.lit("match"))
        .when(F.col("score") >= _w(REVIEW_T), F.lit("review"))
        .otherwise(F.lit("nonmatch")),
    )


def match_edges(prep: DataFrame) -> DataFrame:
    """(id_a, id_b) pairs the decision rule calls a match — the entity graph.

    Materialized eagerly (localCheckpoint): the edge set is tiny (bounded
    by the match population) while its lineage is the whole block+score
    pipeline — the BSP consumer would otherwise re-analyze that full plan
    every round and re-evaluate it for both the edge cache and the label
    seed."""
    return (
        score_pairs(prep, candidate_pairs(prep))
        .filter(F.col("decision") == "match")
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )


def survivorship(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Golden record per entity with per-field merge rules.

    - representative = member with the longest text (tie -> min doc_id):
      one row_number window over entity_id;
    - entity_lang = modal lang (tie -> lexicographically smallest):
      groupBy(entity, lang) count + one window;
    - total_chars / n_members: plain aggregates.

    Entities are tiny (cluster sizes bounded by the match graph) and
    numerous, so every window partition is small — the skew-safe shape.
    """
    mem = docs.join(clusters, "doc_id").select(
        "entity_id", "doc_id", "lang", "n_chars"
    )
    rep_w = Window.partitionBy("entity_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    rep = (
        mem.withColumn("rn", F.row_number().over(rep_w))
        .filter(F.col("rn") == 1)
        .select(
            "entity_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_n_chars"),
        )
    )
    lang_counts = mem.groupBy("entity_id", "lang").agg(F.count(F.lit(1)).alias("n"))
    lang_w = Window.partitionBy("entity_id").orderBy(
        F.col("n").desc(), F.col("lang").asc()
    )
    modal_lang = (
        lang_counts.withColumn("rn", F.row_number().over(lang_w))
        .filter(F.col("rn") == 1)
        .select("entity_id", F.col("lang").alias("entity_lang"))
    )
    stats = mem.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    return stats.join(rep, "entity_id").join(modal_lang, "entity_id")


def delta_candidates(delta_prep: DataFrame, base_prep: DataFrame) -> DataFrame:
    """Blocking passes for the incremental (day-2) shape: delta records on
    the left, the persisted base on the right — same two keys as
    ``candidate_pairs``, but no id ordering (the sides are disjoint
    universes by caller contract). The day's join fan-out is sized by the
    DELTA's block memberships, not base x base: at 100 TB the base side
    arrives pre-partitioned on its blocking keys (a write-time layout,
    like the attribute store) and only delta-sized work shuffles."""
    a, b = delta_prep.alias("a"), base_prep.alias("b")
    band_a = (F.col("a.n_tok") / TOKEN_BAND).cast("long")
    band_b = (F.col("b.n_tok") / TOKEN_BAND).cast("long")
    structure = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.first_tok") == F.col("b.first_tok"))
        & (band_a == band_b),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.lit(True).alias("in_structure_block"),
        F.lit(False).alias("in_prefix_block"),
    )
    prefix = a.join(b, F.col("a.prefix_key") == F.col("b.prefix_key")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.lit(False).alias("in_structure_block"),
        F.lit(True).alias("in_prefix_block"),
    )
    return (
        structure.unionAll(prefix)
        .groupBy("id_a", "id_b")
        .agg(
            F.max("in_structure_block").alias("in_structure_block"),
            F.max("in_prefix_block").alias("in_prefix_block"),
        )
    )


def incremental_match(
    delta_prep: DataFrame,
    base_prep: DataFrame,
    base_clusters: DataFrame,
    scored: DataFrame | None = None,
) -> DataFrame:
    """Day-2 entity assignment: score delta-vs-base candidates, take each
    delta record's best match (max score, tie -> min base id), adopt the
    matched base record's entity_id; unmatched deltas found NEW entities
    (entity_id = own id). The base is never rescored against itself —
    daily cost is delta-sized (the corpus_cross_dedup lesson applied to
    ER). ``base_clusters`` is the persisted (doc_id, entity_id) state;
    pass a precomputed ``scored`` table to share one scoring pass between
    assignment and the review queue (pipelines/link.py does)."""
    if scored is None:
        scored = score_pairs(
            delta_prep, delta_candidates(delta_prep, base_prep), prep_b=base_prep
        )
    best_w = Window.partitionBy("id_a").orderBy(F.col("score").desc(), F.col("id_b").asc())
    best = (
        scored.filter(F.col("decision") == "match")
        .withColumn("__rn", F.row_number().over(best_w))
        .filter(F.col("__rn") == 1)
        .select("id_a", "id_b", "score")
    )
    state = base_clusters.select(
        F.col("doc_id").alias("__base_doc"), F.col("entity_id").alias("__base_entity")
    )
    return (
        delta_prep.select(F.col("id").alias("doc_id"))
        .join(best, F.col("doc_id") == best.id_a, "left")
        .join(state, best.id_b == F.col("__base_doc"), "left")
        .select(
            F.col("doc_id"),
            F.coalesce(F.col("__base_entity"), F.col("doc_id")).alias("entity_id"),
            best.id_b.isNotNull().alias("matched"),
            best.score.cast("double").alias("best_score"),
        )
    )
