"""Record-linkage / entity-resolution query family (+ MMR diverse top-k).

Engine-extension scope (SURVEY.md §2, training-data pipeline ops): the
block -> score -> decide -> cluster -> merge ER pipeline over the documents
table, each stage its own oracle-checked entry, plus the MMR re-rank over
embeddings. The reference has no query engine of its own (it registers
tables for Athena: sync-canvas-data-files.py:170-235); this family is part
of the natively-implemented surface that replaces that delegation.

Determinism: every similarity component is rounded to 6dp before any
weighting/ranking decision, ties break on ids, and the DuckDB oracles
mirror the arithmetic term-for-term (registry rules).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.clustering import connected_components
from canvas_data_aws_spark.operators.linkage import (
    EMIT_T,
    LEV_PREFIX,
    MATCH_T,
    PREFIX_TOKENS,
    REVIEW_T,
    TOKEN_BAND,
    W_JACCARD,
    W_LANG,
    W_LEN,
    W_LEV,
    W_SOURCE,
    candidate_pairs,
    match_edges,
    prepared,
    score_pairs,
    survivorship,
)
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB), mirroring operators/linkage.py
# term-for-term. words[1:3] in DuckDB is 1-based inclusive = first 3 tokens
# = Spark slice(words, 1, 3).

_PREP = rf"""
    prep AS (
      SELECT doc_id AS id, norm,
             len(words) AS n_tok,
             words[1] AS first_tok,
             array_to_string(words[1:{PREFIX_TOKENS}], ' ') AS prefix_key,
             list_distinct([array_to_string(words[i:i+2], ' ')
                            for i in range(1, len(words) - 1)]) AS sh3,
             lang, source, n_chars
      FROM (SELECT doc_id,
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words,
                   lang, source, n_chars
            FROM documents)
    )"""

_CAND = f"""
    cand AS (
      SELECT id_a, id_b,
             BOOL_OR(s) AS in_structure_block,
             BOOL_OR(p) AS in_prefix_block
      FROM (
        SELECT a.id AS id_a, b.id AS id_b, TRUE AS s, FALSE AS p
        FROM prep a JOIN prep b
          ON a.lang = b.lang AND a.first_tok = b.first_tok
             AND a.n_tok // {TOKEN_BAND} = b.n_tok // {TOKEN_BAND}
             AND a.id < b.id
        UNION ALL
        SELECT a.id, b.id, FALSE, TRUE
        FROM prep a JOIN prep b
          ON a.prefix_key = b.prefix_key AND a.id < b.id
      ) GROUP BY id_a, id_b
    )"""

_SCORED = f"""
    scored AS (
      SELECT c.id_a, c.id_b,
             ROUND(len(list_intersect(a.sh3, b.sh3)) * 1.0
                   / (len(a.sh3) + len(b.sh3) - len(list_intersect(a.sh3, b.sh3))), 6) AS jac3,
             ROUND(1.0 - levenshtein(substr(a.norm, 1, {LEV_PREFIX}), substr(b.norm, 1, {LEV_PREFIX})) * 1.0
                   / greatest(len(substr(a.norm, 1, {LEV_PREFIX})), len(substr(b.norm, 1, {LEV_PREFIX}))), 6) AS lev_sim,
             ROUND(least(a.n_chars, b.n_chars) * 1.0 / greatest(a.n_chars, b.n_chars), 6) AS len_ratio,
             CAST(a.lang = b.lang AS INT) AS lang_match,
             CAST(a.source = b.source AS INT) AS source_match
      FROM cand c JOIN prep a ON c.id_a = a.id JOIN prep b ON c.id_b = b.id
    ),
    fin AS (
      -- exact DECIMAL weighted sum (not double): 6dp components x 3dp
      -- weights hit exact x.xxxxxx5 midpoints a double sum rounds
      -- engine-dependently; mirrors operators/linkage.py::score_pairs
      SELECT *, ROUND(CAST({W_JACCARD} AS DECIMAL(4,3)) * CAST(jac3 AS DECIMAL(18,6))
                      + CAST({W_LEV} AS DECIMAL(4,3)) * CAST(lev_sim AS DECIMAL(18,6))
                      + CAST({W_LEN} AS DECIMAL(4,3)) * CAST(len_ratio AS DECIMAL(18,6))
                      + CAST({W_LANG} AS DECIMAL(4,3)) * lang_match
                      + CAST({W_SOURCE} AS DECIMAL(4,3)) * source_match, 6) AS score
      FROM scored
    ),
    decided AS (
      SELECT id_a, id_b, jac3, lev_sim, len_ratio, lang_match, source_match, score,
             CASE WHEN score >= {MATCH_T} THEN 'match'
                  WHEN score >= {REVIEW_T} THEN 'review'
                  ELSE 'nonmatch' END AS decision
      FROM fin WHERE score >= {EMIT_T}
    )"""

_MATCH_EDGES = f"""
    edges AS (
      SELECT id_a, id_b FROM decided WHERE score >= {MATCH_T}
    )"""


def _clusters_cte() -> str:
    """Transitive closure by recursive label walk (same fixpoint as
    operators/clustering.py::connected_components' min-label BSP; MIN per
    vertex over all reachable seeds = min reachable id = component).

    Recursive formulation, NOT unrolled CTE rounds: an unrolled l{k+1}
    references l{k} twice (carry + propagate), and DuckDB inlines CTEs —
    measured 2^rounds blowup re-evaluating the expensive score chain
    (89.7 s unrolled vs 0.87 s recursive at sf0.01, identical rows). The
    heavy prefixes are MATERIALIZED for the same reason."""
    return """,
    bidir AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM edges
              UNION SELECT id_b, id_a FROM edges),
    walk(v, lab) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT b.dst, w.lab FROM walk w JOIN bidir b ON b.src = w.v
    ),
    clusters AS (SELECT v AS doc_id, MIN(lab) AS entity_id FROM walk GROUP BY v)"""


def _mat(fragment: str, cte: str) -> str:
    """Force MATERIALIZED on a named CTE inside a shared SQL fragment."""
    return fragment.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)


@register(
    "link_candidate_pairs",
    "WITH" + _PREP + "," + _CAND + """
    SELECT id_a, id_b, in_structure_block, in_prefix_block FROM cand
    """,
    doc="ER stage 1 — multi-pass blocking: union of a structure-key pass "
    "(lang, token-count band) and a content-key pass (first-3-token "
    "prefix), each a hash-partitioned equi-self-join, provenance flags "
    "OR-folded per pair. The blocking keys are the 100 TB fan-out bound "
    "(never all-pairs); multi-pass is the recall hedge — a record that "
    "slips one key still pairs via the other "
    "(operators/linkage.py::candidate_pairs).",
    tags=("linkage",),
)
def link_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep = prepared(load_table(spark, sf_dir, "documents"))
    return candidate_pairs(prep)


@register(
    "link_score_pairs",
    "WITH" + _PREP + "," + _CAND + "," + _SCORED + """
    SELECT * FROM decided
    """,
    doc="ER stage 2 — field-similarity scoring on the bounded candidate set: "
    "prefix-60 Levenshtein, 3-shingle Jaccard (array_intersect), length "
    "ratio, lang/source agreement; deterministic Fellegi-Sunter-style "
    "linear score (components rounded to 6dp before weighting) and "
    "match/review/nonmatch decision bands. Row-local JVM built-ins after "
    "the join-backs — no shuffle beyond the candidate join, no Python "
    "(operators/linkage.py::score_pairs). Calibrated on the synthetic "
    "corpus: planted near-dups >= 0.72, background <= ~0.42.",
    tags=("linkage",),
)
def link_score_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep = prepared(load_table(spark, sf_dir, "documents"))
    return score_pairs(prep, candidate_pairs(prep))


@register(
    "link_entity_clusters",
    "WITH RECURSIVE" + _mat(_PREP, "prep") + "," + _mat(_CAND, "cand") + ","
    + _mat(_SCORED, "decided") + "," + _MATCH_EDGES + _clusters_cte()
    + """
    SELECT doc_id, entity_id FROM clusters
    """,
    doc="ER stage 3 — entity formation: connected components (min-label BSP, "
    "operators/clustering.py) over the match-decision edges; entity_id = "
    "min doc_id of the cluster, singletons map to themselves. The oracle "
    "re-derives the fixpoint with a recursive label walk — the full "
    "block->score->decide->cluster pipeline value-checked end-to-end.",
    tags=("linkage", "iterative"),
)
def link_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = match_edges(prepared(docs).persist())
    return connected_components(
        # match edges are unique (id_a < id_b, one row per pair) and stay
        # so after symmetrization — skip the defensive distinct shuffle
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id",
        assume_unique=True,
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("entity_id"))


@register(
    "link_survivorship",
    "WITH RECURSIVE" + _mat(_PREP, "prep") + "," + _mat(_CAND, "cand") + ","
    + _mat(_SCORED, "decided") + "," + _MATCH_EDGES + _clusters_cte()
    + """
    , mem AS (
      SELECT c.entity_id, d.doc_id, d.lang, d.n_chars
      FROM documents d JOIN clusters c USING (doc_id)
    ),
    rep AS (
      SELECT entity_id, doc_id AS rep_doc_id, n_chars AS rep_n_chars
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY entity_id
                                         ORDER BY n_chars DESC, doc_id ASC) AS rn
            FROM mem) WHERE rn = 1
    ),
    modal AS (
      SELECT entity_id, lang AS entity_lang
      FROM (SELECT entity_id, lang,
                   ROW_NUMBER() OVER (PARTITION BY entity_id
                                      ORDER BY COUNT(*) DESC, lang ASC) AS rn
            FROM mem GROUP BY entity_id, lang) WHERE rn = 1
    ),
    stats AS (
      SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM mem GROUP BY entity_id
    )
    SELECT s.entity_id, s.n_members, s.total_chars, r.rep_doc_id,
           r.rep_n_chars, m.entity_lang
    FROM stats s JOIN rep r USING (entity_id) JOIN modal m USING (entity_id)
    """,
    doc="ER stage 4 — survivorship: the golden record per entity with "
    "per-field merge rules (representative = longest text, tie min doc_id; "
    "modal lang, tie lexicographic; summed chars; member count). One "
    "groupBy + two row_number windows, all partitioned by entity_id — "
    "entities are tiny and numerous, the skew-safe window shape "
    "(operators/linkage.py::survivorship).",
    tags=("linkage", "iterative"),
)
def link_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    edges = match_edges(prepared(docs).persist())
    clusters = connected_components(
        # match edges are unique (id_a < id_b, one row per pair) and stay
        # so after symmetrization — skip the defensive distinct shuffle
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id",
        assume_unique=True,
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("entity_id"))
    return survivorship(docs, clusters).select(
        "entity_id", "n_members", "total_chars", "rep_doc_id", "rep_n_chars", "entity_lang"
    )


def _mmr_oracle(k: int = 8, pool: int = 32, lam: float = 0.7) -> str:
    """Unrolled greedy MMR: step i's winner via one MATERIALIZED CTE chain
    (plain CTEs re-inline and re-evaluate the whole prefix per step —
    measured exponential blowup; MATERIALIZED keeps it linear)."""
    one_m_lam = round(1.0 - lam, 10)
    sql = f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    rel AS (
      SELECT e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS relevance,
             CAST(e.embedding AS DOUBLE[]) AS v
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    ),
    pool AS MATERIALIZED (
      SELECT vec_id, relevance, v FROM rel
      ORDER BY relevance DESC, vec_id ASC LIMIT {pool}
    ),
    sel1 AS MATERIALIZED (
      SELECT 1 AS rank, vec_id, relevance, 0.0 AS max_sim,
             ROUND(CAST({lam} AS DECIMAL(4,3)) * CAST(relevance AS DECIMAL(18,6)), 6) AS mmr_score, v
      FROM pool ORDER BY relevance DESC, vec_id ASC LIMIT 1
    ),
    all1 AS MATERIALIZED (SELECT * FROM sel1)"""
    for i in range(2, k + 1):
        p = i - 1
        sql += f""",
    cand{i} AS (
      SELECT c.vec_id, c.relevance, c.v,
             ROUND(MAX(list_cosine_similarity(c.v, s.v)), 6) AS max_sim
      FROM pool c CROSS JOIN all{p} s
      WHERE c.vec_id NOT IN (SELECT vec_id FROM all{p})
      GROUP BY c.vec_id, c.relevance, c.v
    ),
    sel{i} AS MATERIALIZED (
      SELECT {i} AS rank, vec_id, relevance, max_sim,
             ROUND(CAST({lam} AS DECIMAL(4,3)) * CAST(relevance AS DECIMAL(18,6))
                   - CAST({one_m_lam} AS DECIMAL(4,3)) * CAST(max_sim AS DECIMAL(18,6)), 6) AS mmr_score, v
      FROM cand{i}
      ORDER BY ROUND(CAST({lam} AS DECIMAL(4,3)) * CAST(relevance AS DECIMAL(18,6))
                     - CAST({one_m_lam} AS DECIMAL(4,3)) * CAST(max_sim AS DECIMAL(18,6)), 6) DESC, vec_id ASC
      LIMIT 1
    ),
    all{i} AS MATERIALIZED (SELECT * FROM all{p} UNION ALL SELECT * FROM sel{i})"""
    sql += f"""
    SELECT CAST(rank AS INT) AS rank, vec_id, relevance, max_sim,
           CAST(mmr_score AS DOUBLE) AS mmr_score
    FROM all{k}"""
    return sql


@register(
    "sim_search_mmr",
    _mmr_oracle(8, 32, 0.7),
    doc="Maximal Marginal Relevance diverse top-8 (lambda=0.7) over a "
    "top-32 relevance pool for the vec_id=0 query: one distributed corpus "
    "scan fused to TakeOrderedAndProject builds the pool, then k-1 greedy "
    "rounds each collect exactly ONE winner row and fold its similarity "
    "into a running greatest() column — O(k*pool) work, driver traffic "
    "bounded by k rows (operators/similarity.py::mmr_select). Oracle: the "
    "same greedy unrolled as 8 MATERIALIZED-CTE steps — an iterative "
    "argmax pipeline value-checked step-for-step.",
    tags=("similarity", "iterative"),
)
def sim_search_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.similarity import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()["embedding"]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    return mmr_select(corpus, qvec, k=8, pool_size=32, lam=0.7)


# ---------------------------------------------------------------------------
# Incremental (day-2) linkage + blocking audit (round 13, session 2).
# Parametrized oracle builders mirroring the operators on arbitrary
# left/right prep CTEs (the shared fragments above hardcode the
# self-linkage shape; these keep the formulas in one place for the
# asymmetric delta-vs-base shape).

#: Deterministic day-2 split: ~20% of documents arrive as "today's delta".
DELTA_PRED = "doc_id % 10 >= 8"


def _cand_sql(cte: str, a: str, b: str, pred: str) -> str:
    return f"""
    {cte} AS MATERIALIZED (
      SELECT id_a, id_b,
             BOOL_OR(s) AS in_structure_block,
             BOOL_OR(p) AS in_prefix_block
      FROM (
        SELECT a.id AS id_a, b.id AS id_b, TRUE AS s, FALSE AS p
        FROM {a} a JOIN {b} b
          ON a.lang = b.lang AND a.first_tok = b.first_tok
             AND a.n_tok // {TOKEN_BAND} = b.n_tok // {TOKEN_BAND}
             AND {pred}
        UNION ALL
        SELECT a.id, b.id, FALSE, TRUE
        FROM {a} a JOIN {b} b
          ON a.prefix_key = b.prefix_key AND {pred}
      ) GROUP BY id_a, id_b
    )"""


def _decided_sql(cte: str, cand: str, a: str, b: str) -> str:
    return f"""
    {cte} AS MATERIALIZED (
      SELECT id_a, id_b, score,
             CASE WHEN score >= {MATCH_T} THEN 'match'
                  WHEN score >= {REVIEW_T} THEN 'review'
                  ELSE 'nonmatch' END AS decision
      FROM (
        SELECT id_a, id_b,
               ROUND(CAST({W_JACCARD} AS DECIMAL(4,3)) * CAST(jac3 AS DECIMAL(18,6))
                     + CAST({W_LEV} AS DECIMAL(4,3)) * CAST(lev_sim AS DECIMAL(18,6))
                     + CAST({W_LEN} AS DECIMAL(4,3)) * CAST(len_ratio AS DECIMAL(18,6))
                     + CAST({W_LANG} AS DECIMAL(4,3)) * lang_match
                     + CAST({W_SOURCE} AS DECIMAL(4,3)) * source_match, 6) AS score
        FROM (
          SELECT c.id_a, c.id_b,
                 ROUND(len(list_intersect(a.sh3, b.sh3)) * 1.0
                       / (len(a.sh3) + len(b.sh3) - len(list_intersect(a.sh3, b.sh3))), 6) AS jac3,
                 ROUND(1.0 - levenshtein(substr(a.norm, 1, {LEV_PREFIX}), substr(b.norm, 1, {LEV_PREFIX})) * 1.0
                       / greatest(len(substr(a.norm, 1, {LEV_PREFIX})), len(substr(b.norm, 1, {LEV_PREFIX}))), 6) AS lev_sim,
                 ROUND(least(a.n_chars, b.n_chars) * 1.0 / greatest(a.n_chars, b.n_chars), 6) AS len_ratio,
                 CAST(a.lang = b.lang AS INT) AS lang_match,
                 CAST(a.source = b.source AS INT) AS source_match
          FROM {cand} c JOIN {a} a ON c.id_a = a.id JOIN {b} b ON c.id_b = b.id
        )
      ) WHERE score >= {EMIT_T}
    )"""


_INCREMENTAL_ORACLE = (
    "WITH RECURSIVE"
    + _mat(_PREP, "prep")
    + f""",
    base AS (SELECT * FROM prep WHERE NOT (id % 10 >= 8)),
    delta AS (SELECT * FROM prep WHERE id % 10 >= 8),"""
    + _cand_sql("cand_b", "base", "base", "a.id < b.id")
    + ","
    + _decided_sql("decided_b", "cand_b", "base", "base")
    + f""",
    edges AS (SELECT id_a, id_b FROM decided_b WHERE score >= {MATCH_T}),
    bidir AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM edges
              UNION SELECT id_b, id_a FROM edges),
    walk(v, lab) AS (
      SELECT id, id FROM base
      UNION
      SELECT b.dst, w.lab FROM walk w JOIN bidir b ON b.src = w.v
    ),
    clusters_b AS MATERIALIZED (SELECT v AS doc_id, MIN(lab) AS entity_id FROM walk GROUP BY v),"""
    + _cand_sql("cand_d", "delta", "base", "TRUE")
    + ","
    + _decided_sql("decided_d", "cand_d", "delta", "base")
    + f""",
    best AS (
      SELECT id_a, id_b, score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a
                                     ORDER BY score DESC, id_b ASC) AS rn
        FROM decided_d WHERE score >= {MATCH_T}
      ) WHERE rn = 1
    )
    SELECT d.id AS doc_id,
           COALESCE(c.entity_id, d.id) AS entity_id,
           (b.id_b IS NOT NULL) AS matched,
           CAST(b.score AS DOUBLE) AS best_score
    FROM delta d
    LEFT JOIN best b ON b.id_a = d.id
    LEFT JOIN clusters_b c ON c.doc_id = b.id_b
    """
)


@register(
    "link_incremental_match",
    _INCREMENTAL_ORACLE,
    doc="Day-2 entity resolution: today's delta (~20% of documents by a "
    "deterministic split) is blocked and scored against the PERSISTED base "
    "only — base x base is never rescored, so daily cost is delta-sized "
    "(the corpus_cross_dedup lesson applied to ER). Each delta record "
    "adopts its best match's entity (max score, tie -> min base id) or "
    "founds a new entity. The oracle re-derives the base entity state "
    "(recursive label walk over base-only match edges) and the asymmetric "
    "delta-vs-base scoring with the same DECIMAL-exact arithmetic "
    "(operators/linkage.py::incremental_match).",
    tags=("linkage", "iterative"),
)
def link_incremental_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.linkage import delta_candidates, incremental_match  # noqa: F401

    docs = load_table(spark, sf_dir, "documents")
    base_docs = docs.filter(~(F.col("doc_id") % 10 >= 8))
    delta_docs = docs.filter(F.col("doc_id") % 10 >= 8)
    base_prep = prepared(base_docs).persist()  # feeds base x base AND delta x base
    base_clusters = connected_components(
        base_docs.select(F.col("doc_id").alias("id")),
        match_edges(base_prep),
        vertex_col="id",
        assume_unique=True,  # unique id_a < id_b match pairs
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("entity_id"))
    return incremental_match(prepared(delta_docs).persist(), base_prep, base_clusters)


@register(
    "link_blocking_stats",
    "WITH" + _PREP + f""",
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS sz
      FROM prep GROUP BY lang, first_tok, n_tok // {TOKEN_BAND}
    ),
    p AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS sz
      FROM prep GROUP BY prefix_key
    )
    SELECT 'structure' AS pass_name,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(MAX(sz) AS BIGINT) AS max_block,
           CAST(SUM(sz * (sz - 1) / 2) AS BIGINT) AS candidate_pairs
    FROM s
    UNION ALL
    SELECT 'prefix', CAST(COUNT(*) AS BIGINT), CAST(MAX(sz) AS BIGINT),
           CAST(SUM(sz * (sz - 1) / 2) AS BIGINT)
    FROM p
    """,
    doc="Blocking-quality audit — the readout an ER pipeline consults "
    "BEFORE paying for scoring: per pass, block count, largest block, and "
    "the exact pair mass sum C(g,2) the pass will generate. The largest "
    "block bounds the worst task (pair generation is O(block^2)); at "
    "corpus scale this one cheap groupBy decides whether the blocking "
    "keys need narrowing (the module-doc knob) before the candidate join "
    "is ever run.",
    tags=("linkage",),
)
def link_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep = prepared(load_table(spark, sf_dir, "documents"))
    struct = (
        prep.groupBy("lang", "first_tok", (F.col("n_tok") / TOKEN_BAND).cast("long"))
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.lit("structure").alias("pass_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.max("sz").cast("bigint").alias("max_block"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("bigint").alias("candidate_pairs"),
        )
    )
    pref = (
        prep.groupBy("prefix_key")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.lit("prefix").alias("pass_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.max("sz").cast("bigint").alias("max_block"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("bigint").alias("candidate_pairs"),
        )
    )
    return struct.unionAll(pref)


_EVAL_TRUTH_T = 0.8

_EVAL_ORACLE = (
    "WITH" + _mat(_PREP, "prep") + "," + _mat(_CAND, "cand") + "," + _SCORED
    + f""",
    predicted AS (SELECT id_a, id_b FROM decided WHERE score >= {MATCH_T}),
    ex AS (SELECT id, len(sh3) AS n_sh, unnest(sh3) AS shingle FROM prep),
    truth AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
      HAVING ROUND(COUNT(*) * 1.0 / (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)), 6)
             >= {_EVAL_TRUTH_T}
    ),
    j AS (
      SELECT COALESCE(t.id_a, p.id_a) AS id_a,
             (t.id_a IS NOT NULL) AS is_true,
             (p.id_a IS NOT NULL) AS is_pred
      FROM truth t FULL OUTER JOIN predicted p
        ON t.id_a = p.id_a AND t.id_b = p.id_b
    )
    SELECT CAST(COUNT(*) FILTER (is_true AND is_pred) AS BIGINT) AS tp,
           CAST(COUNT(*) FILTER (is_pred AND NOT is_true) AS BIGINT) AS fp,
           CAST(COUNT(*) FILTER (is_true AND NOT is_pred) AS BIGINT) AS fn,
           ROUND(COUNT(*) FILTER (is_true AND is_pred) * 1.0
                 / NULLIF(COUNT(*) FILTER (is_pred), 0), 6) AS precision,
           ROUND(COUNT(*) FILTER (is_true AND is_pred) * 1.0
                 / NULLIF(COUNT(*) FILTER (is_true), 0), 6) AS recall
    FROM j
    """
)


@register(
    "link_eval_truth",
    _EVAL_ORACLE,
    doc="ER evaluation harness: precision/recall of the match decision rule "
    "against an INDEPENDENT ground truth — exact 3-shingle Jaccard >= 0.8 "
    "pairs found by the inverted-index join (operators/dedup.py::"
    "ngram_jaccard_pairs, exact mode: a pair at that similarity must share "
    "shingles, so the index finds ALL of them — no all-pairs scan). A "
    "missed truth pair counts against recall whether blocking dropped it "
    "or scoring under-called it: this is the joint number an ER deployment "
    "reports, and the regression canary for any future blocking-key or "
    "weight change. One row: tp/fp/fn/precision/recall.",
    tags=("linkage",),
)
def link_eval_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import (
        ngram_jaccard_pairs_from_shingles,
        spread,
    )

    docs = load_table(spark, sf_dir, "documents")
    # ONE text scan + shingling pass for BOTH legs (r14): prepared()'s sh3
    # IS word_shingles(text, 3) — the identical column the truth index
    # used to recompute from text via its own ngram_jaccard_pairs scan.
    # Materialize prepared() once (eager localCheckpoint) and feed the
    # truth index from its sh3 and the blocking/scoring legs from the
    # same table — this also stops candidate_pairs' two self-join passes
    # and score_pairs' two join-backs from re-running normalize+split+
    # shingle per leg (6 evaluations before). The r13 persist experiment
    # that lost (+1.0 s) only served the predicted leg and left the truth
    # leg's independent shingling pass in place — this shape replaces
    # BOTH. spread() before the fill: the checkpoint's evaluation would
    # otherwise inherit the scan's (possibly single-file) parallelism.
    prep = prepared(spread(docs)).localCheckpoint(eager=True)
    truth = ngram_jaccard_pairs_from_shingles(
        prep.select("id", F.col("sh3").alias("shingles")), threshold=_EVAL_TRUTH_T
    ).select("id_a", "id_b", F.lit(True).alias("is_true"))
    predicted = (
        score_pairs(prep, candidate_pairs(prep))
        .filter(F.col("decision") == "match")
        .select("id_a", "id_b", F.lit(True).alias("is_pred"))
    )
    j = truth.join(predicted, ["id_a", "id_b"], "full_outer").select(
        F.coalesce("is_true", F.lit(False)).alias("is_true"),
        F.coalesce("is_pred", F.lit(False)).alias("is_pred"),
    )
    tp = F.sum((F.col("is_true") & F.col("is_pred")).cast("long"))
    fp = F.sum((F.col("is_pred") & ~F.col("is_true")).cast("long"))
    fn = F.sum((F.col("is_true") & ~F.col("is_pred")).cast("long"))
    npred = F.sum(F.col("is_pred").cast("long"))
    ntrue = F.sum(F.col("is_true").cast("long"))
    return j.agg(
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        F.round(tp / F.nullif(npred, F.lit(0)), 6).alias("precision"),
        F.round(tp / F.nullif(ntrue, F.lit(0)), 6).alias("recall"),
    )
