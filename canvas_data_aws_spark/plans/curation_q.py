"""Corpus-curation queries: decontamination, quality filtering, splits,
n-gram tables, corpus stats (training-data-pipeline extension scope).

Every operator here is exact and engine-portable (shingles are plain
strings, the split bucket is pure arithmetic), so each carries a full
DuckDB oracle — no rows-only entries in this module.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.curation import (
    corpus_stats,
    decontaminate,
    deterministic_split,
    ngram_top_k,
    quality_filter,
)
from canvas_data_aws_spark.plans.registry import register
from canvas_data_aws_spark.sources.parquet import load_table

#: DuckDB k-word shingle CTE fragment (matches operators/dedup.word_shingles:
#: normalize -> split -> k-slide -> distinct). Verified token-identical to
#: the Spark formulation on the documents fixture.
_SHINGLES_CTE = r"""
w AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS words
  FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+{km1}], ' ')
                        FOR i IN generate_series(1, greatest(len(words)-{km1}, 0))]) AS shingles
  FROM w
)
"""


@register(
    "corpus_decontaminate",
    "WITH "
    + _SHINGLES_CTE.format(km1=7)
    + """,
    ev AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 20 = 0),
    tr AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE doc_id % 20 <> 0),
    hits AS (SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tr
             JOIN ev USING (shingle) GROUP BY tr.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_eval_hits,
           COALESCE(h.n, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
    LEFT JOIN hits h USING (doc_id)
    """,
    doc="Eval-set decontamination: train docs sharing >=1 distinct 8-word "
    "shingle with the eval slice are flagged. The eval shingle universe "
    "broadcasts (eval suites are tiny); the corpus side is one scan + one "
    "per-doc rollup — no corpus-vs-corpus pairing.",
)
def corpus_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(train, eval_df, k=8, min_hits=1)


@register(
    "corpus_quality_filter",
    r"""
    WITH f AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\b(?:the|and|of)\b')) AS n_stop
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             n_chars BETWEEN 100 AND 1000000 AS r_len,
             ROUND((n_chars - n_tokens + 1) / n_tokens, 6) BETWEEN 3.0 AND 10.0 AS r_word_len,
             ROUND(n_punct / GREATEST(n_chars, 1), 6) <= 0.2 AS r_punct,
             ROUND(n_stop / GREATEST(n_tokens, 1), 6) >= 0.01 AS r_stop
      FROM f
    )
    SELECT doc_id, r_len, r_word_len, r_punct, r_stop,
           r_len AND r_word_len AND r_punct AND r_stop AS keep
    FROM r
    """,
    doc="C4/Gopher-style quality-filter chain: per-rule boolean columns "
    "(length, mean word length, punctuation ratio, stopword ratio) plus "
    "the keep conjunction — row-local, one scan, filter-rate accountable.",
)
def corpus_quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_filter(docs, min_stop_ratio=0.01)
    return out.select("doc_id", "r_len", "r_word_len", "r_punct", "r_stop", "keep")


@register(
    "corpus_split",
    f"""
    SELECT doc_id,
           (doc_id * 1103515245 + 12345) % 1000 AS split_bucket,
           CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < 800 THEN 'train'
                WHEN (doc_id * 1103515245 + 12345) % 1000 < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="Deterministic train/val/test split: pure-arithmetic LCG bucket of "
    "the id — engine-portable, stable under corpus growth (no randomSplit "
    "reshuffling), no shuffle at all (row-local projection).",
)
def corpus_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_split(docs, "doc_id").select("doc_id", "split_bucket", "split")


@register(
    "corpus_ngram_top_k",
    "WITH "
    + _SHINGLES_CTE.format(km1=1)
    + """
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest(shingles) AS ngram FROM sh)
    GROUP BY ngram
    ORDER BY doc_freq DESC, ngram
    LIMIT 100
    """,
    doc="Top-100 bigram document-frequency table (contamination scans, "
    "boilerplate detection): explode -> partial-agg count; the shuffle "
    "carries (ngram, partial count) pairs, never documents. Deterministic "
    "order (freq DESC, ngram ASC) fuses to TakeOrderedAndProject.",
)
def corpus_ngram_top_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_top_k(docs, n=2, top=100)


@register(
    "corpus_stats",
    r"""
    WITH per_doc AS (
      SELECT LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
      FROM documents
    ),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab_size
      FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
            FROM documents)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_tokens), 6) AS avg_doc_tokens,
           (SELECT vocab_size FROM vocab) AS vocab_size
    FROM per_doc
    """,
    doc="One-row corpus summary (docs, chars, tokens, vocabulary, mean doc "
    "length): single scan + global aggregate; only the vocabulary distinct "
    "shuffles tokens.",
)
def corpus_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return corpus_stats(docs)


@register(
    "corpus_tfidf_top_terms",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    docfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(n.n_docs / docfreq.df), 4) AS tfidf
      FROM tf JOIN docfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
    FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    doc="Per-document top-3 TF-IDF terms: token explode -> (doc, term) "
    "count -> document-frequency join -> per-doc top-k window. The "
    "docfreq join is a plain equi-join on term: raw-web vocabulary is "
    "unbounded (URLs, ids, typos), so no broadcast hint — docfreq arrives "
    "already partitioned on term from its agg, tf re-shuffles on term "
    "once, and AQE still broadcasts genuinely small vocabularies at "
    "runtime. Ordering uses the ROUNDED score plus term tie-break so "
    "ranks are engine-portable.",
    tags=("curation",),
)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "corpus_sample_stratified",
    """
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn % 10 = 1
    """,
    doc="Proportional stratified sample (10% per language stratum, "
    "systematic over doc_id order): exact per-stratum allocation via one "
    "window. NOTE the window is one partition per stratum — right for "
    "bounded strata (languages, sources); for huge strata at 100 TB use "
    "the row-local arithmetic-LCG filter (corpus_split) which needs no "
    "shuffle at all.",
    tags=("curation",),
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 10 == 1)
        .select("doc_id", "lang")
    )


@register(
    "corpus_chunk_sliding",
    """
    WITH positions AS (
      SELECT doc_id, text, unnest(generate_series(1, GREATEST(n_chars, 1), 80)) AS pos
      FROM documents
    )
    SELECT doc_id,
           CAST((pos - 1) / 80 AS INT) AS chunk_id,
           md5(substring(text, pos, 120)) AS chunk_md5,
           CAST(length(substring(text, pos, 120)) AS INT) AS chunk_len
    FROM positions
    """,
    doc="Sliding-window document chunking (120-char window, 80-char stride "
    "-> 40-char overlap): start offsets come from sequence()+explode so "
    "chunking is a row-local flatMap — the context-length packing "
    "preprocessor for training pipelines. Zero shuffle; md5 of each chunk "
    "keeps the oracle comparison exact without shipping chunk text.",
    tags=("curation", "llm"),
)
def corpus_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("n_chars"), F.lit(1)).cast("int"), F.lit(80))
        ).alias("pos"),
    )
    chunk = F.substring(F.col("text"), F.col("pos"), 120)
    return pos.select(
        "doc_id",
        ((F.col("pos") - 1) / 80).cast("int").alias("chunk_id"),
        F.md5(chunk).alias("chunk_md5"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )


@register(
    "corpus_repeated_passages",
    "WITH "
    + _SHINGLES_CTE.format(km1=2)
    + """
    , ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
      FROM sh WHERE len(shingles) > 0
    ),
    dfq AS (SELECT shingle, COUNT(*) AS dfreq FROM ex GROUP BY shingle)
    SELECT e.doc_id,
           CAST(ANY_VALUE(e.n_sh) AS INT) AS n_shingles,
           CAST(SUM(CASE WHEN d.dfreq >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           ROUND(SUM(CASE WHEN d.dfreq >= 3 THEN 1 ELSE 0 END)::DOUBLE
                 / ANY_VALUE(e.n_sh), 4) AS common_frac
    FROM ex e JOIN dfq d USING (shingle)
    GROUP BY e.doc_id
    """,
    doc="Repeated-passage coverage: for every document, the fraction of its "
    "3-word shingles that occur in >= 3 distinct documents — the "
    "boilerplate / template-contamination signal used to drop "
    "mostly-duplicated pages that exact and near-dup dedup both miss "
    "(navigation chrome, license headers, mirrored passages). Shape: "
    "shingles are distinct-per-doc, so doc-frequency is a COUNT over a "
    "window partitioned by shingle — ONE exchange on the shingle key and "
    "no second shingle-explosion pass (the groupBy-then-join-back "
    "formulation shuffles the exploded table twice and measured 2x "
    "slower); the per-doc rollup is one doc_id exchange. Both shapes "
    "expose the same stopword-shingle skew at 100 TB — production runs "
    "put a doc-frequency cap in front (dedup_ngram_jaccard's max_doc_freq "
    "knob) before this pass.",
    tags=("llm", "curation"),
)
def corpus_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from canvas_data_aws_spark.operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))
    ex = sh.filter(F.col("n_sh") > 0).select(
        "doc_id", "n_sh", F.explode("shingles").alias("shingle")
    )
    exf = ex.withColumn("dfreq", F.count("*").over(Window.partitionBy("shingle")))
    common = F.sum(F.when(F.col("dfreq") >= 3, 1).otherwise(0))
    return exf.groupBy("doc_id").agg(
        F.first("n_sh").cast("int").alias("n_shingles"),
        common.cast("bigint").alias("n_common"),
        F.round(common / F.first("n_sh"), 4).alias("common_frac"),
    )


@register(
    "corpus_curation_funnel",
    "WITH "
    + _SHINGLES_CTE.format(km1=7)
    + r"""
    , norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
               FROM documents),
    surv AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY nt),
    f AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\b(?:the|and|of)\b')) AS n_stop
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             (n_chars BETWEEN 100 AND 1000000)
             AND (ROUND((n_chars - n_tokens + 1) / n_tokens, 6) BETWEEN 3.0 AND 10.0)
             AND (ROUND(n_punct / GREATEST(n_chars, 1), 6) <= 0.2)
             AND (ROUND(n_stop / GREATEST(n_tokens, 1), 6) >= 0.01) AS keep
      FROM f
    ),
    ev AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh WHERE doc_id % 20 = 0),
    tr AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh WHERE doc_id % 20 <> 0),
    hits AS (SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tr
             JOIN ev USING (shingle) GROUP BY tr.doc_id),
    flags AS (
      SELECT d.doc_id,
             s.doc_id IS NOT NULL AS is_exact,
             COALESCE(r.keep, FALSE) AS passes_q,
             d.doc_id % 20 <> 0 AS is_train,
             COALESCE(h.n, 0) >= 1 AS contaminated
      FROM documents d
      LEFT JOIN surv s ON s.doc_id = d.doc_id
      LEFT JOIN r ON r.doc_id = d.doc_id
      LEFT JOIN hits h ON h.doc_id = d.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN is_exact AND passes_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN is_exact AND passes_q AND is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN is_exact AND passes_q AND is_train AND NOT contaminated
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
    FROM flags
    """,
    doc="End-to-end curation funnel — the accountable one-row report a "
    "training-data pipeline publishes per snapshot: raw docs -> exact-dedup "
    "survivors (min doc_id per normalized-text group) -> quality-rule "
    "passers -> train-slice members -> eval-decontaminated. Each stage "
    "reuses the exact operator semantics of dedup_exact, "
    "corpus_quality_filter and corpus_decontaminate; the stages compose as "
    "per-doc boolean flags joined on doc_id, and the whole funnel "
    "aggregates to ONE row with map-side partial conditional sums — so the "
    "100 TB cost is the three underlying passes plus doc_id-keyed flag "
    "joins, never a per-stage rescan of text. The eval shingle universe "
    "stays bounded (eval suites are tiny); the exact-dedup and quality "
    "flags are one scan each.",
    tags=("llm", "curation"),
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import dedup_exact

    docs = load_table(spark, sf_dir, "documents")
    surv = dedup_exact(docs).select(
        F.col("kept_id").alias("doc_id"), F.lit(True).alias("is_exact")
    )
    q = quality_filter(docs.select("doc_id", "text"), min_stop_ratio=0.01).select(
        "doc_id", F.col("keep").alias("passes_q")
    )
    eval_df = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    cont = decontaminate(train, eval_df, k=8, min_hits=1).select(
        "doc_id", "contaminated"
    )
    flags = (
        docs.select("doc_id")
        .join(surv, "doc_id", "left")
        .join(q, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .select(
            F.coalesce("is_exact", F.lit(False)).alias("is_exact"),
            F.coalesce("passes_q", F.lit(False)).alias("passes_q"),
            (F.col("doc_id") % 20 != 0).alias("is_train"),
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )
    def cnt(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    e, p, t, c = (
        F.col("is_exact"),
        F.col("passes_q"),
        F.col("is_train"),
        F.col("contaminated"),
    )
    return flags.agg(
        F.count("*").alias("n_raw"),
        cnt(e).alias("n_exact"),
        cnt(e & p).alias("n_quality"),
        cnt(e & p & t).alias("n_train"),
        cnt(e & p & t & ~c).alias("n_clean"),
    )


@register(
    "corpus_unigram_logprob",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
      FROM documents
      WHERE LENGTH(trim(text)) > 0
    ),
    freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    tot AS (SELECT SUM(n) AS total FROM freq)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-ln(f.n / tot.total)), 4) AS avg_neg_logprob
    FROM toks t JOIN freq f USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    doc="Unigram-LM scoring — the cheap 'perplexity' proxy quality "
    "pipelines use to rank documents before an expensive model pass: "
    "corpus-wide unigram frequencies (one token-key exchange, map-side "
    "partial counts), each document scored by its mean negative "
    "log-probability under that LM. High scores = rare-token-heavy docs "
    "(gibberish, codes, OCR noise); low = templated/common text. The "
    "frequency table is vocabulary-sized — joined on the token key with "
    "NO broadcast hint (unbounded on raw web text; AQE decides), and the "
    "grand-total is a one-row crossJoin. Per-doc rollup is one doc_id "
    "exchange. Plan note: the tokenization (scan + regex split + explode) "
    "feeds two consumers (frequency agg, scoring join) and re-runs per "
    "consumer here; a 100 TB run materializes the token table once and "
    "both passes read it — the re-tokenization is a deliberate "
    "small-scale trade, not a hidden cost.",
    tags=("llm", "curation"),
)
def corpus_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = docs.select(
        "doc_id", F.explode(F.split(norm, " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("n") / F.col("total"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


@register(
    "corpus_cross_dedup",
    r"""
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    state AS (SELECT nt FROM norm WHERE doc_id % 10 < 8),
    delta AS (SELECT doc_id, nt FROM norm WHERE doc_id % 10 >= 8),
    fresh AS (
      SELECT d.doc_id, d.nt FROM delta d
      WHERE NOT EXISTS (SELECT 1 FROM state s WHERE s.nt = d.nt)
    )
    SELECT MIN(doc_id) AS kept_id, CAST(COUNT(*) AS BIGINT) AS n_copies_in_delta
    FROM fresh GROUP BY nt
    """,
    doc="Incremental (cross-snapshot) dedup — the shape a daily ingest "
    "actually runs: the DELTA batch is deduped AGAINST THE EXISTING STATE "
    "(anti-join of normalized-text hashes: delta docs whose content the "
    "corpus already holds are dropped without touching state), then "
    "exact-deduped within itself (min-id per group). At 100 TB the state "
    "side is a persisted (hash)-bucketed table, so the anti-join "
    "co-locates and the daily cost scales with the delta, not the corpus; "
    "only hashes cross the exchange, never text. Within-delta dedup is "
    "one delta-sized hash agg.",
    tags=("llm", "curation"),
)
def corpus_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nt = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    norm = docs.select("doc_id", nt.alias("nt"))
    state = norm.filter(F.col("doc_id") % 10 < 8).select(
        F.sha2("nt", 256).alias("h")
    )
    delta = norm.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "nt", F.sha2("nt", 256).alias("h")
    )
    fresh = delta.join(state, "h", "left_anti")
    return fresh.groupBy("nt").agg(
        F.min("doc_id").alias("kept_id"),
        F.count("*").cast("bigint").alias("n_copies_in_delta"),
    ).select("kept_id", "n_copies_in_delta")


@register(
    "corpus_importance_weights",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(regexp_split_to_array(
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    raw AS (SELECT tok, COUNT(*) AS n_r FROM toks GROUP BY tok),
    tgt AS (SELECT tok, COUNT(*) AS n_t FROM toks WHERE lang = 'en' GROUP BY tok),
    freq AS (
      SELECT r.tok, r.n_r, COALESCE(t.n_t, 0) AS n_t
      FROM raw r LEFT JOIN tgt t USING (tok)
    ),
    tot AS (
      SELECT SUM(n_r) AS big_n_r, SUM(n_t) AS big_n_t, COUNT(*) AS v FROM freq
    )
    SELECT k.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(ln(((f.n_t + 1) / (tot.big_n_t + tot.v))
                        / ((f.n_r + 1) / (tot.big_n_r + tot.v)))), 4)
             AS importance_logweight
    FROM toks k JOIN freq f USING (tok) CROSS JOIN tot
    GROUP BY k.doc_id
    """,
    doc="DSIR-style importance weights (Xie et al. 2023, unigram feature "
    "space): every document scored by the log-likelihood ratio of its "
    "tokens under the TARGET distribution (here: the English slice) vs "
    "the raw corpus — the data-selection signal used to resample a raw "
    "crawl toward a target domain. Laplace smoothing keeps "
    "absent-from-target tokens finite. Shape: two token-keyed frequency "
    "aggs (map-side partials), a vocabulary-sized left join with NO "
    "broadcast hint (AQE decides), a one-row totals crossJoin, and a "
    "doc_id rollup — the same scale skeleton as corpus_unigram_logprob, "
    "reused for a different published selector; like it, the tokenization "
    "re-runs per consumer here (three scans), where a 100 TB run "
    "materializes the token table once.",
    tags=("llm", "curation"),
)
def corpus_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split(norm, " ")).alias("tok")
    )
    raw = toks.groupBy("tok").agg(F.count("*").alias("n_r"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count("*").alias("n_t"))
    )
    freq = raw.join(tgt, "tok", "left").select(
        "tok", "n_r", F.coalesce("n_t", F.lit(0)).alias("n_t")
    )
    tot = freq.agg(
        F.sum("n_r").alias("big_n_r"),
        F.sum("n_t").alias("big_n_t"),
        F.count("*").alias("v"),
    )
    ratio = F.log(
        ((F.col("n_t") + 1) / (F.col("big_n_t") + F.col("v")))
        / ((F.col("n_r") + 1) / (F.col("big_n_r") + F.col("v")))
    )
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum(ratio), 4).alias("importance_logweight"),
        )
    )


@register(
    "corpus_token_budget_plan",
    r"""
    WITH per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT COUNT(*) AS n_sources FROM per_source)
    SELECT s.source, s.n_docs, s.n_tokens,
           ROUND(100000.0 / tot.n_sources, 2) AS target_tokens,
           ROUND((100000.0 / tot.n_sources) / s.n_tokens, 4) AS epochs
    FROM per_source s CROSS JOIN tot
    """,
    doc="Token-budget mixture plan — the pre-training data-recipe table: "
    "per-source document and token counts, the per-source share of a "
    "100k-token budget under a uniform mixture, and the implied epoch "
    "count (share / available tokens; >1 means that source repeats, the "
    "signal to re-weight). One scan with map-side partial counts, a "
    "source-keyed agg (sources are few — the exchange is tiny), and a "
    "one-row total crossJoin. Feeds corpus_mix_weighted, which executes "
    "a chosen mixture deterministically.",
    tags=("llm", "curation"),
)
def corpus_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    per_source = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("n_tokens"),
    )
    tot = per_source.agg(F.count("*").alias("n_sources"))
    target = F.lit(100000.0) / F.col("n_sources")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(target, 2).alias("target_tokens"),
        F.round(target / F.col("n_tokens"), 4).alias("epochs"),
    )


@register(
    "corpus_cross_dedup_near",
    None,  # xxhash64-seeded MinHash — rows-only; recall vs the exact
    # delta-x-state Jaccard tier is asserted in tests/test_llm_ops.py, and a
    # CONTAINMENT oracle (DuckDB-computed exact duplicate set must be a
    # subset of the band-join report — identical normalized text implies
    # identical signatures) is proven in
    # tests/test_curation.py::test_cross_dedup_near_contains_exact
    doc="Incremental NEAR-dup against corpus state — corpus_cross_dedup's "
    "fuzzy sibling, the step that keeps a daily ingest from re-admitting "
    "paraphrased/reformatted duplicates exact hashing misses: delta docs "
    "MinHash-banded (operators/dedup.py::minhash_cross_pairs) against the "
    "state's persisted signatures; candidates share a band, estimated "
    "Jaccard >= 0.5 survives. Daily cost = one signature pass over the "
    "DELTA plus a delta-sized band equi-join; the corpus-side signature "
    "store is write-once per doc.",
    tags=("llm", "curation", "dedup"),
    quality_test="tests/test_curation.py::test_cross_dedup_near_contains_exact",
)
def corpus_cross_dedup_near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import minhash_cross_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    state = docs.filter(F.col("doc_id") % 10 < 8)
    delta = docs.filter(F.col("doc_id") % 10 >= 8)
    return minhash_cross_pairs(delta, state, jaccard_threshold=0.5)


@register(
    "corpus_dedup_cascade",
    r"""
    WITH raw AS (SELECT doc_id, text FROM documents),
    ex_ids AS (SELECT MIN(doc_id) AS doc_id FROM raw GROUP BY text),
    exd AS (SELECT r.doc_id, r.text FROM raw r JOIN ex_ids USING (doc_id)),
    canon_ids AS (
      SELECT MIN(doc_id) AS doc_id FROM exd
      GROUP BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
    ),
    cd AS (SELECT e.doc_id, e.text FROM exd e JOIN canon_ids USING (doc_id)),
    sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ')
                            for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
                     AS words
            FROM cd)
    ),
    exploded AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING COUNT(*) / (ANY_VALUE(a.n_sh) + ANY_VALUE(b.n_sh) - COUNT(*)) >= 0.2
    ),
    final AS (
      SELECT doc_id FROM cd
      WHERE doc_id NOT IN (SELECT id_b FROM edges)
    )
    SELECT CAST((SELECT COUNT(*) FROM raw) AS BIGINT) AS n_raw,
           CAST((SELECT COUNT(*) FROM exd) AS BIGINT) AS n_after_exact,
           CAST((SELECT COUNT(*) FROM cd) AS BIGINT) AS n_after_canonical,
           CAST((SELECT COUNT(*) FROM final) AS BIGINT) AS n_after_neardup,
           ROUND((SELECT COUNT(*) FROM final) * 1.0
                 / (SELECT COUNT(*) FROM raw), 4) AS retention
    """,
    doc="The dedup cascade as ONE accountable query — SCALE.md's staged "
    "ordering (cheapest tier first) made first-class: byte-exact group "
    "(hash-keyed), canonicalized exact on the survivors, then exact "
    "n-gram Jaccard near-dup (inverted-index join, id_b of each pair "
    "dropped) on what remains — each tier shrinks the population the "
    "next, costlier tier pays for. The 10x probe measured this ordering "
    "at 2.3x cheaper than running the pairwise tier raw (17.4 s vs "
    "39.8 s on the 90%-duplicate corpus). One funnel row out: counts per "
    "stage + retention.",
    tags=("llm", "curation", "dedup"),
)
def corpus_dedup_cascade_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import ngram_jaccard_pairs

    raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ex_ids = raw.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    exd = raw.join(ex_ids, "doc_id")
    canon_ids = (
        exd.groupBy(
            F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")).alias("k")
        )
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    cd = exd.join(canon_ids, "doc_id")
    pairs = ngram_jaccard_pairs(cd, k=3, threshold=0.2)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    final = cd.join(dropped, "doc_id", "left_anti")
    return (
        raw.agg(F.count("*").cast("bigint").alias("n_raw"))
        .crossJoin(exd.agg(F.count("*").cast("bigint").alias("n_after_exact")))
        .crossJoin(cd.agg(F.count("*").cast("bigint").alias("n_after_canonical")))
        .crossJoin(final.agg(F.count("*").cast("bigint").alias("n_after_neardup")))
        .select(
            "n_raw",
            "n_after_exact",
            "n_after_canonical",
            "n_after_neardup",
            F.round(F.col("n_after_neardup") / F.col("n_raw"), 4).alias("retention"),
        )
    )


@register(
    "corpus_sample_weighted",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ((doc_id * 2654435761 + 40503) % 4294967296 + 1) / 4294967297.0 AS u
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, n_chars
    FROM (
      SELECT doc_id, n_chars,
             POWER(u, 1.0 / n_chars) AS pri
      FROM keyed
      ORDER BY pri DESC, doc_id
      LIMIT 200
    )
    ORDER BY doc_id
    """,
    doc="Weighted sampling WITHOUT replacement, deterministic: "
    "Efraimidis-Spirakis priority sampling (P(select) proportional to "
    "weight) with the uniform draw derived from a Knuth multiplicative "
    "hash of doc_id instead of an RNG — identical integer arithmetic in "
    "any engine, so the sample is reproducible and oracle-checkable. "
    "Priority u^(1/w) (w = n_chars, longer docs favored), global top-200 "
    "by priority = TakeOrdered (per-partition heap + driver merge of 200-"
    "row heads, no global sort shuffle). The training-data mixing "
    "primitive: one pass, zero state, re-runs give the same sample. The "
    "float priority stays internal (only ids survive to output) so the "
    "value compare is integer-exact; a boundary flip would need two "
    "priorities within 1 ulp at exactly rank 200.",
    tags=("curation", "llm"),
)
def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # overflow-safe split multiply (identical mod-2^32 result; the naive
    # doc_id * A overflows long past id ~3.47e9 — operators/assembly.py::
    # knuth_uniform, the 1000x-probe finding)
    from canvas_data_aws_spark.operators.assembly import knuth_uniform

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    keyed = d.filter(F.col("n_chars") > 0).withColumn(
        "u", knuth_uniform(F.col("doc_id"), 40503)
    )
    pri = keyed.withColumn("pri", F.pow(F.col("u"), F.lit(1.0) / F.col("n_chars")))
    return (
        pri.orderBy(F.col("pri").desc(), "doc_id")
        .limit(200)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "corpus_bigram_logprob",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok,
             generate_subscripts(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS pos
      FROM documents
      WHERE LENGTH(trim(text)) > 0
    ),
    big AS (
      SELECT doc_id,
             LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             tok AS w2
      FROM toks
    ),
    pairs AS (SELECT doc_id, w1, w2 FROM big WHERE w1 IS NOT NULL),
    bigf AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c12) AS c1 FROM bigf GROUP BY w1)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-ln(b.c12 / x.c1)), 4) AS avg_neg_logprob
    FROM pairs p
    JOIN bigf b ON b.w1 = p.w1 AND b.w2 = p.w2
    JOIN ctx  x ON x.w1 = p.w1
    GROUP BY p.doc_id
    """,
    doc="Bigram-LM scoring — one step up the quality-filter ladder from "
    "corpus_unigram_logprob: each document's mean negative log of "
    "P(w2 | w1) = c(w1,w2) / c(w1·) under the corpus's own bigram counts "
    "(MLE; every scored bigram is in the training corpus so no smoothing "
    "mass is needed). Catches word-salad the unigram LM scores as normal "
    "(common words in impossible order). Plan: tokenize with positions "
    "(posexplode), adjacent pairs via ONE doc_id-partitioned LAG window, "
    "bigram/context tables from token-key exchanges with map-side partial "
    "counts — both are vocabulary-bounded and join on their keys with NO "
    "broadcast hint (unbounded on raw web text; AQE decides). Per-doc "
    "rollup is one doc_id exchange; docs under two tokens drop out by "
    "construction on both engines.",
    tags=("llm", "curation"),
)
def corpus_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = docs.select("doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select("doc_id", F.lag("tok").over(w).alias("w1"), F.col("tok").alias("w2"))
        .filter(F.col("w1").isNotNull())
    )
    bigf = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    ctx = bigf.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        pairs.join(bigf, ["w1", "w2"])
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("c12") / F.col("c1"))), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


@register(
    "corpus_train_val_split",
    r"""
    WITH assigned AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                  THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
                  THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    leaks AS (
      SELECT md5(nt) AS h
      FROM assigned GROUP BY md5(nt)
      HAVING COUNT(DISTINCT split) > 1
    )
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN l.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaked_docs
    FROM assigned a LEFT JOIN leaks l ON md5(a.nt) = l.h
    GROUP BY a.split
    """,
    doc="Deterministic train/val/test split WITH a leakage audit — the two "
    "halves of the split problem a training pipeline actually has. "
    "Assignment hashes the DOCUMENT ID through md5 and buckets on the "
    "first hex digit (12/2/2 of 16 ~ 75/12.5/12.5%): engine-portable "
    "(both engines emit identical hex strings — no integer-hash "
    "divergence), stable under reprocessing, and independent of row "
    "order. The audit counts documents whose NORMALIZED TEXT hash "
    "appears in more than one split — exact-duplicate leakage that would "
    "inflate eval scores; only 16-byte digests cross the exchange, never "
    "text. Plan: one scan + one digest-key agg + a digest-key join. "
    "Extend the leak key to MinHash band signatures for near-dup leakage "
    "(the corpus_cross_dedup_near machinery) at the same plan shape.",
    tags=("llm", "curation"),
)
def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nt = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    assigned = docs.select(
        "doc_id",
        F.md5(nt).alias("h"),
        F.when(
            first_hex.isin(*"0123456789ab"), "train"
        ).when(first_hex.isin("c", "d"), "val").otherwise("test").alias("split"),
    )
    leaks = (
        assigned.groupBy("h")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("h")
    )
    return (
        assigned.join(leaks.withColumn("leak", F.lit(1)), "h", "left")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("leak"), F.lit(0))).cast("bigint").alias(
                "n_leaked_docs"
            ),
        )
    )


@register(
    "corpus_split_leakage_near",
    None,  # MinHash banding is seed/hash-dependent — rows-only; detection
    # quality is pinned by tests/test_curation.py::test_split_near_leakage_planted
    # plus a CONTAINMENT oracle (DuckDB exact cross-split leak set proven a
    # subset of the near report) in
    # tests/test_curation.py::test_split_leakage_near_contains_exact
    doc="NEAR-duplicate leakage audit across the train/val/test split — the "
    "follow-through corpus_train_val_split's exact-dup audit promises: "
    "eval-side documents (val+test, the delta) are MinHash-LSH banded "
    "against the TRAIN side (the state) via minhash_cross_pairs, so a "
    "paraphrased or lightly-edited train document leaking into eval is "
    "caught, not just byte-identical copies. Reports per eval split the "
    "document count and how many have an estimated-Jaccard >= 0.8 "
    "near-twin in train. Cost shape: signature pass over each side, band "
    "equi-join whose left side is eval-sized — the daily-audit cost "
    "scales with the eval sets, and only band hashes cross the exchange.",
    tags=("llm", "curation"),
    quality_test="tests/test_curation.py::test_split_near_leakage_planted",
)
def corpus_split_leakage_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.dedup import minhash_cross_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    assigned = docs.withColumn(
        "split",
        F.when(first_hex.isin(*"0123456789ab"), "train")
        .when(first_hex.isin("c", "d"), "val")
        .otherwise("test"),
    )
    train = assigned.filter(F.col("split") == "train").select("doc_id", "text")
    evals = assigned.filter(F.col("split") != "train")
    pairs = minhash_cross_pairs(
        evals.select("doc_id", "text"), train, jaccard_threshold=0.8
    )
    leaked = pairs.select(F.col("delta_id").alias("doc_id")).distinct().withColumn(
        "leak", F.lit(1)
    )
    return (
        evals.join(leaked, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("leak"), F.lit(0)))
            .cast("bigint")
            .alias("n_near_leaked"),
        )
    )


@register(
    "corpus_mix_temperature",
    r"""
    WITH per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                      x -> length(x) > 0))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    powered AS (
      SELECT source, n_docs, n_tokens,
             POWER(n_tokens, 0.5) AS p
      FROM per_source
    ),
    tot AS (SELECT SUM(p) AS z, SUM(n_tokens) AS all_tokens FROM powered)
    SELECT source, n_docs, n_tokens,
           ROUND(p / z, 6) AS mix_rate,
           ROUND(100000.0 * p / z, 2) AS target_tokens,
           ROUND(100000.0 * p / z / n_tokens, 4) AS epochs
    FROM powered, tot
    """,
    doc="Temperature-scaled source mixing (alpha = 0.5): sampling rates "
    "proportional to n_tokens^alpha, renormalized — the standard "
    "rebalancing knob from multilingual pretraining (alpha < 1 upsamples "
    "small sources relative to their natural share; alpha = 1 recovers "
    "proportional mixing, alpha = 0 uniform — cf. the exponent-smoothed "
    "sampling of Conneau & Lample's cross-lingual LM work). Reports per "
    "source the mix rate, the token allocation under a 100k budget, and "
    "the implied epochs (>1 means the source repeats). Pure aggregate "
    "arithmetic: one per-source rollup plus a one-row normalizer "
    "broadcast; complements corpus_token_budget_plan (uniform) and "
    "corpus_mix_weighted (explicit weights).",
    tags=("llm", "curation"),
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    alpha, budget = 0.5, 100000.0
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda x: F.length(x) > 0))
    per_source = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("n_tokens"),
    )
    powered = per_source.withColumn("p", F.pow(F.col("n_tokens"), F.lit(alpha)))
    tot = powered.agg(F.sum("p").alias("z"))
    return powered.crossJoin(F.broadcast(tot)).select(  # single-row scalar
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("p") / F.col("z"), 6).alias("mix_rate"),
        F.round(F.lit(budget) * F.col("p") / F.col("z"), 2).alias("target_tokens"),
        F.round(F.lit(budget) * F.col("p") / F.col("z") / F.col("n_tokens"), 4).alias(
            "epochs"
        ),
    )


@register(
    "corpus_dup_ngram_spans",
    r"""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                                   ' ') AS words
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    base AS (SELECT doc_id, len(words) AS n_tokens FROM d),
    sh AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(words[i:i+7], ' ')) AS h
      FROM d, UNNEST(range(1, len(words) - 6)) AS t(i)
    ),
    freq AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1),
    starts AS (
      SELECT s.doc_id, s.pos AS st, s.pos + 7 AS en
      FROM sh s JOIN freq USING (h)
    ),
    flagged AS (
      SELECT doc_id, st, en,
             CASE WHEN st > COALESCE(MAX(en) OVER (
                    PARTITION BY doc_id ORDER BY st
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM starts
    ),
    islands AS (
      SELECT doc_id, st, en,
             SUM(new_island) OVER (
               PARTITION BY doc_id ORDER BY st
               ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ),
    cov AS (
      SELECT doc_id, MAX(en) - MIN(st) + 1 AS covered
      FROM islands GROUP BY doc_id, island
    ),
    per_doc AS (SELECT doc_id, SUM(covered) AS dup_tokens FROM cov GROUP BY doc_id)
    SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           COALESCE(p.dup_tokens, 0) / CAST(b.n_tokens AS DOUBLE) AS dup_fraction
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Duplicated-n-gram SPAN coverage per document — the Spark-shaped "
    "stand-in for exact substring deduplication (Lee et al., "
    "'Deduplicating Training Data Makes Language Models Better'): every "
    "8-word shingle occurring more than once ANYWHERE in the corpus marks "
    "its 8-token span as duplicated; overlapping spans merge (classic "
    "island detection — expressed as ONE row-local aggregate fold over "
    "each doc's sorted span starts rather than doc-partitioned windows), "
    "and the report is each doc's duplicated-token count and fraction — "
    "the filter signal for memorization-prone boilerplate. Scale shape: "
    "shingles cross the exchange as 16-byte md5 digests (identical "
    "strings in both engines — never raw text), the duplicate-shingle "
    "set is HAVING-reduced before it is collected, and the interval "
    "merge is a linear sweep inside the row. The fraction ships UNROUNDED: "
    "it is a quotient of exact integers, bit-identical in both engines, "
    "where a 4dp ROUND could straddle a binary half.",
    tags=("llm", "curation", "dedup"),
)
def corpus_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from canvas_data_aws_spark.operators.dedup import word_shingles

    K = 8
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    base = docs.select(
        "doc_id", F.size(F.split(norm, " ")).cast("bigint").alias("n_tokens")
    )
    sh = docs.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("text"), K, distinct=False)).alias(
            "pos", "shingle"
        ),
    ).select("doc_id", "pos", F.md5("shingle").alias("h"))
    # duplicate detection as ONE h-partitioned count window instead of
    # groupBy(h) + join back: the join formulation shuffles sh by h AND
    # re-runs the tokenize/shingle/md5 pipeline for the probe side; the
    # window shuffles the same rows by h exactly once and keeps them.
    # (h is high-cardinality — never a single-partition window.)
    wdup = Window.partitionBy("h")
    # Island merge ROW-LOCALLY (r14): collect each doc's duplicate-span
    # starts (sorted), then one aggregate fold sweeps the sorted starts
    # merging overlapping [st, st+K-1] intervals — the exact algebra the
    # previous shape spread over two doc-partitioned windows and two
    # groupBys (3 doc-keyed exchanges + 2 within-partition sorts). Now
    # ONE doc-keyed aggregate; the fold state is (total, cur_start,
    # cur_end) and the -1/-2 sentinel makes the first interval's close
    # contribute length 0, so no special-casing. Only duplicate-only
    # span starts cross the exchange, same as before.
    sorted_starts = (
        sh.withColumn("c", F.count(F.lit(1)).over(wdup))
        .filter(F.col("c") > 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("sts"))
    )
    zero = F.lit(0).cast("long")
    fold = F.aggregate(
        "sts",
        F.struct(
            zero.alias("tot"),
            F.lit(-1).alias("cur_st"),
            F.lit(-2).alias("cur_en"),
        ),
        lambda acc, st: F.when(
            st > acc["cur_en"],
            F.struct(
                (acc["tot"] + acc["cur_en"] - acc["cur_st"] + 1).alias("tot"),
                st.alias("cur_st"),
                (st + K - 1).alias("cur_en"),
            ),
        ).otherwise(
            F.struct(
                acc["tot"].alias("tot"),
                acc["cur_st"].alias("cur_st"),
                F.greatest(acc["cur_en"], st + K - 1).alias("cur_en"),
            )
        ),
        lambda acc: acc["tot"] + acc["cur_en"] - acc["cur_st"] + 1,
    )
    per_doc = sorted_starts.select("doc_id", fold.alias("dup_tokens"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens").cast("double")
            ).alias("dup_fraction"),
        )
    )


@register(
    "corpus_perplexity_buckets",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(
        trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    tot AS (SELECT SUM(n) AS total FROM freq),
    scored AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(ROUND(-ln(f.n / tot.total) * 1000000000.0) AS BIGINT))
                  AS DOUBLE) / (1000000000.0 * COUNT(*)) AS score
      FROM toks t JOIN freq f USING (tok) CROSS JOIN tot
      GROUP BY t.doc_id
    ),
    cuts AS (
      SELECT percentile_disc(0.3333) WITHIN GROUP (ORDER BY score) AS c_head,
             percentile_disc(0.6667) WITHIN GROUP (ORDER BY score) AS c_mid
      FROM scored
    )
    SELECT CASE WHEN s.score <= c.c_head THEN 'head'
                WHEN s.score <= c.c_mid THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens,
           MIN(s.score) AS min_score,
           MAX(s.score) AS max_score
    FROM scored s CROSS JOIN cuts c
    GROUP BY 1
    """,
    doc="CCNet-style perplexity bucketing: documents scored by the unigram-"
    "LM mean negative log-probability (the corpus_unigram_logprob "
    "machinery), then split into head/middle/tail thirds at "
    "percentile_disc cutpoints — the standard keep-the-head curation "
    "gate (Wenzek et al., CCNet). The cutpoints are a one-row aggregate "
    "broadcast back as a row-local CASE — the same global-NTILE "
    "replacement pattern as orders_pareto_share (no data-sized "
    "single-partition window anywhere); percentile_disc returns multiset "
    "ELEMENTS, bit-identical across engines. The per-doc score is NOT a "
    "float AVG (partition-merge-order-dependent, and a 4dp ROUND would "
    "amplify a 1-ulp flip into a whole-doc bucket move): each token's "
    "-ln(p) is quantized once to a 1e-9-grain integer, summed EXACTLY, "
    "and shipped as the deterministic quotient sum/(1e9*n) — the CUPED "
    "scaled-int pattern. Per-bucket stats are counts and element picks "
    "(min/max), never order-dependent float sums.",
    tags=("llm", "curation"),
)
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = docs.select("doc_id", F.explode(F.split(norm, " ")).alias("tok"))
    # vocabulary-sized, two consumers (scalar total + probe join):
    # checkpoint once so neither re-runs the corpus explode+count
    freq = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = freq.agg(F.sum("n").alias("total"))
    # per-token -ln(p) quantized ONCE to a 1e-9-grain integer, summed
    # exactly (long addition commutes), then one deterministic double
    # quotient — no partition-merge-order term, unlike a float AVG
    scaled = F.round(-F.log(F.col("n") / F.col("total")) * F.lit(1e9)).cast("long")
    scored = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(scaled).alias("__s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("__s").cast("double") / (F.lit(1e9) * F.col("n_tokens"))).alias(
                "score"
            ),
        )
        # doc-sized but 3 narrow columns, and TWO consumers (the
        # percentile-cut scalar and the final bucket projection): without
        # this the whole score pipeline — explode, freq join, per-doc sum
        # — runs twice end-to-end
        .localCheckpoint(eager=True)
    )
    cuts = scored.agg(
        F.expr("percentile_disc(0.3333) WITHIN GROUP (ORDER BY score)").alias("c_head"),
        F.expr("percentile_disc(0.6667) WITHIN GROUP (ORDER BY score)").alias("c_mid"),
    )
    bucket = (
        F.when(F.col("score") <= F.col("c_head"), "head")
        .when(F.col("score") <= F.col("c_mid"), "middle")
        .otherwise("tail")
    )
    return (
        scored.crossJoin(F.broadcast(cuts))  # single-row scalar: safe broadcast
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


@register(
    "corpus_dup_span_strip",
    r"""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                                   ' ') AS words
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    toks AS (
      SELECT doc_id, i - 1 AS pos, words[i] AS tok
      FROM d, UNNEST(range(1, len(words) + 1)) AS t(i)
    ),
    sh AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(words[i:i+7], ' ')) AS h
      FROM d, UNNEST(range(1, len(words) - 6)) AS t(i)
    ),
    freq AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) > 1),
    covered AS (
      SELECT DISTINCT s.doc_id, s.pos + o.o AS pos
      FROM sh s JOIN freq USING (h),
           UNNEST(range(0, 8)) AS o(o)
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t
      WHERE NOT EXISTS (SELECT 1 FROM covered c
                        WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
    ),
    rebuilt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(len(d.words) AS BIGINT) AS n_tokens,
           COALESCE(r.kept_tokens, 0) AS kept_tokens,
           COALESCE(r.clean_text, '') AS clean_text
    FROM d LEFT JOIN rebuilt r USING (doc_id)
    """,
    doc="The ACTION half of corpus_dup_ngram_spans: emit each document's "
    "cleaned text with every corpus-duplicated 8-gram span REMOVED — the "
    "boilerplate-stripping rewrite of exact-substring deduplication (Lee "
    "et al. remove duplicated spans rather than whole documents, "
    "preserving the unique remainder). Duplicate span STARTS are "
    "collected per doc (one doc-keyed aggregate of duplicate-only "
    "rows), then the strip is row-local array algebra: covered = "
    "dedup'd union of the 8-wide ranges, kept = array_except(0..n-1, "
    "covered) (hash-set lookup, order-preserving), text rebuilt by an "
    "in-order element_at map — deterministic strings, engine-exact. "
    "Scale shape: 16-byte digests cross the duplicate-detection "
    "exchange and only duplicated-span starts cross the doc aggregate; "
    "corpus TOKENS never cross an exchange at all (the r13 shape "
    "exploded every token through an anti-join and a collect_list "
    "rebuild).",
    tags=("llm", "curation", "dedup"),
)
def corpus_dup_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from canvas_data_aws_spark.operators.dedup import word_shingles

    K = 8
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    base = docs.select("doc_id", F.split(norm, " ").alias("words"))
    sh = docs.select(
        "doc_id",
        F.posexplode(word_shingles(F.col("text"), K, distinct=False)).alias(
            "pos", "shingle"
        ),
    ).select("doc_id", "pos", F.md5("shingle").alias("h"))
    wdup = Window.partitionBy("h")
    # Duplicate-span STARTS per doc, then the whole strip is ROW-LOCAL
    # array algebra (r14): covered = dedup'd union of the K-wide position
    # ranges, kept = array_except(0..n-1, covered) — hash-set semantics,
    # order-preserving on the left operand, so the rebuilt text is the
    # same pos-ascending join. This replaces the corpus-TOKEN-sized
    # posexplode + (doc,pos) anti-join + collect_list/array_sort rebuild
    # (three token-sized exchanges) with ONE doc-keyed aggregate of the
    # duplicate-only span starts: at corpus scale tokens never cross an
    # exchange at all — only duplicated-shingle starts do.
    starts = (
        sh.withColumn("c", F.count(F.lit(1)).over(wdup))
        .filter(F.col("c") > 1)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("sts"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("sts"), F.expr("array()")),
                lambda st: F.sequence(st, st + K - 1),
            )
        )
    )
    kept_pos = F.array_except(
        F.sequence(F.lit(0), F.size("words") - 1), covered
    )
    return (
        base.join(starts, "doc_id", "left")
        .withColumn("__kept", kept_pos)
        .select(
            "doc_id",
            F.size("words").cast("bigint").alias("n_tokens"),
            F.size("__kept").cast("bigint").alias("kept_tokens"),
            F.array_join(
                F.transform(
                    "__kept", lambda p: F.element_at(F.col("words"), p + 1)
                ),
                " ",
            ).alias("clean_text"),
        )
    )


@register(
    "corpus_kneser_ney_logprob",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok,
             generate_subscripts(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), 1) AS pos
      FROM documents
      WHERE LENGTH(trim(text)) > 0
    ),
    big AS (
      SELECT doc_id,
             LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             tok AS w2
      FROM toks
    ),
    pairs AS (SELECT doc_id, w1, w2 FROM big WHERE w1 IS NOT NULL),
    bigf AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n_succ FROM bigf GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n_pred FROM bigf GROUP BY w2),
    tot AS (SELECT COUNT(*) AS n_types FROM bigf)
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-ln(
             (b.c12 - 0.75) / x.c1
             + (0.75 * x.n_succ / x.c1) * (c.n_pred / t.n_types)
           )), 4) AS avg_neg_logprob_kn
    FROM pairs p
    JOIN bigf b ON b.w1 = p.w1 AND b.w2 = p.w2
    JOIN ctx  x ON x.w1 = p.w1
    JOIN cont c ON c.w2 = p.w2
    CROSS JOIN tot t
    GROUP BY p.doc_id
    """,
    doc="Interpolated Kneser-Ney bigram scoring — the canonical n-gram "
    "smoothing (Kneser & Ney 1995; Chen & Goodman 1998's evaluation "
    "winner), one rung above corpus_bigram_logprob's raw MLE: "
    "P(w2|w1) = max(c12 - D, 0)/c1 + D*N1+(w1,.)/c1 * N1+(.,w2)/N1+(.,.) "
    "with absolute discount D = 0.75 and the CONTINUATION unigram "
    "(distinct left-context count, not raw frequency — 'Francisco' is "
    "frequent but only ever follows 'San', so KN scores it low as a "
    "novel continuation). Every scored bigram exists in the corpus "
    "(c12 >= 1 > D), so the max() clamp is never active and the formula "
    "is one row-local expression over five count tables: bigram counts, "
    "context totals + distinct-successor counts (one shared rollup), "
    "distinct-predecessor counts, and the one-row bigram-type total "
    "broadcast. All joins are vocabulary-bounded token-key exchanges "
    "with NO broadcast hint (unbounded on raw web text; AQE decides); "
    "per-doc rollup is one doc_id exchange.",
    tags=("llm", "curation"),
)
def corpus_kneser_ney_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    D = 0.75
    docs = load_table(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    toks = docs.select("doc_id", F.posexplode(F.split(norm, " ")).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select("doc_id", F.lag("tok").over(w).alias("w1"), F.col("tok").alias("w2"))
        .filter(F.col("w1").isNotNull())
    )
    # bigram-type-sized aggregate with FOUR consumers (context rollup,
    # continuation rollup, the n_types scalar, and the probe join) — each
    # would otherwise re-run the corpus posexplode + per-doc lag window +
    # bigram count underneath it: 5 corpus passes where 2 suffice.
    # Checkpoint the narrow type table once (the simhash/triangle
    # pattern); the probe side re-derives `pairs` exactly once.
    bigf = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .localCheckpoint(eager=True)
    )
    ctx = bigf.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n_succ")
    )
    cont = bigf.groupBy(F.col("w2").alias("c_w2")).agg(F.count("*").alias("n_pred"))
    tot = bigf.agg(F.count("*").alias("n_types"))
    p_kn = (F.col("c12") - D) / F.col("c1") + (
        D * F.col("n_succ") / F.col("c1")
    ) * (F.col("n_pred") / F.col("n_types"))
    return (
        pairs.join(bigf, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, pairs.w2 == F.col("c_w2"))
        .crossJoin(F.broadcast(tot))  # single-row scalar: safe broadcast
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(F.avg(-F.log(p_kn)), 4).alias("avg_neg_logprob_kn"),
        )
    )


@register(
    "corpus_global_shuffle",
    """
    WITH keyed AS (
      SELECT doc_id,
             md5(CONCAT('epoch7-', CAST(doc_id AS VARCHAR))) AS k
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, k,
             CAST(strpos('0123456789abcdef', substring(k, 1, 1)) - 1
                  AS BIGINT) AS shard
      FROM keyed
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM sharded
    """,
    doc="Deterministic global shuffle for a training epoch: every doc gets "
    "a pseudorandom sort key md5(seed || doc_id) — reshuffling is just a "
    "new seed string — a shard from the key's first hex nibble, and an "
    "exact position within its shard (the (shard, pos) pair IS the "
    "dataloader's read order; same seed => byte-identical epoch order on "
    "any cluster layout, the reproducibility property training runs "
    "need). md5 is the portable hash (identical hex in Spark and DuckDB); "
    "the rank tie-breaks on doc_id though md5 keys are already unique "
    "per unique doc_id. Plan: row-local keying, then ONE hash exchange on "
    "shard feeding a shard-partitioned sort — exactly the work a "
    "partitioned shard write pays anyway; 16 shards here, but the shard "
    "nibble count is the parallelism knob (production: enough hex chars "
    "that a shard is ~10 GB).",
    tags=("curation", "llm"),
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    keyed = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch7-"), F.col("doc_id").cast("string"))).alias("k"),
    )
    sharded = keyed.withColumn(
        "shard",
        (
            F.instr(F.lit("0123456789abcdef"), F.substring("k", 1, 1)) - 1
        ).cast("bigint"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return sharded.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def _vocab_coverage_oracle() -> str:
    parts = []
    for k in (1000, 5000, 10000, 50000):
        parts.append(
            f"""
    SELECT CAST({k} AS BIGINT) AS vocab_size,
           CAST(SUM(cnt) AS BIGINT) AS covered_tokens,
           (SELECT CAST(SUM(cnt) AS BIGINT) FROM vocab) AS total_tokens,
           SUM(cnt) * 1.0 / (SELECT SUM(cnt) FROM vocab) AS coverage
    FROM (SELECT cnt FROM vocab ORDER BY cnt DESC, word LIMIT {k}) t
    """
        )
    return (
        r"""
    WITH vocab AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(regexp_split_to_array(
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
        FROM documents WHERE LENGTH(trim(text)) > 0
      ) GROUP BY word
    )
    """
        + " UNION ALL ".join(parts)
    )


@register(
    "corpus_vocab_coverage_curve",
    _vocab_coverage_oracle(),
    doc="Vocabulary coverage curve — the tokenizer-sizing question: what "
    "share of the corpus token mass do the top-1k/5k/10k/50k word types "
    "cover? (The knee of this curve is where a vocab stops paying for "
    "itself; the uncovered tail is what falls to subword/byte "
    "fallback.) Counts are exact integers and each coverage value is one "
    "quotient of exact counts. Deterministic top-k: (count DESC, word "
    "ASC) with the tie-break making every prefix unique. Plan: one "
    "explode + word-keyed count (the shuffle carries (word, partial "
    "count), never documents), then per-k TakeOrdered-bounded sums — no "
    "global window anywhere; the vocab table is type-bounded, not "
    "corpus-bounded.",
    tags=("curation", "llm"),
)
def corpus_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    vocab = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # the vocab rollup is the only corpus-sized pass and it feeds FIVE
        # consumers (the total + four top-k branches); it is type-bounded
        # (word, cnt), so materialize it once — the same narrow-derived-
        # table checkpoint the LM family uses (§10). Corpus passes 5 -> 1.
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("cnt").cast("bigint").alias("total_tokens"))
    outs = []
    for k in (1000, 5000, 10000, 50000):
        topk = vocab.orderBy(F.col("cnt").desc(), "word").limit(k)
        outs.append(
            topk.agg(F.sum("cnt").cast("bigint").alias("covered_tokens"))
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(k).cast("bigint").alias("vocab_size"),
                "covered_tokens",
                "total_tokens",
                (
                    F.col("covered_tokens") * F.lit(1.0) / F.col("total_tokens")
                ).alias("coverage"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


@register(
    "corpus_dedup_bias_audit",
    r"""
    WITH d AS (
      SELECT doc_id, source, n_chars,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest
      FROM documents
    ),
    keep AS (SELECT digest, MIN(doc_id) AS keeper FROM d GROUP BY digest),
    tagged AS (
      SELECT CASE WHEN k.keeper = d.doc_id THEN 'kept' ELSE 'dropped' END
               AS cohort,
             d.source, d.n_chars
      FROM d JOIN keep k ON k.digest = d.digest
    )
    SELECT cohort, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS med_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM tagged GROUP BY cohort, source
    """,
    doc="Dedup bias audit — the curation-QA check that exact dedup is not "
    "silently skewing the corpus: per (kept|dropped cohort x source) "
    "counts and length stats, so a source whose documents are "
    "disproportionately dropped (or whose survivors skew short) is "
    "visible BEFORE training, not after. Keeper rule is min doc_id per "
    "normalized-text md5 digest (the dedup_canonical_exact contract); "
    "med_chars is percentile_disc (element pick, engine-exact). Plan: "
    "one digest-keyed aggregate + one digest-keyed join back (only "
    "16-byte digests and doc ids shuffle, never text), then a "
    "(2 x sources)-group aggregate.",
    tags=("curation", "llm", "quality"),
)
def corpus_dedup_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))).alias("digest"),
    )
    keep = d.groupBy("digest").agg(F.min("doc_id").alias("keeper"))
    tagged = d.join(keep, "digest").select(
        F.when(F.col("keeper") == F.col("doc_id"), F.lit("kept"))
        .otherwise(F.lit("dropped"))
        .alias("cohort"),
        "source",
        "n_chars",
    )
    return tagged.groupBy("cohort", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
        .cast("bigint")
        .alias("med_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def _lang_score_sql(words: list[str]) -> str:
    return (
        "len(regexp_extract_all(lower(text), '\\b(?:" + "|".join(words) + ")\\b'))"
    )


_ATTR_CTE = rf"""
    WITH f AS (
      SELECT doc_id, lang, source,
             LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\b(?:the|and|of)\b')) AS n_stop,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS n_bpe,
             {_lang_score_sql(['the', 'and', 'of'])} AS s_en,
             {_lang_score_sql(['le', 'la', 'et'])} AS s_fr,
             {_lang_score_sql(['der', 'und', 'die'])} AS s_de,
             {_lang_score_sql(['el', 'los', 'que'])} AS s_es
      FROM documents
    ),
    attrs AS (
      SELECT doc_id, lang AS labeled_lang, source,
             CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en > 0 THEN 'en'
                  WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr > 0 THEN 'fr'
                  WHEN s_de >= s_es AND s_de > 0 THEN 'de'
                  WHEN s_es > 0 THEN 'es'
                  ELSE 'und' END AS pred_lang,
             CAST(n_chars AS BIGINT) AS n_chars,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
             ROUND(n_punct / GREATEST(n_chars, 1), 6) AS punct_ratio,
             ROUND(n_stop / GREATEST(n_tokens, 1), 6) AS stop_ratio,
             ROUND((n_chars - n_tokens + 1) / n_tokens, 6) AS mean_word_len,
             FLOOR((0.4 * LEAST(n_chars / 500.0, 1.0)
                 + 0.3 * (CASE WHEN (n_chars - n_tokens + 1) / n_tokens >= 3
                                AND (n_chars - n_tokens + 1) / n_tokens <= 10
                               THEN 1.0 ELSE 0.0 END)
                 + 0.3 * LEAST(ROUND(n_stop / GREATEST(n_tokens, 1), 6) * 5, 1.0))
                 * 1000000) / 1000000 AS q_score
      FROM f
    )
"""


@register(
    "corpus_attribute_store",
    _ATTR_CTE + "\n    SELECT * FROM attrs",
    doc="Dolma-style decoupled attribute store: ALL row-local taggers "
    "(language ID, length/token/punct/stopword features, BPE-ish token "
    "count, composite quality score) fused into ONE text scan and emitted "
    "as a narrow doc-keyed attribute table — the artifact a 100 TB "
    "pipeline persists so that every filter-config iteration afterwards "
    "joins tens of bytes/doc instead of rescanning kilobytes of text. "
    "Pure built-in expressions in a single whole-stage codegen span (no "
    "UDF, no shuffle), hence the exact oracle; "
    "operators/text.py::document_attributes.",
    tags=("llm", "curation"),
)
def corpus_attribute_store_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import document_attributes

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    return document_attributes(docs).withColumnRenamed("lang", "labeled_lang")


@register(
    "corpus_filter_from_attributes",
    _ATTR_CTE
    + """,
    flags AS (
      SELECT (pred_lang = 'en') AS r_lang,
             (n_chars BETWEEN 100 AND 20000) AS r_len,
             (q_score >= 0.5) AS r_quality,
             (n_tokens >= 20) AS r_tokens
      FROM attrs
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN r_lang THEN 1 ELSE 0 END) AS BIGINT) AS p_lang,
             CAST(SUM(CASE WHEN r_len THEN 1 ELSE 0 END) AS BIGINT) AS p_len,
             CAST(SUM(CASE WHEN r_quality THEN 1 ELSE 0 END) AS BIGINT) AS p_quality,
             CAST(SUM(CASE WHEN r_tokens THEN 1 ELSE 0 END) AS BIGINT) AS p_tokens,
             CAST(SUM(CASE WHEN r_lang AND r_len AND r_quality AND r_tokens
                           THEN 1 ELSE 0 END) AS BIGINT) AS p_all
      FROM flags
    )
    SELECT t.rule, t.n_pass,
           agg.n_docs - t.n_pass AS n_fail,
           ROUND((agg.n_docs - t.n_pass) * 1.0 / agg.n_docs, 6) AS fail_share
    FROM agg, (
      SELECT 'r_lang' AS rule, p_lang AS n_pass FROM agg
      UNION ALL SELECT 'r_len', p_len FROM agg
      UNION ALL SELECT 'r_quality', p_quality FROM agg
      UNION ALL SELECT 'r_tokens', p_tokens FROM agg
      UNION ALL SELECT 'all', p_all FROM agg
    ) t
    """,
    doc="Filter-config iteration over the ATTRIBUTE TABLE ONLY — the "
    "second half of the Dolma decoupling: apply a rule config (lang, "
    "length, quality, token floor) to corpus_attribute_store's output and "
    "report per-rule pass/fail counts and fail shares plus the "
    "conjunction ('all'). The text column is never touched: at 100 TB "
    "this is the difference between a seconds-scale config sweep over a "
    "narrow table and a full-corpus rescan per candidate config. One "
    "attribute scan, one map-side-combined agg to a single row, unpivot "
    "to the 5-row report.",
    tags=("llm", "curation"),
)
def corpus_filter_from_attributes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.text import document_attributes

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # production reads the persisted attribute parquet; the registry entry
    # computes it inline so the oracle sees one self-contained query
    attrs = document_attributes(docs)
    flags = attrs.select(
        (F.col("pred_lang") == "en").alias("r_lang"),
        F.col("n_chars").between(100, 20000).alias("r_len"),
        (F.col("q_score") >= 0.5).alias("r_quality"),
        (F.col("n_tokens") >= 20).alias("r_tokens"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("r_lang").cast("bigint")).cast("bigint").alias("p_lang"),
        F.sum(F.col("r_len").cast("bigint")).cast("bigint").alias("p_len"),
        F.sum(F.col("r_quality").cast("bigint")).cast("bigint").alias("p_quality"),
        F.sum(F.col("r_tokens").cast("bigint")).cast("bigint").alias("p_tokens"),
        F.sum(
            (F.col("r_lang") & F.col("r_len") & F.col("r_quality") & F.col("r_tokens"))
            .cast("bigint")
        ).cast("bigint").alias("p_all"),
    )
    report = agg.select(
        F.expr(
            "stack(5, 'r_lang', p_lang, 'r_len', p_len, 'r_quality', p_quality, "
            "'r_tokens', p_tokens, 'all', p_all) as (rule, n_pass)"
        ),
        "n_docs",
    )
    return report.select(
        "rule",
        "n_pass",
        (F.col("n_docs") - F.col("n_pass")).alias("n_fail"),
        F.round((F.col("n_docs") - F.col("n_pass")) / F.col("n_docs"), 6).alias(
            "fail_share"
        ),
    )


@register(
    "corpus_attribute_store_incremental",
    _ATTR_CTE
    + """
    SELECT attrs.*,
           CASE WHEN doc_id % 10 = 0 THEN 'delta' ELSE 'base' END AS tagged_in
    FROM attrs
    """,
    doc="Day-2 shape of the Dolma attribute store: the persisted store "
    "covers yesterday's corpus (doc_id % 10 != 0 here); today's feed "
    "re-delivers everything plus new docs. The incremental update "
    "anti-joins the feed against the STORE'S KEYS (doc-id exchange only), "
    "tags ONLY the genuinely-new delta with the fused tagger scan, and "
    "unions it in — so daily attribute maintenance at 100 TB costs one "
    "delta-sized text scan plus a key anti-join, never a corpus rescan, "
    "and re-delivered documents are never re-tagged. The result is "
    "value-identical to tagging the whole corpus at once (what the exact "
    "oracle checks), with tagged_in recording which pass produced each "
    "row; operators/text.py::document_attributes.",
    tags=("llm", "curation"),
)
def corpus_attribute_store_incremental_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from canvas_data_aws_spark.operators.text import document_attributes

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # yesterday's persisted store (base slice, already tagged)
    store = (
        document_attributes(docs.filter(F.col("doc_id") % 10 != 0))
        .withColumnRenamed("lang", "labeled_lang")
        .withColumn("tagged_in", F.lit("base"))
    )
    # today's feed re-delivers the full corpus; only docs absent from the
    # store's key set pay the tagger scan
    arrivals = docs.join(
        store.select("doc_id"), "doc_id", "left_anti"
    )
    delta = (
        document_attributes(arrivals)
        .withColumnRenamed("lang", "labeled_lang")
        .withColumn("tagged_in", F.lit("delta"))
    )
    return store.unionByName(delta)


@register(
    "corpus_quality_calibration",
    _ATTR_CTE
    + """,
    b AS (
      SELECT LEAST(CAST(FLOOR(q_score * 10) AS BIGINT), 9) AS bucket,
             CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS pass,
             CAST(q_score AS DECIMAL(18,6)) AS qs
      FROM attrs
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pass) AS BIGINT) AS n_pass,
           ROUND(SUM(pass) * 1.0 / COUNT(*), 6) AS pass_rate,
           CAST(SUM(qs) AS DECIMAL(38,6)) AS sum_score
    FROM b GROUP BY bucket
    """,
    doc="Reliability (calibration) table for a quality scorer: bucket the "
    "composite q_score into deciles (integer FLOOR math — engine-exact) "
    "and report, per bucket, the observed pass rate of the Gopher "
    "word-count gate plus the DECIMAL-exact score mass. The readout every "
    "model-based filtering stage (DCLM / FineWeb-edu) needs before "
    "trusting a threshold: a well-calibrated scorer's pass rate rises "
    "monotonically across buckets, and a flat stretch says the score "
    "carries no signal there. One attribute scan, one 10-group "
    "map-side-combined agg — at 100 TB this rides the attribute store "
    "(corpus_attribute_store) and never touches text: the computation is "
    "operators/curation.py::quality_calibration_from_attributes, which "
    "accepts the PERSISTED store (equivalence test-pinned); this entry "
    "feeds it inline attributes so the oracle sees one plan.",
    tags=("llm", "curation", "quality"),
)
def corpus_quality_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.curation import (
        quality_calibration_from_attributes,
    )
    from canvas_data_aws_spark.operators.text import document_attributes

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # production reads the persisted attribute parquet (the docstring's
    # "rides the attribute store" path — quality_calibration_from_attributes
    # accepts any attrs frame); the registry entry computes attributes
    # inline so the oracle sees one self-contained query
    return quality_calibration_from_attributes(document_attributes(docs))


def _classifier_gd_oracle(
    train_pred: str,
    final_select: str,
    passes: int = 3,
    lr: float = 0.5,
    n_buckets: int = 64,
    scale: float = 100.0,
) -> str:
    """Unrolled full-batch logistic-GD as chained DuckDB CTEs — the exact
    oracle for operators/classifier.logistic_gd (zero init, ``passes``
    deterministic passes, learning rate ``lr``). Generated the same way as
    _vocab_coverage_oracle: a Python loop emitting one (score, residual,
    gradient, weight-update) CTE block per pass. md5-nibble bucketing is
    byte-identical to text_hashing_vectorizer's portable hash."""
    head = rf"""
    WITH d AS (
      SELECT doc_id, text,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_words
      FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    lab AS (
      SELECT doc_id,
             CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END AS y
      FROM d WHERE {train_pred}
    ),
    tok AS (
      SELECT doc_id,
             unnest(string_split(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
      FROM d
    ),
    x0 AS (
      SELECT doc_id,
             CAST(((strpos('0123456789abcdef', substring(md5(word), 1, 1)) - 1) * 16
                   + strpos('0123456789abcdef', substring(md5(word), 2, 1)) - 1)
                  % {n_buckets} AS BIGINT) AS bucket
      FROM tok
    ),
    xt AS (
      SELECT doc_id, bucket, COUNT(*) / {scale} AS x
      FROM x0 GROUP BY doc_id, bucket
    ),
    xtr AS (SELECT xt.* FROM xt JOIN lab USING (doc_id)),
    ntr AS (SELECT COUNT(*) AS n FROM lab),
    buckets AS (SELECT range AS bucket FROM range(0, {n_buckets})),
    w0 AS (SELECT bucket, 0.0 AS w FROM buckets),
    b0 AS (SELECT 0.0 AS b)"""
    blocks = [head]
    for k in range(1, passes + 1):
        blocks.append(
            f""",
    s{k} AS (
      SELECT lab.doc_id, lab.y,
             COALESCE(ws.sv, 0) + (SELECT b FROM b{k - 1}) AS s
      FROM lab LEFT JOIN (
        SELECT xtr.doc_id, SUM(xtr.x * w{k - 1}.w) AS sv
        FROM xtr JOIN w{k - 1} USING (bucket) GROUP BY xtr.doc_id
      ) ws USING (doc_id)
    ),
    r{k} AS (SELECT doc_id, 1.0 / (1.0 + exp(-s)) - y AS r FROM s{k}),
    g{k} AS (
      SELECT bucket, SUM(xtr.x * r{k}.r) / (SELECT n FROM ntr) AS g
      FROM xtr JOIN r{k} USING (doc_id) GROUP BY bucket
    ),
    w{k} AS (
      SELECT buckets.bucket,
             COALESCE(w{k - 1}.w, 0) - {lr} * COALESCE(g{k}.g, 0) AS w
      FROM buckets
      LEFT JOIN w{k - 1} USING (bucket)
      LEFT JOIN g{k} USING (bucket)
    ),
    b{k} AS (
      SELECT (SELECT b FROM b{k - 1})
             - {lr} * (SELECT SUM(r) / (SELECT n FROM ntr) FROM r{k}) AS b
    )"""
        )
    blocks.append(final_select.format(T=passes))
    return "".join(blocks)


@register(
    "corpus_quality_classifier",
    _classifier_gd_oracle(
        train_pred="TRUE",
        final_select="""
    SELECT d.doc_id,
           CAST(CASE WHEN d.n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
                AS BIGINT) AS label,
           ROUND(COALESCE(ws.sv, 0) + (SELECT b FROM b{T}), 6) AS score_r,
           ROUND(1.0 / (1.0 + exp(-(COALESCE(ws.sv, 0) + (SELECT b FROM b{T})))),
                 6) AS prob_r
    FROM d LEFT JOIN (
      SELECT xt.doc_id, SUM(xt.x * w{T}.w) AS sv
      FROM xt JOIN w{T} USING (bucket) GROUP BY xt.doc_id
    ) ws USING (doc_id)
    """,
    ),
    doc="fastText-class quality classifier trained INSIDE the engine "
    "(the DCLM / RedPajama-v2 model-based filtering stage): unsigned "
    "hashed-BOW features (md5-nibble buckets — text_hashing_vectorizer's "
    "portable hash), weak labels from the Gopher word-count gate, and 3 "
    "deterministic full-batch logistic-GD passes expressed as DataFrame "
    "ops (operators/classifier.py). Zero init + fixed pass count = no "
    "RNG, so the whole fit unrolls into chained SQL CTEs and carries a "
    "FULL value oracle — a trained classifier that hash-matches DuckDB. "
    "Scale shape: the feature table is built once (one scan, one "
    "(doc,bucket) agg) and hash-partitioned by doc; each pass reuses that "
    "partitioning for the per-doc score (no exchange) and pays ONE "
    "64-key map-side-combined exchange for the gradient; driver state is "
    "65 doubles per pass (embed_kmeans' bounded-collect contract). "
    "Separation quality pinned by tests/test_classifier.py (AUC >= 0.95 "
    "on the weak label).",
    tags=("llm", "curation", "quality", "iterative"),
)
def corpus_quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.classifier import (
        bias_rows,
        hashed_bow,
        logistic_gd,
        logistic_score,
        materialize_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    labels = docs.select(
        F.col("doc_id").alias("id"),
        n_words.between(50, 100000).cast("double").alias("y"),
    )
    # one feature build feeds the fit AND the final scoring pass:
    # materialize (id-partitioned + persisted) once instead of paying the
    # explode + md5 + aggregate twice
    feats = materialize_features(hashed_bow(docs).unionByName(bias_rows(docs)))
    w, b = logistic_gd(feats, labels, n_buckets=64, lr=0.5, passes=3, materialized=True)
    scored = logistic_score(feats, w, b)
    return scored.join(labels, "id").select(
        F.col("id").alias("doc_id"),
        F.col("y").cast("bigint").alias("label"),
        F.round("s", 6).alias("score_r"),
        F.round("p", 6).alias("prob_r"),
    )


@register(
    "corpus_classifier_holdout_auc",
    _classifier_gd_oracle(
        train_pred="doc_id % 5 <> 0",
        final_select="""
    , stest AS (
      SELECT d.doc_id,
             CASE WHEN d.n_words BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.0 END AS y,
             COALESCE(ws.sv, 0) + (SELECT b FROM b{T}) AS s
      FROM d LEFT JOIN (
        SELECT xt.doc_id, SUM(xt.x * w{T}.w) AS sv
        FROM xt JOIN w{T} USING (bucket) GROUP BY xt.doc_id
      ) ws USING (doc_id)
      WHERE d.doc_id % 5 = 0
    ),
    rk AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY s, doc_id) AS rnk FROM stest
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           ROUND((SUM(CASE WHEN y = 1.0 THEN rnk ELSE 0 END)
                  - (SUM(y) * (SUM(y) + 1)) / 2.0)
                 / (SUM(y) * (COUNT(*) - SUM(y))), 4) AS auc_r
    FROM rk
    """,
    ),
    doc="Held-out evaluation of corpus_quality_classifier: train on the "
    "doc_id%5<>0 split (the repo's stable-bucket split convention, "
    "corpus_train_val_split), score the held-out 20%, and report the "
    "exact Mann-Whitney AUC via rank-sum. The global rank is computed "
    "with the scalable two-level idiom (range-sort exchange, then "
    "per-partition row_number + broadcast cumulative offsets — "
    "operators/classifier.global_rank), never a single-reducer window; "
    "ties broken by doc_id so the rank (and the AUC) is engine-exact. "
    "One row out: the gate a production filter reads before trusting a "
    "threshold.",
    tags=("llm", "curation", "quality", "iterative"),
)
def corpus_classifier_holdout_auc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.classifier import (
        bias_rows,
        global_rank,
        hashed_bow,
        logistic_gd,
        logistic_score,
        materialize_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    labels = docs.select(
        F.col("doc_id").alias("id"),
        n_words.between(50, 100000).cast("double").alias("y"),
    )
    # one feature build feeds the fit AND the final scoring pass:
    # materialize (id-partitioned + persisted) once instead of paying the
    # explode + md5 + aggregate twice
    feats = materialize_features(hashed_bow(docs).unionByName(bias_rows(docs)))
    train = labels.filter(F.col("id") % 5 != 0)
    w, b = logistic_gd(feats, train, n_buckets=64, lr=0.5, passes=3, materialized=True)
    test = (
        logistic_score(feats, w, b)
        .join(labels.filter(F.col("id") % 5 == 0), "id")
        .select("id", "y", "s")
    )
    ranked = global_rank(test, ["s", "id"], out_col="rnk")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.round(
            (
                F.sum(F.when(F.col("y") == 1.0, F.col("rnk")).otherwise(F.lit(0)))
                - (F.sum("y") * (F.sum("y") + 1)) / 2.0
            )
            / (F.sum("y") * (F.count(F.lit(1)) - F.sum("y"))),
            4,
        ).alias("auc_r"),
    )


@register(
    "corpus_classifier_topk_filter",
    _classifier_gd_oracle(
        train_pred="TRUE",
        final_select="""
    , sall AS (
      SELECT d.doc_id,
             COALESCE(ws.sv, 0) + (SELECT b FROM b{T}) AS s
      FROM d LEFT JOIN (
        SELECT xt.doc_id, SUM(xt.x * w{T}.w) AS sv
        FROM xt JOIN w{T} USING (bucket) GROUP BY xt.doc_id
      ) ws USING (doc_id)
    ),
    rk AS (
      SELECT doc_id, s,
             ROW_NUMBER() OVER (ORDER BY ROUND(s, 6) DESC, doc_id) AS rnk,
             COUNT(*) OVER () AS n
      FROM sall
    )
    SELECT doc_id, ROUND(s, 6) AS score_r, CAST(rnk AS BIGINT) AS rnk
    FROM rk WHERE rnk <= CAST(CEIL(0.6 * n) AS BIGINT)
    """,
    ),
    doc="The DCLM keep-top-k% model-based filter as an EXACT operator: "
    "train the hashed-BOW logistic classifier (corpus_quality_classifier's "
    "fit, same unrolled-GD oracle) and keep the top 60% of documents by "
    "predicted score with a deterministic (round(score,6) desc, doc_id) "
    "tie-break — the rank key is rounded BEFORE ranking so near-ties "
    "resolve by doc_id rather than by aggregation merge order — "
    "rank-exact, so the kept set is bit-reproducible across engines and "
    "runs (the registry-grade version of curate's --classifier-keep-frac "
    "stage, which trades the exact rank for one approxQuantile float). "
    "Plan: the two-level global rank (range-sort exchange + driver-side "
    "per-partition offsets, operators/classifier.py::global_rank) — never "
    "a single-reducer window; the keep threshold is ceil(0.6*n) with n "
    "from one count over the already-materialized score table.",
    tags=("llm", "curation", "quality", "iterative"),
)
def corpus_classifier_topk_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from canvas_data_aws_spark.operators.classifier import (
        bias_rows,
        global_rank,
        hashed_bow,
        logistic_gd,
        logistic_score,
        materialize_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    labels = docs.select(
        F.col("doc_id").alias("id"),
        n_words.between(50, 100000).cast("double").alias("y"),
    )
    # one feature build feeds the fit AND the final scoring pass:
    # materialize (id-partitioned + persisted) once instead of paying the
    # explode + md5 + aggregate twice
    feats = materialize_features(hashed_bow(docs).unionByName(bias_rows(docs)))
    w, b = logistic_gd(feats, labels, n_buckets=64, lr=0.5, passes=3, materialized=True)
    # Rank on the ROUNDED score (6dp, the repo's rounding-before-comparison
    # convention) so the (score desc, doc_id) tie-break absorbs last-ulp
    # aggregation-merge-order differences between engines/runs — two
    # near-tied docs must resolve by doc_id, not by which engine's sum
    # landed a ulp higher. Rounding the PRIMARY key is safe here precisely
    # because doc_id is a unique secondary tie-break.
    scored = logistic_score(feats, w, b).select(
        "id", (-F.round("s", 6)).alias("neg_s"), "s"
    )
    ranked = global_rank(scored, ["neg_s", "id"], out_col="rnk")
    # count over the rank's already-checkpointed blocks — no score recompute
    total = ranked.count()
    cut = int(math.ceil(0.6 * total))
    return (
        ranked.filter(F.col("rnk") <= cut)
        .select(
            F.col("id").alias("doc_id"),
            F.round("s", 6).alias("score_r"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


@register(
    "corpus_classifier_reliability",
    _classifier_gd_oracle(
        train_pred="TRUE",
        final_select="""
    , sall AS (
      SELECT d.doc_id,
             CASE WHEN d.n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
               AS pass,
             ROUND(1.0 / (1.0 + exp(-(COALESCE(ws.sv, 0)
                                      + (SELECT b FROM b{T})))), 6) AS pr
      FROM d LEFT JOIN (
        SELECT xt.doc_id, SUM(xt.x * w{T}.w) AS sv
        FROM xt JOIN w{T} USING (bucket) GROUP BY xt.doc_id
      ) ws USING (doc_id)
    ),
    bk AS (
      SELECT LEAST(CAST(FLOOR(pr * 10) AS BIGINT), 9) AS bucket, pass,
             CAST(pr AS DECIMAL(18,6)) AS prd
      FROM sall
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pass) AS BIGINT) AS n_pass,
           ROUND(SUM(pass) * 1.0 / COUNT(*), 6) AS pass_rate,
           CAST(SUM(prd) AS DECIMAL(38,6)) AS sum_prob
    FROM bk GROUP BY bucket
    """,
    ),
    doc="Reliability (calibration) table for the TRAINED classifier — the "
    "companion readout to corpus_quality_calibration (which calibrates the "
    "rule-based q_score): bucket the 3-pass GD model's predicted "
    "probability into deciles (on the 6dp-rounded probability, the repo's "
    "rounding-before-comparison convention — the rounding absorbs "
    "exp() last-ulp differences before the decile floor) and report, per "
    "bucket, the observed pass rate of the weak label plus the "
    "DECIMAL-exact probability mass. This is the evidence behind the "
    "keep-top-k% design choice documented in curate's stage 1c: a 3-pass "
    "fit RANKS well (holdout AUC 0.999, corpus_classifier_holdout_auc) "
    "long before its probabilities calibrate — visible here as mass "
    "concentrated in the middle deciles with a monotone but uncalibrated "
    "pass-rate curve, which is why the stage thresholds on rank, not on "
    "an absolute probability. Exact oracle: the same unrolled-GD CTE "
    "chain, decile math in integer FLOOR, probability mass summed as "
    "DECIMAL(38,6). One cached feature scan + the per-pass bounded "
    "gradient exchange + one 10-group map-side-combined agg.",
    tags=("llm", "curation", "quality", "iterative"),
)
def corpus_classifier_reliability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from canvas_data_aws_spark.operators.classifier import (
        bias_rows,
        hashed_bow,
        logistic_gd,
        logistic_score,
        materialize_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    n_words = F.size(F.split(F.trim("text"), r"\s+"))
    labels = docs.select(
        F.col("doc_id").alias("id"),
        n_words.between(50, 100000).cast("double").alias("y"),
    )
    # one feature build feeds the fit AND the final scoring pass:
    # materialize (id-partitioned + persisted) once instead of paying the
    # explode + md5 + aggregate twice
    feats = materialize_features(hashed_bow(docs).unionByName(bias_rows(docs)))
    w, b = logistic_gd(feats, labels, n_buckets=64, lr=0.5, passes=3, materialized=True)
    p_r = F.round("p", 6)
    bk = (
        logistic_score(feats, w, b)
        .join(labels, "id")
        .select(
            F.least(F.floor(p_r * 10).cast("bigint"), F.lit(9)).alias("bucket"),
            F.col("y").cast("bigint").alias("pass"),
            p_r.cast("decimal(18,6)").alias("prd"),
        )
    )
    return bk.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("pass").cast("bigint").alias("n_pass"),
        F.round(F.sum("pass") / F.count(F.lit(1)), 6).alias("pass_rate"),
        F.sum("prd").cast("decimal(38,6)").alias("sum_prob"),
    )
