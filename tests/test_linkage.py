"""Record-linkage family unit tests: blocking bounds/provenance, decision
margins on the planted near-dups, entity formation, survivorship merge
rules, and the MMR greedy invariants. The differential oracle gate
(test_queries_oracle.py) value-checks each registered entry end-to-end;
these pin the operator-level semantics the oracles can't name."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from canvas_data_aws_spark.operators.linkage import (
    MATCH_T,
    REVIEW_T,
    candidate_pairs,
    match_edges,
    prepared,
    score_pairs,
    survivorship,
)
from canvas_data_aws_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def prep(spark, sf_dir):
    return prepared(load_table(spark, sf_dir, "documents")).cache()


@pytest.fixture(scope="module")
def cand(prep):
    return candidate_pairs(prep).cache()


def test_candidate_pairs_ordered_and_deduped(cand):
    rows = cand.collect()
    assert len(rows) > 0
    assert all(r.id_a < r.id_b for r in rows)
    assert len({(r.id_a, r.id_b) for r in rows}) == len(rows)
    # every pair came from at least one pass
    assert all(r.in_structure_block or r.in_prefix_block for r in rows)


def test_candidate_pairs_bounded_by_block_sizes(prep, cand):
    """The blocking passes are the fan-out bound: total pairs == sum over
    blocks of C(g,2) per pass (before the union dedup), so the union can
    never exceed that sum."""
    struct_sizes = (
        prep.groupBy("lang", (F.col("n_tok") / 8).cast("long"))
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .head()[0]
    )
    prefix_sizes = (
        prep.groupBy("prefix_key")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .head()[0]
    )
    assert cand.count() <= int(struct_sizes) + int(prefix_sizes)


def test_provenance_flags_or_folded(prep, cand):
    """A pair found by both passes keeps both flags (union is grouped, not
    first-writer-wins)."""
    both = cand.filter(F.col("in_structure_block") & F.col("in_prefix_block"))
    # the planted near-dups share lang+band AND the 3-token prefix, so at
    # least some pairs must carry both flags at every fixture scale
    assert both.count() > 0


def test_decision_margin_on_planted_dups(prep, cand):
    """The synthetic corpus plants near-identical pairs: high-Jaccard pairs
    must decide 'match', and nothing in the clerical band between the
    thresholds at fixture scale (the calibrated margin)."""
    scored = score_pairs(prep, cand).cache()
    high_jac = scored.filter(F.col("jac3") >= 0.8)
    assert high_jac.count() > 0
    assert high_jac.filter(F.col("decision") != "match").count() == 0
    # calibrated margin: background tops out well under REVIEW_T
    band = scored.filter(
        (F.col("score") >= REVIEW_T) & (F.col("score") < MATCH_T)
    )
    assert band.count() == 0
    scored.unpersist()


def test_match_edges_transitive_into_entities(spark, sf_dir, prep):
    from canvas_data_aws_spark.operators.clustering import connected_components

    docs = load_table(spark, sf_dir, "documents")
    edges = match_edges(prep).cache()
    clusters = connected_components(
        docs.select(F.col("doc_id").alias("id")), edges, vertex_col="id"
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("entity_id"))
    cl = {r.doc_id: r.entity_id for r in clusters.collect()}
    e = edges.collect()
    assert len(e) > 0
    for r in e:
        assert cl[r.id_a] == cl[r.id_b]
    # canonical id = min member id
    by_entity: dict = {}
    for d, ent in cl.items():
        by_entity.setdefault(ent, []).append(d)
    for ent, members in by_entity.items():
        assert ent == min(members)
    edges.unpersist()


def test_survivorship_merge_rules(spark, sf_dir, prep):
    from canvas_data_aws_spark.operators.clustering import connected_components

    docs = load_table(spark, sf_dir, "documents")
    clusters = connected_components(
        docs.select(F.col("doc_id").alias("id")),
        match_edges(prep),
        vertex_col="id",
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("entity_id"))
    golden = survivorship(docs, clusters).cache()
    mem = docs.join(clusters, "doc_id").collect()
    by_entity: dict = {}
    for r in mem:
        by_entity.setdefault(r.entity_id, []).append(r)
    g = {r.entity_id: r for r in golden.collect()}
    assert set(g) == set(by_entity)
    # every doc is in exactly one entity; members sum to corpus size
    assert sum(r.n_members for r in g.values()) == docs.count()
    for ent, members in by_entity.items():
        rep = min(members, key=lambda r: (-r.n_chars, r.doc_id))
        assert g[ent].rep_doc_id == rep.doc_id
        assert g[ent].rep_n_chars == rep.n_chars
        assert g[ent].total_chars == sum(r.n_chars for r in members)
        langs: dict = {}
        for r in members:
            langs[r.lang] = langs.get(r.lang, 0) + 1
        modal = min(langs, key=lambda L: (-langs[L], L))
        assert g[ent].entity_lang == modal
    golden.unpersist()


def test_mmr_greedy_invariants(spark, sf_dir):
    from canvas_data_aws_spark.operators.similarity import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()["embedding"]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    out = mmr_select(corpus, qvec, k=6, pool_size=16, lam=0.7).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == len(ids)
    # rank 1 is the pure-relevance argmax (empty selected set)
    top_rel = (
        corpus.select(
            "vec_id",
            F.round(
                __import__(
                    "canvas_data_aws_spark.operators.similarity", fromlist=["cosine"]
                ).cosine(F.col("embedding"), F.array(*[F.lit(x) for x in qvec])),
                6,
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .head()
    )
    assert out[0].vec_id == top_rel.vec_id
    assert out[0].max_sim == 0.0
    # each candidate's mmr only decays as the selected set grows, so the
    # chosen sequence is non-increasing in mmr_score
    scores = [r.mmr_score for r in out]
    assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))


def test_mmr_k_exceeding_pool_truncates(spark, sf_dir):
    from canvas_data_aws_spark.operators.similarity import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()["embedding"]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    out = mmr_select(corpus, qvec, k=10, pool_size=4, lam=0.7).collect()
    assert len(out) == 4  # pool exhausted, no crash, no duplicates


def test_blocking_stats_bounds_candidates(spark, sf_dir, prep, cand):
    from canvas_data_aws_spark.plans.registry import all_queries

    stats = {
        r.pass_name: r
        for r in all_queries()["link_blocking_stats"].fn(spark, sf_dir).collect()
    }
    assert set(stats) == {"structure", "prefix"}
    total_mass = sum(r.candidate_pairs for r in stats.values())
    # the deduped union can never exceed the per-pass pair mass the audit
    # reports — the audit is the pre-flight upper bound it claims to be
    assert cand.count() <= total_mass
    for r in stats.values():
        assert r.max_block >= 1 and r.n_blocks >= 1


def test_incremental_match_semantics(spark, sf_dir):
    from canvas_data_aws_spark.operators.clustering import connected_components
    from canvas_data_aws_spark.operators.linkage import (
        delta_candidates,
        incremental_match,
    )
    from canvas_data_aws_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    base_docs = docs.filter(~(F.col("doc_id") % 10 >= 8))
    delta_docs = docs.filter(F.col("doc_id") % 10 >= 8)
    base_prep = prepared(base_docs).cache()
    delta_prep = prepared(delta_docs).cache()
    base_clusters = connected_components(
        base_docs.select(F.col("doc_id").alias("id")),
        match_edges(base_prep),
        vertex_col="id",
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("entity_id"))
    state = {r.doc_id: r.entity_id for r in base_clusters.collect()}
    out = incremental_match(delta_prep, base_prep, base_clusters).collect()

    # exactly one verdict per delta record
    assert len(out) == delta_docs.count()
    assert len({r.doc_id for r in out}) == len(out)
    matched = [r for r in out if r.matched]
    assert matched, "fixture plants cross-split near-dups"
    for r in out:
        if r.matched:
            # adopted entity must be a real base entity, score at threshold+
            assert r.entity_id in set(state.values())
            assert r.best_score >= MATCH_T
        else:
            assert r.entity_id == r.doc_id and r.best_score is None

    # best-match choice agrees with a brute-force over the scored pairs
    scored = score_pairs(
        delta_prep, delta_candidates(delta_prep, base_prep), prep_b=base_prep
    )
    by_delta: dict = {}
    for p in scored.filter(F.col("decision") == "match").collect():
        cur = by_delta.get(p.id_a)
        key = (-float(p.score), p.id_b)
        if cur is None or key < cur[0]:
            by_delta[p.id_a] = (key, p.id_b)
    for r in matched:
        assert state[by_delta[r.doc_id][1]] == r.entity_id
    base_prep.unpersist()
    delta_prep.unpersist()


def test_eval_truth_is_perfect_on_fixture(spark, sf_dir):
    """Regression canary: on the synthetic corpus the decision rule must
    recover the 0.8-Jaccard truth EXACTLY (fp == fn == 0). Any future
    blocking-key or weight change that drops a planted pair turns this
    red before it ships."""
    from canvas_data_aws_spark.plans.registry import all_queries

    row = all_queries()["link_eval_truth"].fn(spark, sf_dir).head()
    assert row.tp > 0
    assert row.fp == 0 and row.fn == 0
    assert row.precision == 1.0 and row.recall == 1.0


def test_mmr_local_arithmetic_matches_engine(spark):
    """The driver-local greedy (round 13 optimization) replays engine
    numerics EXACTLY: shortest-repr HALF_UP 6dp rounding == Spark's
    round(double, 6) / decimal(18,6) cast, and the sequential-fold cosine
    == F.aggregate's left fold — checked value-by-value on adversarial
    inputs (exact 7dp midpoints, ulp-offset doubles, random draws)."""
    import random

    from canvas_data_aws_spark.operators.similarity import (
        _fold_cosine,
        _round6_exact,
        cosine,
    )

    rng = random.Random(13)
    vals = [0.1234565, -0.1234565, 0.0000005, 1.9999995, 0.5275835, 0.1]
    vals += [v + 1e-16 for v in vals] + [rng.uniform(-2, 2) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x",
        F.round("x", 6).alias("r6"),
        F.col("x").cast("decimal(18,6)").alias("d6"),
    )
    for row in df.collect():
        local = _round6_exact(row["x"])
        assert float(local) == row["r6"], (row["x"], float(local), row["r6"])
        assert local == row["d6"], (row["x"], local, row["d6"])

    vecs = [
        ([rng.uniform(-1, 1) for _ in range(64)], [rng.uniform(-1, 1) for _ in range(64)])
        for _ in range(25)
    ]
    vdf = spark.createDataFrame(vecs, "u array<double>, v array<double>").select(
        "u", "v", cosine(F.col("u"), F.col("v")).alias("c")
    )
    for row in vdf.collect():
        assert _fold_cosine(list(row["u"]), list(row["v"])) == row["c"]
