"""Operable entity-resolution pipeline: ``python -m canvas_data_aws_spark link``.

The registry entries (plans/linkage_q.py) are the oracle-checked query
surface; this module is the DEPLOYMENT shape — the block -> score ->
cluster -> merge pipeline writing persistent outputs a downstream consumer
reads, with an incremental day-2 mode that matches only NEW records
against the persisted entity state (never rescoring base x base), the same
decoupling `curate` gets from the attribute store.

State layout under ``--out`` (versioned dirs + one atomic marker, the
repo's swap convention):

    _link_state.json        <- atomic marker: current run + dir names
    entities_v{N}.parquet   <- (doc_id, entity_id, matched, best_score, run)
    golden_v{N}.parquet     <- survivorship golden records
    review_v{N}.parquet     <- clerical-review pairs (decision='review')

A crash mid-run leaves the marker untouched (readers keep the previous
consistent version); the new version's dirs are orphans, overwritten by
the retry. Runs are versioned, never mutated in place.

Incremental semantics (stated, test-pinned): day-2 deltas are matched
against EXISTING entities only — two deltas of the same day do not link to
each other, and delta evidence never merges two base entities. That is the
standard streaming-ER trade (delta-sized daily cost); a periodic batch
re-run reconciles if cross-delta duplicates matter. At 100 TB the golden
rebuild is one linear groupBy over (docs ⨝ entities) — the same cost class
as the attribute store build; entity-touched-only maintenance would be the
next refinement and is deliberately out of scope while the full rebuild
stays linear.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from canvas_data_aws_spark.operators.clustering import connected_components
from canvas_data_aws_spark.operators.linkage import (
    candidate_pairs,
    delta_candidates,
    incremental_match,
    prepared,
    score_pairs,
    survivorship,
)
from canvas_data_aws_spark.pipelines.curate import _atomic_write_json
from canvas_data_aws_spark.sources.parquet import load_table

MARKER = "_link_state.json"


def _read_marker(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, MARKER)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as fh:
            return json.load(fh)
    except ValueError:
        # truncated marker can only be a hand-edited file (writes are
        # atomic); treat as no-state rather than crash
        return None


def _write_outputs(
    out_dir: str,
    run: int,
    entities: DataFrame,
    golden: DataFrame,
    review: DataFrame,
) -> dict:
    names = {
        "entities": f"entities_v{run}.parquet",
        "golden": f"golden_v{run}.parquet",
        "review": f"review_v{run}.parquet",
    }
    entities.write.mode("overwrite").parquet(os.path.join(out_dir, names["entities"]))
    golden.write.mode("overwrite").parquet(os.path.join(out_dir, names["golden"]))
    review.write.mode("overwrite").parquet(os.path.join(out_dir, names["review"]))
    return names


def run_link(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    where: str | None = None,
) -> dict:
    """One pipeline run. No state under ``out_dir`` => batch mode (full ER
    over the scoped documents). Existing state => incremental mode: scope
    rows NOT in the persisted entity table are today's delta, matched
    against the persisted base only; an empty delta is a no-op (idempotent
    re-runs never bump the version)."""
    os.makedirs(out_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    scope = docs.filter(where) if where else docs
    marker = _read_marker(out_dir)

    if marker is None:
        prep = prepared(scope)
        cand = candidate_pairs(prep)
        scored = score_pairs(prep, cand).localCheckpoint(eager=True)
        edges = scored.filter(F.col("decision") == "match").select("id_a", "id_b")
        clusters = connected_components(
            # unique id_a < id_b match pairs: skip the defensive distinct
            scope.select(F.col("doc_id").alias("id")), edges, vertex_col="id",
            assume_unique=True,
        ).select(F.col("id").alias("doc_id"), F.col("component").alias("entity_id"))
        from pyspark.sql import Window

        ew = Window.partitionBy("entity_id")
        entities = (
            clusters.withColumn("__n", F.count(F.lit(1)).over(ew))
            .select(
                "doc_id",
                "entity_id",
                (F.col("__n") > 1).alias("matched"),
                F.lit(None).cast("double").alias("best_score"),
                F.lit(1).alias("run"),
            )
        )
        golden = survivorship(scope, clusters)
        review = scored.filter(F.col("decision") == "review")
        names = _write_outputs(out_dir, 1, entities, golden, review)
        n_scope = scope.count()
        n_entities = golden.count()
        summary = {
            "mode": "batch",
            "run": 1,
            "n_scope": n_scope,
            "n_delta": n_scope,
            "n_matched": int(
                entities.filter(F.col("matched")).count()
            ),
            "n_entities": int(n_entities),
            "n_review": int(review.count()),
        }
        _atomic_write_json(
            os.path.join(out_dir, MARKER),
            {"run": 1, "dirs": names, "sf_dir": sf_dir},
        )
        return summary

    run = int(marker["run"])
    prev = spark.read.parquet(os.path.join(out_dir, marker["dirs"]["entities"]))
    known = prev.select("doc_id")
    delta_docs = scope.join(known, "doc_id", "left_anti")
    n_delta = delta_docs.count()
    if n_delta == 0:
        return {
            "mode": "incremental",
            "run": run,
            "n_scope": int(scope.count()),
            "n_delta": 0,
            "noop": True,
        }
    # the base is the persisted state's population (from the FULL table,
    # not today's scope) — a --where selecting only new rows must still
    # match them against everything already resolved
    base_docs = docs.join(known, "doc_id", "left_semi")
    state = prev.select("doc_id", "entity_id")
    d_prep = prepared(delta_docs)
    b_prep = prepared(base_docs)
    scored = score_pairs(
        d_prep, delta_candidates(d_prep, b_prep), prep_b=b_prep
    ).localCheckpoint(eager=True)
    assigned = incremental_match(
        d_prep, b_prep, state, scored=scored
    ).localCheckpoint(eager=True)
    new_run = run + 1
    entities = prev.select("doc_id", "entity_id", "matched", "best_score", "run").unionByName(
        assigned.select(
            "doc_id", "entity_id", "matched", "best_score", F.lit(new_run).alias("run")
        )
    )
    all_docs = docs.join(entities.select("doc_id"), "doc_id", "left_semi")
    golden = survivorship(all_docs, entities.select("doc_id", "entity_id"))
    # review queue for the delta only (the day's clerical work) — the
    # SAME scored table the assignment used, no second scoring pass
    review = scored.filter(F.col("decision") == "review")
    names = _write_outputs(out_dir, new_run, entities, golden, review)
    summary = {
        "mode": "incremental",
        "run": new_run,
        "n_scope": int(scope.count()),
        "n_delta": int(n_delta),
        "n_matched": int(assigned.filter(F.col("matched")).count()),
        "n_entities": int(golden.count()),
        "n_review": int(review.count()),
    }
    _atomic_write_json(
        os.path.join(out_dir, MARKER),
        {"run": new_run, "dirs": names, "sf_dir": sf_dir},
    )
    return summary
