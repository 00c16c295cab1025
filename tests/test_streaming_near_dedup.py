"""stream_near_dedup: the streaming verdicts must EXACTLY equal a
sequential batch-by-batch replay built from the batch operators
(minhash_cross_pairs vs accumulated kept-state + within-batch
minhash_lsh_pairs with the identical seed/geometry) — proof that the
foreachBatch state machine implements the declared contract, not an
approximation of it."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from canvas_data_aws_spark.operators.dedup import (
    minhash_cross_pairs,
    minhash_lsh_pairs,
)
from canvas_data_aws_spark.sources.parquet import load_table


def test_stream_equals_sequential_replay(spark, sf_dir, tmp_path):
    from canvas_data_aws_spark.plans.streaming_q import stage_arrival_batches
    from canvas_data_aws_spark.streaming.near_dedup import stream_near_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_batches = 4

    workdir = str(tmp_path / "stream")
    os.makedirs(workdir, exist_ok=True)
    src_dir = stage_arrival_batches(spark, docs, workdir, n_batches=n_batches)
    schema = spark.read.parquet(src_dir).schema
    out_dir = os.path.join(workdir, "verdicts")
    query = stream_near_dedup(
        spark,
        src_dir,
        schema,
        state_dir=os.path.join(workdir, "state"),
        out_dir=out_dir,
        jaccard_threshold=0.5,
    )
    query.awaitTermination(300)
    got = {
        r["doc_id"]: (r["matched_state"], r["matched_batch"], r["kept"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # ---- sequential replay with the batch operators
    expected: dict[int, tuple[bool, bool, bool]] = {}
    state = None
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        mb_ids = {
            r["id_b"]
            for r in minhash_lsh_pairs(batch, jaccard_threshold=0.5)
            .select("id_b")
            .distinct()
            .collect()
        }
        ms_ids = (
            set()
            if state is None
            else {
                r["delta_id"]
                for r in minhash_cross_pairs(batch, state, jaccard_threshold=0.5)
                .select("delta_id")
                .distinct()
                .collect()
            }
        )
        batch_ids = [r["doc_id"] for r in batch.select("doc_id").collect()]
        kept_ids = []
        for d in batch_ids:
            ms, mb = d in ms_ids, d in mb_ids
            expected[d] = (ms, mb, not (ms or mb))
            if not (ms or mb):
                kept_ids.append(d)
        kept_df = batch.filter(
            F.col("doc_id").isin(kept_ids) if kept_ids else F.lit(False)
        )
        state = kept_df if state is None else state.unionAll(kept_df)

    assert set(got) == set(expected)
    diffs = {d: (got[d], expected[d]) for d in got if got[d] != expected[d]}
    assert not diffs, f"{len(diffs)} verdict mismatches, e.g. {list(diffs.items())[:3]}"

    # the test bites: later batches must hit state (the fixture plants
    # cross-corpus near-dups), and batch 0 can never match empty state
    assert any(ms for d, (ms, _, _) in got.items() if d % n_batches > 0)
    assert not any(ms for d, (ms, _, _) in got.items() if d % n_batches == 0)
