"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries": {...}, "sf"}.

Timing method: per query, force full execution with a count-collapsing
action over the result (``df.write.format("noop")`` — executes the whole
plan including sinks, no driver materialization cost).

Snapshot protocol (round-7/8 verdict item: min-of-2 FRESH PROCESSES):
the default invocation spawns itself twice as child processes (one JVM
each — same-JVM reruns inherit GC/JIT/cache state), takes the per-query
MIN across the two runs as the snapshot, and records BOTH raw runs in
BENCH_FULL.json under ``runs`` so any round-over-round drift can be
adjudicated against per-run scatter instead of a single sample. Within a
child each query is min-of-2 reps, so the snapshot is a min over 4
samples from 2 JVMs. Set CDA_BENCH_SINGLE=1 to force the old one-process
behavior (used by the children themselves).

Ambient-load protocol (round-11 verdict item: the r11 snapshot landed in
a ~1.2x-slow machine band and cross-round deltas against it would read
spuriously fast). Every run now records, alongside the timings:

- ``loadavg``: os.getloadavg() 1-minute samples at child start and end —
  load NOT attributable to the bench itself means a contended box.
- ``ref_query_sec``: a fixed REFERENCE micro-benchmark — sum over a
  4-billion-row in-memory range (see _ref_query_sec, the single source
  of truth for the query), pure whole-stage-codegen arithmetic, no
  I/O, no shuffle, data-independent — timed at child start and end
  (min-of-2 each). Its cost depends only on machine speed, so the ratio
  ref_now / ref_committed is the ambient slowdown factor of the box.
- ``ref_io_sec``: the I/O-axis companion (round-12 verdict item 4 —
  ref_query_sec is CPU-only, so I/O contention reads ~1.0 there): a
  fixed buffered-read pass over lineitem.parquet (see _ref_io_sec for
  the contract and its honest page-cache scope), same start/end +
  min-of-all-samples protocol.

Normalization rule (BENCH_NOISE.md states the same): a cross-round
per-query delta is attributable to CODE only if it survives dividing by
the ambient factor ref_now/ref_baseline and still exceeds the measured
±0.3-0.7 s per-query noise floor; otherwise it is the machine band.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one per operator family — enough to profile scan, shuffle,
# join, window, and UDF paths without re-running the entire registry.
HEADLINE = [
    "flagship_pricing_summary",
    "star_revenue_by_nation",
    "star_top_customers",
    "star_part_type_share",
    "join_broadcast_equi",
    "join_sortmerge_equi",
    "join_asof",
    "join_range_interval",
    "agg_rollup",
    "agg_count_distinct",
    "win_topk_per_group",
    "win_agg_frame_rows",
    "fn_json",
    "fn_array",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_bounded",
    "dedup_containment_bounded",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_blocked",
    "corpus_line_dedup",
    "sim_search_cosine",
    "sim_search_ivf",
    "sim_search_lsh",
    "text_quality",
    "corpus_decontaminate",
    "corpus_ngram_top_k",
    "corpus_bpe_merges",
    "text_pii_scrub",
    "doc_fingerprint",
    "multimodal_decode",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_stream_join",
    "sync_reconcile_scale",
    # round 3: product analytics + warehouse maintenance + curation
    "events_sessionize",
    "events_funnel",
    "scd2_dimension_build",
    "table_merge_upsert",
    "corpus_tfidf_top_terms",
    "graph_triangle_count",
    # round 5: iterative clustering + passage-level dedup + MV maintenance
    "embed_kmeans",
    "corpus_repeated_passages",
    "table_incremental_agg",
    "sim_search_quantized",
    "corpus_curation_funnel",
    "scd2_point_in_time_join",
    "corpus_semdedup",
    # round 5 session 2: CDC diff, association mining, grid joins, PCA,
    # LPA communities, entropy scoring, windowed funnels
    "table_snapshot_diff",
    "market_basket_lift",
    "join_interval_overlap",
    "embed_pca_project",
    "graph_label_propagation",
    "text_char_entropy",
    "events_funnel_windowed",
    # round 5 session 3: bounded as-of, EWMA, deterministic weighted
    # sampling, RFM/Pareto warehouse analytics, containment dedup,
    # concurrency sweep, connected components
    "join_asof_tolerance",
    "ts_ewma",
    "corpus_sample_weighted",
    "customer_rfm_segments",
    "orders_pareto_share",
    "events_concurrency",
    "dedup_containment",
    "graph_connected_components",
    # round 5 session 3b: classic TPC-H shapes
    "tpch_q3",
    "tpch_q5",
    "tpch_q10",
    "tpch_q6",
    "tpch_q18",
    "tpch_q14",
    "text_bm25_search",
    "events_activity_islands",
    "table_latest_by_key",
    "agg_moments",
    "sim_search_pq",
    "tpch_q13",
    "tpch_q22",
    # round 6: partsupp-based TPC-H (generated supplement; local-only in
    # the registry but fully runnable here), bigram LM quality scoring
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q16",
    "tpch_q20",
    "tpch_q12",
    "tpch_q21",
    "corpus_bigram_logprob",
    # round 7: driver-facing shipped-column variants of the supplement
    # TPC-H seven (observed part-supplier bridge from lineitem)
    "tpch_q2_shipped",
    "tpch_q9_shipped",
    "tpch_q11_shipped",
    "tpch_q16_shipped",
    "tpch_q20_shipped",
    "tpch_q12_shipped",
    "tpch_q21_shipped",
    "corpus_dup_ngram_spans",
    "corpus_perplexity_buckets",
    "ts_decompose_additive",
    "fn_variant",
    "corpus_dup_span_strip",
    "table_zorder_clustering",
    "events_anomaly_stl",
    "corpus_kneser_ney_logprob",
    "dq_column_profile",
    "table_cdc_apply",
    "events_value_histogram",
    "sketch_count_min",
    "sketch_quantile_digest",
    "sketch_quantile_digest_rolling",
    "corpus_attribute_store",
    "corpus_attribute_store_incremental",
    "corpus_quality_calibration",
    "corpus_quality_classifier",
    "corpus_classifier_holdout_auc",
    "corpus_classifier_topk_filter",
    "events_ab_cuped",
    "ts_holt_linear",
    "doc_fingerprint_winnowing",
    "dq_benford_first_digit",
    "events_cumulative_distinct_users",
    "events_duplicate_purchase_screen",
    "ts_time_weighted_avg",
    "events_survival_hazard",
    "dq_functional_dependency",
    "text_langid_confusion",
    "orders_mix_shift_decomposition",
    "corpus_global_shuffle",
    "embed_linear_probe",
    "ts_backtest_rolling_origin",
    "corpus_quality_probe",
    "events_ab_srm_check",
    "events_ab_power_mde",
    "corpus_padding_waste",
    "orders_backlog_aging",
    "graph_k_core",
    "text_hashing_vectorizer",
    "lineitem_fulfillment_lag",
    "supplier_concentration_hhi",
    "corpus_vocab_coverage_curve",
    "scan_csv_quoted",
    "corpus_dedup_bias_audit",
    "events_attribution_markov",
    "events_bot_score",
    "part_price_index",
    "events_burst_detection",
    "text_readability",
    "events_causal_did",
    "dedup_cluster_size_histogram",
    "ts_holt_winters_additive",
    "part_weighted_median_price",
    "sim_search_filtered",
    "dq_order_total_reconciliation",
    "table_parquet_footer_audit",
    "events_markov_prediction_eval",
    "dedup_minhash_calibration",
    # round 13: the iterative-tag HEADLINE gate (every `iterative`-tagged
    # registry entry must be benched or on HEADLINE_EXCLUDED —
    # tests/test_bench_smoke.py) pulled in the six that had silently
    # escaped the series, including the round-12
    # corpus_classifier_reliability (~3.6 s full GD fit, the gate's
    # existence proof; round-12 verdict items 1-2). Measured sf0.1
    # singles at adoption: dedup_cluster 4.0, dedup_collapse_best 3.2,
    # corpus_soft_dedup_weights 3.1, reliability 3.6,
    # embed_outlier_scores 1.3, embed_logistic_probe 1.5.
    "corpus_classifier_reliability",
    "dedup_cluster",
    "dedup_collapse_best",
    "corpus_soft_dedup_weights",
    "embed_outlier_scores",
    "embed_logistic_probe",
    # round 13 session 2: record-linkage/ER family + MMR diverse top-k —
    # all five benched from birth (three carry the iterative tag; the two
    # cheap stages ride along so the family's cost curve is visible in
    # one series).
    "link_candidate_pairs",
    "link_score_pairs",
    "link_entity_clusters",
    "link_survivorship",
    "sim_search_mmr",
    "link_incremental_match",
    "link_blocking_stats",
    "link_eval_truth",
    # round 13 session 3: training-set assembly family — benched from
    # birth (the composed manifest is the costly one; the two audits ride
    # along so the family's cost curve is visible in one series).
    "corpus_assemble_manifest",
    "corpus_curriculum_schedule",
    "corpus_length_grouped_batches",
    "corpus_pack_boundary_split",
]

#: The HEADLINE-membership escape hatch the gate requires to be EXPLICIT
#: (round-12 verdict item 2): a registry entry carrying a cost-marker tag
#: (``iterative`` — the unrolled/multi-pass plans, the only tag whose
#: members all cost >1 s at sf0.1) may stay out of the bench series ONLY
#: by appearing here with a stated reason. Empty today: every
#: iterative-tagged entry is benched.
HEADLINE_EXCLUDED: dict[str, str] = {}

# The external harness that records bench output keeps only the LAST ~2000
# characters of stdout, so the final JSON line must stay under this budget
# to parse (round 5's full per-query line overflowed and recorded
# parsed=null). Full per-query timings go to BENCH_FULL.json and an earlier
# stdout line; the final line carries the total plus as many per-query
# entries as fit, slowest first (the entries a reader audits).
FINAL_LINE_BUDGET = 1800


def compact_result(timings: dict[str, float], sf: float) -> dict:
    total = round(sum(timings.values()), 3)
    base = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_omitted_fastest": len(timings),  # placeholder at max width so the
        "full": "BENCH_FULL.json",  # budget check accounts for its digits
        "queries": {},
    }
    by_cost = sorted(timings.items(), key=lambda kv: -kv[1])
    for name, t in by_cost:
        candidate = dict(base)
        candidate["queries"] = {**base["queries"], name: round(t, 2)}
        if len(json.dumps(candidate)) > FINAL_LINE_BUDGET:
            break
        base = candidate
    base["n_omitted_fastest"] = len(timings) - len(base["queries"])
    return base


def _prebuilt_ann_entries(spark, sf_dir: str) -> dict:
    """Steady-state ANN bench variants: the index is built AND persisted to
    parquet here (untimed — that's the write-time cost a production run pays
    once), so the timed body measures only the query path against the
    on-disk index. The registry's sim_search_ivf/lsh entries keep the
    one-shot (index+query fused) shape; these report what a serving user
    actually waits for."""
    import tempfile

    from pyspark.sql import functions as F

    from canvas_data_aws_spark.operators.similarity import (
        IvfIndex,
        LshIndex,
        ivf_index,
        ivf_query,
        ivf_query_adc,
        lsh_index,
        lsh_query,
    )
    from canvas_data_aws_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    base = tempfile.mkdtemp(prefix="cda_bench_idx_")

    ivf = ivf_index(emb, n_clusters=16)
    ivf.assigned.write.partitionBy("cell").mode("overwrite").parquet(f"{base}/ivf_a")
    ivf.centroids.write.mode("overwrite").parquet(f"{base}/ivf_c")
    ivf_disk = IvfIndex(
        spark.read.parquet(f"{base}/ivf_c"),
        spark.read.parquet(f"{base}/ivf_a"),
        "vec_id",
        "embedding",
    )

    lsh = lsh_index(emb, n_tables=32, bits_per_table=6, dim=64)
    lsh.entries.write.mode("overwrite").parquet(f"{base}/lsh_e")
    lsh_disk = LshIndex(
        spark.read.parquet(f"{base}/lsh_e"), lsh.planes, 32, 6, "vec_id", "embedding"
    )

    return {
        "sim_search_ivf_prebuilt": lambda s, d: ivf_query(ivf_disk, queries, k=10, nprobe=4),
        "sim_search_ivf_adc_prebuilt": lambda s, d: ivf_query_adc(
            ivf_disk, queries, k=10, nprobe=4
        ),
        "sim_search_lsh_prebuilt": lambda s, d: lsh_query(lsh_disk, emb, queries, k=10),
    }


def _sf_of(sf_dir: str) -> float:
    try:
        return float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        return -1.0  # unknown scale tag; timings still valid


def _ref_query_sec(spark) -> float:
    """The fixed machine-speed probe: sum((id*3+7) mod p) over a 4e9-row range in
    32 partitions — pure whole-stage-codegen arithmetic, no I/O, no
    shuffle beyond the final 1-row reduce, no data dependence. min-of-2.
    Constant across rounds BY CONTRACT: changing this query invalidates
    every cross-round ambient comparison, so don't.

    Reading the per-run [start, end] pairs: the START sample's first rep
    includes codegen JIT warmup (measured ~0.81-0.83 vs 0.64 steady on an
    idle box), which min-of-2 mostly but not always hides — a start sample
    above the end sample is warmup, NOT mid-run contention; only the MIN
    across all samples is the machine-speed figure the normalization rule
    divides by. Also note the probe is CPU-only: an I/O-contended session
    reads factor ~1.0 here — ref_io_sec below covers that axis."""
    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        df = spark.range(0, 4_000_000_000, 1, 32).selectExpr(
            "sum((id * 3 + 7) % 1000000007) as s"  # mod keeps SUM in int64
        )
        df.write.format("noop").mode("overwrite").save()
        reps.append(time.perf_counter() - t0)
    return round(min(reps), 3)


def _ref_io_sec(sf_dir: str) -> float:
    """The fixed I/O-path probe (round-12 verdict item 4: ref_query_sec is
    CPU-only, so an I/O-contended session reads ambient factor ~1.0 there
    and any I/O-bound slowdown would present as a code regression). This
    probe times the OS buffered-read path: lineitem.parquet read
    end-to-end 16 passes in 4 MiB chunks, pure Python, no Spark — fixed
    BY CONTRACT per sf dir (file, pass count, chunk size), min-of-2.

    Honest scope: after the bench's warm-up scan the file is page-cache
    resident, so this measures kernel read-path + memory-bandwidth
    contention (which heavy co-located I/O and memory pressure DO
    inflate), not cold-disk bandwidth — a purely disk-bandwidth-contended
    box with a warm cache can still read ~1.0, so the
    uniform-shift-across-families adjudication in BENCH_NOISE.md remains
    the backstop for that residue."""
    path = os.path.join(sf_dir, "lineitem.parquet")
    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _pass in range(16):
            with open(path, "rb", buffering=0) as f:
                while f.read(4 * 1024 * 1024):
                    pass
        reps.append(time.perf_counter() - t0)
    return round(min(reps), 4)


def run_single(sf_dir: str) -> dict:
    """One fresh-process bench pass: min-of-2 reps per query in this JVM.
    Returns ``{"queries": {...}, "loadavg": [start, end],
    "ref_query_sec": [start, end], "ref_io_sec": [start, end]}`` — the
    load/reference pairs bracket the run so mid-run ambient drift is
    visible on both the CPU and the I/O axis."""
    from canvas_data_aws_spark.plans.registry import all_queries
    from canvas_data_aws_spark.session import get_spark

    load_start = os.getloadavg()[0]
    spark = get_spark(app_name="cda-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry] or list(registry)[:5]

    # warm the JVM + parquet footers once so timings measure the engine
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    ref_start = _ref_query_sec(spark)
    ref_io_start = _ref_io_sec(sf_dir)

    timings: dict[str, float] = {}
    to_time = [(name, registry[name].fn) for name in names]
    to_time += sorted(_prebuilt_ann_entries(spark, sf_dir).items())
    for name, fn in to_time:
        reps = []
        for _rep in range(2):  # min-of-2 in-process; min-of-2 processes above
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        # Drop any cached/checkpointed state the query left behind so later
        # queries aren't taxed (GC pressure, executor storage) by earlier
        # ones — each timing should measure that query alone.
        spark.catalog.clearCache()
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
        except Exception:
            pass  # private-API cleanup is best-effort
    ref_end = _ref_query_sec(spark)
    ref_io_end = _ref_io_sec(sf_dir)
    load_end = os.getloadavg()[0]
    spark.stop()
    return {
        "queries": timings,
        "loadavg": [round(load_start, 2), round(load_end, 2)],
        "ref_query_sec": [ref_start, ref_end],
        "ref_io_sec": [ref_io_start, ref_io_end],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)

    if os.environ.get("CDA_BENCH_SINGLE"):
        # child / legacy mode: one process, print its own timings JSON
        res = run_single(sf_dir)
        res["value"] = round(sum(res["queries"].values()), 3)
        print(json.dumps(res))
        return

    # min-of-2 fresh processes: each child is its own JVM
    import subprocess

    runs: list[dict] = []
    for i in range(2):
        env = dict(os.environ, CDA_BENCH_SINGLE="1")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"bench child run {i} failed rc={proc.returncode}")
        last = proc.stdout.strip().splitlines()[-1]
        runs.append(json.loads(last))
        print(f"run {i}: total={runs[-1]['value']}s", flush=True)

    timings = {
        name: round(min(r["queries"][name] for r in runs), 3)
        for name in runs[0]["queries"]
    }
    total = round(sum(timings.values()), 3)
    # machine-speed snapshot: the BEST reference sample across both JVMs is
    # the box's attainable speed this session; the per-run [start, end]
    # pairs (kept under runs[i].ref_query_sec) show mid-run drift
    ref_samples = [s for r in runs for s in r.get("ref_query_sec", [])]
    ref_io_samples = [s for r in runs for s in r.get("ref_io_sec", [])]
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "protocol": "min over 2 fresh processes x 2 reps",
        "ref_query_sec": min(ref_samples) if ref_samples else None,
        "ref_io_sec": min(ref_io_samples) if ref_io_samples else None,
        "loadavg": [r.get("loadavg") for r in runs],
        "runs": runs,
    }
    # Keep the last few snapshots in-file: per-query timings have a
    # ±0.3-0.7 s noise floor at sf0.1 (measured, BENCH_NOISE.md), so drift
    # questions need run-to-run history, not one overwritten snapshot.
    full_path = os.path.join(REPO, "BENCH_FULL.json")
    history = []
    try:
        with open(full_path) as f:
            prev = json.load(f)
        history = prev.get("history", [])
        if "value" in prev:
            history.insert(
                0,
                {
                    "value": prev["value"],
                    "queries": prev["queries"],
                    "sf": prev.get("sf"),
                    "ref_query_sec": prev.get("ref_query_sec"),
                    "ref_io_sec": prev.get("ref_io_sec"),
                },
            )
    except (OSError, ValueError):
        pass
    full["history"] = history[:4]
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(full))  # full detail for raw logs (NOT the last line)
    print(json.dumps(compact_result(timings, sf)))  # last line: fits the tail


if __name__ == "__main__":
    main()
