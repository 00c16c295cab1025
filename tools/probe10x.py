"""10x scale probe: disjoint-copy replicas of sf0.1 tables, time queries
1x vs 10x (warm, min of 2, noop sink) — the method behind SCALE.md's
probe tables.

Usage: python tools/probe10x.py <query_name> [...]

Probe each query in a FRESH process: back-to-back probes in one JVM
contaminate each other through accumulated localCheckpoint blocks and
cached index state (measured 5x inflation; see SCALE.md). Replicas shift
every join key (customer/supplier included — unshifted dims silently
drop 90% of joined rows) and suffix document words per replica so
shingle spaces stay disjoint."""
import os
import shutil
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import pyspark.sql.functions as F

from canvas_data_aws_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
# Replica factor: 10 by default; CDA_PROBE_FACTOR=100 gives a 100x probe
# (sf0.1 is ~17 MB on disk, so even 100x fits /tmp comfortably). Each
# factor builds into its own directory and reuses it across invocations.
N = int(os.environ.get("CDA_PROBE_FACTOR", "10"))
DST = f"/tmp/cda{N}x"

spark = get_spark()


def _replicate(base, keys, doc_suffix=False):
    """N disjoint copies via one explode over a replica-id sequence — a
    single scan with an O(1)-size plan, vs the old N-branch union whose
    plan analysis alone dominated build time past ~100 branches (the
    change that makes 300x/1000x replica builds feasible). Semantics are
    identical: every join key shifts by rid*10M; document words get a
    per-replica suffix so shingle/fingerprint spaces stay disjoint
    (no cross-replica dup pairs)."""
    rep = base.withColumn("_rid", F.explode(F.sequence(F.lit(0), F.lit(N - 1))))
    for k in keys:
        rep = rep.withColumn(k, F.col(k) + F.col("_rid").cast("bigint") * 10_000_000)
    if doc_suffix:
        rep = rep.withColumn(
            "text",
            F.regexp_replace(
                "text", r"(\S+)", F.concat(F.lit("$1x"), F.col("_rid").cast("string"))
            ),
        )
    return rep.drop("_rid")


def build():
    os.makedirs(DST, exist_ok=True)
    # CDA_PROBE_TABLES limits the build to the tables the probed queries
    # actually read (e.g. "documents" for the dedup family): a 300x
    # lineitem nobody scans is pure build cost. Unset = build everything.
    only = os.environ.get("CDA_PROBE_TABLES")
    wanted = {t.strip() for t in only.split(",")} if only else None

    def skip(t):
        return wanted is not None and t not in wanted

    # small dims: straight copy
    for t in ["region", "nation", "part"]:
        if not skip(t) and not os.path.exists(f"{DST}/{t}.parquet"):
            shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    shifts = {
        "events": ["event_id", "user_id"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_suppkey"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
    }
    for t, keys in shifts.items():
        out = f"{DST}/{t}.parquet"
        if skip(t) or os.path.exists(out):
            continue
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        _replicate(base, keys, doc_suffix=(t == "documents")).write.mode(
            "overwrite"
        ).parquet(out)
        print(f"built {t}", flush=True)
    # partsupp: replicate the 1x generated bridge with ps_suppkey shifted
    # per replica (matching the supplier shift) — N x rows, keys landing in
    # each replica's supplier block. Written INTO the replica dir:
    # ensure_partsupp prefers a shipped partsupp.parquet over generation
    # (whose stride needs a dense supplier range the blocks don't have).
    ps_out = f"{DST}/partsupp.parquet"
    if not skip("partsupp") and not os.path.exists(ps_out):
        from canvas_data_aws_spark.sources.tpch_supplement import ensure_partsupp

        base = spark.read.parquet(ensure_partsupp(spark, SRC))
        _replicate(base, ["ps_suppkey"]).write.mode("overwrite").parquet(ps_out)
        print("built partsupp", flush=True)


def run(qname, sf_dir):
    from canvas_data_aws_spark.plans.registry import all_queries

    fn = all_queries()[qname].fn
    # 1x gets TWO warm-ups: iterative plans (label propagation, k-core) JIT
    # across several jobs, and a cold-JIT-inflated t1 overstates 1x cost and
    # understates growth (the r9 graph_label_propagation row recorded
    # t1=12.67 s vs ~4 s warmed). The Nx side keeps one warm-up — a second
    # would double a 100x probe's wall for a baseline nobody reads.
    warmups = 2 if sf_dir == SRC else 1
    for _ in range(warmups):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_ledger.json")


def record(qname, t1, tn):
    """Append/update the machine-readable probe ledger keyed (query, factor).
    A hand-written `reading` field on an existing entry survives re-probes —
    only the timings refresh. SCALE.md's generated probe tables are rendered
    from this file by tools/render_probes.py (no hand-transcribed numbers)."""
    import json

    entries = []
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            entries = json.load(f)
    key = (qname, N)
    kept = [e for e in entries if (e["query"], e["factor"]) != key]
    prev = next((e for e in entries if (e["query"], e["factor"]) == key), {})
    kept.append(
        {
            "query": qname,
            "factor": N,
            "t1_sec": round(t1, 2),
            "tn_sec": round(tn, 2),
            "growth": round(tn / t1, 1),
            "reading": prev.get("reading", ""),
        }
    )
    kept.sort(key=lambda e: (e["factor"], e["query"]))
    tmp = LEDGER + ".tmp"
    with open(tmp, "w") as f:
        json.dump(kept, f, indent=1)
    os.replace(tmp, LEDGER)


if __name__ == "__main__":
    build()
    names = sys.argv[1:]
    for q in names:
        t1 = run(q, SRC)
        t10 = run(q, DST)
        record(q, t1, t10)
        print(f"PROBE {q}: 1x={t1:.2f}s {N}x={t10:.2f}s growth={t10 / t1:.1f}x", flush=True)
