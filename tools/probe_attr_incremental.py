"""Day-2-shaped probe for the incremental attribute store.

The registry entry (corpus_attribute_store_incremental) tags base+delta
in one plan so the exact oracle can check it — its probe therefore costs
a full tagger pass by construction. This probe measures the claim the
operator actually makes: with the store PERSISTED, a day-2 feed that
re-delivers everything plus ~10% new docs costs one key anti-join plus a
delta-sized tagger scan — vs re-tagging the whole corpus.

Runs at the 100x documents replica (built by probe10x), times
(a) incremental update from the persisted store and (b) full rebuild,
and records the pair as one ledger row: t1 = incremental, tn = full
rebuild, growth = rebuild/incremental (the factor the decoupling saves).

Usage: python tools/probe_attr_incremental.py   (fresh process)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyspark.sql.functions as F

from canvas_data_aws_spark.session import get_spark

DOCS = "/tmp/cda100x/documents.parquet"
WORK = "/tmp/cda_attr_inc100x"


def timed(label, fn):
    t0 = time.time()
    fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return dt


if __name__ == "__main__":
    import probe10x  # record(): same ledger, factor stamped from its N

    probe10x.N = 100
    spark = get_spark()
    from canvas_data_aws_spark.operators.text import document_attributes

    docs = spark.read.parquet(DOCS).select("doc_id", "lang", "source", "text")
    store_path = os.path.join(WORK, "store")
    out_inc = os.path.join(WORK, "delta_out")
    out_full = os.path.join(WORK, "full_out")

    # day-1: persist the store over the base slice (untimed setup)
    base = docs.filter(F.col("doc_id") % 10 != 0)
    document_attributes(base).write.mode("overwrite").parquet(store_path)

    def incremental():
        store_keys = spark.read.parquet(store_path).select("doc_id")
        delta = docs.join(store_keys, "doc_id", "left_anti")
        document_attributes(delta).write.mode("overwrite").parquet(out_inc)

    def full_rebuild():
        document_attributes(docs).write.mode("overwrite").parquet(out_full)

    # warm once each (JVM/footers), then min-of-2 like every probe
    incremental()
    full_rebuild()
    t_inc = min(timed("incremental", incremental) for _ in range(2))
    t_full = min(timed("full_rebuild", full_rebuild) for _ in range(2))
    probe10x.record("attr_store_incremental_delta", t_inc, t_full)
    print(
        f"PROBE attr_store_incremental_delta: delta={t_inc:.2f}s "
        f"rebuild={t_full:.2f}s saving={t_full / t_inc:.1f}x",
        flush=True,
    )
