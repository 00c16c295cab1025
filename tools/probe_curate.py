"""End-to-end scale probe for the composed ``curate`` CLI verb
(round-9 verdict item 3): time the WHOLE pipeline — quality filter,
exact dedup, MinHash collapse, decontaminate, pack, epoch shuffle,
shard-partitioned write — at 1x (sf0.1) vs CDA_PROBE_FACTOR x, in this
one fresh process, and record a ``curate_cli`` row in the probe ledger.

Unlike the registry probes this covers the one data-sized WRITE and the
inter-stage observe plumbing; the funnel counts at both scales are
printed so the replica corpus can be sanity-checked (disjoint replicas
=> every stage count should scale ~Nx).

Usage: CDA_PROBE_FACTOR=100 python tools/probe_curate.py

With CDA_PROBE_CLASSIFIER_KEEP_FRAC set (e.g. 0.6), the run enables the
model-based filter stage (--classifier-keep-frac) and records a separate
``curate_cli_classifier`` ledger row — the composed-pipeline scale row
covering the newest stage (round-12 verdict item 7).
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import probe10x  # noqa: E402  (shares replica dirs, spark, and the ledger)
from canvas_data_aws_spark.pipelines.curate import curate  # noqa: E402


def run(sf_dir: str):
    """min-of-2 wall time for a full curate run into a throwaway dir.

    min_stop_ratio is DISABLED at both scales: the replica builder suffixes
    every word (wordxN) to keep shingle spaces disjoint, which zeroes the
    stopword-ratio feature — with the default 0.01 floor the 100x corpus
    curates to an EMPTY pipeline (n_quality=0, measured: 15.9 s of nothing)
    and the probe times the wrong thing. The other quality rules
    (length/word-len/punct) still apply identically at 1x and Nx.
    """
    keep = os.environ.get("CDA_PROBE_CLASSIFIER_KEEP_FRAC")
    kwargs = {"min_stop_ratio": 0.0}
    if keep:
        kwargs["classifier_keep_frac"] = float(keep)
    best, funnel = None, None
    for _ in range(2):
        out = tempfile.mkdtemp(prefix="cda_curate_probe_")
        t0 = time.time()
        f = curate(probe10x.spark, sf_dir, out, **kwargs)
        dt = time.time() - t0
        shutil.rmtree(out, ignore_errors=True)
        if best is None or dt < best:
            best, funnel = dt, f
    return best, funnel


if __name__ == "__main__":
    ROW = (
        "curate_cli_classifier"
        if os.environ.get("CDA_PROBE_CLASSIFIER_KEEP_FRAC")
        else "curate_cli"
    )
    probe10x.build()
    t1, f1 = run(probe10x.SRC)
    tn, fn = run(probe10x.DST)
    probe10x.record(ROW, t1, tn)
    print(
        f"PROBE {ROW}: 1x={t1:.2f}s {probe10x.N}x={tn:.2f}s "
        f"growth={tn / t1:.1f}x",
        flush=True,
    )
    print(f"funnel 1x: {json.dumps(f1.as_dict())}")
    print(f"funnel {probe10x.N}x: {json.dumps(fn.as_dict())}")
