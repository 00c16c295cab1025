"""corpus_attribute_store: the Dolma-style decoupling contract — all
taggers in ONE text scan with no shuffle, and the filter report computable
from attributes alone."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from canvas_data_aws_spark.plans.registry import all_queries


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_attribute_store_is_one_scan_no_shuffle(spark, sf_dir):
    import re

    df = all_queries()["corpus_attribute_store"].fn(spark, sf_dir)
    plan = _plan(df)
    # one scan NODE (the formatted plan names each node once in the tree
    # and once in the detail section — count detail headers)
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, f"attribute store must read text ONCE, got {scans}"
    assert "Exchange" not in plan, "row-local taggers must not shuffle"


def test_filter_report_consistent_with_attribute_flags(spark, sf_dir):
    import pyspark.sql.functions as F

    attrs = all_queries()["corpus_attribute_store"].fn(spark, sf_dir)
    report = {
        r["rule"]: (r["n_pass"], r["n_fail"])
        for r in all_queries()["corpus_filter_from_attributes"]
        .fn(spark, sf_dir)
        .collect()
    }
    n_docs = attrs.count()
    n_en = attrs.filter(F.col("pred_lang") == "en").count()
    assert report["r_lang"] == (n_en, n_docs - n_en)
    n_all = attrs.filter(
        (F.col("pred_lang") == "en")
        & F.col("n_chars").between(100, 20000)
        & (F.col("q_score") >= 0.5)
        & (F.col("n_tokens") >= 20)
    ).count()
    assert report["all"] == (n_all, n_docs - n_all)
    # every rule must actually discriminate on the fixture (the test bites)
    assert all(p > 0 and f > 0 for p, f in report.values()), report
