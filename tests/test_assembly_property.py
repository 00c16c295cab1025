"""Property test: pack_boundary_split equals a brute-force Python packer
(concatenate token counts in order, cut at capacity boundaries) over
randomized per-source document streams — the arithmetic (exclusive prefix
sum, span explode, fragment clipping) independent of fixture data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from canvas_data_aws_spark.operators.assembly import pack_boundary_split

#: (source 0-2, n_tokens 0-40) — zero-token docs exercise the blank filter
_docs = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),
    min_size=1,
    max_size=20,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from canvas_data_aws_spark.session import get_spark

        _spark = get_spark(
            app_name="cda-asm-prop", master="local[2]", shuffle_partitions=2
        )
    return _spark


def _brute(docs_by_source: dict[int, list[int]], cap: int):
    """Reference packer: walk each stream, cut at cap boundaries."""
    out: dict[tuple[int, int], dict] = {}
    for src, toks in docs_by_source.items():
        offset = 0
        for n in toks:
            st_, en = offset, offset + n
            offset = en
            s = st_ // cap
            while s * cap < en:
                lo, hi = s * cap, (s + 1) * cap
                cell = out.setdefault(
                    (src, s), {"n_docs": 0, "n_tokens": 0, "mid": False}
                )
                cell["n_docs"] += 1
                cell["n_tokens"] += min(en, hi) - max(st_, lo)
                cell["mid"] = cell["mid"] or st_ < lo
                s += 1
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_docs, cap=st.sampled_from([7, 16, 64]))
def test_boundary_split_equals_bruteforce(docs, cap):
    spark = _get_spark()
    # doc text = n one-char words => whitespace token count == n; the
    # operator orders by doc_id (the list index) within source
    rows = [
        (i, src, " ".join("w" for _ in range(n)))
        for i, (src, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source int, text string")
    got = {
        (r["source"], r["seq_id"]): (
            r["n_docs"],
            r["n_tokens"],
            r["starts_mid_doc"],
        )
        for r in pack_boundary_split(
            df, capacity=cap, group_col="source"
        ).collect()
    }
    by_source: dict[int, list[int]] = {}
    for src, n in docs:
        if n > 0:  # the operator filters blank docs before packing
            by_source.setdefault(src, []).append(n)
    want = {
        k: (v["n_docs"], v["n_tokens"], v["mid"])
        for k, v in _brute(by_source, cap).items()
    }
    assert got == want
