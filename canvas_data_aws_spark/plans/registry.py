"""Named query registry — the single source of truth behind __spark_entry__.py.

Every operator from SURVEY.md §2 registers here as a ``Query``:

- ``fn(spark, sf_dir) -> DataFrame``: the Spark-native implementation.
- ``oracle``: equivalent SQL that DuckDB runs over the same parquet tables
  (tables pre-registered as views). ``None`` => the op is not SQL-expressible
  (approx sketches, hash-dependent LSH, streaming state) and the driver
  records a weaker rows-only check.

Determinism rules (SURVEY.md §5/§7 hard parts):
- alias every computed column identically in Spark and SQL (the driver's
  compare sorts columns by NAME before hashing values);
- round floating aggregates (sum-order across partitions is not associative
  in IEEE754; rounding makes the hash stable);
- cast integer SUMs to BIGINT explicitly (DuckDB widens to HUGEINT);
- top-k/rank queries carry unique tie-breaker keys.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())
    # local_only: the query needs an input the external driver's fixture set
    # doesn't ship (e.g. the generated partsupp supplement), so it is
    # excluded from the driver-facing query_map()/oracle_map() and verified
    # by the local oracle gate instead (tests/test_queries_oracle.py, which
    # registers the supplemental views).
    local_only: bool = False
    # quality_test: REQUIRED for every oracle=None entry — the named test
    # ("tests/file.py::test_name") that pins the op's quality floor
    # (recall/error-bound/equivalence), since the driver's check for these
    # is rows-only. Enforced by tests/test_rows_only_ledger.py: a rows-only
    # entry without a resolvable reference fails the suite.
    quality_test: str | None = None


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    local_only: bool = False,
    quality_test: str | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            tags=tags,
            local_only=local_only,
            quality_test=quality_test,
        )
        return fn

    return deco


def _load_all_modules() -> None:
    # Import side-effect: each module registers its queries.
    from canvas_data_aws_spark.plans import (  # noqa: F401
        aggregates,
        assembly_q,
        corpus_q,
        curation_q,
        events_q,
        functions_extra_q,
        functions_q,
        ingest_q,
        joins_q,
        linkage_q,
        llm_q,
        misc_q,
        quality_q,
        relational,
        reshape_q,
        scale_q,
        sets_sorts,
        sketch_q,
        sql_surface_q,
        star_q,
        streaming_q,
        tpch_q,
        tpch_shipped_q,
        warehouse_q,
        windows_extra_q,
        windows_q,
    )


_LOADED = False


def all_queries() -> dict[str, Query]:
    global _LOADED
    if not _LOADED:
        _load_all_modules()
        _LOADED = True
    return QUERIES


def query_map() -> dict[str, QueryFn]:
    """Driver-facing map: excludes local_only entries (their inputs don't
    exist in the external driver's fixture set)."""
    return {name: q.fn for name, q in all_queries().items() if not q.local_only}


def oracle_map() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in all_queries().items()
        if q.oracle is not None and not q.local_only
    }
