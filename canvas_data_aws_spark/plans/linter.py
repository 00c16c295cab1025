"""Scale linter: static checks over a DataFrame's physical plan.

The reference ships no equivalent — its Athena/Glue surface leaves plan
quality to the user. At 100 TB, the difference between a plan that works
and one that melts is a handful of recurring shapes: a cartesian product,
a window over one giant partition, a filter that never reached the scan,
a row-at-a-time Python UDF in the hot path, a broadcast of something
data-sized. Each is visible in the plan BEFORE running the job; this
module turns that reading into code.

Usage::

    from canvas_data_aws_spark.plans.linter import lint, assert_scale_safe

    findings = lint(df)             # [LintFinding(code, severity, detail)]
    assert_scale_safe(df)           # raises ScaleLintError on any 'error'
    assert_scale_safe(df, allow={"cartesian-product"})   # opt-out per code

Severities: ``error`` = will not survive a serious scale-up (unbounded
memory or O(n^2) work); ``warn`` = survives but leaves large wins on the
table; ``info`` = worth a look. The checks are string-structural over
``explain`` output, deliberately: the same text a human reads, so a
finding always points at something visible in ``df.explain()``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from canvas_data_aws_spark.plans.audit import explain_str

__all__ = ["LintFinding", "ScaleLintError", "lint", "assert_scale_safe", "DIMENSION_TABLES"]

# Spec-bounded dimension tables: cardinality fixed by the data model itself
# (TPC-H: region = 5 rows, nation = 25 rows at EVERY scale factor), so
# broadcasting their raw scans is safe by catalog knowledge even though the
# plan shows no structural bound. Extend deliberately — a "dimension" that
# grows with the data does not belong here.
DIMENSION_TABLES = frozenset({"region", "nation"})


@dataclass(frozen=True)
class LintFinding:
    code: str
    severity: str  # "error" | "warn" | "info"
    detail: str


class ScaleLintError(AssertionError):
    def __init__(self, findings: list[LintFinding]):
        self.findings = findings
        lines = "\n".join(f"  [{f.severity}] {f.code}: {f.detail}" for f in findings)
        super().__init__(f"plan failed scale lint:\n{lines}")


def _explain(df: DataFrame, mode: str) -> str:
    return explain_str(df, mode=mode)


@dataclass
class _Node:
    text: str
    indent: int
    parent: "_Node | None"


def _parse_tree(simple: str) -> list[_Node]:
    """Parse explain('simple') indentation into parent links. Spark draws
    the tree with ':', '+-', '-' prefixes; indentation depth = nesting."""
    nodes: list[_Node] = []
    stack: list[_Node] = []
    for raw in simple.splitlines():
        if not raw.strip() or raw.startswith("=="):
            continue
        m = re.match(r"^([\s:+\-*()0-9]*)(.*)$", raw)
        prefix, text = m.group(1), m.group(2)
        if not text:
            continue
        indent = len(prefix)
        while stack and stack[-1].indent >= indent:
            stack.pop()
        node = _Node(text=text, indent=indent, parent=stack[-1] if stack else None)
        nodes.append(node)
        stack.append(node)
    return nodes


def _is_selective_filter(node_text: str) -> bool:
    """True when a ``Filter`` node carries a predicate beyond the
    ``isnotnull(...)`` guards Spark inserts above every equi-join input.
    Null guards drop no meaningful volume, so a build side whose only
    Filter is null-guards is NOT bounded by it."""
    cond = re.sub(r"isnotnull", "", node_text[len("Filter") :])
    return bool(
        re.search(r"[<>=]|\bIN\b|LIKE|StartsWith|EndsWith|Contains|isnull", cond)
    )


# Logical-plan node prefixes that structurally bound a subtree's row count
# (aggregation collapses to its groups, limits cap, literal relations are
# inline data). A Filter counts only when selective (see
# ``_is_selective_filter``); a Relation counts only when it is a declared
# dimension (matched by its signature key column, since the logical
# ``Relation`` line carries columns, not the file path).
_BOUNDED_LOGICAL_PREFIXES = (
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Limit",
    "LocalRelation",
    "OneRowRelation",
    "Distinct",
    "Deduplicate",
    "Intersect",
    "Range ",
)

_DIMENSION_SIGNATURE_COLS = {"nation": "n_nationkey", "region": "r_regionkey"}


def _lint_broadcast_hints(df: DataFrame) -> list[LintFinding]:
    try:
        logical = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return []
    lnodes = _parse_tree(logical)
    dim_sig = "|".join(
        _DIMENSION_SIGNATURE_COLS[t]
        for t in sorted(DIMENSION_TABLES)
        if t in _DIMENSION_SIGNATURE_COLS
    )
    for i, n in enumerate(lnodes):
        if not n.text.startswith("Join ") or "strategy=broadcast" not in n.text:
            continue
        children = [
            (j, m) for j, m in enumerate(lnodes[i + 1 :], start=i + 1) if m.parent is n
        ]
        hinted: list[tuple[int, _Node]] = []
        if "leftHint=(strategy=broadcast" in n.text and children:
            hinted.append(children[0])
        if "rightHint=(strategy=broadcast" in n.text and children:
            hinted.append(children[-1])
        for j, child in hinted:
            texts = [child.text]
            for m in lnodes[j + 1 :]:
                if m.indent <= child.indent:
                    break
                texts.append(m.text)
            bounded = any(
                t.startswith(_BOUNDED_LOGICAL_PREFIXES)
                or (t.startswith("Filter") and _is_selective_filter(t))
                or (
                    dim_sig
                    and t.startswith("Relation")
                    and re.search(r"Relation \[(?:%s)[,#\]]" % dim_sig, t)
                )
                for t in texts
            )
            if not bounded:
                return [
                    LintFinding(
                        "unbounded-broadcast",
                        "warn",
                        "explicit broadcast hint on a side with no structural "
                        "bound (no aggregate/limit/selective-filter/literal and "
                        "not a declared dimension): a hard-coded hint never "
                        "re-plans at scale — prove the bound or drop the hint "
                        "and let AQE decide",
                    )
                ]
    return []


def lint(df: DataFrame) -> list[LintFinding]:
    simple = _explain(df, "simple")
    formatted = _explain(df, "formatted")
    findings: list[LintFinding] = []
    nodes = _parse_tree(simple)

    # 1. Cartesian / unbounded nested-loop joins: O(|L| * |R|) compares.
    if "CartesianProduct" in simple:
        findings.append(
            LintFinding(
                "cartesian-product",
                "error",
                "CartesianProduct in plan: no equi-key reached the join — at "
                "scale this is quadratic compare work (add an equi-prefix / "
                "bucket key, or accept it only for provably tiny sides)",
            )
        )
    # BroadcastNestedLoopJoin severity depends on what's being broadcast:
    #   - a global aggregate (keys=[]) is a handful of scalar rows — the
    #     crossJoin(broadcast(totals)) pattern; quiet.
    #   - a filtered / grouped / literal side is bounded by intent; warn so
    #     the intent stays visible.
    #   - a raw table scan is bounded by nothing; error.
    for i, n in enumerate(nodes):
        if not n.text.startswith("BroadcastNestedLoopJoin"):
            continue
        # Inspect only the BROADCAST child's subtree (the other child is the
        # streamed side and may legitimately contain anything). The build
        # side is the join's DIRECT child on the Build{Left,Right} side —
        # scanning the whole join subtree for the first BroadcastExchange
        # would wrongly pick one nested inside the streamed side.
        children = [
            (j, m)
            for j, m in enumerate(nodes[i + 1 :], start=i + 1)
            if m.parent is n
        ]
        build_idx = -1 if "BuildRight" in n.text else 0
        if children:
            bj, bnode = children[build_idx] if len(children) > 1 else children[0]
            btexts = [bnode.text]
            for m in nodes[bj + 1 :]:
                if m.indent <= bnode.indent:
                    break
                btexts.append(m.text)
        else:
            btexts = [m.text for m in nodes[i + 1 :]]
        # operator checks match node PREFIXES — scan detail lines contain
        # the substring "Filter" (PushedFilters:/DataFilters:) spuriously
        if any(
            re.match(r"\w*(Hash|Sort)Aggregate\(keys=\[\]", t)
            or t.startswith("LocalTableScan")
            for t in btexts
        ):
            continue
        if any(
            t.startswith(("Filter", "HashAggregate", "SortAggregate", "ObjectHashAggregate"))
            or "Limit" in t.split(" ")[0]
            or t.startswith("Deduplicate")
            for t in btexts
        ):
            findings.append(
                LintFinding(
                    "nested-loop-join-bounded",
                    "warn",
                    "BroadcastNestedLoopJoin over a filtered/aggregated side: "
                    "correct only while that side stays broadcast-small — "
                    "assert its bound (probe batch, top-k, category table) in "
                    "a test",
                )
            )
        else:
            findings.append(
                LintFinding(
                    "nested-loop-join",
                    "error",
                    "BroadcastNestedLoopJoin over a raw relation: no equi-key "
                    "and nothing bounds the broadcast side — quadratic compare "
                    "work and an unbounded broadcast at scale",
                )
            )
        break

    # 2. Single-partition exchange feeding a Window/Sort: the whole input
    #    lands on ONE task. (A SinglePartition under a final global agg of
    #    already-combined partials is fine and not flagged.)
    for n in nodes:
        if n.text.startswith("Exchange SinglePartition") and n.parent is not None:
            p = n.parent
            while p is not None and p.text.startswith(("AdaptiveSparkPlan", "ResultQueryStage", "ShuffleQueryStage", "AQEShuffleRead")):
                p = p.parent
            if p is not None and p.text.startswith(("Window", "Sort", "RunningWindowFunction")):
                findings.append(
                    LintFinding(
                        "single-partition-window",
                        "error",
                        f"'{p.text[:60]}' consumes an Exchange SinglePartition: "
                        "every row flows through one task. For data-sized inputs "
                        "partition the window or switch to percentile cutpoints; "
                        "allowlist (with justification) only when the input is "
                        "group-reduced to a BOUNDED domain (e.g. a decile table)",
                    )
                )
                break

    # 3. Row-at-a-time Python UDF (pickled, per-row) — the 10-100x-slower
    #    path vs Arrow. ArrowEvalPython / mapInPandas are fine.
    if "BatchEvalPython" in simple:
        findings.append(
            LintFinding(
                "python-row-udf",
                "warn",
                "BatchEvalPython in plan: row-at-a-time pickled Python UDF — "
                "rewrite as built-in functions or a pandas_udf (Arrow batches)",
            )
        )

    # 4. Filter sitting directly on a parquet scan that pushed nothing.
    #    (Residual non-pushable predicates above a scan WITH pushed filters
    #    are normal and not flagged.)
    for scan_block in re.finditer(
        r"Scan parquet[^\n]*\n(?:[^\n]*\n)*?[^\n]*PushedFilters: \[\]", formatted
    ):
        block = scan_block.group(0)
        if "Filter" in simple and "PartitionFilters" not in block.split("PushedFilters")[0]:
            findings.append(
                LintFinding(
                    "no-pushed-filters",
                    "info",
                    "a parquet scan pushed no filters while the plan filters rows "
                    "— check the predicate is pushable (no UDF/complex expr over "
                    "the scan column) so row groups can be skipped",
                )
            )
            break

    # 5. Checkpoint/RDD scans carry no size stats: compile-time join
    #    strategy may misfire (the 8 GiB broadcast-build class). Flag when
    #    such a scan feeds a join with no explicit strategy hint visible.
    if "Scan ExistingRDD" in simple and re.search(r"Join|HashJoin", simple):
        findings.append(
            LintFinding(
                "rdd-scan-no-stats",
                "info",
                "a checkpointed/RDD scan feeds a join: no size statistics exist "
                "for it, so pin the build side (hint('shuffle_hash') / broadcast "
                "of the provably-small side) rather than trusting the estimate",
            )
        )

    # 6. EXPLICIT broadcast hint (F.broadcast / hint("broadcast")) whose
    #    side is not structurally bounded: nothing but the data bounds what
    #    the driver must hold and every executor must receive. Provenance
    #    matters — AQE's own size-based broadcasts re-plan themselves at
    #    real scale, but a hard-coded hint does NOT, so only hinted joins
    #    are checked. Hints survive in the OPTIMIZED LOGICAL plan
    #    (``leftHint=/rightHint=(strategy=broadcast)`` on the Join node);
    #    the hinted side is bounded when its subtree aggregates, limits,
    #    dedups, selectively filters (null-guards alone do not count — every
    #    equi-join inserts isnotnull filters), is a literal relation, or
    #    scans a declared spec-bounded dimension table.
    findings.extend(_lint_broadcast_hints(df))

    # 7. Shuffle count: not wrong, but worth knowing.
    n_shuffles = simple.count("Exchange hashpartitioning") + simple.count(
        "Exchange rangepartitioning"
    )
    if n_shuffles >= 6:
        findings.append(
            LintFinding(
                "many-shuffles",
                "info",
                f"{n_shuffles} exchanges in one plan: check for a reusable "
                "partitioning (same key family) or a pre-bucketed layout",
            )
        )
    return findings


def assert_scale_safe(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()) -> list[LintFinding]:
    """Raise :class:`ScaleLintError` if the plan has any ``error``-severity
    finding not in ``allow``; return all findings otherwise (so callers can
    log warns/infos)."""
    findings = [f for f in lint(df) if f.code not in allow]
    errors = [f for f in findings if f.severity == "error"]
    if errors:
        raise ScaleLintError(errors)
    return findings
