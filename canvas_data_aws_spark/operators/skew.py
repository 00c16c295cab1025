"""Skew mitigation: salted joins for hot keys.

First line of defense is AQE skew-join splitting (on by default in
session.py) — it needs no code and handles skewed *partitions*. Salting is
the second line, for the pathological case AQE can't fix: a single join KEY
so hot its matches alone exceed an executor (the classic null-key or
power-user problem at 100 TB).

Mechanics: explode the small/dim side S ways (one copy per salt), scatter
the fact side uniformly across the S salts, join on (key, salt). Shuffle
size grows by S on the dim side only; the hot key's rows spread across S
tasks instead of one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "__salt"


def salt_fact(df: DataFrame, num_salts: int, id_cols: list[str] | None = None) -> DataFrame:
    """Scatter side: deterministic salt from a stable row identity (hash of
    ``id_cols``), uniform across [0, num_salts)."""
    ident = [F.col(c) for c in (id_cols or df.columns)]
    return df.withColumn(SALT_COL, F.pmod(F.hash(*ident), F.lit(num_salts)))


def salt_dim(df: DataFrame, num_salts: int) -> DataFrame:
    """Replicate side: one copy of every row per salt value."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias(SALT_COL)
    return df.select("*", salts)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
    fact_id_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join resilient to hot keys: join on (on..., salt) after salting
    both sides. Result equals ``fact.join(dim, on, how)`` for inner/left
    joins (each fact row meets exactly one copy of each matching dim row).

    Other join types are rejected: right/full would emit ``num_salts``
    copies of every unmatched dim row, and semi/anti would flip membership
    per-salt — silently wrong rather than slower, so we raise.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "replicating the dim side makes right/full/semi/anti joins incorrect"
        )
    f = salt_fact(fact, num_salts, fact_id_cols)
    d = salt_dim(dim, num_salts)
    return f.join(d, on + [SALT_COL], how).drop(SALT_COL)
