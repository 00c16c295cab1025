"""Similarity search over embedding columns (array<float>).

Two paths, as a production pipeline would stage them:

- ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set
  against the (huge) corpus; one scan, no shuffle until the final top-k.
  The per-pair dot product is a JVM ``zip_with``/``aggregate`` — no Python.
- ``ivf_index`` / ``ivf_query`` — the scale path: KMeans coarse quantizer
  (IVF); corpus vectors are bucketed by nearest centroid ONCE at index-build
  time (``ivf_index`` — a write-time partitioning at 100 TB, both outputs
  are plain DataFrames persistable as table columns), then every
  ``ivf_query`` probes only the ``nprobe`` nearest buckets with zero driver
  round-trips, cutting scanned vectors by ~n_clusters/nprobe.
- ``lsh_index`` / ``lsh_query`` — the other scale path:
  signed-random-projection LSH (Charikar hyperplane hashing); ``lsh_index``
  computes ``n_tables`` signature ints per corpus vector once (write-time
  columns at 100 TB), ``lsh_query`` touches only corpus rows sharing at
  least one table signature — again zero driver actions on the query path.

``ivf_topk`` / ``lsh_topk`` remain as one-shot conveniences (index + query
fused) for small interactive corpora; production callers persist the index.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    queries is broadcast (query sets are small by construction); the corpus
    is scanned once with the dot product evaluated in codegen; the final
    per-query top-k is a window over (query_id) — k rows per query survive
    the shuffle (rank pushdown keeps the exchange tiny).
    Ties broken by corpus id ascending for determinism.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qvec"))
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("__cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        F.round(cosine(F.col("__cvec"), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def cosine_range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact radius (threshold) search: every corpus vector with
    cosine >= threshold per query — the retrieval primitive under
    contamination screens and RAG recall sets, where "how many neighbors"
    is unknown a priori (top-k's dual).

    Same shape as :func:`cosine_topk_bruteforce` minus the ranking window:
    queries broadcast, one corpus scan, the dot product in codegen, and the
    threshold applied as a row-local filter — so the plan has ZERO
    exchanges; output size is data-dependent but each partition filters
    independently. The predicate tests the ROUNDED similarity so the
    decision boundary is reproducible across engines.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qvec"))
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("__cvec"))
    return (
        c.crossJoin(F.broadcast(q))
        .select(
            query_id,
            corpus_id,
            F.round(cosine(F.col("__cvec"), F.col("__qvec")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


#: Block size above which the per-block cosine kernel switches from one
#: full m x m GEMM to a row-tiled GEMM (the round-9 100x probe caught
#: corpus_semdedup stalling on 34 GB per-block matrices). Tiling computes
#: the same dot products with peak memory ~EMBED_BLOCK_TILE_BYTES; blocks
#: at or under the threshold keep the original single-GEMM path so
#: contract-scale outputs are byte-identical. Module-level so tests can
#: drive the tiled path on small fixtures.
EMBED_BLOCK_TILE_ABOVE = 8192
EMBED_BLOCK_TILE_BYTES = 512 << 20


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    With ``block_col`` only same-block pairs are compared — at scale the
    block is an LSH bucket or IVF cell id, bounding each group to one
    executor; without it this is an honest all-pairs (small corpora only).

    Implementation: ``applyInPandas`` per block computing the block's cosine
    matrix as one normalized GEMM — measured ~10x faster than a pair-join
    with per-pair interpreted array arithmetic, and the per-block matrix is
    exactly the unit of work a 100 TB run shards across executors.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    # captured at call time so the values travel in the pickled closure —
    # UDF worker processes re-import the module, so reading the globals
    # there would ignore driver-side overrides (tests patch these)
    tile_above, tile_bytes = EMBED_BLOCK_TILE_ABOVE, EMBED_BLOCK_TILE_BYTES

    def _block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norms == 0, 1.0, norms)
        m = len(ids)
        if m <= tile_above:
            sims = unit @ unit.T
            iu, ju = np.triu_indices(m, k=1)
            mask = sims[iu, ju] >= threshold
            ia, ib = ids[iu[mask]], ids[ju[mask]]
            sim_vals = sims[iu, ju][mask]
        else:
            tile = max(1, tile_bytes // (8 * m))
            parts_a, parts_b, parts_s = [], [], []
            for s in range(0, m, tile):
                sims_t = unit[s : s + tile] @ unit.T  # (tile, m)
                rows, cols = np.nonzero(sims_t >= threshold)
                gi = rows + s
                keep = gi < cols  # strict upper triangle in global indices
                parts_a.append(ids[gi[keep]])
                parts_b.append(ids[cols[keep]])
                parts_s.append(sims_t[rows[keep], cols[keep]])
            ia = np.concatenate(parts_a) if parts_a else np.array([], dtype=ids.dtype)
            ib = np.concatenate(parts_b) if parts_b else np.array([], dtype=ids.dtype)
            sim_vals = (
                np.concatenate(parts_s) if parts_s else np.array([], dtype="float64")
            )
        swap = ia > ib
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        return pd.DataFrame(
            {"id_a": ia2, "id_b": ib2, "cos_sim": np.round(sim_vals, 6)}
        )

    grouped = df.groupBy(block_col) if block_col else df.groupBy(F.lit(1).alias("__all"))
    return grouped.applyInPandas(_block_pairs, out_schema)


def multiprobe_cells(
    df: DataFrame,
    ids: list[int],
    cents: list[list[float]],
    m: int = 2,
    vec_col: str = "__v",
) -> DataFrame:
    """Explode each vector into its ``m`` nearest k-means cells — the
    multi-probe assignment that turns cell blocking into a usable near-dup
    candidate generator: single assignment loses every cross-cell pair
    (measured recall 0.34 at cos>=0.3 on the fixture), top-2 recovers 0.77
    at half the all-pairs work, and with adaptive k (cells ~1000 vectors)
    per-pair work stays m²·1000·n — LINEAR in corpus size.

    Adds a ``cell`` int column, one output row per (vector, probed cell).
    Arrow-batched argsort against the broadcast (k x dim) centroid matrix,
    row-tiled so the (rows, k, dim) distance intermediate stays ~100 MB at
    any adaptive k. Ties break to the lower cell id (np.argsort is stable
    and ``ids`` ascend), matching the single-assignment convention.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (np.array(cents, dtype=np.float64), np.array(ids))
    )
    m_eff = min(m, len(ids))

    @F.pandas_udf(ArrayType(IntegerType()))
    def _topm(vs: pd.Series) -> pd.Series:
        cent_mat, idl = bc.value
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        tile = max(1, (100 << 20) // max(1, cent_mat.shape[0] * cent_mat.shape[1] * 8))
        picks = np.empty((len(mat), m_eff), dtype=np.int64)
        for s in range(0, len(mat), tile):
            d = ((mat[s : s + tile, None, :] - cent_mat[None, :, :]) ** 2).sum(axis=2)
            picks[s : s + tile] = np.argsort(d, axis=1, kind="stable")[:, :m_eff]
        return pd.Series([[int(idl[j]) for j in row] for row in picks])

    return df.withColumn("cell", F.explode(_topm(F.col(vec_col))))


#: Quantizer fit-sample bound: the k-means only ever sees this many vectors.
_IVF_FIT_SAMPLE = 4096


def _spherical_kmeans(mat, k: int, seed: int, iters: int = 5):
    """Seeded Lloyd iterations on unit vectors (cosine geometry). Pure
    NumPy on an already-bounded sample — deterministic for a given seed."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / np.where(norms == 0, 1.0, norms)
    rng = np.random.RandomState(seed)
    cents = unit[rng.choice(len(unit), size=min(k, len(unit)), replace=False)]
    for _ in range(iters):
        sims = unit @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


@dataclass(frozen=True)
class IvfIndex:
    """IVF coarse-quantizer index: two plain DataFrames, both persistable.

    ``centroids`` is (cell int, centroid array<double>) — tiny, broadcast at
    query time. ``assigned`` is the corpus with a ``cell`` column — at
    100 TB this is written once as a partition/cluster column of the
    embedding table, so ``ivf_query`` reads only the probed cells.
    """

    centroids: DataFrame
    assigned: DataFrame
    corpus_id: str
    vec_col: str


def ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> IvfIndex:
    """Build the IVF index (ONCE — write-time at scale).

    Coarse quantizer: seeded spherical k-means fit on a bounded driver
    sample (cells need rough locality, not convergence — and cosine
    queries want direction clusters, so vectors are unit-normalized).
    The fit input is capped at _IVF_FIT_SAMPLE vectors regardless of
    corpus size: at 100 TB the quantizer is built from exactly this kind
    of sample, never from a full pass. This bounded ``toPandas`` is the
    index BUILD's one driver materialization; the query path
    (``ivf_query``) performs no driver actions at all.
    """
    from pyspark.sql.types import IntegerType

    sample = (
        corpus.select(F.col(vec_col).alias("__arr"))
        .orderBy(F.col(corpus_id))
        .limit(_IVF_FIT_SAMPLE)
        .toPandas()["__arr"]
    )
    mat = np.array([np.asarray(v, dtype=np.float64) for v in sample])
    cents = _spherical_kmeans(mat, n_clusters, seed=seed, iters=5)

    # cell assignment: one argmax-GEMM per Arrow batch (vectorized); the
    # equivalent per-row HOF argmax over n_clusters centroids runs
    # interpreted in Catalyst
    bc = corpus.sparkSession.sparkContext.broadcast(cents)

    @F.pandas_udf(IntegerType())
    def _nearest_cell(vecs: pd.Series) -> pd.Series:
        c = bc.value  # (k, dim), unit rows
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        unit = m / np.where(norms == 0, 1.0, norms)
        return pd.Series(np.argmax(unit @ c.T, axis=1).astype("int32"))

    assigned = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("__arr")
    ).withColumn("cell", _nearest_cell(F.col("__arr")))

    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    # cell pinned to int: it must match BOTH the assignment column's type
    # and the type a partitioned write's directory values read back as —
    # any cast on the join key defeats dynamic partition pruning.
    cent_df = corpus.sparkSession.createDataFrame(
        centroids, ["cell", "centroid"]
    ).withColumn("cell", F.col("cell").cast("int"))
    return IvfIndex(cent_df, assigned, corpus_id, vec_col)


def ivf_upsert(
    index: IvfIndex,
    new_vectors: DataFrame,
) -> IvfIndex:
    """Incrementally add vectors to a prebuilt :class:`IvfIndex` WITHOUT
    reclustering — the daily-ingest maintenance path. New vectors are
    assigned to the EXISTING centroids (the same row-local Arrow argmax-GEMM
    the builder uses) and unioned into ``assigned``; the coarse quantizer is
    deliberately frozen, because re-fitting would reshuffle every stored
    vector's cell (a full index rebuild) for marginal recall. At 100 TB the
    union is an append of new cell-partition files — existing partitions are
    untouched, and ``ivf_query``'s partition pruning keeps working.

    Exactness contract (tested): because assignment is a pure row-local
    function of the frozen centroids, ``ivf_upsert(ivf_index(A), B)`` equals
    ``ivf_index(A ∪ B)`` whenever both fits see the same sample — queries
    return identical results.
    """
    from pyspark.sql.types import IntegerType

    # Guard id-disjointness: a re-ingested id would leave TWO rows for the
    # same vector in `assigned` (possibly in different cells if the vector
    # changed), so ivf_query would return duplicate ids. One bounded
    # semi-join probe, same contract as search.bm25_merge.
    dup = (
        new_vectors.select(F.col(index.corpus_id))
        .join(index.assigned.select(index.corpus_id), index.corpus_id, "left_semi")
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "ivf_upsert: new_vectors contains ids already present in the "
            "index; delete-then-upsert or dedup upstream (blind union "
            "duplicates query results)"
        )
    # ... and INTERNAL duplicates within the batch: two rows sharing an id
    # pass the disjointness probe yet still leave two `assigned` rows (in
    # different cells if the payload differs), so ivf_query would return
    # duplicate ids. One bounded aggregate, mirror of bm25_merge's guard.
    internal = (
        new_vectors.groupBy(index.corpus_id)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .limit(1)
        .count()
    )
    if internal:
        raise ValueError(
            "ivf_upsert: new_vectors contains duplicate ids within the "
            "batch; dedup upstream (duplicates surface twice from ivf_query)"
        )

    cents_rows = index.centroids.orderBy("cell").collect()  # k rows: bounded
    cents = np.array([np.asarray(r["centroid"], dtype=np.float64) for r in cents_rows])
    bc = new_vectors.sparkSession.sparkContext.broadcast(cents)

    @F.pandas_udf(IntegerType())
    def _nearest_cell(vecs: pd.Series) -> pd.Series:
        c = bc.value
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        unit = m / np.where(norms == 0, 1.0, norms)
        return pd.Series(np.argmax(unit @ c.T, axis=1).astype("int32"))

    fresh = new_vectors.select(
        F.col(index.corpus_id), F.col(index.vec_col).alias("__arr")
    ).withColumn("cell", _nearest_cell(F.col("__arr")))
    return IvfIndex(
        index.centroids,
        index.assigned.select(index.corpus_id, "__arr", "cell").unionByName(fresh),
        index.corpus_id,
        index.vec_col,
    )


def ivf_query(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    vec_col: str | None = None,
) -> DataFrame:
    """Approximate top-k against a prebuilt :class:`IvfIndex`.

    Pure plan construction — no ``collect``/``toPandas``/``first`` anywhere
    (mechanically asserted by tests/test_llm_ops.py's zero-job audit):
    score each query against the broadcast centroid table, keep the
    ``nprobe`` nearest cells, then brute-force only vectors in those cells.
    Recall < 1.0 by construction — rows-only in the oracle gate.

    When ``index.assigned`` is stored partitioned by ``cell`` (the 100 TB
    layout), dynamic partition pruning makes this query READ only the probed
    cell directories — demonstrated behaviorally in
    tests/test_llm_ops.py::test_ivf_partitioned_index_prunes_to_probed_cells.
    Two Spark preconditions, both encoded here: the probe list must reach
    the join as a broadcast WITHOUT a shuffle in its build side (hence the
    row-local top-nprobe below instead of a window), and neither input may
    be ``.cache()``d (the cache manager's plan substitution blocks
    broadcast-reuse pruning).
    """
    corpus_id = index.corpus_id
    q = queries.select(
        F.col(query_id), F.col(vec_col or index.vec_col).alias("__qvec")
    )
    # Probe list: nprobe nearest centroids per query, computed ROW-LOCAL —
    # the centroid table folds to a one-row array (tiny: n_clusters rows),
    # each query row sorts its own scores and explodes the top nprobe cells.
    # Deliberately NOT a window: a window's hash exchange in this build side
    # disqualifies the plan from dynamic partition pruning, which is what
    # makes a cell-partitioned ``assigned`` table scan only the probed cell
    # directories. Ordering matches the old window: (cent_sim desc, cell asc)
    # via ascending sort on struct(-sim, cell).
    cent_arr = index.centroids.agg(
        F.collect_list(F.struct("cell", "centroid")).alias("__cents")
    )
    scored_cells = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            (-cosine(F.col("__qvec"), c["centroid"])).alias("negsim"),
            c["cell"].alias("cell"),
        ),
    )
    q_cells = (
        q.crossJoin(F.broadcast(cent_arr))
        .withColumn("__probe", F.slice(F.array_sort(scored_cells), 1, nprobe))
        .select(query_id, "__qvec", F.explode(F.col("__probe.cell")).alias("cell"))
    )

    # Broadcast the probe list (nprobe rows per query, probe-batch-sized by
    # contract — bounded at any corpus scale). Besides skipping a shuffle of
    # the corpus side, the broadcast is what lets Spark's dynamic partition
    # pruning reuse it: when ``index.assigned`` is stored partitioned by
    # ``cell``, the scan prunes to exactly the probed cell directories
    # (asserted behaviorally in tests/test_llm_ops.py by corrupting every
    # non-probed cell's files and still getting the right answer).
    scored = F.broadcast(q_cells).join(index.assigned, "cell").select(
        query_id,
        corpus_id,
        F.round(cosine(F.col("__arr"), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """One-shot convenience: ``ivf_query(ivf_index(corpus), queries)``.

    Rebuilds the quantizer per call — fine interactively, wrong in a serving
    loop; persist :func:`ivf_index`'s DataFrames there instead.
    """
    idx = ivf_index(corpus, n_clusters, corpus_id=corpus_id, vec_col=vec_col, seed=seed)
    return ivf_query(idx, queries, k=k, nprobe=nprobe, query_id=query_id, vec_col=vec_col)


def _hyperplanes(dim: int, n_tables: int, bits_per_table: int, seed: int) -> np.ndarray:
    """(n_tables * bits_per_table, dim) Gaussian hyperplane normals, seeded."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables * bits_per_table, dim))


def _signature_udf(planes: np.ndarray, n_tables: int, bits_per_table: int, sc):
    """Arrow-batched signature kernel: array<float> -> array<int> of
    ``n_tables`` packed sign-bit signatures. One GEMM against the broadcast
    plane matrix per batch — the per-row Catalyst HOF equivalent would run
    ``n_tables * bits_per_table`` interpreted dot products per vector."""
    from pyspark.sql.types import ArrayType, IntegerType

    bc = sc.broadcast(planes)
    weights = (1 << np.arange(bits_per_table, dtype=np.int64))  # bit packing

    @F.pandas_udf(ArrayType(IntegerType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        h = bc.value  # (n_tables*bits, dim)
        m = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ h.T) > 0  # (n, n_tables*bits)
        per_table = bits.reshape(len(m), -1, len(weights))  # (n, tables, bits)
        sigs = (per_table * weights).sum(axis=2).astype("int32")  # (n, tables)
        return pd.Series(list(sigs))

    return _sig


@dataclass(frozen=True)
class LshIndex:
    """Hyperplane-LSH index over an embedding column.

    ``entries`` is the persistable exploded index (corpus_id, table_no,
    sig) — at 100 TB these are ``n_tables`` int columns written alongside
    the embedding table (12 B/row/table vs dim*4 B for the vector).
    ``planes`` is the deterministic hyperplane matrix (regenerable from
    ``seed`` + ``dim``; kept so queries sign identically).
    """

    entries: DataFrame
    planes: np.ndarray
    n_tables: int
    bits_per_table: int
    corpus_id: str
    vec_col: str


def lsh_index(
    corpus: DataFrame,
    n_tables: int = 8,
    bits_per_table: int = 10,
    dim: int | None = None,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> LshIndex:
    """Build the LSH index (ONCE — write-time at scale).

    Each corpus vector gets ``n_tables`` signatures, each packing
    ``bits_per_table`` hyperplane sign bits; two vectors at angle theta
    share one table's signature with probability
    ``(1 - theta/pi) ** bits_per_table`` — near-duplicates almost surely
    collide in some table, random pairs almost never do.

    Pass ``dim`` explicitly (the embedding width) to keep index build fully
    lazy; if omitted, ONE bounded ``first()`` job reads it from the corpus —
    acceptable at build time, never done at query time.
    """
    if dim is None:
        first = corpus.select(vec_col).first()
        dim = len(first[0])
    planes = _hyperplanes(dim, n_tables, bits_per_table, seed)
    sig = _signature_udf(planes, n_tables, bits_per_table, corpus.sparkSession.sparkContext)
    entries = corpus.select(
        F.col(corpus_id),
        F.posexplode(sig(F.col(vec_col))).alias("table_no", "sig"),
    )
    return LshIndex(entries, planes, n_tables, bits_per_table, corpus_id, vec_col)


def lsh_query(
    index: LshIndex,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    vec_col: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k against a prebuilt :class:`LshIndex`.

    Pure plan construction (no driver actions — see the zero-job audit in
    tests/test_llm_ops.py): queries are signed with the index's hyperplanes
    (Arrow-batched kernel, executor-side), candidates come from an
    equi-join on (table_no, sig) that ships ids only, and each DISTINCT
    candidate is rescored exactly against the corpus vector. Shuffled
    bytes are O(n * n_tables * 12B), not O(n * dim * 4B).
    Recall < 1.0 by construction — rows-only in the oracle gate.
    """
    corpus_id = index.corpus_id
    qvec = vec_col or index.vec_col
    sig = _signature_udf(
        index.planes,
        index.n_tables,
        index.bits_per_table,
        corpus.sparkSession.sparkContext,
    )
    q_idx = queries.select(
        F.col(query_id),
        F.posexplode(sig(F.col(qvec))).alias("table_no", "sig"),
    )

    cand = (
        index.entries.join(F.broadcast(q_idx), ["table_no", "sig"])
        .select(query_id, corpus_id)
        .distinct()
    )

    q = queries.select(F.col(query_id), F.col(qvec).alias("__qvec"))
    c = corpus.select(F.col(corpus_id), F.col(index.vec_col).alias("__cvec"))
    scored = (
        cand.join(c, corpus_id)
        .join(F.broadcast(q), query_id)
        .select(
            query_id,
            corpus_id,
            F.round(cosine(F.col("__cvec"), F.col("__qvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    bits_per_table: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """One-shot convenience: ``lsh_query(lsh_index(corpus), corpus, queries)``.

    Re-signs the corpus per call — fine interactively, wrong in a serving
    loop; persist :func:`lsh_index`'s ``entries`` there instead.
    """
    idx = lsh_index(
        corpus,
        n_tables,
        bits_per_table,
        dim=dim,
        corpus_id=corpus_id,
        vec_col=vec_col,
        seed=seed,
    )
    return lsh_query(idx, corpus, queries, k=k, query_id=query_id, vec_col=vec_col)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_blocks: int = 8,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact k-NN join: each query row -> its k nearest corpus rows (cosine).

    The corpus is scanned ONCE in ``n_blocks`` hash blocks; each block task
    runs one normalized GEMM of the (closure-shipped) query matrix against
    its block and emits only its LOCAL top-k per query, so the global top-k
    window merges k * n_blocks candidates per query instead of the full
    n_queries x n_corpus score matrix — the partial-top-k combine that keeps
    the exchange tiny at 100 TB (cosine_topk_bruteforce ships every score).

    The query batch is collected once at plan build and shipped by value in
    the UDF closure (what a broadcast does); exact k-NN requires every
    (query, block) pairing, so query sets must be probe-batch-sized — a
    corpus-scale query set belongs to the ANN paths (ivf/lsh).

    Determinism: similarities are rounded to 6 decimals INSIDE the block
    kernel and ties break by corpus id ascending, so per-block selection is
    the global criterion restricted to the block and the merge is exact.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    qpd = queries.select(F.col(query_id), F.col(vec_col)).toPandas()
    qids = qpd[query_id].to_numpy()
    qmat = np.array([np.asarray(v, dtype=np.float64) for v in qpd[vec_col]])
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qunit = qmat / np.where(qnorm == 0, 1.0, qnorm)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("corpus_id", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def _block_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(corpus_id)  # stable argsort => id-asc tie-break
        ids = pdf[corpus_id].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norms == 0, 1.0, norms)
        sims = np.round(qunit @ unit.T, 6)  # (n_q, n_block)
        kk = min(k + (1 if exclude_self else 0), len(ids))
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        n_q = len(qids)
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk),
                "corpus_id": ids[order].ravel(),
                "cos_sim": np.take_along_axis(sims, order, axis=1).ravel(),
            }
        )

    blocks = corpus.select(
        F.col(corpus_id), F.col(vec_col),
        F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(n_blocks)).alias("__blk"),
    ).groupBy("__blk")
    cand = blocks.applyInPandas(_block_topk, out_schema)
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("corpus_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias(query_id),
            F.col("corpus_id").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def knn_join_self(
    corpus: DataFrame,
    k: int = 10,
    n_blocks: int = 4,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact self-k-NN (every corpus row -> its k nearest corpus rows,
    cosine) with ZERO driver materialization — the corpus never leaves the
    executors.

    Exact all-pairs requires every block pair to meet, so the corpus is hash-
    blocked into ``n_blocks`` and each row is replicated ``n_blocks`` times
    twice — once in the query role (its own block paired with every corpus
    block) and once in the corpus role (every query block paired with its own
    block). ``groupBy(query_block, corpus_block)`` then lands each of the
    n_blocks^2 pairings on one executor, where a single normalized GEMM emits
    only that pairing's LOCAL top-k per query; the global window merges
    k * n_blocks candidates per query, never the n^2 score matrix.

    Cost model (be honest at 100 TB): the shuffle carries 2 * n_blocks copies
    of the corpus and compute is inherently O(n^2 / n_blocks) per block-pair
    row — exact self-k-NN is quadratic no matter the engine. This operator is
    the exact/oracle-checkable counterpart; corpus-scale serving belongs to
    the ANN paths (ivf_query / lsh_query), which this operator's output
    validates (recall measurement).

    Determinism: similarities round to 6 decimals inside the kernel and ties
    break by corpus id ascending, so per-pairing selection is the global
    criterion restricted to the pairing and the merge is exact.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    b = int(n_blocks)
    all_blocks = F.array([F.lit(j) for j in range(b)])
    base = corpus.select(
        F.col(corpus_id).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(b)).cast("int").alias("__blk"),
    )
    q_side = base.select(
        "__id",
        "__vec",
        F.col("__blk").alias("__qb"),
        F.explode(all_blocks).alias("__cb"),
        F.lit(True).alias("__is_q"),
    )
    c_side = base.select(
        "__id",
        "__vec",
        F.explode(all_blocks).alias("__qb"),
        F.col("__blk").alias("__cb"),
        F.lit(False).alias("__is_q"),
    )
    both = q_side.unionByName(c_side)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("corpus_id", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )
    empty = pd.DataFrame({"query_id": [], "corpus_id": [], "cos_sim": []})

    def _unit(pdf: pd.DataFrame):
        mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        return mat / np.where(norms == 0, 1.0, norms)

    def _pair_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf[pdf["__is_q"]]
        c = pdf[~pdf["__is_q"]].sort_values("__id")  # id-asc => stable tie-break
        if q.empty or c.empty:
            return empty
        qids = q["__id"].to_numpy()
        cids = c["__id"].to_numpy()
        sims = np.round(_unit(q) @ _unit(c).T, 6)  # (n_q, n_c)
        kk = min(k + (1 if exclude_self else 0), len(cids))
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk),
                "corpus_id": cids[order].ravel(),
                "cos_sim": np.take_along_axis(sims, order, axis=1).ravel(),
            }
        )

    cand = both.groupBy("__qb", "__cb").applyInPandas(_pair_topk, out_schema)
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("corpus_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias("query_id"),
            F.col("corpus_id").alias(corpus_id),
            "cos_sim",
            "rank",
        )
    )


def ivf_query_adc(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 30,
    query_id: str = "query_id",
    vec_col: str | None = None,
) -> DataFrame:
    """IVF + int8 asymmetric-distance scan — the FAISS-style serving combo:
    probe ``nprobe`` cells (scan reduction), score candidates with INTEGER
    dot products over symmetric-int8 vectors (4x less memory bandwidth than
    the float scan), keep a ``shortlist`` per query, then exact-cosine
    rescore only the shortlist (restoring float ranking quality on the few
    rows that matter). Pure plan construction — zero driver actions, same
    contract as :func:`ivf_query`. At 100 TB the ``__q8`` column is written
    next to the vectors at index-build time; here it is derived row-local
    in the same scan, which costs nothing extra at the exchange (only the
    probed cells are read either way).
    """
    corpus_id = index.corpus_id

    def _q8(col: Column) -> Column:
        v = _as_double(col)
        nrm = l2_norm(v)
        return F.transform(v, lambda x: F.round(x / nrm * 127, 0).cast("int"))

    q = queries.select(
        F.col(query_id),
        F.col(vec_col or index.vec_col).alias("__qvec"),
    ).withColumn("__p8", _q8(F.col("__qvec")))
    # Probe list: identical row-local construction to ivf_query (broadcast
    # centroid fold, per-row sort, top-nprobe explode) — keeps the build
    # side shuffle-free so a cell-partitioned index still prunes.
    cent_arr = index.centroids.agg(
        F.collect_list(F.struct("cell", "centroid")).alias("__cents")
    )
    scored_cells = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            (-cosine(F.col("__qvec"), c["centroid"])).alias("negsim"),
            c["cell"].alias("cell"),
        ),
    )
    q_cells = (
        q.crossJoin(F.broadcast(cent_arr))
        .withColumn("__probe", F.slice(F.array_sort(scored_cells), 1, nprobe))
        .select(
            query_id, "__qvec", "__p8", F.explode(F.col("__probe.cell")).alias("cell")
        )
    )
    assigned_q = index.assigned.withColumn("__q8", _q8(F.col("__arr")))
    adc = F.aggregate(
        F.zip_with("__q8", "__p8", lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    cand = (
        F.broadcast(q_cells)
        .join(assigned_q, "cell")
        .select(query_id, corpus_id, "__arr", "__qvec", adc.alias("score_q8"))
    )
    ws = Window.partitionBy(query_id).orderBy(
        F.col("score_q8").desc(), F.col(corpus_id)
    )
    short = cand.withColumn("__r", F.row_number().over(ws)).filter(
        F.col("__r") <= shortlist
    )
    rescored = short.select(
        query_id,
        corpus_id,
        F.round(cosine(F.col("__arr"), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_sim").desc(), F.col(corpus_id))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", "rank")
    )


def _lloyd_kmeans_l2(mat: "np.ndarray", k: int, seed: int, iters: int = 8) -> "np.ndarray":
    """Seeded Lloyd iterations in L2 (the geometry PQ codebooks train in —
    subvectors are not unit vectors even when the full vector is). Pure
    NumPy on an already-bounded sample; deterministic per seed."""
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


@dataclass(frozen=True)
class PqIndex:
    codes: DataFrame  # (corpus_id, codes: array<int>) — m codes in [0, n_centroids)
    codebooks: "np.ndarray"  # (m, n_centroids, dim/m) — broadcast at query time
    m: int
    n_centroids: int
    corpus_id: str


def pq_index(
    corpus: DataFrame,
    m: int = 16,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> PqIndex:
    """Product quantization (FAISS PQm x k): split each UNIT-NORMALIZED
    vector into ``m`` subspaces, k-means each subspace independently on a
    bounded driver sample, store per-vector code words only — dim floats
    (256 bytes at dim=64) collapse to ``m`` small ints (m bytes packed),
    a 16x+ compression that turns a 100 TB vector corpus into a few TB of
    codes. Build-time cost: one bounded sample + one Arrow encode pass
    (row-local, zero shuffle). The inner product of unit vectors is the
    sum of per-subspace inner products, so cosine scoring survives the
    decomposition exactly up to quantization error.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    sample = (
        corpus.select(F.col(vec_col).alias("__arr"))
        .orderBy(F.col(corpus_id))
        .limit(_IVF_FIT_SAMPLE)
        .toPandas()["__arr"]
    )
    mat = np.array([np.asarray(v, dtype=np.float64) for v in sample])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / np.where(norms == 0, 1.0, norms)
    dim = unit.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack(
        [
            _lloyd_kmeans_l2(unit[:, j * dsub : (j + 1) * dsub], n_centroids, seed + j)
            for j in range(m)
        ]
    )  # (m, k, dsub)

    bc = corpus.sparkSession.sparkContext.broadcast(books)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _encode(vecs: pd.Series) -> pd.Series:
        bks = bc.value
        mm, kk, ds = bks.shape
        out = []
        arr = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        nr = np.linalg.norm(arr, axis=1, keepdims=True)
        un = arr / np.where(nr == 0, 1.0, nr)
        codes = np.empty((len(un), mm), dtype=np.int32)
        for j in range(mm):
            sub = un[:, j * ds : (j + 1) * ds]  # (n, dsub)
            d2 = ((sub[:, None, :] - bks[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        out = [c.tolist() for c in codes]
        return pd.Series(out)

    codes = corpus.select(F.col(corpus_id), _encode(F.col(vec_col)).alias("codes"))
    return PqIndex(codes=codes, codebooks=books, m=m, n_centroids=n_centroids, corpus_id=corpus_id)


def pq_query(
    index: PqIndex,
    queries: DataFrame,
    corpus: DataFrame | None = None,
    k: int = 10,
    shortlist: int = 50,
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance PQ search: per query build an (m x k) lookup
    table of subspace inner products ONCE per Arrow batch, score every
    code word by m table lookups (no float vector is ever touched), take
    a per-query ``shortlist``, and — when ``corpus`` is supplied — rescore
    the shortlist with exact cosine to restore float ranking on the rows
    that matter (the ivf_query_adc serving combo, at PQ compression).
    Zero driver actions; the probe batch broadcasts.
    """
    from pyspark.sql.types import DoubleType

    bc = index.codes.sparkSession.sparkContext.broadcast(index.codebooks)

    @F.pandas_udf(DoubleType())
    def _adc(codes: pd.Series, qvecs: pd.Series) -> pd.Series:
        bks = bc.value  # (m, k, dsub)
        mm, kk, ds = bks.shape
        luts: dict[bytes, "np.ndarray"] = {}
        out = np.empty(len(codes))
        for i in range(len(codes)):
            qv = np.asarray(qvecs.iloc[i], dtype=np.float64)
            key = qv.tobytes()
            lut = luts.get(key)
            if lut is None:
                qn = qv / (np.linalg.norm(qv) or 1.0)
                lut = np.stack(
                    [bks[j] @ qn[j * ds : (j + 1) * ds] for j in range(mm)]
                )  # (m, k)
                luts[key] = lut
            cs = np.asarray(codes.iloc[i], dtype=np.int64)
            out[i] = lut[np.arange(mm), cs].sum()
        return pd.Series(out)

    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qvec"))
    cand = index.codes.crossJoin(F.broadcast(q)).select(
        query_id,
        index.corpus_id,
        _adc(F.col("codes"), F.col("__qvec")).alias("score_pq"),
        "__qvec",
    )
    ws = Window.partitionBy(query_id).orderBy(
        F.col("score_pq").desc(), F.col(index.corpus_id)
    )
    short = cand.withColumn("__r", F.row_number().over(ws)).filter(
        F.col("__r") <= (shortlist if corpus is not None else k)
    )
    if corpus is None:
        return short.select(
            query_id,
            index.corpus_id,
            F.round("score_pq", 6).alias("pq_sim"),
            F.col("__r").cast("int").alias("rank"),
        )
    rescored = short.join(
        corpus.select(F.col(index.corpus_id), F.col(vec_col).alias("__cvec")),
        index.corpus_id,
    ).select(
        query_id,
        index.corpus_id,
        F.round(cosine(F.col("__cvec"), F.col("__qvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(index.corpus_id)
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, index.corpus_id, "cos_sim", "rank")
    )


def _quantize6(d):
    """HALF_UP to 6dp — the semantics of Spark's round() on DECIMAL."""
    from decimal import ROUND_HALF_UP, Decimal

    return d.quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _round6_exact(x: float):
    """EXACT replay of Spark's ``round(double, 6)`` / double->decimal(18,6)
    cast: both go through the SHORTEST decimal representation of the double
    (BigDecimal.valueOf semantics) before HALF_UP scaling — ``repr()`` is
    Python's shortest round-trip form, so the value is identical.
    Equivalence is pinned by tests/test_linkage.py::
    test_mmr_local_arithmetic_matches_engine."""
    from decimal import Decimal

    return _quantize6(Decimal(repr(x)))


def _fold_cosine(u: list, v: list) -> float:
    """EXACT replay of :func:`cosine` (dot / (||u||*||v||)) as the engine
    evaluates it: ``F.aggregate`` is a sequential left fold, so the Python
    loop below performs the identical IEEE operation sequence."""
    import math

    s = 0.0
    for x, y in zip(u, v):
        s += x * y
    nu = 0.0
    for x in u:
        nu += x * x
    nv = 0.0
    for y in v:
        nv += y * y
    return s / (math.sqrt(nu) * math.sqrt(nv))


def mmr_select(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 8,
    pool_size: int = 32,
    lam: float = 0.7,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank: greedy diverse top-k.

    MMR (Carbonell & Goldstein 1998) selects, at each step, the candidate
    maximizing ``lam * relevance - (1-lam) * max_sim_to_selected`` — the
    standard redundancy-suppressing re-rank between retrieval and a
    context window (RAG) or a labeling budget (active learning).

    Execution shape, and the 100 TB story:

    - **relevance pass** — one distributed corpus scan against the literal
      query vector (codegen dot product, no join, no Python), fused into
      TakeOrderedAndProject for the top ``pool_size`` re-rank window.
      Re-ranking a bounded pool is the standard IR contract (the pool is
      the tunable recall/latency knob); only this pass touches the corpus.
    - **greedy loop** — runs DRIVER-LOCAL over the collected pool: one
      collect of ``pool_size`` rows (bounded by construction — the same
      class as the classifier's 65-double gradient collect), then k-1
      greedy rounds of pure-Python arithmetic that replays the engine's
      numerics EXACTLY: cosine as the same sequential left-fold
      ``F.aggregate`` evaluates, 6dp rounding via shortest-repr decimal
      HALF_UP (what Spark's ``round``/double->decimal cast do), and the
      DECIMAL(4,3)-weighted combination in exact ``decimal`` arithmetic.
      A previous formulation ran each round as a Spark job collecting one
      winner row — k-1 scheduler round-trips over a 32-row table for the
      same O(k*pool) arithmetic (measured ~60% of the operator's wall).

    Determinism (oracle rule): relevance and max_sim are rounded to 6dp
    before the mmr arithmetic, score rounded again, ties broken by id
    ascending — mirrored exactly by the unrolled-CTE DuckDB oracle.
    """
    rel = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.round(cosine(F.col(vec_col), F.array(*[F.lit(float(x)) for x in query_vec])), 6).alias(
            "relevance"
        ),
        _as_double(F.col(vec_col)).alias("__v"),
    )
    pool_rows = (
        rel.orderBy(F.col("relevance").desc(), F.col("vec_id").asc())
        .limit(pool_size)
        .collect()
    )

    from decimal import Decimal

    # CAST(x AS DECIMAL(4,3)) on the 1-digit literals used here is exact
    lam_d = Decimal(str(lam))
    one_m_lam_d = Decimal(str(round(1.0 - lam, 10)))
    _d6, _cos = _round6_exact, _fold_cosine

    # candidate state: [id, relevance(double), vec, max_raw(double|None)]
    cand = [[r["vec_id"], float(r["relevance"]), list(r["__v"]), None] for r in pool_rows]
    selected: list[tuple] = []  # (rank, vec_id, relevance, max_sim, mmr_score)
    for rank in range(1, k + 1):
        if not cand:
            break  # pool exhausted before k
        best = None
        for c in cand:
            # max_sim = coalesce(round(__max_raw, 6), 0.0)
            ms = 0.0 if c[3] is None else float(_d6(c[3]))
            # exact DECIMAL combination (same midpoint hazard as the
            # linkage score: 6dp inputs x 3dp weights land on exact 7dp
            # midpoints a double sum rounds engine-dependently)
            mmr = _quantize6(lam_d * _d6(c[1]) - one_m_lam_d * _d6(ms))
            # round 1 orders by relevance, later rounds by mmr; vec_id asc
            key = (-c[1], c[0]) if rank == 1 else (-mmr, c[0])
            if best is None or key < best[0]:
                best = (key, c, ms, mmr)
        _, row, ms, mmr = best
        selected.append((rank, row[0], row[1], ms, float(mmr)))
        cand = [c for c in cand if c[0] != row[0]]
        for c in cand:
            # __max_raw = greatest(coalesce(__max_raw, -1.0), cosine(v, win))
            prev = -1.0 if c[3] is None else c[3]
            c[3] = max(prev, _cos(c[2], row[2]))
    spark = corpus.sparkSession
    out = spark.createDataFrame(
        selected, "rank int, vec_id bigint, relevance double, max_sim double, mmr_score double"
    )
    return out.select("rank", "vec_id", "relevance", "max_sim", "mmr_score")
