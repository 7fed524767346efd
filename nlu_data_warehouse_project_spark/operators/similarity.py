"""Similarity search over embedding columns (BASELINE.json north star).

Two paths:

- ``cosine_topk``: brute-force exact top-k.  The dot product / norms are
  higher-order array expressions (JVM-side, no Python); the k-selection
  is a per-query window.  Cost O(|Q| x |C|) — the correctness baseline,
  fine when |Q| is small or the corpus is filtered first.

- ``lsh_cosine_topk``: the scale path.  Random-hyperplane LSH: sign-bit
  sketch of each vector, band the bits, candidate pairs = bucket
  collisions, exact cosine re-rank on candidates only.  At 100 TB the
  bucket join replaces the cross product; recall is tunable with
  (num_bits, bands).

Vectors are ``array<float>`` columns; all arithmetic is done in double.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Result: (query_id, neighbor_id, cos) with rank<=k, ties broken by
    neighbor id for determinism.  The queries side is broadcast (top-k
    search is almost always few-queries x huge-corpus); the corpus is
    scanned once, no shuffle until the per-query window (partitioned by
    query — |Q| partitions of |C| rows; for large |Q| AQE coalesces).

    Guard rail (VERDICT r1 #5): |Q| x |C| comparisons are only sane for
    a small broadcast-able query side; above ``max_queries`` this raises
    — use ``lsh_cosine_topk`` for the bucketed path.  The check scans at
    most ``max_queries + 1`` rows (limit-pushdown stops the count job
    early), so the guard costs ~nothing on tiny inputs.
    """
    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"cosine_topk with > max_queries={max_queries} query vectors: "
            "the brute-force path scores |Q| x |corpus| pairs — use lsh_cosine_topk, "
            "or raise max_queries if the scan is intentional"
        )
    q = F.broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv"))
    )
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("__qv", "__cv").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank")
    )


def hyperplane_sketch(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit sketch: bit i = (vec . planes[i]) >= 0.

    Pure-expression form.  NB: higher-order array functions are
    interpreted (not codegen'd) — for corpus-scale sketching use
    ``with_hyperplane_sketch`` (vectorized Pandas UDF, ~10x faster)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    bits = []
    for plane in planes:
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(dot(v, p) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def with_hyperplane_sketch(df: DataFrame, vec_col: str, planes: list[list[float]], out_col: str = "__sketch") -> DataFrame:
    """Arrow-vectorized sign-bit sketch: one numpy matmul per batch
    ((batch x dim) @ (dim x nbits)) instead of nbits x dim interpreted
    lambda evaluations per row.  This is the sanctioned Pandas-UDF slow
    path: built-in expressions cannot express a matrix multiply."""
    from pyspark.sql.functions import pandas_udf

    plane_matrix = [list(map(float, p)) for p in planes]

    @pandas_udf("string")
    def sketch(vectors: pd.Series) -> pd.Series:
        pm = np.asarray(plane_matrix, dtype=np.float64).T  # dim x nbits
        mat = np.vstack(vectors.to_numpy())                # batch x dim
        bits = (mat.astype(np.float64) @ pm) >= 0          # batch x nbits
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    return df.withColumn(out_col, sketch(F.col(vec_col)))


def _multiprobe_cells(row_bits, row_absdots, n_cells: int) -> list[str]:
    """Successor-heap multi-probe enumeration (Lv et al., VLDB'07): emit
    ``n_cells`` bit-strings starting from the own sign-cell, then
    neighbor cells in increasing total boundary-crossing cost — flip
    SETS of bits ordered by the sum of their hyperplane margins
    |v . p_i|, generated lazily (extend the max flipped index / shift
    it), so n_cells can range up to every cell (2^nbits) without
    materializing the power set."""
    import heapq

    nbits = len(row_bits)
    order = np.argsort(row_absdots)          # cheapest bit flips first
    m = row_absdots[order]
    cells, heap = [], [(0.0, ())]
    while heap and len(cells) < n_cells:
        score, subset = heapq.heappop(heap)
        flipped = row_bits.copy()
        for s in subset:
            j = order[s]
            flipped[j] = not flipped[j]
        cells.append("".join("1" if b else "0" for b in flipped))
        if not subset:
            if nbits:
                heapq.heappush(heap, (m[0], (0,)))
        else:
            last = subset[-1]
            if last + 1 < nbits:
                heapq.heappush(heap, (score + m[last + 1], subset + (last + 1,)))
                heapq.heappush(heap, (score - m[last] + m[last + 1], subset[:-1] + (last + 1,)))
    return cells


def with_ivf_probe_cells(
    df: DataFrame,
    vec_col: str,
    planes: list[list[float]],
    nprobe: int,
    out_col: str = "__cells",
) -> DataFrame:
    """Multi-probe cell list for each vector: the own sign-cell first,
    then the ``nprobe - 1`` cheapest boundary-crossing neighbor cells
    (see ``_multiprobe_cells``).  One numpy matmul per Arrow batch,
    like ``with_hyperplane_sketch``."""
    from pyspark.sql.functions import pandas_udf

    plane_matrix = [list(map(float, p)) for p in planes]
    nbits = len(planes)
    n_cells = min(nprobe, 1 << nbits)

    @pandas_udf("array<string>")
    def cells_udf(vectors: pd.Series) -> pd.Series:
        pm = np.asarray(plane_matrix, dtype=np.float64).T      # dim x nbits
        mat = np.vstack(vectors.to_numpy()).astype(np.float64)  # batch x dim
        dots = mat @ pm                                         # batch x nbits
        bits = dots >= 0
        absdots = np.abs(dots)
        return pd.Series(
            [_multiprobe_cells(bits[i].copy(), absdots[i], n_cells) for i in range(len(bits))]
        )

    return df.withColumn(out_col, cells_udf(F.col(vec_col)))


def with_banded_probe_cells(
    df: DataFrame,
    vec_col: str,
    planes: list[list[float]],
    bands: int,
    nprobe: int,
    out_col: str = "__probes",
) -> DataFrame:
    """Per-band multi-probe: for each of the ``bands`` bit-slices of the
    sketch, emit the own band value plus the ``nprobe - 1``
    cheapest-flip neighbor values (margin-guided successor heap per
    band).  Output: array of ``"band_id:band_bits"`` strings, length
    bands x nprobe — the query side of multi-probe banded LSH.  Probing
    T cells per band multiplies the query-side band rows by T (queries
    are the small side) while the corpus keeps exactly one row per
    band — the classic memory-less recall boost: no extra hash tables,
    no corpus re-partitioning."""
    from pyspark.sql.functions import pandas_udf

    plane_matrix = [list(map(float, p)) for p in planes]
    nbits = len(planes)
    r = nbits // bands
    n_cells = min(nprobe, 1 << r)

    @pandas_udf("array<string>")
    def probes_udf(vectors: pd.Series) -> pd.Series:
        pm = np.asarray(plane_matrix, dtype=np.float64).T      # dim x nbits
        mat = np.vstack(vectors.to_numpy()).astype(np.float64)  # batch x dim
        dots = mat @ pm                                         # batch x nbits
        bits = dots >= 0
        absdots = np.abs(dots)
        out = []
        for i in range(len(bits)):
            entries = []
            for b in range(bands):
                lo, hi = b * r, (b + 1) * r
                for cell in _multiprobe_cells(bits[i, lo:hi].copy(), absdots[i, lo:hi], n_cells):
                    entries.append(f"{b}:{cell}")
            out.append(entries)
        return pd.Series(out)

    return df.withColumn(out_col, probes_udf(F.col(vec_col)))


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: hyperplane sign cells as the coarse
    quantizer (2^len(planes) inverted lists), queries probe their own
    cell plus the ``nprobe - 1`` nearest-boundary neighbor cells, exact
    cosine re-rank inside the probed lists only.

    Unlike banded LSH (``lsh_cosine_topk``), the candidate set here is
    a pure function of the fixed planes — fully deterministic, so the
    nprobe=1 form is oracle-gatable (q45), not just rows-only checked.
    Scale shape: corpus is assigned once (scan-local matmul), the probe
    join is an equi-join on the cell id, and per-cell candidate counts
    are corpus/2^bits on random data — no cross product anywhere.
    """
    c = with_hyperplane_sketch(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        planes,
        out_col="__cell",
    )
    q = with_ivf_probe_cells(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
        planes,
        nprobe,
    ).select("query_id", "__qv", F.explode("__cells").alias("__cell"))

    # probe cells are distinct and each corpus vector lives in exactly
    # one cell, so (query, neighbor) pairs are already unique
    cand = q.join(c, "__cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select("query_id", "neighbor_id", cosine("__qv", "__cv").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank")
    )


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    bands: int = 4,
    k: int = 5,
    nprobe: int = 8,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = query/corpus pairs sharing at
    least one LSH band (with query-side multi-probe), re-ranked by
    exact cosine.

    ``planes`` are caller-supplied (deterministic, seedable) random
    hyperplanes; len(planes) must divide into ``bands`` equal bands.
    The candidate join is an equi-join on (band_id, band_bits) — at
    scale it hash-partitions instead of the brute-force cross product.

    ``nprobe`` > 1 is query-side multi-probe: each query band also
    probes the nprobe-1 nearest-boundary neighbor band values (the
    bits most likely to differ for a true near neighbor are exactly
    the low-margin ones), lifting recall without extra hash tables or
    a wider corpus explode.  Candidate volume scales ~linearly in
    nprobe on the QUERY side only; the corpus stays at one row per
    band.  Recall at the q34 config (16 planes, 4 bands, nprobe=8)
    is measured in bench.py as ``lsh_topk_recall`` and floored by
    tests/test_llm_ops.py.
    """
    nbits = len(planes)
    rows_per_band = nbits // bands

    def banded(df: DataFrame, id_alias: str) -> DataFrame:
        sk = with_hyperplane_sketch(df, "__v", planes).select(
            F.col("__id").alias(id_alias),
            F.col("__v").alias(f"__v_{id_alias}"),
            F.col("__sketch"),
        )
        bands_arr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.substring("__sketch", b * rows_per_band + 1, rows_per_band).alias("band_bits"),
                )
                for b in range(bands)
            ]
        )
        return sk.select(id_alias, f"__v_{id_alias}", F.explode(bands_arr).alias("band")).select(
            id_alias, f"__v_{id_alias}", "band.band_id", "band.band_bits"
        )

    q = (
        with_banded_probe_cells(
            queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__v_query_id")),
            "__v_query_id",
            planes,
            bands,
            nprobe,
        )
        .select("query_id", "__v_query_id", F.explode("__probes").alias("__probe"))
        .select(
            "query_id",
            "__v_query_id",
            F.split("__probe", ":")[0].cast("int").alias("band_id"),
            F.split("__probe", ":")[1].alias("band_bits"),
        )
    )
    c = banded(corpus.select(F.col(corpus_id).alias("__id"), F.col(vec_col).alias("__v")), "neighbor_id")

    cand = (
        q.join(c, ["band_id", "band_bits"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__v_query_id", "__v_neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine("__v_query_id", "__v_neighbor_id").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank")
    )


def hard_negative_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_queries: int = 10_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-k most similar corpus vectors carrying a DIFFERENT label —
    the negatives that actually teach a retriever something (random
    negatives are trivially far; these sit right at the decision
    boundary).  Same plan shape and guard rail as ``cosine_topk``
    (broadcast query side, corpus scanned once, per-query window); the
    label exclusion is a row-local filter BEFORE the ranking, so the
    top-k is over negatives only, not a post-filter that returns
    fewer than k."""
    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"hard_negative_topk with > max_queries={max_queries} query vectors: "
            "the brute-force path scores |Q| x |corpus| pairs — bucket the corpus "
            "(lsh/ivf) or raise max_queries if the scan is intentional"
        )
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col(label_col).alias("__ql"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("__cl"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .filter(~F.col("__ql").eqNullSafe(F.col("__cl")))
        .select(
            "query_id",
            "neighbor_id",
            F.col("__cl").alias("neg_label"),
            cosine("__qv", "__cv").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neg_label", F.round(F.col("cos"), 4).alias("cos"), "rank")
    )


def random_project(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 0,
    out_col: str = "projected",
) -> DataFrame:
    """Rademacher Johnson-Lindenstrauss projection: y = (X @ R) / sqrt(d')
    with R[i][j] drawn ±1 from a seeded generator.

    THE byte-shrink primitive of the similarity family at 100 TB: a
    64-dim float corpus projected to 16 dims is 4x fewer bytes through
    every downstream shuffle, and by the JL lemma pairwise distances
    (hence cosine order, for normalized vectors) are preserved within
    ~1/sqrt(d') distortion.  Composes with every rung of the ANN
    ladder: project -> band/bucket on the projected vectors -> exact
    re-rank on raw vectors for the shortlist only (the ivf_pq_topk
    join shape).

    R is NOT broadcast data — it regenerates identically inside each
    Arrow batch from (seed, in_dim), so the closure ships two ints.
    The sanctioned Pandas-UDF slow path: a matmul has no built-in
    expression form.  Output is array<double> (the projection leaves
    float32 range immediately).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def project(vectors: pd.Series) -> pd.Series:
        mat = np.vstack(vectors.to_numpy()).astype(np.float64)  # batch x d
        rng = np.random.default_rng(seed)
        r = rng.choice((-1.0, 1.0), size=(mat.shape[1], out_dim))
        proj = mat @ r / np.sqrt(out_dim)
        return pd.Series(list(proj))

    return df.withColumn(out_col, project(F.col(vec_col)))


def projected_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    out_dim: int = 16,
    seed: int = 0,
    shortlist: int = 20,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-to-fine top-k: score in the PROJECTED space (out_dim
    dims, ~in_dim/out_dim x fewer bytes and flops per pair), keep a
    per-query ``shortlist``, then exact-cosine re-rank on the RAW
    vectors for shortlist rows only — the same
    shortlist-then-re-join-raw shape as ``ivf_pq_topk``.

    Same output contract as ``cosine_topk`` (query_id, neighbor_id,
    cos, rank), recall-gated against the exact twin in the catalog
    (q179 vs q18, the q34 discipline).
    """
    qp = random_project(queries, vec_col, out_dim, seed, "__pq").select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__pq"),
    )
    cp = random_project(corpus, vec_col, out_dim, seed, "__pc").select(
        F.col(corpus_id).alias("neighbor_id"), F.col("__pc")
    )
    coarse = (
        F.broadcast(qp)
        .crossJoin(cp)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", cosine("__pq", "__pc").alias("__coarse"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("__coarse").desc(), F.col("neighbor_id").asc()
    )
    short = coarse.withColumn("__srk", F.row_number().over(ws)).filter(
        F.col("__srk") <= shortlist
    )
    raw = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = short.join(raw, "neighbor_id").select(
        "query_id", "neighbor_id", cosine("__qv", "__cv").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cos"), 4).alias("cos"), "rank")
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k HARD NEGATIVES per query: the nearest corpus
    vectors whose ``label_col`` DIFFERS from the query's — the
    contrastive-training mining primitive (a hard negative is close in
    embedding space but wrong in label space; random negatives are too
    easy to teach anything).  Same plan shape as ``cosine_topk``
    (broadcast query side, one corpus scan, per-query window) with the
    label-mismatch predicate applied BEFORE the window, so the top-k
    ranks over negatives only.  Returns (query_id, query_label,
    neighbor_id, neighbor_label, cos, rank)."""
    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"hard_negatives with > max_queries={max_queries} query vectors: "
            "the brute-force path scores |Q| x |corpus| pairs — bucket the "
            "corpus first (lsh_cosine_topk) and post-filter labels, or "
            "raise max_queries if the scan is intentional"
        )
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col(label_col).alias("query_label"),
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col(label_col).alias("neighbor_label"),
    )
    scored = (
        q.crossJoin(c)
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("query_label") != F.col("neighbor_label"))
        )
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            cosine("__qv", "__cv").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            F.round(F.col("cos"), 4).alias("cos"), "rank",
        )
    )
