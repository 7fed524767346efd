"""Product quantization ANN tier (VERDICT r8 #8).

At 100 TB the embedding PAYLOAD is the cost: a 16-float vector is 64
bytes, its PQ code is ``m`` bytes.  The tier splits each (normalized)
vector into ``m`` contiguous subvectors, learns a tiny per-subspace
codebook (k-means on a bounded deterministic sample, trained on the
driver — standard PQ practice), and stores only the per-subspace
nearest-codeword ids.  Queries never decode the corpus: ADC
(asymmetric distance computation) builds one ``m x ksub`` lookup table
of exact subvector dots per query and scores a candidate as the sum of
``m`` table lookups — the approximate cosine.  An exact re-rank over
the ADC shortlist then fixes the ranking, so the raw vectors are
touched only for ``shortlist`` rows per query.

Scale shape, per the repo's ANN rules:
- codebooks are a broadcast constant (m * ksub * dsub floats — KB);
- candidate generation rides the SAME sign-cell inverted lists as
  `similarity.ivf_cosine_topk` (equi-join on the cell id, multi-probe
  on the query side) — no all-pairs anything;
- the only Python is Arrow-batched numpy (encode / ADC), the pattern
  PLAN_AUDIT already whitelists for matmul work;
- the shortlist/re-rank windows partition per query_id.

Like every approximate operator here it is recall-gated against the
exact twin (tools/check_oracle.py RECALL_GATES; floor 0.8), not
hash-gated: near-tie codeword assignment is float-order sensitive
across engines.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine


def _normalized_sample(df: DataFrame, vec_col: str, id_col: str, sample: int) -> np.ndarray:
    """Deterministic hash-ordered sample, L2-normalized — the same
    bounded-driver-memory seeding rule as `kmeans.kmeans_fit`."""
    rows = (
        df.select(F.col(vec_col).alias("__v"), F.md5(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(sample)
        .collect()
    )
    S = np.vstack([np.asarray(r["__v"], dtype=np.float64) for r in rows])
    return S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)


def _lloyd(X: np.ndarray, k: int, iters: int, tol: float) -> np.ndarray:
    """Euclidean k-means on the driver: farthest-point seeding from the
    first row (deterministic given deterministic X), then Lloyd.
    Returns the k x d codebook."""
    if len(X) < k:
        raise ValueError(f"ksub={k} exceeds the {len(X)} sample rows")
    chosen = [0]
    d2 = np.sum((X - X[0]) ** 2, axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, np.sum((X - X[nxt]) ** 2, axis=1))
    C = X[chosen].copy()
    for _ in range(iters):
        dist = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(dist, axis=1)
        newC = C.copy()
        for j in range(k):
            members = X[assign == j]
            if len(members):
                newC[j] = members.mean(axis=0)
        shift = float(np.max(np.linalg.norm(newC - C, axis=1)))
        C = newC
        if shift <= tol:
            break
    return C


def pq_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ksub: int = 16,
    sample: int = 4096,
    iters: int = 25,
    tol: float = 1e-6,
) -> list[list[list[float]]]:
    """Train the ``m`` per-subspace codebooks (each ``ksub x dim/m``)
    on a deterministic sample of the NORMALIZED corpus.  The vector
    dimension must divide evenly into ``m`` contiguous subspaces."""
    S = _normalized_sample(df, vec_col, id_col, sample)
    dim = S.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into m={m} subspaces")
    dsub = dim // m
    return [
        _lloyd(S[:, j * dsub:(j + 1) * dsub], ksub, iters, tol).tolist()
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the ``m``-byte PQ code (array<int> of per-subspace
    nearest-codeword ids) — one numpy pass per Arrow batch against the
    closure-broadcast codebooks; ties break to the lower id (argmin
    stability) so codes are deterministic."""
    from pyspark.sql.functions import pandas_udf

    CB = [np.asarray(c, dtype=np.float64) for c in codebooks]
    m, dsub = len(CB), CB[0].shape[1]

    @pandas_udf("array<int>")
    def encode_udf(vectors: pd.Series) -> pd.Series:
        X = np.vstack(vectors.to_numpy()).astype(np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(X), m), dtype=np.int64)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            # ||sub - c||² argmin == argmax(2 sub·c - ||c||²)
            scores = 2.0 * (sub @ CB[j].T) - (CB[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = np.argmax(scores, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return df.withColumn(out_col, encode_udf(F.col(vec_col)))


def adc_score(qv_col: Column | str, code_col: Column | str, codebooks: list[list[list[float]]]) -> Column:
    """Approximate cosine of (query, encoded corpus vector): the sum of
    per-subspace dots between the normalized query subvector and the
    corpus codeword — ADC with the per-batch numpy LUT."""
    from pyspark.sql.functions import pandas_udf

    CB = [np.asarray(c, dtype=np.float64) for c in codebooks]
    m, dsub = len(CB), CB[0].shape[1]

    @pandas_udf("double")
    def adc_udf(qvs: pd.Series, codes: pd.Series) -> pd.Series:
        Q = np.vstack(qvs.to_numpy()).astype(np.float64)
        Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        C = np.vstack(codes.to_numpy()).astype(np.int64)
        total = np.zeros(len(Q))
        for j in range(m):
            # n x ksub exact subvector dots, gathered at each row's code
            lut = Q[:, j * dsub:(j + 1) * dsub] @ CB[j].T
            total += np.take_along_axis(lut, C[:, j:j + 1], axis=1)[:, 0]
        return pd.Series(total)

    q = F.col(qv_col) if isinstance(qv_col, str) else qv_col
    c = F.col(code_col) if isinstance(code_col, str) else code_col
    return adc_udf(q, c)


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    planes: list[list[float]],
    k: int = 5,
    nprobe: int = 8,
    shortlist: int = 64,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ-ADC + exact re-rank: sign-cell inverted lists bound the
    candidate set (multi-probe on the query side, exactly q45's cells),
    ADC over the broadcast codebooks prunes each query's candidates to
    ``shortlist`` WITHOUT touching corpus vectors, and an exact cosine
    re-rank of the shortlist produces the final top-k.  Output schema
    matches the exact `cosine_topk` (query_id, neighbor_id, cos, rank)
    so the recall gate diffs directly against q18."""
    from .similarity import with_hyperplane_sketch, with_ivf_probe_cells

    c = with_hyperplane_sketch(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        "__cv",
        planes,
        out_col="__cell",
    )
    # the candidate/ADC path carries ONLY (cell, code, id) for the
    # corpus side — the raw vector is dropped here and re-joined for
    # shortlist rows alone, which is the whole point of the PQ byte
    # shrink (the codes, not the vectors, ride the candidate join)
    c = pq_encode(c, codebooks, vec_col="__cv", out_col="__code").drop("__cv")
    q = with_ivf_probe_cells(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")),
        "__qv",
        planes,
        nprobe,
    ).select("query_id", "__qv", F.explode("__cells").alias("__cell"))

    cand = q.join(c, "__cell").filter(F.col("query_id") != F.col("neighbor_id"))
    adc = cand.select(
        "query_id", "neighbor_id", "__qv",
        adc_score("__qv", "__code", codebooks).alias("__adc"),
    )
    ws = Window.partitionBy("query_id").orderBy(F.col("__adc").desc(), F.col("neighbor_id").asc())
    short = adc.withColumn("__srk", F.row_number().over(ws)).filter(F.col("__srk") <= shortlist)
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
