"""Dedup operator family for training-data pipelines (BASELINE.json
north star): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.  Each returns DataFrames, scales by
bucketing (never an unbounded cross join), and has deterministic
(md5-based) hashing so independent engines can reproduce results.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve under postponed annotations
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, shingles, simhash60
from .similarity import cosine


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Exact dedup on the normalized content fingerprint; keeper = the
    lowest id in each group (deterministic).  Single pass: one window
    shuffle on the fingerprint (a groupBy-min + self-join shape would
    compute every fingerprint twice).  Pass ``fingerprint_col`` to keep
    the fingerprint on the survivors (cluster auditing)."""
    fp = fingerprint_col or "__fp"
    keyed = df.withColumn(fp, doc_fingerprint(text_col))
    w = Window.partitionBy(fp).orderBy(F.col(id_col).asc())
    out = keyed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return out if fingerprint_col else out.drop(fp)


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle -> md5 minhash signature
    -> band -> bucket self-join.  Returns (id_a, id_b) with id_a < id_b.

    The self-join is an equi-join on (band_id, band_sig): identical
    cost profile to a groupBy on the bucket key.  ``max_bucket_size``
    caps pathological buckets (boilerplate/empty docs collapsing onto
    one signature): a bucket of B docs expands to B²/2 pairs, so one
    million-doc bucket at 100 TB stalls its task forever.  Oversized
    buckets are dropped entirely — their members still pair through
    their other (more selective) bands, and genuinely identical docs
    are the exact-dedup stage's job, not LSH's.  The cap costs one
    window count over the banded rows (same shuffle key as the join).

    Cap drops are NOT silent: ``minhash_bucket_stats`` reports
    banded/dropped row and bucket counts for the same configuration —
    run it alongside (or gate the pipeline on it) when auditing a cap.
    (An inline ``Observation`` was tried first, but Spark 4.1 fails to
    surface observed metrics under this plan shape — a distinct over
    the bucket self-join — so the explicit audit query is the
    dependable path.)
    """
    banded = minhash_banded(df, text_col, id_col, num_hashes, bands, shingle_n)
    if max_bucket_size is not None:
        w = Window.partitionBy("band_id", "band_sig")
        banded = (
            banded.withColumn("__bsz", F.count("*").over(w))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def minhash_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The shared LSH banding pipeline: (__id, band_id, band_sig), one
    row per doc per band.

    Explode shingles first: tokenization/shingling runs ONCE per doc
    (an array-expression signature recomputes the O(tokens²) shingle
    array per hash seed), and the groupBy min() aggregation combines
    map-side — shuffle volume is docs x num_hashes, not shingles.
    Hash family: ONE md5 per shingle, split into two 60-bit halves
    (a, b); h_i = (a + i*b) & (2^60-1) — the Kirsch-Mitzenmacher
    construction, 8x fewer digest computations than independent
    seeded hashes, still engine-reproducible.
    """
    rows_per_band = num_hashes // bands
    mask60 = (1 << 60) - 1
    exploded = df.select(F.col(id_col).alias("__id"), F.explode(shingles(text_col, shingle_n)).alias("__sh"))
    hx = exploded.select("__id", F.md5("__sh").alias("__hx"))
    ab = hx.select(
        "__id",
        F.conv(F.substring("__hx", 1, 15), 16, 10).cast("long").alias("__a"),
        F.conv(F.substring("__hx", 17, 15), 16, 10).cast("long").bitwiseOR(F.lit(1)).alias("__b"),
    )
    sig = ab.groupBy("__id").agg(
        F.array(
            *[
                F.min((F.col("__a") + F.lit(i) * F.col("__b")).bitwiseAND(F.lit(mask60)))
                for i in range(num_hashes)
            ]
        ).alias("__sig")
    )
    return sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            F.transform(
                                F.slice("__sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ).alias("band_sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("__id", "band.band_id", "band.band_sig")


def minhash_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 100,
) -> DataFrame:
    """Audit twin of ``minhash_candidate_pairs``'s bucket cap: ONE row
    (banded_rows, dropped_rows, dropped_buckets, max_bucket_rows) for
    the same banding configuration, so cap drops are observable instead
    of silent (ADVICE r4).  Run it alongside the pair query — or gate a
    pipeline on ``dropped_rows`` staying under a budget.

    Cost shape at scale: one groupBy on the bucket key (the same
    shuffle key the pair join uses) then a single-row global aggregate
    of the per-bucket counts — no self-join, no pair explosion.
    """
    buckets = (
        minhash_banded(df, text_col, id_col, num_hashes, bands, shingle_n)
        .groupBy("band_id", "band_sig")
        .agg(F.count("*").alias("__bsz"))
    )
    # every count coalesces to 0: on an EMPTY input frame sum/max are
    # NULL, and a pipeline gating on these columns must not hit a None
    over = F.col("__bsz") > max_bucket_size
    return buckets.agg(
        F.coalesce(F.sum("__bsz"), F.lit(0)).cast("long").alias("banded_rows"),
        F.coalesce(F.sum(F.when(over, F.col("__bsz"))), F.lit(0)).cast("long").alias("dropped_rows"),
        F.count(F.when(over, 1)).cast("long").alias("dropped_buckets"),
        F.coalesce(F.max("__bsz"), F.lit(0)).cast("long").alias("max_bucket_rows"),
    )


def incremental_exact_dedup(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    existing_is_fingerprints: bool = False,
) -> DataFrame:
    """Dedup a NEW batch against an already-curated corpus — the daily
    ingest shape: yesterday's 100 TB corpus is settled; today's crawl
    must drop (a) docs duplicating the existing corpus and (b) its own
    internal dupes, WITHOUT rescanning the settled corpus text.

    Returns the surviving ``incoming`` rows (original columns).

    Scale shape: the existing side reduces to its distinct fingerprint
    set — in a real pipeline that set is persisted once (e.g. a TxTable
    of md5 strings, ~32 bytes/doc vs the documents' kilobytes) and only
    the new batch is ever fingerprinted again; pass it directly with
    ``existing_is_fingerprints=True`` (a one-column ``__fp`` frame).
    Both the keep-first window and the anti-join key on the same md5,
    so the batch is shuffled once and the join is a pure equi anti-join
    (no skew: md5 keys are uniform by construction).
    """
    if existing_is_fingerprints:
        fp_index = existing.select(F.col(existing.columns[0]).alias("__fp")).distinct()
    else:
        fp_index = existing.select(doc_fingerprint(text_col).alias("__fp")).distinct()
    keyed = incoming.withColumn("__fp", doc_fingerprint(text_col))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    batch_unique = (
        keyed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    return batch_unique.join(fp_index, "__fp", "left_anti").drop("__fp")


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: for each corpus doc, how many distinct
    word n-grams it shares with the benchmark/eval set (the standard
    pre-training hygiene pass — train/test overlap inflates evals, so
    contaminated docs are dropped or quarantined before training).

    Returns (id, n_hit_ngrams, contaminated) for EVERY corpus row.

    Scale shape: the benchmark side is eval-set-sized, so its distinct
    shingle set broadcasts; the corpus explodes shingles ONCE and
    probes the broadcast hash map — no corpus shuffle at all until the
    per-doc count (one groupBy on the doc id, map-side combined).  At
    100 TB the cost is the corpus tokenization scan, which a real
    pipeline fuses with the other row-local text stages.
    """
    bench_text = bench_text_col or text_col
    bench = F.broadcast(
        benchmark.select(F.explode(shingles(bench_text, shingle_n)).alias("__sh")).distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("__sh"),
    )
    hits = (
        corpus_sh.join(bench, "__sh")
        .groupBy("__id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )
    return (
        corpus.select(F.col(id_col))
        .join(hits.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_ngrams", F.lit(0)).cast("int").alias("n_hit_ngrams"),
            (F.coalesce("n_hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with exact n-gram Jaccard >= threshold, using
    MinHash+LSH for candidate generation and exact verification on the
    candidates only (the standard two-phase scheme: cheap recall, exact
    precision).  Returns (id_a, id_b, jaccard)."""
    cands = minhash_candidate_pairs(df, text_col, id_col, num_hashes, bands, shingle_n)
    sh = df.select(F.col(id_col).alias("__id"), F.array_distinct(shingles(text_col, shingle_n)).alias("__sh"))
    joined = (
        cands.join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double")
    union = F.size(F.array_union("__sh_a", "__sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.9,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by n-gram CONTAINMENT (Broder's asymmetric
    coefficient): ``|A ∩ B| / min(|A|, |B|)`` — the quote/subset
    detector Jaccard systematically misses.  A document embedded
    verbatim inside a 10x-longer one has Jaccard ~0.1 (union dominated
    by the container) but containment ~1.0; training-data curation
    cares exactly about that shape (boilerplate inclusion, quoted
    articles, truncated re-crawls).

    Same two-phase plan as ``ngram_jaccard_pairs``: MinHash+LSH
    candidates, exact set verification on candidates only — the
    min-side normalization is one extra ``least()`` over the already
    computed set sizes.  Returns (id_a, id_b, containment, jaccard):
    both coefficients ride along so a caller can select the
    "contained but not near-identical" band (containment high, jaccard
    low) without a second pass.  NOTE the recall caveat: LSH bands
    gate on JACCARD collision probability, so extreme container/
    containee length ratios (Jaccard -> 0) escape candidate
    generation; for a dedicated containment sweep, block on a
    prefix/anchor key instead (see q328's prefix-block form)."""
    cands = minhash_candidate_pairs(df, text_col, id_col, num_hashes, bands, shingle_n)
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingles(text_col, shingle_n)).alias("__sh"),
    )
    joined = (
        cands.join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double")
    union = F.size(F.array_union("__sh_a", "__sh_b")).cast("double")
    min_side = F.least(F.size("__sh_a"), F.size("__sh_b")).cast("double")
    return (
        joined.withColumn("containment", F.round(inter / min_side, 4))
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def simhash_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) for every row — semantically identical to the
    ``simhash60`` column expression, but computed as explode → groupBy
    with 60 bit-vote sums: one pass over each token with map-side
    partial aggregation, instead of 60 re-scans of the per-row hash
    array.  Use this form for corpus-scale fingerprinting."""
    from ..functions.text import tokens

    # explode_outer keeps zero-token docs as one null-token row: the
    # null hash contributes null votes, every bit-vote comparison is
    # then null -> otherwise(0), and the doc lands at the empty-text
    # fingerprint (0) WITHOUT the distinct + restore-join (two extra
    # shuffles) the plain-explode form needed
    hashed = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("__t"),
    ).select("__id", F.conv(F.substring(F.md5("__t"), 1, 15), 16, 10).cast("long").alias("__h"))
    votes = hashed.groupBy("__id").agg(
        F.count("*").alias("__n"),
        *[F.sum(F.shiftrightunsigned("__h", b).bitwiseAND(F.lit(1))).alias(f"__v{b}") for b in range(60)],
    )
    fp = None
    for b in range(60):
        bit = F.when(F.col(f"__v{b}") * 2 > F.col("__n"), F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return votes.select(
        F.col("__id").alias(id_col), fp.cast("long").alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: 60-bit fingerprints, candidates share at
    least one of 4 15-bit blocks (pigeonhole: any pair within hamming
    distance 3 collides on >=1 block), verified with bit_count(a^b)."""
    fp = simhash_table(df, text_col, id_col).select(
        F.col(id_col).alias("__id"), F.col("simhash").alias("__fp")
    )
    blocks = fp.select(
        "__id",
        "__fp",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("block_id"), F.shiftrightunsigned("__fp", i * 15).bitwiseAND(F.lit(0x7FFF)).alias("block"))
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("__id", "__fp", "b.block_id", "b.block")
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(b, ["block_id", "block"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__fp").alias("fp_a"),
            F.col("b.__fp").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", hamming).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    bands: int = 4,
    max_exact_rows: int = 20_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= threshold).

    With ``planes`` given, candidates come from hyperplane-LSH bucket
    collisions (scale path); otherwise an exact all-pairs comparison is
    used (only sane for small/filtered inputs — the correctness
    baseline).  The exact path refuses inputs above ``max_exact_rows``
    (guard rail, VERDICT r1 #5: a caller must not default into an n²
    cross join at corpus scale — pass ``planes`` instead; the count it
    costs is noise next to the n² it prevents)."""
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if planes is None:
        n = base.count()
        if n > max_exact_rows:
            raise ValueError(
                f"exact all-pairs path on {n} rows (> max_exact_rows={max_exact_rows}): "
                "pass `planes` for the LSH-bucketed path, or raise max_exact_rows "
                "if the cross join is intentional"
            )
        a = base.toDF("id_a", "__va")
        b = base.toDF("id_b", "__vb")
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        from .similarity import with_hyperplane_sketch

        nbits = len(planes)
        per = nbits // bands
        sk = with_hyperplane_sketch(base, "__v", planes)
        banded = sk.select(
            "__id",
            "__v",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("band_id"), F.substring("__sketch", i * per + 1, per).alias("bits"))
                        for i in range(bands)
                    ]
                )
            ).alias("b"),
        ).select("__id", "__v", "b.band_id", "b.bits")
        cand = (
            banded.alias("a")
            .join(banded.alias("b"), ["band_id", "bits"])
            .filter(F.col("a.__id") < F.col("b.__id"))
            .select(
                F.col("a.__id").alias("id_a"),
                F.col("b.__id").alias("id_b"),
                F.col("a.__v").alias("__va"),
                F.col("b.__v").alias("__vb"),
            )
            .distinct()
        )
    return (
        cand.withColumn("cos", F.round(cosine("__va", "__vb"), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def incremental_embedding_dedup(
    incoming: DataFrame,
    existing: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    bands: int = 4,
) -> DataFrame:
    """Embedding-cosine twin of ``incremental_exact_dedup``: drop every
    incoming vector that near-duplicates (rounded cos >= threshold) any
    EXISTING corpus vector or any LOWER-ID incoming vector, keep the
    rest.  The daily-ingest semantic-dedup pass: yesterday's corpus is
    settled, today's batch must not re-add paraphrase-level copies.

    The keep rule is deliberately non-transitive ("no lower-id match",
    whether or not that lower row itself survived): it needs no
    iterative closure, is expressible in one SQL NOT EXISTS pair (the
    oracle gate), and matches what a pipeline wants — of a mutual-dup
    batch clique, exactly the lowest id survives.

    Scale shape: without ``planes``, the batch side broadcasts against
    the corpus scan (BroadcastNestedLoopJoin — ONE pass over the
    existing corpus, no shuffle of it; sane while the daily batch fits
    a broadcast, the same bound q18's exact top-k guards).  With
    ``planes``, both sides band their hyperplane sketches and the probe
    becomes an equi-join on (band, bits) — the 100 TB path, identical
    bucketing to ``embedding_neardup_pairs``.

    Either way ``existing`` only needs ``vec_col`` — its ids never
    reach the output, so both paths share one symmetric contract.
    """
    inc = incoming.select(F.col(id_col).alias("__iid"), F.col(vec_col).alias("__iv"))
    ex = existing.select(F.col(vec_col).alias("__ev"))
    sim = F.round(cosine("__iv", "__ev"), 4) >= threshold
    if planes is None:
        corpus_hits = (
            ex.join(F.broadcast(inc), sim, "inner").select("__iid").distinct()
        )
        a = inc.toDF("__ia", "__va")
        b = inc.toDF("__ib", "__vb")
        batch_sim = F.round(cosine("__va", "__vb"), 4) >= threshold
        batch_hits = (
            a.join(b, (F.col("__ia") < F.col("__ib")) & batch_sim)
            .select(F.col("__ib").alias("__iid"))
            .distinct()
        )
    else:
        from .similarity import with_hyperplane_sketch

        per = len(planes) // bands

        def banded(df, idc, vecc):
            # idc=None: the existing side's ids are never read (only
            # incoming ids reach the output), so the corpus frame only
            # needs the vector column — symmetric with the exact path
            idx = F.col(idc) if idc is not None else F.lit(0)
            sk = with_hyperplane_sketch(
                df.select(idx.alias("__id"), F.col(vecc).alias("__v")), "__v", planes
            )
            return sk.select(
                "__id",
                "__v",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("band_id"),
                                F.substring("__sketch", i * per + 1, per).alias("bits"),
                            )
                            for i in range(bands)
                        ]
                    )
                ).alias("b"),
            ).select("__id", "__v", "b.band_id", "b.bits")

        inc_b = banded(incoming, id_col, vec_col)
        ex_b = banded(existing, None, vec_col)
        corpus_hits = (
            inc_b.alias("i")
            .join(ex_b.alias("e"), ["band_id", "bits"])
            .filter(F.round(cosine("i.__v", "e.__v"), 4) >= threshold)
            .select(F.col("i.__id").alias("__iid"))
            .distinct()
        )
        batch_hits = (
            inc_b.alias("a")
            .join(inc_b.alias("b"), ["band_id", "bits"])
            .filter(
                (F.col("a.__id") < F.col("b.__id"))
                & (F.round(cosine("a.__v", "b.__v"), 4) >= threshold)
            )
            .select(F.col("b.__id").alias("__iid"))
            .distinct()
        )
    dropped = corpus_hits.union(batch_hits).distinct()
    return incoming.join(
        dropped.withColumnRenamed("__iid", id_col), id_col, "left_anti"
    )


def _bloom_positions(h1, h2, num_bits: int, num_hashes: int):
    """Kirsch-Mitzenmacher position family over two 60-bit md5 halves
    (h1/h2 as numpy int64 arrays): pos_i = (h1 + i*h2) mod m.  Two real
    hashes derive any k without extra digest work — the same family the
    MinHash signatures use."""
    import numpy as np

    m = np.int64(num_bits)
    return [((h1 + np.int64(i) * h2) % m).astype(np.int64) for i in range(num_hashes)]


def _fp_halves(fps):
    """Split md5 hex fingerprints into two 60-bit integer halves."""
    import numpy as np

    h1 = np.fromiter((int(s[:15], 16) for s in fps), dtype=np.int64, count=len(fps))
    h2 = np.fromiter((int(s[15:30], 16) | 1 for s in fps), dtype=np.int64, count=len(fps))
    return h1, h2


def build_fingerprint_bloom(
    fp_df: DataFrame,
    fp_col: str = "__fp",
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
):
    """Build a Bloom filter (numpy uint8 bitmap) over a fingerprint
    column — the broadcastable membership summary of a settled corpus
    index (md5 hex strings, as produced by ``doc_fingerprint``).

    Scale shape: each partition folds its rows into a local bitmap
    inside one Arrow pass (``mapInPandas``), the driver ORs the
    partition bitmaps — a k-bounded collect exactly like the k-means
    centroid reduce, num_partitions × m/8 bytes, never row data.  At
    10^9 index entries use ~10 bits/entry (m = 2^33 ≈ 1 GiB) for ~1 %
    false positives; past that, shard the bloom per corpus partition
    (date/source) rather than growing m beyond broadcast range.

    Deterministic: positions derive from the md5 hex itself, so two
    engines building from the same fingerprints get identical bitmaps.
    """
    import numpy as np

    if num_bits % 8:
        raise ValueError(f"num_bits must be a multiple of 8, got {num_bits}")

    n_bytes = num_bits // 8
    out_schema = "bloom binary"

    def fold(batches):
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            fps = pdf.iloc[:, 0].tolist()
            if not fps:
                continue
            h1, h2 = _fp_halves(fps)
            for pos in _bloom_positions(h1, h2, num_bits, num_hashes):
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"bloom": [bits.tobytes()]})

    parts = (
        fp_df.select(F.col(fp_col)).na.drop().mapInPandas(fold, out_schema).collect()
    )
    bits = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        bits |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return bits


def bloom_incremental_dedup(
    incoming: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    existing_is_fingerprints: bool = False,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
    prebuilt_bits=None,
) -> DataFrame:
    """`incremental_exact_dedup` with a Bloom pre-filter: result-identical
    (no false negatives — every true duplicate reaches the exact join;
    false positives only ride along and are removed there), but the
    settled index is summarized into a broadcast bitmap so the common
    case — a daily crawl batch that is MOSTLY NEW — never shuffles at
    all against the corpus:

      1. bloom MISS rows are definitely new → kept with zero join work;
      2. bloom HIT fingerprints (true dups + ~fpp of the batch) are few,
         so they broadcast; the index is probed by a broadcast SEMI join
         (the 100 TB index side scans in place, never shuffles);
      3. the surviving hit rows anti-join the (small, broadcast) proven
         dup set.

    Contrast: the plain anti-join in `incremental_exact_dedup` shuffles
    BOTH sides on the fingerprint.  Use that one when the batch overlaps
    the corpus heavily (hit set too big to broadcast); this one when
    overlap is the exception, which is the steady state after the first
    few days of a crawl pipeline.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if existing_is_fingerprints:
        fp_index = existing.select(F.col(existing.columns[0]).alias("__fp")).distinct()
    else:
        fp_index = existing.select(doc_fingerprint(text_col).alias("__fp")).distinct()

    # prebuilt_bits: a bitmap already covering `existing` (e.g. the
    # BloomFingerprintIndex sidecar) — skips the per-call build scan.
    # Caller contract: it MUST cover every existing fingerprint, or the
    # no-false-negative guarantee (and the result) breaks.  Pass a
    # pyspark Broadcast (of the bitmap BYTES) to also reuse one
    # broadcast across calls — a streaming loop otherwise creates one
    # per micro-batch and nothing ever destroys them.
    from pyspark import Broadcast

    if isinstance(prebuilt_bits, Broadcast):
        bc = prebuilt_bits
        if len(bc.value) * 8 != num_bits:
            raise ValueError(
                f"prebuilt broadcast covers {len(bc.value) * 8} bits, expected {num_bits}"
            )
    else:
        if prebuilt_bits is not None:
            bits = prebuilt_bits
            if bits.size * 8 != num_bits:
                raise ValueError(
                    f"prebuilt_bits covers {bits.size * 8} bits, expected {num_bits}"
                )
        else:
            bits = build_fingerprint_bloom(fp_index, "__fp", num_bits, num_hashes)
        bc = incoming.sparkSession.sparkContext.broadcast(bits.tobytes())

    @pandas_udf("boolean")
    def bloom_hit(fps: pd.Series) -> pd.Series:
        local = np.frombuffer(bc.value, dtype=np.uint8)
        if fps.empty:
            return pd.Series([], dtype=bool)
        # NULL fingerprints (NULL text) are definite MISSES: the index
        # never stores NULL, and the exact twin keeps NULL keys (NULL
        # never equi-matches an anti-join) — mask them out before the
        # hash math, which needs real hex strings.
        mask = fps.notna().to_numpy()
        out = np.zeros(len(fps), dtype=bool)
        vals = fps[mask].tolist()
        if vals:
            h1, h2 = _fp_halves(vals)
            hit = np.ones(len(vals), dtype=bool)
            for pos in _bloom_positions(h1, h2, num_bits, num_hashes):
                hit &= (local[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
            out[mask] = hit
        return pd.Series(out)

    keyed = incoming.withColumn("__fp", doc_fingerprint(text_col))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    # lazy localCheckpoint, not persist(): the miss/candidate branches
    # and the final union reference this subplan several times (up to 7
    # Python operator instances without materialization), but a
    # persist() is never unpersisted by any caller — a streaming loop
    # would leak one CacheManager entry per micro-batch, while
    # checkpoint blocks are freed by the ContextCleaner when the frame
    # goes out of scope.  eager=False keeps plan CONSTRUCTION job-free
    # (plan tests/audits build this without running anything); the
    # checkpoint materializes once at the first action.  Tradeoff:
    # blocks are executor-local and unreplicated, so an executor loss
    # mid-action fails that action — in the streaming loop the
    # foreachBatch retry recomputes the batch from source, which is the
    # standard recovery there.
    batch_unique = (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("__hit", bloom_hit(F.col("__fp")))
        .localCheckpoint(eager=False)
    )
    misses = batch_unique.filter(~F.col("__hit"))
    cand = batch_unique.filter(F.col("__hit"))
    dup_fps = fp_index.join(
        F.broadcast(cand.select("__fp").distinct()), "__fp", "semi"
    )
    survivors = cand.join(F.broadcast(dup_fps), "__fp", "left_anti")
    return misses.unionByName(survivors).drop("__fp", "__hit")


def semantic_prune(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    threshold: float = 0.95,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, find
    near-duplicate pairs ONLY within a cluster, keep the minimum id
    of each near-dup group plus every unpaired row.

    This is the scale trick the paper is about: clustering caps the
    quadratic term — candidate pairs are Σ|cluster|² instead of N²,
    and the cluster join is an equi-join on the assigned cell, so the
    shuffle key is the cell id.  Composed entirely from existing
    parts: ``kmeans_fit`` (deterministic seeding) →
    ``with_nearest_cells`` (broadcast-centroid Arrow matmul) →
    within-cell pair join (rounded cosine >= threshold, the q27
    convention) → ``dedup_by_clusters`` (min-label survivors, so
    transitive dup chains inside a cluster collapse to one keeper).

    Near-dup pairs SPLIT across two clusters are missed — the
    documented SemDeDup recall trade; raise k for tighter clusters
    and fewer in-cell comparisons, or lower it for higher recall.
    Pass precomputed ``centroids`` to skip training (e.g. reuse the
    IVF quantizer's)."""
    from .clusters import dedup_by_clusters
    from .kmeans import kmeans_fit, with_nearest_cells

    if centroids is None:
        centroids = kmeans_fit(df, vec_col, id_col, k=k)
    cells = with_nearest_cells(
        df.select(F.col(id_col), F.col(vec_col)), vec_col, centroids, nprobe=1
    ).select(
        F.col(id_col), F.col(vec_col), F.element_at(F.col("__cells"), 1).alias("__cell")
    )
    a = cells.select(
        F.col("__cell"), F.col(id_col).alias("__ia"), F.col(vec_col).alias("__va")
    )
    b = cells.select(
        F.col("__cell"), F.col(id_col).alias("__ib"), F.col(vec_col).alias("__vb")
    )
    pairs = (
        a.join(b, "__cell")
        .filter(F.col("__ia") < F.col("__ib"))
        .filter(F.round(cosine("__va", "__vb"), 4) >= threshold)
        .select(F.col("__ia").alias("id_a"), F.col("__ib").alias("id_b"))
    )
    return dedup_by_clusters(df, pairs, id_col=id_col)


# ---------------------------------------------------------------------------
# EXACT substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the ExactSubstr variant, re-expressed
# relationally: the paper's suffix array finds substrings of length >=
# L occurring twice anywhere in the corpus; an occurrence happens iff
# some length-L gram occurs twice, so L-grams at every character
# position + a global count + an islands merge recover exactly the
# maximal duplicated spans, with no suffix array and no pair join.)
# ---------------------------------------------------------------------------

def dup_substring_spans(
    docs: DataFrame,
    min_len: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = False,
) -> DataFrame:
    """All MAXIMAL character spans of length >= ``min_len`` whose text
    occurs more than once in the corpus (across documents OR repeated
    inside one) — the exact-substring counterpart to the approximate
    winnowing family (`winnow.winnow_overlap_pairs`).

    Shape: the gram frame is |text| rows (one per char position —
    same cost class as winnow's posexplode); duplicated grams come
    from ONE groupBy count with map-side combine (never a pair join —
    a gram occurring a million times costs one counter, not 10^12
    pairs); marked positions are a LEFT SEMI join against the
    dup-gram set; the islands merge is a per-document window.
    Nothing quadratic, nothing collected.

    ``keep_first=True`` switches to the deployment-preferred Lee et
    al. variant: the lexicographically FIRST occurrence (by (id, pos))
    of each duplicated gram is exempt from marking, so one canonical
    copy of every duplicated string survives the strip instead of the
    text vanishing from all its locations.  A doc's span then means
    "this text exists earlier in the corpus".

    Returns (id_col, span_start, span_len), span_start 1-based,
    spans disjoint and separated by >= 1 kept char (adjacent islands
    merge)."""
    if min_len < 2:
        raise ValueError(f"min_len={min_len} must be >= 2")
    from .scale import widen_if_narrow

    n = F.length(F.col(text_col))
    grams = (
        # the char-position explode multiplies rows by |text|; widen a
        # narrow (small-file) scan first so the expansion + substring
        # slicing parallelize instead of running inside the lone scan
        # task (no-op on an already-wide corpus scan — r17)
        widen_if_narrow(docs, [id_col]).filter(n >= min_len)
        .select(
            F.col(id_col).alias("__d"),
            F.col(text_col).alias("__t"),
            F.explode(F.sequence(F.lit(1), n - min_len + 1)).alias("__p"),
        )
        .select("__d", "__p", F.expr(f"substring(__t, __p, {min_len})").alias("__g"))
    )
    # duplicated-gram detection as a COUNT window over one gram
    # derivation — a groupBy + semi-join back would re-derive (and
    # re-scan) the corpus-sized gram frame (the winnow double-tokenize
    # lesson, VERDICT r16 #2); the window shuffles on __g exactly once
    if keep_first:
        # "duplicated and not the first occurrence" is exactly
        # row_number > 1 over (id, pos) within the gram — same single
        # __g shuffle
        rn = F.row_number().over(
            Window.partitionBy("__g").orderBy("__d", "__p")
        )
        marked = (
            grams.withColumn("__rn", rn)
            .filter(F.col("__rn") > 1)
            .select("__d", "__p")
        )
    else:
        marked = (
            grams.withColumn(
                "__c", F.count(F.lit(1)).over(Window.partitionBy("__g"))
            )
            .filter(F.col("__c") > 1)
            .select("__d", "__p")
        )
    w = Window.partitionBy("__d").orderBy("__p")
    prev_end = F.max(F.col("__p") + min_len).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(prev_end.isNull() | (F.col("__p") > prev_end), 1).otherwise(0)
    return (
        marked.withColumn("__grp", F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
        .groupBy("__d", "__grp")
        .agg(
            F.min("__p").alias("span_start"),
            (F.max("__p") + min_len - F.min("__p")).cast("int").alias("span_len"),
        )
        .select(F.col("__d").alias(id_col), "span_start", "span_len")
    )


def strip_dup_substrings(
    docs: DataFrame,
    min_len: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = False,
) -> DataFrame:
    """Lee et al.'s dedup step applied: remove every
    :func:`dup_substring_spans` span from the text, keeping the
    untouched segments in order.  Every input document comes back
    (untouched ones with ``n_dup_spans = 0``), with the audit columns
    a curation pipeline logs.

    The reassembly folds each document's sorted span array through
    ``F.aggregate`` with a (cursor, text) struct accumulator — all
    JVM-side codegen; spans per document are bounded by
    |text|/min_len so the array never approaches driver scale.

    Returns (id_col, orig_len, n_dup_spans, chars_removed, clean_text)."""
    spans = dup_substring_spans(docs, min_len, id_col, text_col, keep_first)
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_len"))
        ).alias("__spans")
    )
    joined = docs.select(
        id_col, F.col(text_col).alias("__t"), F.length(text_col).alias("orig_len")
    ).join(per_doc, id_col, "left")
    acc0 = F.struct(
        F.lit(1).alias("cur"), F.lit("").cast("string").alias("txt")
    )
    folded = F.aggregate(
        F.coalesce("__spans", F.array()),
        acc0,
        lambda a, s: F.struct(
            (s["span_start"] + s["span_len"]).alias("cur"),
            F.concat(
                a["txt"],
                F.expr("__t").substr(a["cur"], s["span_start"] - a["cur"]),
            ).alias("txt"),
        ),
        lambda a: F.concat(a["txt"], F.expr("__t").substr(a["cur"], F.col("orig_len") - a["cur"] + 1)),
    )
    return joined.select(
        id_col,
        "orig_len",
        F.coalesce(F.size("__spans"), F.lit(0)).cast("int").alias("n_dup_spans"),
        F.coalesce(
            F.aggregate(
                "__spans", F.lit(0), lambda a, s: a + s["span_len"]
            ),
            F.lit(0),
        ).cast("int").alias("chars_removed"),
        folded.alias("clean_text"),
    )
