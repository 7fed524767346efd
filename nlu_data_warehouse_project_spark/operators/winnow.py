"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03
— public; the MOSS plagiarism-detector algorithm).

A fourth near-dup family next to MinHash (set resemblance), SimHash
(weighted cosine) and n-gram containment: winnowing selects a
POSITION-AWARE fingerprint subset with a formal guarantee — every
window of ``w`` consecutive k-gram hashes contributes at least one
selected hash, so any substring shared between two documents of
length >= w + k - 1 yields a shared selected fingerprint.  That makes
it the right primitive for PLAGIARISM/quote detection (the match is a
contiguous passage, not a bag of shingles) and for locating WHERE the
overlap is (fingerprints carry positions).

Selection (robust winnowing): per window keep the MINIMUM hash,
ties broken toward the RIGHTMOST position.  Spelled directly as a
windowed argmin over a packed (hash, reversed-position) key —
``min(h * 2^23 + (2^23 - 1 - pos))`` over ``ROWS BETWEEN CURRENT ROW
AND w-1 FOLLOWING`` — which DuckDB runs verbatim, so the fingerprint
set (and everything computed from it) is hash-gateable cross-engine:
the KMV discipline applied to local fingerprinting.  The k-gram hash
is the shared md5 recipe truncated to 40 bits (10 hex chars) so the
packed key fits a BIGINT with 23 position bits (documents up to ~8.3M
grams; validated); 40-bit fingerprint collisions are immaterial
because the pairing join verifies on the gram CONTENT.

Scale shape: one posexplode to n-k+1 grams per doc (the tokenize cost
every text operator pays), one per-doc bounded window pass, and the
selected frame is a ~2/(w+1) fraction of the grams.  Candidate
pairing is a hash equi-join on (fingerprint, gram) — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_POS_BITS = 23  # packed-key position field; docs up to 2^23-1 grams


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id, pos, fingerprint, gram) — robust-winnowing selection over
    character k-gram hashes of ``text_col``.

    GUARANTEE (SIGMOD'03): each of the n-w+1 full windows selects its
    rightmost-minimal hash, so every w consecutive grams contribute a
    fingerprint and two documents sharing a substring of length
    >= w + k - 1 share one.  Documents shorter than w grams (but
    >= k chars) degenerate to one window over all their grams.

    One windowed argmin per gram row: pack (hash, reversed pos) into
    a BIGINT so ``min`` alone picks min-hash-then-rightmost; distinct
    the per-window winners.  No self-join, no whole-doc sort beyond
    the per-document partition."""
    if k < 1 or w < 1:
        raise ValueError(f"k={k} (>= 1) / w={w} (>= 1)")
    pos_cap = (1 << _POS_BITS) - 1
    # the per-doc window below needs hashpartitioning(id) anyway; force
    # that exchange HERE, on the raw (id, text) rows, so the
    # posexplode + per-gram md5 run AFTER the shuffle: the exchange
    # moves ~1/k-gram-factor fewer bytes (text once instead of every
    # overlapping gram row) and the gram hashing parallelizes even when
    # the corpus arrives as one small file / one scan task (profiled:
    # a single 594 KB parquet file serialized the whole tokenize).
    # repartition-by-NUM is AQE-coalesce-exempt — by-col would be
    # coalesced right back to one partition at this input size.
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    grams = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .filter(F.col("__t").isNotNull() & (F.length("__t") >= k))
        # the per-doc gram count is length - k + 1 BY CONSTRUCTION of
        # the sequence below — carry it from the pre-explode row instead
        # of a count() window over the exploded frame, which cost a
        # second whole-partition Window pass over every gram row
        # (r17 optimization; bit-identical filter input)
        .withColumn("__n", (F.length("__t") - F.lit(k) + 1).cast("int"))
        .repartition(n_parts, F.col("id"))
        .select(
            "id",
            "__n",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, length(__t) - {k} + 1), "
                    f"i -> substring(__t, i, {k}))"
                )
            ).alias("pos", "__g"),
        )
        .withColumn(
            "__h",
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"wn{k}:"), F.col("__g"))), 1, 10),
                16, 10,
            ).cast("long"),
        )
    )
    frame = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    # loud guard instead of silent key corruption past the pos field
    guarded_pos = F.when(
        F.col("pos") > pos_cap,
        F.expr(f"raise_error('winnowing: document exceeds 2^{_POS_BITS} grams')"),
    ).otherwise(F.col("pos"))
    key = F.col("__h") * (1 << _POS_BITS) + (pos_cap - guarded_pos)
    # carry the gram CONTENT through the argmin itself: min over
    # struct(key, gram) compares the packed key first, and the key is
    # unique within a doc partition (distinct pos ⇒ distinct low bits),
    # so the winner is identical to min(key) and its gram rides along.
    # This replaces the former join-back to the gram frame, which
    # re-derived the whole posexplode (a second corpus tokenize —
    # VERDICT r16 #2) and needed merge hints to stop AQE electing a
    # corpus-sized broadcast.  One gram scan, zero joins.
    return (
        grams
        .withColumn(
            "__win",
            F.min(F.struct(key.alias("k"), F.col("__g").alias("g"))).over(frame),
        )
        # full windows only (start pos <= n-w); a doc shorter than w
        # grams keeps its single clipped window at pos 0
        .filter(F.col("pos") <= F.greatest(F.col("__n") - w, F.lit(0)))
        .select(
            "id",
            (F.lit(pos_cap) - F.col("__win.k") % (1 << _POS_BITS)).alias("pos"),
            # integer div, NOT `/`: long / long is a DOUBLE in Spark
            # and 63-bit keys lose their low bits in a 53-bit mantissa
            F.expr(f"__win.k div {1 << _POS_BITS}").cast("long")
            .alias("fingerprint"),
            F.col("__win.g").alias("gram"),
        )
        .distinct()
    )


def _capped_fp(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    w: int,
    max_df: int | None,
) -> DataFrame:
    """Distinct (id, fingerprint, gram) winnowed fingerprints with the
    ``max_df`` boilerplate cap applied, cut with a lazy localCheckpoint
    (repo convention for frames consumed more than once — see
    dedup.py/bpe.py): the frame feeds the df-count, the semi filter
    and BOTH sides of the pair join; without the cut Spark re-derives
    the posexplode+window subtree 4x (the r16 double-tokenize nit,
    one level up)."""
    fp = (
        winnow_fingerprints(df, text_col, id_col, k=k, w=w)
        .select("id", "fingerprint", "gram")
        .distinct()
        .localCheckpoint(eager=False)
    )
    if max_df is not None:
        rare = (
            fp.groupBy("fingerprint", "gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("fingerprint", "gram")
        )
        # rare is corpus-sized (most fingerprints are rare): sort-merge,
        # never broadcast (30x stress: auto-broadcast OOMs the driver)
        fp = (
            fp.hint("merge").join(rare, ["fingerprint", "gram"], "left_semi")
            # second cut: the filtered frame is itself read twice below
            .localCheckpoint(eager=False)
        )
    return fp


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Unordered document pairs sharing >= ``min_shared`` winnowed
    fingerprints WITH matching gram content (the equi-join verifies on
    the gram itself, so a 40-bit hash collision can never mint a
    pair).  Returns (a_id, b_id, n_shared) — the MOSS-style passage-
    overlap report; by the winnowing guarantee any pair sharing a
    passage of length >= w + k - 1 appears at min_shared=1.

    Shape: equi-join on (fingerprint, gram); bucket sizes are per-gram
    document frequency — boilerplate grams shared corpus-wide explode
    ANY local-fingerprint scheme, so ``max_df`` applies the standard
    stopword cap: fingerprints selected in more than ``max_df``
    documents are dropped BEFORE pairing (MOSS does exactly this with
    its shared-threshold `-m` flag).  The guarantee then reads: any
    pair sharing a NON-boilerplate passage of length >= w + k - 1
    appears at min_shared=1."""
    fp = _capped_fp(df, text_col, id_col, k, w, max_df)
    right = fp.select(F.col("id").alias("__id_r"), "fingerprint", "gram")
    return (
        fp.hint("merge").join(right, ["fingerprint", "gram"])
        .filter(F.col("id") < F.col("__id_r"))
        .groupBy(F.col("id").alias("a_id"), F.col("__id_r").alias("b_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_match_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """The MOSS report itself: for every fingerprint two documents
    share, WHERE it sits in each — (a_id, b_id, a_pos, b_pos, gram).
    This is what winnowing buys over the bag-model families: the
    match is localized, so a reviewer can open both documents at the
    byte offsets and read the copied passage.  Positions are 0-based
    gram offsets (byte offsets of the k-gram start).  Same
    (fingerprint, gram) equi-join and ``max_df`` boilerplate cap as
    ``winnow_overlap_pairs``."""
    # same multi-consumer cut as winnow_overlap_pairs
    fp = winnow_fingerprints(df, text_col, id_col, k=k, w=w).select(
        "id", "pos", "fingerprint", "gram"
    ).distinct().localCheckpoint(eager=False)
    if max_df is not None:
        rare = (
            fp.select("id", "fingerprint", "gram").distinct()
            .groupBy("fingerprint", "gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("fingerprint", "gram")
        )
        fp = (
            fp.hint("merge").join(rare, ["fingerprint", "gram"], "left_semi")
            .localCheckpoint(eager=False)
        )
    right = fp.select(
        F.col("id").alias("__id_r"), F.col("pos").alias("b_pos"),
        "fingerprint", "gram",
    )
    return (
        fp.hint("merge").join(right, ["fingerprint", "gram"])
        .filter(F.col("id") < F.col("__id_r"))
        .select(
            F.col("id").alias("a_id"), F.col("__id_r").alias("b_id"),
            F.col("pos").alias("a_pos"), "b_pos", "gram",
        )
    )


def winnow_containment(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
    wholesale: float = 0.8,
    partial: float = 0.2,
) -> DataFrame:
    """MOSS's end report: rank each overlapping pair by COVERAGE
    FRACTION — shared fingerprints over each document's own
    (post-``max_df``) fingerprint count — and call the verdict:
    ``coverage_a`` near 1 means document a's fingerprints are almost
    all shared, i.e. a is CONTAINED in b (wholesale copy, in either
    direction), while two long documents sharing one quoted paragraph
    score high ``n_shared`` but low coverage on both sides.  Verdict =
    'wholesale' when max(coverage_a, coverage_b) >= ``wholesale``,
    'partial' when >= ``partial``, else 'incidental' — the
    quote-vs-wholesale-copy triage a curation pipeline acts on
    (drop the contained doc vs keep both).

    Coverage is DECIMAL(25,6) end to end (the `_dec` discipline) and
    thresholds compare in decimal, so the verdict strings — not just
    the ratios — are reproducible cross-engine.  Returns (a_id, b_id,
    n_shared, nf_a, nf_b, coverage_a, coverage_b, verdict).  Shape on
    top of ``winnow_overlap_pairs``: one per-doc count over the capped
    fingerprint frame plus two pair-keyed joins — nothing re-tokenizes."""
    fp = _capped_fp(df, text_col, id_col, k, w, max_df)
    nf = fp.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("__nf"))
    right = fp.select(F.col("id").alias("__id_r"), "fingerprint", "gram")
    pairs = (
        fp.hint("merge").join(right, ["fingerprint", "gram"])
        .filter(F.col("id") < F.col("__id_r"))
        .groupBy(F.col("id").alias("a_id"), F.col("__id_r").alias("b_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )

    def _dec(c):
        return c.cast("decimal(25,6)")

    # per-doc counts are corpus-sized (one row per doc): sort-merge,
    # same no-corpus-broadcast rule as the pair join
    scored = (
        pairs.hint("merge")
        .join(nf.select(F.col("id").alias("a_id"), F.col("__nf").alias("nf_a")), "a_id")
        .hint("merge")
        .join(nf.select(F.col("id").alias("b_id"), F.col("__nf").alias("nf_b")), "b_id")
        .withColumn(
            "coverage_a", (_dec(F.col("n_shared")) / _dec(F.col("nf_a"))).cast("decimal(25,6)")
        )
        .withColumn(
            "coverage_b", (_dec(F.col("n_shared")) / _dec(F.col("nf_b"))).cast("decimal(25,6)")
        )
    )
    top = F.greatest(F.col("coverage_a"), F.col("coverage_b"))
    return scored.select(
        "a_id", "b_id", "n_shared", "nf_a", "nf_b", "coverage_a", "coverage_b",
        F.when(top >= F.lit(str(wholesale)).cast("decimal(25,6)"), F.lit("wholesale"))
        .when(top >= F.lit(str(partial)).cast("decimal(25,6)"), F.lit("partial"))
        .otherwise(F.lit("incidental"))
        .alias("verdict"),
    )


def winnow_overlap_incremental(
    standing_fp: DataFrame,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Incremental passage overlap: the pairs of
    ``winnow_overlap_pairs(standing ∪ new)`` that TOUCH the new batch,
    computed WITHOUT re-fingerprinting the standing corpus — the daily
    ingest shape every other near-dup family here already has (Bloom
    exact, LSH-probe MinHash, prefix-index ER).

    ``standing_fp`` is the persisted fingerprint frame — exactly the
    distinct (id, fingerprint, gram) rows ``winnow_fingerprints``
    produced over the standing corpus, UNCAPPED (the ``max_df``
    boilerplate cap depends on document frequency, which changes as
    the corpus grows, so it is re-applied here over the union: the
    standing side's df comes from the persisted frame itself — a
    groupBy, not a re-tokenize).  PRECONDITION: standing and new id
    sets are disjoint (new docs are new).

    Exactly-equal-to-batch claim: new-new pairs from the batch's own
    self-join, new-standing pairs from the batch-vs-standing equi-join
    on (fingerprint, gram); standing-standing pairs are by definition
    not touched by the batch.  The union-df cap matches the batch
    run's cap verbatim, so the result is the batch result filtered to
    pairs with at least one new id (the equivalence property test's
    gate).  Returns (a_id, b_id, n_shared) with a_id < b_id."""
    std = standing_fp.select("id", "fingerprint", "gram")
    new_fp = (
        winnow_fingerprints(new_docs, text_col, id_col, k=k, w=w)
        .select("id", "fingerprint", "gram")
        .distinct()
        .localCheckpoint(eager=False)
    )
    if max_df is not None:
        # document frequency over the UNION corpus: ids are disjoint so
        # a plain union of the two per-doc frames counts each doc once
        rare = (
            std.unionByName(new_fp)
            .groupBy("fingerprint", "gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("fingerprint", "gram")
        )
        new_fp = (
            new_fp.hint("merge").join(rare, ["fingerprint", "gram"], "left_semi")
            .localCheckpoint(eager=False)
        )
        # the standing side stays a lazy scan-plus-semi: it reads the
        # persisted frame (cheap columnar scan), never the corpus text
        std = std.hint("merge").join(rare, ["fingerprint", "gram"], "left_semi")
    new_r = new_fp.select(F.col("id").alias("__id_r"), "fingerprint", "gram")
    std_r = std.select(F.col("id").alias("__id_r"), "fingerprint", "gram")
    nn = (
        new_fp.hint("merge").join(new_r, ["fingerprint", "gram"])
        .filter(F.col("id") < F.col("__id_r"))
        .select(F.col("id").alias("a_id"), F.col("__id_r").alias("b_id"))
    )
    ns = (
        new_fp.hint("merge").join(std_r, ["fingerprint", "gram"])
        .select(
            F.least("id", "__id_r").alias("a_id"),
            F.greatest("id", "__id_r").alias("b_id"),
        )
    )
    return (
        nn.unionByName(ns)
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
