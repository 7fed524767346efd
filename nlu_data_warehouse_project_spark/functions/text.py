"""Text-analysis column expressions for large-scale training-data
pipelines (BASELINE.json north star: token counting, quality scoring,
language-ID, fingerprinting over the ``documents`` table).

Everything here is built-in-function composition (split / regexp /
higher-order array functions) — JVM-side, whole-stage-codegen'd, no
Python in the hot path.  Each expression has a deliberately
SQL-expressible definition so the DuckDB oracle can mirror it
verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal per-language stopword lists for the n-gram/stopword heuristic
# language identifier (public common-word lists, truncated)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty tokens dropped."""
    return F.filter(F.split(F.trim(_c(col)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: alphanumeric runs and single punctuation
    marks each count as one token (RE2-compatible pattern — no
    lookarounds — so independent engines can mirror it exactly)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(r"[\p{L}\p{N}]+|[^\p{L}\p{N}\s]"), F.lit(0)))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space —
    a standard quality-scoring signal."""
    c = _c(col)
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_fraction(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(F.lower(_c(col)))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards reasonable length,
    low punctuation noise, presence of stopwords (fluent prose)."""
    n = token_count(col)
    length_ok = F.when((n >= 10) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    low_punct = F.when(punct_ratio(col) < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    has_stop = F.when(stopword_fraction(col) > 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return (length_ok + low_punct + has_stop) / F.lit(3.0)


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language identifier: the language whose stopword
    list hits the most tokens; 'und' (undetermined) when no list hits.
    Ties break by language code order (deterministic)."""
    toks = tokens(F.lower(_c(col)))

    def _membership(words: list[str]):
        return lambda t: t.isin(*words)

    scores = [
        F.struct(
            F.size(F.filter(toks, _membership(words))).alias("score"),
            F.lit(code).alias("lang"),
        )
        for code, words in sorted(STOPWORDS.items())
    ]
    # array_max on (score, lang) structs: lexicographic -> highest score,
    # then highest lang code; flip lang ordering by sorting desc first
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) — the near-dup unit for
    MinHash / Jaccard.  Documents shorter than n tokens yield the whole
    text as a single shingle."""
    toks = tokens(_c(col))
    # O(tokens) construction: zip n shifted slices instead of taking a
    # per-position slice (which is O(tokens) per shingle -> O(tokens²)
    # per document, the dominant cost at corpus scale)
    m = F.size(toks)
    win = m - (n - 1)
    zipped = F.slice(toks, 1, win)
    for k in range(1, n):
        zipped = F.zip_with(zipped, F.slice(toks, 1 + k, win), lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(m >= n, zipped).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(col: Column | str, num_hashes: int = 8, n: int = 3) -> Column:
    """MD5-based MinHash signature: for seed i, min over shingles of
    md5(i:shingle).  MD5 (not Spark's murmur hash) so independent
    engines can reproduce signatures bit-for-bit."""
    sh = shingles(col, n)

    # NB: the lambda must take exactly one parameter — with two,
    # F.transform binds the second to the array index
    def _hasher(i: int):
        prefix = f"{i}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    sigs = [F.array_min(F.transform(sh, _hasher(i))) for i in range(num_hashes)]
    return F.array(*sigs)


def doc_fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (the exact-dedup key — normalization makes trivially-reformatted
    copies collide)."""
    return F.md5(F.concat_ws(" ", tokens(F.lower(_c(col)))))


def simhash60(col: Column | str) -> Column:
    """60-bit SimHash over whitespace tokens (60 = 15 hex chars of md5,
    the widest slice that fits a signed long via ``conv``; blocks split
    evenly into 4 x 15 bits for the LSH pigeonhole).

    Per token: take the first 15 hex chars of md5 as a 60-bit integer;
    for each bit, vote +1/-1; fingerprint bit = sign of the vote.
    Near-duplicate docs differ in few bits (compare with
    ``bit_count(a ^ b)``).  Pure higher-order-function expression.
    """
    toks = tokens(F.lower(_c(col)))
    hashes = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    # vote per bit: count of tokens with bit set vs total
    total = F.size(hashes)
    bits = [
        F.when(
            F.size(F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << b)) != 0)) * 2 > total,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
        for b in range(60)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1 — the public
# rule-based pre-training filter).  Each signal is a pure column
# expression (JVM-side, whole-stage codegen); the composite gate ANDs
# the published thresholds.  RE2-safe patterns so an independent engine
# mirrors every signal exactly.

GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def mean_word_length(col: Column | str) -> Column:
    """Mean token length in characters (0.0 for empty docs)."""
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def alpha_word_fraction(col: Column | str) -> Column:
    """Fraction of tokens containing at least one letter — prose has
    nearly all; tables/serial dumps fail (Gopher: >= 0.8 required)."""
    toks = tokens(col)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}")))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def symbol_word_ratio(col: Column | str) -> Column:
    """(# chars + '...' occurrences) per word — boilerplate/markup
    signal (Gopher: <= 0.1 required)."""
    c = _c(col)
    n = token_count(col)
    hashes = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    ellipses = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    return F.when(n > 0, (hashes + ellipses).cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def required_stopword_hits(col: Column | str) -> Column:
    """How many DISTINCT words of the required-stopword set appear
    (Gopher: >= 2 required — catches keyword-stuffed non-prose that
    sails through a stopword-FRACTION check)."""
    toks = tokens(F.lower(_c(col)))
    hit = [F.array_contains(toks, w).cast("int") for w in GOPHER_REQUIRED_STOPWORDS]
    out = hit[0]
    for h in hit[1:]:
        out = out + h
    return out


def gopher_quality_gate(
    col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """The composite Gopher rule gate: True = keep.  Defaults are the
    published thresholds; tighten/loosen per corpus."""
    n = token_count(col)
    mwl = mean_word_length(col)
    return (
        (n >= min_words) & (n <= max_words)
        & (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
        & (symbol_word_ratio(col) <= max_symbol_ratio)
        & (alpha_word_fraction(col) >= min_alpha_frac)
        & (required_stopword_hits(col) >= min_stop_hits)
    )


# PII-ish scrub patterns — RE2-compatible (no lookarounds), so the same
# pattern strings run in Spark (Java regex) and any RE2 engine
REDACT_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\d{7,}", "<NUM>"),
]


def redact_pii(col: Column | str) -> Column:
    """Scrub emails, URLs and long digit runs (ids/phones) with typed
    placeholder tokens — the standard pre-training hygiene pass.  Order
    matters: emails before the bare-number rule so ``a123456789@x.com``
    becomes one <EMAIL>, not an email wrapping a <NUM>.  Pure chained
    ``regexp_replace`` — JVM-side, streams through whole-stage codegen."""
    out = _c(col)
    for pattern, token in REDACT_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


# Content-safety word list — a PLACEHOLDER lexicon (the real deployment
# swaps in its moderation list, e.g. an LDNOOBW set; the engine only
# fixes the scoring semantics).  Lowercase whole-word matches.
FLAGGED_WORDS = ["badword", "slur1", "slur2", "nsfwterm", "gore"]


def flagged_token_fraction(col: Column | str, words: list[str] | None = None) -> Column:
    """Fraction of tokens that are on the flagged word list (0.0 for
    empty docs) — the C4/RefinedWeb-style word-list safety signal.
    Whole-token equality, not substring: 'scunthorpe' never trips a
    substring of a flagged word.  Pure higher-order expression over the
    one tokens() array — JVM-side, no shuffle, no UDF."""
    wl = [w.lower() for w in (words if words is not None else FLAGGED_WORDS)]
    if not wl:
        # an explicitly empty lexicon flags nothing (it must NOT fall
        # back to the placeholder list — that would drop real docs)
        return F.lit(0.0)
    toks = tokens(F.lower(_c(col)))
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(wl)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def content_safety_gate(
    col: Column | str,
    words: list[str] | None = None,
    max_flagged_fraction: float = 0.0,
) -> Column:
    """True = keep.  The default (0.0) drops any doc containing a
    flagged token at all — C4's rule; raise the threshold for the
    softer quality-weighted variants."""
    return flagged_token_fraction(col, words) <= max_flagged_fraction
