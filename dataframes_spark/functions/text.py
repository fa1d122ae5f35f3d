"""Text analysis for large-scale corpora: tokenization, quality scoring,
language identification, document fingerprinting.

Beyond the reference's surface — the per-document scoring pass of a
training-data pipeline. Everything is built-in string/regex/array
expressions (JVM-side, whole-stage codegen); no Python touches row data,
so the same code runs one scan over 100 TB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish token pattern: words with optional leading space, numbers,
# punctuation runs — approximates a GPT-style pre-tokenizer split.
_BPE_SPLIT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def whitespace_tokens(c: Column) -> Column:
    """Whitespace token count."""
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_tokens(c: Column) -> Column:
    """Token count under a BPE-like pre-tokenizer regex (letters / digits /
    punctuation runs counted separately)."""
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_SPLIT), F.lit(0)))


def punct_ratio(c: Column) -> Column:
    no_punct = F.regexp_replace(c, r"[^\w\s]", "")
    return (F.length(c) - F.length(no_punct)) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(c: Column, stopwords: tuple[str, ...] = (
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "that",
)) -> Column:
    """Share of whitespace tokens that are (lowercased) stopwords."""
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(c: Column) -> Column:
    toks = F.split(F.trim(c), r"\s+")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(c: Column) -> Column:
    """Composite [0,1] heuristic: penalize extreme length, high punctuation,
    very short words — the shape of a C4/Gopher-style quality filter."""
    n_tok = whitespace_tokens(c)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    word_len = mean_word_length(c)
    wl_ok = F.when((word_len >= 2) & (word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + wl_ok) / F.lit(3.0)


def dup_word_fraction(c: Column) -> Column:
    """Fraction of whitespace tokens that are repeats of an earlier token
    (1 - distinct/total). One of the Gopher-style repetition signals
    (Rae et al. 2021 §A1.1) used to drop boilerplate/spam documents."""
    toks = F.split(F.trim(c), r"\s+")
    return F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )


def _word_bigrams(toks: Column) -> Column:
    n = F.size(toks)
    # guard n<2: F.sequence(1, 0) yields a DESCENDING [1,0], not empty
    return F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )).otherwise(F.array().cast("array<string>"))


def dup_bigram_fraction(c: Column) -> Column:
    """Fraction of word 2-grams that are repeats (1 - distinct/total);
    0.0 for documents with fewer than two tokens."""
    bi = _word_bigrams(F.split(F.trim(c), r"\s+"))
    return F.when(F.size(bi) == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(bi)) / F.size(bi)
    )


def top_word_fraction(c: Column) -> Column:
    """Share of tokens taken by the single most frequent token — high
    values mark keyword-stuffed or degenerate documents. O(distinct x n)
    array expressions per row, still one JVM-side scan (no explode, no
    shuffle); documents are bounded-length so the quadratic term is
    per-row constant work."""
    toks = F.split(F.trim(c), r"\s+")
    counts = F.transform(
        F.array_distinct(toks), lambda w: F.size(F.filter(toks, lambda x: x == w))
    )
    return F.array_max(counts) / F.greatest(F.size(toks), F.lit(1))


def repetition_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition report: the filter inputs a Gopher-style
    quality pass thresholds on (e.g. drop when dup_word_frac > 0.3 or
    top_word_frac > 0.2). Pure expressions over one scan — at 100 TB this
    is a map-only stage with no shuffle, and column pruning reads only
    (id, text) from parquet."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        whitespace_tokens(c).cast("bigint").alias("n_words"),
        F.round(dup_word_fraction(c), 6).alias("dup_word_frac"),
        F.round(dup_bigram_fraction(c), 6).alias("dup_bigram_frac"),
        F.round(top_word_fraction(c), 6).alias("top_word_frac"),
    )


# default scrub patterns: email, phone-ish digit runs, IPv4, long digit
# runs (IDs/SSNs/cards) — ordered so the more specific match first
_REDACT_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # phones need separators/parens — a bare digit run is <NUM>, not a phone
    (r"\+?\d{1,3}?[\s().-]+\(?\d{2,4}\)?[\s().-]+\d{2,4}[\s().-]?\d{0,6}\d", "<PHONE>"),
    (r"\b\d{6,}\b", "<NUM>"),
)


def redact(c: Column, patterns: tuple[tuple[str, str], ...] = _REDACT_PATTERNS) -> Column:
    """PII scrubbing: chained regexp_replace, entirely JVM-side — the
    standard pre-training redaction pass (emails, phones, IPs, long
    digit runs) as one map-only expression. Order matters: patterns
    apply left to right, so specific forms (email, IP) must precede the
    generic digit-run fallbacks."""
    out = c
    for pat, token in patterns:
        out = F.regexp_replace(out, pat, token)
    return out


def vocab_topk(df: DataFrame, text_col: str, k: int = 50) -> DataFrame:
    """Corpus vocabulary: top-``k`` whitespace tokens by frequency,
    ties broken by token. Explode -> partial+final hash aggregate ->
    TakeOrderedAndProject k-heap: no global sort, no vocabulary
    collect, one shuffle keyed by token."""
    toks = df.select(
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, group_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per ``group_col`` by tf-idf:
    tf = term count within the group, df = number of groups containing
    the term, idf = ln(n_groups/df). Two hash aggregations over the
    exploded tokens and one rank window. The group count is folded into
    the plan as a 1-row broadcast aggregate — construction launches no
    job, and both aggregations keep map-side partial combine at scale."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("token"),
    )
    tf = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ng = df.agg(F.countDistinct(group_col).cast("double").alias("ng"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(ng))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("ng") / F.col("df")))
    )
    w = W.partitionBy("grp").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("grp").alias(group_col), "token", "tf", "df",
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str | list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval: top-``k`` documents for ``query``, scored
    ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
    the Lucene-style non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``.
    Returns ``(id, dl, n_terms, bm25)`` — the retrieval dual of
    `tfidf_top_terms` (which characterizes groups; this ranks documents
    against a query).

    Scale shape: document length is a map-only ``size(split(...))`` —
    no corpus-wide shuffle for lengths; the posting relation is filtered
    to the QUERY'S terms right at the explode, so the only shuffle keyed
    by (doc, token) carries query-term postings, never the vocabulary;
    the per-term document frequencies and the 2-value corpus stats
    broadcast. avgdl derives from an exact BIGINT token-count sum (one
    IEEE division), so partitioning cannot perturb scores; the final
    ranking orders by the ROUNDED score with an id tiebreak, keeping
    duplicate-content ties deterministic across engines. Tokenization
    matches `vocab_topk` (lowercased whitespace split; empty-split
    artifacts dropped)."""
    if isinstance(query, str):
        terms = sorted({t for t in query.lower().split() if t})
    else:
        terms = sorted({t.lower() for t in query if t})
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    toks = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    docs = df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
    lens = docs.select("__id", F.size("__toks").cast("long").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    posts = (
        docs.select("__id", F.size("__toks").cast("long").alias("dl"),
                    F.explode("__toks").alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy("__id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = posts.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (1.0 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        posts.join(F.broadcast(dft), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("__id", "dl")
        .agg(
            F.round(F.sum(contrib), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.col("bm25").desc(), F.col("__id").asc())
        .limit(k)
        .select(F.col("__id").alias(id_col), "dl", "n_terms", "bm25")
    )


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model: ``(id, n_tokens, avg_logprob)``. The distributed form
    of CCNet-style language-model quality filtering — documents whose
    token distribution diverges from the corpus (gibberish, boilerplate,
    wrong language) score low and can be threshold-filtered.

    Plan: ONE scan+explode of the corpus per action. Everything
    downstream derives from the per-(document, token) count relation,
    whose shuffle exchange is a common subtree of both the
    vocabulary-count branch and the scoring join — AQE's runtime
    exchange reuse (ReusedExchange in the final adaptive plan; the
    static plan still prints the branches separately) evaluates it
    once, where a naive tokens-join-counts formulation genuinely
    re-explodes the corpus per branch (no shared exchange exists to
    reuse). The corpus total folds in as a
    1-row broadcast aggregate (construction launches no job); the
    per-document mean is the occurrence-weighted form
    ``sum(m * ln(c/t)) / sum(m)``, identical in value to the plain mean
    over occurrences. Tokenization matches ``vocab_topk`` (lowercased
    whitespace split)."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("token"),
    )
    # split('') returns [''] — without this filter an empty/whitespace-only
    # document would contribute a phantom '' token to the vocabulary and
    # the corpus total, perturbing every document's avg_logprob; such
    # documents carry no tokens and drop from the result entirely
    toks = toks.filter(F.col("token") != "")
    dt = toks.groupBy("__id", "token").agg(F.count(F.lit(1)).alias("__m"))
    counts = dt.groupBy("token").agg(F.sum("__m").alias("__c"))
    total = counts.agg(F.sum("__c").cast("double").alias("__t"))
    return (
        dt.join(counts, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("__id")
        .agg(
            F.sum("__m").alias("n_tokens"),
            F.round(
                F.sum(F.col("__m") * F.log(F.col("__c") / F.col("__t")))
                / F.sum("__m"),
                6,
            ).alias("avg_logprob"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "avg_logprob")
    )


def bigram_logprob(
    df: DataFrame, text_col: str, id_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    Laplace-smoothed BIGRAM model: ``(id, n_tokens, avg_logprob)`` — the
    context-aware upgrade of `unigram_logprob` (CCNet filters on a
    5-gram KenLM; the distributed shape is identical for any order, and
    the bigram keeps the oracle replayable term for term). Chain rule:
    the first token scores under the smoothed unigram
    ``(c(w1)+a) / (N+a*V)``, every later token under
    ``(c(prev,cur)+a) / (c(prev)+a*V)`` with ``V`` the corpus vocabulary
    size — so gibberish with plausible unigrams but impossible
    transitions (shuffled text, keyword stuffing) scores low where the
    unigram model cannot see it.

    Plan: ONE scan+explode of the corpus per action — each token
    appears exactly once as a ``(prev, cur)`` pair row (``prev`` NULL
    for a document's first token), aggregated immediately to the
    per-(doc, prev, cur) count relation ``db0``. EVERYTHING derives
    from that one exchange (AQE exchange reuse, the `unigram_logprob`
    layout): unigram counts are ``sum(m)`` over ``cur`` (every
    occurrence is exactly one ``cur``), corpus bigram counts are
    ``sum(m)`` over the non-NULL-``prev`` rows, the first-token terms
    ARE the NULL-``prev`` rows, and ``(V, N)`` fold in as a 1-row
    broadcast aggregate — where the former three-branch formulation
    (token explode, bigram explode, first-token projection) genuinely
    re-scanned and re-tokenized the corpus per branch. Scoring joins
    are per-distinct-(doc, bigram) — the weighted-mean form
    ``sum(m * lp) / sum(m)``, value-identical to the per-occurrence
    mean. Documents with no tokens drop from the result (the
    `unigram_logprob` contract)."""
    base = df.select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+",
            ),
            lambda t: t != "",
        ).alias("__toks"),
    )
    # size >= 1 also guards the sequence() below: sequence(1, 0) returns
    # a DESCENDING [1, 0], which would emit phantom pair rows for empty
    # documents if this filter were ever dropped
    pairs = base.filter(F.size("__toks") >= 1).select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks")),
                lambda i: F.struct(
                    F.when(i > 1, F.get("__toks", i - 2)).alias("prev"),
                    F.get("__toks", i - 1).alias("cur"),
                ),
            )
        ).alias("__b"),
    ).select("__id", "__b.prev", "__b.cur")
    db0 = pairs.groupBy("__id", "prev", "cur").agg(
        F.count(F.lit(1)).alias("__m")
    )
    c1 = db0.groupBy("cur").agg(F.sum("__m").alias("__c1"))
    vn = c1.agg(
        F.count(F.lit(1)).cast("double").alias("__v"),
        F.sum("__c1").cast("double").alias("__n"),
    )
    db = db0.filter(F.col("prev").isNotNull())
    c2 = db.groupBy("prev", "cur").agg(F.sum("__m").alias("__c2"))
    cp = c1.select(F.col("cur").alias("prev"), F.col("__c1").alias("__cp"))
    a = F.lit(float(alpha))
    bigram_terms = (
        db.join(c2, ["prev", "cur"])
        .join(cp, "prev")
        .crossJoin(F.broadcast(vn))
        .select(
            "__id",
            F.col("__m").alias("__w"),
            F.log((F.col("__c2") + a) / (F.col("__cp") + a * F.col("__v"))).alias(
                "__lp"
            ),
        )
    )
    # exactly one NULL-prev row per non-empty document, __m = 1
    first_terms = (
        db0.filter(F.col("prev").isNull())
        .select("__id", "cur", F.col("__m").alias("__w"))
        .join(c1, "cur")
        .crossJoin(F.broadcast(vn))
        .select(
            "__id",
            "__w",
            F.log((F.col("__c1") + a) / (F.col("__n") + a * F.col("__v"))).alias(
                "__lp"
            ),
        )
    )
    return (
        first_terms.unionByName(bigram_terms)
        .groupBy("__id")
        .agg(
            F.sum("__w").alias("n_tokens"),
            F.round(F.sum(F.col("__w") * F.col("__lp")) / F.sum("__w"), 6).alias(
                "avg_logprob"
            ),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "avg_logprob")
    )


# tiny per-language marker vocabularies for the n-gram heuristic
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "les", "des", "est", "une"),
}


def _contains_any(arr: Column):
    return lambda t: F.array_contains(arr, t)


def language_guess(c: Column) -> Column:
    """Heuristic language ID: count marker-word hits per language, take the
    argmax (first language listed wins ties), 'und' (undetermined) when
    nothing matches. This is the model-free COLUMN-level lane (usable
    inside any expression, no fitted weights needed); the production
    langid is the TRAINED multiclass hashed char-n-gram classifier in
    `functions/langid.py` (train_langid / langid_score /
    langid_score_from_store — the fastText/CLD3 shape, hash-verified
    scoring), which a pipeline swaps in behind the same
    "one language code per document" contract.

    Computed as ``greatest`` over (score, priority, lang) structs —
    struct comparison is lexicographic, so this is a single argmax
    expression. The once-natural fold (chained ``when`` accumulators)
    duplicates every earlier score subtree twice per step — 2^n_langs
    evaluations of the tokenizing split — and measured ~10x slower.
    When the caller already holds the token array, use
    `language_guess_tokens` — each marker filter references the SAME
    materialized array instead of re-running the regex split per
    language (4x fewer splits; it is what `lang_mix_report` does)."""
    return language_guess_tokens(F.split(F.lower(F.trim(c)), r"\s+"))


def language_guess_tokens(toks: Column) -> Column:
    """`language_guess` over an existing (lowercased) token-array column
    — the argmax expression without the per-language re-tokenization."""
    entries = []
    for idx, (lang, markers) in enumerate(_LANG_MARKERS.items()):
        mk = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, _contains_any(mk)))
        entries.append(
            F.struct(
                score.alias("s"), F.lit(-idx).alias("p"), F.lit(lang).alias("l")
            )
        )
    best = F.greatest(*entries)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(c: Column) -> Column:
    """Whole-document fingerprint: 64-bit hash of the
    whitespace-normalized, lowercased text. For windowed/rolling
    fingerprints use :func:`winnow_fingerprints` — this form
    deliberately has no window knob (a previous ``window`` parameter
    was accepted and silently ignored)."""
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.xxhash64(norm)


def document_profile(df: DataFrame, text_col: str) -> DataFrame:
    """One pass computing the full per-document text profile."""
    c = F.col(text_col)
    return df.select(
        "*",
        F.length(c).alias("n_chars_computed"),
        whitespace_tokens(c).alias("n_tokens"),
        bpe_ish_tokens(c).alias("n_bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        mean_word_length(c).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        language_guess(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    window: int = 4,
    base: int = 257,
    mod: int = (1 << 31) - 1,
) -> DataFrame:
    """Winnowed rolling-hash document fingerprints (the MOSS scheme):
    polynomial hash of every k-gram, then the minimum hash of each
    ``window`` consecutive k-grams, deduplicated — guarantees any shared
    substring of length >= k + window - 1 yields a shared fingerprint,
    while keeping ~2/(window+1) of the k-gram hashes.

    Returns ``(id, fp)`` exploded — one row per selected fingerprint —
    ready for a self-join on ``fp`` to find copied passages. The hash is
    plain base-``base`` polynomial arithmetic on character codes (not a
    keyed hash), so any engine can reproduce it — the DuckDB oracle runs
    the identical formula.

    Normalization stays a JVM expression; the per-character rolling-hash
    and sliding-min arithmetic runs as an Arrow-batched numpy kernel
    (vectorized shifted-add convolution + ``minimum.reduce`` — the pure
    expression formulation does n_chars x (k + window) ``element_at``/
    ``slice`` calls per document and measured ~10x slower)."""
    from dataframes_spark.operators.dedup import _norm_text

    powers = [pow(base, k - 1 - j, mod) for j in range(k)]

    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def fps(norm: pd.Series) -> pd.Series:
        out = []
        for s in norm:
            ch = np.fromiter(map(ord, s), dtype=np.int64, count=len(s))
            n_grams = ch.size - (k - 1)
            if n_grams <= 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            g = np.zeros(n_grams, dtype=np.int64)
            for j in range(k):
                g += (ch[j : j + n_grams] * powers[j]) % mod
            g %= mod
            n_win = g.size - (window - 1)
            if n_win <= 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            mins = np.minimum.reduce([g[i : i + n_win] for i in range(window)])
            out.append(np.unique(mins))
        return pd.Series(out)

    return (
        df.select(F.col(id_col).alias("id"), _norm_text(text_col).alias("__norm"))
        .select("id", F.explode(fps(F.col("__norm"))).alias("fp"))
    )


def shared_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
    max_df: int | float = 0.2,
) -> DataFrame:
    """Copied-passage detection: document pairs ranked by the number of
    winnowed fingerprints they share (``(id_a, id_b, n_shared)``,
    ``id_a < id_b``, at least ``min_shared`` shared fingerprints).

    Fingerprints occurring in more than ``max_df`` documents — an
    absolute count, or a float fraction of the corpus — are dropped
    before the self-join: boilerplate phrases otherwise create hot
    fingerprint buckets whose pair explosion is quadratic (the same
    stop-key discipline as dropping stopwords from inverted indexes).
    A fraction survives corpus growth; an absolute cap silently prunes
    everything once background phrase frequency crosses it.

    Construction is action-free: the fractional threshold is folded
    INTO the plan as a one-row corpus-count aggregate broadcast-cross-
    joined onto the fingerprint-frequency frame (a driver-side
    ``df.count()`` here would full-scan a filtered/derived input at
    query-build time — at 100 TB that is a whole job before the query
    even runs). The self-join then shuffles on the fingerprint value,
    so pairs only materialize per shared fingerprint, never as a
    document cross product.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k=k, window=window)
    freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    if isinstance(max_df, float):
        # floor() matches the truncation an absolute int cap implies and
        # the CAST(frac * n AS BIGINT) the SQL oracle uses (both args > 0)
        corpus_n = df.select(F.count(F.lit(1)).alias("__n"))
        rare = (
            freq.join(F.broadcast(corpus_n))
            .filter(F.col("__df") <= F.floor(F.lit(max_df) * F.col("__n")))
        )
    else:
        rare = freq.filter(F.col("__df") <= F.lit(max_df))
    pruned = fps.join(rare.select("fp"), "fp")
    pairs = (
        pruned.alias("a")
        .join(pruned.alias("b"), "fp")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs


#: The Gopher quality-rule stopword list (Rae et al. 2021, appendix A1.1):
#: a document must contain at least 2 of these to pass the stopword rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher corpus-filtering rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", appendix A1.1) as ONE map-only scan:
    per-document measurements plus a 0/1 verdict per rule and the
    composite ``pass_all``.

    Rules, in the paper's order:
      1. word count in [min_words, max_words]
      2. mean word length in [3, 10]
      3. symbol-to-word ratio <= 0.1 for EACH symbol separately — the
         paper rejects when the ratio exceeds 0.1 "for either the hash
         symbol or the ellipsis", so ``#`` and ellipsis (``...`` or
         ``…``) each get their own ratio and the rule passes only when
         both are <= 0.1 (a doc with 0.06 of each passes); the reported
         ``symbol_ratio`` is the max of the two, so the verdict stays
         ``symbol_ratio <= 0.1``
      4. fraction of lines starting with a bullet (``- ``/``* ``/``•``)
         <= 0.90
      5. fraction of lines ending with an ellipsis (``...``/``…``)
         <= 0.30
      6. fraction of words containing an alphabetic character >= 0.80
      7. at least 2 distinct hits from the 8-word stopword list

    Everything is JVM higher-order functions over the token / line
    arrays — no shuffle, no Python in the row path, so the filter runs
    at scan speed and Catalyst pushes any downstream predicate on
    ``pass_all`` into the same stage. Ratios round to 6 places (the
    repo's float-output contract). Documents with no tokens fail rule 1
    and report zero ratios rather than dropping (a filter must see
    every row)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != F.lit(""))
    n_words = F.size(words)
    n_words_d = F.greatest(n_words, F.lit(1)).cast("double")
    mwl = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ) / n_words_d
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    # '…' (U+2026) counts toward the ellipsis symbol exactly as it does
    # for the line rule; stripping '...' first means the two forms never
    # double-count (no '…' survives inside a stripped '...' and vice versa)
    no_dots = F.replace(text, F.lit("..."), F.lit(""))
    n_ell = (F.length(text) - F.length(no_dots)) / F.lit(3) + (
        F.length(no_dots) - F.length(F.replace(no_dots, F.lit("…"), F.lit("")))
    )
    hash_ratio = n_hash / n_words_d
    ell_ratio = n_ell / n_words_d
    symbol_ratio = F.greatest(hash_ratio, ell_ratio)
    lines = F.filter(
        F.split(text, r"\n"), lambda x: F.length(F.trim(x)) > F.lit(0)
    )
    n_lines_d = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda x: F.ltrim(x).startswith("- ")
                | F.ltrim(x).startswith("* ")
                | F.ltrim(x).startswith("•"),
            )
        )
        / n_lines_d
    )
    ellipsis_frac = (
        F.size(
            F.filter(
                lines,
                lambda x: F.rtrim(x).endswith("...")
                | F.rtrim(x).endswith("…"),
            )
        )
        / n_lines_d
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words_d
    )
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    lowered = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(F.filter(sw, lambda s: F.array_contains(lowered, s)))
    r1 = ((n_words >= min_words) & (n_words <= max_words)).cast("int")
    r2 = ((mwl >= 3.0) & (mwl <= 10.0)).cast("int")
    r3 = (symbol_ratio <= 0.1).cast("int")
    r4 = (bullet_frac <= 0.90).cast("int")
    r5 = (ellipsis_frac <= 0.30).cast("int")
    r6 = (alpha_frac >= 0.80).cast("int")
    r7 = (stop_hits >= 2).cast("int")
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        r1.alias("pass_word_count"),
        r2.alias("pass_word_len"),
        r3.alias("pass_symbol"),
        r4.alias("pass_bullet"),
        r5.alias("pass_ellipsis"),
        r6.alias("pass_alpha"),
        r7.alias("pass_stopwords"),
        (r1 * r2 * r3 * r4 * r5 * r6 * r7).alias("pass_all"),
    )


def gopher_report(
    df: DataFrame, text_col: str, id_col: str, group_col: str, **kw
) -> DataFrame:
    """Per-group Gopher rule report: document counts passing each rule
    and the composite — the corpus-curation dashboard row. One scan +
    one small groupBy (groups x 9 cells)."""
    rules = gopher_rules(df, text_col, id_col, **kw)
    keyed = df.select(F.col(id_col), F.col(group_col)).join(rules, id_col)
    passes = [c for c in rules.columns if c.startswith("pass_")]
    return keyed.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(p).cast("long").alias("n_" + p) for p in passes],
    )


def zipf_report(df: DataFrame, text_col: str, k: int = 100) -> DataFrame:
    """Corpus-health Zipf fit: regress ``ln(freq)`` on ``ln(rank)`` over
    the top-``k`` tokens and report ``(n_tokens_ranked, slope,
    intercept, r2)`` — natural corpora fit slope ≈ −1 (Zipf's law);
    machine-generated or template text bends the curve, so the slope is
    a one-number drift alarm for "does this batch still look like
    language?".

    Plan: one scan+explode folds to token counts; the top-k is a
    TakeOrdered heap; ranking and the regr_* fold run over the k-row
    result (bounded by the literal ``k``, never by corpus size).
    Deterministic: ties in frequency rank lexicographically."""
    toks = df.select(
        F.explode(
            F.split(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                r"\s+",
            )
        ).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("token").asc()).limit(k)
    from pyspark.sql import Window as W

    ranked = top.withColumn(
        "rank",
        F.row_number().over(
            W.orderBy(F.col("c").desc(), F.col("token").asc())
        ),
    ).select(
        F.log(F.col("rank").cast("double")).alias("__x"),
        F.log(F.col("c").cast("double")).alias("__y"),
    )
    return ranked.agg(
        F.expr("regr_count(__y, __x)").alias("n_tokens_ranked"),
        F.round(F.expr("regr_slope(__y, __x)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(__y, __x)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(__y, __x)"), 6).alias("r2"),
    )


def lang_mix_report(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\n"
) -> DataFrame:
    """Per-document language-MIXING report: ``(id, doc_lang, n_lines,
    n_foreign, mix_frac)`` — ``doc_lang`` is the whole-text
    `language_guess`; a line is foreign when its own guess differs from
    the document's and is not ``'und'``. Mixed-language documents (code
    comments in another language, boilerplate headers, spam) degrade
    monolingual training sets, and doc-level language ID alone cannot
    see them — the standard remedy is exactly this line-level second
    pass (CCNet splits documents into paragraphs for the same reason).

    One scan: the doc guess is a row expression, lines explode
    JVM-side, per-line guesses fold back with ONE groupBy on the id.
    Documents with no non-blank lines survive with ``n_lines = 0``.
    Both guesses run on a pre-materialized token array
    (`language_guess_tokens`), so the regex split runs once per
    document and once per line, not once per language."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.split(text, sep), lambda x: F.length(F.trim(x)) > F.lit(0)
    )
    toked = df.select(
        F.col(id_col).alias("__id"),
        F.split(F.lower(F.trim(text)), r"\s+").alias("__dt"),
        lines.alias("__ls"),
    )
    # doc_lang resolves in its OWN projection: putting the struct-argmax
    # and the explode_outer in one select trips the analyzer's generator
    # extraction (struct field names degrade to col1/col2/col3 before
    # the ["s"] access resolves — FIELD_NOT_FOUND); after analysis the
    # optimizer may collapse the projections freely, field accesses are
    # ordinal by then
    guessed = toked.select(
        "__id",
        language_guess_tokens(F.col("__dt")).alias("doc_lang"),
        "__ls",
    )
    exploded = guessed.select(
        "__id",
        "doc_lang",
        F.explode_outer("__ls").alias("__line"),
    )
    line_lang = language_guess_tokens(
        F.split(F.lower(F.trim(F.col("__line"))), r"\s+")
    )
    foreign = (
        F.col("__line").isNotNull()
        & (line_lang != F.col("doc_lang"))
        & (line_lang != F.lit("und"))
    )
    return (
        exploded.groupBy("__id", "doc_lang")
        .agg(
            F.count("__line").alias("n_lines"),
            F.sum(foreign.cast("long")).alias("n_foreign"),
        )
        .select(
            F.col("__id").alias(id_col),
            "doc_lang",
            "n_lines",
            "n_foreign",
            F.round(
                F.col("n_foreign")
                / F.greatest(F.col("n_lines"), F.lit(1)).cast("double"),
                6,
            ).alias("mix_frac"),
        )
    )


def oov_report(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """Out-of-vocabulary report against a reference vocabulary:
    ``(id, n_tokens, n_oov, oov_frac)`` — the tokenizer-fit /
    domain-shift check (high OOV against the training vocabulary means
    the tokenizer will shatter this text into bytes). ``vocab`` is a
    one-column DataFrame of tokens (e.g. `vocab_topk`'s ``token``
    column, or a published wordlist read as text).

    ONE corpus scan+explode; the vocabulary joins BROADCAST (left anti
    semantics via a null flag so in-vocab tokens don't drop), then one
    id-keyed fold. Tokenless documents survive with zero counts."""
    vcol = vocab.columns[0]
    v = vocab.select(
        F.lower(F.col(vcol)).alias("token"), F.lit(True).alias("__in_v")
    ).distinct()
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(
            F.filter(
                F.split(
                    F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                    r"\s+",
                ),
                lambda x: x != F.lit(""),
            )
        ).alias("token"),
    )
    flagged = toks.join(F.broadcast(v), "token", "left")
    return (
        flagged.groupBy("__id")
        .agg(
            F.count("token").alias("n_tokens"),
            F.sum(
                (F.col("token").isNotNull() & F.col("__in_v").isNull()).cast(
                    "long"
                )
            ).alias("n_oov"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("oov_frac"),
        )
    )


_C4_TERMINALS = (".", "!", "?", '"')


def c4_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", §2.2) as ONE map-only scan: per-document line
    measurements plus 0/1 verdicts and the composite ``pass_all``.

    Line-level filters (a line survives only if ALL hold):
      - ends in a terminal punctuation mark (``.``/``!``/``?``/``"``)
      - has at least ``min_words_per_line`` words
      - does not contain the word "javascript" (case-insensitive)

    Page-level verdicts, evaluated after line filtering:
      - ``pass_sentences``: at least ``min_sentences`` sentences remain
        (sentence count = terminal ``.``/``!``/``?`` marks in the kept
        lines)
      - ``pass_lorem``: no "lorem ipsum" placeholder text anywhere
      - ``pass_brace``: no curly brace ``{`` anywhere (code)
      - ``pass_all`` = the three page verdicts together

    The paper's badword list and its three-sentence-span dedup are
    separate concerns here by design: blocklists are deployment policy
    (compose with a broadcast-joined list), and span dedup is
    `operators/dedup.duplicate_spans`. Everything below is JVM
    higher-order functions over the split line array — no shuffle, no
    Python in the row path — so the filter runs at scan speed at any
    corpus size and a downstream ``pass_all`` predicate stays in the
    same codegen stage. Fractions round to 6 places (the repo's
    float-output contract); blank-only documents report zero lines and
    fail the sentence rule rather than dropping."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.split(text, r"\n"), lambda x: F.length(F.trim(x)) > F.lit(0)
    )

    def _terminal(x):
        r = F.rtrim(x)
        out = F.lit(False)
        for t in _C4_TERMINALS:
            out = out | r.endswith(t)
        return out

    def _n_words(x):
        return F.size(
            F.filter(
                F.split(F.trim(x), r"\s+"), lambda w: w != F.lit("")
            )
        )

    kept = F.filter(
        lines,
        lambda x: _terminal(x)
        & (_n_words(x) >= F.lit(min_words_per_line))
        & ~F.lower(x).contains("javascript"),
    )

    def _marks(acc, x):
        n = F.lit(0)
        for t in (".", "!", "?"):
            n = n + (
                F.length(x) - F.length(F.replace(x, F.lit(t), F.lit("")))
            )
        return acc + n

    n_lines = F.size(lines).cast("bigint")
    n_kept = F.size(kept).cast("bigint")
    n_sentences = F.aggregate(kept, F.lit(0), _marks).cast("bigint")
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    p_sent = (n_sentences >= min_sentences).cast("int")
    p_lorem = (~has_lorem).cast("int")
    p_brace = (~has_brace).cast("int")
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        F.round(
            n_kept / F.greatest(n_lines, F.lit(1)).cast("double"), 6
        ).alias("kept_frac"),
        n_sentences.alias("n_sentences"),
        p_sent.alias("pass_sentences"),
        p_lorem.alias("pass_lorem"),
        p_brace.alias("pass_brace"),
        (p_sent * p_lorem * p_brace).alias("pass_all"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Apply the C4 filters (`c4_rules`): drop failing pages, and in the
    survivors keep only the surviving lines (newline-rejoined). Same
    single map-only scan shape — the verdict relation joins back on the
    id, so the corpus text crosses no shuffle."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.split(text, r"\n"), lambda x: F.length(F.trim(x)) > F.lit(0)
    )

    def _keep(x):
        r = F.rtrim(x)
        term = F.lit(False)
        for t in _C4_TERMINALS:
            term = term | r.endswith(t)
        nw = F.size(
            F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != F.lit(""))
        )
        return (
            term
            & (nw >= F.lit(min_words_per_line))
            & ~F.lower(x).contains("javascript")
        )

    verdicts = c4_rules(
        df, text_col, id_col, min_words_per_line, min_sentences
    ).select(id_col, "pass_all")
    cleaned = df.join(verdicts, id_col).filter(F.col("pass_all") == 1)
    return cleaned.select(
        F.col(id_col),
        F.array_join(F.filter(lines, _keep), "\n").alias(text_col),
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    approx: bool = False,
    persist: bool = True,
) -> DataFrame:
    """CCNet-style head/middle/tail quality buckets (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score each document under the corpus unigram LM
    (`unigram_logprob` — higher avg log-prob = lower perplexity), then
    split EACH LANGUAGE into per-language likelihood tertiles: ``head``
    above the 2/3 threshold, ``middle`` above 1/3, ``tail`` below. CCNet
    uses these buckets to keep head/middle and drop (or downweight) the
    tail.

    Plan: one corpus scan for the LM fold, one doc-keyed fold for the
    scores, ONE languages-row aggregate for the thresholds (exact
    ``percentile`` by default — the `describe` pinned choice; pass
    ``approx=True`` for ``percentile_approx`` at 100 TB where a
    registry-backed sketch is the right tool), then a broadcast
    threshold join and a map-only bucket label. The corpus text itself
    never shuffles on the bucket path. Scores are rounded to 6dp BEFORE
    the threshold quantile so the bucket boundary is a deterministic
    function of the rounded score relation (engine-reproducible:
    interpolated quantiles of identical inputs are bit-identical).

    The scored relation feeds BOTH the threshold aggregate and the
    output, and column pruning differentiates the forked subtrees
    enough that AQE's exchange reuse only partially dedups them
    (measured: ~11 corpus scans unpersisted vs 4 for the LM alone) —
    so by default the TEXT-FREE per-doc relation ``(id, lang,
    n_tokens, 6dp score)`` persists at the fork: ONE LM pass, and the
    cache is docs x 4 scalar columns (spillable MEMORY_AND_DISK;
    ~40 B/doc, far below the corpus it summarizes). ``persist=False``
    falls back to the pure two-pass plan. Tokenless documents carry no
    LM evidence and drop (the `unigram_logprob` contract)."""
    lp = unigram_logprob(df, text_col, id_col)
    scored = df.select(F.col(id_col), F.col(lang_col)).join(lp, id_col)
    if persist:
        scored = scored.persist()
    pfn = "percentile_approx" if approx else "percentile"
    thr = scored.groupBy(lang_col).agg(
        F.expr(f"{pfn}(avg_logprob, 0.3333333333333333)").alias("__t1"),
        F.expr(f"{pfn}(avg_logprob, 0.6666666666666666)").alias("__t2"),
    )
    bucket = (
        F.when(F.col("avg_logprob") > F.col("__t2"), F.lit("head"))
        .when(F.col("avg_logprob") > F.col("__t1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(thr), lang_col).select(
        F.col(id_col),
        F.col(lang_col),
        "n_tokens",
        "avg_logprob",
        bucket.alias("bucket"),
    )
