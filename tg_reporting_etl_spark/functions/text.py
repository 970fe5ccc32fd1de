"""Text-analysis operators for the documents table.

Pure column expressions (JVM-side, codegen'd) — a 100 TB corpus pays no
Python tax here.  Each has an exact DuckDB twin in plans/llm_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tg_reporting_etl_spark.functions.dedup import MOD31, h32

# language-marker vocabularies for the n-gram-heuristic language id.
# (A real pipeline plugs fastText here; the *operator shape* — score per
# language, deterministic argmax — is what the engine provides.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "fast", "key"],
    "de": ["order", "row", "merge"],
    "es": ["data", "join", "table"],
    "fr": ["scan", "filter", "group"],
    "zh": ["spark", "query", "stream"],
}

STOPWORDS = ["the", "a", "of", "and"]


def occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via the replace-length trick —
    portable to any SQL engine, no regex dialect drift."""
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def with_token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count + avg length.

    NULL-text contract (whole text family): rows with NULL text are
    DROPPED, not propagated — a null n_tokens/quality would silently
    poison downstream filters and arg-maxes, and the explode-based
    operators (repetition, n-grams) already drop such rows naturally.
    Oracles see no nulls (the corpus has none), so the twin SQL needs
    no mirroring clause."""
    toks = F.split(F.col("text"), " ")
    bpe = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+"), 0)
    return (
        docs.filter(F.col("text").isNotNull())
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("n_bpe_tokens", F.size(bpe).cast("long"))
        .withColumn(
            "avg_token_len",
            (F.length("text") - (F.size(toks) - 1)) / F.size(toks),
        )
    )


def with_quality(docs: DataFrame) -> DataFrame:
    """Length/stopword-ratio quality score in [0, 1]-ish.

    quality = min(1, n_tokens/100) * 0.5 + stopword_ratio-banded 0.5:
    corpora-filter shape (too short or stopword-free text scores low).
    """
    d = with_token_stats(docs)
    stop_hits: Column = F.lit(0.0)
    for w in STOPWORDS:
        stop_hits = stop_hits + occurrences(F.col("text"), f" {w} ")
    d = d.withColumn("stopword_ratio", stop_hits / F.col("n_tokens"))
    return d.withColumn(
        "quality",
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + F.when((F.col("stopword_ratio") >= 0.01) & (F.col("stopword_ratio") <= 0.5), 0.5).otherwise(0.0),
    )


def with_lang_id(docs: DataFrame) -> DataFrame:
    """Marker-count language heuristic with deterministic arg-max.

    Scores = occurrence counts of per-language marker words; ties break
    by the fixed language order (first wins).  NULL text drops (family
    contract, see :func:`with_token_stats`).
    """
    scored = docs.filter(F.col("text").isNotNull())
    for lang, markers in LANG_MARKERS.items():
        s: Column = F.lit(0.0)
        for m in markers:
            s = s + occurrences(F.col("text"), f" {m} ")
        scored = scored.withColumn(f"_s_{lang}", s)
    langs = list(LANG_MARKERS)
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [F.col(f"_s_{lang}") >= F.col(f"_s_{other}") for other in langs[langs.index(lang) + 1 :]]
        cond = later[0]
        for c in later[1:]:
            cond = cond & c
        pred = F.when(cond, lang).otherwise(pred)
    return scored.withColumn("lang_pred", pred).drop(*[f"_s_{lang}" for lang in langs])


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher/RefinedWeb-style repetition signals per document:
    duplicate-token fraction (1 - distinct/total) and top-token fraction
    (most frequent token's share).  Templated or looping text scores
    high on both and is filtered out of training corpora.

    Unlike the other text operators this needs a frequency aggregation
    (mode-of-array is not a column expression), so it runs as explode →
    two-level groupBy — both aggs map-side partial, shuffle keyed on
    (doc_id, token) then doc_id, no Python."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return (
        freq.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("distinct_tokens"),
            F.max("c").alias("top_c"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "distinct_tokens",
            (1.0 - F.col("distinct_tokens") / F.col("n_tokens")).alias("dup_token_fraction"),
            (F.col("top_c") / F.col("n_tokens")).alias("top_token_fraction"),
        )
    )


def with_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive rolling polynomial hash over whitespace tokens:
    acc = (acc*31 + h(tok)) mod (2^31-1), h already reduced mod the same
    prime so the zero-seed fold equals a first-element-seeded fold.
    NULL text drops (family contract, see :func:`with_token_stats`)."""
    docs = docs.filter(F.col("text").isNotNull())
    tok_hashes = F.transform(
        F.split(F.col("text"), " "),
        lambda t: h32(F.concat_ws("|", F.lit("fp"), t)) % MOD31,
    )
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % MOD31,
    )
    return docs.withColumn("fingerprint", fp)


def word_ngram_rows(docs: DataFrame, n: int = 3, stride: int = 1) -> DataFrame:
    """(doc_id, gram) instance rows: every ``stride``-th length-``n``
    word window of ``text`` (1-based starts 1, 1+stride, ...).  Docs
    shorter than ``n`` words yield no rows (and so drop out of
    downstream per-doc aggregates — mirrored by the oracle's join).
    The explode is the shingle pattern over words: map-side only, no
    shuffle until a consumer aggregates.  ``stride=1`` is exact;
    ``stride=s>1`` divides the dominant explode row count by ``s`` —
    the deterministic sampling scale path (same contract as
    :func:`~tg_reporting_etl_spark.functions.spans.char_gram_rows`)."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    from tg_reporting_etl_spark.functions.fanout import fan_out

    docs = fan_out(docs)  # explode is CPU-bound; no-op on a wide scan
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1, F.lit(stride)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return docs.filter(F.size(toks) >= n).select("doc_id", F.explode(grams).alias("gram"))


def gram_doc_frequency(gram_rows: DataFrame) -> DataFrame:
    """(gram, df): distinct-document frequency of each gram — the table
    both boilerplate consumers derive from (share it via a session
    cache when running several)."""
    return gram_rows.groupBy("gram").agg(F.count_distinct("doc_id").cast("long").alias("df"))


def boilerplate_ngrams(
    docs: DataFrame, n: int = 3, min_df: int = 5, gram_df: DataFrame | None = None
) -> DataFrame:
    """Corpus-level boilerplate detection (C4/CCNet shape): word
    ``n``-grams appearing in >= ``min_df`` DISTINCT documents — the
    template/navigation text a web-scale corpus repeats across pages.

    Output (gram, df), bounded by the gram-type space regardless of
    corpus row count.  At 100 TB the groupBy key would be
    ``xxhash64(gram)`` with ``min(gram)`` carried for display (the
    shingle-hash pattern); here the string key keeps the operator
    byte-comparable to the SQL oracle.  Pass a precomputed ``gram_df``
    (:func:`gram_doc_frequency`) to share the agg across consumers."""
    if gram_df is None:
        gram_df = gram_doc_frequency(word_ngram_rows(docs, n))
    return gram_df.filter(F.col("df") >= min_df)


def boilerplate_fraction(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 5,
    gram_df: DataFrame | None = None,
    stride: int = 1,
) -> DataFrame:
    """Per-doc fraction of n-gram instances that are corpus boilerplate
    (df >= ``min_df``) — the Gopher-style cross-document duplication
    signal (within-doc repetition is :func:`repetition_stats`).

    Plan shape (verified via explain): only the FILTERED boiler set —
    grams with df >= ``min_df``, a strict subset of the already
    type-bounded df table — ships to the instance side, as a broadcast
    semi-ish inner join; instances of non-boilerplate grams (the vast
    majority of a healthy corpus) die at the join instead of riding
    into the aggregate.  ``n_grams`` never touches the join at all: it
    is ``size(tokens) - n + 1``, a narrow per-doc expression.  The two
    per-doc frames meet with one left join on doc_id (n_boiler = 0
    where no instance survived).  If a real corpus's boiler-type space
    outgrows the broadcast threshold, Catalyst degrades to a sort-merge
    join on gram — correct, one extra shuffle.  Docs with < n words
    have no gram instances and are absent, as in the oracle.  Pass a
    precomputed ``gram_df`` to skip the df agg.

    ``stride=s>1`` is the deterministic-sampling scale path: both the
    df table (when not supplied) and the instance side run over every
    ``s``-th gram start, dividing the dominant explode row count by
    ``s``.  ``boiler_frac`` then estimates the exact fraction from the
    sampled positions, and ``n_grams`` counts SAMPLED positions (so
    n_boiler/n_grams stays a true fraction of what was inspected — no
    silent mixing of sampled numerators with exact denominators).  A
    supplied ``gram_df`` must be built with the SAME stride."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    toks = F.split(F.col("text"), " ")
    n_positions = (
        (F.size(toks) - n + 1).cast("long")
        if stride == 1
        else (F.floor((F.size(toks) - n) / stride) + 1).cast("long")
    )
    base = docs.filter(F.size(toks) >= n).select(
        "doc_id", n_positions.alias("n_grams")
    )
    rows = word_ngram_rows(docs, n, stride)
    df_tbl = gram_doc_frequency(rows) if gram_df is None else gram_df
    boiler = df_tbl.filter(F.col("df") >= min_df).select("gram")
    boiler_counts = (
        rows.join(boiler, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_boiler"))
    )
    return (
        base.join(boiler_counts, "doc_id", "left")
        .withColumn("n_boiler", F.coalesce("n_boiler", F.lit(0)).cast("long"))
        .withColumn("boiler_frac", F.round(F.col("n_boiler") / F.col("n_grams"), 6))
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Per-doc unigram language-model quality proxy (CCNet shape):
    mean -log2 p(token) under the corpus unigram distribution, p(tok) =
    corpus_count(tok) / total_tokens.

    The cheap stand-in for CCNet's wikipedia-LM perplexity filter: low
    mean surprisal = common-word text (template/boilerplate-leaning),
    high = rare-token text (specialized content — or noise); curation
    keeps a band.  Within-corpus it ranks documents by how "expected"
    their token mix is, with no external model artifact.

    Plan (two passes, both bounded): token explode (narrow, fan-out
    guarded) -> vocabulary-bounded frequency table -> join frequencies
    back onto the token stream -> one per-doc aggregate.  The frequency
    join carries NO broadcast hint on purpose: a web-scale vocabulary
    (URLs, numbers, typos) can outgrow the driver, and a forced
    broadcast would OOM it instead of degrading — Catalyst broadcasts
    automatically while tf fits the threshold and falls back to a
    shuffled join when it does not (same stance as
    :func:`boilerplate_fraction`).  Only the ONE-ROW total is force-
    broadcast.  mean(-log2 p) = log2(total) - mean(log2 cnt), computed
    that way so the only float summation is over log2 of exact integer
    counts.  NULL text drops (text-family contract).  Returns (doc_id,
    n_tokens, neg_log2p), neg_log2p rounded to 6 places for engine
    parity.
    """
    from tg_reporting_etl_spark.functions.fanout import fan_out

    docs = fan_out(docs)
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = tf.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        toks.join(tf, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(F.log2("cnt")).alias("_mean_log_cnt"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.log2("total") - F.col("_mean_log_cnt"), 6).alias("neg_log2p"),
        )
    )
