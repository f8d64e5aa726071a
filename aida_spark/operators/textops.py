"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All hot-path operators are Catalyst-native column expressions (JVM-side,
whole-stage codegen) — no per-row Python. They operate on any DataFrame
with a text column (the driver testdata's ``documents`` table, or the
transcript ``text`` column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "token_count_bpe",
    "quality_metrics",
    "repetition_metrics",
    "language_id",
    "fingerprint",
    "redact_pii",
    "stratified_sample",
    "mix_by_token_budget",
    "dedup_repeated_lines",
    "unigram_nll_scores",
]

# Compact closed-class marker words per language for the n-gram/stopword
# language-ID heuristic. Deliberately small: these are the highest-frequency
# function words, which is what a ratio heuristic needs.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "que", "une", "dans", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por", "con", "para"],
}


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (word-chunks of <=4 chars ~ GPT-style token granularity)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.withColumn(
        "n_tokens",
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
            F.size(words)
        ),
    ).withColumn(
        "n_subwords",
        # ceil(len(word)/4) summed over words: cheap deterministic proxy
        F.aggregate(
            words,
            F.lit(0),
            lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
        ),
    )


# GPT-2-style pre-tokenizer, simplified to the RE2/Java-regex common
# subset (no lookahead): contraction suffixes, letter runs, digit runs,
# symbol runs — each optionally absorbing one leading space; whitespace
# between matches is skipped. This is the "BPE-ish regex" token counter:
# it tracks real BPE pre-tokenization boundaries, not byte-pair merges.
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-pre-tokenizer token count as one JVM-side regex pass."""
    return df.withColumn(
        "n_bpe_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), 0))
        .cast("long"),
    )


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / uppercase / stopword-ratio features
    (the standard pre-training quality filters), all as column math."""
    t = F.col(text_col)
    n_chars = F.length(t)
    stripped = {
        "punct": F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", "")),
        "digits": F.length(F.regexp_replace(t, r"[^0-9]", "")),
        "upper": F.length(F.regexp_replace(t, r"[^A-Z]", "")),
        "spaces": F.length(F.regexp_replace(t, r"[^ ]", "")),
    }
    en = F.array(*[F.lit(w) for w in _LANG_MARKERS["en"]])
    words = _words(t)
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_punct", stripped["punct"])
        .withColumn("n_digits", stripped["digits"])
        .withColumn("n_upper", stripped["upper"])
        .withColumn("n_words", F.size(words))
        .withColumn(
            "stopword_hits", F.size(F.array_intersect(words, en))
        )
    )
    return out.withColumn(
        "quality_score",
        # crude composite in [0,1]: penalize punct/digit-heavy, reward
        # stopword coverage (fluent prose) and mid-range length
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                + F.col("stopword_hits") / (F.col("n_words") + F.lit(1))
                - F.col("n_punct") / (F.col("n_chars") + F.lit(1))
                - F.col("n_digits") / (F.col("n_chars") + F.lit(1)),
            ),
        ),
    )


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals:

    - ``top_word_frac``: most-frequent word count / total words (the
      "fraction of tokens in the most common token" rule);
    - ``dup_bigram_frac``: 1 - distinct bigrams / total bigrams (the
      "duplicate n-gram fraction" rule).

    Scale shape: two explode + partial-aggregate passes, each shuffling
    on (doc_id[, word]) — uniform keys, map-side combined; no UDFs.
    Degenerate docs (no words / <2 words) score 0.0 on the respective
    metric rather than null, so downstream threshold filters are total.
    """
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    base = df.select(F.col(id_col).alias("doc_id"), words.alias("w"))
    tok = base.select("doc_id", F.explode("w").alias("word"))
    top = (
        tok.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word"), F.sum("c").alias("n_words"))
    )
    bigrams = base.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.concat_ws(
                    " ", F.col("w").getItem(i), F.col("w").getItem(i + 1)
                ),
            )
        ).alias("g"),
    )
    bg = bigrams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bg"),
        F.countDistinct("g").alias("n_bg_distinct"),
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(top, "doc_id", "left")
        .join(bg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("top_word") / F.col("n_words"), F.lit(0.0)
            ).alias("top_word_frac"),
            F.coalesce(
                F.lit(1.0) - F.col("n_bg_distinct") / F.col("n_bg"),
                F.lit(0.0),
            ).alias("dup_bigram_frac"),
        )
    )


def mix_by_token_budget(
    df: DataFrame,
    token_budgets: dict[str, int],
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mix composition: select documents so each source
    contributes ~``token_budgets[source]`` tokens. Per source, the keep
    fraction is ``min(1, budget / total_tokens)`` and document selection
    is the same Knuth multiplicative hash as :func:`stratified_sample`
    — fully deterministic (retry/cluster-size stable), no rand().
    Sources absent from the budget map are dropped (explicit mixes
    only). Returns (doc_id, source, n_tokens).

    Scale shape: one partial-aggregated per-source total (few keys, so
    the final agg is tiny), broadcast back onto the corpus scan; the
    keep decision is pure column math. The corpus never shuffles.
    """
    spark = df.sparkSession
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(words))
        .cast("long")
        .alias("n_tokens"),
    )
    totals = toks.groupBy("source").agg(F.sum("n_tokens").alias("total"))
    budgets = spark.createDataFrame(
        [(s, int(b)) for s, b in sorted(token_budgets.items())],
        "source string, budget long",
    )
    per_source = totals.join(budgets, "source")
    frac = F.least(F.lit(1.0), F.col("budget") / F.col("total"))
    threshold = F.floor(frac * F.lit(1_000_000)).cast("long")
    keep = (
        ((F.col("doc_id") % 1000003) * 2654435761) % 1_000_000 < threshold
    )
    return (
        toks.join(F.broadcast(per_source), "source")
        .filter(keep)
        .select("doc_id", "source", "n_tokens")
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID over a fixed marker vocabulary.
    Pure array intersection — no UDF, fully codegen'd."""
    words = _words(F.col(text_col))
    hit_cols = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        hit_cols.append(
            F.size(F.array_intersect(words, arr)).alias(f"hits_{lang}")
        )
    tmp = df.select("*", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in _LANG_MARKERS])
    lang_expr = F.lit("unknown")
    # reversed so earlier languages win ties (en first)
    for lang in reversed(list(_LANG_MARKERS)):
        lang_expr = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(lang_expr)
    return tmp.withColumn("lang_pred", lang_expr).drop(
        *[f"hits_{lang}" for lang in _LANG_MARKERS]
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint: xxhash64 of the whitespace-normalized,
    lowercased text (document-level rolling-hash analogue, JVM-side)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(norm))


# --- PII redaction -----------------------------------------------------

# deliberately lookaround-free so the same patterns run identically under
# Java regex (Spark) and RE2 (DuckDB oracle)
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII scrub: count and mask emails, IPv4 addresses and
    phone numbers. Pure column math (regexp_extract_all + regexp_replace),
    fully codegen'd — the standard pre-training redaction pass at corpus
    scale. Adds n_<kind> counts and a ``text_redacted`` column with each
    match replaced by ``<KIND>``."""
    out = df
    redacted = F.col(text_col)
    for kind, pat in _PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long"),
        )
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return out.withColumn("text_redacted", redacted)


# --- deterministic stratified sampling ---------------------------------

def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mixing step
    (e.g. keep 10% of crawl, 100% of curated sources). Inclusion is
    decided by a Knuth multiplicative hash of the row id modulo 10_000,
    NOT rand(): the sample is reproducible across runs/retries/cluster
    sizes and needs no shuffle (a narrow filter the optimizer pushes to
    the scan). Fractions have 1/10000 resolution.

    The id is first reduced mod a large prime so the Knuth multiply stays
    within int64 for any id (Spark runs ANSI mode: a silent-wraparound
    multiply would instead raise at ids beyond ~3.5e9)."""
    h = F.pmod(
        F.pmod(F.col(id_col).cast("long"), F.lit(1_000_003))
        * F.lit(2654435761),
        F.lit(10_000),
    )
    frac = None
    for stratum, f in sorted(fractions.items()):
        cond = F.col(stratum_col) == stratum
        thr = F.lit(int(round(f * 10_000)))
        frac = F.when(cond, thr) if frac is None else frac.when(cond, thr)
    frac = (
        frac.otherwise(F.lit(int(round(default_fraction * 10_000))))
        if frac is not None
        else F.lit(int(round(default_fraction * 10_000)))
    )
    return df.filter(h < frac)


# --- line-level (boilerplate) dedup ------------------------------------

def dedup_repeated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 3,
    min_line_chars: int = 10,
) -> DataFrame:
    """RefinedWeb/Falcon-style LINE-level dedup: remove lines whose
    trimmed form occurs in >= ``min_df`` distinct documents (nav menus,
    cookie banners, license footers — the boilerplate that survives
    document-level dedup because the documents AROUND it differ).
    Lines shorter than ``min_line_chars`` after trimming are exempt
    (headers/blank separators would otherwise be nuked corpus-wide).

    Returns one row per input document: (id, text_clean, n_lines,
    n_removed); a document whose every line is boilerplate keeps its row
    with an empty ``text_clean`` (row parity with the input — the caller
    decides whether to drop emptied docs).

    Scale shape — pure Catalyst, no UDFs:
    1. posexplode(split) is narrow;
    2. the doc-frequency aggregate shuffles (line_hash, doc) pairs on
       the uniformly-distributed ``xxhash64`` of the trimmed line, with
       map-side partial aggregation, then filters to hashes at
       >= min_df — the surviving boilerplate set is SMALL (by
       definition it is the corpus's repeated fraction), so the
       line-removal join broadcasts it under AQE;
    3. reassembly is one shuffle keyed by doc id (sort_array over
       (pos, line) structs restores original line order).
    A hash collision (p ~ distinct_lines/2^64) could drop an innocent
    line; the DuckDB oracle joins on the line STRINGS, so the driver
    gate would catch any such event at test scale."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    norm = F.trim(F.col("line"))
    eligible = F.length(norm) >= min_line_chars
    boilerplate = (
        lines.filter(eligible)
        .select(F.xxhash64(norm).alias("lh"), "id")
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("lh")
    )
    tagged = lines.withColumn(
        "lh", F.when(eligible, F.xxhash64(norm))
    ).join(
        boilerplate.withColumn("_bl", F.lit(True)), "lh", "left"
    )
    kept = tagged.filter(F.col("_bl").isNull())
    reassembled = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s.line,
            ),
            "\n",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(reassembled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


# --- corpus unigram-LM perplexity (CCNet-style quality signal) ---------

def unigram_nll_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
) -> DataFrame:
    """CCNet-style language-model quality scoring with the corpus as its
    own training set: fit an add-k-smoothed UNIGRAM model over the
    lowercased whitespace tokens of the whole corpus, then score each
    document by its mean negative log-likelihood (natural log). Low NLL
    = fluent/common language, high NLL = rare-token-heavy noise — the
    standard perplexity-bucket filter, with the n-gram order reduced to
    1 so the whole computation stays exact, closed-form and
    SQL-mirrorable (no external LM).

    p(w) = (count(w) + k) / (N + k*V);  unseen w -> k / (N + k*V).

    Scale shape — pure Catalyst: one explode + hash-aggregate builds the
    vocabulary counts (uniform word keys, map-side combine); the scoring
    join is per (doc, word) with the per-doc aggregate partial-combined;
    the two scalars (N, V) broadcast. Returns (id, n_tokens, mean_nll).
    Degenerate (empty) docs score NULL-free 0.0 so threshold filters
    stay total."""
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    tok = df.select(F.col(id_col).alias("id"), words.alias("w")).select(
        "id", F.explode("w").alias("word")
    )
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.select(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    doc_word = tok.groupBy("id", "word").agg(
        F.count(F.lit(1)).alias("n_in_doc")
    )
    scored = (
        doc_word.join(vocab, "word")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("n_in_doc").cast("long").alias("n_tokens"),
            (
                -F.sum(
                    F.col("n_in_doc")
                    * F.log(
                        (F.col("c") + F.lit(add_k))
                        / (F.col("n_total") + F.lit(add_k) * F.col("v"))
                    )
                )
                / F.sum("n_in_doc")
            ).alias("mean_nll"),
        )
    )
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("mean_nll"), F.lit(0.0)).alias("mean_nll"),
    )
