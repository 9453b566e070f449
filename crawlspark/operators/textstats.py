"""Text-analysis operators for the training-data pipeline: token
counting, quality scoring, language-ID, and document fingerprinting.

All JVM built-ins (split / regexp / higher-order array functions) —
no Python in the hot path; each has an exact DuckDB-SQL twin for the
driver's oracle gate. These run per-row (narrow, no shuffle), so they
scale linearly with corpus bytes at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..portable import md5hash60, shingles, words

# BPE-ish tokenizer: runs of letters, runs of digits, or single
# non-space symbols — the classic pre-tokenization regex shape.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword profiles for the n-gram/stopword
# language-ID heuristic (deterministic; extend per corpus)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "en", "que", "es"],
    "fr": ["le", "la", "de", "et", "en", "que", "est"],
    "de": ["der", "die", "das", "und", "in", "zu", "ist"],
    "zh": ["de", "le", "shi", "zai", "he", "you", "wo"],
}


def token_count_col(text: Column) -> Column:
    """BPE-ish token count (JVM regexp, vectorized)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features per document: word count, distinct-word ratio
    (type/token), mean word length, punctuation ratio, stopword ratio,
    and a composite quality score in [0,1]."""
    # bind trim/split once per row (attributes below), not per feature
    df = df.withColumn("_t", F.trim(F.col(text_col))).withColumn(
        "_w", F.split(F.col("_t"), " ")
    )
    t = F.col("_t")
    w = F.col("_w")
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(en_stop, x)))
    return (
        df.withColumn("n_words", n_words)
        .withColumn("ttr", F.round(n_distinct / n_words, 6))
        .withColumn("mean_word_len", F.round((F.length(t) - (n_words - 1)) / n_words, 6))
        .withColumn("punct_ratio", F.round(n_punct / F.length(t), 6))
        .withColumn("stopword_ratio", F.round(n_stop / n_words, 6))
        .withColumn(
            "quality",
            F.round(
                F.least(F.lit(1.0), n_words / F.lit(200.0)) * 0.5
                + (1 - F.least(F.lit(1.0), n_punct / F.length(t) * 10)) * 0.25
                + F.least(F.lit(1.0), n_stop / n_words * 5) * 0.25,
                6,
            ),
        )
        .drop("_t", "_w")
    )


def lang_pred_expr(w: Column) -> Column:
    """Stopword-profile argmax over a bound words-array column.

    Score(lang) = token occurrences in that language's stopword list,
    computed as pure column math over the bound words array — no
    explode, no join, no shuffle. (The previous broadcast-join +
    window-argmax shape shuffled the entire token stream twice just to
    rank a handful of profile scores; at 10^9 documents that is the
    whole corpus through the wire. The profile is a compile-time
    constant, so each language's hit count is one vectorized array
    filter per row.) Argmax with deterministic tie-break (hits desc,
    lang asc; 'und' when no profile token occurs) via a when-fold in
    sorted language order: strict > keeps the lexicographically
    smaller language on ties."""
    def contains(arr):
        # one-arg lambda for F.filter (PySpark reads the signature;
        # a default-arg closure would register as a 2-var lambda)
        return lambda x: F.array_contains(arr, x)

    pred, best = F.lit("und"), F.lit(0)
    for lang, toks in sorted(STOPWORDS.items()):
        arr = F.array(*[F.lit(t) for t in toks])
        s = F.size(F.filter(w, contains(arr)))
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(s, best)
    return pred


def lang_id(df: DataFrame, id_col: str, text_col: str, spark: SparkSession) -> DataFrame:
    """(id, pred_lang): stopword-profile argmax language-ID (see
    :func:`lang_pred_expr` for the zero-shuffle scoring shape)."""
    return df.select(F.col(id_col).alias("id"), words(text_col).alias("_w")).select(
        "id", lang_pred_expr(F.col("_w")).alias("pred_lang")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, fp): document fingerprint = min md5-60 hash over the
    character n-gram stream (a 1-hash MinHash — the winnowing-style
    'cheapest representative gram' fingerprint). Equal fp ⇒ likely
    shared content block."""
    c = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )
    hashes = F.transform(grams, lambda g: md5hash60(g))
    # trimmed text bound to a column first so the per-index substr
    # reads an attribute, not a re-trim per gram (O(chars²) otherwise)
    return df.select(
        F.col(id_col).alias("id"), F.trim(F.col(text_col)).alias("t")
    ).select("id", F.array_min(hashes).alias("fp"))


# --- repetition signals (Gopher-style quality filters) -------------------

def _word_grams(w: Column, n: int) -> Column:
    """Word n-grams of a bound words-array column, space-joined. All
    indexes are in range by the sequence bound, so element_at never
    throws; documents shorter than n yield an empty array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + F.lit(j)) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def with_repetition(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition signals per document — the filters LLM corpus
    pipelines key on (the Gopher paper's "repetition" family):

    - dup_bigram_frac / dup_trigram_frac: fraction of word n-grams
      that are repeats of an earlier gram (1 - distinct/total);
    - top_bigram_cover: share of all bigrams taken by the single most
      frequent bigram (boilerplate/keyword-stuffing signal).

    Pure column math per row (split once, grams bound to attributes,
    nested HOF count for the mode) — narrow, zero shuffles, linear in
    corpus bytes at 100 TB. The mode count is O(distinct²) per doc,
    bounded by document word count, never by corpus size."""

    def dup_frac(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            F.round(1 - F.size(F.array_distinct(g)) / F.size(g), 6),
        ).otherwise(F.lit(0.0))

    def top_cover(g: Column) -> Column:
        counts = F.transform(
            F.array_distinct(g),
            lambda x: F.size(F.filter(g, lambda y: y == x)),
        )
        return F.when(
            F.size(g) > 0, F.round(F.array_max(counts) / F.size(g), 6)
        ).otherwise(F.lit(0.0))

    return (
        df.select(
            F.col(id_col).alias("id"), words(text_col).alias("_w")
        )
        .select(
            "id", _word_grams(F.col("_w"), 2).alias("_g2"),
            _word_grams(F.col("_w"), 3).alias("_g3"),
        )
        .select(
            "id",
            dup_frac(F.col("_g2")).alias("dup_bigram_frac"),
            dup_frac(F.col("_g3")).alias("dup_trigram_frac"),
            top_cover(F.col("_g2")).alias("top_bigram_cover"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    distributed: bool = False,
) -> DataFrame:
    """P24 sequence packing: contiguous-fill pack assignment,
    pack_id = floor(prefix_tokens / budget) over ``id_col`` order
    (a doc that crosses a boundary stays in the pack it started in).

    Small corpora rank through one global window — honest at testdata
    sizes. ``distributed=True`` is the 10^9-doc path: the same
    two-phase scan the schedule/seq operators use — range-partition on
    the order key, collect only the P per-partition token SUMS (the
    driver sees P longs, never rows), then
    prefix = partition offset + local running sum. pack_id is
    identical either way because ``id_col`` is a total order, wherever
    the range partitioner draws boundaries (equality-tested in
    tests/test_properties.py)."""
    from pyspark.sql import Window

    pid, off = "_pid", "_off"
    if not distributed:
        w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
        prev = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
        return df.select(
            id_col, tokens_col,
            F.floor(prev / budget).cast("long").alias("pack_id"),
        )

    spark = df.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    # lazy localCheckpoint: repartitionByRange SAMPLES its input, and
    # the sums pass + final pass would otherwise recompute the chain
    ranged = (
        df.repartitionByRange(n_part, F.col(id_col))
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    sums = {
        r[pid]: int(r["s"] or 0)
        for r in ranged.groupBy(pid).agg(F.sum(tokens_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
        f"{pid} int, {off} long",
    )
    w = (
        Window.partitionBy(pid).orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.col(off) + F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (
        ranged.join(F.broadcast(off_df), pid)
        .select(
            id_col, tokens_col,
            F.floor(prev / budget).cast("long").alias("pack_id"),
        )
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
) -> DataFrame:
    """P27 weighted mixture resampling: rebalance a corpus into a
    training mixture by per-group sampling weight w — each row of a
    group with weight w is emitted floor(w) times plus one more with
    probability frac(w) (so w = 0.25 downsamples to a quarter, w = 2.5
    emits 2–3 copies). The copy index is exposed as ``epoch`` so
    downstream packing/shuffling can treat repeats as distinct
    examples.

    Deterministic by construction: the fractional keep is a threshold
    on the 60-bit portable md5 of the row id (millionths resolution),
    NOT rand() — the same rows survive under any partitioning, cluster
    size, or retry, and the DuckDB oracle replays the choice
    bit-identically. This is the property a resumable 100 TB mixture
    job needs: a re-run of one failed partition must re-draw the same
    sample.

    Scale shape: zero shuffles — the weight table enters as a literal
    CASE over the (small) group vocabulary, the keep decision and copy
    explode are narrow per-row ops, so cost is linear in corpus bytes
    and the output inherits the input partitioning."""
    w_expr = F.lit(int(round(default_weight * 1_000_000)))
    for g, w in sorted(weights.items()):
        w_expr = F.when(F.col(group_col) == g, F.lit(int(round(w * 1_000_000)))).otherwise(w_expr)
    probe = F.pmod(md5hash60(id_col), F.lit(1_000_000))
    n = (F.floor(w_expr / 1_000_000) + (probe < w_expr % 1_000_000).cast("int")).cast("int")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )


def tfidf_top_terms(
    df: DataFrame, group_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """P31 TF-IDF salient terms: the top-k terms that characterize
    each group (source/domain/language slice) — the corpus-description
    op used to audit what a 100 TB slice actually contains. idf stays
    the unlogged rational (n_groups + 1)/(df_g + 1) (monotone in df_g;
    no libm ln, so DuckDB replays the doubles bit-exactly — the q49
    discipline).

    Scale shape: token explode → ONE partial-agg groupBy to (group,
    term, tf) — the only corpus-sized shuffle; df and the top-k window
    then run over the (group, term) vocabulary table, which is
    $|vocab|$-sized, not corpus-sized. n_groups is one bounded scalar
    collect."""
    toks = df.select(
        F.col(group_col).alias("grp"), F.explode(words(text_col)).alias("tok")
    )
    tf = toks.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfs = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_g"))
    n_groups = df.select(group_col).distinct().count()
    scored = tf.join(dfs, "tok").withColumn(
        "tfidf",
        F.col("tf") * F.lit(n_groups + 1.0) / (F.col("df_g") + F.lit(1.0)),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("grp").alias(group_col), "tok", "tf",
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


def positional_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, id, pos) positional postings — the classic IR inverted
    index layout (term-major, with in-document positions), the
    substrate phrase queries, proximity scoring and span-level
    provenance all consume. One narrow posexplode; the downstream
    shuffle key is the term, so postings for a term co-locate —
    exactly the layout a distributed index build wants."""
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(words(text_col)).alias("pos", "term")
    )


def phrase_occurrences(postings: DataFrame, terms: list[str]) -> DataFrame:
    """(id, n_occ) exact-phrase match via positional-posting
    intersection: term k of the phrase must appear at pos₀ + k. The
    standard positional-index phrase algorithm — each phrase term
    filters the postings to ONE term's list (pushed to the scan), and
    the k−1 joins run on (id, pos arithmetic) over those single-term
    lists, never the full index. Cost ∝ Σ postings(termᵏ); rare-term
    phrases are near-free, hot-term phrases degrade to the hot list's
    size — the same profile as a production positional index."""
    cur = postings.filter(F.col("term") == terms[0]).select(
        "id", F.col("pos").alias("p0")
    )
    for k, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            F.col("id").alias("_id"), F.col("pos").alias("_p")
        )
        cur = cur.join(
            nxt,
            (F.col("id") == F.col("_id")) & (F.col("_p") == F.col("p0") + k),
        ).drop("_id", "_p")
    return cur.groupBy("id").agg(F.count("*").alias("n_occ"))


def curate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 5,
    min_quality: float = 0.5,
    mixture: dict[str, float] | None = None,
    default_weight: float = 0.75,
    mixture_col: str = "pred_lang",
) -> DataFrame:
    """P30 end-to-end curation pipeline: the composed corpus-prep
    flow an LLM training run feeds on — quality features + filter →
    language-ID → exact dedup (keep-first) → weighted mixture
    resampling keyed on ``mixture_col`` (the predicted language by
    default; corpora whose metadata language is authoritative pass
    their own column). One declarative plan,
    so Catalyst fuses the whole narrow prefix (quality, lang-ID, dedup
    key) into a single codegen'd scan stage.

    Scale shape: exactly one shuffle inside the pipeline at any corpus
    size — the dedup window's hash partition on dup_key (Spark's
    WindowGroupLimit prunes to one row per dup_key map-side first);
    the caller's final aggregate adds its own. Everything else
    (features, argmax
    lang, mixture keep/explode) is per-row column math; the quality
    filter runs BEFORE the dedup shuffle, so rejected bytes never hit
    the wire. Every stage is individually deterministic under
    repartition/retry (md5-keyed dedup + md5-threshold mixture), so a
    resumed 100 TB job re-draws identical output.

    Output: surviving rows of ``df`` with ``n_words``/``quality``
    features, ``pred_lang``, ``dup_key``, and the mixture ``epoch``
    copy index (one row per training epoch copy)."""
    from . import dedup

    d = with_quality(df, text_col).withColumn(
        "pred_lang", lang_pred_expr(words(text_col))
    )
    kept = d.filter(
        (F.col("n_words") >= F.lit(min_words))
        & (F.col("quality") >= F.lit(min_quality))
    )
    surv = dedup.exact_dedup(
        kept, F.substring(F.col(text_col), 1, 40), id_col
    ).filter(F.col("keep"))
    return mixture_sample(
        surv, id_col, mixture_col, mixture or {}, default_weight
    )


# P29: PII patterns — kept to the regex subset Java (Spark) and RE2
# (DuckDB) treat identically, so the oracle replays the scrub bit-exact
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}-\d{3}-\d{4}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """P29 PII scrubbing: redact emails, phone numbers, and IPv4
    addresses to typed placeholder tokens and report per-doc match
    counts — the compliance pass every training corpus runs before
    packing.

    Order matters and is fixed (email → phone → ipv4) so a phone-like
    substring inside an already-redacted email can't double-fire; each
    count is taken BEFORE that pattern's own replacement. Pure JVM
    regexp column math — narrow, zero shuffles, linear in corpus
    bytes; the patterns stay in the Java∩RE2 regex subset so the
    DuckDB oracle replays the scrub byte-for-byte."""
    out = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all("t", F.lit(pat), F.lit(0)))
            .cast("long"),
        ).withColumn("t", F.regexp_replace("t", pat, f"<{kind.upper()}>"))
    return out.select(
        F.col("id").alias(id_col),
        *[F.col(f"n_{k}") for k in PII_PATTERNS],
        F.col("t").alias("text_scrubbed"),
    )


def boilerplate_detect(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    chunk_words: int = 12,
    min_df: int = 2,
) -> DataFrame:
    """Host-scoped boilerplate detection (P26): flag text chunks that
    recur across ≥ ``min_df`` distinct documents of the same group
    (host/source) and score each document by its boilerplate ratio.

    This is the scope that chunk-level dedup (P25) deliberately lacks:
    nav bars, cookie banners, and footer legalese repeat across the
    pages of ONE site — a corpus-wide keep-first would keep each
    chunk's first page intact and only strip the rest, while a quality
    pipeline wants to know, per page, how much of it is site furniture
    (CCNet/trafilatura treat high-DF-within-host paragraphs exactly
    this way). Segmentation is the same deterministic
    ``chunk_words``-word windowing as :func:`~..operators.dedup.chunk_dedup`.

    Scale shape (10^9 docs): the DF table is two partial-aggregated
    groupBys — (group, chunk, doc) then (group, chunk) — so a banner
    repeated on 10^6 pages contributes one combined row per map
    partition at each stage, never a 10^6-row window. The scoring
    join back to chunk occurrences has exactly ONE build row per
    (group, chunk) key, so hot boilerplate keys skew only the probe
    side, which AQE skew-join splits; no broadcast is assumed (the
    per-host dictionary at web scale outgrows a driver).
    """
    w = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        words(text_col).alias("_w"),
    )
    chunks = w.select(
        "id", "grp",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w"), F.lit(chunk_words)),
                lambda s: F.array_join(F.slice("_w", s, chunk_words), " "),
            )
        ).alias("chunk"),
    ).withColumn("k", md5hash60("chunk")).drop("chunk")
    docfreq = (
        chunks.groupBy("grp", "k", "id").agg(F.lit(1))
        .groupBy("grp", "k")
        .agg(F.count("*").alias("df"))
    )
    return (
        chunks.join(docfreq, ["grp", "k"])
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("df") >= min_df).cast("int"))
            .cast("long").alias("n_boiler"),
        )
        .withColumn(
            "boiler_ratio",
            F.round(F.col("n_boiler") / F.col("n_chunks"), 6),
        )
    )


def domain_quality(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 20,
) -> DataFrame:
    """P33: domain-level quality rollup with empirical-Bayes shrinkage
    — the Gopher/RefinedWeb-style pass that filters whole DOMAINS, not
    documents: a source with few docs shouldn't be kept or killed on a
    noisy mean, so its score is shrunk toward the corpus prior by
    pseudo-count ``k``:  shrunk = (n·score + k·prior) / (n + k).

    Determinism at 100 TB: every per-doc feature is an exact INTEGER
    (word/punct/stopword/char counts), aggregated as exact long sums —
    the composite score is then computed from those sums in one fixed
    expression, so the result is partitioning-invariant (no
    order-sensitive double accumulation; the q77 lesson applied to
    means). The prior derives from the same global sums via one
    broadcast scalar row. Two partial-agg shuffles (per-source +
    global), both over 10^5-ish domain rows, corpus touched once.
    """
    t = F.trim(F.col(text_col))
    w = F.split(t, " ")
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    feats = df.select(
        F.col(source_col).alias("source"),
        F.length(t).alias("n_chars"),
        F.size(w).alias("n_words"),
        F.size(
            F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
        ).alias("n_punct"),
        F.size(F.filter(w, lambda x: F.array_contains(en_stop, x))).alias(
            "n_stop"
        ),
    )

    def composite(n_docs, s_words, s_chars, s_punct, s_stop):
        # same weights as the per-doc quality score (with_quality),
        # evaluated over exact aggregate counts — mirror SQL103 exactly
        return F.round(
            F.least(F.lit(1.0), (s_words / n_docs) / F.lit(200.0)) * 0.5
            + (F.lit(1) - F.least(F.lit(1.0), s_punct / s_chars * 10)) * 0.25
            + F.least(F.lit(1.0), s_stop / s_words * 5) * 0.25,
            6,
        )

    agg = feats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("sum_words"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("n_punct").cast("long").alias("sum_punct"),
        F.sum("n_stop").cast("long").alias("sum_stop"),
    )
    scored = agg.select(
        "source", "n_docs", "sum_words",
        composite(
            F.col("n_docs"), F.col("sum_words"), F.col("sum_chars"),
            F.col("sum_punct"), F.col("sum_stop"),
        ).alias("score"),
    )
    prior = feats.agg(
        F.count("*").alias("g_docs"),
        F.sum("n_words").cast("long").alias("g_words"),
        F.sum("n_chars").cast("long").alias("g_chars"),
        F.sum("n_punct").cast("long").alias("g_punct"),
        F.sum("n_stop").cast("long").alias("g_stop"),
    ).select(
        composite(
            F.col("g_docs"), F.col("g_words"), F.col("g_chars"),
            F.col("g_punct"), F.col("g_stop"),
        ).alias("prior")
    )
    return scored.crossJoin(F.broadcast(prior)).select(
        "source", "n_docs", "sum_words", "score",
        F.round(
            (F.col("n_docs") * F.col("score") + F.lit(k) * F.col("prior"))
            / (F.col("n_docs") + F.lit(k)),
            6,
        ).alias("score_shrunk"),
    )


def compression_signal(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """P36: zlib-compression-ratio quality signal — the Gopher/FineWeb
    heuristic: template/repetitive boilerplate compresses to a tiny
    fraction of its size, encrypted/garbled bytes barely compress, and
    natural prose sits in a predictable band, so z_bytes/n_bytes is a
    cheap corpus-quality feature no token statistic replicates.

    Spark posture: one Arrow-batched pandas UDF (zlib is a C call —
    ~100 MB/s/core at level 6), narrow, zero shuffles, linear in
    corpus bytes. Determinism: compressed LENGTH is fixed for a given
    zlib build at a fixed level; the oracle twin runs the same
    sequential zlib over the same bytes (the differential test covers
    the distribution layer — batching, UTF-8 encoding, row alignment
    — the same epistemic shape as the refsim oracles)."""

    @F.pandas_udf("n_bytes bigint, z_bytes bigint")
    def z(texts: pd.Series) -> pd.DataFrame:
        import zlib

        n, zb = [], []
        for t in texts:
            b = (t or "").encode("utf-8")
            n.append(len(b))
            zb.append(len(zlib.compress(b, 6)))
        return pd.DataFrame({"n_bytes": n, "z_bytes": zb})

    return (
        df.select(F.col(id_col).alias("id"), z(F.col(text_col)).alias("_z"))
        .select("id", "_z.n_bytes", "_z.z_bytes")
        .withColumn(
            "z_ratio",
            F.round(F.col("z_bytes") / F.greatest(F.col("n_bytes"), F.lit(1)), 6),
        )
    )


def budget_select(
    df: DataFrame, id_col: str, quality_col: str, cost_col: str, budget: int
) -> DataFrame:
    """P38: token-budgeted corpus selection — keep the greedy quality
    prefix: docs in (quality DESC, id) order while the running token
    total stays ≤ budget. The standard curation step when a training
    mix allots a corpus N tokens, as dataflow.

    Scale shape (10^9 docs): a naive cumulative sum is a single global
    window (one-partition funnel). This is the same fully-distributed
    two-phase prefix sum as schedule.global_schedule's large path:
    range-partition on the order key, collect only the P per-partition
    COST TOTALS (the driver sees P longs, never rows), broadcast the
    partition offsets back, and cum = offset + within-partition
    running sum. The ranged frame is materialized once so the range
    partitioner's sampled boundaries can't re-draw between the totals
    job and the final pass. Costs are longs, so the prefix sums are
    exact and partitioning-invariant; ties in quality break on id —
    a total order, so the selected set is deterministic.
    """
    from pyspark.sql import Window

    from .dedup import _materialize

    spark = df.sparkSession
    n_part = spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(quality_col).alias("q"),
        F.col(cost_col).cast("long").alias("cost"),
    )
    ranged = _materialize(
        base.repartitionByRange(n_part, F.col("q").desc(), F.col("id"))
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = {
        r["_pid"]: r["t"]
        for r in ranged.groupBy("_pid").agg(F.sum("cost").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("q").desc(), "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn("cum_cost", (F.col("_off") + F.sum("cost").over(w)).cast("long"))
        .filter(F.col("cum_cost") <= budget)
        .drop("_pid", "_off")
    )


def epoch_shuffle(
    df: DataFrame, id_col: str, n_epochs: int, seed: str = "ep",
    distributed: bool = False,
) -> DataFrame:
    """P50: deterministic per-epoch global shuffle — the training
    dataloader's example order as dataflow → (epoch, pos, doc_id).

    Epoch e's permutation orders examples by md5-60(seed#e#id) with an
    id tie-break, so the order is total: stable under task retries and
    any partitioning (unlike rand(), which re-draws per attempt),
    reproducible from (seed, epoch) alone — the property a resumable
    trainer needs to skip to mid-epoch position k without replaying the
    stream — and uncorrelated across epochs because the epoch number
    sits inside the hash input.

    Scale shape (10^9 docs × E epochs): position assignment delegates
    to schedule.rank_seq — one window task per epoch at probe scale;
    above ~64k rows the caller flips `distributed` and the same
    fully-distributed two-phase rank as C18 runs (range-partition on
    (epoch, key, id), the driver collects P per-partition COUNTS, never
    rows). Both paths produce identical positions because the order is
    total (pinned in tests). Emitting positions rather than a sorted
    materialization keeps the output joinable back to any storage
    layout without a global sort per epoch."""
    from pyspark.sql import Window

    from .schedule import rank_seq

    keyed = (
        df.select(F.col(id_col).alias("doc_id"))
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))))
        .withColumn(
            "skey",
            md5hash60(
                F.concat_ws(
                    "#",
                    F.lit(seed),
                    F.col("epoch").cast("string"),
                    F.col("doc_id").cast("string"),
                )
            ),
        )
    )
    if distributed:
        n = df.count()  # one scalar: epoch-local pos = global seq - epoch*n
        out = rank_seq(keyed, 0, ["epoch", "skey", "doc_id"], distributed=True)
        out = out.withColumn(
            "pos",
            (F.col("seq") - 1 - F.col("epoch").cast("long") * F.lit(n)).cast("long"),
        )
    else:
        w = Window.partitionBy("epoch").orderBy("skey", "doc_id")
        out = keyed.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
    return out.select("epoch", "pos", "doc_id")


def bpe_merges(df: DataFrame, text_col: str, k_rounds: int = 10) -> DataFrame:
    """P39: distributed BPE merge learning — the tokenizer-training
    prep step. The corpus is scanned ONCE into a word-frequency table;
    every merge round then runs on that compact table (vocab-sized,
    ~10^7 rows at web scale — never the corpus again), which is how
    BPE training stays tractable at 100 TB: corpus bytes cost one
    pass, rounds cost ∝ vocab.

    Per round: count adjacent symbol pairs weighted by word frequency
    (overlapping occurrences counted, standard BPE), partial-aggregated
    groupBy; the argmax (count DESC, then lexicographic (left, right))
    is ONE collected scalar row — the driver holds k_rounds rules,
    never data; the merge applies as a literal string replace over the
    space-separated symbol strings (left-to-right, non-overlapping —
    Spark's replace and Python's str.replace agree exactly, which is
    what makes the sequential pure-Python twin bit-exact).

    Returns (round, left, right, merged, pair_count) — k_rounds rows
    (fewer if the pair table drains first).
    """
    freq = (
        df.select(F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    sym = freq.select("freq", F.array_join(chars, " ").alias("sym"))
    from .dedup import _materialize

    sym = _materialize(sym)
    spark = df.sparkSession
    merges = []
    for r in range(1, k_rounds + 1):
        s = F.split("sym", " ")
        idx = F.when(
            F.size(s) >= 2, F.sequence(F.lit(1), F.size(s) - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            sym.select(
                "freq",
                F.explode(
                    F.transform(
                        idx,
                        lambda i: F.struct(
                            F.element_at(s, i).alias("left"),
                            F.element_at(s, i + 1).alias("right"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.col("pair_count").desc(), F.col("left"), F.col("right")
        ).limit(1).collect()
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        merges.append((r, left, right, left + right, int(cnt)))
        sym = _materialize(
            sym.select(
                "freq",
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                        F.lit(f" {left} {right} "),
                        F.lit(f" {left}{right} "),
                    )
                ).alias("sym"),
            )
        )
    return spark.createDataFrame(
        merges, "round int, left string, right string, merged string, pair_count long"
    )


def bpe_apply(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """P40: tokenize the corpus with learned BPE merges — the apply
    side of :func:`bpe_merges` (the rules are the driver-held
    tokenizer artifact, k tiny rows; holding them on the driver is the
    broadcast-a-model pattern, not a data collect).

    Scale shape (100 TB corpus, 10^7-word vocab): the corpus is
    scanned ONCE into a word-frequency table; the k merges apply over
    the DISTINCT vocab only — k chained literal string replaces on the
    space-joined character string, pure JVM whole-stage codegen, cost
    ∝ vocab × k, never corpus × k. Token counts then explode the
    (vocab-sized) symbol strings weighted by word frequency — a
    partial-aggregated groupBy, so the shuffle carries ≤ vocab ×
    tokens-per-word rows.

    Replace semantics match :func:`bpe_merges` exactly: each merge is
    a literal ``" l r " → " lr "`` replace over the space-padded
    symbol string. Chaining the k replaces over ONE padding is
    equivalent to the per-round pad/replace/trim (each replace
    preserves single spacing and the outer pad), which is what makes
    the sequential pure-Python twin bit-exact.

    Returns (token, n_occurrences): the corpus token-frequency table
    under the learned vocabulary.
    """
    freq = (
        df.select(F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    sym = F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))
    for left, right in merges:
        sym = F.replace(sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} "))
    return (
        freq.select("freq", F.explode(F.split(F.trim(sym), " ")).alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
    )


def classifier_filter(
    df: DataFrame, id_col: str, text_col: str, dims: int = 256
) -> DataFrame:
    """P10 model-based flavor: quality filtering by a hashed-feature
    linear classifier — the FastText-shaped inference dataflow the
    model-filtered corpora (DCLM, FineWeb-Edu) run at 100 TB: hash
    each token (unigrams + bigrams) into a ``dims``-bucket feature
    space, mean-pool the bucket weights, keep docs with positive
    logit. The WEIGHTS here are a deterministic hash-derived stand-in
    (no trained artifact ships in this repo — same discipline as the
    multimodal stub); the dataflow — per-token hashing, weight lookup
    via a literal/broadcast vector, exact pooled aggregation — is the
    real thing, and swapping real weights touches one array literal.

    Exactness: weights are INTEGERS in [-1000, 1000] and the pooled
    sum is a long, so the per-doc logit is an exactly-computed
    rational — no float accumulation order anywhere, hence bit-equal
    across engines and partitionings (the float division + round
    happens once per doc). Zero shuffles: explode → weight lookup is
    narrow; the per-doc sum is a partial-aggregated groupBy(id).

    Output: (id, n_feats, logit, keep) — logit = round(sum_w /
    (1000 · n_feats), 6), keep = sum_w > 0.
    """
    import hashlib

    # w[b] = (md5-60("w#b") % 2001) - 1000 ∈ [-1000, 1000]
    weights = [
        int(hashlib.md5(f"w#{b}".encode()).hexdigest()[:15], 16) % 2001 - 1000
        for b in range(dims)
    ]
    w_arr = F.array(*[F.lit(w) for w in weights])
    toks = df.select(
        F.col(id_col).alias("id"), words(text_col).alias("w")
    ).select(
        "id",
        F.explode(
            F.concat(F.col("w"), shingles(F.col("w"), 2))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    feat = toks.withColumn(
        "wv",
        F.element_at(w_arr, (F.pmod(md5hash60("tok"), F.lit(dims)) + 1).cast("int")),
    )
    return (
        feat.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("wv").cast("long").alias("_sw"),
        )
        .select(
            "id",
            "n_feats",
            F.round(F.col("_sw") / (F.lit(1000.0) * F.col("n_feats")), 6).alias("logit"),
            (F.col("_sw") > 0).alias("keep"),
        )
    )


def bpe_token_counts(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """P40 per-document flavor: (id, n_tokens_bpe) — how many tokens
    each document costs under the learned BPE vocabulary. This is the
    number sequence packing (P24) and token budgeting (P38) should
    consume instead of whitespace word counts: real packing budgets
    are tokenizer tokens.

    Same scale shape as :func:`bpe_apply`: one corpus scan into
    per-doc word counts (partial-aggregated on (id, word)); the merges
    apply over the DISTINCT vocab only (derived from the counts table,
    so the corpus is not rescanned); the join back is vocab-sized on
    the build side (AQE broadcasts while it fits) and the final sum is
    a partial-aggregated groupBy(id).
    """
    wc = (
        df.select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    sym = F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))
    for left, right in merges:
        sym = F.replace(sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} "))
    vocab = wc.select("word").distinct().withColumn(
        "n_toks", F.size(F.split(F.trim(sym), " ")).cast("long")
    )
    return (
        wc.join(vocab, "word")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("n_toks")).alias("n_tokens_bpe"))
    )


def stride_chunks(
    df: DataFrame, id_col: str, text_col: str,
    window: int = 64, stride: int = 48,
) -> DataFrame:
    """(id, chunk_idx, tok_start, n_chunk_tokens, chunk_sig): split
    each document's word stream into overlapping context windows —
    the training-example chunking step between curation and packing
    (long docs become `window`-token examples overlapping by
    `window - stride` tokens so no span is seen only at a boundary).

    Chunk m starts at token 1 + m*stride; the LAST chunk is the first
    whose end reaches the document end (so nothing is emitted that a
    previous chunk already fully covers):
    n_chunks = 1 if n <= window else 1 + ceil((n-window)/stride),
    with the ceil in exact integer math. chunk_sig is md5-60 over the
    '_'-joined token slice — the per-chunk identity downstream chunk
    dedup (P25) consumes.

    Scale shape: one narrow pass — bind the words array, derive
    n_chunks arithmetically, explode a sequence, slice per index. No
    shuffle, no UDF; cost ∝ output tokens ≈ input tokens × window/stride.
    """
    from ..portable import md5hash60

    w = F.split(F.trim(F.col(text_col)), " ")
    d = df.select(F.col(id_col).alias("id"), w.alias("w")).withColumn(
        "n", F.size("w")
    )
    n_chunks = F.when(F.col("n") <= window, F.lit(1)).otherwise(
        F.lit(1)
        + ((F.col("n") - window + stride - 1) / stride).cast("int")
    )
    c = d.select(
        "id", "w", "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).withColumn("tok_start", F.col("chunk_idx") * stride + 1)
    c = c.withColumn(
        "n_chunk_tokens",
        F.least(F.lit(window), F.col("n") - F.col("tok_start") + 1),
    )
    return c.select(
        "id",
        "chunk_idx",
        "tok_start",
        "n_chunk_tokens",
        md5hash60(
            F.array_join(F.slice("w", F.col("tok_start"), F.col("n_chunk_tokens")), "_")
        ).alias("chunk_sig"),
    )


def dsir_weights(
    df: DataFrame, id_col: str, text_col: str, target_pred: Column,
    dims: int = 512,
) -> DataFrame:
    """P55 DSIR-style data selection with importance resampling (Xie
    et al. 2023): score every corpus document by how target-like its
    hashed n-gram profile is, using two bucket models estimated from
    the SAME feature stream — a target model over the rows where
    `target_pred` holds and a corpus model over everything. Docs with
    dsir_score > 1 look more like the target domain than like the
    corpus average; `keep` is that selection.

    Exactness (the q48 discipline): bucket probabilities stay RATIONAL
    (count+1)/(N+B) — no log-likelihoods, whose libm last-ulp differs
    between engines — and the per-doc score is the ratio of two
    mean smoothed probabilities evaluated as exact long sums divided
    once:  dsir = [Σ_b c_db·(t_b+1)]·(N_C+B) / ([Σ_b c_db·(c_b+1)]·(N_T+B)).
    Integer sums partial-aggregate freely on both engines; the only
    float op is one multiply+divide per doc in a fixed shape, and the
    keep decision compares the two long products exactly (no float at
    all). At 10^12-token scale the products approach 2^63 — there the
    comparison moves to the double ratio and the score is a rounded
    estimate; at driver scale everything is exact.

    Scale shape: one corpus scan into per-(doc, bucket) counts (the
    single data-sized shuffle); both models derive from THAT table by
    partial-agg groupBys (dims rows each — broadcast-sized); the score
    join is per-doc-bucket × dims-sized build side (AQE broadcasts);
    the final rollup is a long-sum groupBy(id).

    Output: (id, n_feats, dsir_score, keep).
    """
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            target_pred.alias("is_t"),
            words(text_col).alias("w"),
        )
        .select(
            "id", "is_t",
            F.explode(F.concat(F.col("w"), shingles(F.col("w"), 2))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    per = (
        toks.withColumn("b", F.pmod(md5hash60("tok"), F.lit(dims)))
        .groupBy("id", "is_t", "b")
        .agg(F.count("*").cast("long").alias("c_db"))
    )
    cmod = per.groupBy("b").agg(F.sum("c_db").alias("c_b"))
    tmod = per.filter(F.col("is_t")).groupBy("b").agg(F.sum("c_db").alias("t_b"))
    s = per.agg(
        F.sum("c_db").alias("n_c"),
        F.sum(F.when(F.col("is_t"), F.col("c_db")).otherwise(F.lit(0))).alias("n_t"),
    ).collect()[0]
    ncb = int(s["n_c"]) + dims  # N_C + B, exact
    ntb = int(s["n_t"] or 0) + dims  # N_T + B, exact
    agg = (
        per.join(cmod, "b")
        .join(tmod, "b", "left")
        .withColumn("t_b", F.coalesce(F.col("t_b"), F.lit(0).cast("long")))
        .groupBy("id")
        .agg(
            F.sum("c_db").alias("n_feats"),
            F.sum(F.col("c_db") * (F.col("t_b") + 1)).alias("_num"),
            F.sum(F.col("c_db") * (F.col("c_b") + 1)).alias("_den"),
        )
    )
    return agg.select(
        "id",
        "n_feats",
        F.round(
            (F.col("_num").cast("double") * F.lit(float(ncb)))
            / (F.col("_den").cast("double") * F.lit(float(ntb))),
            6,
        ).alias("dsir_score"),
        (F.col("_num") * F.lit(ncb) > F.col("_den") * F.lit(ntb)).alias("keep"),
    )


def html_to_text(col: Column) -> Column:
    """P56 HTML→text extraction (the trafilatura/resiliparse step every
    web-corpus pipeline runs between fetch and filtering): drop
    script/style subtrees, turn block-level closers into line breaks,
    strip remaining tags, decode the common entities, then trim and
    space-collapse each line and drop empties. Output is
    newline-joined cleaned lines — the unit the line-level quality
    rules (:func:`line_quality_filter`) operate on.

    Pure JVM regexp/replace column math — narrow, zero shuffles,
    linear in corpus bytes. Patterns live in the Java∩RE2∩DuckDB
    regex subset (no lookaround/backrefs) so the oracle replays the
    byte-exact result."""
    c = F.regexp_replace(col, r"<script[^>]*>[^<]*</script>", " ")
    c = F.regexp_replace(c, r"<style[^>]*>[^<]*</style>", " ")
    c = F.regexp_replace(
        c, r"</(title|p|div|nav|footer|h1|h2|h3|li|ul|ol|tr|table)>", "\n"
    )
    c = F.regexp_replace(c, r"<br[ /]*>", "\n")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    lines = F.filter(
        F.transform(
            F.split(c, "\n"),
            lambda l: F.trim(F.regexp_replace(l, " +", " ")),
        ),
        lambda l: l != "",
    )
    return F.array_join(lines, "\n")


def line_quality_filter(
    df: DataFrame, id_col: str, text_col: str, min_words: int = 5
) -> DataFrame:
    """P57 line-level quality filtering (the C4/RefinedWeb line rules):
    drop boilerplate LINES — too few words, navigation separators
    ('|'), copyright marks — and keep the prose. Operates on the
    newline-joined output of :func:`html_to_text`; document-level
    filters (q41/q123) can't remove a nav bar glued to good prose,
    which is exactly what this pass is for.

    Pure higher-order array column math — narrow, zero shuffles. The
    rules are deliberately the deterministic subset (word count,
    substring membership, prefix) so the DuckDB list-lambda twin
    replays the byte-exact kept text.

    Output: (id, main_text, n_lines, n_kept)."""
    lines = F.split(F.col(text_col), "\n")
    keep_l = F.filter(
        lines,
        lambda l: (F.size(F.split(l, " ")) >= min_words)
        & ~l.contains("|")
        & ~l.startswith("(c)"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(keep_l, "\n").alias("main_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(keep_l).cast("long").alias("n_kept"),
    )


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """P58 Gopher-style rule bundle with per-rule attribution (Rae et
    al. 2021 §A1.1, the MassiveWeb filter): the composed keep/reject
    decision production pipelines ship, REPORTED per rule — a doc that
    fails says WHICH rule fired (`rule_mask` bit + named boolean), the
    report curation teams actually read when tuning thresholds.

    Every decision is an exact INTEGER comparison (ratios compared by
    cross-multiplication, never a rounded float), so the verdicts are
    bit-equal across engines and partitionings. Pure column math —
    narrow, zero shuffles, linear in corpus bytes.

    Rules (bit): 0 too few words (<50); 1 too many words (>100k);
    2 mean word length outside [3,10] chars; 3 stopword ratio < 2%;
    4 duplicate-bigram fraction > 30%; 5 top-bigram coverage > 18%.
    keep = no rule fired."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.trim(F.col(text_col)).alias("_t"),
    ).select("id", "_t", F.split("_t", " ").alias("_w"))
    base = base.select(
        "id", "_t", "_w", _word_grams(F.col("_w"), 2).alias("_g2")
    )
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    nw = F.size("_w")
    chars = F.length("_t") - (nw - 1)  # chars inside words
    n_stop = F.size(F.filter("_w", lambda x: F.array_contains(en_stop, x)))
    g2, ng2 = F.col("_g2"), F.size("_g2")
    ndist2 = F.size(F.array_distinct("_g2"))
    top2 = F.when(
        ng2 > 0,
        F.array_max(
            F.transform(
                F.array_distinct("_g2"),
                lambda x: F.size(F.filter(g2, lambda y: y == x)),
            )
        ),
    ).otherwise(F.lit(0))
    rules = [
        ("r_too_few_words", nw < 50),
        ("r_too_many_words", nw > 100_000),
        ("r_word_len", (chars < nw * 3) | (chars > nw * 10)),
        ("r_stop_ratio", n_stop * 50 < nw),
        ("r_dup_bigrams", (ng2 - ndist2) * 10 > ng2 * 3),
        ("r_top_bigram", top2 * 100 > ng2 * 18),
    ]
    out = base.withColumn("n_words", nw.cast("long"))
    mask = F.lit(0).cast("long")
    for bit, (name, cond) in enumerate(rules):
        out = out.withColumn(name, cond)
        mask = mask + F.when(F.col(name), F.lit(1 << bit)).otherwise(0)
    return out.withColumn("rule_mask", mask.cast("long")).withColumn(
        "keep", F.col("rule_mask") == 0
    ).drop("_t", "_w", "_g2")


def weighted_sample_wor(
    df: DataFrame, id_col: str, weight_col: str, k: int,
    salt: str = "wsr1", w_max: int = 8,
) -> DataFrame:
    """P59: weighted sampling WITHOUT replacement — the curation step
    that draws a fixed-size subset where higher-weight docs (longer,
    higher-quality, rarer-language) are proportionally likelier to
    survive, without ever selecting a doc twice.

    Priority rule (libm-free, so it is bit-exact across engines): a doc
    with integer weight w holds w lottery tickets; ticket j's value is
    md5-60(salt#id#j) and the doc's survival priority is its BEST
    (minimum) ticket. The k docs with the smallest priorities win, doc
    id breaking ties. This is uniform sampling without replacement over
    the ticket multiset collapsed to distinct docs — the classic
    integer-weight reduction — and it needs no exp()/ln() draw the way
    Efraimidis–Spirakis keys do, which is exactly what keeps the DuckDB
    twin hash-identical (float libm calls are NOT guaranteed bit-equal
    across engines; 60-bit integer hashes are).

    Determinism: reproducible from (salt, k) alone — stable under task
    retries, partitioning, and resume, the property a training-mix
    rebuild needs. Changing the salt redraws the whole sample.

    Scale shape (10^9 docs): the per-doc priority is array math on a
    generated sequence — NARROW, zero shuffles, no explode (w ≤ w_max
    tickets fold inside one row); the global top-k is orderBy+limit,
    which Spark executes as TakeOrderedAndProject (per-partition heaps
    + a k-row driver merge), never a full sort. Weights are clamped to
    [1, w_max]: ticket cost is bounded by design, and a caller with
    heavier-tailed weights tiers them into [1, w_max] first."""
    w, pri = _ticket_priority(id_col, weight_col, salt, w_max)
    return (
        df.select(F.col(id_col), w.alias("w"), pri.alias("priority"))
        .orderBy("priority", id_col)
        .limit(k)
    )


def _ticket_priority(id_col: str, weight_col: str, salt: str, w_max: int):
    """The P59 ticket rule as (clamped weight, min-ticket priority)
    column expressions — shared by the global (P59) and stratified
    (P60) samplers so both draw from the identical lottery."""
    # coalesce BEFORE clamping: Spark's least/greatest skip nulls, so
    # least(w_max, NULL) would be w_max — a missing weight must degrade
    # to the minimum tier (1 ticket), not the maximum (SQL152 mirrors)
    w = F.greatest(
        F.lit(1).cast("long"),
        F.least(
            F.lit(w_max).cast("long"),
            F.coalesce(F.col(weight_col).cast("long"), F.lit(1).cast("long")),
        ),
    )
    pri = F.array_min(
        F.transform(
            F.sequence(F.lit(1), w.cast("int")),
            lambda j: md5hash60(
                F.concat_ws(
                    "#", F.lit(salt),
                    F.col(id_col).cast("string"), j.cast("string"),
                )
            ),
        )
    )
    return w, pri


def stratified_weighted_sample(
    df: DataFrame, id_col: str, stratum_col: str, weight_col: str, k: int,
    salt: str = "wsr1", w_max: int = 8, n_salt: int = 8,
) -> DataFrame:
    """P60: per-stratum weighted sampling WITHOUT replacement — the k
    ticket-rule winners (P59's libm-free lottery, identical priority
    values via _ticket_priority) within EVERY stratum. This is the
    balanced-selection step a mixture build runs per language, per
    source, or per quality band: each stratum contributes exactly
    min(k, |stratum|) docs, drawn weight-proportionally without
    replacement, deterministically from (salt, k) alone.

    Output: (stratum, id, w, priority, rank) with rank ∈ [1, k] in
    (priority, id) order — the per-stratum draw order, so a consumer
    can take any prefix for a smaller k without redrawing.

    Scale shape (10^9 docs, heavily skewed strata): a stratum is NOT
    one window partition. Phase 1 ranks within (stratum, id-hash
    salt) — n_salt bounded partitions per stratum, each keeping ≤ k —
    and phase 2 exact-ranks the ≤ n_salt·k survivors per stratum: the
    same two-phase salted-window discipline as the crawl's per-host
    cap (operators/schedule.per_host_topk / pattern_cap), so one
    mega-stratum never serializes a single task. Both phases shuffle
    only (stratum, salt)-bounded rows; the priority itself is narrow
    per-row array math (no explode — tickets fold inside one row)."""
    from pyspark.sql import Window

    w, pri = _ticket_priority(id_col, weight_col, salt, w_max)
    base = (
        df.select(
            F.col(stratum_col).alias("stratum"), F.col(id_col),
            w.alias("w"), pri.alias("priority"),
        )
        .withColumn(
            "_s", F.pmod(md5hash60(F.col(id_col).cast("string")), F.lit(n_salt))
        )
    )
    w1 = Window.partitionBy("stratum", "_s").orderBy("priority", id_col)
    w2 = Window.partitionBy("stratum").orderBy("priority", id_col)
    return (
        base.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("stratum", id_col, "w", "priority", "rank")
    )
