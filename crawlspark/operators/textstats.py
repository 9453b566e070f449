"""Text-analysis operators for the training-data pipeline: token
counting, quality scoring, language-ID, and document fingerprinting.

All JVM built-ins (split / regexp / higher-order array functions) —
no Python in the hot path; each has an exact DuckDB-SQL twin for the
driver's oracle gate. These run per-row (narrow, no shuffle), so they
scale linearly with corpus bytes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..portable import md5hash60, words

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


def lang_id(df: DataFrame, id_col: str, text_col: str, spark: SparkSession) -> DataFrame:
    """(id, pred_lang): stopword-profile argmax language-ID.

    Score(lang) = tokens matching that language's stopword list;
    argmax with deterministic lexicographic tie-break ('und' when no
    profile matches). Broadcast profile join — profiles ≪ corpus."""
    profile = spark.createDataFrame(
        [(lang, tok) for lang, toks in sorted(STOPWORDS.items()) for tok in toks],
        "lang string, tok string",
    )
    toks = df.select(F.col(id_col).alias("id"), F.explode(words(text_col)).alias("tok"))
    scores = (
        toks.join(F.broadcast(profile), "tok")
        .groupBy("id", "lang")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql import Window

    # argmax via window (hits desc, lang asc) — deterministic tie-break
    w = Window.partitionBy("id").orderBy(F.col("hits").desc(), F.col("lang").asc())
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("lang").alias("pred_lang"))
    )
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(best, "id", "left").withColumn(
        "pred_lang", F.coalesce("pred_lang", F.lit("und"))
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
