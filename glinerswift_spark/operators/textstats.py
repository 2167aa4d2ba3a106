"""Text-analysis operators: token counts, quality scoring, language ID,
document fingerprinting. All pure column expressions (whole-stage codegen,
zero Python) — at 100 TB these run at scan speed with full column pruning.

Each has a verbatim ANSI-SQL twin in the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from glinerswift_spark.functions.hashing import rolling_word_fingerprint, words_col

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

CLASS_KEYWORDS = {
    "query_heavy": ("scan", "join", "filter", "agg", "group", "sort"),
    "data_heavy": ("table", "row", "column", "key", "value", "data"),
    "stream_heavy": ("stream", "batch", "window", "spark"),
}


def _count_in(words, terms) -> F.Column:
    return F.size(F.filter(words, lambda w: w.isin(*terms)))


def token_count(df: DataFrame) -> DataFrame:
    w = words_col()
    return df.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_types"),
        F.length("text").alias("len_chars"),
    )


def quality_score(df: DataFrame) -> DataFrame:
    """quality = 0.4*type_token_ratio + 0.3*(1-stopword_ratio) + 0.3*min(1, n/100)."""
    w = words_col()
    base = df.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_types"),
        _count_in(w, EN_STOPWORDS).alias("n_stop"),
    ).where(F.col("n_tokens") > 0)
    ttr = F.col("n_types") / F.col("n_tokens")
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    quality = (
        F.lit(0.4) * ttr
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
    )
    return base.select(
        "doc_id",
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame) -> DataFrame:
    """Stopword-marker language guess (deterministic heuristic)."""
    w = words_col()
    n_en = _count_in(w, EN_STOPWORDS)
    return df.select(
        "doc_id",
        F.when(n_en >= 2, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
        n_en.alias("n_markers"),
    )


def doc_fingerprint(df: DataFrame) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint per document."""
    return df.select(
        "doc_id", rolling_word_fingerprint(words_col()).alias("fingerprint")
    )


def _max_frequency(sorted_arr: F.Column) -> F.Column:
    """Max element frequency of a SORTED array as a single fold — equal
    values are adjacent after sorting, so the longest run IS the mode
    count. Zero shuffle, zero Python: the Gopher-style repetition
    signals run at scan speed inside whole-stage codegen."""
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_stats(
    df: DataFrame,
    max_word_frac: float = 0.12,
    max_bigram_frac: float = 0.08,
    min_tokens: int = 50,
) -> DataFrame:
    """Gopher/C4-style repetition filter: fraction of tokens taken by the
    most frequent word and most frequent bigram, plus a keep verdict.
    Boilerplate/spam web pages repeat navigation strings and templated
    bigrams; these two fractions are the cheapest high-recall signals
    (Rae et al. 2021 "Scaling Language Models" §A1.1 uses the same
    family). Fractions are ONE exact-integer division each (correctly
    rounded double — engine-portable, see cooccur_lift)."""
    w = words_col()
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        _max_frequency(F.array_sort(w)).alias("top_word_n"),
        _max_frequency(F.array_sort(bigrams)).alias("top_bigram_n"),
    ).where(F.col("n_tokens") > 0)
    word_frac = F.round(F.col("top_word_n") / F.col("n_tokens"), 6)
    bigram_frac = F.round(
        F.col("top_bigram_n") / F.greatest(F.col("n_tokens") - 1, F.lit(1)), 6
    )
    return base.select(
        "doc_id",
        "n_tokens",
        word_frac.alias("top_word_frac"),
        bigram_frac.alias("top_bigram_frac"),
        (
            (F.col("n_tokens") >= min_tokens)
            & (word_frac <= max_word_frac)
            & (bigram_frac <= max_bigram_frac)
        ).alias("keep"),
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d{1,3} \d{3}-\d{4,6}"


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII census + redaction: counts of email / IPv4 /
    international-phone matches and the text with each match class
    replaced by a typed placeholder — the standard pre-training scrub
    pass. Pure column regexps (whole-stage codegen, zero Python, scan
    speed at any scale).

    Patterns deliberately use only the regex subset where Java (Spark)
    and RE2 (DuckDB/engines) agree — character classes, bounded repeats,
    \\b — no lookaround, so the oracle replays counts AND redacted bytes
    exactly. Redaction order (email, then IPv4, then phone) is part of
    the contract: an email's host can contain digits-and-dots that the
    IPv4 pattern would otherwise claim. Each count is therefore taken on
    the PROGRESSIVELY redacted text — n_ipv4 counts matches the email
    pass left behind, n_phone what the first two passes left — so every
    count equals the number of its placeholders in ``redacted`` (a
    digits-and-dots email host like a@1.2.3.44.co increments n_email
    only, never n_ipv4; round-3 advice item)."""
    t = F.col(text_col)
    n = lambda expr, p: F.coalesce(  # noqa: E731 — local expr shorthand
        F.size(F.regexp_extract_all(expr, F.lit(p), F.lit(0))), F.lit(0)
    )
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    redacted = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    n_email = n(t, PII_EMAIL)
    n_ipv4 = n(after_email, PII_IPV4)
    n_phone = n(after_ip, PII_PHONE)
    return df.select(
        id_col,
        n_email.alias("n_email"),
        n_ipv4.alias("n_ipv4"),
        n_phone.alias("n_phone"),
        (n_email + n_ipv4 + n_phone > 0).alias("has_pii"),
        redacted.alias("redacted"),
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 200,
) -> DataFrame:
    """Corpus vocabulary census: the top_n terms by total term frequency
    (ties: term asc), each with its document frequency. The inventory a
    tokenizer-training / stopword-mining pass needs.

    Scale shape: explode -> groupBy(doc, term) -> groupBy(term) is two
    map-side-combinable aggregations (the first bounds any one doc's
    contribution to its distinct-term count, so a 10^6-word spam page
    cannot flood the term shuffle with duplicate rows), then a TakeOrdered
    top_n — no full sort, no window. Term skew ("the" at 10^10 rows)
    lands on the FIRST groupBy where partial aggregation absorbs it
    map-side; the second groupBy sees one row per (doc, term)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    per_doc = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    agg = per_doc.groupBy("term").agg(
        F.sum("tf_doc").alias("tf"),
        F.count(F.lit(1)).alias("df"),
    )
    return agg.orderBy(F.desc("tf"), "term").limit(top_n)


TFIDF_IDF_SCALE = 1_000_000


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k keywords per document by tf-idf with an INTEGER idf:
    idf_int = (SCALE * n_docs) div df, score_int = tf * idf_int — pure
    BIGINT arithmetic, so Spark and any ANSI engine agree bit-for-bit
    (a float ln() idf would rank identically but hash-differ in the
    last ulp across libm implementations; documented trade: integer
    1/df idf preserves the df-monotone ordering tf-idf needs).

    Scale shape: per-doc term counts (explode + groupBy, map-side
    combined), a document-frequency relation joined back on term (term
    cardinality ~ vocabulary, broadcast when small; an equi-join
    otherwise), corpus size via one crossJoin of a 1-row aggregate
    (never a driver scalar), then a per-doc window top-k — the window
    partitions on doc_id, which is the evenly-distributed key."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    per_doc = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    dfreq = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    total = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        per_doc.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score_int",
            F.expr(f"tf_doc * (({TFIDF_IDF_SCALE} * __n_docs) div __df)"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score_int"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf_doc").cast("long").alias("tf"),
            F.col("score_int").cast("long").alias("score_int"),
        )
    )


def classify_keyword(df: DataFrame) -> DataFrame:
    """Keyword-count classifier: top-1 label by count, ties -> label asc.

    The relational analogue of the reference's classification task top-1
    (ref API/GLiNER2.swift:330-332 — max-by-score)."""
    w = words_col()
    # argmax via array_max over struct(cnt, rk, label): rk reverses the
    # alphabetical order so equal counts resolve to the alphabetically
    # FIRST label (pinned tie-break).
    labels_sorted = sorted(CLASS_KEYWORDS)
    ranked = F.array(
        *[
            F.struct(
                _count_in(w, CLASS_KEYWORDS[lb]).alias("cnt"),
                F.lit(len(labels_sorted) - i).alias("rk"),
                F.lit(lb).alias("label"),
            )
            for i, lb in enumerate(labels_sorted)
        ]
    )
    top = F.array_max(ranked)
    return df.select(
        "doc_id",
        top["label"].alias("top_label"),
        top["cnt"].alias("top_count"),
    )
