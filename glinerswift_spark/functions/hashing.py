"""Hash/shingle column expressions shared by dedup + linking operators.

All hashes are built from ``md5`` over explicit string salts so that the
exact same signature is computable in any ANSI SQL engine (the DuckDB
correctness oracle recomputes them verbatim). MinHash uses the classic
min-over-hashed-shingles construction; banding with one hash per band
gives LSH candidate generation whose recall/precision is tuned by
``num_bands`` (candidates are always verified downstream — exact jaccard
or embedding cosine — so false positives only cost work, not accuracy).

Scale notes: signatures are computed scan-side (narrow, codegen'd
expressions — no Python), so the only shuffle is the groupBy/join on
(band, signature), whose key cardinality ~= num_bands * num_docs. Hot
buckets (boilerplate pages sharing a signature) are the classic LSH skew
case: AQE skew-join splitting plus the ``max_bucket_size`` guard in
operators/dedup.py bound the blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MOD = 1_000_000_007


def words_col(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def shingles_expr(words: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined) of a words array."""
    idx = F.sequence(F.lit(0), F.size(words) - n)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


def minhash_band_sig(shingles: Column, band: int) -> Column:
    """min(md5('<band>:' || shingle)) — lexicographic min over hex strings."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{band}:"), s)))
    )


def rolling_word_fingerprint(words: Column) -> Column:
    """Polynomial rolling hash over word codes, mod 1e9+7.

    code(word) = ascii(first char) * 131 + length(word); fold
    acc -> (acc * 31 + code) % MOD. Order-sensitive document fingerprint
    (two docs with the same words in different order differ), exactly
    recomputable in SQL (list_reduce in DuckDB).
    """
    codes = F.transform(words, lambda w: F.ascii(w) * 131 + F.length(w))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c.cast("long")) % F.lit(MOD).cast("long"),
    )


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity (math mirrors ref Inference/SimilarityScorer.swift:77-100)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
