"""[NORTH-RULE, no ref] explicit skew handling for hot keys.

Two complementary tools:

  * ``sources/pages.repartition_salted`` — spread ROWS uniformly by
    hashing the full key (url) before a scan-side compute stage.
  * ``salted_join`` (here) — the mega-domain JOIN pattern: joining a
    pages-scale table to a per-domain dimension on ``domain`` sends
    every row of a hot domain to ONE reducer. Salting replicates the
    (small) dimension side ``salt_buckets`` times and gives each big-
    side row a deterministic salt, so the hot key's rows spread across
    ``salt_buckets`` tasks. The result is identical to the plain join;
    use when the dimension is too large to broadcast (broadcast is
    always the first choice — AQE's skew-join handles residual cases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of ``big`` against a non-broadcastable but
    replicable ``small`` side.

    Each big-side row gets salt = xxhash64(all columns) % salt_buckets
    (deterministic, uniform even when the join key is 99% one value);
    the small side is replicated once per salt. Joining on
    ``on + [salt]`` yields exactly the plain join's rows — every big
    row holds one salt and the small side covers all of them — while a
    hot key's rows land on ``salt_buckets`` reducers instead of one.
    Supported ``how``: inner / left (the replicated side must be the
    lookup side)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    ).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [*on, "__salt"], how).drop("__salt")
