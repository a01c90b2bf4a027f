"""Skew-salting: the manual remedy when one join key dominates a shuffle
(AQE's skew-join splitting is enabled by default in session.py; salting
is the explicit form for deterministic plans and pre-AQE engines).

Pattern: the skewed (large) side gets a deterministic salt in [0, S);
the small side is replicated S× with every salt value; the join key
becomes (key, salt), spreading the hot key over S reducers. The salt is
md5-derived from a stable row id — never rand() — so results and tests
are reproducible.

At 100 TB: pick S ≈ (hot-key row count / target partition size); the
replication cost is S× the SMALL side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salt_column(stable_id: F.Column, n_salts: int) -> F.Column:
    """Deterministic salt in [0, n_salts) from a stable row id."""
    return (
        F.conv(F.substring(F.md5(stable_id.cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_salts
    ).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key_large: str,
    key_small: str,
    stable_id: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Result is identical to `large.join(small, key)`; the shuffle spreads
    each join key over n_salts partitions.
    """
    salted_large = large.withColumn("_salt", salt_column(F.col(stable_id), n_salts))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(
        replicated_small,
        (salted_large[key_large] == replicated_small[key_small])
        & (salted_large["_salt"] == replicated_small["_salt"]),
        how,
    )
    return out.drop("_salt")
