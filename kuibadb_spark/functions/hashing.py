"""Cross-engine deterministic hashing helpers.

Engine-native hashes (Spark xxhash64, DuckDB hash) differ by design, so
every dedup/LSH operator keys on md5 — identical in both engines — and
converts hex prefixes to integers when a numeric hash is needed:

- Spark:  conv(substr(md5(x), 1, 15), 16, 10) :: BIGINT  (60 bits)
- DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)

At scale this is a conscious trade: md5 is slower than xxhash64 but the
determinism is what makes results reproducible across engines/runs; for
pure-Spark pipelines swap in xxhash64 — every operator takes the hash
expression as a seam.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_int_spark(col: Column, hex_chars: int = 15) -> Column:
    """First `hex_chars` of md5 as a non-negative bigint (≤60 bits)."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("bigint")


def md5_int_duck(expr: str, hex_chars: int = 15) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, {hex_chars}) AS BIGINT)"
