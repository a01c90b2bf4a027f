"""Cross-engine TYPE audit for every oracle in the registry.

The driver's correctness hash is typed: DuckDB returning HUGEINT (int128)
where Spark returns BIGINT fails hash_match even when values are equal
(VERDICT round 1: agg_boolean_aggs). The local parity normalizer coerces
Python ints, so this class of bug is invisible to pytest — this tool makes
it visible by comparing the DuckDB *arrow* result schema against the Spark
result schema under a canonical mapping.

Usage: python tools/type_audit.py [sf_dir]   (default /root/testdata/sf0.001)
Prints one line per mismatching query; exit 0 iff clean.
"""

from __future__ import annotations

import sys

import pyarrow as pa
from pyspark.sql import types as T

from kuibadb_spark import registry
from kuibadb_spark.parity import duck_connection
from kuibadb_spark.session import get_spark


def canon_arrow(t: pa.DataType) -> str:
    if pa.types.is_decimal(t):
        # DuckDB HUGEINT arrives as decimal128(38,0) — distinct from int64.
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_int64(t) or pa.types.is_uint64(t):
        return "i64"
    if pa.types.is_int32(t) or pa.types.is_uint32(t):
        return "i32"
    if pa.types.is_int16(t) or pa.types.is_uint16(t):
        return "i16"
    if pa.types.is_int8(t) or pa.types.is_uint8(t):
        return "i8"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_arrow(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_arrow(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_arrow(t.key_type)},{canon_arrow(t.item_type)}>"
    return f"?{t}"


def canon_spark(t: T.DataType) -> str:
    if isinstance(t, T.DecimalType):
        return f"dec({t.precision},{t.scale})"
    if isinstance(t, T.LongType):
        return "i64"
    if isinstance(t, T.IntegerType):
        return "i32"
    if isinstance(t, T.ShortType):
        return "i16"
    if isinstance(t, T.ByteType):
        return "i8"
    if isinstance(t, T.DoubleType):
        return "f64"
    if isinstance(t, T.FloatType):
        return "f32"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.BinaryType):
        return "bin"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(t, T.ArrayType):
        return f"list<{canon_spark(t.elementType)}>"
    if isinstance(t, T.StructType):
        inner = ",".join(f"{f.name}:{canon_spark(f.dataType)}" for f in t.fields)
        return f"struct<{inner}>"
    if isinstance(t, T.MapType):
        return f"map<{canon_spark(t.keyType)},{canon_spark(t.valueType)}>"
    return f"?{t}"


def audit(sf_dir: str, only: set[str] | None = None) -> int:
    spark = get_spark()
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    con = duck_connection(sf_dir)
    bad = 0
    for name in oracles:
        if only and name not in only:
            continue
        try:
            stypes = {
                f.name: canon_spark(f.dataType)
                for f in queries[name](spark, sf_dir).schema.fields
            }
            asch = con.execute(oracles[name]).arrow().schema
            dtypes = {f.name: canon_arrow(f.type) for f in asch}
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            continue
        if set(stypes) != set(dtypes):
            bad += 1
            print(f"COLS  {name}: spark={sorted(stypes)} duck={sorted(dtypes)}")
            continue
        diffs = {
            c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]
        }
        if diffs:
            bad += 1
            print(f"TYPE  {name}: " + " ".join(
                f"{c}[spark={s},duck={d}]" for c, (s, d) in sorted(diffs.items())
            ))
    con.close()
    print(f"audited {len(only) if only else len(oracles)} oracles, {bad} mismatches")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(audit(sf))
