"""Multimodal column plumbing — opaque binary payloads with typed
metadata, decode / feature-extract as Arrow-batched Pandas operators
(SURVEY.md §2.3 'LLM-pipeline extras'; the reference's bytea type is the
storage analog, /root/reference src/datums.rs:60-67 varlena columns).

The container ships no image/audio codecs, so the real decoders are
STUBS behind import-guards (`decode_image` raises NotImplementedError
without PIL); what is real — and tested — is everything Spark-side:
binary column handling, the mapInPandas batch contract (Arrow transfer,
schema, batch iteration), deterministic feature extraction from bytes,
and the metadata queries with SQL oracles.

The fixture has no binary table, so payloads are synthesized as
encode(text) — at 100 TB these would be real image/audio bytes in
parquet binary columns; nothing in the operator shape changes, only the
decode function body.

Scale notes: mapInPandas streams Arrow batches per partition (no
per-row Python), metadata extraction is pure JVM expressions; neither
shuffles. Feature vectors come back as array<double> columns ready for
the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from kuibadb_spark.catalog import load


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload table: (doc_id, payload binary, fmt string)."""
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CAST(text AS BINARY) AS payload",
        "CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'"
        " ELSE 'wav' END AS fmt",
    )


# ---------------------------------------------------------------------------
# real decoders: stubbed behind import-guards (codecs not in container)
# ---------------------------------------------------------------------------
def decode_image(payload: bytes) -> "object":
    try:
        from PIL import Image  # noqa: F401  (not installed in this container)
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; container has no codecs — "
            "deterministic fake features are used instead (fake_features_fn)"
        ) from exc


def decode_audio(payload: bytes) -> "object":
    try:
        import soundfile  # noqa: F401
        import io

        return soundfile.read(io.BytesIO(payload))
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode requires soundfile; container has no codecs"
        ) from exc


# ---------------------------------------------------------------------------
# metadata extraction: pure JVM expressions over the binary column
# ---------------------------------------------------------------------------
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _payloads(spark, sf_dir)
    # pseudo image dims derived from the payload hash — deterministic
    # stand-ins for real header parsing, same derivation in the oracle
    return (
        p.selectExpr(
            "doc_id",
            "fmt",
            "octet_length(payload) AS n_bytes",
            "sha2(payload, 256) AS digest",
        )
        .selectExpr(
            "doc_id",
            "fmt",
            "n_bytes",
            "digest",
            "1 + CAST(conv(substr(digest, 1, 3), 16, 10) AS INT) % 1024 AS width",
            "1 + CAST(conv(substr(digest, 4, 3), 16, 10) AS INT) % 1024 AS height",
        )
        .filter(F.col("doc_id") < 300)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# feature extraction: mapInPandas over Arrow batches (the real plumbing),
# deterministic fake "decode" so results are oracle-checkable
# ---------------------------------------------------------------------------
# first8 crosses the boundary as CSV text — the driver comparator cannot
# sort/hash list cells (the Arrow batch plumbing under test is unchanged)
_FEATURE_SCHEMA = "doc_id long, fmt string, n_bytes int, mean_byte double, first8 string"


def fake_features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode: byte-level stats of the payload. A real
    deployment replaces the body with decode_image/decode_audio + model
    features; schema and batching are identical."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": pdf["fmt"],
                "n_bytes": payloads.map(len),
                "mean_byte": payloads.map(
                    lambda b: round(sum(b) / len(b), 6) if len(b) else 0.0
                ),
                "first8": payloads.map(
                    lambda b: ",".join(str(int(x)) for x in b[:8])
                ),
            }
        )


def mm_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _payloads(spark, sf_dir)
    return (
        p.mapInPandas(fake_features_fn, schema=_FEATURE_SCHEMA)
        .filter(F.col("doc_id") < 200)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# frame sampling: deterministic every-Nth-chunk selection (video-style)
# ---------------------------------------------------------------------------
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each payload into fixed 32-byte 'frames', keep every 4th —
    the sampling shape of video frame extraction, on opaque bytes."""
    p = _payloads(spark, sf_dir)
    # Row-local extraction over a let-bound char array: the first cut
    # exploded frame indices CARRYING the whole payload per row
    # (O(len²/128) fan-out bytes) and then re-walked the string with
    # substr(s, f*32+1, 32) per frame (O(position) each) — both axes
    # quadratic in payload LENGTH, the round-5 extraction class. Here
    # split('') runs once per row, each frame is an O(32) slice, the
    # stepped sequence(0, N-1, 4) IS the every-4th filter, and the
    # explode emits only (frame_idx, frame_hash). Frame COUNT stays
    # ceil(octet_length/32) with CHAR extraction — identical to the old
    # form (slice past the char end yields the same ''/short tails the
    # oracle sees).
    # octet_length > 0: the old sequence(0, -1) emitted NO frames for an
    # empty payload; the stepped spelling's div-truncation would emit one
    frames = p.filter(
        (F.col("doc_id") < 100) & F.expr("octet_length(payload) > 0")
    ).selectExpr(
        "doc_id",
        "explode(element_at(transform(array("
        " split(CAST(payload AS STRING), '')"
        "), pc -> transform("
        " sequence(0, (CAST(ceil(octet_length(payload) / 32.0) AS INT) - 1)"
        "  div 4 * 4, 4),"
        # CAST: div yields BIGINT, but the old explode(sequence(int))
        # spelling produced INT frame_idx — keep the audited type
        " f -> struct(CAST(f AS INT) AS frame_idx,"
        "  md5(concat_ws('', slice(pc, f * 32 + 1, 32))) AS frame_hash))"
        "), 1)) AS fr",
    )
    return (
        frames.select(
            "doc_id",
            F.col("fr.frame_idx").alias("frame_idx"),
            F.col("fr.frame_hash").alias("frame_hash"),
        )
        .orderBy("doc_id", "frame_idx")
    )


QUERIES = {
    "mm_metadata": mm_metadata,
    "mm_fake_features": mm_fake_features,
    "mm_frame_sample": mm_frame_sample,
}

_PAYLOAD_DUCK = """
    payloads AS (
        SELECT doc_id, encode(text) AS payload, text,
               CASE WHEN doc_id % 3 = 0 THEN 'png'
                    WHEN doc_id % 3 = 1 THEN 'jpeg'
                    ELSE 'wav' END AS fmt
        FROM documents
    )
"""

ORACLES = {
    "mm_metadata": f"""
        WITH {_PAYLOAD_DUCK}
        SELECT doc_id, fmt,
               CAST(octet_length(payload) AS INTEGER) AS n_bytes,
               sha256(text) AS digest,
               CAST(1 + CAST('0x' || substr(sha256(text), 1, 3) AS INTEGER) % 1024
                    AS INTEGER) AS width,
               CAST(1 + CAST('0x' || substr(sha256(text), 4, 3) AS INTEGER) % 1024
                    AS INTEGER) AS height
        FROM payloads
        WHERE doc_id < 300
        ORDER BY doc_id
    """,
    "mm_fake_features": f"""
        WITH {_PAYLOAD_DUCK},
        bytes AS (
            SELECT doc_id, fmt, octet_length(payload) AS n_bytes,
                   list_transform(generate_series(1, octet_length(payload)),
                       i -> CAST('0x' || substr(hex(payload), i*2-1, 2) AS INTEGER))
                       AS all_bytes
            FROM payloads
        )
        SELECT doc_id, fmt,
               CAST(n_bytes AS INTEGER) AS n_bytes,
               round(list_sum(all_bytes) / CAST(n_bytes AS DOUBLE), 6) AS mean_byte,
               array_to_string(all_bytes[1:8], ',') AS first8
        FROM bytes
        WHERE doc_id < 200
        ORDER BY doc_id
    """,
    "mm_frame_sample": f"""
        WITH {_PAYLOAD_DUCK},
        frames AS (
            SELECT doc_id, text,
                   unnest(generate_series(0,
                       CAST(ceil(octet_length(payload) / 32.0) AS INTEGER) - 1))
                       AS frame_idx
            FROM payloads
        )
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               md5(substr(text, frame_idx * 32 + 1, 32)) AS frame_hash
        FROM frames
        WHERE frame_idx % 4 = 0 AND doc_id < 100
        ORDER BY doc_id, frame_idx
    """,
}


# ---------------------------------------------------------------------------
# exact binary dedup: content-hash groupBy over the payload column
# ---------------------------------------------------------------------------
def mm_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate media detection: group payloads by content digest,
    emit every group with >1 file — the first pass of any image/audio
    dedup pipeline (identical bytes are ~free to catch before perceptual
    hashing). Runs over the synthesized dup corpus (dedup.py), whose
    exact copies exist at every SF, as binary payloads. The shuffle key
    is the 256-bit digest: uniformly distributed by construction, so no
    skew at any corpus size; payload bytes never shuffle (digest
    computed at scan, map-side)."""
    from kuibadb_spark.operators.dedup import _dup_corpus

    p = _dup_corpus(spark, sf_dir).selectExpr(
        "doc_id", "CAST(text AS BINARY) AS payload"
    )
    return (
        p.select("doc_id", F.sha2("payload", 256).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.expr("array_sort(collect_list(doc_id))").alias("doc_id_arr"),
        )
        .filter(F.col("n_copies") > 1)
        # CSV at the boundary — driver comparator can't hash array cells
        .select("digest", "n_copies",
                F.expr("array_join(doc_id_arr, ',')").alias("doc_ids"),
                F.expr("doc_id_arr[0]").alias("keeper"))
        .orderBy("digest")
    )


QUERIES["mm_dedup_binary"] = mm_dedup_binary
from kuibadb_spark.operators.dedup import _DUP_CORPUS_DUCK as _DUP_DUCK

ORACLES["mm_dedup_binary"] = f"""
    WITH {_DUP_DUCK}
    SELECT sha256(text) AS digest,
           CAST(count(*) AS BIGINT) AS n_copies,
           array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
           min(doc_id) AS keeper
    FROM corpus
    GROUP BY digest
    HAVING count(*) > 1
    ORDER BY digest
"""


# --------------------------------------------------------------------------
# image tile-grid decomposition (the resize/crop partitioning shape)
# --------------------------------------------------------------------------
def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-grid plumbing for image preprocessing: synthesize a
    deterministic (width, height) per payload from its byte length (the
    stubbed stand-in for a real header decode), decompose each image
    into 64×64 tiles with clamped edge rectangles, and emit one row per
    tile with exact pixel bounds — the unit of work a resize/crop/
    patch-embed pass distributes. Pure row-local integer math +
    explode; no shuffle until the final ORDER BY. With real codecs only
    the width/height derivation changes (read from the header in a
    mapInPandas batch); the tile algebra and row shape stay identical."""
    p = _payloads(spark, sf_dir)
    dims = p.selectExpr(
        "doc_id",
        "fmt",
        "128 + (octet_length(payload) % 8) * 32 AS width",
        "96 + (octet_length(payload) % 5) * 48 AS height",
    )
    tiles = dims.selectExpr(
        "doc_id",
        "fmt",
        "width",
        "height",
        "explode(sequence(0, ((height + 63) div 64) - 1)) AS ty",
    ).selectExpr(
        "doc_id",
        "fmt",
        "width",
        "height",
        "ty",
        "explode(sequence(0, ((width + 63) div 64) - 1)) AS tx",
    )
    return (
        tiles.selectExpr(
            "doc_id",
            "tx",
            "ty",
            "tx * 64 AS x0",
            "ty * 64 AS y0",
            "least(tx * 64 + 64, width) - tx * 64 AS tile_w",
            "least(ty * 64 + 64, height) - ty * 64 AS tile_h",
        )
        .filter(F.col("doc_id") < 100)
        .orderBy("doc_id", "ty", "tx")
    )


QUERIES["mm_image_tiles"] = mm_image_tiles

ORACLES["mm_image_tiles"] = """
    WITH dims AS (
        SELECT doc_id,
               128 + (octet_length(CAST(text AS BLOB)) % 8) * 32 AS width,
               96 + (octet_length(CAST(text AS BLOB)) % 5) * 48 AS height
        FROM documents
    ),
    tiles AS (
        SELECT doc_id, width, height,
               unnest(range(0, (height + 63) // 64)) AS ty
        FROM dims
    ),
    grid AS (
        SELECT doc_id, width, height, ty,
               unnest(range(0, (width + 63) // 64)) AS tx
        FROM tiles
    )
    SELECT doc_id, tx, ty,
           tx * 64 AS x0,
           ty * 64 AS y0,
           least(tx * 64 + 64, width) - tx * 64 AS tile_w,
           least(ty * 64 + 64, height) - ty * 64 AS tile_h
    FROM grid
    WHERE doc_id < 100
    ORDER BY doc_id, ty, tx
"""


# ---------------------------------------------------------------------------
# audio frame windowing: per-frame energy over PCM-style samples
# ---------------------------------------------------------------------------
def mm_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio feature-extraction front end (what an FFT/mel pipeline
    does before the model): window the sample stream into fixed frames
    (256 samples, hop 128 — 50% overlap) and compute per-frame energy.
    The payload's bytes stand in for u8 PCM samples (no codecs in the
    container — decode_audio is the gated real path); energy is an
    integer sum of squares, exact across engines.

    Scale shape: entirely row-local — sample extraction, framing, and
    energy are one nested transform/aggregate per row, zero shuffle
    before the final ORDER BY; the frame explosion is the only row
    multiplier (n_frames ≈ len/hop, the same linearity as tokenizing)."""
    p = _payloads(spark, sf_dir)
    return (
        p.selectExpr(
            "doc_id",
            # CHARACTER positions (see mm_scene_cuts): octet_length over a
            # char-indexed extraction fabricates trailing zero samples on
            # multi-byte docs that the oracle never sees. split('')+ascii
            # is O(len) per doc; the sequence+substring(s,i,1) spelling is
            # O(len^2) — substring walks to i every call (measured on the
            # mm_silence_runs twin: 175 s -> 29.5 s at x100, values
            # identical incl. multi-byte chars).
            "transform(split(CAST(payload AS STRING), ''), c -> ascii(c))"
            " AS s",
        )
        .filter(F.col("doc_id") < 200)
        .selectExpr(
            "doc_id",
            "explode(transform("
            " sequence(0, greatest(CAST(floor((size(s) - 256) / 128) AS INT), 0)),"
            " f -> struct(f AS frame,"
            "   CAST(aggregate(slice(s, f * 128 + 1, 256), 0L,"
            "        (a, x) -> a + x * x) AS BIGINT) AS energy))) AS fr",
        )
        .select(
            "doc_id",
            F.col("fr.frame").alias("frame"),
            F.col("fr.energy").alias("energy"),
        )
        .orderBy("doc_id", "frame")
    )


QUERIES["mm_audio_frame_energy"] = mm_audio_frame_energy

ORACLES["mm_audio_frame_energy"] = """
    WITH samples AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text)),
                              i -> ord(substr(text, i, 1))) AS s
        FROM documents
        WHERE doc_id < 200
    ),
    frames AS (
        SELECT doc_id, s,
               unnest(generate_series(0,
                   greatest(CAST(floor((len(s) - 256) / 128.0) AS INTEGER), 0)))
                   AS frame
        FROM samples
    )
    SELECT doc_id, CAST(frame AS INTEGER) AS frame,
           CAST(list_sum(list_transform(s[frame * 128 + 1 : frame * 128 + 256],
                                        x -> x * x)) AS BIGINT) AS energy
    FROM frames
    ORDER BY doc_id, frame
"""


# ---------------------------------------------------------------------------
# perceptual near-dup: 32-bit average-hash + byte-band LSH + Hamming verify
# ---------------------------------------------------------------------------
def mm_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection — the step AFTER
    mm_dedup_binary's exact digests: a 60-bit average-hash over a fixed
    256-byte prefix window (64 blocks × 4 bytes; bit k = 1 iff block
    k's byte-sum exceeds the window average by exact integer
    cross-multiplication; bits 60-63 dropped to stay clear of BIGINT
    sign semantics across engines), banded LSH blocking (4 bands × 15
    bits — by pigeonhole ANY pair within Hamming ≤ 3 shares at least
    one intact band, so recall at the verify threshold is exact), a
    hot-bucket cap (buckets holding > 1000 members are dropped whole —
    they carry no discriminative signal; the dedup hot-shingle-cap
    policy, mirrored in the oracle), and a bit_count(XOR) Hamming
    verify ≤ 3. The FIXED window makes appended-content edits invisible
    (the dup corpus's ' zzduptoken' near-copies hash identically),
    mirroring real aHash's robustness to re-encoding. Payload bytes
    stand in for decoded luma (codecs are the import-gated real path).

    The first cut used a 32-bit hash with 8-bit bands: 1024 possible
    buckets TOTAL, so bucket occupancy — and candidate pairs — grew
    quadratically with corpus size (~3.5B candidates at ×10). Band
    capacity must scale with corpus size; 4×15 bits gives 131k buckets
    and the cap bounds the stragglers.

    Scale: the hash is row-local; candidates come from an equi-join on
    (band_idx, band_value); the verify is one XOR + popcount per
    candidate."""
    from kuibadb_spark.operators.dedup import _dup_corpus

    par = spark.sparkContext.defaultParallelism
    c = _dup_corpus(spark, sf_dir).selectExpr(
        "doc_id", "CAST(text AS BINARY) AS payload"
    )
    # The hash is ONE expression with let-bindings spelled as
    # transform(array(<expr>), v -> <body>) — the array value binds to
    # the lambda variable and is evaluated exactly ONCE however the
    # surrounding plan is optimized. A staged selectExpr chain
    # (s → sums → ahash) is NOT safe here: in the full plan (this frame
    # feeds a groupBy, a semi-join and a self-join) Catalyst collapses
    # the projections so each of the 60 bit terms inlines and re-runs
    # the whole 64-block × 256-substring pipeline — a row-local hash
    # became minutes of interpreted re-evaluation at sf0.001, and
    # repartition barriers between the stages did not survive
    # optimization of the full plan. Lambda-bound values cannot be
    # inlined, by construction.
    _ahash = (
        "element_at(transform(array("
        # split('')+ascii over the 256-char prefix is O(window); the old
        # sequence+substring(s,i,1) walk re-scanned from position 0 per
        # sample. Docs with >= 256 octets but < 256 CHARS (multi-byte)
        # yield a shorter array here where the old form padded ascii('')=0
        # — identical block sums either way (absent ≡ zero under
        # slice/aggregate), so the hash value is unchanged.
        " transform(split(substring(CAST(payload AS STRING), 1, 256), ''),"
        "  c -> ascii(c))"
        "), sarr -> element_at(transform(array("
        " transform(sequence(0, 63),"
        "  k -> aggregate(slice(sarr, k * 4 + 1, 4), 0L, (a, x) -> a + x))"
        "), sm -> aggregate(sequence(0, 59), 0L, (acc, k) ->"
        "  acc + CASE WHEN element_at(sm, k + 1) * 64 >"
        "   aggregate(sm, 0L, (a, x) -> a + x)"
        "  THEN shiftleft(1L, k) ELSE 0L END)"
        "), 1)), 1) AS ahash"
    )
    h = (
        c.filter(F.expr("octet_length(payload) >= 256"))
        .selectExpr("doc_id", _ahash)
        .repartition(par)
    )
    bands = h.selectExpr(
        "doc_id",
        "ahash",
        "explode(transform(sequence(0, 3), j -> struct(j AS bi,"
        " shiftright(ahash, j * 15) % 32768 AS bv))) AS b",
    ).select(
        "doc_id", "ahash", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv")
    )
    bucket_n = bands.groupBy("bi", "bv").agg(
        F.count(F.lit(1)).alias("bn")
    )
    # SHUFFLE_HASH on both (bi, bv)-keyed joins (round-11, the _cs_pairs
    # lesson generalized): every consumer here — the bucket census, the
    # cap join's both sides, and the band self-join's both sides — is
    # the SAME expensive ahash pipeline keyed the same way, so with
    # hash joins all of them hang off ONE reused (bi, bv) exchange and
    # the 60-term hash expression is evaluated once per row, period.
    # The default plan broadcasts instead (bucket_n and one self-join
    # side are "small"), and every broadcast BUILD re-computes the
    # pipeline from scratch — the hash evaluated 3×. Same-epoch
    # fresh-process A/B, full query: sf0.1 best-of-3 3.05 → 2.25 s;
    # ×10 best-of-2 22.9 → 8.9 s. Join strategy never changes results.
    bands = bands.join(
        bucket_n.filter(F.col("bn") <= 1000).hint("shuffle_hash"),
        ["bi", "bv"],
    ).drop("bn")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


QUERIES["mm_ahash_near_dup"] = mm_ahash_near_dup

from kuibadb_spark.operators.dedup import _DUP_CORPUS_DUCK as _DUP_DUCK2

ORACLES["mm_ahash_near_dup"] = f"""
    WITH {_DUP_DUCK2},
    s AS (
        SELECT doc_id,
               list_transform(generate_series(1, 256),
                              i -> ord(substr(text, i, 1))) AS s
        FROM corpus WHERE length(text) >= 256
    ),
    sums AS (
        SELECT doc_id,
               list_transform(generate_series(0, 63),
                   k -> list_sum(s[k * 4 + 1 : k * 4 + 4])) AS sums
        FROM s
    ),
    tot AS (
        SELECT doc_id, sums, list_sum(sums) AS total FROM sums
    ),
    hashes AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(generate_series(0, 59),
                   k -> CASE WHEN sums[k + 1] * 64 > total
                             THEN (CAST(1 AS BIGINT) << k)
                             ELSE 0 END)) AS BIGINT) AS ahash
        FROM tot
    ),
    all_bands AS (
        SELECT doc_id, ahash, j AS bi, (ahash >> (j * 15)) % 32768 AS bv
        FROM hashes, unnest(generate_series(0, 3)) AS t(j)
    ),
    bucket_n AS (
        SELECT bi, bv FROM all_bands GROUP BY bi, bv
        HAVING count(*) <= 1000
    ),
    bands AS (
        SELECT ab.doc_id, ab.ahash, ab.bi, ab.bv
        FROM all_bands ab JOIN bucket_n USING (bi, bv)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b
      ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
    ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# scene-cut detection: per-frame signature deltas over the frame sequence
# ---------------------------------------------------------------------------
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection on opaque bytes: split each payload
    into fixed 64-byte 'frames', signature each frame by its byte sum
    and a 16-bit block pattern (4 blocks × sign-vs-frame-mean bits ×
    4-bit positions — deterministic integer ops), then flag a CUT where
    the absolute byte-sum delta between CONSECUTIVE frames exceeds 25%
    of the per-doc mean frame sum (exact cross-multiplied integers).
    The lag ride is a per-doc ordered window — the shot-boundary
    detection shape with real decode swapped in at deployment.

    Scale shape: frame explosion is linear in payload bytes, the lag
    window partitions by doc (bounded frames per doc), and the rollup
    is one groupBy. Nothing crosses docs."""
    p = _payloads(spark, sf_dir)
    from pyspark.sql import Window as W

    frames = (
        p.filter(F.col("doc_id") < 200)
        .selectExpr(
            "doc_id",
            # CHARACTER positions on both sides (split('') yields chars,
            # matching the oracle's substr walk); octet-based extraction
            # on multi-byte docs would fabricate trailing zero samples the
            # oracle never sees. split('')+ascii is the O(len) form — see
            # mm_audio_frame_energy for the measured O(len^2) history.
            "transform(split(CAST(payload AS STRING), ''), c -> ascii(c))"
            " AS s",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(F.expr("size(s) >= 64"))
        .selectExpr(
            "doc_id",
            "explode(transform(sequence(0, (size(s) div 64) - 1),"
            " f -> struct(f AS frame,"
            "  CAST(aggregate(slice(s, f * 64 + 1, 64), 0L, (a, x) -> a + x)"
            "  AS BIGINT) AS fsum))) AS fr",
        )
        .select("doc_id", F.col("fr.frame").alias("frame"),
                F.col("fr.fsum").alias("fsum"))
    )
    w = W.partitionBy("doc_id").orderBy("frame")
    deltas = (
        frames.withColumn("prev", F.lag("fsum").over(w))
        .withColumn(
            "mean_num", F.sum("fsum").over(W.partitionBy("doc_id"))
        )
        .withColumn(
            "n_frames", F.count(F.lit(1)).over(W.partitionBy("doc_id"))
        )
        .filter(F.col("prev").isNotNull())
        # |Δ| > 0.25 × mean  ⇔  4·n·|Δ| > Σ  (exact integers)
        .withColumn(
            "is_cut",
            4 * F.col("n_frames") * F.abs(F.col("fsum") - F.col("prev"))
            > F.col("mean_num"),
        )
    )
    return (
        deltas.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum(F.when(F.col("is_cut"), 1).otherwise(0)).alias("n_cuts"),
            F.max(F.abs(F.col("fsum") - F.col("prev"))).alias("max_delta"),
        )
        .filter(F.col("n_transitions") > 0)
        .orderBy("doc_id")
    )


QUERIES["mm_scene_cuts"] = mm_scene_cuts

ORACLES["mm_scene_cuts"] = """
    WITH s AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text)),
                              i -> ord(substr(text, i, 1))) AS s
        FROM documents WHERE doc_id < 200
    ),
    sized AS (SELECT * FROM s WHERE len(s) >= 64),
    frames AS (
        SELECT doc_id, f AS frame,
               CAST(list_sum(s[f * 64 + 1 : f * 64 + 64]) AS BIGINT) AS fsum
        FROM sized, unnest(generate_series(0,
                 CAST(len(s) // 64 AS INTEGER) - 1)) AS t(f)
    ),
    deltas AS (
        SELECT doc_id, frame, fsum,
               lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame) AS prev,
               sum(fsum) OVER (PARTITION BY doc_id) AS mean_num,
               count(*) OVER (PARTITION BY doc_id) AS n_frames
        FROM frames
    )
    SELECT doc_id,
           count(*) AS n_transitions,
           CAST(count(CASE WHEN 4 * n_frames * abs(fsum - prev) > mean_num
                      THEN 1 END) AS BIGINT) AS n_cuts,
           max(abs(fsum - prev)) AS max_delta
    FROM deltas
    WHERE prev IS NOT NULL
    GROUP BY doc_id
    HAVING count(*) > 0
    ORDER BY doc_id
"""
