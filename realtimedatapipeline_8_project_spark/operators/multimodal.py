"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side machinery — schema, partition-preserving mapInPandas, Arrow
batch shapes, metadata extraction — is real and tested. The actual media
decode (PIL/ffmpeg/etc.) is STUBBED behind ``decode_media``: the libraries
are not in this container, so the stub produces a deterministic fake
"decoded" payload from the bytes. Swap ``_fake_decode`` for a real decoder
and nothing else changes.

Design for 100 TB of media:
* media stays an opaque ``binary`` column; Spark never interprets it JVM-side,
* per-file work happens in ``mapInPandas`` (Arrow-batched, streaming
  iterator — bounded memory per task regardless of partition size),
* metadata (dims, duration, codec) becomes ordinary columns so downstream
  filtering/pruning is Catalyst-native (filter on ``width`` never touches
  bytes),
* batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  to keep executor memory flat.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import load_table

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("sha256", StringType(), True),
    ]
)

DECODED = StructType(
    MEDIA.fields
    + [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: each text
    becomes an opaque binary payload (what an image/audio blob would be)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the opaque payload column.

    mapInPandas streams an iterator of pandas batches — constant memory per
    task; schema widens MEDIA -> DECODED.

    The decode body is a fully self-contained closure: cloudpickle ships it
    by value, so workers need no access to this package (the driver may run
    from any cwd/deploy layout). The inner ``fake_decode`` STUBS the real
    media decoder (PIL.Image.open / av.open / ...) with deterministic dims
    derived from the payload hash; swap that one function for a real
    decoder and nothing else changes."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake_decode(payload: bytes) -> tuple[int, int, int]:
            h = _hl.sha256(payload).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 30

        for pdf in batches:
            dims = [fake_decode(bytes(p)) for p in pdf["payload"]]
            pdf = pdf.assign(
                width=[d[0] for d in dims],
                height=[d[1] for d in dims],
                n_frames=[d[2] for d in dims],
            )
            yield pdf

    return df.mapInPandas(_decode, schema=DECODED)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: explode sampled frame indices as rows
    (the real frame bytes come from the decoder stub downstream)."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return df.where(F.col("kind") == "video").select(
        "media_id",
        "sha256",
        F.explode(idx).alias("frame_idx"),
    )


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable slice of the multimodal pipeline: byte-level
    metadata of the opaque payload column (no Python in this path)."""
    media = synthesize_media(spark, sf_dir)
    return media.select("media_id", "kind", "byte_len", "sha256")


ORACLE_MEDIA_METADATA = """
SELECT doc_id AS media_id,
       (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256
FROM documents
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded metadata via the mapInPandas stub, aggregated per kind so
    the check is cheap at any scale. Oracle-checked: the stub decoder's
    dims are sha256-derived, so DuckDB replays them with hex-digit
    arithmetic — verifying the whole Arrow mapInPandas path (schema
    widening, batching, closure shipping) against SQL."""
    decoded = decode_media(synthesize_media(spark, sf_dir))
    return decoded.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("byte_len").alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("n_frames").alias("avg_frames"),
    )


def _oracle_hex_byte(pos: int) -> str:
    """DuckDB expression for byte ``pos`` (0-based) of sha256(text) as an
    int: two hex digits decoded via position in the hex alphabet."""
    hi, lo = 2 * pos + 1, 2 * pos + 2
    return (
        f"(16 * (strpos('0123456789abcdef', substr(hx, {hi}, 1)) - 1)"
        f" + strpos('0123456789abcdef', substr(hx, {lo}, 1)) - 1)"
    )


ORACLE_MEDIA_DECODE = f"""
WITH m AS (
  SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
         octet_length(encode(text)) AS byte_len,
         sha256(text) AS hx
  FROM documents
), d AS (
  SELECT kind, byte_len,
         64 + {_oracle_hex_byte(0)} % 192 AS width,
         1 + {_oracle_hex_byte(2)} % 30 AS n_frames
  FROM m
)
SELECT kind, COUNT(*) AS n,
       CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
       AVG(width) AS avg_width,
       AVG(n_frames) AS avg_frames
FROM d GROUP BY kind
"""


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling plan for the video rows: one exploded
    (media_id, frame_idx) row per frame to decode. Runs through the
    Arrow decode stub for n_frames, then pure JVM sequence+explode — the
    oracle replays the stub's sha256-derived frame counts in SQL, so the
    whole mapInPandas -> explode pipeline is value-checked."""
    decoded = decode_media(synthesize_media(spark, sf_dir))
    return frame_sample(decoded).select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


ORACLE_MEDIA_FRAME_SAMPLE = f"""
WITH m AS (
  SELECT doc_id AS media_id, sha256(text) AS hx
  FROM documents
  WHERE (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] = 'video'
), d AS (
  SELECT media_id, 1 + {_oracle_hex_byte(2)} % 30 AS n_frames FROM m
)
SELECT media_id,
       CAST(unnest(range(0, n_frames, 10)) AS BIGINT) AS frame_idx
FROM d
"""


QUERIES = {
    "media_metadata": (q_media_metadata, ORACLE_MEDIA_METADATA),
    "media_decode_stub": (q_media_decode, ORACLE_MEDIA_DECODE),
    "media_frame_sample": (q_media_frame_sample, ORACLE_MEDIA_FRAME_SAMPLE),
}


# --- resize stub (r12 earmark; REGISTERED r13 as media_resize, funded
# by media_decode_stub's slot — see the QUERIES entry below) -----------------
# The remaining named multimodal op: aspect-preserving resize planning +
# the Arrow-batched "pixel work" stub. The Spark-side plumbing (schema
# widening DECODED -> RESIZED, batch iteration, self-contained closure)
# is real; the pixel transform is the documented deterministic fake
# (digest of payload + target dims) exactly like fake_decode — swap the
# inner function for PIL.Image.resize and nothing else changes. Output
# dims are pure integer math (longest side -> RESIZE_TARGET, other side
# floor-scaled), so the DuckDB oracle replays dims AND digest.

RESIZE_TARGET = 224

RESIZED = StructType(
    DECODED.fields
    + [
        StructField("out_w", IntegerType(), True),
        StructField("out_h", IntegerType(), True),
        StructField("resized_sha256", StringType(), True),
    ]
)


def resize_media(df: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Arrow-batched resize over decoded frames (constant memory per
    task; the closure ships by value — no package import on workers)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def fake_resize(payload: bytes, w: int, h: int) -> tuple:
            if w >= h:
                ow, oh = target, (h * target) // w
            else:
                ow, oh = (w * target) // h, target
            digest = _hl.sha256(
                bytes(payload) + f":{ow}x{oh}".encode()
            ).hexdigest()
            return ow, oh, digest

        for pdf in batches:
            outs = [
                fake_resize(p, w, h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pdf.assign(
                out_w=[o[0] for o in outs],
                out_h=[o[1] for o in outs],
                resized_sha256=[o[2] for o in outs],
            )

    return df.mapInPandas(_resize, schema=RESIZED)


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plan + stub digests for the image rows: decode (stub) ->
    resize (stub), both Arrow passes value-checked by the SQL replay."""
    decoded = decode_media(synthesize_media(spark, sf_dir))
    return resize_media(decoded.where(F.col("kind") == "image")).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("out_w").cast("long").alias("out_w"),
        F.col("out_h").cast("long").alias("out_h"),
        "resized_sha256",
    )


ORACLE_MEDIA_RESIZE = f"""
WITH m AS (
  SELECT doc_id AS media_id, text, sha256(text) AS hx
  FROM documents
  WHERE (['image','audio','video'])[CAST(doc_id % 3 AS INTEGER) + 1] = 'image'
), d AS (
  SELECT media_id, text,
         64 + {_oracle_hex_byte(0)} % 192 AS width,
         64 + {_oracle_hex_byte(1)} % 192 AS height
  FROM m
), r AS (
  SELECT media_id, text, width, height,
         CASE WHEN width >= height THEN {RESIZE_TARGET}
              ELSE (width * {RESIZE_TARGET}) // height END AS out_w,
         CASE WHEN width >= height
              THEN (height * {RESIZE_TARGET}) // width
              ELSE {RESIZE_TARGET} END AS out_h
  FROM d
)
SELECT media_id, CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height,
       CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
       sha256(text || ':' || out_w || 'x' || out_h) AS resized_sha256
FROM r
"""

# registered r13 (VERDICT r12 #6): slot funded by retiring
# media_decode_stub, whose decode replay (payload digest + planned dims)
# is embedded VERBATIM inside this oracle's chain — the decode stub's
# semantics stay driver-verified through every media_resize row.
QUERIES["media_resize"] = (q_media_resize, ORACLE_MEDIA_RESIZE)


# --- exact media dedup by content hash -------------------------------------
# The binary-column twin of dedup_exact_fingerprint: identical payloads
# collapse on their sha256 regardless of metadata/id. At 100 TB of media
# this is THE first dedup pass (content-addressed storage): one shuffle
# of (hash, id, byte_len) — payload bytes never move. The fixture plants
# re-ingested copies (same payload, new media_id) of every 15th item.

MDUP_EVERY = 15
MDUP_OFFSET = 1_000_000


def q_media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, sf_dir)
    copies = media.where(F.col("media_id") % MDUP_EVERY == 0).select(
        (F.col("media_id") + MDUP_OFFSET).alias("media_id"),
        "kind",
        "payload",
        "byte_len",
        "sha256",
    )
    corpus = media.unionByName(copies)
    return corpus.groupBy("sha256").agg(
        F.min("media_id").alias("survivor_media_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("byte_len").alias("byte_len"),
        ((F.count(F.lit(1)) - 1) * F.min("byte_len")).alias("dup_bytes"),
    )


ORACLE_MEDIA_DEDUP_EXACT = f"""
WITH media AS (
  SELECT doc_id AS media_id, sha256(text) AS sha256,
         CAST(length(text) AS BIGINT) AS byte_len
  FROM documents
), corpus AS (
  SELECT media_id, sha256, byte_len FROM media
  UNION ALL
  SELECT media_id + {MDUP_OFFSET}, sha256, byte_len
  FROM media WHERE media_id % {MDUP_EVERY} = 0
)
SELECT sha256,
       MIN(media_id) AS survivor_media_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(byte_len) AS byte_len,
       CAST((COUNT(*) - 1) * MIN(byte_len) AS BIGINT) AS dup_bytes
FROM corpus
GROUP BY sha256
"""

QUERIES["media_dedup_exact"] = (q_media_dedup_exact, ORACLE_MEDIA_DEDUP_EXACT)


# --- perceptual near-dup: aHash + banded Hamming LSH (r15 earmark) ----------
# The multimodal family's NEAR-dup member (exact dedup collapses only
# byte-identical payloads; re-encoded / lightly-edited media needs a
# perceptual hash). Classic average-hash shape: decode -> fixed 64-cell
# downscale -> bit_j = (cell_j >= mean) -> 64-bit signature; near-dups =
# pairs within Hamming distance PH_HAM_T, found by the simhash_neardup
# banding discipline (4 x 16-bit bands; any pair with Hamming <= 3 must
# agree on >= 1 band by pigeonhole, so recall is EXACT — never
# all-pairs). The "downscale" is the documented deterministic stub
# (64 contiguous byte-chunk sums of the payload — structurally a real
# luma downscale: local edits move few cells); swap the inner function
# for a real decode+resize+grayscale and nothing else changes. Unlike
# SimHash (xxhash64, rows-only check), every stage here is integer math
# DuckDB replays — the whole Arrow hash pass AND the banded join are
# value-checked by the oracle.
#
# At 100 TB: payload bytes are read ONCE in the Arrow pass and never
# shuffle — only (media_id, two int64 halves) leave the scan; the band
# self-join keys on 4 x (band, 16-bit value) rows per item, and the
# Hamming verify is two bit_counts per candidate. Banding selectivity
# is corpus-dependent (low-entropy corpora co-band more — measured on
# the worst-case synthetic fixture: top bucket 52 of 5417 items, 21k
# candidates vs 14.7M all-pairs); AQE handles hot band values at scale.

PH_EVERY = 12
PH_OFFSET = 3_000_000
PH_HAM_T = 3

PHASHED = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("phash_lo", LongType(), True),
        StructField("phash_hi", LongType(), True),
    ]
)


def _pairing_admitted(corpus: DataFrame) -> DataFrame:
    """The degenerate-payload gate, ONE spelling shared by the full,
    incremental, and streaming pairing paths (review r15): NULL/empty
    payloads are MISSING media, not near-duplicate media — they all
    hash to the identical all-ones signature, so admitting k of them
    (routine in a real crawl) would emit C(k,2) Hamming-0 "pairs" and
    one maximally hot band."""
    return corpus.where(
        F.col("payload").isNotNull() & (F.length("payload") > 0)
    )


def phash_media(df: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hash over (media_id, payload): 64
    chunk-sum cells -> average-hash bits -> two int64 halves (bits
    0-31 in phash_lo, 32-63 in phash_hi — split so neither half
    touches the sign bit). Self-contained closure (ships by value);
    cell_j of byte position p is (p*64) DIV n, the exact formula the
    DuckDB oracle replays. A NULL/empty payload hashes to all-ones
    (zero cells, zero total: 64*0 >= 0) — identically in both
    engines."""

    def _phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        shifts = np.arange(32, dtype=np.int64)

        def fake_phash(payload) -> tuple[int, int]:
            b = np.frombuffer(
                bytes(payload) if payload is not None else b"",
                dtype=np.uint8,
            ).astype(np.int64)
            cells = np.zeros(64, dtype=np.int64)
            if b.size:
                idx = (np.arange(b.size, dtype=np.int64) * 64) // b.size
                np.add.at(cells, idx, b)
            total = int(cells.sum())
            bits = (64 * cells >= total).astype(np.int64)
            return (
                int((bits[:32] << shifts).sum()),
                int((bits[32:] << shifts).sum()),
            )

        for pdf in batches:
            hs = [fake_phash(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash_lo": [h[0] for h in hs],
                    "phash_hi": [h[1] for h in hs],
                }
            )

    return df.mapInPandas(_phash, schema=PHASHED)


def phash_neardup_pairs(corpus: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id_a, media_id_b, hamming) for
    every pair within Hamming distance PH_HAM_T: Arrow hash pass, then
    the simhash_neardup banding shape — explode 4 x 16-bit signature
    bands, equi-join on (band, bits) with id-ordering, distinct,
    verify exact Hamming via two bit_counts. Recall is exact for
    Hamming <= 3 (pigeonhole over 4 bands); the join is always banded
    equi (plan-pinned: no cartesian).

    NULL/EMPTY payloads are gated out of pairing (review r15): they
    all hash to the identical all-ones signature, so k missing blobs
    in a real crawl would otherwise emit C(k,2) Hamming-0 "pairs" and
    one maximally hot band — and semantically they are MISSING media,
    not near-duplicate media (the gram_ingest NULL-text discipline).
    UNIFORM payloads also collide at all-ones; that one stays: a flat
    image perceptually IS a duplicate of another flat image — the
    known, documented aHash degeneracy."""
    corpus = _pairing_admitted(corpus)
    # NO pre-hash repartition (deliberate, unlike simhash_neardup's
    # text pass): rebalancing here would shuffle the payload BYTES —
    # the one thing this operator promises never moves. Measured at
    # sf0.1: the rebalance does not help anyway (1.48 s -> 1.39 s best
    # iteration, inside noise; the per-payload numpy hash is ~µs/doc,
    # so the fixture's 2-slice scan is not the bottleneck).
    bands = _bands_of(phash_media(corpus))
    left, right = bands.alias("l"), bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bits") == F.col("r.bits"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("media_id_a"),
            F.col("r.media_id").alias("media_id_b"),
            F.col("l.phash_lo").alias("alo"),
            F.col("l.phash_hi").alias("ahi"),
            F.col("r.phash_lo").alias("blo"),
            F.col("r.phash_hi").alias("bhi"),
        )
        .dropDuplicates(["media_id_a", "media_id_b"])
    )
    hamming = (
        F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
        + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi")))
    ).cast("long")
    return cand.select(
        "media_id_a", "media_id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= PH_HAM_T)


# the fixture-only ASCII bridge (review r15): the OPERATOR is
# byte-based (media payloads), but the oracle can only address text by
# CHARACTER (ascii(substr(...)); DuckDB has no blob byte indexing), so
# the q_ fixture constructions normalize the document text to ASCII in
# BOTH engines — after stripping, byte position == char position and
# byte value == code point by construction, instead of by the accident
# of the current fixture being pure ASCII. Java and RE2 read the
# class identically.
_ASCII_RE = "[^\\x00-\\x7F]"


def _ascii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized, gated fixture docs — the exact Spark twin of
    _ORACLE_ASCII_BASE (NULL/empty gated HERE so planted copies derive
    from the same population in both engines)."""
    return (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.regexp_replace("text", _ASCII_RE, "").alias("text"),
        )
        .where(F.length("text") > 0)
    )


# the oracle twin of _ascii_docs + _pairing_admitted: normalized text,
# NULL/empty gated out (post-normalization char length == payload byte
# length, so the length gates agree by construction)
_ORACLE_ASCII_BASE = f"""base AS (
  SELECT media_id, text FROM (
    SELECT doc_id AS media_id,
           regexp_replace(text, '{_ASCII_RE}', '', 'g') AS text
    FROM documents
    WHERE text IS NOT NULL
  ) WHERE length(text) > 0
)"""


def q_media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the media corpus plus planted
    lightly-edited copies (every PH_EVERY-th item re-ingested with ONE
    byte changed — the re-encode/edit analog; a single-byte edit moves
    one cell, so the planted pairs land at small Hamming and the
    banding must recover them)."""
    docs = _ascii_docs(spark, sf_dir)
    pert = docs.where(F.col("doc_id") % PH_EVERY == 0).select(
        (F.col("doc_id") + PH_OFFSET).alias("doc_id"),
        F.concat(
            F.expr("substr(text, 1, length(text) DIV 2)"),
            F.lit("~"),
            F.expr("substr(text, length(text) DIV 2 + 2)"),
        ).alias("text"),
    )
    corpus = docs.unionByName(pert).select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return phash_neardup_pairs(corpus)


def _oracle_phash_pairs(corpus_cte: str, final_and: str = "") -> str:
    """ONE spelling of the oracle hash->band->verify pipeline (review
    r15: the full and incremental oracles differ only in their corpus
    CTE and final restriction — duplicating the ~45-line pipeline body
    would let a one-sided edit silently model two different hash
    functions). ``corpus_cte`` must define corpus(media_id, text) on
    top of the shared ASCII-normalized base; ``final_and`` is ANDed
    onto the final selection."""
    return f"""
WITH {_ORACLE_ASCII_BASE}, {corpus_cte}, pos AS (
  SELECT media_id, text, length(text) AS n,
         unnest(range(1, length(text) + 1)) AS i
  FROM corpus
), cellsum AS (
  SELECT media_id, ((i - 1) * 64) // n AS cell,
         SUM(ascii(substr(text, i, 1))) AS s
  FROM pos GROUP BY 1, 2
), cells AS (
  SELECT c.media_id, g.cell, COALESCE(cs.s, 0) AS s
  FROM corpus c
  CROSS JOIN (SELECT unnest(range(64)) AS cell) g
  LEFT JOIN cellsum cs ON cs.media_id = c.media_id AND cs.cell = g.cell
), tot AS (
  SELECT media_id, SUM(s) AS total FROM cells GROUP BY 1
), bits AS (
  SELECT c.media_id, c.cell,
         CASE WHEN 64 * c.s >= t.total THEN 1 ELSE 0 END AS bit
  FROM cells c JOIN tot t USING (media_id)
), hash AS (
  SELECT media_id,
         SUM(CASE WHEN cell < 32
                  THEN bit * (CAST(1 AS BIGINT) << cell) ELSE 0 END) AS lo,
         SUM(CASE WHEN cell >= 32
                  THEN bit * (CAST(1 AS BIGINT) << (cell - 32))
                  ELSE 0 END) AS hi
  FROM bits GROUP BY 1
), bx AS (
  SELECT media_id, lo, hi, unnest(range(4)) AS band FROM hash
), bands AS (
  SELECT media_id, lo, hi, band,
         CASE WHEN band = 0 THEN lo & 65535
              WHEN band = 1 THEN (lo >> 16) & 65535
              WHEN band = 2 THEN hi & 65535
              ELSE (hi >> 16) & 65535 END AS bits
  FROM bx
), cand AS (
  SELECT DISTINCT l.media_id AS media_id_a, r.media_id AS media_id_b,
         l.lo AS alo, l.hi AS ahi, r.lo AS blo, r.hi AS bhi
  FROM bands l
  JOIN bands r
    ON l.band = r.band AND l.bits = r.bits AND l.media_id < r.media_id
)
SELECT media_id_a, media_id_b,
       CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi))
            AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= {PH_HAM_T}
  {final_and}
"""


ORACLE_MEDIA_PHASH_NEARDUP = _oracle_phash_pairs(
    f"""corpus AS (
  SELECT media_id, text FROM base
  UNION ALL
  SELECT media_id + {PH_OFFSET},
         substr(text, 1, length(text) // 2) || '~' ||
         substr(text, length(text) // 2 + 2)
  FROM base WHERE media_id % {PH_EVERY} = 0
)"""
)


# --- incremental (delta-vs-base) perceptual near-dup ------------------------
# The crawl-snapshot question for media: classify a NEW batch against
# the existing corpus WITHOUT re-hashing the corpus — the base side
# contributes only its stored 16-byte hash rows (at scale: the
# maintained artifact streaming/phash_ingest.py appends), never its
# payload bytes. Semantics = the full operator over (base ∪ delta)
# restricted to pairs touching the delta (machine-pinned identity,
# tests/test_media_phash.py). Fixture delta per the _sub_delta
# discipline: single-byte-edited near-copies of every 7th item (land
# at Hamming 0-3, measured) + heavily-mutated fresh items from every
# 11th (replace 'a' -> '####': measured Hamming 23-38, never pair).

INC_PH_COPY_EVERY = 7
INC_PH_COPY_OFFSET = 4_000_000
INC_PH_FRESH_EVERY = 11
INC_PH_FRESH_OFFSET = 5_000_000


def _bands_of(hashed: DataFrame) -> DataFrame:
    """(media_id, phash_lo, phash_hi) -> exploded 4 x 16-bit band rows
    (media_id, phash_lo, phash_hi, band, bits) — ONE spelling for the
    full, incremental, and streaming pipelines."""
    return hashed.select(
        "media_id",
        "phash_lo",
        "phash_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(
                            F.col("phash_lo" if b < 2 else "phash_hi"),
                            (b % 2) * 16,
                        )
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bits"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("media_id", "phash_lo", "phash_hi", "bb.band", "bb.bits")


def incremental_phash_pairs(
    base_hashes: DataFrame, delta_hashes: DataFrame
) -> DataFrame:
    """(media_id_a, media_id_b, hamming) for every near-dup pair
    touching the DELTA: delta hashes band-join against (stored base
    hashes ∪ delta hashes), so per-batch cost scales in the delta and
    the base payloads are never re-read. Both inputs are
    (media_id, phash_lo, phash_hi) frames — :func:`phash_media`
    output, the full operator's hash pass, or the streaming artifact;
    hashing stays the caller's ONE Arrow pass (the streaming loop
    persists it and feeds both this classify and its artifact
    append). Pairs are id-ordered (a < b) and unique, exactly the
    full operator's convention, so incremental == full-over-union
    restricted to delta-touching pairs."""
    union_bands = _bands_of(
        base_hashes.unionByName(delta_hashes)
    ).alias("l")
    delta_bands = _bands_of(delta_hashes).alias("r")
    cand = (
        union_bands.join(
            delta_bands,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bits") == F.col("r.bits"))
            & (F.col("l.media_id") != F.col("r.media_id")),
        )
        .select(
            F.least(F.col("l.media_id"), F.col("r.media_id")).alias(
                "media_id_a"
            ),
            F.greatest(F.col("l.media_id"), F.col("r.media_id")).alias(
                "media_id_b"
            ),
            F.col("l.phash_lo").alias("alo"),
            F.col("l.phash_hi").alias("ahi"),
            F.col("r.phash_lo").alias("blo"),
            F.col("r.phash_hi").alias("bhi"),
        )
        .dropDuplicates(["media_id_a", "media_id_b"])
    )
    hamming = (
        F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
        + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi")))
    ).cast("long")
    return cand.select(
        "media_id_a", "media_id_b", hamming.alias("hamming")
    ).where(F.col("hamming") <= PH_HAM_T)


def _ph_delta(docs: DataFrame) -> DataFrame:
    """The deterministic incoming batch (doc_id, text): near-copies +
    heavily-mutated fresh items, replayed verbatim by the oracle."""
    copies = docs.where(F.col("doc_id") % INC_PH_COPY_EVERY == 0).select(
        (F.col("doc_id") + INC_PH_COPY_OFFSET).alias("doc_id"),
        F.concat(
            F.expr("substr(text, 1, length(text) DIV 2)"),
            F.lit("~"),
            F.expr("substr(text, length(text) DIV 2 + 2)"),
        ).alias("text"),
    )
    fresh = docs.where(F.col("doc_id") % INC_PH_FRESH_EVERY == 0).select(
        (F.col("doc_id") + INC_PH_FRESH_OFFSET).alias("doc_id"),
        F.expr("replace(text, 'a', '####')").alias("text"),
    )
    return copies.unionByName(fresh)


def q_media_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs of the incoming batch against (corpus ∪ batch):
    the per-batch media curation report."""
    docs = _ascii_docs(spark, sf_dir)
    base = _pairing_admitted(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )
    delta = _pairing_admitted(
        _ph_delta(docs).select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )
    return incremental_phash_pairs(phash_media(base), phash_media(delta))


# DuckDB re-derivation via the pinned identity: the FULL pipeline over
# (base ∪ delta), restricted to pairs touching the delta. Delta ids
# all exceed the offsets while fixture ids never do, and pairs are
# id-ordered, so "touching the delta" is exactly media_id_b >= the
# smallest offset.
ORACLE_MEDIA_PHASH_INCREMENTAL = _oracle_phash_pairs(
    f"""corpus AS (
  SELECT media_id, text FROM base
  UNION ALL
  SELECT media_id + {INC_PH_COPY_OFFSET},
         substr(text, 1, length(text) // 2) || '~' ||
         substr(text, length(text) // 2 + 2)
  FROM base WHERE media_id % {INC_PH_COPY_EVERY} = 0
  UNION ALL
  SELECT media_id + {INC_PH_FRESH_OFFSET}, replace(text, 'a', '####')
  FROM base WHERE media_id % {INC_PH_FRESH_EVERY} = 0
)""",
    final_and=(
        "AND media_id_b >= "
        f"{min(INC_PH_COPY_OFFSET, INC_PH_FRESH_OFFSET)}"
    ),
)


# permanent-tier earmarks (r15): oracle-gated every build by the
# generic parity gate at sf0.001/sf0.01 and swept at sf0.1 via
# registry.EARMARKS discovery; planted/exactness battery in
# tests/test_media_phash.py.
# --- cluster collapse: the dedup DECISION over the pair report --------------
# Pairs are half of dedup (the dedup.py connected-components doctrine):
# the pipeline-consumable answer is one survivor per near-dup CLUSTER.
# Reuses the shared iterative min-label-propagation components operator
# verbatim — the edge list here is the (tiny, corpus-dependent) pair
# report, never the corpus — and keeps the lowest media_id per cluster,
# the deterministic survivor rule every dedup family in this engine
# uses. Oracle = the pair oracle composed with the same recursive-CTE
# components the cluster_components oracle runs.


def q_media_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, cluster_id, n_members, keep) for every item in a
    perceptual near-dup cluster: cluster_id = lowest reachable
    media_id, keep = 1 exactly for the survivor. Items with no
    near-dup pair are implicitly kept (absent here — the report lists
    the items the dedup decision affects, the dedup_cluster_components
    shape). Both the report and its oracle come from the SHARED
    components spellings in operators/dedup.py (review r15)."""
    from .dedup import components_report

    pairs = q_media_phash_neardup(spark, sf_dir).select(
        F.col("media_id_a").alias("src"),
        F.col("media_id_b").alias("dst"),
    )
    return components_report(pairs, "media_id", "cluster_id", keep=True)


def _oracle_media_phash_clusters() -> str:
    from .dedup import oracle_components_report

    return oracle_components_report(
        ORACLE_MEDIA_PHASH_NEARDUP,
        "media_id_a",
        "media_id_b",
        "media_id",
        "cluster_id",
        keep=True,
    )


ORACLE_MEDIA_PHASH_CLUSTERS = _oracle_media_phash_clusters()


EARMARKS = {
    "media_phash_neardup": (
        q_media_phash_neardup,
        ORACLE_MEDIA_PHASH_NEARDUP,
    ),
    "media_phash_incremental": (
        q_media_phash_incremental,
        ORACLE_MEDIA_PHASH_INCREMENTAL,
    ),
    "media_phash_clusters": (
        q_media_phash_clusters,
        ORACLE_MEDIA_PHASH_CLUSTERS,
    ),
}
