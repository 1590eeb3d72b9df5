"""Multimodal columns — north-star extension: image/audio/video as
opaque BINARY columns with typed metadata, processed in Arrow batches.

The corpus ships no binary table, so each query *derives* a
deterministic payload (unhex(md5(text)) — 16 bytes) from documents and
treats it as the media blob.  Real decode (PIL/ffmpeg/librosa) is NOT
in this container: ``decode_image`` raises NotImplementedError and the
queries run the deterministic fake extractor instead — the Spark-side
plumbing (binary schema, mapInPandas batch shape, partitioning) is
real and tested either way.

Scale notes: blobs ride in parquet as BINARY column chunks; metadata
predicates (format/width) push down so full blobs are only
materialized for selected rows; mapInPandas streams Arrow batches so
peak memory is one batch of blobs per core, not a partition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load


def decode_image(blob: bytes) -> "object":
    """The real decoder hook — requires an image library that is not in
    this container.  Swap in PIL.Image.open(io.BytesIO(blob)) on a real
    cluster."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "fake_features() is the deterministic stand-in used by the queries"
    )


def fake_features(blob: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in feature extractor: first n bytes / 255."""
    return [round(b / 255.0, 6) for b in blob[:n]]


def with_media_columns(df: DataFrame) -> DataFrame:
    """Schema plumbing: derive a BINARY payload + typed metadata from a
    text column (stand-in for reading real media files)."""
    return df.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.struct(
            (F.col("n_chars") % 64).cast("int").alias("width"),
            (F.col("doc_id") % 48).cast("int").alias("height"),
            F.lit("fake/raw16").alias("format"),
        ).alias("media_meta"),
    )


@register(
    "m1_binary_meta",
    oracle="""
SELECT doc_id,
       hex(unhex(md5(text))) AS payload_hex,
       octet_length(unhex(md5(text))) AS n_bytes,
       CAST(n_chars % 64 AS INTEGER) AS width,
       CAST(doc_id % 48 AS INTEGER) AS height
FROM documents
""",
)
def m1_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m1: binary payload + typed metadata columns — the storage schema
    for multimodal data.  The BINARY ops (unhex/octet_length) run on
    both engines; the payload is emitted hex-encoded because raw-bytes
    python values (bytearray vs bytes) canonicalize differently across
    drivers — engine-internal columns stay binary."""
    d = with_media_columns(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.hex("payload").alias("payload_hex"),
        F.octet_length("payload").alias("n_bytes"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


_M2_HEX = "0123456789abcdef"
# One payload byte as INT from the md5 hex string (DuckDB-side): two
# nibble lookups.  i is the 0-based byte index.
_m2_byte = (
    lambda i: f"(16 * (strpos('{_M2_HEX}', substr(md5(text), {2 * i + 1}, 1)) - 1)"
    f" + strpos('{_M2_HEX}', substr(md5(text), {2 * i + 2}, 1)) - 1)"
)


@register(
    "m2_decode_features",
    # The fake extractor is pure byte arithmetic, so the oracle rebuilds
    # it from the md5 hex pairs — the Arrow plumbing (batch shape, schema,
    # partition independence) is what the hash check then certifies.
    oracle=f"""
SELECT doc_id,
       {_m2_byte(0)} || ',' || {_m2_byte(1)} || ',' ||
       {_m2_byte(2)} || ',' || {_m2_byte(3)} AS features
FROM documents
""",
)
def m2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m2: feature extraction over binary payloads via mapInPandas —
    Arrow-batched, schema-declared.  Uses the deterministic fake
    extractor (first 4 payload bytes, ','-joined as ints — oracle-checked
    projections stay ARRAY-free and integer-rendered); the real decode
    hook (decode_image) raises until a decoder lib exists, and the
    normalized-float variant remains available as ``fake_features``."""
    d = with_media_columns(load(spark, sf_dir, "documents")).select("doc_id", "payload")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [
                        ",".join(str(x) for x in bytes(b)[:4]) for b in pdf["payload"]
                    ],
                }
            )

    return d.mapInPandas(extract, "doc_id LONG, features STRING")


@register(
    "m3_frame_sample",
    # Stride 17 over the 16-byte-periodic payload visits bytes
    # (17i mod 16) = i — the sampled frames are the first 8 payload
    # bytes, which the oracle rebuilds from the md5 hex pairs.
    oracle=f"""
SELECT doc_id,
       {" || ',' || ".join(_m2_byte(i) for i in range(8))} AS frames
FROM documents
""",
)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m3: frame sampling over a fake 'video' (payload ×9 = 144 bytes;
    every 17th byte is a 'frame') via mapInPandas — the uniform-stride
    sampling shape used for real video, minus the codec.  Stride 17 is
    coprime to the 16-byte payload period, so the 8 frames are distinct
    payload positions (a 16-aligned stride would sample byte 0 eight
    times).  ','-joined ints — oracle-checked projections stay
    ARRAY-free and integer-rendered."""
    d = with_media_columns(load(spark, sf_dir, "documents")).select("doc_id", "payload")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                ",".join(str((bytes(b) * 9)[i]) for i in range(0, 136, 17))
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "frames": frames})

    return d.mapInPandas(sample, "doc_id LONG, frames STRING")


# One payload byte as INT with a DYNAMIC (lambda-variable) index
# expression `j` (0-based, already reduced mod 16) — m4/m5 oracles.
_m2_byte_dyn = (
    lambda j: f"(16 * (strpos('{_M2_HEX}', substr(md5(text), 2 * ({j}) + 1, 1)) - 1)"
    f" + strpos('{_M2_HEX}', substr(md5(text), 2 * ({j}) + 2, 1)) - 1)"
)

# m4 block (R=i//8, C=i%8) sums raster values img(r,c) = payload[(r+c)%16]
# over its 4×4 block: diagonals s = 4R+4C+k, k = 0..6, weights 1,2,3,4,3,2,1.
_M4_W = [1, 2, 3, 4, 3, 2, 1]
_m4_block = " + ".join(
    f"{w} * {_m2_byte_dyn(f'(4 * (i // 8) + 4 * (i % 8) + {k}) % 16')}"
    for k, w in enumerate(_M4_W)
)


@register(
    "m4_resize",
    oracle=f"""
SELECT doc_id,
       array_to_string(list_transform(range(0, 64),
         i -> CAST({_m4_block} AS VARCHAR)), ',') AS pixel_sums
FROM documents
""",
)
def m4_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m4: image resize over fake raster payloads via mapInPandas +
    numpy — a 32×32 uint8 raster img(r,c) = payload[(r+c) mod 16]
    (diagonal tiling, so rows differ — a row-aligned tiling collapses
    every block to the same values), block-SUM pooled to 8×8 (sum =
    16 × the block mean, exact over integers; swap in PIL.Image.resize
    when a codec exists).  ','-joined int sums — oracle-checked
    projections stay ARRAY-free and integer-rendered; the oracle
    rebuilds each block sum from the md5 hex pairs."""
    import numpy as np

    d = with_media_columns(load(spark, sf_dir, "documents")).select("doc_id", "payload")
    idx = (np.arange(32)[:, None] + np.arange(32)[None, :]) % 16

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for b in pdf["payload"]:
                img = np.frombuffer(bytes(b), dtype=np.uint8)[idx].astype(np.int64)
                sums = img.reshape(8, 4, 8, 4).sum(axis=(1, 3))
                pixels.append(",".join(str(int(x)) for x in sums.ravel()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pixel_sums": pixels})

    return d.mapInPandas(resize, "doc_id LONG, pixel_sums STRING")


# m5 synthetic PCM: sample i = (payload[i mod 16] * (i+1)) mod 65536
# − 32768 — the (i+1) ramp breaks the payload's 16-byte periodicity so
# the 4 frames genuinely differ (a byte-periodic buffer makes every
# frame identical).  Frame energy = Σ sample², exact in int64.
_m5_sample = f"(({_m2_byte_dyn('i % 16')}::BIGINT * (i + 1)) % 65536) - 32768"
_m5_frame = (
    lambda f: f"CAST((SELECT SUM(s * s) FROM ("
    f"SELECT {_m5_sample} AS s FROM range({64 * f}, {64 * (f + 1)}) AS t(i)"
    f")) AS VARCHAR)"
)


@register(
    "m5_audio_energy",
    oracle=f"""
SELECT doc_id,
       {" || ',' || ".join(_m5_frame(f) for f in range(4))} AS frame_energy
FROM documents
""",
)
def m5_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m5: per-frame audio energy over fake PCM payloads via mapInPandas
    + numpy — 256 synthetic int16 samples (see _m5_sample: payload bytes
    on an index ramp, so frames differ), framed into 4 windows of 64,
    energy = Σ sample² per frame (exact int64; RMS = sqrt(energy/64)
    derivable — kept integral for engine-identical rendering; swap in a
    librosa/scipy STFT when an audio stack exists).  Frames of a long
    stream would map to (doc_id, frame_no) rows and repartition by doc
    for windowed DSP at scale."""
    import numpy as np

    d = with_media_columns(load(spark, sf_dir, "documents")).select("doc_id", "payload")
    ramp = np.arange(256, dtype=np.int64) + 1

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                base = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
                pcm = (base[np.arange(256) % 16] * ramp) % 65536 - 32768
                frames = pcm.reshape(4, 64)
                out.append(",".join(str(int(x)) for x in (frames**2).sum(axis=1)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "frame_energy": out})

    return d.mapInPandas(energy, "doc_id LONG, frame_energy STRING")


# --- m6: perceptual-hash near-dup over media payloads ---------------------

_PH_BITS = 32
_PH_CHUNKS = 4  # 4 × 8-bit chunks — banding for the candidate join


def _sql_ph_byte(i: int, perturbed: bool) -> str:
    """Payload byte i (0..31) from the doubled md5 hex (DuckDB replay of
    the engine's conv(substr(hx,…),16,10)); the 're-encoded' variant
    adds 8 mod 256 (the deterministic stand-in for lossy re-encode)."""
    b = (
        f"(16 * (strpos('{_M2_HEX}', substr(hx, {2 * i + 1}, 1)) - 1)"
        f" + strpos('{_M2_HEX}', substr(hx, {2 * i + 2}, 1)) - 1)"
    )
    return f"(({b} + 8) % 256)" if perturbed else b


def _sql_phash(perturbed: bool) -> str:
    terms = " + ".join(
        f"(CASE WHEN {_sql_ph_byte(i, perturbed)} >= 128 THEN {1 << i} ELSE 0 END)"
        for i in range(_PH_BITS)
    )
    return f"({terms})"


_M6_CHUNK_OR = " OR ".join(
    f"((a.ph // {1 << (8 * k)}) % 256) = ((b.ph // {1 << (8 * k)}) % 256)"
    for k in range(_PH_CHUNKS)
)


@register(
    "m6_phash_near_dup",
    # Full algorithm replay: the same 32-bit sign-of-byte fingerprint,
    # the same +8 mod 256 re-encode perturbation, the same 4×8-bit
    # chunk banding and hamming ≤ 4 verify — structural equality, like
    # j3's banded oracle.  DuckDB joins with the OR-of-chunks predicate
    # (fine at oracle scale); the ENGINE explodes chunk rows and
    # equi-joins, the shape that scales.
    oracle=f"""
WITH hxs AS (
  SELECT doc_id, md5(text) || md5(text || '2') AS hx, FALSE AS pert FROM documents
  UNION ALL
  SELECT doc_id + 100000, md5(text) || md5(text || '2'), TRUE FROM documents
),
ph AS (SELECT doc_id,
              CASE WHEN pert THEN {_sql_phash(True)} ELSE {_sql_phash(False)} END AS ph
       FROM hxs),
cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.ph AS pa, b.ph AS pb
         FROM ph a JOIN ph b ON a.doc_id < b.doc_id
         WHERE {_M6_CHUNK_OR})
SELECT a_id, b_id, bit_count(xor(pa, pb)) AS hamming
FROM cand
WHERE bit_count(xor(pa, pb)) <= 4
""",
)
def m6_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m6 (extension): perceptual-hash near-duplicate detection for
    media payloads — the image-side analogue of j3.  Each payload gets
    a 32-bit sign-of-byte fingerprint (the deterministic stand-in for a
    DCT pHash; swap ``decode_image`` + a real pHash on a cluster with
    image libs); a deterministic 're-encoded' copy (+8 mod 256 per
    byte, doc_id+100000) plants realistic near-dups whose fingerprints
    differ in ~2 of 32 bits.  Candidates must share one of 4 8-bit
    chunks (banding — the engine equi-joins exploded chunk rows, never
    all pairs), then exact hamming ≤ 4 verifies.

    Scale: identical shape to j3/j3b — shuffle O(docs × chunks), the
    verify join touches only banded candidates."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    hx = F.concat(F.md5("text"), F.md5(F.concat(F.col("text"), F.lit("2"))))

    def byte(i: int) -> F.Column:
        return F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("int")

    def phash(perturbed: bool) -> F.Column:
        total = F.lit(0).cast("long")
        for i in range(_PH_BITS):
            b = ((byte(i) + 8) % 256) if perturbed else byte(i)
            total = total + F.when(b >= 128, F.lit(1 << i).cast("long")).otherwise(0)
        return total

    ph = d.select("doc_id", phash(False).alias("ph")).unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), phash(True).alias("ph"))
    )
    chunks = ph.select(
        "doc_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("ci"),
                        ((F.col("ph") / (1 << (8 * k))).cast("long") % 256).alias("cv"),
                    )
                    for k in range(_PH_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "ph", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(F.col("a.ph").bitwiseXOR(F.col("b.ph"))).alias("hamming"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs.filter(F.col("hamming") <= 4)


@register(
    "m7_modality_router",
    # Routing key = first payload byte mod 3 (the magic-byte sniff,
    # minus real containers); each branch's feature math is the same
    # byte arithmetic the m2/m5 oracles replay, so the whole dispatch
    # is rebuilt from md5 hex pairs.
    oracle=f"""
SELECT doc_id,
       CASE {_m2_byte(0)} % 3 WHEN 0 THEN 'image'
                              WHEN 1 THEN 'audio'
                              ELSE 'video' END AS modality,
       CASE {_m2_byte(0)} % 3
         WHEN 0 THEN {_m2_byte(0)} || ',' || {_m2_byte(1)} || ',' ||
                     {_m2_byte(2)} || ',' || {_m2_byte(3)}
         WHEN 1 THEN CAST({_m2_byte(0)} * {_m2_byte(0)} + {_m2_byte(1)} * {_m2_byte(1)}
                          + {_m2_byte(2)} * {_m2_byte(2)} + {_m2_byte(3)} * {_m2_byte(3)}
                     AS VARCHAR)
         ELSE {_m2_byte(0)} || ',' || {_m2_byte(1)}
       END AS features
FROM documents
""",
)
def m7_modality_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m7: MODALITY ROUTING — the dispatch step of a mixed-media
    pipeline: one Arrow-batched pass sniffs each payload's type (here
    the first byte mod 3 stands in for magic-byte/container detection)
    and applies that modality's extractor in place — image → 4-byte
    features (m2's math), audio → frame energy (m5's Σ sample², first
    window), video → stride-sampled frames (m3's shape).  The j38
    routing idea applied to media: ONE entry point, per-row dispatch,
    union-shaped release (doc_id, modality, features).

    Scale: a single mapInPandas stage — no per-modality re-scan, no
    shuffle; the dispatch is row-local so the batch shape is identical
    to m2, and downstream per-modality pipelines filter on the released
    modality column (a pushdown-able predicate) instead of re-sniffing
    blobs."""
    d = with_media_columns(load(spark, sf_dir, "documents")).select("doc_id", "payload")

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mods, feats = [], []
            for blob in pdf["payload"]:
                b = bytes(blob)
                m = b[0] % 3
                if m == 0:
                    mods.append("image")
                    feats.append(",".join(str(x) for x in b[:4]))
                elif m == 1:
                    mods.append("audio")
                    feats.append(str(sum(x * x for x in b[:4])))
                else:
                    mods.append("video")
                    feats.append(",".join(str((b * 9)[i]) for i in range(0, 34, 17)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": mods, "features": feats}
            )

    return d.mapInPandas(route, "doc_id LONG, modality STRING, features STRING")
