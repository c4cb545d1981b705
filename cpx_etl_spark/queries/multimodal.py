"""§2.6 Multimodal pipeline queries (binary payload columns).

`mm_binary_pipeline` is EXACT-oracled (was rows-only in r1/r2): the
payloads are valid BMP/PNG files synthesized deterministically from
md5(text), the Spark side parses the real container headers back from
the bytes, and the DuckDB oracle derives the same fields arithmetically
from the md5 hex digits — so a parser bug (wrong offset, wrong
endianness, wrong row padding) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cpx_etl_spark.operators.multimodal import (
    attach_media_payload,
    attach_payload,
    decode_features,
    decode_media_meta,
)
from cpx_etl_spark.queries import register
from cpx_etl_spark.sources import load_table


def _hexbyte(k: int) -> str:
    """SQL for byte k (0-based) of md5(text): two hex digits."""
    return (
        f"((strpos('0123456789abcdef', substr(md5(text), {2 * k + 1}, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr(md5(text), {2 * k + 2}, 1)) - 1)"
    )


# Synthesis contract (operators/multimodal.py synth_media_bytes):
#   width = 1 + b0 % 64, height = 1 + b1 % 64, fmt = bmp iff b2 even;
#   BMP size = 54 + height * (width*3 padded to 4B);
#   PNG size = 57 + height*(1 + 3*width) + 11  (sig 8 + IHDR 25 +
#   IDAT overhead 12 + zlib level-0 stored block (raw+11) + IEND 12).
_MM_ORACLE = f"""
    WITH b AS (
        SELECT doc_id,
               {_hexbyte(0)} AS b0, {_hexbyte(1)} AS b1, {_hexbyte(2)} AS b2
        FROM documents)
    SELECT doc_id,
           CASE WHEN b2 % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
           CAST(1 + b0 % 64 AS INTEGER) AS width,
           CAST(1 + b1 % 64 AS INTEGER) AS height,
           CAST(24 AS INTEGER) AS bit_depth,
           CAST(CASE WHEN b2 % 2 = 0
                THEN 54 + (1 + b1 % 64) * (((1 + b0 % 64) * 3 + 3) // 4 * 4)
                ELSE 68 + (1 + b1 % 64) * (1 + 3 * (1 + b0 % 64))
                END AS INTEGER) AS n_bytes
    FROM b
"""


@register("mm_binary_pipeline", oracle=_MM_ORACLE)
def mm_binary_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid BMP/PNG payload synthesis -> Arrow-batched REAL header
    decode (format sniff, dimensions, bit depth, true file size)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media_meta(attach_media_payload(docs), id_col="doc_id")


@register("mm_byte_features")  # rows-only: byte stats of opaque payloads
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload byte features (the pre-r3 pipeline): payload =
    unhex(md5(text)), features via mapInPandas — kept as the
    arbitrary-binary (non-image) plumbing path."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(attach_payload(docs), id_col="doc_id")


# Synthesis contract (operators/multimodal.py synth_wav_bytes):
#   rate = (8000,16000,22050,44100)[b0 % 4], channels = 1 + b1 % 2,
#   n_samples = 64 + b2, data = n_samples*channels*2, file = 44 + data.
_WAV_ORACLE = f"""
    WITH b AS (
        SELECT doc_id,
               {_hexbyte(0)} AS b0, {_hexbyte(1)} AS b1, {_hexbyte(2)} AS b2
        FROM documents)
    SELECT doc_id,
           CAST(CASE b0 % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
           CAST(1 + b1 % 2 AS INTEGER) AS channels,
           CAST(16 AS INTEGER) AS bit_depth,
           CAST(64 + b2 AS INTEGER) AS n_samples,
           CAST((64 + b2) * 1000 // (CASE b0 % 4 WHEN 0 THEN 8000
                WHEN 1 THEN 16000 WHEN 2 THEN 22050 ELSE 44100 END)
                AS INTEGER) AS duration_ms,
           CAST(44 + (64 + b2) * (1 + b1 % 2) * 2 AS INTEGER) AS n_bytes
    FROM b
"""


@register("mm_audio_pipeline", oracle=_WAV_ORACLE)
def mm_audio_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid RIFF/WAVE PCM payload synthesis -> Arrow-batched REAL
    header decode (rate, channels, bit depth, sample count, duration,
    true file size) — the audio modality through the same binary-column
    plumbing as the image path; a parser bug (wrong offset, wrong
    endianness, wrong frame size) breaks the hash match."""
    from cpx_etl_spark.operators.multimodal import (
        attach_wav_payload,
        decode_wav_meta,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_wav_meta(attach_wav_payload(docs), id_col="doc_id")


# Synthesis contract (operators/multimodal.py synth_mp4_bytes):
#   ftyp = 8 + 20, free = 8 + b0, mdat = 8 + 16 + 4*b1.
_MP4_ORACLE = f"""
    WITH b AS (
        SELECT doc_id, {_hexbyte(0)} AS b0, {_hexbyte(1)} AS b1
        FROM documents)
    SELECT doc_id,
           CAST(3 AS INTEGER) AS n_boxes,
           'ftyp,free,mdat' AS box_types,
           CAST(16 + 4 * b1 AS INTEGER) AS mdat_bytes,
           CAST(28 + (8 + b0) + (24 + 4 * b1) AS INTEGER) AS n_bytes
    FROM b
"""


@register("mm_video_pipeline", oracle=_MP4_ORACLE)
def mm_video_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid ISO-BMFF (MP4) container synthesis -> Arrow-batched REAL
    box walk (count, types, mdat payload size, true file size) — the
    video-container modality through the same binary-column plumbing;
    a parser bug (size arithmetic, truncation handling) breaks the
    hash match. Frame decode stays import-gated like pixel decode."""
    from cpx_etl_spark.operators.multimodal import (
        attach_mp4_payload,
        decode_mp4_meta,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_mp4_meta(attach_mp4_payload(docs), id_col="doc_id")


# Frame-sampling contract (operators/multimodal.py sample_frames over
# the synthesized MP4): container = 60 + b0 + 4*b1 bytes, step =
# container // 4, each of the 4 sampled "frames" is the step-sized byte
# slice at offset j*step (trailing remainder dropped by design).
_FRAME_ORACLE = f"""
    WITH b AS (
        SELECT doc_id, {_hexbyte(0)} AS b0, {_hexbyte(1)} AS b1
        FROM documents),
    c AS (
        SELECT doc_id, 60 + b0 + 4 * b1 AS total,
               (60 + b0 + 4 * b1) // 4 AS step
        FROM b)
    SELECT doc_id, CAST(gs.j AS INTEGER) AS frame_idx,
           CAST(step AS BIGINT) AS frame_len,
           CAST(total AS BIGINT) AS container_bytes
    FROM c, generate_series(0, 3) gs(j)
"""


@register("mm_frame_sample", oracle=_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video-container payload: the
    row-expanding mapInPandas stage a real frame decoder plugs into
    (one input row -> n_frames output rows with a frame_idx and a
    bytes payload; here the deterministic fake kernel slices the
    container). The gate hash-verifies the EXPANSION SHAPE and sizing
    arithmetic closed-form — frame_len must equal container//4 for
    every (doc, frame) — while the frame BYTES stay exercised by
    tests/test_dedup_similarity.py's kernel test. Real pixel decode
    remains import-gated (PIL absent by design)."""
    from cpx_etl_spark.operators.multimodal import (
        attach_mp4_payload,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_mp4_payload(docs)
    sizes = payloads.select(
        "doc_id", F.length("payload").cast("bigint").alias("container_bytes")
    )
    frames = sample_frames(payloads, id_col="doc_id", n_frames=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("bigint").alias("frame_len"),
    ).join(sizes, on="doc_id")


@register(
    "mm_binaryfile_ingest",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               {_hexbyte(0)} AS b0, {_hexbyte(1)} AS b1, {_hexbyte(2)} AS b2
        FROM documents WHERE doc_id < 64)
    SELECT CASE WHEN b2 % 2 = 0 THEN 'bmp' ELSE 'png' END AS fmt,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN b2 % 2 = 0
               THEN 54 + (1 + b1 % 64) * (((1 + b0 % 64) * 3 + 3) // 4 * 4)
               ELSE 68 + (1 + b1 % 64) * (1 + 3 * (1 + b0 % 64))
               END) AS BIGINT) AS total_bytes,
           CAST(SUM(1 + b0 % 64) AS BIGINT) AS sum_width
    FROM b
    GROUP BY 1
    ORDER BY 1
    """,
)
def mm_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL file-ingestion path for image/audio corpora: media
    files land on disk (here: 64 synthesized BMP/PNG files, content
    the closed-form function of each doc's md5), Spark's binaryFile
    source reads whole files as (path, length, content) rows — the
    production pattern for a 100 TB image crawl, where the scan
    parallelizes per file and maxPartitionBytes groups small files per
    task — and the existing Arrow-batched header decoder runs over the
    content column. The oracle re-derives format/size/width
    arithmetically from the md5 digits, so a wrong byte anywhere in
    write -> scan -> decode breaks the hash."""
    import os

    from cpx_etl_spark.operators.multimodal import synth_media_bytes
    from cpx_etl_spark.scratch import scratch_dir
    from cpx_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    d = scratch_dir("cpx_etl_binfiles_")
    # driver-side write of the small fixture set (the test corpus);
    # at scale the files pre-exist — this stage is not the operator
    for r in docs.select("doc_id", "text").collect():
        with open(os.path.join(d, f"{r['doc_id']:06d}.bin"), "wb") as fh:
            fh.write(synth_media_bytes(r["text"]))
    files = spark.read.format("binaryFile").load(d)
    from cpx_etl_spark.operators.multimodal import decode_media_meta

    decoded = decode_media_meta(
        files.select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        ),
        id_col="doc_id",
    )
    return (
        decoded.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("width").alias("sum_width"),
        )
        .orderBy("fmt")
    )


_PH_HEX = "'0123456789abcdef'"


def _ph_byte(h: str, cpos: str) -> str:
    """SQL: byte value at (0-based, possibly expression) position
    ``cpos`` of the md5 hex string ``h``."""
    return (
        f"((strpos({_PH_HEX}, substr({h}, 2 * ({cpos}) + 1, 1)) - 1) * 16"
        f" + strpos({_PH_HEX}, substr({h}, 2 * ({cpos}) + 2, 1)) - 1)"
    )


@register(
    "mm_image_phash",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, CAST(doc_id // 5 AS VARCHAR) AS seed,
               CAST(doc_id % 5 AS INTEGER) AS delta
        FROM documents),
    md AS (
        SELECT doc_id, delta, r.i AS r,
               md5(seed || ':' || CAST(r.i AS VARCHAR)) AS h
        FROM d, generate_series(0, 6) r(i)),
    pix AS (
        SELECT doc_id, r, c.i AS c,
               CASE WHEN r = 0 AND c.i = 0
                    THEN ({_ph_byte('h', 'c.i')} + delta) % 256
                    ELSE {_ph_byte('h', 'c.i')} END AS p
        FROM md, generate_series(0, 8) c(i)),
    bits AS (
        SELECT a.doc_id, a.r, a.c,
               CASE WHEN a.p > b.p THEN 1 ELSE 0 END AS bit
        FROM pix a
        JOIN pix b ON b.doc_id = a.doc_id AND b.r = a.r AND b.c = a.c + 1
        WHERE a.c <= 7),
    hashes AS (
        SELECT doc_id,
               CAST(SUM(CAST(bit AS BIGINT) << (r * 8 + c)) AS BIGINT) AS phash
        FROM bits GROUP BY doc_id),
    bands AS (
        SELECT doc_id, phash, b.i AS band,
               (phash >> (b.i * 14)) & 16383 AS bv
        FROM hashes, generate_series(0, 3) b(i)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.phash AS pa, b.phash AS pb
        FROM bands a
        JOIN bands b ON b.band = a.band AND b.bv = a.bv
                    AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(pa, pb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(pa, pb)) <= 4
    ORDER BY doc_a, doc_b
    """,
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection over image payloads: a
    112-byte grayscale thumbnail per document (synthesized JVM-side
    from md5 — each run of five consecutive doc_ids is the same 'photo'
    burst, doc_id%5 perturbs one pixel, modeling re-encodes; FIXED
    burst size, so candidate volume stays LINEAR in corpus size at
    every scale), dHash-56
    via the Arrow-batched mapInPandas decoder (operators/multimodal.py
    dhash_56), then banded LSH pairing: 4 bands x 14 bits, candidates
    agree in >=1 band, verified at hamming <= 4 via one bit_count(xor)
    — never an all-pairs scan. The oracle derives every pixel, bit,
    band and hamming distance arithmetically from the md5 hex in pure
    SQL, so a byte-order or bit-packing bug in the Python decoder
    breaks the hash match. Scale: band join fan-out is bounded by
    the constant burst size, exactly like the simhash/minhash
    families' capped buckets."""
    from cpx_etl_spark.operators.multimodal import dhash_56

    docs = load_table(spark, sf_dir, "documents")
    seed = F.expr("doc_id div 5").cast("string")
    payload = F.concat(
        *[
            F.unhex(F.md5(F.concat(seed, F.lit(f":{r}"))))
            for r in range(7)
        ]
    )
    base = docs.select(
        "doc_id",
        payload.alias("payload"),
        (F.col("doc_id") % 5).cast("int").alias("delta"),
    )
    # r17 note: both self-join sides consume the hash frame, so the
    # Arrow decoder runs twice per pass; a localCheckpoint would halve
    # that but hides the MapInPandas node the plan pin
    # (tests/test_plans.py::test_r8_jvm_side_paths) exists to prove —
    # the visible showcase wins over ~0.3 s at sf0.1 (decision recorded
    # in OPTIMIZATION_r17.md).
    hashes = dhash_56(base, perturb_col="delta")
    bands = hashes.select(
        "doc_id",
        "phash",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
    ).withColumn("bv", F.expr("shiftright(phash, band * 14) & 16383"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(pa ^ pb)")
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= 4)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# Energy replay: data byte j of the synthesized PCM is digest byte
# j % 16 (synth_wav_bytes), so word w = signed16(byte(2w % 16) +
# 256 * byte((2w+1) % 16)); windows cover 32 words each.
_HEXD = "strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1"
_WAV_ENERGY_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, md5(text) AS h,
               (1 + ({_hexbyte(1)}) % 2) * (64 + ({_hexbyte(2)})) AS n_words
        FROM documents),
    win AS (
        -- fixed series (max n_words = 2*(64+255) = 638 -> 20 windows),
        -- filtered per doc: DuckDB's generate_series is not lateral
        SELECT doc_id, h, n_words, gs.k AS window_idx
        FROM d, generate_series(0, 19) gs(k)
        WHERE gs.k * 32 < n_words),
    words AS (
        SELECT doc_id, window_idx, h, 32 * window_idx + gi.i AS wi
        FROM win, generate_series(0, 31) gi(i)
        WHERE 32 * window_idx + gi.i < n_words),
    vals AS (
        SELECT doc_id, window_idx,
               ({_HEXD.format(pos="2 * ((2 * wi) % 16) + 1")}) * 16
                 + ({_HEXD.format(pos="2 * ((2 * wi) % 16) + 2")}) AS lo,
               ({_HEXD.format(pos="2 * ((2 * wi + 1) % 16) + 1")}) * 16
                 + ({_HEXD.format(pos="2 * ((2 * wi + 1) % 16) + 2")}) AS hi
        FROM words),
    s AS (
        SELECT doc_id, window_idx,
               CASE WHEN lo + 256 * hi >= 32768 THEN lo + 256 * hi - 65536
                    ELSE lo + 256 * hi END AS v
        FROM vals)
    SELECT doc_id, window_idx, COUNT(*) AS n_words,
           CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS energy
    FROM s
    GROUP BY doc_id, window_idx
    ORDER BY doc_id, window_idx
"""


@register("mm_audio_energy", oracle=_WAV_ENERGY_ORACLE)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed PCM energy extraction — the audio modality past the
    header: synthesize the valid 16-bit WAV, decode the REAL data
    chunk as int16 words (numpy, Arrow-batched), one row per 32-word
    window with its exact integer sum of squares — the feature VAD /
    silence-trim / loudness stages consume. Row-expanding mapInPandas
    like mm_frame_sample; the oracle replays the same windows from the
    synthesis contract's closed form (digest-byte tiling), so an
    endianness or sign-extension bug in the decode breaks the hash."""
    from cpx_etl_spark.operators.multimodal import (
        attach_wav_payload,
        decode_wav_energy,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_wav_energy(attach_wav_payload(docs), id_col="doc_id").orderBy(
        "doc_id", "window_idx"
    )


@register(
    "mm_image_tiles",
    oracle=f"""
    WITH md AS (
        SELECT doc_id, r.i AS r,
               md5(CAST(doc_id AS VARCHAR) || ':' || CAST(r.i AS VARCHAR)) AS h
        FROM documents, generate_series(0, 15) r(i)),
    pix AS (
        SELECT doc_id, r, c.i AS c, {_ph_byte('h', 'c.i')} AS p
        FROM md, generate_series(0, 15) c(i))
    SELECT doc_id, r // 4 AS tile_r, c // 4 AS tile_c,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(p) AS BIGINT) AS byte_sum,
           CAST(MIN(p) AS INTEGER) AS min_p,
           CAST(MAX(p) AS INTEGER) AS max_p
    FROM pix
    GROUP BY doc_id, r // 4, c // 4
    ORDER BY doc_id, tile_r, tile_c
    """,
)
def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style image PATCHING (r10): each 16x16 grayscale payload
    (row r = the 16 bytes of md5(doc_id:r), synthesized JVM-side like
    the dHash thumbnails) splits into a 4x4 grid of 4x4 patches via
    the row-expanding Arrow-batched mapInPandas in
    operators/multimodal.py image_tiles — the tokenizer-input plumbing
    every vision pipeline runs before the (stubbed) encoder. The gate
    compares each patch's exact integer stats (sum/min/max over its 16
    bytes) against a pure-SQL pixel replay of the synthesis, so a
    byte-order, stride, or tiling-boundary bug in the Python decoder
    breaks the hash. Scale: 1 scan, constant 16-row expansion per
    image, no shuffle until the final order."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{r}"))))
            for r in range(16)
        ]
    )
    base = docs.select("doc_id", payload.alias("payload"))
    from cpx_etl_spark.operators.multimodal import image_tiles

    return (
        image_tiles(base, "doc_id", width=16, tile=4)
        .select("doc_id", "tile_r", "tile_c", "n_px", "byte_sum",
                "min_p", "max_p")
        .orderBy("doc_id", "tile_r", "tile_c")
    )
