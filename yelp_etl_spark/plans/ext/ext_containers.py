"""Extension catalog — containers queries."""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_etl_spark.sources.readers import load_table

from yelp_etl_spark.plans.ext._shared import (  # noqa: F401
    EXTRA_QUERIES,
    _t,
)



def q_udtf_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface, driver-checked end to end: the registered
    ``split_chunks`` table function (functions/udfs.py) runs in SQL
    LATERAL position over the first 100 documents and the chunk stream
    is re-aggregated per document. The oracle rebuilds the identical
    chunking with pure SQL substring arithmetic — pinning the UDTF's
    row-expansion semantics (0-based chunk ids, ragged tail), not just
    that it runs. UDTFs are row-at-a-time Python: this exists for API
    completeness (chunk_documents is the set-oriented hot path)."""
    from yelp_etl_spark.functions.udfs import register_split_chunks_udtf

    register_split_chunks_udtf(spark)
    (
        _t(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 100) & (F.length("text") > 0))
        .createOrReplaceTempView("udtf_docs_cat")
    )
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(length(c.chunk)) AS BIGINT) AS sum_len,
               CAST(MIN(length(c.chunk)) AS BIGINT) AS min_len,
               CAST(MAX(c.chunk_id) AS BIGINT) AS last_chunk_id
        FROM udtf_docs_cat d, LATERAL split_chunks(d.text, 100) c
        GROUP BY d.doc_id
        """
    )


ORACLE_UDTF_CHUNK_STATS = """
WITH chunks AS MATERIALIZED (
  SELECT doc_id,
         CAST(i // 100 AS INTEGER) AS chunk_id,
         substr(text, CAST(i + 1 AS INTEGER), 100) AS chunk
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(0, CAST(length(text) AS BIGINT) - 1, 100))
             AS i
    FROM documents
    WHERE doc_id < 100 AND length(text) > 0
  )
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(length(chunk)) AS BIGINT) AS sum_len,
       CAST(MIN(length(chunk)) AS BIGINT) AS min_len,
       CAST(MAX(chunk_id) AS BIGINT) AS last_chunk_id
FROM chunks
GROUP BY doc_id
"""


EXTRA_QUERIES.update(
    {
        "udtf_chunk_stats": (
            q_udtf_chunk_stats,
            ORACLE_UDTF_CHUNK_STATS,
            "ext:python UDTF in SQL LATERAL, oracle-checked",
        ),
    }
)


# --------------------------------------------------------------------------
# Multimodal frame-sampling manifest (functions/multimodal.py sample_frames)
# --------------------------------------------------------------------------


def q_frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads
    (multimodal.sample_frames): synthesize deterministic blobs from
    document text, emit 4 evenly-spaced byte windows per blob with
    their offsets, and fingerprint each window portably
    (md5-of-hex — xxhash64 is engine-specific). Everything is
    Catalyst byte arithmetic (explode over a computed offset array +
    binary substring), no Python, no shuffle beyond the explode — the
    shape a 100 TB media table needs, with the codec boundary
    documented in multimodal.decode_blobs. The oracle replays the
    window arithmetic on the hex encoding (DuckDB has no BLOB
    substring), proving offsets, truncation at blob end, and window
    content byte-for-byte."""
    from yelp_etl_spark.functions.multimodal import (
        sample_frames,
        synthesize_blobs,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    blobs = synthesize_blobs(docs.select("doc_id", "text"))
    frames = sample_frames(blobs, n_frames=4, frame_bytes=32)
    return frames.select(
        "doc_id",
        F.col("frame_index").cast("long").alias("frame_index"),
        F.col("frame_offset_bytes").cast("long").alias("frame_offset_bytes"),
        F.md5(
            F.hex(F.expr("substring(content, frame_offset_bytes, 32)"))
        ).alias("frame_md5"),
    ).orderBy("doc_id", "frame_index")


ORACLE_FRAME_SAMPLE = """
WITH b AS MATERIALIZED (
  SELECT doc_id, '89504E470D0A1A0A' || upper(hex(encode(text))) AS hx
  FROM documents WHERE doc_id % 5 = 0
),
f AS MATERIALIZED (
  SELECT doc_id, hx, length(hx) // 2 AS total,
         GREATEST((length(hx) // 2) // 4, 1) AS stride
  FROM b
)
SELECT doc_id, CAST(i AS BIGINT) AS frame_index,
       CAST(i * stride + 1 AS BIGINT) AS frame_offset_bytes,
       md5(substring(hx, i * stride * 2 + 1, 64)) AS frame_md5
FROM f, (SELECT unnest([0, 1, 2, 3]) AS i) g
WHERE i * stride + 1 <= total
ORDER BY doc_id, frame_index
"""


EXTRA_QUERIES.update(
    {
        "frame_sample_manifest": (
            q_frame_sample_manifest,
            ORACLE_FRAME_SAMPLE,
            "ext:multimodal frame sampling (portable window fingerprints)",
        ),
    }
)


# --------------------------------------------------------------------------
# PCM int16 signal statistics (functions/multimodal.py pcm_int16_stats)
# --------------------------------------------------------------------------


def q_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform statistics over binary payloads treated as little-
    endian int16 PCM (multimodal.pcm_int16_stats): peak, RMS, zero
    crossings — all Catalyst byte arithmetic, no audio library. The
    oracle re-reads the same bytes from the hex encoding (two chars
    per byte, LE fold, two's complement)."""
    from yelp_etl_spark.functions.multimodal import pcm_int16_stats

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    blobs = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    return pcm_int16_stats(blobs, "content", "doc_id", n_samples=64)


ORACLE_PCM_STATS = """
WITH b AS MATERIALIZED (
  SELECT doc_id AS id, upper(hex(encode(text))) AS hx,
         octet_length(encode(text)) AS nbytes
  FROM documents WHERE doc_id % 7 = 0
),
samples AS MATERIALIZED (
  SELECT id, i,
         (CAST(concat('0x', substr(hx, i * 4 + 1, 2)) AS BIGINT)
          + 256 * CAST(concat('0x', substr(hx, i * 4 + 3, 2)) AS BIGINT))
         - CASE WHEN (CAST(concat('0x', substr(hx, i * 4 + 1, 2)) AS BIGINT)
                      + 256 * CAST(concat('0x', substr(hx, i * 4 + 3, 2))
                                   AS BIGINT)) >= 32768
                THEN 65536 ELSE 0 END AS s
  FROM b, (SELECT unnest(generate_series(0, 63)) AS i) g
  WHERE 2 * i + 2 <= nbytes
),
stepped AS MATERIALIZED (
  SELECT id, s,
         (CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
         * LAG(CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
             OVER (PARTITION BY id ORDER BY i) AS prod
  FROM samples
)
SELECT id, CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(MAX(ABS(s)) AS BIGINT) AS peak,
       CAST(ROUND(SQRT(CAST(SUM(s * s) AS BIGINT) / COUNT(*)) * 1000000)
            AS BIGINT) AS rms_micro,
       CAST(COALESCE(SUM(CASE WHEN prod = -1 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS zero_crossings
FROM stepped GROUP BY id ORDER BY id
"""


EXTRA_QUERIES.update(
    {
        "pcm_stats": (
            q_pcm_stats,
            ORACLE_PCM_STATS,
            "ext:int16 PCM waveform stats (codec-free byte arithmetic)",
        ),
    }
)


def q_wav_riff_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-container routing pass (multimodal.wav_riff_metadata over
    multimodal.wav_synthesize fixtures): WAV/RIFF chunk walk in pure
    Catalyst arithmetic — fmt fields, the variable-offset 'data' chunk
    located through the preceding chunk's declared size (+ RIFF pad
    rule), a bounded head checksum — aggregated per (channels,
    sample_rate) stream profile. Bytes touched are O(header) per blob
    (hex of the first 256 bytes only). The oracle REBUILDS the same
    container hex from the same arithmetic and re-parses it, so synth
    and walk are both value-checked. Completes the container matrix:
    JPEG (image) / ISO-BMFF (video) / RIFF (audio) / raw PCM."""
    from yelp_etl_spark.functions.multimodal import (
        wav_riff_metadata,
        wav_synthesize,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    meta = wav_riff_metadata(wav_synthesize(docs))
    return (
        meta.groupBy("channels", "sample_rate")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_samples").cast("long").alias("total_samples"),
            F.sum("head_checksum").cast("long").alias("checksum_sum"),
            F.min(
                (F.col("is_data_chunk") & F.col("riff_ok")).cast("long")
            ).cast("long").alias("all_well_formed"),
        )
        .orderBy("channels", "sample_rate")
    )


def _wav_oracle() -> str:
    def le_hex(expr: str, nbytes: int) -> str:
        h = f"lpad(hex({expr}), {2 * nbytes}, '0')"
        pairs = ", ".join(
            f"substr({h}, {2 * i + 1}, 2)" for i in range(nbytes - 1, -1, -1)
        )
        return f"concat({pairs})"

    def le_int(pos: str, nbytes: int) -> str:
        terms = [
            f"CAST(concat('0x', substr(hx, ({pos}) + {2 * i}, 2)) AS BIGINT)"
            f" * {256 ** i}"
            for i in range(nbytes)
        ]
        return "(" + " + ".join(terms) + ")"

    synth = (
        "concat('52494646', "
        + le_hex("4 + 24 + 8 + (doc_id % 12) * 2 + 4 + 8 + datasz", 4)
        + ", '57415645666D7420', "
        + le_hex("16", 4) + ", " + le_hex("1", 2) + ", "
        + le_hex("doc_id % 2 + 1", 2) + ", "
        + le_hex("8000 + (doc_id % 5) * 1000", 4) + ", "
        + le_hex("(8000 + (doc_id % 5) * 1000) * (doc_id % 2 + 1) * 2", 4)
        + ", " + le_hex("(doc_id % 2 + 1) * 2", 2) + ", "
        + le_hex("16", 2)
        + ", '4C495354', " + le_hex("(doc_id % 12) * 2 + 4", 4)
        + ", '494E464F', repeat('20', (doc_id % 12) * 2), '64617461', "
        + le_hex("datasz", 4)
        + ", substr(upper(hex(encode(text))), 1, CAST(2 * datasz AS INT)))"
    )
    sz2 = le_int("81", 4)
    dpos = f"(2 * (45 + {sz2} + ({sz2}) % 2) - 1)"
    datasz_p = le_int(f"{dpos} + 8", 4)
    checksum = " + ".join(
        f"(CASE WHEN {datasz_p} > {i} THEN CAST(concat('0x', substr(hx,"
        f" {dpos} + 16 + {2 * i}, 2)) AS BIGINT) ELSE 0 END)"
        for i in range(8)
    )
    return f"""
WITH src AS MATERIALIZED (
  SELECT doc_id, text,
         LEAST(64, length(text) - length(text) % 2) AS datasz
  FROM documents WHERE doc_id % 3 = 1
),
wav AS MATERIALIZED (
  SELECT doc_id, {synth} AS hx FROM src
),
parsed AS MATERIALIZED (
  SELECT doc_id,
         {le_int("45", 2)} AS channels,
         {le_int("49", 4)} AS sample_rate,
         {datasz_p} // {le_int("65", 2)} AS n_samples,
         (substr(hx, {dpos}, 8) = '64617461') AS is_data_chunk,
         CAST({checksum} AS BIGINT) AS head_checksum,
         (substr(hx, 1, 8) = '52494646'
          AND substr(hx, 17, 8) = '57415645') AS riff_ok
  FROM wav
)
SELECT CAST(channels AS BIGINT) AS channels,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_samples) AS BIGINT) AS total_samples,
       CAST(SUM(head_checksum) AS BIGINT) AS checksum_sum,
       CAST(MIN(CASE WHEN is_data_chunk AND riff_ok THEN 1 ELSE 0 END)
            AS BIGINT) AS all_well_formed
FROM parsed GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLE_WAV_RIFF_PARSE = _wav_oracle()


EXTRA_QUERIES.update(
    {
        "wav_riff_parse": (
            q_wav_riff_parse,
            ORACLE_WAV_RIFF_PARSE,
            "ext:WAV/RIFF chunk-walk metadata (audio container routing pass)",
        ),
    }
)


def q_tiff_ifd_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-container routing pass (multimodal.tiff_ifd_metadata over
    tiff_synthesize fixtures): little-endian TIFF/EXIF IFD walk — the
    OFFSET-CHASING metadata pattern the flat WAV chunk list doesn't
    cover: the header's IFD pointer varies per file (padding before
    the IFD), the entry count lives at the pointed-to offset, and
    tags are scanned from unrolled 12-byte entry slots, all in
    Catalyst hex arithmetic over the first 256 bytes. Aggregated per
    (bits, width-band) image profile; the oracle REBUILDS the same
    container hex from the same arithmetic and re-parses it. With
    JPEG (marker scan), ISO-BMFF (nested box walk, pandas), RIFF
    (linear chunk walk), and raw PCM, this closes the media-metadata
    pattern matrix."""
    from yelp_etl_spark.functions.multimodal import (
        tiff_ifd_metadata,
        tiff_synthesize,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 2)
    meta = tiff_ifd_metadata(tiff_synthesize(docs))
    return (
        meta.groupBy(
            "bits", F.expr("width div 16").cast("long").alias("width_band")
        )
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum(F.col("width") * F.col("height")).cast("long")
            .alias("pixel_sum"),
            F.sum("strip_bytes").cast("long").alias("strip_sum"),
            F.min(F.col("tiff_ok").cast("long")).cast("long")
            .alias("all_well_formed"),
        )
        .orderBy("bits", "width_band")
    )


def _tiff_oracle() -> str:
    def le_hex(expr: str, nbytes: int) -> str:
        h = f"lpad(hex({expr}), {2 * nbytes}, '0')"
        pairs = ", ".join(
            f"substr({h}, {2 * i + 1}, 2)" for i in range(nbytes - 1, -1, -1)
        )
        return f"concat({pairs})"

    def le_int(pos: str, nbytes: int) -> str:
        terms = [
            f"CAST(concat('0x', substr(hx, ({pos}) + {2 * i}, 2)) AS BIGINT)"
            f" * {256 ** i}"
            for i in range(nbytes)
        ]
        return "(" + " + ".join(terms) + ")"

    def entry(tag: int, value_expr: str) -> str:
        return (
            f"{le_hex(str(tag), 2)}, {le_hex('4', 2)}, {le_hex('1', 4)}, "
            f"{le_hex(value_expr, 4)}"
        )

    synth = (
        "concat('49492A00', "
        + le_hex("8 + (doc_id % 8) * 2", 4)
        + ", repeat('00', (doc_id % 8) * 2), "
        + le_hex("4", 2) + ", "
        + entry(256, "doc_id % 64 + 16") + ", "
        + entry(257, "doc_id % 48 + 8") + ", "
        + entry(258, "16") + ", "
        + entry(279, "LEAST(64, length(text))")
        + ", " + le_hex("0", 4)
        + ", substr(upper(hex(encode(text))), 1,"
        "  CAST(2 * LEAST(64, length(text)) AS INT)))"
    )
    ifd_off = le_int("9", 4)
    ifd_pos = f"(2 * {ifd_off} + 1)"
    n_entries = le_int(ifd_pos, 2)

    def tag_value(tag: int) -> str:
        slots = []
        for i in range(8):
            epos = f"({ifd_pos} + 4 + {24 * i})"
            slots.append(
                f"(CASE WHEN {n_entries} > {i} AND {le_int(epos, 2)} = {tag}"
                f" THEN {le_int(f'{epos} + 16', 4)} END)"
            )
        return "COALESCE(" + ", ".join(slots) + ")"

    return f"""
WITH tiff AS MATERIALIZED (
  SELECT doc_id, {synth} AS hx
  FROM documents WHERE doc_id % 4 = 2
),
parsed AS MATERIALIZED (
  SELECT doc_id,
         {tag_value(256)} AS width,
         {tag_value(257)} AS height,
         {tag_value(258)} AS bits,
         {tag_value(279)} AS strip_bytes,
         (substr(hx, 1, 8) = '49492A00') AS tiff_ok
  FROM tiff
)
SELECT CAST(bits AS BIGINT) AS bits,
       CAST(width // 16 AS BIGINT) AS width_band,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(width * height) AS BIGINT) AS pixel_sum,
       CAST(SUM(strip_bytes) AS BIGINT) AS strip_sum,
       CAST(MIN(CASE WHEN tiff_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS all_well_formed
FROM parsed GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLE_TIFF_IFD_PARSE = _tiff_oracle()


EXTRA_QUERIES.update(
    {
        "tiff_ifd_parse": (
            q_tiff_ifd_parse,
            ORACLE_TIFF_IFD_PARSE,
            "ext:TIFF/EXIF IFD walk (offset-chasing image metadata)",
        ),
    }
)


# --------------------------------------------------------------------------
# Round 9: PNG chunk walk + JPEG SOF marker walk (closing the
# image-container routing family beside WAV/RIFF, TIFF/EXIF, ISO-BMFF)
# --------------------------------------------------------------------------


def q_png_ihdr_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-container routing pass (multimodal.png_chunk_metadata over
    png_synthesize fixtures): the BIG-ENDIAN chunk-list walk — IHDR
    fields at the spec-mandated fixed offsets, then a chunk chain walk
    chasing each declared length (+12 framing bytes) to locate IDAT
    past a variable-length tEXt chunk, all in Catalyst hex arithmetic
    over the first 256 bytes. Aggregated per (bit_depth, color_type)
    image profile with the IDAT offset spread proving the walk chased
    real per-file offsets; the oracle rebuilds the identical container
    hex in SQL and re-parses it."""
    from yelp_etl_spark.functions.multimodal import (
        png_chunk_metadata,
        png_synthesize,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 1)
    meta = png_chunk_metadata(png_synthesize(docs))
    return (
        meta.groupBy("bit_depth", "color_type")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum(F.col("width") * F.col("height")).cast("long")
            .alias("pixel_sum"),
            F.sum("idat_bytes").cast("long").alias("idat_sum"),
            F.min("idat_offset").cast("long").alias("min_idat_offset"),
            F.max("idat_offset").cast("long").alias("max_idat_offset"),
            F.min(F.col("png_ok").cast("long")).cast("long")
            .alias("all_well_formed"),
        )
        .orderBy("bit_depth", "color_type")
    )


def _png_oracle() -> str:
    def be_hex(expr: str, nbytes: int) -> str:
        return f"lpad(hex({expr}), {2 * nbytes}, '0')"

    def be_int(pos: str, nbytes: int) -> str:
        return (
            f"TRY_CAST(concat('0x', substr(hx, ({pos}), {2 * nbytes}))"
            f" AS BIGINT)"
        )

    synth = (
        "upper(concat('89504E470D0A1A0A', "
        + be_hex("13", 4) + ", '49484452', "
        + be_hex("doc_id % 96 + 32", 4) + ", "
        + be_hex("doc_id % 64 + 16", 4) + ", "
        + be_hex("(doc_id % 5 % 2 + 1) * 8", 1) + ", "
        + be_hex("CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 2 END", 1)
        + ", '000000', "
        + be_hex("(doc_id % 96 + 32) * 31 + (doc_id % 64 + 16)", 4) + ", "
        + be_hex("(doc_id % 10) * 2", 4)
        + ", '74455874', repeat('20', CAST((doc_id % 10) * 2 AS INT)),"
        " '00000000', "
        + be_hex("LEAST(64, length(text))", 4)
        + ", '49444154', substr(upper(hex(encode(text))), 1,"
        "  CAST(2 * LEAST(64, length(text)) AS INT)), '00000000', "
        + be_hex("0", 4) + ", '49454E44', 'AE426082'))"
    )
    pos = "67"
    len_slots, pos_slots = [], []
    for _ in range(6):
        is_idat = f"substr(hx, ({pos}) + 8, 8) = '49444154'"
        len_slots.append(f"(CASE WHEN {is_idat} THEN {be_int(pos, 4)} END)")
        pos_slots.append(
            f"(CASE WHEN {is_idat} THEN (({pos}) + 1) // 2 END)"
        )
        pos = f"(({pos}) + 24 + 2 * {be_int(pos, 4)})"
    return f"""
WITH png AS MATERIALIZED (
  SELECT doc_id, {synth} AS hx
  FROM documents WHERE doc_id % 4 = 1
),
parsed AS MATERIALIZED (
  SELECT doc_id,
         {be_int('33', 4)} AS width,
         {be_int('41', 4)} AS height,
         {be_int('49', 1)} AS bit_depth,
         {be_int('51', 1)} AS color_type,
         COALESCE({', '.join(len_slots)}) AS idat_bytes,
         COALESCE({', '.join(pos_slots)}) AS idat_offset,
         (substr(hx, 1, 16) = '89504E470D0A1A0A'
          AND substr(hx, 25, 8) = '49484452') AS png_ok
  FROM png
)
SELECT CAST(bit_depth AS BIGINT) AS bit_depth,
       CAST(color_type AS BIGINT) AS color_type,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(width * height) AS BIGINT) AS pixel_sum,
       CAST(SUM(idat_bytes) AS BIGINT) AS idat_sum,
       CAST(MIN(idat_offset) AS BIGINT) AS min_idat_offset,
       CAST(MAX(idat_offset) AS BIGINT) AS max_idat_offset,
       CAST(MIN(CASE WHEN png_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS all_well_formed
FROM parsed GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_jpeg_sof_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-container routing pass (multimodal.jpeg_sof_metadata over
    jpeg_synthesize fixtures): the JPEG marker-segment walk — from
    SOI, each unrolled slot reads the marker and its big-endian
    INCLUSIVE declared length (JPEG's rule, unlike PNG/RIFF) and
    either recognizes the SOF family (FFC0–FFCF minus C4/C8/CC) or
    hops to the next marker, so SOF0 is found past the canonical APP0
    and a variable-length COM segment, all in Catalyst hex arithmetic
    over the first 256 bytes. Aggregated per (n_components, height
    band) frame profile; the oracle rebuilds the identical header hex
    in SQL and re-parses it."""
    from yelp_etl_spark.functions.multimodal import (
        jpeg_sof_metadata,
        jpeg_synthesize,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 3)
    meta = jpeg_sof_metadata(jpeg_synthesize(docs))
    return (
        meta.groupBy(
            "n_components",
            F.expr("height div 50").cast("long").alias("height_band"),
        )
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum(F.col("width") * F.col("height")).cast("long")
            .alias("pixel_sum"),
            F.sum("precision").cast("long").alias("precision_sum"),
            F.min("sof_marker").cast("long").alias("sof_marker"),
            F.min(F.col("jpeg_ok").cast("long")).cast("long")
            .alias("all_well_formed"),
        )
        .orderBy("n_components", "height_band")
    )


def _jpeg_oracle() -> str:
    def be_hex(expr: str, nbytes: int) -> str:
        return f"lpad(hex({expr}), {2 * nbytes}, '0')"

    def be_int(pos: str, nbytes: int) -> str:
        return (
            f"TRY_CAST(concat('0x', substr(hx, ({pos}), {2 * nbytes}))"
            f" AS BIGINT)"
        )

    synth = (
        "upper(concat('FFD8', 'FFE0', " + be_hex("16", 2)
        + ", '4A46494600', '0101', '00', '0048', '0048', '0000',"
        " 'FFFE', " + be_hex("(doc_id % 9) * 2 + 2", 2)
        + ", repeat('20', CAST((doc_id % 9) * 2 AS INT)),"
        " 'FFC0', " + be_hex("(doc_id % 2 * 2 + 1) * 3 + 8", 2)
        + ", '08', " + be_hex("doc_id % 200 + 16", 2)
        + ", " + be_hex("doc_id % 160 + 24", 2)
        + ", " + be_hex("doc_id % 2 * 2 + 1", 1)
        + ", concat('011100', CASE WHEN doc_id % 2 * 2 + 1 = 3"
        " THEN '021100031100' ELSE '' END),"
        " substr(upper(hex(encode(text))), 1,"
        "  CAST(2 * LEAST(32, length(text)) AS INT)), 'FFD9'))"
    )
    pos = "5"
    slots: dict[str, list[str]] = {
        "precision": [], "height": [], "width": [],
        "n_components": [], "sof_marker": [],
    }
    for _ in range(6):
        mbyte = be_int(f"({pos}) + 2", 1)
        is_sof = (
            f"(substr(hx, ({pos}), 2) = 'FF'"
            f" AND {mbyte} BETWEEN 192 AND 207"
            f" AND {mbyte} NOT IN (196, 200, 204))"
        )
        slots["sof_marker"].append(f"(CASE WHEN {is_sof} THEN {mbyte} END)")
        slots["precision"].append(
            f"(CASE WHEN {is_sof} THEN {be_int(f'({pos}) + 8', 1)} END)"
        )
        slots["height"].append(
            f"(CASE WHEN {is_sof} THEN {be_int(f'({pos}) + 10', 2)} END)"
        )
        slots["width"].append(
            f"(CASE WHEN {is_sof} THEN {be_int(f'({pos}) + 14', 2)} END)"
        )
        slots["n_components"].append(
            f"(CASE WHEN {is_sof} THEN {be_int(f'({pos}) + 18', 1)} END)"
        )
        pos = f"(({pos}) + 4 + 2 * {be_int(f'({pos}) + 4', 2)})"
    fields = ",\n         ".join(
        f"COALESCE({', '.join(s)}) AS {name}" for name, s in slots.items()
    )
    return f"""
WITH jpg AS MATERIALIZED (
  SELECT doc_id, {synth} AS hx
  FROM documents WHERE doc_id % 4 = 3
),
parsed AS MATERIALIZED (
  SELECT doc_id,
         {fields},
         (substr(hx, 1, 4) = 'FFD8') AS jpeg_ok
  FROM jpg
)
SELECT CAST(n_components AS BIGINT) AS n_components,
       CAST(height // 50 AS BIGINT) AS height_band,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(width * height) AS BIGINT) AS pixel_sum,
       CAST(SUM(precision) AS BIGINT) AS precision_sum,
       CAST(MIN(sof_marker) AS BIGINT) AS sof_marker,
       CAST(MIN(CASE WHEN jpeg_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS all_well_formed
FROM parsed GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLE_PNG_IHDR_PARSE = _png_oracle()
ORACLE_JPEG_SOF_PARSE = _jpeg_oracle()


EXTRA_QUERIES.update(
    {
        "png_ihdr_parse": (
            q_png_ihdr_parse,
            ORACLE_PNG_IHDR_PARSE,
            "ext:PNG chunk walk (big-endian image metadata routing)",
        ),
        "jpeg_sof_parse": (
            q_jpeg_sof_parse,
            ORACLE_JPEG_SOF_PARSE,
            "ext:JPEG SOF marker-segment walk (Catalyst hex arithmetic)",
        ),
    }
)


def q_gif_block_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-container routing pass (multimodal.gif_block_metadata over
    gif_synthesize fixtures): the REPEATED-substructure walk that
    completes the container-pattern matrix — a type-dispatched block
    list (comment extension + 1–3 animation frames + trailer) where
    each slot branches on the block type byte, counts/measures image
    descriptors, and skips extensions by their declared sub-block
    length. Aggregated per frame-count profile with the frame-area sum
    proving the descriptors were actually read; the oracle rebuilds
    the identical container hex in SQL and re-parses it with the same
    unrolled dispatch."""
    from yelp_etl_spark.functions.multimodal import (
        gif_block_metadata,
        gif_synthesize,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    meta = gif_block_metadata(gif_synthesize(docs))
    return (
        meta.groupBy("n_frames")
        .agg(
            F.count("*").cast("long").alias("n_gifs"),
            F.sum("n_extensions").cast("long").alias("ext_sum"),
            F.sum("frame_area_sum").cast("long").alias("area_sum"),
            F.sum(F.col("lsd_width") * F.col("lsd_height")).cast("long")
            .alias("screen_area_sum"),
            F.min(F.col("gif_ok").cast("long")).cast("long")
            .alias("all_well_formed"),
        )
        .orderBy("n_frames")
    )


def _gif_oracle() -> str:
    def le_hex(expr: str, nbytes: int) -> str:
        h = f"lpad(hex({expr}), {2 * nbytes}, '0')"
        pairs = ", ".join(
            f"substr({h}, {2 * i + 1}, 2)" for i in range(nbytes - 1, -1, -1)
        )
        return f"concat({pairs})"

    def le_int(pos: str, nbytes: int) -> str:
        terms = [
            f"TRY_CAST(concat('0x', substr(hx, ({pos}) + {2 * i}, 2)) AS BIGINT)"
            f" * {256 ** i}"
            for i in range(nbytes)
        ]
        return "(" + " + ".join(terms) + ")"

    dsz = "GREATEST(1, LEAST(16, length(text)))"

    def frame(f: int) -> str:
        return (
            f"CASE WHEN doc_id % 3 + 1 > {f} THEN concat('2C', "
            + le_hex(str(2 * f), 2) + ", "
            + le_hex("0", 2) + ", "
            + le_hex(f"doc_id % 30 + 5 + {f}", 2) + ", "
            + le_hex("doc_id % 20 + 4", 2)
            + ", '00', '02', "
            + le_hex(dsz, 1)
            + ", substr(upper(hex(encode(concat(text, '.')))), 1,"
            f"  CAST(2 * {dsz} AS INT)), '00') ELSE '' END"
        )

    synth = (
        "upper(concat('474946383961', "
        + le_hex("doc_id % 200 + 20", 2) + ", "
        + le_hex("doc_id % 150 + 15", 2)
        + ", '000000', '21FE', "
        + le_hex("doc_id % 9 + 1", 1)
        + ", repeat('41', CAST(doc_id % 9 + 1 AS INT)), '00', "
        + frame(0) + ", " + frame(1) + ", " + frame(2)
        + ", '3B'))"
    )
    pos = "27"
    frames, exts, areas = [], [], []
    for _ in range(4):
        tb = f"substr(hx, ({pos}), 2)"
        frames.append(f"(CASE WHEN {tb} = '2C' THEN 1 ELSE 0 END)")
        exts.append(f"(CASE WHEN {tb} = '21' THEN 1 ELSE 0 END)")
        areas.append(
            f"(CASE WHEN {tb} = '2C'"
            f" THEN {le_int(f'({pos}) + 10', 2)}"
            f" * {le_int(f'({pos}) + 14', 2)} ELSE 0 END)"
        )
        pos = (
            f"(CASE WHEN {tb} = '2C'"
            f" THEN ({pos}) + 26 + 2 * {le_int(f'({pos}) + 22', 1)}"
            f" WHEN {tb} = '21'"
            f" THEN ({pos}) + 8 + 2 * {le_int(f'({pos}) + 4', 1)}"
            f" ELSE ({pos}) END)"
        )
    return f"""
WITH gif AS MATERIALIZED (
  SELECT doc_id, {synth} AS hx
  FROM documents WHERE doc_id % 4 = 0
),
parsed AS MATERIALIZED (
  SELECT doc_id,
         {le_int('13', 2)} AS lsd_width,
         {le_int('17', 2)} AS lsd_height,
         CAST({' + '.join(frames)} AS BIGINT) AS n_frames,
         CAST({' + '.join(exts)} AS BIGINT) AS n_extensions,
         CAST({' + '.join(areas)} AS BIGINT) AS frame_area_sum,
         (substr(hx, 1, 12) = '474946383961'
          AND {le_int('21', 1)} < 128) AS gif_ok
  FROM gif
)
SELECT n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_gifs,
       CAST(SUM(n_extensions) AS BIGINT) AS ext_sum,
       CAST(SUM(frame_area_sum) AS BIGINT) AS area_sum,
       CAST(SUM(lsd_width * lsd_height) AS BIGINT) AS screen_area_sum,
       CAST(MIN(CASE WHEN gif_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS all_well_formed
FROM parsed GROUP BY 1 ORDER BY 1
"""


ORACLE_GIF_BLOCK_PARSE = _gif_oracle()


EXTRA_QUERIES.update(
    {
        "gif_block_parse": (
            q_gif_block_parse,
            ORACLE_GIF_BLOCK_PARSE,
            "ext:GIF typed block walk (repeated-substructure dispatch)",
        ),
    }
)


def q_zip_central_dir_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive-container routing pass (multimodal.zip_central_dir_
    metadata over zip_synthesize fixtures): ZIP central-directory walk
    in pure Catalyst hex arithmetic — EOCD trailer located at the END
    of the blob (the range-request access pattern a remote/distributed
    ZIP reader uses), member count + CD offset chased from it, then
    up to 4 unrolled 46-byte central headers verified and extracted.
    Aggregated per member-count profile. The oracle REBUILDS the same
    archive hex from the same arithmetic and re-parses it, so synth
    and walk are both value-checked (the WAV/TIFF convention). Adds
    the ARCHIVE format family beside image (TIFF/PNG/JPEG/GIF), audio
    (WAV/PCM) and video (ISO-BMFF)."""
    from yelp_etl_spark.functions.multimodal import (
        zip_central_dir_metadata,
        zip_synthesize,
    )

    docs = _t(spark, sf_dir, "documents")
    meta = zip_central_dir_metadata(zip_synthesize(docs))
    return (
        meta.groupBy("n_members")
        .agg(
            F.count("*").cast("long").alias("n_archives"),
            F.sum("total_usize").cast("long").alias("sum_usize"),
            F.sum("total_crc").cast("long").alias("sum_crc"),
            F.max("names_csv").alias("names_csv"),
            F.min(
                (
                    F.col("cd_size_ok")
                    & F.col("entries_ok")
                    & F.col("eocd_ok")
                ).cast("long")
            )
            .cast("long")
            .alias("all_well_formed"),
        )
        .orderBy("n_members")
    )


def _zip_oracle() -> str:
    def le_hex(expr: str, nbytes: int) -> str:
        h = f"lpad(hex(CAST({expr} AS BIGINT)), {2 * nbytes}, '0')"
        pairs = ", ".join(
            f"substr({h}, {2 * i + 1}, 2)" for i in range(nbytes - 1, -1, -1)
        )
        return f"concat({pairs})"

    def le_int(src: str, pos: str, nbytes: int) -> str:
        terms = [
            f"CAST(concat('0x', substr({src}, ({pos}) + {2 * i}, 2))"
            f" AS BIGINT) * {256 ** i}"
            for i in range(nbytes)
        ]
        return "(" + " + ".join(terms) + ")"

    def d(i: int) -> str:
        return f"((doc_id + {i}) % 5 + 4)"

    def local_hdr(i: int) -> str:
        return (
            "concat('504B0304', '1400', '0000', '0000', '0000', '0000', "
            + le_hex(f"{d(i)} * 7 + {i}", 4) + ", "
            + le_hex(d(i), 4) + ", " + le_hex(d(i), 4)
            + ", '0200', '0000', "
            + f"'663{i}', repeat('AB', CAST({d(i)} AS INT)))"
        )

    def offset(i: int) -> str:
        if i == 1:
            return "0"
        return "(" + " + ".join(f"(32 + {d(j)})" for j in range(1, i)) + ")"

    def cd_entry(i: int) -> str:
        return (
            "concat('504B0102', '1400', '1400', '0000', '0000', '0000',"
            " '0000', "
            + le_hex(f"{d(i)} * 7 + {i}", 4) + ", "
            + le_hex(d(i), 4) + ", " + le_hex(d(i), 4)
            + ", '0200', '0000', '0000', '0000', '0000', '00000000', "
            + le_hex(offset(i), 4)
            + f", '663{i}')"
        )

    def if_member(i: int, part: str) -> str:
        return f"(CASE WHEN m >= {i} THEN {part} ELSE '' END)"

    cd_off = "(" + " + ".join(
        f"(CASE WHEN m >= {j} THEN 32 + {d(j)} ELSE 0 END)"
        for j in range(1, 4)
    ) + ")"
    eocd = (
        "concat('504B0506', '0000', '0000', "
        + le_hex("m", 2) + ", " + le_hex("m", 2) + ", "
        + le_hex("m * 48", 4) + ", " + le_hex(cd_off, 4) + ", '0000')"
    )
    synth = "concat(" + ", ".join(
        [if_member(i, local_hdr(i)) for i in range(1, 4)]
        + [if_member(i, cd_entry(i)) for i in range(1, 4)]
        + [eocd]
    ) + ")"

    n_total = le_int("tl", "21", 2)
    cd_size = le_int("tl", "25", 4)
    cd_off_p = le_int("tl", "33", 4)

    def slot(i: int, what: str) -> str:
        pos = f"(1 + {96 * i})"
        namelen = le_int("cd", f"{pos} + 56", 2)
        fields = {
            "sig_ok": f"(substr(cd, {pos}, 8) = '504B0102')",
            "crc": le_int("cd", f"{pos} + 32", 4),
            "usize": le_int("cd", f"{pos} + 48", 4),
            "name": (
                f"decode(from_hex(substr(cd, {pos} + 92,"
                f" CAST(2 * {namelen} AS INT))))"
            ),
        }
        return f"(CASE WHEN n_members > {i} THEN {fields[what]} END)"

    def summed(what: str) -> str:
        return "(" + " + ".join(
            f"COALESCE({slot(i, what)}, 0)" for i in range(4)
        ) + ")"

    sig_all = " AND ".join(
        f"COALESCE({slot(i, 'sig_ok')}, TRUE)" for i in range(4)
    )
    names = (
        "array_to_string(list_filter(["
        + ", ".join(slot(i, "name") for i in range(4))
        + "], x -> x IS NOT NULL), ',')"
    )
    return f"""
WITH src AS MATERIALIZED (
  SELECT doc_id, doc_id % 3 + 1 AS m FROM documents
),
zipped AS MATERIALIZED (
  SELECT doc_id, {synth} AS hx FROM src
),
anchored AS (
  SELECT doc_id,
         substr(hx, length(hx) - 43, 44) AS tl,
         hx
  FROM zipped
),
located AS (
  SELECT doc_id, tl,
         CAST({n_total} AS BIGINT) AS n_members,
         CAST({cd_size} AS BIGINT) AS cd_size,
         substr(hx, CAST(2 * {cd_off_p} AS INT) + 1, 400) AS cd
  FROM anchored
),
parsed AS (
  SELECT doc_id, n_members,
         CAST({summed('usize')} AS BIGINT) AS total_usize,
         CAST({summed('crc')} AS BIGINT) AS total_crc,
         {names} AS names_csv,
         (cd_size = n_members * 48) AS cd_size_ok,
         ({sig_all}) AS entries_ok,
         (substr(tl, 1, 8) = '504B0506') AS eocd_ok
  FROM located
)
SELECT n_members,
       CAST(COUNT(*) AS BIGINT) AS n_archives,
       CAST(SUM(total_usize) AS BIGINT) AS sum_usize,
       CAST(SUM(total_crc) AS BIGINT) AS sum_crc,
       MAX(names_csv) AS names_csv,
       CAST(MIN(CASE WHEN cd_size_ok AND entries_ok AND eocd_ok
                THEN 1 ELSE 0 END) AS BIGINT) AS all_well_formed
FROM parsed GROUP BY 1 ORDER BY 1
"""


ORACLE_ZIP_CENTRAL_DIR_PARSE = _zip_oracle()


EXTRA_QUERIES.update(
    {
        "zip_central_dir_parse": (
            q_zip_central_dir_parse,
            ORACLE_ZIP_CENTRAL_DIR_PARSE,
            "ext:ZIP central-directory walk (END-anchored EOCD chase,"
            " archive container family)",
        ),
    }
)
