"""Multimodal + Arrow-Python queries.

The testdata has no real media files, so media bytes are synthesized
deterministically from the documents table (text → UTF-8 bytes, with
magic-byte prefixes cycled by doc_id) — both engines build the same
bytes, so even the mapInPandas decode stubs are hash-verified against a
pure-SQL oracle. What is being proven: binary columns survive the
Spark↔Arrow↔pandas round trip losslessly, the kernels' schemas hold,
and the generator fan-out (frame sampling) is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.functions.pandas_fns import (
    longest_daily_streaks_jvm,
    ws_token_count,
)
from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators import multimodal as mm
from metar_pipeline_spark.queries import register

# content bytes: cycle a magic prefix by doc_id so sniffing has all
# three outcomes. DuckDB blob concat reproduces it byte-for-byte.
_JPEG = "FFD8FF"
_PNG = "89504E47"


def _content_col():
    text_bytes = F.encode(F.col("text"), "UTF-8")
    return (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.to_binary(F.lit(_JPEG), F.lit("hex")), text_bytes),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.to_binary(F.lit(_PNG), F.lit("hex")), text_bytes),
        )
        .otherwise(text_bytes)
    )


_DUCK_CONTENT = f"""
    CASE WHEN doc_id % 3 = 0 THEN from_hex('{_JPEG}') || encode(text)
         WHEN doc_id % 3 = 1 THEN from_hex('{_PNG}') || encode(text)
         ELSE encode(text) END
"""


@register(
    "media_metadata_profile",
    f"""
    SELECT doc_id,
           CAST(octet_length(content) AS INTEGER) AS n_bytes,
           md5(upper(hex(content))) AS content_md5,
           CASE WHEN upper(substr(hex(content), 1, 6)) = '{_JPEG}' THEN 'jpeg'
                WHEN upper(substr(hex(content), 1, 8)) = '{_PNG}' THEN 'png'
                ELSE 'unknown' END AS format
    FROM (SELECT doc_id, {_DUCK_CONTENT} AS content FROM documents)
    """,
    doc="Binary media columns: byte length, content digest, magic-byte sniff — all JVM-side",
)
def media_metadata_profile(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _content_col().alias("content")
    )
    out = mm.attach_media_metadata(docs, "content")
    return out.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.content_md5").alias("content_md5"),
        F.col("media_meta.format").alias("format"),
    )


@register(
    "image_decode_stub",
    f"""
    SELECT doc_id,
           CAST(16 + ('0x' || substr(h, 1, 2))::INT % 240 AS INTEGER) AS width,
           CAST(16 + ('0x' || substr(h, 3, 2))::INT % 240 AS INTEGER) AS height,
           CAST(1 + ('0x' || substr(h, 5, 2))::INT % 3 AS INTEGER) AS n_channels,
           round(('0x' || substr(h, 7, 2))::INT / 255.0, 6) AS brightness
    FROM (SELECT doc_id, md5(upper(hex({_DUCK_CONTENT}))) AS h FROM documents)
    """,
    doc="mapInPandas image-decode plumbing (stub kernel, digest-derived header) — Arrow round trip hash-verified",
)
def image_decode_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _content_col().alias("content")
    )
    # codec pinned to the digest-derived fake so the SQL oracle twin
    # reproduces every field even in PIL-equipped environments
    return mm.decode_images(docs, "doc_id", "content", codec="fake")


@register(
    "video_frame_sample",
    """
    WITH hx AS (
      SELECT doc_id, upper(hex(encode(text))) AS h FROM documents
    )
    SELECT doc_id,
           CAST(k AS INTEGER) AS frame_idx,
           md5(substr(h, k * 64 + 1, 64)) AS frame_md5,
           CAST(length(substr(h, k * 64 + 1, 64)) AS INTEGER) AS frame_bytes
    FROM hx, LATERAL (
      SELECT unnest(generate_series(0, CAST(ceil(length(h) / 64.0) AS INTEGER) - 1, 2)) AS k
    ) ks
    """,
    doc="Frame sampling: 1 row -> N frames via mapInPandas generator (stride-2, 64-byte chunks)",
)
def video_frame_sample(spark, sf_dir):
    # ascii hex payload: python byte-chunking == SQL char-chunking, so
    # the generator fan-out is exactly oracle-checkable.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(
            F.upper(F.hex(F.encode(F.col("text"), "UTF-8"))), "UTF-8"
        ).alias("content"),
    )
    return mm.sample_frames(docs, "doc_id", "content", frame_size=64, stride=2)


@register(
    "audio_features_stub",
    f"""
    WITH c AS (
      SELECT doc_id, upper(hex({_DUCK_CONTENT})) AS h FROM documents
    ), b AS (
      SELECT doc_id, ('0x' || substr(h, k * 2 + 1, 2))::INT AS byte
      FROM c, LATERAL (
        SELECT unnest(generate_series(0, length(h) // 2 - 1)) AS k
      ) ks
    ), s AS (
      SELECT doc_id,
             count(*) AS n,
             sum(byte * byte)::DOUBLE AS ssq,
             avg(CASE WHEN byte = 0 THEN 1.0 ELSE 0.0 END) AS zr
      FROM b GROUP BY 1
    )
    SELECT c.doc_id,
           CAST(coalesce(s.n, 0) AS INTEGER) AS n_samples,
           round(coalesce(sqrt(s.ssq / s.n), 0.0), 6) AS rms_like,
           round(coalesce(s.zr, 0.0), 6) AS zero_byte_ratio
    FROM c LEFT JOIN s USING (doc_id)
    """,
    doc=(
        "Audio feature extraction stub: numpy per-batch RMS/silence over "
        "binary. Byte squares are exact in float64, so the numpy kernel "
        "and the SQL per-byte expansion agree bit-for-bit."
    ),
)
def audio_features_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _content_col().alias("content")
    )
    return mm.extract_audio_features(docs, "doc_id", "content")


@register(
    "pandas_token_count",
    """
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x <> '')) AS INTEGER) AS n_tokens
    FROM documents
    """,
    doc="Scalar pandas_udf (Arrow-vectorized) token count, parity-checked against the JVM form",
)
def pandas_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", ws_token_count(F.col("text")).alias("n_tokens")
    )


@register(
    "longest_daily_streak",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, COUNT(*) AS len FROM grp GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(len) AS INTEGER) AS n_active_days,
           CAST(MAX(len) AS INTEGER) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
    doc=(
        "Per-user longest consecutive-day streak as one JVM aggregate "
        "fold over the sorted day array (no Arrow boundary); oracle = "
        "gaps-and-islands SQL. The applyInPandas form "
        "(pandas_fns.longest_daily_streaks) stays as the documented "
        "grouped-map exhibit, parity-tested against this one."
    ),
)
def longest_daily_streak(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return longest_daily_streaks_jvm(events)


@register(
    "image_resize_stub",
    f"""
    WITH seed AS (
      SELECT doc_id,
             unhex(md5(upper(hex(({_DUCK_CONTENT}) || encode('|8x8'))))) AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(8 AS INTEGER) AS target_w,
           CAST(8 AS INTEGER) AS target_h,
           md5(upper(hex(s || s || s || s))) AS resized_md5,
           CAST(64 AS INTEGER) AS n_bytes
    FROM seed
    """,
    doc="mapInPandas image-resize plumbing (stub kernel, 8x8 target ⇒ seed cycled 4x) — digest-verified",
)
def image_resize_stub(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _content_col().alias("content")
    )
    out = mm.resize_images(docs, 8, 8, "doc_id", "content", codec="fake")
    # raw bytes stay engine-side (BLOB hashing isn't portable to the
    # VARCHAR-md5 oracle); the digest + length pin them exactly.
    return out.select(
        "doc_id", "target_w", "target_h", "resized_md5", "n_bytes"
    )


@register(
    "pandas_iqr_by_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6)
               AS iqr
    FROM events GROUP BY 1
    """,
    doc=(
        "GROUPED_AGG pandas_udf (Arrow UDAF shape): per-type exact "
        "interquartile range — numpy linear-interpolated percentiles "
        "hash-match quantile_cont"
    ),
)
def pandas_iqr_by_type(spark, sf_dir):
    from metar_pipeline_spark.functions.pandas_fns import iqr_agg

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        iqr_agg(F.col("value")).alias("iqr")
    )


@register(
    "udtf_token_chunks",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx,
           array_to_string(toks[k * 10 + 1 : k * 10 + 10], ' ') AS chunk,
           CAST(least(len(toks) - k * 10, 10) AS INTEGER) AS n_tokens
    FROM t, LATERAL (
      SELECT unnest(generate_series(0,
        CAST(ceil(len(toks) / 10.0) AS INTEGER) - 1)) AS k
    ) ks
    """,
    doc=(
        "Python UDTF surface: LATERAL token-chunk table function (one "
        "doc row -> N ordered 10-token chunks, the context-window "
        "splitter) — hash-verified against the pure-SQL unnest twin"
    ),
)
def udtf_token_chunks(spark, sf_dir):
    from metar_pipeline_spark.functions.udtf_fns import TokenChunks

    spark.udtf.register("token_chunks", TokenChunks)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "__docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM __docs_for_udtf d,
             LATERAL token_chunks(d.text, 10) c
        """
    )


@register(
    "arrow_byte_stats",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           text LIKE 'the%' AS starts_the
    FROM documents
    """,
    doc=(
        "mapInArrow surface: per-row binary stats computed on raw "
        "pyarrow RecordBatches (no pandas materialization) — the "
        "lowest-overhead Python eval shape, hash-verified like the "
        "pandas forms"
    ),
)
def arrow_byte_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("content")
    )
    return mm.arrow_byte_stats(docs)


@register(
    "audio_wav_features",
    """
    WITH c AS (
      SELECT doc_id, upper(hex(encode(text))) AS h FROM documents
    ), b AS (
      SELECT doc_id, k, ('0x' || substr(h, k * 2 + 1, 2))::INT - 128 AS q
      FROM c, LATERAL (
        SELECT unnest(generate_series(0, length(h) // 2 - 1)) AS k
      ) ks
    ), p AS (
      SELECT doc_id, k, q,
             lag(q) OVER (PARTITION BY doc_id ORDER BY k) AS pq
      FROM b
    ), s AS (
      SELECT doc_id,
             count(*) AS n,
             max(abs(q)) * 256 AS peak,
             65536 * sum(q * q) AS ssq,
             sum(CASE WHEN sign(q) * sign(pq) < 0 THEN 1 ELSE 0 END) AS zc
      FROM p GROUP BY 1
    )
    SELECT c.doc_id,
           CAST(coalesce(s.n, 0) AS INTEGER) AS n_frames,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(2 AS INTEGER) AS sample_width,
           CAST(coalesce(s.n, 0) * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(coalesce(s.peak, 0) AS BIGINT) AS peak_abs,
           CAST(coalesce(s.ssq, 0) AS BIGINT) AS sum_sq,
           CAST(coalesce(s.zc, 0) AS BIGINT) AS zero_crossings
    FROM c LEFT JOIN s USING (doc_id)
    """,
    doc=(
        "REAL audio codec over real RIFF/PCM bytes (round-12 VERDICT "
        "#3 — the netpbm precedent applied to the second modality): "
        "each document's text bytes become deterministic 16-bit mono "
        "PCM samples (byte-128)*256 encoded as an actual WAV file by "
        "stdlib `wave` (multimodal.synthesize_wav), then an "
        "INDEPENDENT manual RIFF chunk-walker parses the bytes back "
        "(multimodal._wav_parse — encoder and parser cross-check each "
        "other) and exact-integer features are extracted per row: "
        "header facts, floor-division duration, peak amplitude, the "
        "Σs² RMS sufficient statistic (kept in int64 — never a "
        "cross-engine float sqrt), and sign-change zero crossings. "
        "The oracle replays the identical byte math from the raw "
        "text: a hash match proves real bytes flowed through the "
        "real codec seam. Malformed-input guards (bad magic, "
        "non-PCM, truncated chunks) are pinned in "
        "tests/test_formats.py."
    ),
)
def audio_wav_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wavs = mm.synthesize_wav(docs, "doc_id", "text", rate=8000)
    return mm.extract_wav_features(wavs, "doc_id", "wav")


@register(
    "audio_wav_resample",
    """
    WITH c AS (
      SELECT doc_id, upper(hex(encode(text))) AS h FROM documents
    ), b AS (
      SELECT doc_id, k, ('0x' || substr(h, k * 2 + 1, 2))::INT - 128 AS q
      FROM c, LATERAL (
        SELECT unnest(generate_series(0, length(h) // 2 - 1)) AS k
      ) ks
      WHERE k % 3 = 0
    ), p AS (
      SELECT doc_id, k, q,
             lag(q) OVER (PARTITION BY doc_id ORDER BY k) AS pq
      FROM b
    ), s AS (
      SELECT doc_id,
             count(*) AS n,
             max(abs(q)) * 256 AS peak,
             65536 * sum(q * q) AS ssq,
             sum(CASE WHEN sign(q) * sign(pq) < 0 THEN 1 ELSE 0 END) AS zc
      FROM p GROUP BY 1
    )
    SELECT c.doc_id,
           CAST(coalesce(s.n, 0) AS INTEGER) AS n_frames,
           CAST(2666 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(2 AS INTEGER) AS sample_width,
           CAST(coalesce(s.n, 0) * 1000 // 2666 AS BIGINT) AS duration_ms,
           CAST(coalesce(s.peak, 0) AS BIGINT) AS peak_abs,
           CAST(coalesce(s.ssq, 0) AS BIGINT) AS sum_sq,
           CAST(coalesce(s.zc, 0) AS BIGINT) AS zero_crossings
    FROM c LEFT JOIN s USING (doc_id)
    """,
    doc=(
        "Real audio TRANSFORM through the real codec (the audio twin "
        "of the netpbm resize): synthesized WAVs are decimated 3:1 "
        "(multimodal.resample_wav keeps every 3rd frame and re-encodes "
        "at rate//3 — parse → transform → encode inside one Arrow "
        "batch), then the resampled BYTES are parsed back by the "
        "chunk-walker and feature-extracted. The oracle replays the "
        "surviving sample set (k mod 3 = 0) from the raw text bytes: "
        "a hash match proves the decimation happened on real PCM "
        "frames and re-encoded losslessly, not on a digest stub."
    ),
)
def audio_wav_resample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wavs = mm.synthesize_wav(docs, "doc_id", "text", rate=8000)
    small = mm.resample_wav(wavs, 3, "doc_id", "wav")
    return mm.extract_wav_features(small, "doc_id", "resampled")


@register(
    "video_ppm_frame_sample",
    """
    WITH c AS (
      SELECT doc_id, upper(hex(encode(text))) AS h FROM documents
    ), f AS (
      SELECT doc_id, h,
             unnest(generate_series(0, length(h) // 64 - 1)) AS fi
      FROM c WHERE length(h) >= 64
    ), s AS (
      SELECT doc_id, fi,
             ('0x' || substr(h, (fi * 32 + k) * 2 + 1, 2))::INT AS px
      FROM f, LATERAL (
        SELECT unnest(generate_series(0, 31)) AS k
      ) ks
      WHERE fi % 2 = 0
    )
    SELECT doc_id,
           CAST(fi AS INTEGER) AS frame_idx,
           CAST(8 AS INTEGER) AS width,
           CAST(4 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(SUM(px) AS BIGINT) AS sum_luma,
           CAST(MAX(px) AS INTEGER) AS peak_pixel
    FROM s GROUP BY doc_id, fi
    """,
    doc=(
        "REAL video frame sampling through a real public codec: each "
        "document's UTF-8 bytes become consecutive 8×4 grayscale P5 "
        "frames concatenated into ONE binary stream — the netpbm "
        "frame-stream format ffmpeg's image2pipe emits — then "
        "multimodal._ppm_stream_frames decodes the stream frame by "
        "frame and every 2nd frame is kept with exact-integer pixel "
        "stats (Σ luma int64, peak sample). The oracle replays the "
        "identical byte math from the raw text (frame f = bytes "
        "[32f, 32f+32), sampled fi%2=0): a hash match proves real "
        "pixel bytes flowed through a real stream parser, not a "
        "chunking digest (q:video_frame_sample remains the "
        "opaque-codec stand-in shape). Stream-parse guards and the "
        "mid-stream geometry-change case are pinned in "
        "tests/test_formats.py::TestPpmVideoStream."
    ),
)
def video_ppm_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vids = mm.synthesize_ppm_video(docs, width=8, height=4)
    return mm.sample_video_frames_ppm(vids, stride=2)


@register(
    "video_ppm_gop_features",
    """
    WITH c AS (
      SELECT doc_id, upper(hex(encode(text))) AS h FROM documents
    ), n AS (
      SELECT doc_id, h, length(h) // 64 AS nf FROM c
    ), b AS (
      SELECT doc_id,
             ('0x' || substr(h, k * 2 + 1, 2))::INT AS px
      FROM n, LATERAL (
        SELECT unnest(generate_series(0, nf * 32 - 1)) AS k
      ) ks
      WHERE nf > 0
    ), s AS (
      SELECT doc_id, SUM(px) AS tl, MAX(px) AS pk FROM b GROUP BY 1
    )
    SELECT n.doc_id,
           CAST(n.nf AS INTEGER) AS n_frames,
           CAST(CASE WHEN n.nf > 0 THEN 8 ELSE 0 END AS INTEGER)
             AS width,
           CAST(CASE WHEN n.nf > 0 THEN 4 ELSE 0 END AS INTEGER)
             AS height,
           CAST(CASE WHEN n.nf > 0 THEN 1 ELSE 0 END AS INTEGER)
             AS n_channels,
           CAST(coalesce(s.tl, 0) AS BIGINT) AS total_luma,
           CAST(coalesce(s.pk, 0) AS INTEGER) AS peak_pixel
    FROM n LEFT JOIN s USING (doc_id)
    """,
    doc=(
        "Per-video (GOP-level) features off the real frame stream: "
        "frame count (floor of bytes over frame size — leftover bytes "
        "drop, replayed by the oracle), first-frame geometry, total "
        "Σ luma across all frames in int64, global peak pixel. "
        "Zero-frame videos (documents shorter than one frame) report "
        "zero geometry rather than erroring — at curation time "
        "presence IS the signal. Together with "
        "q:video_ppm_frame_sample this closes the last stubbed "
        "modality: image (netpbm, r12), audio (RIFF/PCM, r13), and "
        "video (netpbm frame stream) all run REAL bytes through REAL "
        "parsers in any environment, zero dependencies."
    ),
)
def video_ppm_gop_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vids = mm.synthesize_ppm_video(docs, width=8, height=4)
    return mm.extract_video_features(vids)
