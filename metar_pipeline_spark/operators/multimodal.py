"""Multimodal (image/audio/video) column operators.

Design for a 100 TB training-data lake: media lives in parquet as opaque
``binary`` columns next to typed metadata structs — never as paths that
force per-row random IO. Decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` stages so bytes cross the
JVM↔Python boundary in columnar batches, and each output carries an
explicit StructType (schema drift impossible).

The actual codecs (PIL / torchaudio / ffmpeg) are NOT in this
environment, so the decode kernels are stubbed: ``decode_image`` raises
NotImplementedError unless a library is importable, and every pipeline
below also offers a deterministic fake kernel (byte-derived) so the
Spark-side plumbing — schema, batch iteration, partitioning, generator
fan-out — is fully real and testable. Swapping the fake for a real
codec changes only the inner function body.

Scale notes:
- mapInPandas streams batches (spark.sql.execution.arrow.maxRecordsPerBatch);
  a 10 MB-per-row video column needs that lowered — callers repartition
  by byte budget first (`repartition_by_bytes`).
- frame sampling is a generator (one in-row → many out-rows) — the
  Python-side analogue of explode, no driver involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# JVM-side metadata (no Python in this path)
# ---------------------------------------------------------------------------

# magic-byte prefixes → sniffed container format (hex, uppercase)
_MAGIC = {
    "FFD8FF": "jpeg",
    "89504E47": "png",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi
    "66747970": "mp4",  # ftyp at offset 4; approximated on prefix
    "494433": "mp3",
}


def sniff_format(bin_col) -> F.Column:
    """Container sniff from magic bytes — pure JVM expression (hex +
    when-chain), no UDF."""
    hx = F.upper(F.hex(F.substring(bin_col, 1, 8)))
    out = F.lit("unknown")
    for magic, fmt in _MAGIC.items():
        out = F.when(hx.startswith(magic), F.lit(fmt)).otherwise(out)
    return out


def attach_media_metadata(df: DataFrame, bin_col: str = "content") -> DataFrame:
    """Add a typed metadata struct: byte length, content md5, sniffed
    format. All codegen'd column expressions — this is the cheap pass
    that runs over the full 100 TB; decode only runs on the rows a
    filter on this struct selects."""
    b = F.col(bin_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(b).alias("n_bytes"),
            # digest of the uppercase hex encoding (not the raw bytes):
            # equally a content address, and reproducible in engines
            # whose md5 only accepts strings (portable oracle).
            F.md5(F.upper(F.hex(b))).alias("content_md5"),
            sniff_format(b).alias("format"),
        ),
    )


def repartition_by_bytes(
    df: DataFrame, bin_col: str, target_bytes_per_partition: int
) -> DataFrame:
    """Right-size partitions for heavy binary rows: estimate total bytes
    (cheap agg) and repartition so each Arrow batch stays within the
    executor memory budget."""
    total = df.agg(F.sum(F.length(F.col(bin_col)))).first()[0] or 0
    n = max(1, int(total // max(target_bytes_per_partition, 1)) + 1)
    return df.repartition(n)


# ---------------------------------------------------------------------------
# Decode stubs (Arrow-batched Python)
# ---------------------------------------------------------------------------

IMAGE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("brightness", T.DoubleType()),
    ]
)


def _fake_image_header(buf: bytes) -> tuple[int, int, int, float]:
    """Deterministic digest-derived stand-in for a real decoder — every
    field is a pure function of md5(buf), so an external SQL oracle can
    reproduce it exactly from the hex digest."""
    d = hashlib.md5(buf.hex().upper().encode()).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    channels = 1 + d[2] % 3
    brightness = round(d[3] / 255.0, 6)
    return width, height, channels, brightness


def _resolve_codec(codec: str) -> str:
    """'auto' → 'pil' when PIL is importable, else 'fake'; 'pil'
    raises if the library is absent (explicit request must not
    silently degrade). 'ppm' is the dependency-free REAL codec (pure
    stdlib netpbm P5/P6 — see :func:`_ppm_parse`): real pixel parsing
    and resampling that executes in any environment, so the real-codec
    seam is exercised even where PIL cannot be installed."""
    if codec == "fake":
        return "fake"
    if codec == "ppm":
        return "ppm"
    import importlib.util

    have_pil = importlib.util.find_spec("PIL") is not None
    if codec == "auto":
        return "pil" if have_pil else "fake"
    if codec == "pil":
        if not have_pil:
            raise NotImplementedError(
                "codec='pil' requested but PIL is not installed"
            )
        return "pil"
    raise ValueError(f"unknown codec {codec!r} (use auto|pil|ppm|fake)")


def _ppm_parse(b: bytes) -> "tuple[int, int, int, bytes]":
    """Parse a binary netpbm image (P5 grayscale / P6 RGB, maxval 255):
    → (width, height, n_channels, pixel bytes). Pure stdlib — the
    format is three whitespace-separated header tokens (with
    ``#``-comment support) followed by raw samples, which makes it the
    one REAL image codec an engine can carry with zero dependencies."""
    if len(b) < 2 or b[0:1] != b"P" or b[1:2] not in (b"5", b"6"):
        raise ValueError("not a binary netpbm image (want P5/P6 magic)")
    channels = 3 if b[1:2] == b"6" else 1
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval, then raw samples
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported netpbm maxval {maxval} (want 255)")
    need = w * h * channels
    pix = b[pos:pos + need]
    if len(pix) != need:
        raise ValueError(
            f"truncated netpbm payload: want {need} bytes, have {len(pix)}"
        )
    return w, h, channels, pix


def _ppm_encode(w: int, h: int, channels: int, pix: bytes) -> bytes:
    """Inverse of :func:`_ppm_parse` (P5 for 1 channel, P6 for 3)."""
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + bytes(pix)


def _ppm_resize_nn(
    w: int, h: int, channels: int, pix: bytes, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample (floor sampling — deterministic,
    engine-independent integer math)."""
    out = bytearray(tw * th * channels)
    for ty in range(th):
        sy = min(h - 1, (ty * h) // th)
        for tx in range(tw):
            sx = min(w - 1, (tx * w) // tw)
            s = (sy * w + sx) * channels
            d = (ty * tw + tx) * channels
            out[d:d + channels] = pix[s:s + channels]
    return bytes(out)


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "content",
    codec: str = "auto",
) -> DataFrame:
    """Image decode → (id, width, height, n_channels, brightness).

    Real-decoder seam: codec='auto' upgrades to a real PIL decode when
    the library is importable (richer environments) and falls back to
    the deterministic digest-derived fake header here. The
    oracle-paired stub query pins codec='fake' so its SQL digest twin
    stays engine-reproducible regardless of installed libraries. The
    mapInPandas shape (batched, schema'd, no driver data) is the
    production shape either way. PIL-gated integration test:
    tests/test_formats.py::TestRealCodecs.
    """
    use = _resolve_codec(codec)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use == "pil":  # pragma: no cover - PIL absent in this env
            import io as _io

            try:
                import PIL.Image
                from PIL import ImageStat
            except ImportError as e:
                # resolution happened on the DRIVER; this runs on an
                # EXECUTOR — fail with the actual cluster misconfig
                # instead of a bare ModuleNotFoundError per task
                raise RuntimeError(
                    "codec resolved to 'pil' on the driver but PIL is "
                    "not importable on this executor — install Pillow "
                    "in the executor image or pass codec='fake'"
                ) from e

        for pdf in batches:
            if use == "pil":  # pragma: no cover - PIL absent here
                rows = []
                for i, b in zip(pdf[id_col], pdf[bin_col]):
                    img = PIL.Image.open(_io.BytesIO(bytes(b)))
                    img.load()
                    # brightness on a CONVERTED 8-bit RGB view:
                    # ImageStat on the raw image averages palette
                    # INDICES for 'P' mode and 0..65535 values for
                    # 16/32-bit modes, landing far outside [0,1];
                    # n_channels still reports the ORIGINAL bands
                    means = ImageStat.Stat(img.convert("RGB")).mean
                    rows.append(
                        (
                            i,
                            img.width,
                            img.height,
                            len(img.getbands()),
                            round(sum(means) / (len(means) * 255.0), 6),
                        )
                    )
            elif use == "ppm":
                rows = []
                for i, b in zip(pdf[id_col], pdf[bin_col]):
                    w, h, ch, pix = _ppm_parse(bytes(b))
                    rows.append(
                        (
                            i,
                            w,
                            h,
                            ch,
                            round(sum(pix) / (len(pix) * 255.0), 6)
                            if pix
                            else 0.0,
                        )
                    )
            else:
                rows = [
                    (i, *_fake_image_header(bytes(b)))
                    for i, b in zip(pdf[id_col], pdf[bin_col])
                ]
            yield pd.DataFrame(
                rows, columns=[c.name for c in IMAGE_DECODE_SCHEMA]
            )

    return df.select(id_col, bin_col).mapInPandas(kernel, IMAGE_DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("frame_bytes", T.IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "content",
    frame_size: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Frame sampling: one input row → many frame rows (every
    ``stride``-th fixed-size chunk). A real implementation seeks
    keyframes via a codec; the chunking stand-in preserves the exact
    generator fan-out shape (Python-side explode, streamed per batch).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                buf = bytes(b)
                nframes = (len(buf) + frame_size - 1) // frame_size
                for k in range(0, nframes, stride):
                    chunk = buf[k * frame_size : (k + 1) * frame_size]
                    out.append(
                        (
                            i,
                            k,
                            hashlib.md5(chunk).hexdigest(),
                            len(chunk),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[c.name for c in FRAME_SCHEMA]
            )

    return df.select(id_col, bin_col).mapInPandas(kernel, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms_like", T.DoubleType()),
        T.StructField("zero_byte_ratio", T.DoubleType()),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """Audio feature extraction stub: byte-level stand-ins for RMS /
    silence ratio, numpy-vectorized per Arrow batch (the real kernel
    would decode PCM and compute the same shape of per-row scalars)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                a = np.frombuffer(bytes(b), dtype=np.uint8)
                n = int(a.size)
                rms = float(
                    round(np.sqrt((a.astype(np.float64) ** 2).mean()), 6)
                ) if n else 0.0
                zeros = float(round((a == 0).mean(), 6)) if n else 0.0
                rows.append((i, n, rms, zeros))
            yield pd.DataFrame(
                rows, columns=[c.name for c in AUDIO_FEATURE_SCHEMA]
            )

    return df.select(id_col, bin_col).mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    bin_col: str = "content",
    codec: str = "auto",
) -> DataFrame:
    """Image resize → (id, target dims, resized bytes, digest, size).

    Real-decoder seam as in decode_images: codec='auto' upgrades to
    PIL decode → LANCZOS resample → PNG re-encode when the library is
    importable; the fallback stand-in emits a deterministic
    ``target_w*target_h``-byte buffer derived by cycling
    md5(buf || dims) — a pure function of the input, so schema, batch
    shape, output cardinality (1:1), and byte-budget behavior are all
    exercised for real. Binary out-columns stay opaque to Spark exactly
    like production re-encoded JPEGs would. The oracle-paired stub
    query pins codec='fake'; PIL-gated integration test:
    tests/test_formats.py::TestRealCodecs.
    """
    use = _resolve_codec(codec)
    n_out = target_w * target_h

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use == "pil":  # pragma: no cover - PIL absent in this env
            import io as _io

            try:
                import PIL.Image
            except ImportError as e:
                raise RuntimeError(
                    "codec resolved to 'pil' on the driver but PIL is "
                    "not importable on this executor — install Pillow "
                    "in the executor image or pass codec='fake'"
                ) from e

        for pdf in batches:
            if use == "pil":  # pragma: no cover - PIL absent here
                rows = []
                for i, b in zip(pdf[id_col], pdf[bin_col]):
                    img = PIL.Image.open(_io.BytesIO(bytes(b)))
                    small = img.resize(
                        (target_w, target_h), PIL.Image.LANCZOS
                    )
                    # PNG can't encode CMYK/F/YCbCr & friends; one such
                    # row would raise OSError and kill the whole task.
                    # Mirror decode_images' convert-for-stats guard.
                    if small.mode not in (
                        "1", "L", "LA", "I", "P", "RGB", "RGBA",
                    ):
                        small = small.convert("RGB")
                    out_buf = _io.BytesIO()
                    small.save(out_buf, format="PNG")
                    buf = out_buf.getvalue()
                    rows.append(
                        (
                            i,
                            target_w,
                            target_h,
                            buf,
                            hashlib.md5(
                                buf.hex().upper().encode()
                            ).hexdigest(),
                            len(buf),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[c.name for c in RESIZE_SCHEMA]
                )
                continue
            if use == "ppm":
                rows = []
                for i, b in zip(pdf[id_col], pdf[bin_col]):
                    w, h, ch, pix = _ppm_parse(bytes(b))
                    small = _ppm_resize_nn(
                        w, h, ch, pix, target_w, target_h
                    )
                    buf = _ppm_encode(target_w, target_h, ch, small)
                    rows.append(
                        (
                            i,
                            target_w,
                            target_h,
                            buf,
                            hashlib.md5(
                                buf.hex().upper().encode()
                            ).hexdigest(),
                            len(buf),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=[c.name for c in RESIZE_SCHEMA]
                )
                continue
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                # hex-string hashing (not raw-byte) so a SQL oracle with
                # a VARCHAR-only md5 reproduces every byte (same
                # convention as _fake_image_header)
                tagged = bytes(b) + f"|{target_w}x{target_h}".encode()
                seed = bytes.fromhex(
                    hashlib.md5(tagged.hex().upper().encode()).hexdigest()
                )
                buf = (seed * (n_out // len(seed) + 1))[:n_out]
                rows.append(
                    (
                        i,
                        target_w,
                        target_h,
                        buf,
                        hashlib.md5(buf.hex().upper().encode()).hexdigest(),
                        len(buf),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[c.name for c in RESIZE_SCHEMA]
            )

    return df.select(id_col, bin_col).mapInPandas(kernel, RESIZE_SCHEMA)


ARROW_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("starts_the", T.BooleanType()),
    ]
)


def arrow_byte_stats(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "content"
) -> DataFrame:
    """``mapInArrow`` exhibit: per-row byte stats computed directly on
    pyarrow RecordBatches — no pandas materialization at all, the
    lowest-overhead Python eval shape Spark offers. Right when the
    kernel is pure Arrow compute (here: binary lengths and first-byte
    extraction via zero-copy buffers); pandas adds nothing but copies.
    """
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            bins = batch.column(1)
            n_bytes = pa.compute.binary_length(bins).cast(pa.int32())
            starts = pa.compute.starts_with(bins, pattern=b"the")
            yield pa.RecordBatch.from_arrays(
                [ids, n_bytes, starts],
                names=["doc_id", "n_bytes", "starts_the"],
            )

    return df.select(id_col, bin_col).mapInArrow(kernel, ARROW_META_SCHEMA)
