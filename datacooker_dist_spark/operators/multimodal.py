"""Multimodal column operators (build plan M4).

Images/audio/video travel as opaque ``binary`` columns with a typed metadata
struct beside them. The Spark-side plumbing — schema, batch shape,
``mapInPandas`` signatures, partition sizing — is real and tested, and so
is header-level decoding: images parse PNG/GIF/BMP/JPEG dimensions
dependency-free (PIL takes over when installed), audio parses RIFF/WAVE
(soundfile takes over), video parses RIFF/AVI (PyAV takes over). Full
sample/frame decode of other container formats needs those optional
extras — absent them, ``decode_media``/``decode_av_meta`` raise a clear
NotImplementedError; a deterministic fake decoder remains for the
plumbing-only oracles.

Vector-typed columns (``array<float>`` embeddings) are first-class here too:
norms, per-label centroids — JVM-side via transform/aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("meta_source", StringType()),
        StructField("meta_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def to_media_table(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Adapt the documents table into the engine's media-column layout:
    payload = UTF-8 bytes of the text standing in for real media bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.col("source").alias("meta_source"),
        F.octet_length("text").cast("long").alias("meta_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: derive a (width, height)
    from the payload length. Replace with PIL/ffmpeg in a real deployment."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def _parse_image_dims(payload: bytes) -> tuple[int, int] | None:
    """Pure-Python image dimension parse from format headers — PNG, GIF,
    BMP, JPEG. No imaging library needed: dimension extraction (the only
    feature the suite's schema carries) reads fixed header offsets /
    JPEG SOF segments. Returns None for unrecognized payloads."""
    p = payload
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n":
        return (
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
        )
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
        )
    if len(p) >= 26 and p[:2] == b"BM":
        return (
            int.from_bytes(p[18:22], "little", signed=True),
            abs(int.from_bytes(p[22:26], "little", signed=True)),
        )
    if len(p) >= 4 and p[:2] == b"\xff\xd8":  # JPEG: walk to an SOF marker
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if marker == 0xFF:  # spec-legal fill byte between segments
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    int.from_bytes(p[i + 7 : i + 9], "big"),
                    int.from_bytes(p[i + 5 : i + 7], "big"),
                )
            i += 2 + seg_len
    return None


def _parse_wav_meta(payload: bytes) -> dict | None:
    """Pure-Python RIFF/WAVE header parse — the audio twin of
    :func:`_parse_image_dims` (VERDICT r03 task 6). Walks the chunk list
    (word-aligned, per the RIFF spec): ``fmt `` yields channels / sample
    rate / bits per sample, ``data`` yields the payload byte count, and
    n_samples = data_bytes / (channels · bits/8). Returns None for
    non-RIFF/WAVE payloads."""
    p = payload
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i = 12
    channels = sample_rate = bits = None
    data_bytes = None
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = int.from_bytes(p[i + 4:i + 8], "little")
        body = p[i + 8:i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data_bytes = size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if not (channels and sample_rate and bits):
        return None
    n_samples = (
        data_bytes // (channels * (bits // 8))
        if data_bytes is not None and bits >= 8
        else None
    )
    return {
        "kind": "audio",
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": (
            n_samples * 1000 // sample_rate if n_samples is not None else None
        ),
    }


def _parse_avi_meta(payload: bytes) -> dict | None:
    """Pure-Python RIFF/AVI header parse — video metadata without ffmpeg:
    locates the ``avih`` (main AVI header) chunk and reads the fixed
    little-endian fields — dwMicroSecPerFrame (+0), dwTotalFrames (+16),
    dwWidth (+32), dwHeight (+36). Returns None for non-AVI payloads."""
    p = payload
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    j = p.find(b"avih")
    if j < 0 or j + 8 + 40 > len(p):
        return None
    d = p[j + 8:]
    us_per_frame = int.from_bytes(d[0:4], "little")
    n_frames = int.from_bytes(d[16:20], "little")
    width = int.from_bytes(d[32:36], "little")
    height = int.from_bytes(d[36:40], "little")
    return {
        "kind": "video",
        "us_per_frame": us_per_frame,
        "n_frames": n_frames,
        "width": width,
        "height": height,
        "duration_ms": (
            n_frames * us_per_frame // 1000 if us_per_frame else None
        ),
    }


def decode_av_meta(payload: bytes, media_type: str) -> dict:
    """Decode audio/video metadata with the same optional-extra pattern as
    the image path (PIL): a real decode library takes over when it is
    importable, else the dependency-free RIFF header parsers run, else a
    clear NotImplementedError. Documented extras — ``soundfile`` (or
    ``librosa``) for audio beyond WAV, ``av`` (PyAV/ffmpeg) for video
    beyond AVI; none are in this container, so the container exercises
    the genuine header-parse path, and a cluster with the libs installed
    gets full decodes without code changes (VERDICT r03 task 6)."""
    if media_type.startswith("audio"):
        try:
            import io

            import soundfile  # optional extra (libsndfile)

            with soundfile.SoundFile(io.BytesIO(payload)) as f:
                return {
                    "kind": "audio",
                    "sample_rate": f.samplerate,
                    "channels": f.channels,
                    "bits": None,
                    "n_samples": len(f),
                    "duration_ms": len(f) * 1000 // f.samplerate,
                }
        except ImportError:
            pass
        except Exception:
            pass  # soundfile present but can't parse → header fallback
        meta = _parse_wav_meta(payload)
        if meta is not None:
            return meta
    elif media_type.startswith("video"):
        try:
            import io

            import av  # optional extra (PyAV/ffmpeg)

            with av.open(io.BytesIO(payload)) as c:
                s = c.streams.video[0]
                return {
                    "kind": "video",
                    "us_per_frame": (
                        int(1_000_000 / s.average_rate) if s.average_rate else None
                    ),
                    "n_frames": s.frames or None,
                    "width": s.codec_context.width,
                    "height": s.codec_context.height,
                    "duration_ms": (
                        int(c.duration / 1000) if c.duration else None
                    ),
                }
        except ImportError:
            pass
        except Exception:
            pass  # PyAV present but can't parse → header fallback
        meta = _parse_avi_meta(payload)
        if meta is not None:
            return meta
    raise NotImplementedError(
        f"cannot decode media_type={media_type!r}: payload is not a "
        "recognized RIFF/WAVE or RIFF/AVI header and no decode library "
        "(soundfile for audio, av for video) is installed"
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False):
    """Decode one media payload to (width, height).

    Real path (``fake=False``, VERDICT r02 task 7): Pillow when it is
    installed (optional extra — any format PIL reads, full decode), else
    a dependency-free header parse for PNG/GIF/BMP/JPEG dimensions. A
    cluster with the imaging libs gets real decodes without code changes;
    this container (no PIL) still really parses image headers.
    Unrecognized formats / non-image media raise NotImplementedError.
    ``fake=True`` keeps the deterministic length-derived stub the suite
    oracles replay.
    """
    if fake:
        return _fake_decode(payload)
    try:
        import io

        from PIL import Image  # optional extra

        with Image.open(io.BytesIO(payload)) as im:
            return im.size
    except ImportError:
        pass
    except Exception:
        # PIL present but the payload isn't a fully-valid image it can
        # parse (truncated body, header-only synthetic fixtures): fall
        # through to the header parser rather than crash the task — the
        # contract is dimensions-or-NotImplementedError, not PIL's
        # exception zoo.
        pass
    dims = _parse_image_dims(payload)
    if dims is not None:
        return dims
    avi = _parse_avi_meta(payload)  # AVI headers carry real frame dims too
    if avi is not None:
        return avi["width"], avi["height"]
    raise NotImplementedError(
        f"cannot decode media_type={media_type!r}: payload is not a "
        "recognized PNG/GIF/BMP/JPEG/AVI header and no imaging library "
        "(pillow) is installed; pass fake=True for the deterministic "
        "stub, or use decode_av_meta for audio/video metadata"
    )


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over media payloads via mapInPandas.

    Batches stream through Python as Arrow record batches (no per-row
    serialization); output is a narrow typed feature table. On a cluster the
    input should be repartitioned so each task holds O(100 MB) of payloads —
    callers control that; this function is partition-preserving.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = [
                decode_media(p, t, fake=fake_decode)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "checksum": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


AV_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("kind", StringType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("us_per_frame", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def extract_av_features(media: DataFrame) -> DataFrame:
    """Audio/video metadata extraction over binary payloads via
    mapInPandas (Arrow batches — the same plumbing contract as
    :func:`extract_features`): each payload decodes through
    :func:`decode_av_meta` (optional soundfile/PyAV extras, dependency-
    free RIFF/WAVE + RIFF/AVI header parse otherwise) into one typed row
    — nulls where a field doesn't apply to the modality. All fields are
    integers (duration in exact floor-divided ms), so results are
    engine-stable and SQL-oracle-checkable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode_av_meta(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "kind": [m.get("kind") for m in metas],
                    "sample_rate": [m.get("sample_rate") for m in metas],
                    "channels": [m.get("channels") for m in metas],
                    "n_samples": [m.get("n_samples") for m in metas],
                    "width": [m.get("width") for m in metas],
                    "height": [m.get("height") for m in metas],
                    "n_frames": [m.get("n_frames") for m in metas],
                    "us_per_frame": [m.get("us_per_frame") for m in metas],
                    "duration_ms": [m.get("duration_ms") for m in metas],
                }
            )

    return media.mapInPandas(run, schema=AV_FEATURE_SCHEMA)


def decode_wav_samples(payload: bytes) -> list[int]:
    """Decode the PCM SAMPLES of a RIFF/WAVE payload — real waveform
    content, not just header metadata (VERDICT r04 task 5 closed the
    sample-decode gap). ``soundfile`` (libsndfile) takes over when
    importable — any WAV subtype, read onto the int16 grid; otherwise
    the dependency-free parser walks the RIFF chunks, reads the fmt
    header and decodes the data chunk directly for 16-bit integer PCM.
    Either path yields the same interleaved int16 sequence: exact
    integer arithmetic end-to-end, no float resampling, so decoded
    samples are bit-identical across engines and SQL-oracle-checkable
    (`multimodal_wav_samples` plants arithmetic waveforms and its
    DuckDB oracle regenerates them). Raises NotImplementedError for
    compressed / non-16-bit payloads when soundfile is absent."""
    try:
        import io

        import numpy as np
        import soundfile  # optional extra (libsndfile)

        data, _sr = soundfile.read(
            io.BytesIO(payload), dtype="int16", always_2d=False
        )
        return [int(x) for x in np.asarray(data).reshape(-1)]
    except ImportError:
        pass
    except Exception:
        pass  # soundfile present but can't parse → fallback below
    p = payload
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise NotImplementedError(
            "cannot decode samples: payload is not a RIFF/WAVE stream"
        )
    fmt = data = None
    off = 12
    while off + 8 <= len(p):
        cid = p[off:off + 4]
        sz = int.from_bytes(p[off + 4:off + 8], "little")
        if off + 8 + sz > len(p):
            # A declared chunk size past the payload end means the
            # stream is truncated or the header lies. If the ESSENTIAL
            # chunks are already fully parsed, a cut-off trailing
            # metadata chunk (LIST/INFO — the common truncation point
            # for re-uploaded files) must not fail the decode; but a
            # truncated fmt/data would silently yield FEWER samples and
            # a plausible-but-wrong waveform (ADVICE r05) — loud error.
            if fmt is not None and data is not None and cid not in (
                b"fmt ", b"data"
            ):
                break
            raise NotImplementedError(
                f"cannot decode samples: RIFF chunk {cid!r} declares "
                f"{sz} bytes but only {len(p) - off - 8} remain "
                "(truncated/corrupt payload)"
            )
        body = p[off + 8:off + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        off += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError(
            "cannot decode samples: RIFF/WAVE payload lacks fmt/data chunks"
        )
    audio_format = int.from_bytes(fmt[0:2], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"dependency-free WAV decoder handles 16-bit integer PCM only "
            f"(format={audio_format}, bits={bits}); install the soundfile "
            "extra for other subtypes"
        )
    block_align = int.from_bytes(fmt[12:14], "little")
    if block_align and len(data) % block_align:
        raise NotImplementedError(
            f"cannot decode samples: data chunk length {len(data)} is not "
            f"a multiple of block align {block_align} (truncated frames)"
        )
    return [
        int.from_bytes(data[i:i + 2], "little", signed=True)
        for i in range(0, len(data) - 1, 2)
    ]


WAV_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("samples", ArrayType(LongType())),
    ]
)


def extract_wav_samples(media: DataFrame) -> DataFrame:
    """Waveform extraction over binary payloads via mapInPandas (Arrow
    batches, the :func:`extract_features` plumbing contract): each
    RIFF/WAVE payload decodes through :func:`decode_wav_samples` into
    its interleaved int16 sample array. Output: (media_id,
    samples: array<long>) — downstream feature passes (energy, zero
    crossings, clipping, silence trim) are then pure column algebra
    over the array, JVM-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "samples": [
                        decode_wav_samples(p) for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=WAV_SAMPLE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_media(
    media: DataFrame, width: int = 224, height: int = 224, fake_decode: bool = True
) -> DataFrame:
    """Resize pipeline plumbing via mapInPandas: decode (stub) → resize
    (stub: deterministic payload truncation proportional to the pixel-count
    ratio) → re-encode. The batch shape, Arrow transfer, and output schema
    are the real contract; swap the stub body for PIL in deployment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                w0, h0 = decode_media(p, mt, fake=fake_decode)
                ratio = min(1.0, (width * height) / (w0 * h0))
                out_payload.append(p[: max(1, int(len(p) * ratio))])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing demo: explode each payload into fixed-stride
    samples (stand-in for video frame extraction). JVM-side byte slicing."""
    idx = F.sequence(
        F.lit(1), F.greatest(F.octet_length("payload"), F.lit(1)), F.lit(every_n_bytes)
    )
    return media.select(
        "media_id",
        F.posexplode(
            F.transform(idx, lambda i: F.substring(F.col("payload").cast("string"), i, 8))
        ).alias("frame_no", "frame"),
    )


def vector_norms(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2 norm per vector, JVM-side, computed in double."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select("vec_id", "label", norm.alias("l2_norm"))


def label_centroids(emb: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid vectors: posexplode → per-(label, dim) mean →
    re-assemble ordered arrays. Two shuffles, both on small keys; at scale
    the per-dimension partial aggregation keeps traffic at labels×dim rows."""
    exploded = emb.select(
        "label", F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("dim", "x")
    )
    per_dim = exploded.groupBy("label", "dim").agg(F.avg("x").alias("mean_x"))
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_x"))
            ).alias("_s")
        )
        .select(
            "label", F.transform("_s", lambda s: s["mean_x"]).alias("centroid")
        )
    )


# --------------------------------------------------------------------------
# Perceptual-hash image dedup (round 7)
# --------------------------------------------------------------------------


def decode_gray_pixels(payload: bytes):
    """Grayscale pixel decode with the :func:`decode_media` layering:
    Pillow first when installed (any format it reads — decoded to L
    mode, the optional-extra path), else the dependency-free
    :func:`decode_bmp_gray` BMP parser; payloads neither can handle
    raise the loud NotImplementedError contract. Returns (h, w) uint8.
    PIL's L conversion uses the ITU-R 601 luma weights, not the BMP
    parser's exact integer mean — cluster deployments get real decodes
    of real formats, while the SQL-replayable fixtures stay on the
    integer-exact parser (this container has no PIL, so the oracled
    suite path is pinned to it either way)."""
    try:
        import io

        import numpy as _np
        from PIL import Image  # optional extra

        with Image.open(io.BytesIO(payload)) as im:
            return _np.asarray(im.convert("L"), dtype=_np.uint8)
    except ImportError:
        pass
    except Exception:
        # PIL present but can't parse this payload (see decode_media's
        # rationale): fall through to the header-exact BMP parser.
        pass
    return decode_bmp_gray(payload)


def decode_bmp_gray(payload: bytes):
    """Dependency-free pixel decode of an UNCOMPRESSED 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB, the format every imaging stack can
    write): parses the pixel-array offset / dims from the header and
    unpacks the bottom-up, 4-byte-row-padded BGR grid to a (h, w)
    uint8 GRAYSCALE array (integer mean (r+g+b)//3 — exact,
    SQL-replayable). Non-BMP or compressed payloads raise the loud
    NotImplementedError the media decoders standardize on
    (:func:`decode_gray_pixels` layers the PIL any-format path on
    top). Top-down BMPs (negative height) are normalized."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError(
            "pixel decode requires an uncompressed 24-bit BMP payload "
            "(or install pillow for general formats)"
        )
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr = struct.unpack_from("<I", payload, 14)[0]
    if hdr < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"unsupported BMP (planes={planes}, bpp={bpp}, comp={comp})"
        )
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise NotImplementedError(
            f"truncated BMP: need {need} bytes, have {len(payload)}"
        )
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    gray = rows.astype(np.int64).sum(axis=2) // 3
    return gray.astype(np.uint8)


def dhash_from_gray(gray, hash_size: int = 8) -> tuple[int, int]:
    """dHash (difference hash — the standard perceptual image
    fingerprint, cf. the pHash family / Krawetz's writeups): integer
    average-pool the grayscale to a (hash_size × hash_size+1) grid
    (floor mean — exact, so the hash is replayable in ANSI SQL), then
    bit (gx, gy) = [grid(gy, gx) > grid(gy, gx+1)] — horizontal
    gradient signs. Uniform brightness shifts cancel in the
    comparison, the property that makes dHash a near-dup detector
    rather than a checksum. Returns the 64 bits as TWO 32-bit ints
    (rows 0..3 → hi, rows 4..7 → lo; bit gy*hash_size+gx within its
    half) so both engines stay in exact BIGINT range — no sign-bit
    overflow games. Requires integer pooling ratios (w % (hash_size+1)
    == 0, h % hash_size == 0); general ratios need an interpolating
    resize (PIL), raised loudly."""
    h, w = gray.shape
    gw, gh = hash_size + 1, hash_size
    if w % gw or h % gh:
        raise NotImplementedError(
            f"dhash needs integer pooling: image {w}x{h} vs grid {gw}x{gh}"
        )
    bw, bh = w // gw, h // gh
    g = gray.astype(np.int64).reshape(gh, bh, gw, bw).sum(axis=(1, 3))
    g //= bw * bh
    bits = (g[:, :-1] > g[:, 1:]).astype(np.int64)  # (gh, hash_size)
    half = gh // 2
    hi = lo = 0
    for gy in range(gh):
        for gx in range(hash_size):
            if bits[gy, gx]:
                pos = gy * hash_size + gx
                if gy < half:
                    hi |= 1 << pos
                else:
                    lo |= 1 << (pos - half * hash_size)
    return hi, lo


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash_hi", LongType()),
        StructField("dhash_lo", LongType()),
    ]
)


def dhash_images(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Per-image dHash over binary payloads via mapInPandas (the
    :func:`extract_features` plumbing contract): decode pixels
    (:func:`decode_gray_pixels` — PIL takes over any format when
    installed, else the exact BMP parser), pool, hash —
    numpy-vectorized per image inside Arrow batches, no Python past
    the decode. Output: (media_id, dhash_hi, dhash_lo) — 8 bytes per
    image, the persistable artifact a 100 TB image-dedup pass
    shuffles INSTEAD of pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            his, los = [], []
            for p in pdf["payload"]:
                hi, lo = dhash_from_gray(decode_gray_pixels(p), hash_size)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash_hi": his,
                    "dhash_lo": los,
                }
            )

    return media.mapInPandas(run, schema=DHASH_SCHEMA)


def phash_candidate_pairs(
    hashes: DataFrame,
    n_chunks: int = 8,
    id_col: str = "media_id",
    base: DataFrame | None = None,
) -> DataFrame:
    """The pigeonhole chunk-join CANDIDATE set with exact Hamming
    attached, UNFILTERED — :func:`phash_dedup_pairs` applies the
    threshold; ``dedup_blocking_report`` grades this raw blocking
    output (candidate count / recall / precision) against ground
    truth. Output: (id_a < id_b, hamming), distinct pairs.

    With ``base`` given the join is ASYMMETRIC (the streaming-ingest
    path): ``hashes`` is the probe side, ``base`` the standing index,
    output (id_a = probe id, id_b = base id) over DISJOINT id sets —
    completeness holds by the same pigeonhole argument, and the
    standing side is untouched (no index growth per batch)."""
    bits_per = 64 // n_chunks
    half_chunks = n_chunks // 2
    mask = (1 << bits_per) - 1

    def chunk(c):
        src = F.col("dhash_hi") if c < half_chunks else F.col("dhash_lo")
        off = c if c < half_chunks else c - half_chunks
        return F.shiftright(src, off * bits_per).bitwiseAND(F.lit(mask))

    chunks = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("_ck"), chunk(c).alias("_cv")
            )
            for c in range(n_chunks)
        ])
    )
    def tags(df):
        return df.select(
            F.col(id_col), "dhash_hi", "dhash_lo", chunks.alias("_c")
        ).select(
            id_col, "dhash_hi", "dhash_lo",
            F.col("_c._ck").alias("_ck"), F.col("_c._cv").alias("_cv"),
        )

    a = tags(hashes).select(
        F.col(id_col).alias("_ida"),
        F.col("dhash_hi").alias("_ha"),
        F.col("dhash_lo").alias("_la"),
        "_ck", "_cv",
    )
    b = tags(base if base is not None else hashes).select(
        F.col(id_col).alias("_idb"),
        F.col("dhash_hi").alias("_hb"),
        F.col("dhash_lo").alias("_lb"),
        "_ck", "_cv",
    )
    joined = a.join(b, ["_ck", "_cv"])
    if base is None:
        joined = joined.filter(F.col("_ida") < F.col("_idb"))
    return (
        joined
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            (
                F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
                + F.bit_count(F.col("_la").bitwiseXOR(F.col("_lb")))
            ).cast("long").alias("hamming"),
        )
        .distinct()
    )


def phash_dedup_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    n_chunks: int = 8,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance
    (VERDICT r06 task 5) — the simhash pigeonhole plan over the dHash
    table: the 64 bits split into ``n_chunks`` equal chunks; two
    hashes within ``max_hamming`` bits MUST agree on ≥ 1 chunk
    whenever ``max_hamming < n_chunks`` (pigeonhole — chunk blocking
    is PROVABLY complete, not corpus-lucky), so candidates come from
    ``n_chunks`` equi-joins on (chunk_id, chunk_value) — never an
    all-pairs join (:func:`phash_candidate_pairs`) — and verify by
    exact popcount(xor). Shuffle is n_chunks × 16-byte rows per image;
    bucket skew is bounded by 16-bit chunk cardinality (salt the join
    at extreme corpus sizes).
    Output: (id_a, id_b, hamming ≤ max_hamming), id_a < id_b."""
    if max_hamming >= n_chunks:
        raise ValueError(
            f"pigeonhole completeness needs max_hamming < n_chunks "
            f"({max_hamming} >= {n_chunks})"
        )
    return phash_candidate_pairs(hashes, n_chunks, id_col).filter(
        F.col("hamming") <= max_hamming
    )
