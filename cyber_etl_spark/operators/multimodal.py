"""Multimodal (image/audio/video) column operators.

Media lives in DataFrames as opaque ``binary`` content columns plus typed
metadata structs — the lakehouse pattern for 100 TB multimodal corpora:
parquet stores the bytes inline (small assets) or an object-store URI
(large assets); Spark only ever moves bytes between Arrow batches, never
decodes on the driver.

All compute-heavy steps are ``mapInPandas`` / pandas UDFs so bytes cross
the JVM↔Python boundary in Arrow record batches.  The actual codecs
(PIL/torchaudio/ffmpeg) are NOT in this container, so the decode kernels
are gated behind import-tries with a deterministic fake-codec fallback —
the Spark-side plumbing (schemas, batch iteration, flat-map fan-out,
partitioning) is real and tested; swapping in a real codec changes one
inner function.

Fake codec wire format (deterministic, self-describing):
  image: b"FAKEIMG|<width>|<height>|<mode>|" + payload
  video: b"FAKEVID|<n_frames>|<fps>|" + frame payloads (fixed 16B/frame)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

try:  # pragma: no cover - not present in this container
    import torchaudio  # noqa: F401

    _HAS_TORCHAUDIO = True
except ImportError:
    _HAS_TORCHAUDIO = False

try:  # pragma: no cover - not present in this container
    import av  # noqa: F401  (PyAV — the ffmpeg binding)

    _HAS_AV = True
except ImportError:
    _HAS_AV = False


IMAGE_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def encode_fake_image(width: int, height: int, mode: str = "RGB") -> bytes:
    payload = hashlib.sha256(f"{width}x{height}:{mode}".encode()).digest()
    return f"FAKEIMG|{width}|{height}|{mode}|".encode() + payload


def encode_fake_video(n_frames: int, fps: int = 24) -> bytes:
    frames = b"".join(
        hashlib.sha256(f"frame{i}".encode()).digest()[:16] for i in range(n_frames)
    )
    return f"FAKEVID|{n_frames}|{fps}|".encode() + frames


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → (PIL-style mode, channels); 8-bit depths
_PNG_MODES = {0: ("L", 1), 2: ("RGB", 3), 3: ("P", 1), 4: ("LA", 2), 6: ("RGBA", 4)}


def _parse_image_header(b: bytes) -> tuple[int, int, str] | None:
    """Stdlib container-header parse for the three ubiquitous formats →
    (width, height, mode), or None if the signature is unrecognized.

    A REAL in-container image branch (like the WAV path in
    :func:`_decode_audio_bytes`): dimensions/mode need only the container
    header, no pixel codec.  PNG: IHDR fields at fixed offsets.  JPEG:
    walk the marker segments to the first SOF frame header.  GIF: logical
    screen descriptor.  Mode strings follow PIL naming so the PIL branch
    below is drop-in compatible."""
    import struct

    if b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        if len(b) < 26:
            return None  # truncated IHDR
        w, h = struct.unpack(">II", b[16:24])
        color_type = b[25]
        return w, h, _PNG_MODES.get(color_type, (f"ct{color_type}", 0))[0]
    if b[:2] == b"\xff\xd8":  # JPEG SOI; scan segments for SOFn
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None  # corrupt marker stream
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1  # spec-legal 0xFF fill byte before a marker
                continue
            if marker == 0xD9:
                return None  # EOI before any SOF — no dimensions
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 10 > len(b):
                    return None  # truncated SOF header
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                ncomp = b[i + 9]
                return w, h, {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, f"c{ncomp}")
            i += 2 + seg_len
        return None
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            return None  # truncated logical screen descriptor
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, "P"
    return None


def _decode_image_bytes(b: bytes) -> tuple[int, int, str]:
    """Decode image header → (width, height, mode).

    FAKEIMG payloads always take the deterministic header parse (tests and
    the container, which ships no codecs).  Genuine PNG/JPEG/GIF bytes
    parse with the stdlib header walk (:func:`_parse_image_header`).
    Anything else goes through PIL when it is importable — the same
    load-once gate pattern as the spaCy branch in functions/ner.py — and
    raises if no codec can handle it."""
    if b.startswith(b"FAKEIMG|"):
        head = b.split(b"|", 4)
        return int(head[1]), int(head[2]), head[3].decode()
    parsed = _parse_image_header(b)
    if parsed is not None:
        return parsed
    if _HAS_PIL:  # pragma: no cover - PIL absent in this container
        import io

        with Image.open(io.BytesIO(b)) as im:
            return im.width, im.height, im.mode
    raise ValueError("unrecognized image container and no image codec available")


def decode_images(df: DataFrame, content_col: str = "content") -> DataFrame:
    """content → content + image_meta struct, via mapInPandas.

    Batch-shape contract: each Arrow batch is decoded in one Python call;
    per-row Python overhead is amortized across the batch.
    """
    out_schema = StructType(df.schema.fields + [StructField("image_meta", IMAGE_META_SCHEMA)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[content_col]:
                w, h, mode = _decode_image_bytes(bytes(b))
                metas.append({"width": w, "height": h, "mode": mode, "n_bytes": len(b)})
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(decode, out_schema)


def _png_decode_pixels(b: bytes) -> tuple["np.ndarray", int]:
    """Decode an 8-bit non-interlaced PNG → (H×W×C uint8 array,
    color_type).  Pure stdlib (zlib inflate + per-row filter
    reconstruction per the PNG spec: None/Sub/Up/Average/Paeth).
    Palette/16-bit/interlaced variants — and ANY malformed container
    (truncated header, corrupt deflate stream, short scanline data) —
    raise ValueError, so callers have exactly one fallback signal.

    Filter reconstruction is channel-vectorized: Sub is an exact
    per-channel cumsum (mod 256), Up a full-row vector add, and
    Average/Paeth iterate over PIXELS with all channels in numpy lanes
    (their left-neighbor recurrences are order-dependent, but W steps of
    C-lane math beats W·C interpreted steps).  This is the stdlib
    fallback codec: a production deployment decodes through the PIL
    gate; this path exists so the container is not codec-blind."""
    import struct
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    try:
        w, h = struct.unpack(">II", b[16:24])
        bit_depth, color_type, _comp, _filt, interlace = b[24:29]
    except (struct.error, ValueError):
        raise ValueError("truncated PNG header")
    if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 4, 6):
        raise ValueError(f"unsupported PNG variant (depth={bit_depth}, ct={color_type})")
    nch = _PNG_MODES[color_type][1]
    idat, i = [], 8
    while i + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat.append(b[i + 8 : i + 8 + clen])
        if ctype == b"IEND":
            break
        i += 12 + clen
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG deflate stream: {e}")
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG scanline data shorter than declared dimensions")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).copy()
        if f == 1:  # Sub: recon[x] = line[x] + recon[x-nch] — an exact
            # per-channel prefix sum modulo 256
            line = (
                line.reshape(w, nch).astype(np.uint64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            line = ((line.astype(np.int32) + prev) % 256).astype(np.uint8)
        elif f in (3, 4):  # Average / Paeth: left-neighbor recurrence —
            # iterate pixels, vectorize the channel lanes
            lp = line.reshape(w, nch).astype(np.int32)
            pv = prev.reshape(w, nch).astype(np.int32)
            out = np.zeros((w, nch), dtype=np.int32)
            left = np.zeros(nch, dtype=np.int32)
            for x in range(w):
                bb = pv[x]
                if f == 3:
                    pred = (left + bb) // 2
                else:
                    c = pv[x - 1] if x > 0 else np.zeros(nch, dtype=np.int32)
                    p = left + bb - c
                    pa, pb, pc = np.abs(p - left), np.abs(p - bb), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, bb, c)
                    )
                left = (lp[x] + pred) & 0xFF
                out[x] = left
            line = out.astype(np.uint8).reshape(stride)
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        img[r] = line
        prev = img[r]
    return img.reshape(h, w, nch), color_type


def _png_encode_pixels(img: "np.ndarray", color_type: int) -> bytes:
    """Encode an H×W×C uint8 array as a filter-0, 8-bit PNG (stdlib zlib
    deflate at fixed level 9 → byte-deterministic output)."""
    import struct
    import zlib

    h, w, nch = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _resize_png_bytes(b: bytes, width: int, height: int) -> bytes:
    """Real PNG resize: decode (stdlib inflate + unfilter),
    nearest-neighbor sample to (width, height), re-encode.  Deterministic
    — fixed sampling grid, fixed deflate level."""
    img, color_type = _png_decode_pixels(b)
    h, w, _ = img.shape
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return _png_encode_pixels(np.ascontiguousarray(img[ys][:, xs]), color_type)


def resize_images(
    df: DataFrame, width: int, height: int, content_col: str = "content"
) -> DataFrame:
    """Re-encode every image at (width, height).  Genuine 8-bit PNGs are
    REALLY resized in-container (nearest-neighbor, stdlib zlib —
    :func:`_resize_png_bytes`); FAKEIMG payloads rewrite the fake header;
    other real formats (JPEG/GIF, palette/16-bit/interlaced PNG) resize
    through PIL when importable and otherwise RAISE — genuine pixel data
    is never silently replaced with a stub payload (ADVICE r5)."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[content_col] = [
                _resize_image_bytes(bytes(b), width, height)
                for b in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(do_resize, df.schema)


def _resize_image_bytes(bb: bytes, width: int, height: int) -> bytes:
    """Single-image resize dispatch (driver-testable twin of the
    :func:`resize_images` kernel body — same gate pattern as
    :func:`_decode_image_bytes`)."""
    if bb.startswith(b"FAKEIMG|"):
        _, _, mode = _decode_image_bytes(bb)
        return encode_fake_image(width, height, mode)
    if bb[:8] == _PNG_SIG:
        try:
            return _resize_png_bytes(bb, width, height)
        except ValueError:
            pass  # palette/16-bit/interlaced → PIL gate below
    if _HAS_PIL:  # pragma: no cover - PIL absent in this container
        import io

        with Image.open(io.BytesIO(bb)) as im:
            buf = io.BytesIO()
            im.resize((width, height), Image.NEAREST).save(buf, format="PNG")
            return buf.getvalue()
    raise ValueError(
        "real image bytes in a format the in-container resizer cannot "
        "decode and PIL is unavailable — refusing to replace pixel data "
        "with a stub"
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def encode_fake_audio(n_samples: int, sample_rate: int = 16000, channels: int = 1) -> bytes:
    payload = hashlib.sha256(f"{n_samples}@{sample_rate}x{channels}".encode()).digest()
    return f"FAKEAUD|{n_samples}|{sample_rate}|{channels}|".encode() + payload


def _decode_audio_bytes(b: bytes) -> tuple[int, int, int]:
    """Decode audio header → (n_samples, sample_rate, channels).

    Same gate pattern as :func:`_decode_image_bytes`: FAKEAUD payloads
    always take the deterministic parse; genuine PCM RIFF/WAV parses with
    the stdlib ``wave`` module (a real, dependency-free codec branch —
    the only audio container parseable in this torchaudio-less
    container); anything else goes through torchaudio when importable,
    else raises."""
    if b.startswith(b"FAKEAUD|"):
        head = b.split(b"|", 4)
        return int(head[1]), int(head[2]), int(head[3])
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(b)) as w:
                return w.getnframes(), w.getframerate(), w.getnchannels()
        except wave.Error:
            # non-PCM WAV (compressed codec chunk) — fall through to the
            # heavyweight decoder gate below
            pass
    if _HAS_TORCHAUDIO:  # pragma: no cover - torchaudio absent here
        import io

        info = torchaudio.info(io.BytesIO(b))
        return int(info.num_frames), int(info.sample_rate), int(info.num_channels)
    raise ValueError("not a FAKEAUD payload and no audio codec available")


def decode_audio(df: DataFrame, content_col: str = "content") -> DataFrame:
    """content → content + audio_meta struct, via mapInPandas (same
    Arrow batch contract as :func:`decode_images`)."""
    out_schema = StructType(df.schema.fields + [StructField("audio_meta", AUDIO_META_SCHEMA)])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[content_col]:
                n, rate, ch = _decode_audio_bytes(bytes(b))
                metas.append(
                    {"n_samples": n, "sample_rate": rate, "channels": ch, "n_bytes": len(b)}
                )
            pdf = pdf.copy()
            pdf["audio_meta"] = metas
            yield pdf

    return df.mapInPandas(decode, out_schema)


def _resample_wav_bytes(b: bytes, sample_rate: int) -> bytes:
    """Real 16-bit PCM WAV resample: linear interpolation over the frame
    axis, re-encoded with the stdlib ``wave`` writer.  Deterministic
    (pure float64 arithmetic on fixed inputs), multi-channel aware."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(b)) as wv:
        nch, sw, fr, nf = (
            wv.getnchannels(),
            wv.getsampwidth(),
            wv.getframerate(),
            wv.getnframes(),
        )
        raw = wv.readframes(nf)
    if sw != 2:
        raise ValueError(f"only 16-bit PCM WAV resample supported, got width {sw}")
    x = np.frombuffer(raw, dtype="<i2").reshape(nf, nch).astype(np.float64)
    n_out = nf * sample_rate // fr
    if nf == 0 or n_out == 0:
        y = np.zeros((0, nch), dtype="<i2")
    else:
        idx = np.linspace(0.0, nf - 1, n_out)
        i0 = np.floor(idx).astype(np.int64)
        i1 = np.minimum(i0 + 1, nf - 1)
        frac = (idx - i0)[:, None]
        y = np.clip(
            np.round((1.0 - frac) * x[i0] + frac * x[i1]), -32768, 32767
        ).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(nch)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(y.tobytes())
    return buf.getvalue()


def resample_audio(
    df: DataFrame, sample_rate: int, content_col: str = "content"
) -> DataFrame:
    """Re-encode every clip at ``sample_rate`` (duration preserved: the
    sample count scales by the rate ratio, floor-rounded).  Genuine PCM
    RIFF/WAV clips are REALLY resampled in-container (linear
    interpolation, :func:`_resample_wav_bytes`); FAKEAUD payloads rewrite
    the fake header; a heavyweight codec would slot in alongside
    (``torchaudio.functional.resample``)."""

    def do_resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[content_col]:
                bb = bytes(b)
                if bb[:4] == b"RIFF" and bb[8:12] == b"WAVE":
                    import wave

                    try:
                        out.append(_resample_wav_bytes(bb, sample_rate))
                        continue
                    except (wave.Error, ValueError):
                        # non-PCM or non-16-bit container the stdlib path
                        # can't resample — same fall-through contract as
                        # _decode_audio_bytes (generic header path below)
                        pass
                n, rate, ch = _decode_audio_bytes(bb)
                out.append(encode_fake_audio(n * sample_rate // rate, sample_rate, ch))
            pdf = pdf.copy()
            pdf[content_col] = out
            yield pdf

    return df.mapInPandas(do_resample, df.schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def _decode_video_frames(b: bytes, every_n: int) -> list[tuple[int, bytes]]:
    """Decode a video payload → [(frame_index, frame_bytes)] for every
    ``every_n``-th frame.

    FAKEVID payloads take the deterministic parse (fixed 16-byte frame
    payloads).  Anything else goes through PyAV/ffmpeg when importable —
    decoded frames re-encoded as raw RGB bytes — else raises."""
    if b.startswith(b"FAKEVID|"):
        head = b.split(b"|", 3)
        n_frames = int(head[1])
        body = head[3]
        return [(i, body[i * 16 : (i + 1) * 16]) for i in range(0, n_frames, every_n)]
    if _HAS_AV:  # pragma: no cover - PyAV absent in this container
        import io

        out = []
        with av.open(io.BytesIO(b)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % every_n == 0:
                    out.append((i, frame.to_ndarray(format="rgb24").tobytes()))
        return out
    raise ValueError("not a FAKEVID payload and no video codec available")


def sample_frames(
    df: DataFrame, every_n: int = 8, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Video → one row per sampled frame (flat-map fan-out in
    mapInPandas): the shape used for frame-level training-data pipelines.
    Output partitioning follows the input — no shuffle is introduced by
    the fan-out itself."""

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[content_col]):
                for i, frame in _decode_video_frames(bytes(b), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.mapInPandas(explode_frames, FRAME_SCHEMA)


def extract_features(
    df: DataFrame, dim: int = 16, content_col: str = "content"
) -> DataFrame:
    """content → fixed-dim float feature vector (deterministic bytes-hash
    embedding standing in for a vision encoder).  Arrow-vectorized pandas
    UDF — the output column feeds directly into the ANN/dedup operators
    (operators.ann / operators.dedup)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def featurize(s: pd.Series) -> pd.Series:
        def vec(b: bytes) -> list[float]:
            h = hashlib.sha256(bytes(b)).digest()
            arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
            return (arr.astype(np.float64) / np.iinfo(np.uint32).max).astype(
                np.float32
            ).tolist()

        return s.map(vec)

    return df.withColumn("features", featurize(F.col(content_col)))


# ---- perceptual hash (pHash) image near-dup ----------------------------

def _dct_basis(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis matrix (n x n)."""
    k = np.arange(n).reshape(-1, 1)
    m = np.arange(n).reshape(1, -1)
    t = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    t[0, :] = np.sqrt(1.0 / n)
    return t


_PHASH_SIZE = 32
_PHASH_T = None  # lazy: numpy basis built once per process


def _phash64_pixels(img: "np.ndarray") -> int:
    """64-bit perceptual hash of an H×W×C uint8 array: grayscale →
    nearest-neighbor 32×32 → 2-D DCT-II → top-left 8×8 coefficient
    block → each bit = (coefficient > median of the 63 non-DC
    coefficients).  Deterministic per image (row-local numpy, no
    partition dependence); near-identical pixels → small Hamming
    distance, the property the banded join exploits."""
    global _PHASH_T
    if _PHASH_T is None:
        _PHASH_T = _dct_basis(_PHASH_SIZE)
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.minimum((np.arange(_PHASH_SIZE) * h) // _PHASH_SIZE, h - 1)
    xs = np.minimum((np.arange(_PHASH_SIZE) * w) // _PHASH_SIZE, w - 1)
    small = gray[ys][:, xs]
    d = _PHASH_T @ small @ _PHASH_T.T
    block = d[:8, :8].ravel()
    med = float(np.median(block[1:]))
    bits = block > med
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def sha256_stream(seed: bytes, n: int) -> bytes:
    """Deterministic n-byte pseudo-random stream by chained sha256 — THE
    one implementation of the idiom (pHash fake-pixels, q158's planted
    pattern corpus); review r6 flagged the hand-kept copies."""
    stream, cur, total = [], seed, 0
    while total < n:
        cur = hashlib.sha256(cur).digest()
        stream.append(cur)
        total += len(cur)
    return b"".join(stream)[:n]


def _phash_bytes(bb: bytes) -> int:
    """Dispatch: real 8-bit PNGs hash their decoded pixels; FAKEIMG
    payloads hash a deterministic sha256-expanded pseudo-pixel grid
    (identical payload bytes → identical hash, the property the tests
    pin); other formats would decode through PIL when importable."""
    if bb.startswith(b"FAKEIMG|"):
        raw = sha256_stream(bb, _PHASH_SIZE * _PHASH_SIZE)
        img = np.frombuffer(raw, dtype=np.uint8)
        return _phash64_pixels(img.reshape(_PHASH_SIZE, _PHASH_SIZE, 1))
    if bb[:8] == _PNG_SIG:
        img, _ = _png_decode_pixels(bb)
        return _phash64_pixels(img)
    if _HAS_PIL:  # pragma: no cover - PIL absent in this container
        import io

        with Image.open(io.BytesIO(bb)) as im:
            arr = np.asarray(im.convert("L"), dtype=np.uint8)
        return _phash64_pixels(arr[:, :, None])
    raise ValueError("unsupported image container for perceptual hashing")


def phash_fingerprints(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """(id, phash): 64-bit perceptual hashes via mapInPandas — bytes
    never leave the executors, one row of output per image."""
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("phash", LongType()),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "phash": [_phash_bytes(bytes(b)) for b in pdf[content_col]],
                }
            )

    return df.mapInPandas(hash_batch, out_schema)


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 7,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate IMAGE pairs at pHash Hamming distance ≤
    ``max_hamming`` — the visual twin of the SimHash text dedup, with
    the same banded pigeonhole economics: the 64 bits split into
    ``bands`` segments and candidates come from an equi-join on segment
    equality (exact for max_hamming ≤ bands-1), so shuffle cost is
    O(n·bands), never the all-pairs cross join.  Verification is a
    JVM-side ``bit_count(xor)`` on the candidate set only."""
    assert max_hamming <= bands - 1, "banding is only exact for hamming <= bands-1"
    assert 64 % bands == 0, "bands must divide 64"
    fp = phash_fingerprints(df, id_col, content_col)
    return phash_pairs_from_fingerprints(fp, max_hamming, bands)


def phash_pairs_from_fingerprints(
    fp: DataFrame, max_hamming: int = 7, bands: int = 8
) -> DataFrame:
    """Banded Hamming join over an (id, phash) table — split out so the
    sign-proof banding semantics are testable on crafted fingerprints
    and so persisted hash tables can be re-joined without re-hashing."""
    seg_bits = 64 // bands
    seg_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("seg"),
                # logical shift + MASK: phash uses all 64 bits incl. the
                # sign, and Spark's % follows the dividend sign — band 0
                # (unshifted) of a negative hash would come out negative
                # and never equi-join a positive hash's identical low
                # byte (review r6 finding); bitwiseAND is sign-proof
                (
                    F.shiftrightunsigned(F.col("phash"), i * seg_bits)
                    .bitwiseAND(2**seg_bits - 1)
                ).alias("seg_val"),
            )
            for i in range(bands)
        ]
    )
    segs = fp.select("id", "phash", F.explode(seg_structs).alias("e")).select(
        "id", "phash", F.col("e.seg").alias("seg"), F.col("e.seg_val").alias("seg_val")
    )
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


# ---- audio spectral fingerprint near-dup --------------------------------

def _wav_encode_pcm16(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV from an int-valued sample array (stdlib
    ``wave`` writer — the encode twin of :func:`_resample_wav_bytes`)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(
            np.clip(samples, -32768, 32767).astype("<i2").tobytes()
        )
    return buf.getvalue()


def audio_band_edges(nyq: int, nbands: int = 64) -> "np.ndarray":
    """Geometric band edges over rFFT bins [1, nyq) — shared by the
    fingerprint kernel and any caller that needs to PLACE energy in
    known bands (q159's planted corpus), so the two can never drift."""
    edges = np.unique(np.geomspace(1, max(nyq - 1, 2), nbands + 1).astype(np.int64))
    while len(edges) < nbands + 1:  # degenerate tiny clips: pad edges
        edges = np.append(edges, edges[-1] + 1)
    return edges


def _audio_fp64_pcm(x: "np.ndarray") -> int:
    """64-bit spectral-shape fingerprint of a mono float64 PCM stream:
    Hann-windowed full-clip rFFT magnitude → 64 geometric (log-spaced)
    frequency bands → bit m = (band energy > mean band energy).

    The mean-energy threshold (not a median or neighbor comparison)
    makes the bits robust exactly where a dedup fingerprint needs it:
    harmonic/tonal content concentrates energy in a few hot bands far
    above the mean while the rest sit far below, so low-amplitude
    additive noise (energy ~ amplitude²) cannot flip bits — identical
    clips hash identically, lightly-degraded copies land within a few
    bits, different tone mixes move the hot-band set.  Broadband noise
    clips hash deterministically but sit near the threshold in many
    bands; production near-dup matching for such content uses
    frame-level bit-error-rate search (Haitsma-Kalker), which this
    clip-level hash deliberately simplifies.  Deterministic per clip
    (row-local numpy)."""
    nbands = 64
    if len(x) < 2:
        x = np.pad(x, (0, 2 - len(x)))
    mag = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    edges = audio_band_edges(len(mag), nbands)
    e = np.array(
        [float((mag[a:b] ** 2).sum()) for a, b in zip(edges[:-1], edges[1:])]
    )
    bits = e > e.mean()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def _audio_fp_bytes(bb: bytes) -> int:
    """Dispatch: PCM WAV decodes for real (stdlib), FAKEAUD payloads
    expand to deterministic pseudo-PCM via :func:`sha256_stream`."""
    if bb.startswith(b"FAKEAUD|"):
        raw = sha256_stream(bb, 2 * 8192)
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        return _audio_fp64_pcm(x)
    if bb[:4] == b"RIFF" and bb[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(bb)) as wv:
            nch, sw, nf = wv.getnchannels(), wv.getsampwidth(), wv.getnframes()
            raw = wv.readframes(nf)
        if sw != 2:
            raise ValueError(f"only 16-bit PCM WAV fingerprint supported, got {sw}")
        x = np.frombuffer(raw, dtype="<i2").reshape(nf, nch).astype(np.float64)
        return _audio_fp64_pcm(x.mean(axis=1))
    raise ValueError("unsupported audio container for fingerprinting")


def audio_fingerprints(
    df: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """(id, afp): 64-bit spectral fingerprints via mapInPandas."""
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("afp", LongType()),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "afp": [_audio_fp_bytes(bytes(b)) for b in pdf[content_col]],
                }
            )

    return df.mapInPandas(hash_batch, out_schema)


def audio_neardup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 7,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate AUDIO pairs at fingerprint Hamming ≤ ``max_hamming``
    — same banded pigeonhole join as :func:`phash_neardup_pairs` (the
    segment machinery is fingerprint-agnostic)."""
    fp = audio_fingerprints(df, id_col, content_col).withColumnRenamed("afp", "phash")
    return phash_pairs_from_fingerprints(fp, max_hamming, bands)


# ---- video near-dup (frame-sampled pHash, majority-vote signature) ------

def _frame_phash(fb: bytes) -> int:
    """pHash of one decoded frame.  FAKEVID frames are 16-byte payloads
    (expanded to a deterministic 32×32 pseudo-pixel grid exactly like
    FAKEIMG images, via :func:`sha256_stream`); real-codec frames
    (rgb24 raw bytes, PyAV branch) hash their leading luminance-ish
    bytes when large enough, else the expanded stream — deterministic
    either way."""
    if len(fb) >= _PHASH_SIZE * _PHASH_SIZE:
        raw = np.frombuffer(
            fb[: _PHASH_SIZE * _PHASH_SIZE], dtype=np.uint8
        )
    else:
        raw = np.frombuffer(
            sha256_stream(fb, _PHASH_SIZE * _PHASH_SIZE), dtype=np.uint8
        )
    return _phash64_pixels(raw.reshape(_PHASH_SIZE, _PHASH_SIZE, 1).copy())


def video_fingerprints(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    every_n: int = 4,
) -> DataFrame:
    """(id, vfp): one 64-bit signature per video — every ``every_n``-th
    frame is decoded and pHashed, and bit k of the signature is the
    per-bit MAJORITY vote across the sampled frame hashes (ties → 1).

    Majority-vote (rather than min-hash) because consecutive video
    frames are heavily correlated: the dominant scene's hash bits win
    the vote, so re-encodes and copies with a few inserted/replaced
    frames land within a small Hamming distance while different footage
    diverges to ~32 bits — the same distance regime the banded join
    (:func:`phash_pairs_from_fingerprints`) is built for.  One
    mapInPandas pass; frame bytes never leave the executors."""
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("vfp", LongType()),
        ]
    )

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for b in pdf[content_col]:
                frames = _decode_video_frames(bytes(b), every_n)
                if not frames:
                    fps.append(0)
                    continue
                hs = np.array(
                    [_frame_phash(fb) for _, fb in frames], dtype=np.int64
                ).astype(np.uint64)
                bits = (
                    (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
                ).sum(axis=0)
                v = 0
                for k in range(63, -1, -1):
                    v = (v << 1) | int(2 * bits[k] >= len(hs))
                fps.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"id": pdf[id_col], "vfp": fps})

    return df.mapInPandas(hash_batch, out_schema)


def video_neardup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_hamming: int = 7,
    bands: int = 8,
    every_n: int = 4,
) -> DataFrame:
    """Near-duplicate VIDEO pairs at signature Hamming ≤ ``max_hamming``
    — completes the modality family (q23 text SimHash, q158 image
    pHash, q159 audio spectral): frame-sampled majority signature, then
    the shared banded pigeonhole join (O(n·bands) shuffle, exact for
    max_hamming ≤ bands-1, verified pair-stage under the q163/q164
    oracles)."""
    fp = video_fingerprints(df, id_col, content_col, every_n).withColumnRenamed(
        "vfp", "phash"
    )
    return phash_pairs_from_fingerprints(fp, max_hamming, bands)
