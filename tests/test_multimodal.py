"""Multimodal plumbing tests: schemas, batch shapes, fan-out — the parts
that must be right regardless of which codec backs the decode kernel."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media_df(spark):
    from cyber_etl_spark.operators.multimodal import encode_fake_image, encode_fake_video

    imgs = [(i, encode_fake_image(64 + i, 48 + i, "RGB")) for i in range(20)]
    vids = [(100 + i, encode_fake_video(n_frames=24, fps=24)) for i in range(3)]
    return (
        spark.createDataFrame(imgs, "media_id long, content binary"),
        spark.createDataFrame(vids, "media_id long, content binary"),
    )


def test_decode_images_meta(media_df):
    from cyber_etl_spark.operators.multimodal import decode_images

    images, _ = media_df
    out = decode_images(images)
    assert "image_meta" in out.columns
    rows = {r.media_id: r.image_meta for r in out.collect()}
    assert rows[0].width == 64 and rows[0].height == 48 and rows[0].mode == "RGB"
    assert rows[19].width == 83
    assert rows[0].n_bytes > 0


def test_resize_roundtrip(media_df):
    from cyber_etl_spark.operators.multimodal import decode_images, resize_images

    images, _ = media_df
    resized = resize_images(images, 32, 32)
    metas = [r.image_meta for r in decode_images(resized).collect()]
    assert all(m.width == 32 and m.height == 32 for m in metas)
    # schema unchanged by resize (content-in-place transform)
    assert resized.schema == images.schema


def test_decode_real_codec_branch(monkeypatch):
    """The PIL branch of _decode_image_bytes: non-FAKEIMG bytes route to
    Image.open when a codec is importable (here a monkeypatched fake),
    and FAKEIMG bytes still bypass it entirely."""
    import cyber_etl_spark.operators.multimodal as mm

    class _FakeIm:
        width, height, mode = 640, 480, "L"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImage:
        opened_with: bytes | None = None

        @classmethod
        def open(cls, fh):
            cls.opened_with = fh.read()
            return _FakeIm()

    monkeypatch.setattr(mm, "_HAS_PIL", True)
    monkeypatch.setattr(mm, "Image", _FakeImage, raising=False)
    assert mm._decode_image_bytes(b"\x89PNG\r\n_not_fake") == (640, 480, "L")
    assert _FakeImage.opened_with == b"\x89PNG\r\n_not_fake"
    # FAKEIMG payloads never touch the codec even when one is available
    _FakeImage.opened_with = None
    assert mm._decode_image_bytes(mm.encode_fake_image(8, 9, "RGB")) == (8, 9, "RGB")
    assert _FakeImage.opened_with is None
    # and with no codec at all, foreign bytes raise cleanly
    monkeypatch.setattr(mm, "_HAS_PIL", False)
    with pytest.raises(ValueError, match="no image codec"):
        mm._decode_image_bytes(b"\x89PNG\r\n_not_fake")


def test_audio_decode_resample_roundtrip(spark):
    from cyber_etl_spark.operators.multimodal import (
        decode_audio,
        encode_fake_audio,
        resample_audio,
    )

    clips = [(i, encode_fake_audio(32000 + i * 16000, 16000, 1)) for i in range(4)]
    df = spark.createDataFrame(clips, "media_id long, content binary")
    metas = {r.media_id: r.audio_meta for r in decode_audio(df).collect()}
    assert metas[0].n_samples == 32000 and metas[0].sample_rate == 16000
    assert metas[3].n_samples == 80000 and metas[0].channels == 1
    res = resample_audio(df, 8000)
    assert res.schema == df.schema
    metas = {r.media_id: r.audio_meta for r in decode_audio(res).collect()}
    # duration preserved: n_samples halves with the rate
    assert metas[0].n_samples == 16000 and metas[0].sample_rate == 8000


def test_audio_real_codec_branch(monkeypatch):
    """torchaudio branch of _decode_audio_bytes — same gate contract as
    the PIL branch: non-FAKEAUD bytes route to the codec when importable
    (monkeypatched fake), FAKEAUD bytes bypass it, no codec raises."""
    import cyber_etl_spark.operators.multimodal as mm
    import pytest

    class _Info:
        num_frames, sample_rate, num_channels = 44100, 44100, 2

    class _FakeTA:
        seen: bytes | None = None

        @classmethod
        def info(cls, fh):
            cls.seen = fh.read()
            return _Info()

    monkeypatch.setattr(mm, "_HAS_TORCHAUDIO", True)
    monkeypatch.setattr(mm, "torchaudio", _FakeTA, raising=False)
    assert mm._decode_audio_bytes(b"RIFF_not_fake") == (44100, 44100, 2)
    assert _FakeTA.seen == b"RIFF_not_fake"
    _FakeTA.seen = None
    assert mm._decode_audio_bytes(mm.encode_fake_audio(10, 8000, 1)) == (10, 8000, 1)
    assert _FakeTA.seen is None
    monkeypatch.setattr(mm, "_HAS_TORCHAUDIO", False)
    with pytest.raises(ValueError, match="no audio codec"):
        mm._decode_audio_bytes(b"RIFF_not_fake")


def test_video_real_codec_branch(monkeypatch):
    """PyAV/ffmpeg branch of _decode_video_frames: non-FAKEVID bytes
    route to av.open when importable (monkeypatched fake), with every_n
    sampling applied to decoded frames; FAKEVID bypasses; no codec
    raises."""
    import numpy as np
    import cyber_etl_spark.operators.multimodal as mm
    import pytest

    class _Frame:
        def __init__(self, i):
            self.i = i

        def to_ndarray(self, format):
            assert format == "rgb24"
            return np.full((1, 1, 3), self.i, dtype=np.uint8)

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video):
            assert video == 0
            return (_Frame(i) for i in range(5))

    class _FakeAV:
        @staticmethod
        def open(fh):
            return _Container()

    monkeypatch.setattr(mm, "_HAS_AV", True)
    monkeypatch.setattr(mm, "av", _FakeAV, raising=False)
    got = mm._decode_video_frames(b"\x00\x00\x01\xba_mpeg_not_fake", every_n=2)
    assert [(i, f) for i, f in got] == [
        (0, bytes([0, 0, 0])),
        (2, bytes([2, 2, 2])),
        (4, bytes([4, 4, 4])),
    ]
    # FAKEVID payloads never touch the codec even when one is available
    fake = mm.encode_fake_video(n_frames=4, fps=24)
    got = mm._decode_video_frames(fake, every_n=2)
    assert [i for i, _ in got] == [0, 2] and all(len(f) == 16 for _, f in got)
    monkeypatch.setattr(mm, "_HAS_AV", False)
    with pytest.raises(ValueError, match="no video codec"):
        mm._decode_video_frames(b"\x00\x00\x01\xba_mpeg_not_fake", every_n=1)


def test_sample_frames_fanout(media_df):
    from cyber_etl_spark.operators.multimodal import sample_frames

    _, videos = media_df
    frames = sample_frames(videos, every_n=8)
    rows = frames.collect()
    # 24 frames sampled every 8 → indices 0, 8, 16 per video
    assert len(rows) == 3 * 3
    assert sorted({r.frame_index for r in rows}) == [0, 8, 16]
    assert all(len(r.frame) == 16 for r in rows)


def test_extract_features_feeds_ann(media_df):
    from cyber_etl_spark.operators.ann import brute_force_knn
    from cyber_etl_spark.operators.multimodal import extract_features

    images, _ = media_df
    feats = extract_features(images, dim=16).select("media_id", "features")
    assert feats.schema["features"].dataType.simpleString() == "array<float>"
    # deterministic: same content → same vector across runs
    a = feats.collect()
    b = extract_features(images, dim=16).select("media_id", "features").collect()
    assert sorted(map(tuple, ((r.media_id, tuple(r.features)) for r in a))) == sorted(
        map(tuple, ((r.media_id, tuple(r.features)) for r in b))
    )
    # plumbing contract: feature column slots into the ANN operator
    knn = brute_force_knn(
        feats, feats.limit(2), k=3, id_col="media_id", vec_col="features"
    )
    assert knn.count() == 2 * 3


def test_grouped_map_trends(spark, sf_smoke):
    """applyInPandas grouped-map: per-user OLS matches a local numpy fit."""
    import numpy as np

    from cyber_etl_spark.operators.grouped import fit_user_trends
    from cyber_etl_spark.sources import read_table

    events = read_table(spark, sf_smoke, "events")
    got = {r.user_id: r for r in fit_user_trends(events).collect()}
    pdf = events.select("user_id", "ts", "value").toPandas()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values("ts")
        x = (g["ts"] - g["ts"].min()).dt.total_seconds().to_numpy() / 3600.0
        y = g["value"].to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert got[uid].n_events == len(g)
        assert abs(got[uid].slope - slope) < 1e-9
        assert abs(got[uid].intercept - intercept) < 1e-9


def test_udtf_split_sections(spark):
    from cyber_etl_spark.functions.udtf_ops import split_sections

    df = spark.createDataFrame(
        [(1, "intro words || body has more words || end"), (2, "single"), (3, None)],
        "doc_id long, text string",
    )
    out = split_sections(spark, df).collect()
    rows = {(r.doc_id, r.section_id): (r.section_text, r.n_tokens) for r in out}
    assert rows[(1, 0)] == ("intro words", 2)
    assert rows[(1, 1)] == ("body has more words", 4)
    assert rows[(2, 0)] == ("single", 1)
    assert len([r for r in out if r.doc_id == 3]) == 0


def test_pack_sequences(spark, sf_smoke):
    """Packing invariants: every chunk assigned once, no sequence
    overflows, greedy boundaries are tight."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.grouped import pack_sequences
    from cyber_etl_spark.plans import QUERIES

    chunks = QUERIES["q56_token_chunking"].builder(spark, sf_smoke)
    packed = pack_sequences(chunks, max_tokens=120)
    totals = packed.agg(
        F.sum("n_chunks").alias("nc"), F.sum("total_tokens").alias("tt")
    ).collect()[0]
    src = chunks.agg(
        F.count(F.lit(1)).alias("nc"), F.sum("chunk_tokens").alias("tt")
    ).collect()[0]
    assert totals.nc == src.nc and totals.tt == src.tt
    # no overflow except single chunks larger than the budget
    bad = packed.where(
        (F.col("total_tokens") > 120) & (F.col("n_chunks") > 1)
    ).count()
    assert bad == 0


def _pcm_wav_bytes(n_frames: int, rate: int, channels: int) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        # deterministic 16-bit ramp
        w.writeframes(
            b"".join(
                struct.pack("<h", (i * 37) % 32768) for i in range(n_frames * channels)
            )
        )
    return buf.getvalue()


def test_audio_stdlib_wav_branch(spark):
    """Genuine PCM RIFF/WAV decodes in-container via stdlib wave — a real
    (non-fake-codec) audio branch needing no torchaudio."""
    from cyber_etl_spark.operators.multimodal import _decode_audio_bytes, decode_audio

    wav = _pcm_wav_bytes(160, 8000, 2)
    assert _decode_audio_bytes(wav) == (160, 8000, 2)

    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(_pcm_wav_bytes(48, 16000, 1)))],
        "media_id long, content binary",
    )
    metas = {r.media_id: r.audio_meta for r in decode_audio(df).collect()}
    assert (metas[1].n_samples, metas[1].sample_rate, metas[1].channels) == (160, 8000, 2)
    assert (metas[2].n_samples, metas[2].sample_rate, metas[2].channels) == (48, 16000, 1)
    assert metas[1].n_bytes == len(wav)


def test_audio_non_pcm_wav_falls_through(monkeypatch):
    """A RIFF/WAVE container the stdlib parser rejects (compressed codec
    chunk) falls through to the heavyweight-decoder gate."""
    import pytest as _pytest

    from cyber_etl_spark.operators import multimodal as mm

    bogus = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"junkchunk"
    monkeypatch.setattr(mm, "_HAS_TORCHAUDIO", False)
    with _pytest.raises(ValueError, match="no audio codec"):
        mm._decode_audio_bytes(bogus)


def test_audio_wav_real_resample(spark):
    """PCM WAV clips are genuinely resampled (not header-rewritten):
    output is valid WAV at the new rate with rate-scaled frame count."""
    from cyber_etl_spark.operators.multimodal import decode_audio, resample_audio

    df = spark.createDataFrame(
        [(1, bytearray(_pcm_wav_bytes(160, 8000, 2)))],
        "media_id long, content binary",
    )
    res = resample_audio(df, 16000)
    metas = {r.media_id: r.audio_meta for r in decode_audio(res).collect()}
    assert (metas[1].n_samples, metas[1].sample_rate, metas[1].channels) == (
        320,
        16000,
        2,
    )
    # content is a real RIFF/WAV container, larger than the input payload
    content = bytes(res.collect()[0].content)
    assert content[:4] == b"RIFF" and content[8:12] == b"WAVE"


def test_wav_resample_preserves_constant_signal():
    """Linear interpolation of a constant signal is exact at any rate."""
    import io
    import struct
    import wave

    import numpy as np

    from cyber_etl_spark.operators.multimodal import _resample_wav_bytes

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<h", 1234) * 100)
    out = _resample_wav_bytes(buf.getvalue(), 12000)
    with wave.open(io.BytesIO(out)) as w:
        assert (w.getframerate(), w.getnframes()) == (12000, 150)
        vals = np.frombuffer(w.readframes(150), dtype="<i2")
    assert (vals == 1234).all()


def test_resample_falls_back_on_undecodable_wav(spark):
    """A RIFF/WAVE container the stdlib resampler can't process (bogus
    codec chunk) must not fail the job — decode_audio tolerates it, so
    resample_audio falls through to the generic header path (which for a
    FAKEAUD-less, codec-less blob raises in decode, hence we pair the
    bogus WAV with metadata the generic path CAN read: none here, so the
    fall-through surfaces as the documented codec error, not wave.Error)."""
    import pytest as _pytest

    from cyber_etl_spark.operators import multimodal as mm

    bogus = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"junk"
    df = spark.createDataFrame([(1, bytearray(bogus))], "media_id long, content binary")
    with _pytest.raises(Exception) as exc:
        mm.resample_audio(df, 16000).collect()
    assert "no audio codec" in str(exc.value)


# ---------------------------------------------------------------------------
# Real image containers (stdlib header parse + PNG pixel codec)
# ---------------------------------------------------------------------------


def _jpeg_header_bytes(width: int, height: int, ncomp: int = 3) -> bytes:
    """Minimal JPEG byte prefix: SOI, an APP0 segment, a DQT segment,
    then SOF0 carrying the dimensions — enough for any header scanner."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * ncomp)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + bytes([ncomp])
        + b"\x01\x11\x00" * ncomp
    )
    return b"\xff\xd8" + app0 + dqt + sof0


def test_image_header_parse_png_jpeg_gif():
    import struct

    import numpy as np

    from cyber_etl_spark.operators import multimodal as mm

    png = mm._png_encode_pixels(np.zeros((7, 5, 3), dtype=np.uint8), color_type=2)
    assert mm._decode_image_bytes(png) == (5, 7, "RGB")
    assert mm._decode_image_bytes(_jpeg_header_bytes(640, 480)) == (640, 480, "RGB")
    assert mm._decode_image_bytes(_jpeg_header_bytes(32, 16, ncomp=1)) == (32, 16, "L")
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 4
    assert mm._decode_image_bytes(gif) == (12, 34, "P")


def test_png_roundtrip_all_filters():
    """The PNG decoder reconstructs every filter type: re-encoding a
    decoded image (filter 0) must reproduce the same pixels even when
    the source used Sub/Up/Average/Paeth rows."""
    import struct
    import zlib

    import numpy as np

    from cyber_etl_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)

    # hand-encode with one of each filter per row (0..4)
    def filt(r: int, f: int) -> bytes:
        line = img[r].reshape(-1).astype(np.int32)
        prev = img[r - 1].reshape(-1).astype(np.int32) if r > 0 else np.zeros_like(line)
        nch = 3
        out = np.zeros_like(line)
        for x in range(len(line)):
            a = line[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) % 256
        return bytes([f]) + out.astype(np.uint8).tobytes()

    raw = b"".join(filt(r, r % 5) for r in range(5))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    src = (
        mm._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    decoded, ct = mm._png_decode_pixels(src)
    assert ct == 2 and np.array_equal(decoded, img)


def test_resize_images_real_png(spark):
    """Genuine PNGs are really resized (pixel-correct nearest-neighbor),
    not header-rewritten; FAKEIMG rows in the same batch still take the
    fake path."""
    import numpy as np

    from cyber_etl_spark.operators import multimodal as mm

    # 2x2 RGB with distinct corner colors
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], dtype=np.uint8
    )
    png = mm._png_encode_pixels(img, color_type=2)
    df = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(mm.encode_fake_image(9, 9, "RGB"))),
        ],
        "media_id long, content binary",
    )
    out = {r.media_id: bytes(r.content) for r in mm.resize_images(df, 4, 4).collect()}
    resized, ct = mm._png_decode_pixels(out[1])
    assert ct == 2 and resized.shape == (4, 4, 3)
    # nearest-neighbor: each source pixel becomes a 2x2 block
    for y in range(4):
        for x in range(4):
            assert np.array_equal(resized[y, x], img[y // 2, x // 2])
    metas = {
        r.media_id: r.image_meta for r in mm.decode_images(mm.resize_images(df, 4, 4)).collect()
    }
    assert (metas[1].width, metas[1].height, metas[1].mode) == (4, 4, "RGB")
    assert (metas[2].width, metas[2].height) == (4, 4)


def test_image_feature_ann_dedup_end_to_end(spark):
    """Full multimodal dedup chain: binary image column → deterministic
    feature extraction → embedding-cosine near-dup pairs.  Identical
    bytes must land in a pair at cosine 1.0; distinct images must not."""
    from pyspark.sql import functions as F

    from cyber_etl_spark.operators.ann import cosine_neardup_pairs
    from cyber_etl_spark.operators.multimodal import encode_fake_image, extract_features

    rows = [
        (1, bytearray(encode_fake_image(64, 64, "RGB"))),
        (2, bytearray(encode_fake_image(64, 64, "RGB"))),   # exact dup of 1
        (3, bytearray(encode_fake_image(640, 480, "RGB"))),
        (4, bytearray(encode_fake_image(32, 32, "L"))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    feats = extract_features(df, dim=16).select(
        F.col("media_id").alias("vec_id"),
        F.col("features").alias("embedding"),
    )
    pairs = cosine_neardup_pairs(feats, threshold=0.999)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_image_header_parse_truncated_and_fill_bytes(monkeypatch):
    """Malformed containers return None / ValueError (never struct.error
    or zlib.error), and spec-legal JPEG 0xFF fill bytes still parse."""
    import struct

    import pytest

    from cyber_etl_spark.operators import multimodal as mm

    # the ValueError assertions pin the NO-CODEC path; with Pillow
    # importable the gate would raise PIL's UnidentifiedImageError
    # (an OSError) instead, so force the gate off for this test
    monkeypatch.setattr(mm, "_HAS_PIL", False)
    # truncated containers → header parse returns None → decode raises
    # the documented ValueError
    for bogus in (
        mm._PNG_SIG + b"\x00\x00\x00\x0dIHDR\x00\x01",  # short IHDR
        b"GIF89a\x0c",  # short screen descriptor
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00",  # SOF cut off mid-header
    ):
        assert mm._parse_image_header(bogus) is None
        with pytest.raises(ValueError):
            mm._decode_image_bytes(bogus)
    # EOI before SOF → no dimensions
    assert mm._parse_image_header(b"\xff\xd8\xff\xd9trailing") is None
    # fill bytes (0xFF padding) before the SOF marker are skipped
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill bytes
        + b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 48, 64)
        + b"\x01"
        + b"\x01\x11\x00"
    )
    assert mm._parse_image_header(jpeg) == (64, 48, "L")
    # corrupt deflate stream in a well-formed PNG header → ValueError
    png = mm._png_encode_pixels(
        __import__("numpy").zeros((3, 3, 3), dtype="uint8"), 2
    )
    corrupt = png[:41] + b"\x00\x00\x00\x00" + png[45:]
    with pytest.raises(ValueError):
        mm._png_decode_pixels(corrupt)


def test_resize_never_stubs_real_bytes(monkeypatch):
    """ADVICE r5: genuine non-PNG image bytes must either resize through
    a real codec (PIL when importable) or RAISE — never be silently
    replaced with a FAKEIMG stub."""
    import pytest

    import cyber_etl_spark.operators.multimodal as mm

    jpeg_ish = b"\xff\xd8\xff\xe0" + b"JFIF-payload-that-matters"

    # no codec available: loud failure, not silent data loss
    monkeypatch.setattr(mm, "_HAS_PIL", False)
    with pytest.raises(ValueError, match="refusing to replace pixel data"):
        mm._resize_image_bytes(jpeg_ish, 4, 4)

    # PIL importable: routed through Image.open().resize(), PNG-encoded
    class _FakeIm:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def resize(self, size, _method):
            assert size == (4, 4)
            return self

        def save(self, buf, format):
            assert format == "PNG"
            buf.write(b"resized-by-codec")

    class _FakeImage:
        NEAREST = 0
        opened_with: bytes | None = None

        @classmethod
        def open(cls, fh):
            cls.opened_with = fh.read()
            return _FakeIm()

    monkeypatch.setattr(mm, "_HAS_PIL", True)
    monkeypatch.setattr(mm, "Image", _FakeImage, raising=False)
    assert mm._resize_image_bytes(jpeg_ish, 4, 4) == b"resized-by-codec"
    assert _FakeImage.opened_with == jpeg_ish

    # FAKEIMG payloads still take the deterministic stub path, PIL or not
    out = mm._resize_image_bytes(mm.encode_fake_image(9, 9, "RGB"), 4, 4)
    assert out.startswith(b"FAKEIMG|4|4|RGB|")


def test_phash_neardup_pairs_pixel_semantics(spark):
    """pHash banded-join dedup on crafted PNGs: identical pixels pair at
    Hamming 0, a single flipped pixel stays a near-dup (low-frequency
    DCT signature barely moves), an unrelated pattern does not pair;
    FAKEIMG payloads hash deterministically (same payload → Hamming 0)."""
    import hashlib

    import numpy as np

    from cyber_etl_spark.operators import multimodal as mm

    def grid(seed: str) -> np.ndarray:
        stream, cur = [], seed.encode()
        while sum(len(c) for c in stream) < 1024:
            cur = hashlib.sha256(cur).digest()
            stream.append(cur)
        return np.frombuffer(b"".join(stream)[:1024], dtype=np.uint8).copy()

    base = grid("a")
    near = base.copy()
    near[500] ^= 0xFF
    far = grid("completely different")
    rows = [
        (1, bytearray(mm._png_encode_pixels(base.reshape(32, 32, 1), 0))),
        (2, bytearray(mm._png_encode_pixels(base.reshape(32, 32, 1), 0))),
        (3, bytearray(mm._png_encode_pixels(near.reshape(32, 32, 1), 0))),
        (4, bytearray(mm._png_encode_pixels(far.reshape(32, 32, 1), 0))),
        (5, bytearray(mm.encode_fake_image(9, 9, "RGB"))),
        (6, bytearray(mm.encode_fake_image(9, 9, "RGB"))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_neardup_pairs(df, max_hamming=7, bands=8).collect()
    }
    assert pairs[(1, 2)] == 0  # identical pixels
    assert pairs[(5, 6)] == 0  # identical FAKEIMG payloads
    assert 0 <= pairs[(1, 3)] <= 7 and 0 <= pairs[(2, 3)] <= 7  # one-pixel edit
    assert not any(4 in p for p in pairs)  # unrelated pattern never pairs

    # banding exactness precondition is enforced
    import pytest

    with pytest.raises(AssertionError, match="hamming <= bands-1"):
        mm.phash_neardup_pairs(df, max_hamming=9, bands=8)


def test_phash_band_zero_sign_proof(spark):
    """Band 0 of a NEGATIVE phash must equi-join a positive hash's
    identical low byte (review r6: signed % broke the pigeonhole
    exactness guarantee).  Craft two fingerprints differing in exactly
    7 high bits (one per band 1-7, incl. the sign bit), identical in
    band 0 — the pair MUST surface at hamming 7."""
    from cyber_etl_spark.operators import multimodal as mm

    h_pos = 0x05  # low byte only
    h_neg = h_pos ^ sum(1 << (8 * b + 3) for b in range(1, 7)) ^ (1 << 63)
    h_neg_signed = h_neg - (1 << 64)  # negative as Spark LongType
    fp = spark.createDataFrame(
        [(1, h_pos), (2, h_neg_signed)], "id long, phash long"
    )
    pairs = mm.phash_pairs_from_fingerprints(fp, max_hamming=7, bands=8).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(1, 2, 7)]


def test_audio_fingerprint_neardup_semantics(spark):
    """Spectral-fingerprint audio dedup on crafted WAVs: identical PCM
    pairs at Hamming 0, light additive noise stays near (band-energy
    difference signs are robust), a different tone mix does not pair;
    FAKEAUD payloads fingerprint deterministically."""
    import numpy as np

    from cyber_etl_spark.operators import multimodal as mm

    t = np.arange(16000) / 16000.0

    def tone(freqs, amp=8000):
        return sum(amp * np.sin(2 * np.pi * f * t) for f in freqs)

    base = tone([220, 440, 660, 880, 1100, 1320, 1540, 1760])
    rng_noise = np.frombuffer(
        mm.sha256_stream(b"noise", 2 * len(t)), dtype="<i2"
    ).astype(np.float64)
    near = base + rng_noise / 64.0  # tiny additive noise
    far = tone([261, 523, 785, 1047, 1309, 1571, 1833, 2093])
    rows = [
        (1, bytearray(mm._wav_encode_pcm16(base))),
        (2, bytearray(mm._wav_encode_pcm16(base))),
        (3, bytearray(mm._wav_encode_pcm16(near))),
        (4, bytearray(mm._wav_encode_pcm16(far))),
        (5, bytearray(mm.encode_fake_audio(32000, 16000, 1))),
        (6, bytearray(mm.encode_fake_audio(32000, 16000, 1))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.audio_neardup_pairs(df, max_hamming=7, bands=8).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(5, 6)] == 0
    assert 0 <= pairs[(1, 3)] <= 7
    assert not any(4 in p for p in pairs)


def _fakevid(frames: list[bytes], fps: int = 24) -> bytearray:
    return bytearray(
        f"FAKEVID|{len(frames)}|{fps}|".encode() + b"".join(frames)
    )


def test_video_fingerprint_sampling_and_majority(spark):
    """video_fingerprints semantics: (a) only every-Nth frame votes —
    changing a NON-sampled frame leaves the signature untouched while
    changing a sampled one can move it; (b) identical videos hash
    identically; (c) the majority vote absorbs a minority of replaced
    frames (near-dup copies collapse to Hamming 0); (d) different
    dominant scenes diverge far past the banded-join gate."""
    import hashlib

    from cyber_etl_spark.operators import multimodal as mm

    def fr(seed: str) -> bytes:
        return hashlib.sha256(seed.encode()).digest()[:16]

    a, b = fr("sceneA"), fr("sceneB")
    base = [a] * 12
    v_base = _fakevid(base)
    # change frame 1 (odd → NOT sampled at every_n=2)
    odd_edit = list(base); odd_edit[1] = fr("x1")
    # replace 2 sampled frames (strict minority of the 6 sampled: the
    # base keeps 4 votes, so no bit can cross the 2*count >= n majority)
    noisy = list(base); noisy[0] = fr("n0"); noisy[2] = fr("n1")
    v_other = _fakevid([b] * 12)
    df = spark.createDataFrame(
        [
            (1, v_base),
            (2, v_base),
            (3, _fakevid(odd_edit)),
            (4, _fakevid(noisy)),
            (5, v_other),
        ],
        "media_id long, content binary",
    )
    fp = {
        r.id: r.vfp
        for r in mm.video_fingerprints(df, every_n=2).collect()
    }
    assert fp[1] == fp[2]  # identical videos
    assert fp[3] == fp[1]  # non-sampled frame is invisible
    assert fp[4] == fp[1]  # minority replacements absorbed by the vote
    diff = bin((fp[1] ^ fp[5]) & ((1 << 64) - 1)).count("1")
    assert diff > 7  # different scenes separate past the gate


def test_video_fingerprint_sensitive_to_sampled_majority_shift(spark):
    """Flipping the sampled-frame MAJORITY flips the signature toward
    the new dominant scene — the vote is scene-mass-weighted, not
    first-frame or min-hash."""
    import hashlib

    from cyber_etl_spark.operators import multimodal as mm

    def fr(seed: str) -> bytes:
        return hashlib.sha256(seed.encode()).digest()[:16]

    a, b = fr("sceneA"), fr("sceneB")
    df = spark.createDataFrame(
        [
            (1, _fakevid([a] * 12)),
            (2, _fakevid([b] * 8 + [a] * 4)),  # B-dominant
            (3, _fakevid([b] * 12)),
        ],
        "media_id long, content binary",
    )
    fp = {r.id: r.vfp for r in mm.video_fingerprints(df, every_n=1).collect()}
    assert fp[2] == fp[3]  # majority B → B's signature
    assert fp[1] != fp[2]


def test_video_neardup_pairs_end_to_end(spark):
    """Copies and light edits of one scene pair at Hamming 0 through the
    shared banded join; different-scene videos never pair."""
    import hashlib

    from cyber_etl_spark.operators import multimodal as mm

    def fr(seed: str) -> bytes:
        return hashlib.sha256(seed.encode()).digest()[:16]

    a, b = fr("sA"), fr("sB")
    noisy = [a] * 10 + [fr("nz0"), fr("nz1")]
    df = spark.createDataFrame(
        [
            (1, _fakevid([a] * 12)),
            (2, _fakevid([a] * 12)),
            (3, _fakevid(noisy)),
            (4, _fakevid([b] * 12)),
        ],
        "media_id long, content binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.video_neardup_pairs(df, max_hamming=7, bands=8, every_n=1).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert all(h == 0 for h in pairs.values())
