"""Multimodal plumbing: REAL PPM/BMP decode path + recorded-error
fallback path, schema, batch shape, frame-sample plan."""

import hashlib
import struct

import numpy as np

from thesis_ner_co_tri_training_spark.operators.multimodal import (
    _fake_features,
    decode_image,
    extract_features,
    frame_sample_plan,
    gen_media_df,
    gen_ppm,
    image_features,
    resize_nearest,
)


def _bmp_24(rows_rgb):
    """Minimal 24bpp bottom-up BMP from a top->bottom RGB row list."""
    h, w = len(rows_rgb), len(rows_rgb[0])
    stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for r in reversed(rows_rgb):
        rowb = bytearray()
        for (R, G, B) in r:
            rowb += bytes([B, G, R])
        rowb += b"\0" * (stride - len(rowb))
        pix += rowb
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    return b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54) + info + bytes(pix)


def test_decode_ppm_exact():
    img = decode_image(gen_ppm(16, 12, seed=3))
    assert img.shape == (12, 16, 3) and img.dtype == np.float32
    # pixel formula from gen_ppm, exact
    assert round(float(img[0, 1, 0]) * 255) == (1 * 16 + 3) % 256
    assert round(float(img[2, 0, 1]) * 255) == (2 * 21 + 6) % 256


def test_decode_bmp_exact():
    img = decode_image(_bmp_24([[(255, 0, 0), (255, 255, 255)],
                                [(0, 0, 255), (0, 255, 0)]]))
    assert img.shape == (2, 2, 3)
    assert (img[0, 0] * 255).round().astype(int).tolist() == [255, 0, 0]
    assert (img[1, 1] * 255).round().astype(int).tolist() == [0, 255, 0]


def test_resize_and_features():
    const = decode_image(b"P6\n4 4\n255\n" + bytes([128, 128, 128] * 16))
    small = resize_nearest(const, 2, 2)
    assert small.shape == (2, 2, 3)
    feats = image_features(const, 8)
    assert len(feats) == 8
    assert all(abs(f - 128 / 255) < 1e-6 for f in feats)


def test_extract_features_real_and_fallback(spark):
    media = gen_media_df(spark, 30)
    feats = extract_features(media, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    for i, r in rows.items():
        assert r["feat_dim"] == 8 and len(r["feat"]) == 8
        if i % 3 == 0:  # image rows: REAL decode, no error
            assert r["decode_error"] is None
            want = image_features(decode_image(gen_ppm(16, 12, seed=i)), 8)
            assert all(abs(a - b) < 1e-6 for a, b in zip(r["feat"], want))
        elif i % 3 == 1:  # audio rows: REAL PCM WAV decode, no error
            assert r["decode_error"] is None
        else:  # video: recorded error + deterministic fallback
            assert "native codec" in r["decode_error"] or "decode" in r["decode_error"]
            payload = hashlib.sha256(f"media-{i}".encode()).digest() * 8
            want = _fake_features(payload, 8)
            assert all(abs(a - b) < 1e-6 for a, b in zip(r["feat"], want))


def test_extract_features_truncated_bmp(spark):
    """A corrupt 'BM' payload shorter than its header must record a
    decode_error row (struct.error path), not kill the task."""
    rows = [(1, "image", bytearray(b"BM\x00\x01")),
            (2, "image", bytearray(gen_ppm(4, 4, seed=2)))]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in extract_features(media, dim=4).collect()}
    assert out[1]["decode_error"] is not None
    assert len(out[1]["feat"]) == 4  # deterministic fake, full shape
    assert out[2]["decode_error"] is None


def test_frame_sample_plan_counts(spark):
    media = gen_media_df(spark, 12)
    plan = frame_sample_plan(media, every_ms=500)
    got = {}
    for r in plan.collect():
        got.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    # only videos (every 3rd id starting at 2), frames = 0..duration step 500
    want_ids = {i for i in range(12) if i % 3 == 2}
    assert set(got) == want_ids
    for i in want_ids:
        duration = 1000 + i
        assert sorted(got[i]) == list(range(0, duration + 1, 500))


def test_wav_decode_and_features(spark):
    """Real PCM WAV decode: a known sine decodes to ~0.5/sqrt(2) RMS in
    every window, truncated/exotic payloads record decode_error, and
    gen_media_df's audio rows now take the REAL decode path (no error)."""
    import numpy as np

    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        _decode_wav, audio_features, extract_features, gen_media_df,
        gen_wav)

    samples, sr = _decode_wav(gen_wav(n_samples=8000, seed=3))
    assert sr == 8000 and samples.shape == (8000, 1)
    assert abs(float(np.abs(samples).max()) - 0.5) < 0.01
    feats = audio_features(samples, dim=8)
    target = 0.5 / np.sqrt(2)                    # sine RMS = amp/sqrt(2)
    assert all(abs(f - target) < 0.02 for f in feats)

    out = extract_features(gen_media_df(spark, 12)).collect()
    by_kind = {}
    for r in out:
        by_kind.setdefault(r.kind, []).append(r)
    assert all(r.decode_error is None for r in by_kind["audio"])
    assert all(r.decode_error is None for r in by_kind["image"])
    assert all(r.decode_error is not None for r in by_kind["video"])
    # decoded audio features are the pure-Python computation, exactly
    a0 = [r for r in by_kind["audio"] if r.media_id == 1][0]
    exp = audio_features(_decode_wav(gen_wav(seed=1))[0], dim=8)
    assert [round(float(x), 5) for x in a0.feat] == [
        round(x, 5) for x in exp]

    import pytest

    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"not audio")
    with pytest.raises(ValueError, match="fmt/data"):
        _decode_wav(b"RIFF\x00\x00\x00\x00WAVE")


def test_wav_truncated_data_chunk_is_decode_error():
    """A data chunk whose declared size extends past the payload must
    raise (-> decode_error column), never silently compute features
    from partial audio. Even-length truncation used to pass silently
    (16-bit odd-length already errored in numpy)."""
    import pytest

    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        _decode_wav, gen_wav)

    wav = gen_wav(n_samples=1000, seed=7)
    full, _ = _decode_wav(wav)
    # cut an EVEN number of bytes off the end: numpy frombuffer would
    # accept the shorter buffer without the explicit chunk-size guard
    with pytest.raises(ValueError, match="truncated"):
        _decode_wav(wav[:-4])
    with pytest.raises(ValueError, match="truncated"):
        _decode_wav(wav[: len(wav) // 2])
    # untouched payload still decodes to the same shape
    assert _decode_wav(wav)[0].shape == full.shape


def test_degenerate_ppm_headers_are_decode_errors():
    """Zero-width, zero-maxval and 16-bit PPMs must raise (-> the
    decode_error column), not produce NaN/garbage features silently."""
    import pytest

    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        _decode_ppm)

    with pytest.raises(ValueError, match="dimensions"):
        _decode_ppm(b"P6\n0 5\n255\n")
    with pytest.raises(ValueError, match="dimensions"):
        _decode_ppm(b"P6\n5 0\n255\n")
    with pytest.raises(ValueError, match="maxval"):
        _decode_ppm(b"P6\n2 2\n0\n" + b"\x00" * 12)
    with pytest.raises(ValueError, match="maxval"):
        _decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="truncated"):
        _decode_ppm(b"P6\n4 4\n255\n" + b"\x00" * 10)


# ---------------------------------------------------------------------- png


def _replay_png(payload):
    """Pure-Python PNG replay decoder (ints + zlib, no numpy): shares no
    code with either _decode_png or gen_png. Returns list-of-rows of
    per-pixel channel tuples."""
    import zlib

    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos:pos + 4], "big")
        cid = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"IHDR":
            ihdr = body
        elif cid == b"IDAT":
            idat += body
        pos += 12 + size
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    ch = {0: 1, 2: 3, 6: 4}[ihdr[9]]
    raw = zlib.decompress(idat)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    rows, prev, pos = [], [0] * stride, 0
    for _ in range(h):
        f = raw[pos]
        line = list(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        cur = [0] * stride
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            pred = (0, left, up, (left + up) >> 1, paeth(left, up, ul))[f]
            cur[x] = (line[x] + pred) & 0xFF
        rows.append([tuple(cur[i * ch:(i + 1) * ch]) for i in range(w)])
        prev = cur
    return rows


def _png_u8(img):
    return (img * 255).round().astype(int)


def test_decode_png_bit_exact_all_filters():
    """Default gen_png cycles filters 0..4, so one 16x12 fixture hits
    every unfilter branch; the numpy decode must equal BOTH the source
    gradient and the independent pure-Python replay, bit-exact."""
    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        decode_image, gen_png)

    png = gen_png(16, 12, seed=3)
    img = _png_u8(decode_image(png))
    assert img.shape == (12, 16, 3)
    replay = _replay_png(png)
    for y in range(12):
        for x in range(16):
            want = ((x * 16 + 3) % 256, (y * 21 + 6) % 256, (x + y + 3) % 256)
            assert tuple(img[y, x]) == want == replay[y][x]


def test_decode_png_each_filter_roundtrips():
    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        decode_image, gen_png)

    for f in range(5):
        png = gen_png(9, 7, seed=f, filters=[f] * 7)
        img = _png_u8(decode_image(png))
        assert tuple(img[6, 8]) == (
            (8 * 16 + f) % 256, (6 * 21 + 2 * f) % 256,
            (8 + 6 + f) % 256), f"filter {f}"
        replay = _replay_png(png)
        for y in range(7):
            for x in range(9):
                assert tuple(img[y, x]) == replay[y][x], f"filter {f}"


def test_decode_png_rgba_and_gray():
    """RGBA decodes its color planes (alpha dropped); gray broadcasts
    to 3 identical channels."""
    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        decode_image, gen_png)

    rgba = _png_u8(decode_image(gen_png(8, 6, seed=5, color_type=6)))
    for y in range(6):
        for x in range(8):
            assert tuple(rgba[y, x]) == (
                (x * 16 + 5) % 256, (y * 21 + 10) % 256, (x + y + 5) % 256)
    gray = _png_u8(decode_image(gen_png(8, 6, seed=5, color_type=0)))
    for y in range(6):
        for x in range(8):
            g = (x * 16 + 5) % 256
            assert tuple(gray[y, x]) == (g, g, g)


def _mutate_ihdr(png, offset_in_body, value):
    """Flip one IHDR byte and re-sign the chunk CRC (valid-CRC negative
    fixtures for depth/interlace/color-type)."""
    import struct
    import zlib

    body = bytearray(png[16:29])
    body[offset_in_body] = value
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
    return png[:16] + bytes(body) + crc + png[33:]


def test_decode_png_unsupported_variants_raise():
    import pytest

    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        _decode_png, gen_png)

    png = gen_png(6, 4, seed=1)
    with pytest.raises(NotImplementedError, match="8-bit"):
        _decode_png(_mutate_ihdr(png, 8, 16))     # bit depth 16
    with pytest.raises(NotImplementedError, match="interlace"):
        _decode_png(_mutate_ihdr(png, 12, 1))     # Adam7
    with pytest.raises(NotImplementedError, match="color type"):
        _decode_png(_mutate_ihdr(png, 9, 3))      # palette


def test_decode_png_corruption_raises():
    import pytest

    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        _decode_png, gen_png)

    png = gen_png(6, 4, seed=2)
    # flip one IDAT byte WITHOUT re-signing -> crc mismatch
    bad = bytearray(png)
    bad[41] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        _decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(png[:-8])
    # valid chunks, wrong pixel-stream length: re-sign an IDAT that
    # inflates short
    import struct
    import zlib as z

    short = z.compress(b"\x00" * 5)
    idat = (struct.pack(">I", len(short)) + b"IDAT" + short
            + struct.pack(">I", z.crc32(b"IDAT" + short) & 0xFFFFFFFF))
    iend = png[png.rindex(b"IEND") - 4:]
    with pytest.raises(ValueError, match="pixel stream"):
        _decode_png(png[:33] + idat + iend)


def test_decode_png_bomb_and_forged_dims_bounded():
    """Hostile payloads must land in per-row decode_error, bounded:
    (a) a ~200 KB IDAT that inflates to 200 MB is rejected after at
    most the IHDR-declared stream size is produced (pre-fix, the full
    bomb materialized before the length check — executor OOM);
    (b) a forged IHDR declaring absurd dimensions is rejected before it
    can size any allocation."""
    import struct
    import tracemalloc
    import zlib as z

    import pytest

    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        _PNG_SIG, _decode_png)

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", z.crc32(cid + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bomb = (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", z.compress(b"\x00" * (200 * 1024 * 1024), 9))
            + chunk(b"IEND", b""))
    tracemalloc.start()
    try:
        with pytest.raises(ValueError, match="exceeds the declared"):
            _decode_png(bomb)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    assert peak < 8 * 1024 * 1024, f"bomb inflated {peak} bytes"

    huge_ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    huge = (_PNG_SIG + chunk(b"IHDR", huge_ihdr)
            + chunk(b"IDAT", z.compress(b"\x00" * 64))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="decode cap"):
        _decode_png(huge)


def test_extract_features_png_row(spark):
    """PNG payloads ride the REAL decode path in the distributed stage:
    decode_error null, features == the local decode, bit-exact."""
    import pytest

    from thesis_ner_co_tri_training_spark.operators.multimodal import (
        decode_image, extract_features, gen_png, image_features)

    png = gen_png(16, 12, seed=9)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png))],
        "media_id long, kind string, payload binary")
    row = extract_features(media, dim=8).collect()[0]
    assert row["decode_error"] is None
    want = image_features(decode_image(png), 8)
    assert [float(x) for x in row["feat"]] == [
        pytest.approx(wv, abs=1e-6) for wv in want]
