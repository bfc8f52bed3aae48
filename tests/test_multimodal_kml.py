"""Multimodal plumbing (binary columns + mapInPandas) and KML source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
    media_metadata_stats,
)
from accident_prediction_montreal_spark.sources.kml import (
    parse_kml_bytes,
    read_road_network,
)

KML = b"""<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
  <Folder><name>Arterielle</name>
    <Placemark><name>rue Exemple</name>
      <ExtendedData><SchemaData>
        <SimpleData name="NID">abc123</SimpleData>
      </SchemaData></ExtendedData>
      <LineString><coordinates>
        -73.60,45.50,0 -73.601,45.501,0 -73.602,45.502,0
      </coordinates></LineString>
    </Placemark>
  </Folder>
</Document></kml>"""


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "png", 64, 64, None, b"\x89PNG fake bytes"),
        (2, "image", "jpg", 32, 16, None, b"\xff\xd8 fake"),
        (3, "video", "mp4", 640, 480, 3500, b"\x00\x00 fake mp4"),
        (4, "audio", "wav", None, None, 2000, b"RIFF fake"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_parse_kml_rows():
    rows = parse_kml_bytes(KML)
    assert len(rows) == 3  # one per coordinate
    name, folder, c_lon, c_lat, lon, lat, nid = rows[0]
    assert name == "rue Exemple" and folder == "Arterielle" and nid == "abc123"
    assert (c_lon, c_lat) == (-73.601, 45.501)  # midpoint of the polyline
    assert (lon, lat) == (-73.60, 45.50)


def test_read_road_network(spark, tmp_path):
    p = tmp_path / "roads.kml"
    p.write_bytes(KML)
    df = read_road_network(spark, [str(p)])
    assert df.count() == 3
    assert set(df.columns) >= {"street_name", "street_type", "coord_lat", "coord_long", "street_id"}
    assert df.select("street_id").distinct().first()[0] == "abc123_1"


def test_media_features_deterministic(spark, media):
    out = extract_media_features(media)
    rows = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(rows) == 4 and all(len(v) == 16 for v in rows.values())
    again = {r["media_id"]: r["features"] for r in extract_media_features(media).collect()}
    assert rows == again  # deterministic stub
    assert rows[1] != rows[2]  # distinct payloads → distinct features


def test_media_decode_raise_stub(spark, media):
    import py4j

    with pytest.raises(Exception) as exc:
        extract_media_features(media, decode_stub="raise").collect()
    assert "NotImplementedError" in str(exc.value) or "real media decode" in str(exc.value)


def test_media_metadata_stats_prunes_payload(spark, media, tmp_path):
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    stats = media_metadata_stats(spark.read.parquet(path))
    got = {(r["kind"], r["format"]): r["n"] for r in stats.collect()}
    assert got[("image", "png")] == 1 and got[("video", "mp4")] == 1
    # default plan must not read the blob column (ReadSchema pruning)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[-1]
    assert "payload" not in read_schema
    with_size = media_metadata_stats(spark.read.parquet(path), include_payload_size=True)
    assert with_size.first()["payload_mb"] > 0


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # video duration 3500 ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_wav_roundtrip_exact():
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=333, dtype=np.int64)
    feats = decode_wav(encode_wav_pcm16(samples, sample_rate=8000))
    assert feats["sample_rate"] == 8000
    assert feats["n_samples"] == 333
    assert feats["bits"] == 16 and feats["n_channels"] == 1
    s = samples.astype("float64")
    assert feats["mean_amp"] == pytest.approx(s.mean(), abs=1e-9)
    assert feats["rms_amp"] == pytest.approx(np.sqrt((s * s).mean()), abs=1e-9)


def test_wav_decode_rejects_malformed():
    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    with pytest.raises(ValueError):
        decode_wav(b"not a riff container")
    # truncate the data chunk header: fmt parses, data never appears
    good = encode_wav_pcm16([1, 2, 3])
    with pytest.raises(ValueError):
        decode_wav(good[: good.index(b"data")])


def test_wav_features_mapinpandas(spark):
    from accident_prediction_montreal_spark.operators.multimodal import (
        encode_wav_pcm16,
        wav_features,
    )

    rows = [(i, encode_wav_pcm16([i * 100, -i * 100, i])) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {r["media_id"]: r for r in wav_features(df).collect()}
    assert got[2]["n_samples"] == 3
    assert got[2]["mean_amp"] == pytest.approx((200 - 200 + 2) / 3.0)


def test_ppm_roundtrip_and_comments():
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm_p6,
    )

    rng = np.random.default_rng(11)
    w, h = 5, 4
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.int64)
    feats = decode_ppm(encode_ppm_p6(px, w, h))
    assert (feats["width"], feats["height"]) == (w, h)
    rgb = px.reshape(-1, 3).astype("float64")
    assert feats["mean_g"] == pytest.approx(rgb[:, 1].mean(), abs=1e-9)
    # comment lines inside the header must be skipped
    with_comment = b"P6\n# synthetic fixture\n5 4\n255\n" + px.astype("u1").tobytes()
    assert decode_ppm(with_comment)["mean_r"] == feats["mean_r"]
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # PGM belongs to decode_pgm
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm_p6(px, w, h)[:-7])  # truncated raster


def test_bmp_roundtrip_padding_and_row_order():
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_24,
    )

    rng = np.random.default_rng(23)
    # widths 5..8 sweep every 4-byte padding residue (15,18,21,24 row bytes)
    for w in (5, 6, 7, 8):
        h = 3
        px = rng.integers(0, 256, size=w * h * 3, dtype=np.int64)
        feats = decode_bmp(encode_bmp_24(px, w, h))
        rgb = px.reshape(h, w, 3).astype("float64")
        assert (feats["width"], feats["height"]) == (w, h)
        assert feats["mean_r"] == pytest.approx(rgb[:, :, 0].mean(), abs=1e-9)
        assert feats["mean_b"] == pytest.approx(rgb[:, :, 2].mean(), abs=1e-9)
        # top_row_mean is the LOGICAL first row — bottom-up storage undone
        assert feats["top_row_mean"] == pytest.approx(rgb[0].mean(), abs=1e-9)


def test_bmp_top_down_negative_height():
    import struct

    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_24,
    )

    w, h = 5, 4
    px = np.arange(w * h * 3, dtype=np.int64) % 256
    bottom_up = encode_bmp_24(px, w, h)
    # Rewrite as a top-down BMP: negate biHeight and un-reverse the rows.
    stride = w * 3 + ((-(w * 3)) % 4)
    offset = 54
    rows = [bottom_up[offset + r * stride : offset + (r + 1) * stride] for r in range(h)]
    top_down = (
        bottom_up[:22] + struct.pack("<i", -h) + bottom_up[26:offset] + b"".join(rows[::-1])
    )
    assert decode_bmp(top_down) == decode_bmp(bottom_up)


def test_bmp_rejects_malformed():
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_24,
    )

    px = np.zeros(5 * 4 * 3, dtype=np.int64)
    good = encode_bmp_24(px, 5, 4)
    with pytest.raises(ValueError):
        decode_bmp(b"PNG not a bmp")
    with pytest.raises(ValueError):
        decode_bmp(good[:-5])  # truncated raster
    bad_bpp = good[:28] + b"\x08\x00" + good[30:]  # 8bpp palette BMP
    with pytest.raises(ValueError):
        decode_bmp(bad_bpp)


def test_bmp_features_mapinpandas(spark):
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        bmp_features,
        encode_bmp_24,
    )

    rows = []
    for mid in (1, 2):
        w, h = 5 + mid, 3
        px = (np.arange(w * h * 3, dtype=np.int64) * mid) % 256
        rows.append((mid, bytearray(encode_bmp_24(px, w, h))))
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {r["media_id"]: r for r in bmp_features(df).collect()}
    assert got[1]["width"] == 6 and got[2]["width"] == 7
    px2 = (np.arange(7 * 3 * 3, dtype=np.int64) * 2) % 256
    assert got[2]["mean_g"] == pytest.approx(
        px2.reshape(-1, 3)[:, 1].astype("float64").mean(), abs=1e-9
    )


def test_decoders_reject_null_payload():
    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_bmp,
        decode_pgm,
        decode_ppm,
        decode_wav,
    )

    for dec in (decode_wav, decode_ppm, decode_pgm, decode_bmp):
        with pytest.raises(ValueError):
            dec(None)  # null payload must be the documented error, not a TypeError


def test_bmp_rejects_degenerate_dimensions():
    import struct

    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_24,
    )

    good = encode_bmp_24(np.zeros(5 * 4 * 3, dtype=np.int64), 5, 4)
    zero_h = good[:22] + struct.pack("<i", 0) + good[26:]
    with pytest.raises(ValueError):
        decode_bmp(zero_h)
    zero_w = good[:18] + struct.pack("<i", 0) + good[22:]
    with pytest.raises(ValueError):
        decode_bmp(zero_w)


def test_pgm_roundtrip_comments_and_rejects():
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_pgm,
        encode_pgm_p5,
    )

    rng = np.random.default_rng(13)
    w, h = 6, 3
    px = rng.integers(0, 256, size=w * h, dtype=np.int64)
    feats = decode_pgm(encode_pgm_p5(px, w, h))
    assert (feats["width"], feats["height"]) == (w, h)
    assert feats["mean_gray"] == pytest.approx(px.astype("float64").mean(), abs=1e-9)
    assert feats["max_gray"] == float(px.max())
    with_comment = b"P5\n# synthetic fixture\n6 3\n255\n" + px.astype("u1").tobytes()
    assert decode_pgm(with_comment)["mean_gray"] == feats["mean_gray"]
    with pytest.raises(ValueError):
        decode_pgm(b"P6\n1 1\n255\n\x00\x00\x00")  # RGB PPM is not PGM
    with pytest.raises(ValueError):
        decode_pgm(encode_pgm_p5(px, w, h)[:-3])  # truncated raster


class TestResizeAndFrameSample:
    def test_resize_nearest_identity_and_downscale(self):
        import numpy as np

        from accident_prediction_montreal_spark.operators.multimodal import (
            resize_nearest,
        )

        px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        assert (resize_nearest(px, 6, 4) == px).all()  # identity
        small = resize_nearest(px, 3, 2)
        assert small.shape == (2, 3, 3)
        # dst (0,0) samples src (0,0); dst (2,1) samples src ((2*6)//3=4, (1*4)//2=2)
        assert (small[0, 0] == px[0, 0]).all()
        assert (small[1, 2] == px[2, 4]).all()
        import pytest as _pytest

        with _pytest.raises(ValueError):
            resize_nearest(px, 0, 2)

    def test_pv1_roundtrip_and_guards(self):
        import numpy as np
        import pytest as _pytest

        from accident_prediction_montreal_spark.operators.multimodal import (
            decode_rawvideo_header,
            encode_rawvideo_pv1,
        )

        frames = np.arange(3 * 2 * 2, dtype=np.uint8)
        payload = encode_rawvideo_pv1(frames, 3, 2, 2)
        assert decode_rawvideo_header(payload) == (3, 2, 2, len(b"PV1\n3 2 2\n"))
        with _pytest.raises(ValueError):
            decode_rawvideo_header(b"")
        with _pytest.raises(ValueError):
            decode_rawvideo_header(b"P6\n2 2\n255\n")
        with _pytest.raises(ValueError):
            decode_rawvideo_header(b"PV1\n0 2 2\n")

    def test_frame_sample_truncated_raster_raises(self, spark):
        import pytest as _pytest

        from accident_prediction_montreal_spark.operators.multimodal import (
            frame_sample_features,
        )

        bad = b"PV1\n2 2 2\n" + b"\x00" * 7  # needs 8 bytes
        media = spark.createDataFrame([(1, bytearray(bad))], "media_id long, payload binary")
        with _pytest.raises(Exception, match="truncated"):
            frame_sample_features(media).collect()
        with _pytest.raises(ValueError):
            frame_sample_features(media, stride=0)


def test_png_roundtrip_all_filters():
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_png,
        encode_png_rgb8,
    )

    rng = np.random.RandomState(5)
    for w, h in [(1, 1), (4, 5), (7, 8), (3, 6), (16, 9)]:
        px = rng.randint(0, 256, size=w * h * 3)
        feats = decode_png(encode_png_rgb8(px, w, h))
        arr = px.reshape(h, w, 3).astype(float)
        assert feats["width"] == w and feats["height"] == h
        for i, ch in enumerate("rgb"):
            assert abs(feats[f"mean_{ch}"] - arr[:, :, i].mean()) < 1e-9
        assert abs(feats["top_row_mean"] - arr[0].mean()) < 1e-9


def test_png_rejects_malformed():
    import struct
    import zlib

    import numpy as np
    import pytest

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_png,
        encode_png_rgb8,
    )

    good = encode_png_rgb8(np.arange(60) % 256, 5, 4)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a" + good[6:])
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(None)
    # flip one raster byte inside the first IDAT chunk -> CRC mismatch
    idat = good.index(b"IDAT")
    corrupted = bytearray(good)
    corrupted[idat + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupted))
    # unsupported color type (palette) is refused, not mis-decoded
    sig = good[:8]
    ihdr_body = struct.pack(">IIBBBBB", 5, 4, 8, 3, 0, 0, 0)
    ihdr = (
        struct.pack(">I", len(ihdr_body))
        + b"IHDR"
        + ihdr_body
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(sig + ihdr + good[8 + 25 :])


def test_png_grayscale_and_features_mapinpandas(spark):
    import struct
    import zlib

    import numpy as np
    from pyspark.sql import functions as F

    from accident_prediction_montreal_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
        encode_png_rgb8,
        png_features,
    )

    # hand-built grayscale (color type 0), filter None rows
    w, h = 4, 3
    gray = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    raw = b"".join(b"\x00" + gray[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    feats = decode_png(payload)
    assert feats["mean_r"] == feats["mean_g"] == feats["mean_b"]
    assert abs(feats["mean_r"] - gray.mean()) < 1e-9

    rows = [
        (int(i), bytearray(encode_png_rgb8(np.arange(5 * 4 * 3) * (i + 1) % 256, 5, 4)))
        for i in range(6)
    ]
    media = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    out = png_features(media)
    got = {r["media_id"]: r for r in out.collect()}
    assert len(got) == 6
    for i in range(6):
        arr = (np.arange(5 * 4 * 3) * (i + 1) % 256).reshape(4, 5, 3)
        assert abs(got[i]["mean_g"] - arr[:, :, 1].mean()) < 1e-9


def test_gif_lzw_roundtrip_growth_boundaries():
    import random

    from accident_prediction_montreal_spark.operators.multimodal import (
        _gif_lzw_compress,
        _gif_lzw_decompress,
    )

    rng = random.Random(5)
    for _ in range(60):
        n = rng.randint(1, 4000)
        idx = [rng.randint(0, 15) for _ in range(n)]
        assert _gif_lzw_decompress(_gif_lzw_compress(idx, 4), 4) == idx
    # low-entropy runs force dict growth across several width boundaries
    for mcs in (2, 4):
        idx = [0, 1] * 6000
        assert _gif_lzw_decompress(_gif_lzw_compress(idx, mcs), mcs) == idx


def test_gif_container_roundtrip_and_errors():
    import pytest as _pytest

    from accident_prediction_montreal_spark.operators.multimodal import (
        decode_gif,
        encode_gif87a,
    )

    idx = [(p * 7) % 16 for p in range(12 * 9)]
    payload = encode_gif87a(idx, 12, 9)
    f = decode_gif(payload)
    assert (f["width"], f["height"]) == (12, 9)
    assert f["idx_sum"] == sum(idx)
    pal_r = [(i * 17) % 256 for i in range(16)]
    assert abs(f["mean_r"] - sum(pal_r[i] for i in idx) / len(idx)) < 1e-9
    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with _pytest.raises(ValueError):
        decode_gif(payload[:20])  # truncated mid-palette
    # corrupt a byte inside the LZW stream: decode must fail loudly,
    # not return wrong pixels silently (size or code-range check fires)
    broken = bytearray(payload)
    broken[-10] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_gif(bytes(broken))


def test_gif_features_mapinpandas(spark):
    from accident_prediction_montreal_spark.operators.multimodal import (
        encode_gif87a,
        gif_features,
    )

    rows = []
    for mid in (1, 2):
        w, h = 5 + mid, 4
        idx = [(mid * 31 + p * 7) % 16 for p in range(w * h)]
        rows.append((mid, bytearray(encode_gif87a(idx, w, h))))
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    got = {r["media_id"]: r for r in gif_features(df).collect()}
    assert got[1]["width"] == 6 and got[2]["width"] == 7
    assert got[1]["idx_sum"] == sum((31 + p * 7) % 16 for p in range(24))
