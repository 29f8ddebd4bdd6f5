"""Tests for multimodal plumbing, scenario generation splits, and the
file-index/coverage surface."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
import pyspark.sql.functions as F

import numpy as np

from finiextestingide_spark.operators.multimodal import (
    decode_bmp,
    decode_media,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    extract_features,
    frame_sample,
    resize,
    resize_nearest,
    with_media_metadata,
)
from finiextestingide_spark.operators.scenario_gen import (
    blocks_split,
    volatility_split,
    walk_forward_split,
)
from finiextestingide_spark.sources.index import (
    build_file_index,
    coverage,
    range_query,
    relevant_files,
)

T0 = datetime(2026, 1, 5)


def _img(seed: int, h: int, w: int) -> np.ndarray:
    """Deterministic synthetic RGB image: p(r,c,ch) = (seed*7+r*31+c*3+ch)%256."""
    r, c, ch = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    return ((seed * 7 + r * 31 + c * 3 + ch) % 256).astype(np.uint8)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, encode_bmp(_img(1, 6, 10))),   # W=10 -> 2 pad bytes per BMP row
        (2, encode_ppm(_img(2, 5, 7))),
        (3, b"".join(encode_ppm(_img(30 + k, 4, 4)) for k in range(5))),  # 5-frame video
        (4, bytes.fromhex("ffd8ff") + b"jpegpayload" * 30),  # compressed: seam raises
        (5, None),
    ]
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_media_metadata_kind_sniff(spark, media):
    out = {r["media_id"]: r for r in with_media_metadata(media).collect()}
    assert out[1]["media_kind"] == "bmp"
    assert out[2]["media_kind"] == "ppm"
    assert out[3]["media_kind"] == "ppm"
    assert out[4]["media_kind"] == "jpeg"
    assert out[1]["media_sha"] is not None and len(out[1]["media_sha"]) == 64


def test_bmp_golden_byte_layout():
    """Pin the DIB byte layout against a hand-built literal (independent of
    encode_bmp, so a symmetric encoder/decoder bug cannot cancel out):
    1x2 image, red above green -> bottom-up rows = green row first, BGR
    channel order, 2-pixel row = 6 bytes + 2 pad."""
    import struct

    pixels = (
        b"\x00\x80\x00" + b"\x00\x80\x00" + b"\x00\x00"  # bottom row: green,green + pad
        + b"\x00\x00\xff" + b"\x00\x00\xff" + b"\x00\x00"  # top row: red,red + pad
    )
    hdr = struct.pack(
        "<2sIHHIIiiHHIIiiII", b"BM", 54 + len(pixels), 0, 0, 54,
        40, 2, 2, 1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    img = decode_bmp(hdr + pixels)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]   # top-left red (RGB out)
    assert img[1, 1].tolist() == [0, 128, 0]   # bottom-right green


def test_codec_roundtrips():
    for h, w in ((6, 10), (1, 1), (3, 4)):
        img = _img(9, h, w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # PPM comments in the header survive the parser
    img = _img(2, 2, 3)
    raw = b"P6\n# a comment\n3 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(raw), img)
    with pytest.raises(NotImplementedError):
        decode_media(bytes.fromhex("ffd8ff") + b"x" * 64)


def test_extract_features_real_decode(spark, media):
    dec = media.where("media_id in (1,2,5)")  # jpeg row raises by contract
    a = {r["media_id"]: r for r in extract_features(dec, feature_dim=180).collect()}
    b = {r["media_id"]: r for r in extract_features(dec, feature_dim=180).collect()}
    assert a[1]["features"] == b[1]["features"]  # pure function of bytes
    assert (a[1]["height"], a[1]["width"]) == (6, 10)
    assert a[1]["features"] == _img(1, 6, 10).reshape(-1).astype(float).tolist()
    assert (a[2]["height"], a[2]["width"]) == (5, 7)
    assert a[5]["features"] is None  # null media -> null features


def test_resize_real(spark, media):
    out = {r["media_id"]: r for r in resize(media.where("media_id in (1,2,5)"), 3, 5).collect()}
    assert (out[1]["height"], out[1]["width"]) == (3, 5)
    # re-encoded in the source format, decodable, and exactly the NN sample
    assert bytes(out[1]["media"])[:2] == b"BM"
    assert np.array_equal(decode_bmp(bytes(out[1]["media"])), resize_nearest(_img(1, 6, 10), 3, 5))
    assert bytes(out[2]["media"])[:2] == b"P6"
    assert np.array_equal(decode_ppm(bytes(out[2]["media"])), resize_nearest(_img(2, 5, 7), 3, 5))
    assert out[5]["media"] is None


def test_frame_sample_real(spark, media):
    out = frame_sample(media.where("media_id in (3,5)"), every_n=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # id=3: 5 PPM frames -> sampled idx 0, 2, 4; each standalone-decodable
    rows = sorted(by_id[3], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        assert np.array_equal(decode_ppm(bytes(r["frame"])), _img(30 + r["frame_idx"], 4, 4))
    assert 5 not in by_id  # null media skipped


def test_blocks_split_roles(spark):
    out = blocks_split(spark, "X", T0, T0 + timedelta(days=9), 9, oos_every=3).collect()
    assert len(out) == 9
    roles = [r["role"] for r in sorted(out, key=lambda r: r["scenario_id"])]
    assert roles == ["IS", "IS", "OOS"] * 3
    assert out[0]["start_ts"] == T0
    assert sorted(out, key=lambda r: r["scenario_id"])[-1]["end_ts"] == T0 + timedelta(days=9)
    # contiguous, non-overlapping
    s = sorted(out, key=lambda r: r["start_ts"])
    for a, b in zip(s, s[1:]):
        assert a["end_ts"] == b["start_ts"]


def test_walk_forward_split(spark):
    out = walk_forward_split(
        spark, "X", T0, T0 + timedelta(days=10),
        train=timedelta(days=3), test=timedelta(days=1),
    ).collect()
    pairs = {}
    for r in out:
        pairs.setdefault(r["name"].rsplit("_", 1)[0], {})[r["role"]] = r
    assert len(pairs) == 7  # (10 - 4) / 1 + 1
    for p in pairs.values():
        assert p["IS"]["end_ts"] == p["OOS"]["start_ts"]
        assert p["OOS"]["end_ts"] - p["OOS"]["start_ts"] == timedelta(days=1)


def test_volatility_split_cuts_at_atr_minima(spark):
    # ATR profile with two obvious calm points at bars 30 and 60
    rows = []
    for i in range(90):
        atr = 5.0
        if i in (30, 60):
            atr = 0.1
        rows.append(("X", T0 + timedelta(hours=i), atr))
    bars = spark.createDataFrame(rows, "symbol string, bar_ts timestamp, atr double")
    out = volatility_split(bars, n_windows=3, min_separation_bars=10).collect()
    assert len(out) == 3
    cuts = sorted(r["start_ts"] for r in out)[1:]
    assert cuts == [T0 + timedelta(hours=30), T0 + timedelta(hours=60)]


def test_file_index_and_coverage(spark, tmp_path):
    rows = [
        ("mt5", "EURUSD", T0 + timedelta(seconds=i), 1.08, 1.081) for i in range(100)
    ] + [("mt5", "USDJPY", T0 + timedelta(seconds=i), 150.0, 150.02) for i in range(50)]
    df = spark.createDataFrame(
        rows, "broker_type string, symbol string, timestamp timestamp, bid double, ask double"
    )
    df.write.partitionBy("broker_type", "symbol").parquet(str(tmp_path / "lake"))
    lake = spark.read.parquet(str(tmp_path / "lake"))
    idx = build_file_index(lake).cache()
    cov = {r["symbol"]: r for r in coverage(idx).collect()}
    assert cov["EURUSD"]["rows"] == 100
    assert cov["USDJPY"]["rows"] == 50
    assert cov["EURUSD"]["start_ts"] == T0
    rel = relevant_files(idx, T0, T0 + timedelta(seconds=10))
    assert rel.count() >= 1
    rq = range_query(lake, T0, T0 + timedelta(seconds=4), limit=3)
    assert rq.count() == 3  # cap applied


def test_compressed_codec_adapter_through_seam(spark):
    """Round-7 adapter proof: the decoder= seam of extract_features handles
    a genuinely COMPRESSED format end-to-end. The format here is
    zlib-deflated PPM ('ZPPM' magic + DEFLATE stream — real compression,
    stdlib-only since PIL is not in this container); the adapter
    decompresses then reuses the native PPM codec. Features must equal the
    uncompressed-PPM run exactly: the seam contract is 'any callable
    bytes -> (H, W, 3) uint8', and the Arrow batch plumbing is identical
    either way."""
    import zlib

    from finiextestingide_spark.operators.multimodal import decode_ppm, extract_features

    imgs = {i: _img(i, 6, 9) for i in range(1, 4)}
    plain = spark.createDataFrame(
        [(i, encode_ppm(im)) for i, im in imgs.items()], "media_id long, media binary"
    )
    packed = spark.createDataFrame(
        [(i, b"ZPPM" + zlib.compress(encode_ppm(im), 9)) for i, im in imgs.items()],
        "media_id long, media binary",
    )
    # the compressed payloads must actually be a different (smaller or at
    # least transformed) byte stream, or this proves nothing
    for (i, im) in imgs.items():
        assert b"ZPPM" + zlib.compress(encode_ppm(im), 9) != encode_ppm(im)

    def zppm_decoder(payload: bytes):
        if payload[:4] != b"ZPPM":
            raise ValueError("not a ZPPM payload")
        return decode_ppm(zlib.decompress(payload[4:]))

    base = {
        r["media_id"]: r
        for r in extract_features(plain, feature_dim=96).collect()
    }
    via_seam = {
        r["media_id"]: r
        for r in extract_features(packed, decoder=zppm_decoder, feature_dim=96).collect()
    }
    assert set(base) == set(via_seam) == set(imgs)
    for i in imgs:
        assert via_seam[i]["height"] == base[i]["height"] == 6
        assert via_seam[i]["width"] == base[i]["width"] == 9
        assert via_seam[i]["features"] == base[i]["features"]


def test_pil_codec_adapter_if_available(spark):
    """Conditional PIL proof (skips cleanly where PIL is absent): a real
    PNG encoded by PIL decodes through the same decoder= seam and yields
    pixel-identical features to the native-BMP run of the same image."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = _img(9, 8, 12)
    buf = io.BytesIO()
    PIL_Image.fromarray(img).save(buf, format="PNG")
    png_df = spark.createDataFrame(
        [(1, buf.getvalue())], "media_id long, media binary"
    )
    bmp_df = spark.createDataFrame(
        [(1, encode_bmp(img))], "media_id long, media binary"
    )

    def pil_decoder(payload: bytes):
        return np.asarray(PIL_Image.open(io.BytesIO(payload)).convert("RGB"))

    a = extract_features(png_df, decoder=pil_decoder, feature_dim=96).collect()[0]
    b = extract_features(bmp_df, feature_dim=96).collect()[0]
    assert a["features"] == b["features"]
    assert (a["height"], a["width"]) == (b["height"], b["width"]) == (8, 12)
