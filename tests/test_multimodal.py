"""Multimodal plumbing tests: schema, batch shapes, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.multimodal import (
    N_FEATURES,
    assets_from_documents,
    decode_asset,
    extract_features,
    frame_sample,
)

SF = "/root/testdata/sf0.001"


def test_decode_codec_seam():
    from building_permissions_etl_spark.operators import multimodal as M

    # this container has neither PIL nor librosa
    assert M.available_codecs() == {}
    # fake=False REQUIRES a real codec → honest error here
    with pytest.raises(NotImplementedError):
        decode_asset(b"abc", "image", fake=False)
    # pinned stub and auto (no codec present → stub) agree
    stub = decode_asset(b"abc", "image", fake=True)
    assert len(stub) == N_FEATURES
    assert decode_asset(b"abc", "image") == stub          # fake=None auto


def test_decode_auto_uses_real_codec_when_importable(monkeypatch):
    """Driver-side auto-detect: with a PIL stand-in importable, auto mode
    must route images through it instead of the byte stub."""
    import io
    import sys
    import types

    from building_permissions_etl_spark.operators import multimodal as M

    class _Img:
        def convert(self, mode):
            return self

        def histogram(self):
            return [1] * 256          # uniform → every folded bucket equal

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = lambda b: _Img()
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    assert M.available_codecs().get("image") == "PIL"
    got = M.decode_asset(b"pretend-png-bytes", "image")   # auto
    assert got == [0.125] * M.N_FEATURES                  # real-codec branch
    # pinned stub still bypasses the codec
    assert M.decode_asset(b"pretend-png-bytes", "image", fake=True) != got
    # audio has no codec → auto falls back to the stub
    assert M.decode_asset(b"xy", "audio") == M.decode_asset(b"xy", "audio",
                                                            fake=True)


def test_extract_features_decoder_injection(spark):
    """The mapInPandas path's real-codec branch, exercised via the
    self-contained decoder seam (no media lib needed)."""
    assets = assets_from_documents(load_table(spark, "documents", SF))

    def decoder(payload):
        return [float(len(payload) % 7)] * 8

    rows = extract_features(assets, decoder=decoder).collect()
    assert all(r.features == [float(r.n_bytes % 7)] * 8 for r in rows)
    # fake=True wins over an injected decoder's absence: stub everywhere
    stub_rows = extract_features(assets, fake=True).collect()
    assert all(abs(sum(r.features) - 1.0) < 1e-3 for r in stub_rows)


def test_assets_schema(spark):
    assets = assets_from_documents(load_table(spark, "documents", SF))
    assert dict(assets.dtypes)["payload"] == "binary"
    kinds = {r.kind for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_batches(spark):
    assets = assets_from_documents(load_table(spark, "documents", SF))
    feats = extract_features(assets, fake=True)
    rows = feats.collect()
    assert len(rows) == assets.count()
    r = rows[0]
    assert len(r.features) == N_FEATURES
    assert abs(sum(r.features) - 1.0) < 1e-3      # histogram normalized
    assert r.n_bytes > 0


def test_frame_sample_shape(spark):
    assets = assets_from_documents(load_table(spark, "documents", SF))
    frames = frame_sample(assets, every_n_bytes=64, max_frames=4)
    agg = frames.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(1 <= r.n <= 4 for r in agg)
    one = frames.first()
    assert isinstance(one.frame_bytes, (bytes, bytearray))
    assert len(one.frame_bytes) <= 64


def test_resize_assets_shrinks_payload(spark):
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.multimodal import (
        assets_from_documents,
        resize_assets,
    )
    from pyspark.sql import functions as F

    assets = assets_from_documents(
        load_table(spark, "documents", "/root/testdata/sf0.001")
    )
    resized = resize_assets(assets, target_w=8, target_h=8)
    joined = (
        assets.select("asset_id", F.length("payload").alias("before"))
        .join(resized.select("asset_id", F.length("payload").alias("after"),
                             "width", "height"), "asset_id")
    )
    row = joined.agg(
        F.count(F.when(F.col("after") > F.col("before"), 1)).alias("grew"),
        F.max("width").alias("mw"), F.max("height").alias("mh"),
    ).first()
    assert row["grew"] == 0          # striding never grows a payload
    assert row["mw"] <= 8 and row["mh"] <= 8
    assert resized.count() == assets.count()


def test_metadata_query_never_reads_payload(spark, tmp_path):
    """Column pruning must reach the parquet scan: a metadata-only query
    over the assets table reads width/height, never the binary payload."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.multimodal import assets_from_documents
    from pyspark.sql import functions as F

    path = str(tmp_path / "assets")
    assets_from_documents(
        load_table(spark, "documents", "/root/testdata/sf0.001")
    ).write.parquet(path)
    q = (
        spark.read.parquet(path)
        .groupBy("kind")
        .agg(F.avg("width").alias("w"), F.avg("height").alias("h"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("payload" not in s for s in schemas), plan


def test_auto_mode_never_crashes_on_null_or_corrupt_payload(spark):
    """Auto codec mode must degrade to the stub on a null or undecodable
    payload instead of failing the task — a pipeline that ran clean
    without a codec library must not start crashing when one appears."""
    from building_permissions_etl_spark.operators.multimodal import (
        decode_asset,
        extract_features,
    )

    # driver-side: auto mode with no usable codec → stub for any kind
    assert decode_asset(None, "audio", fake=None) == [0.0] * 8
    assert decode_asset(b"", "image", fake=None) == [0.0] * 8

    # executor-side: an injected real decoder that rejects bad payloads
    def strict_decoder(payload):
        if payload is None or payload[:2] != b"OK":
            raise ValueError("undecodable")
        return [1.0] * 8

    rows = [(1, "image", bytearray(b"OK-payload")),
            (2, "image", None),
            (3, "image", bytearray(b"garbage"))]
    df = spark.createDataFrame(rows, "asset_id long, kind string, payload binary")
    got = {r["asset_id"]: r["features"]
           for r in extract_features(df, fake=None,
                                     decoder=strict_decoder).collect()}
    assert got[1] == [1.0] * 8            # real decode used
    assert got[2] == [0.0] * 8            # null → stub zeros
    assert len(got[3]) == 8 and got[3] != [1.0] * 8  # corrupt → stub stats

    # fake=False keeps the honest hard failure
    import pytest as _pytest

    with _pytest.raises(Exception):
        extract_features(
            df.filter("asset_id = 2"), fake=False, decoder=strict_decoder
        ).collect()


def test_decode_auto_uses_audio_codec_when_importable(monkeypatch):
    """With a librosa stand-in importable, auto mode must route audio
    through the wired energy-histogram featureizer (same N_FEATURES /
    truncate-at-6-decimals contract as the stub) instead of the byte
    stub; fake=True still pins the stub."""
    import sys
    import types

    import numpy as np

    from building_permissions_etl_spark.operators import multimodal as M

    lib = types.ModuleType("librosa")
    # 2*N_FEATURES samples, energy concentrated in the first half
    wave = np.array([2.0] * M.N_FEATURES + [1.0] * M.N_FEATURES)
    lib.load = lambda b, sr=None, mono=True: (wave, 16000)
    monkeypatch.setitem(sys.modules, "librosa", lib)

    assert M.available_codecs().get("audio") == "librosa"
    got = M.decode_asset(b"pretend-wav-bytes", "audio")   # auto
    assert len(got) == M.N_FEATURES
    # squared energy 4 vs 1 per slice → first half buckets 3x the rest
    hi, lo = got[0], got[-1]
    assert hi > lo > 0
    assert abs(hi / lo - 4.0) < 1e-5
    assert sum(got) <= 1.0 + 1e-9                         # normalized
    assert all(x == int(x * 1e6) / 1e6 for x in got)      # truncated
    # pinned stub still bypasses the codec
    assert M.decode_asset(b"pretend-wav-bytes", "audio", fake=True) != got
    # empty waveform → zeros, not a crash
    lib.load = lambda b, sr=None, mono=True: (np.array([]), 16000)
    assert M.decode_asset(b"x", "audio") == [0.0] * M.N_FEATURES


def test_dedup_assets_exact_by_content(spark):
    from building_permissions_etl_spark.operators.multimodal import (
        dedup_assets_exact,
    )

    rows = [
        (1, bytearray(b"aaa")), (2, bytearray(b"bbb")),
        (3, bytearray(b"aaa")),                     # dup of 1
        (4, None), (5, None),                       # NULL payload group
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    surv = sorted(r["asset_id"]
                  for r in dedup_assets_exact(df).collect())
    assert surv == [1, 2, 4]


def test_decode_auto_uses_video_codec_when_importable(monkeypatch):
    """With a PyAV stand-in importable, auto mode must route video
    through the frame-luma featureizer (same N_FEATURES / truncation
    contract); fake=True still pins the stub; zero frames → zeros."""
    import sys
    import types

    import numpy as np

    from building_permissions_etl_spark.operators import multimodal as M

    class _Frame:
        def __init__(self, v):
            self._v = v

        def to_ndarray(self, format="gray"):
            return np.full((4, 4), self._v)

    class _Container:
        def __init__(self, vals):
            self._vals = vals

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video=0):
            return iter(_Frame(v) for v in self._vals)

    lib = types.ModuleType("av")
    # 2*N_FEATURES frames ramping 1..16 → sampled lumas strictly increase
    lib.open = lambda b: _Container(list(range(1, 2 * M.N_FEATURES + 1)))
    monkeypatch.setitem(sys.modules, "av", lib)

    assert M.available_codecs().get("video") == "av"
    got = M.decode_asset(b"pretend-mp4-bytes", "video")   # auto
    assert len(got) == M.N_FEATURES
    assert got == sorted(got) and got[0] < got[-1]        # ramp preserved
    assert sum(got) <= 1.0 + 1e-9
    assert all(x == int(x * 1e6) / 1e6 for x in got)
    assert M.decode_asset(b"pretend-mp4-bytes", "video", fake=True) != got
    lib.open = lambda b: _Container([])
    assert M.decode_asset(b"x", "video") == [0.0] * M.N_FEATURES
