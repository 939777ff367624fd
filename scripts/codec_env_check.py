"""Exercise the REAL multimodal codec branches (PIL / librosa / PyAV)
in an environment that has them installed — the one check the grading
container cannot run (those libraries are absent there, so the real
branches of ``operators/multimodal.py`` are import-gated and their unit
tests skip).

Run from a venv with any subset of the optional deps:

    python -m venv /tmp/codecenv && . /tmp/codecenv/bin/activate
    pip install pillow librosa av            # any subset works
    pip install -e .                         # or PYTHONPATH=.
    python scripts/codec_env_check.py

For each importable codec the script synthesizes a small REAL asset of
that kind (a PNG via PIL, a WAV via the stdlib ``wave`` module, an MP4
via PyAV), pushes it through ``decode_asset(..., fake=False)`` — the
strict mode that raises rather than silently substituting the stub —
and checks the contract the stubbed pipeline pins:

  * the feature vector has the documented arity (``N_FEATURES`` = 8
    doubles);
  * every value is round-trip stable at 6 decimals (the truncate law
    the SQL value-checks assert for the stub path);
  * two runs over the same payload are bit-identical (determinism);
  * the mapInPandas plumbing (``extract_features(assets, fake=False)``)
    produces the same vector as the direct call — i.e. the Arrow batch
    path and the scalar path agree.

Exit code 0 = every available codec passed; the per-codec PASS/SKIP
lines are the artifact to record in SCALE.md (VERDICT r05 item 3).
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from building_permissions_etl_spark.operators import multimodal as M  # noqa: E402


def _png_payload() -> bytes:
    from PIL import Image

    img = Image.new("RGB", (17, 11))
    px = img.load()
    for x in range(17):
        for y in range(11):
            px[x, y] = ((x * 37) % 256, (y * 91) % 256, (x * y) % 256)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _wav_payload() -> bytes:
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        frames = b"".join(
            struct.pack("<h", int(12000 * math.sin(2 * math.pi * 440 * i / 8000)))
            for i in range(1600)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _mp4_payload() -> bytes:
    import av
    import numpy as np

    buf = io.BytesIO()
    out = av.open(buf, "w", format="mp4")
    stream = out.add_stream("h264", rate=4)
    stream.width, stream.height = 32, 32
    for i in range(8):
        arr = ((np.arange(32 * 32 * 3) * (i + 1)) % 255).astype("uint8")
        frame = av.VideoFrame.from_ndarray(arr.reshape(32, 32, 3), format="rgb24")
        for pkt in stream.encode(frame):
            out.mux(pkt)
    for pkt in stream.encode():
        out.mux(pkt)
    out.close()
    return buf.getvalue()


_SYNTH = {"image": _png_payload, "audio": _wav_payload, "video": _mp4_payload}


def main() -> int:
    codecs = M.available_codecs()
    print(f"available codecs: {codecs or '(none)'}")
    failures = 0
    ran = 0
    for kind, synth in _SYNTH.items():
        if kind not in codecs:
            print(f"SKIP  {kind}: codec library not importable here")
            continue
        payload = synth()
        feats = M.decode_asset(payload, kind, fake=False)
        again = M.decode_asset(payload, kind, fake=False)
        ok = (
            isinstance(feats, list)
            and len(feats) == M.N_FEATURES
            and all(isinstance(v, float) for v in feats)
            and all(round(v, 6) == v for v in feats)
            and feats == again
        )
        # Arrow-batch path must agree with the scalar path
        try:
            from pyspark.sql import SparkSession

            spark = (SparkSession.builder.master("local[2]")
                     .config("spark.ui.enabled", "false").getOrCreate())
            assets = spark.createDataFrame(
                [(1, kind, bytearray(payload))],
                "asset_id long, kind string, payload binary",
            )
            row = M.extract_features(assets, fake=False).collect()[0]
            ok = ok and list(row["features"]) == feats
        except Exception as ex:  # plumbing failure IS a failure
            print(f"      {kind}: mapInPandas path error: {ex}")
            ok = False
        ran += 1
        if ok:
            print(f"PASS  {kind}: real decode, 8-float truncate-stable "
                  f"deterministic vector; Arrow path agrees")
        else:
            failures += 1
            print(f"FAIL  {kind}: {feats!r}")
    if ran == 0:
        print("NO CODECS AVAILABLE — run from an env with "
              "pillow/librosa/av installed (see module docstring)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
