"""Multimodal plumbing invariants (schemas, batch shapes, stub decode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators import multimodal as mm
from sfcrimedatapipeline_spark.sources.tables import read_table

SF_DIR = "/root/testdata/sf0.001"


def _media(spark):
    return mm.synthesize_media(read_table(spark, SF_DIR, "documents"))


def test_media_types_partition_docs(spark):
    media = _media(spark)
    counts = {r["media_type"]: r["n"] for r in media.groupBy("media_type").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(mm.MEDIA_TYPES)
    assert sum(counts.values()) == media.count()


def test_image_features_match_payload_bytes(spark):
    media = _media(spark).cache()
    feats = {r["doc_id"]: r for r in mm.image_features(media).collect()}
    rows = media.filter("media_type = 'image'").select("doc_id", "payload").collect()
    assert feats and len(feats) == len(rows)
    for r in rows:
        buf = bytes(r["payload"])
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == len(buf)
        assert f["byte_sum"] == sum(buf)
        if buf:
            assert f["byte_min"] == min(buf) and f["byte_max"] == max(buf)
    media.unpersist()


def test_frame_sampling_slices_and_strides(spark):
    media = _media(spark)
    frames = mm.sample_frames(media, frame_size=16, stride=2).collect()
    assert frames
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'video'").collect()
    }
    for fr in frames:
        assert fr["frame_idx"] % 2 == 0
        buf = payloads[fr["doc_id"]]
        expected = buf[fr["frame_idx"] * 16 : (fr["frame_idx"] + 1) * 16]
        assert bytes(fr["frame"]) == expected
        assert fr["frame_hex"] == expected.hex().upper()
        assert len(fr["frame"]) == 16  # only complete frames are emitted


def test_resize_fake_pads_and_truncates(spark):
    resized = mm.resize_images(_media(spark), width=8, height=8).collect()
    assert resized
    for r in resized:
        assert len(bytes(r["resized"])) == 64
        assert (r["width"], r["height"]) == (8, 8)


def test_resize_pil_branch(monkeypatch):
    """The PIL path must actually run where PIL is importable (round-1
    regression: it raised NotImplementedError precisely when PIL
    existed). Exercised via the module-level kernel with a minimal
    PIL.Image stand-in when the real library is absent."""
    import sys
    import types

    try:
        import PIL  # noqa: F401
    except ImportError:
        class _Img:
            def __init__(self, data, size):
                self.data, self.size = data, size

            def resize(self, size, resample):
                w, h = size
                return _Img(self.data[: w * h].ljust(w * h, b"\x00"), size)

            def tobytes(self):
                return self.data

        image_mod = types.SimpleNamespace(
            frombytes=lambda mode, size, data: _Img(data, size),
            NEAREST=0,
        )
        pil_mod = types.ModuleType("PIL")
        pil_mod.Image = image_mod
        monkeypatch.setitem(sys.modules, "PIL", pil_mod)

    out = mm._resize_payload(bytes(range(100)), 4, 4)
    assert isinstance(out, bytes) and len(out) == 16
    assert mm._resize_payload(b"", 4, 4) == b"\x00" * 16


def test_audio_features_matches_local_recompute(spark):
    """Signed-int8 sample interpretation + exact square-sum RMS,
    recomputed locally with hashlib-free arithmetic."""
    import math

    from sfcrimedatapipeline_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "abcé"), (4, ""), (7, "zz")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in mm.audio_features(mm.synthesize_media(docs)).collect()
    }
    assert set(out) == {1, 4, 7}  # doc_id % 3 == 1 → all three
    for doc_id, text in [(1, "abcé"), (4, ""), (7, "zz")]:
        raw = text.encode()
        samples = [b - 256 if b > 127 else b for b in raw]
        r = out[doc_id]
        assert r.n_samples == len(samples)
        assert r.duration_s == len(samples) / 16000
        assert r.peak == (max(abs(s) for s in samples) if samples else 0)
        want_rms = (
            round(math.sqrt(sum(s * s for s in samples) / len(samples)), 6)
            if samples else 0.0
        )
        assert r.rms == want_rms
