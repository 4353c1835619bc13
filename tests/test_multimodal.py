"""Multimodal plumbing: fake-mode Spark round-trips (schema + determinism)
and the PIL-optional real decode path (r4 verdict #6) — the env ships no
Pillow, so the real path is exercised at the pandas-batch level with an
injected fake PIL module implementing the API surface the code uses; the
schemas must be identical across modes and the no-PIL case must raise
loudly."""

import hashlib
import sys
import types

import pandas as pd
import pytest

from tika_xapian_spark.operators import multimodal as M


PAYLOADS = [
    (1, b"\x89PNG\r\n\x1a\n" + bytes(range(200))),
    (2, b"\xff\xd8\xff\xe0" + bytes(200 - i for i in range(1, 150))),
    (3, b"plain bytes " * 10),
]


class _FakeImg:
    """Just enough of PIL.Image.Image: convert/resize/tobytes/size."""

    def __init__(self, data: bytes, size=(16, 16)):
        self._data = data
        self.size = size

    def convert(self, mode):
        assert mode == "L"
        return self

    def resize(self, wh):
        w, h = wh
        # deterministic "resample": md5-stretch the payload to w*h bytes
        out = b""
        seed = self._data
        while len(out) < w * h:
            seed = hashlib.md5(seed).digest()
            out += seed
        return _FakeImg(out[: w * h], size=wh)

    def tobytes(self):
        # grayscale body = the raw data (bounded)
        return self._data[:256]


def _install_fake_pil(monkeypatch):
    mod = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    def open_(fp):
        return _FakeImg(fp.read())

    image_mod.open = open_
    mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


class TestFakeModeSpark:
    def test_metadata_schema_and_magic(self, spark):
        df = spark.createDataFrame(PAYLOADS, "doc_id long, payload binary")
        out = M.binary_metadata(df, "doc_id", "payload")
        rows = {r["doc"]: r for r in out.collect()}
        assert out.columns == ["doc", "n_bytes", "md5_hex", "magic"]
        assert rows[1]["magic"] == "png"
        assert rows[2]["magic"] == "jpeg"
        assert rows[3]["magic"] == "bin"
        for d, b in PAYLOADS:
            assert rows[d]["n_bytes"] == len(b)
            assert rows[d]["md5_hex"] == hashlib.md5(b).hexdigest()

    def test_fake_features_deterministic(self, spark):
        df = spark.createDataFrame(PAYLOADS, "doc_id long, payload binary")
        out = {r["doc"]: r["features"] for r in M.extract_features(df, "doc_id", "payload").collect()}
        for d, b in PAYLOADS:
            assert out[d] == pytest.approx(M.fake_features(b))

    def test_resize_fake_mode(self, spark):
        df = spark.createDataFrame(PAYLOADS, "doc_id long, payload binary")
        out = M.resize_image(df, "doc_id", "payload", width=4, height=4)
        rows = {r["doc"]: r for r in out.collect()}
        for d, b in PAYLOADS:
            assert rows[d]["resized_md5"] == hashlib.md5(b + b":4x4").hexdigest()
            assert rows[d]["n_bytes"] == 16


class TestRealDecodePath:
    def test_no_pil_raises_loudly(self):
        assert not M.has_pil()
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.decode_image(b"\x89PNG....")

    def test_real_features_with_injected_pil(self, monkeypatch):
        _install_fake_pil(monkeypatch)
        assert M.has_pil()
        pdf = pd.DataFrame({"doc_id": [d for d, _ in PAYLOADS],
                            "payload": [b for _, b in PAYLOADS]})
        out = M.features_batch(pdf, "doc_id", "payload", use_fake=False)
        fake = M.features_batch(pdf, "doc_id", "payload", use_fake=True)
        # identical schema across modes; real histograms are normalized
        assert list(out.columns) == list(fake.columns)
        for feats in out["features"]:
            assert len(feats) == M.FEATURE_DIM
            assert sum(feats) == pytest.approx(1.0)

    def test_real_resize_with_injected_pil(self, monkeypatch):
        _install_fake_pil(monkeypatch)
        pdf = pd.DataFrame({"doc_id": [d for d, _ in PAYLOADS],
                            "payload": [b for _, b in PAYLOADS]})
        out = M.resize_batch(pdf, "doc_id", "payload", 4, 4, use_fake=False)
        fake = M.resize_batch(pdf, "doc_id", "payload", 4, 4, use_fake=True)
        assert list(out.columns) == list(fake.columns)
        assert (out["n_bytes"] == 16).all()
        # real-mode fingerprints the RESIZED pixels, not the raw payload
        assert (out["resized_md5"] != fake["resized_md5"]).all()
        # deterministic given the decoder
        again = M.resize_batch(pdf, "doc_id", "payload", 4, 4, use_fake=False)
        assert (out["resized_md5"] == again["resized_md5"]).all()


class TestAudioWindows:
    def test_overlap_and_full_window_cutoff(self, spark):
        """48-byte payload at 800 Hz = 24 samples: windows of 20 samples at
        hop 8 fit at k=0 only (8+20=28 > 24); 64 bytes = 32 samples fits
        k=0 and k=1, and the two windows OVERLAP (bytes 16..56 vs 0..40)."""
        import hashlib

        from tika_xapian_spark.operators.multimodal import window_audio

        b48, b64 = bytes(range(48)), bytes(range(64))
        df = spark.createDataFrame(
            [(1, b48), (2, b64)], "doc_id long, payload binary"
        )
        got = {
            (r.doc, r.win_idx): (r.start_ms, r.end_ms, r.window_md5)
            for r in window_audio(
                df, key="doc_id", payload_col="payload", sample_rate=800
            ).collect()
        }
        assert set(got) == {(1, 0), (2, 0), (2, 1)}
        assert got[(2, 0)] == (0, 25, hashlib.md5(b64[0:40]).hexdigest())
        assert got[(2, 1)] == (10, 35, hashlib.md5(b64[16:56]).hexdigest())

    def test_real_decode_path_raises_honestly(self, spark):
        from tika_xapian_spark.operators.multimodal import window_audio

        df = spark.createDataFrame([(1, bytes(64))], "doc_id long, payload binary")
        out = window_audio(
            df, key="doc_id", payload_col="payload", sample_rate=800,
            use_fake=False,
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="audio decode requires"):
            out.collect()

    def test_degenerate_hop_raises_at_plan_time(self, spark):
        import pytest as _pytest

        from tika_xapian_spark.operators.multimodal import window_audio

        df = spark.createDataFrame([(1, bytes(64))], "doc_id long, payload binary")
        with _pytest.raises(ValueError, match="hop"):
            window_audio(df, key="doc_id", payload_col="payload", sample_rate=50)
