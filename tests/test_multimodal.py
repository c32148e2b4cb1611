"""Multimodal plumbing tests: schemas, actor-pool stages, stub codec
contract (real formats raise NotImplementedError; fake decodes
deterministically)."""

import numpy as np
import pytest

from engine import multimodal


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_synth_schema_and_determinism(ray_session, sf_dir):
    a = multimodal.synth_media_from_documents(sf_dir).take_all()
    b = multimodal.synth_media_from_documents(sf_dir).take_all()
    key = lambda r: r["media_id"]
    assert sorted(a, key=key) == sorted(b, key=key)
    r = a[0]
    assert set(r) == {"media_id", "kind", "format", "nbytes", "payload"}
    assert r["payload"][:4] == b"FAKE"
    assert r["nbytes"] == len(r["payload"])
    kinds = {x["kind"] for x in a}
    assert kinds == {"image", "video"}


def test_decode_stage(ray_session, sf_dir):
    rows = multimodal.media_pipeline(sf_dir, "decode").take_all()
    assert len(rows) == 500
    for r in rows[:50]:
        assert 8 <= r["width"] <= 16 and 8 <= r["height"] <= 14
        assert r["n_frames"] in (1, 4)
        assert (r["kind"] == "video") == (r["n_frames"] == 4)


def test_features_stage(ray_session, sf_dir):
    rows = multimodal.media_pipeline(sf_dir, "features").take_all()
    for r in rows[:20]:
        v = np.asarray(r["features"], dtype=np.float64)
        assert v.shape == (multimodal.FEATURES_DIM,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3


def test_frame_sampling(ray_session, sf_dir):
    rows = multimodal.media_pipeline(sf_dir, "frames").take_all()
    by_media: dict[int, list[int]] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_media.items():
        assert sorted(idxs) in ([0], [0, 2])  # stride-2 over 1 or 4 frames


def test_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        multimodal.Codec().decode("tga", b"FAKE" + b"\0" * 16)


def test_codec_capability_gating(monkeypatch):
    """Real formats register iff their library imports: with a stubbed
    PIL in sys.modules the png decoder appears and decodes through it;
    without one, png raises NotImplementedError naming the registry."""
    import sys
    import types

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        c = multimodal.Codec()
        assert "png" not in c.formats and "fake" in c.formats
        with pytest.raises(NotImplementedError, match="png"):
            c.decode("png", b"\x89PNG")

    class _FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return np.arange(12, dtype=np.uint8).reshape(3, 4)

    fake_image_mod = types.SimpleNamespace(open=lambda buf: _FakeImg())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    c = multimodal.Codec()
    assert "png" in c.formats and "jpeg" in c.formats
    w, h, n, frames = c.decode("png", b"anything")
    assert (w, h, n) == (4, 3, 1)
    assert frames.shape == (1, 3, 4)
    # video formats still ungated (no cv2 stub)
    if "mp4" not in c.formats:
        with pytest.raises(NotImplementedError):
            c.decode("mp4", b"x")
