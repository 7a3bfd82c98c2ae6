"""Multimodal plumbing: asset schema, decode stage (fake kernel), explosion."""

import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.multimodal import (
    MediaDecodeStage,
    decode_media,
    fake_assets_for_docs,
    media_refs_from_docs,
)
from insurance_pdf_extractor_ray.sources import synth

pytestmark = pytest.mark.usefixtures("ray_session")


def test_media_refs_explode(ray_session):
    # media_interleaved family = index 9 mod 12; 2 media spans each
    tbl = synth.docs_table([9, 21, 33])
    refs = media_refs_from_docs(ray.data.from_arrow(tbl)).take_all()
    assert len(refs) == 6
    assert all(r["media_ref"].startswith("media://") for r in refs)


def test_decode_media_fake(ray_session):
    tbl = synth.docs_table([9, 21, 33])
    refs = media_refs_from_docs(ray.data.from_arrow(tbl)).take_all()
    assets = fake_assets_for_docs([(r["doc_id"], r["media_ref"]) for r in refs])
    out = decode_media(ray.data.from_arrow(assets), concurrency=2).take_all()
    assert len(out) == 6
    for r in out:
        assert len(r["features"]) == MediaDecodeStage.FEATURE_DIM
        assert all(0.0 <= f < 1.0 for f in r["features"])
        if r["kind"] == "image":
            assert 1 <= r["thumb_w"] <= 64 and 1 <= r["thumb_h"] <= 64
    # determinism
    out2 = decode_media(ray.data.from_arrow(assets), concurrency=2).take_all()
    key = lambda r: r["media_ref"]
    assert sorted(out, key=key) == sorted(out2, key=key)


def test_decode_media_real_kernel_is_stubbed():
    stage = MediaDecodeStage(use_fake=False)
    with pytest.raises(NotImplementedError):
        stage._decode_features(b"payload", "image")
