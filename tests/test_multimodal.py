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


class TestConsistencyGate:
    """F3 analog: magic-bytes sniff vs declared kind (file_helpers.py:15-50)."""

    def test_sniff_known_magics(self):
        from insurance_pdf_extractor_ray.pipelines.multimodal import sniff_media_kind

        assert sniff_media_kind(b"\x89PNG\r\n\x1a\nxxxx") == "image"
        assert sniff_media_kind(b"\xff\xd8\xff\xe0rest") == "image"
        assert sniff_media_kind(b"RIFFxxxxWAVE") == "audio"
        assert sniff_media_kind(b"\x00\x00\x00\x18ftypmp42") == "video"
        assert sniff_media_kind(b"plain text") == "unknown"
        assert sniff_media_kind(b"") == "unknown"

    def test_gate_flags_planted_mismatches(self, ray_session):
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            fake_assets_for_docs,
            media_consistency_gate,
            sniff_media_kind,
        )

        refs = [(f"doc-{i}", f"media://doc-{i}/0") for i in range(60)]
        assets = fake_assets_for_docs(refs, corrupt_frac=0.25)
        rows = media_consistency_gate(ray.data.from_arrow(assets)).take_all()
        bad = [r for r in rows if not r["kind_consistent"]]
        good = [r for r in rows if r["kind_consistent"]]
        assert bad and good  # both classes present
        for r in rows:  # the flag is exactly sniff-vs-declared
            assert r["kind_consistent"] == (r["sniffed_kind"] == r["kind"])
        # drop mode removes exactly the inconsistent rows
        kept = media_consistency_gate(ray.data.from_arrow(assets),
                                      keep_inconsistent=False).take_all()
        assert len(kept) == len(good)

    def test_clean_assets_all_consistent(self, ray_session):
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            fake_assets_for_docs,
            media_consistency_gate,
        )

        assets = fake_assets_for_docs([("d", "media://d/0"), ("e", "media://e/1")])
        rows = media_consistency_gate(ray.data.from_arrow(assets)).take_all()
        assert all(r["kind_consistent"] for r in rows)

    def test_gate_columns_flow_through_decode(self, ray_session):
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            decode_media,
            fake_assets_for_docs,
            media_consistency_gate,
        )

        assets = fake_assets_for_docs([("d", "media://d/0")], corrupt_frac=0.0)
        out = decode_media(media_consistency_gate(
            ray.data.from_arrow(assets))).take_all()
        assert out[0]["kind_consistent"] is True
        assert "sniffed_kind" in out[0]


class TestFrameSample:
    def _assets(self):
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            fake_assets_for_docs,
        )
        return fake_assets_for_docs(
            [("d", f"media://d/{i}") for i in range(30)])

    def test_explode_layout_and_determinism(self, ray_session):
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            frame_sample,
        )
        assets = self._assets()
        out = frame_sample(ray.data.from_arrow(assets),
                           every_ms=60_000, max_frames=5).take_all()
        assert len(out) > 0
        n_video = sum(1 for k in assets.column("kind").to_pylist()
                      if k == "video")
        refs = {r["media_ref"] for r in out}
        assert len(refs) == n_video            # every video sampled, only videos
        by_ref = {}
        for r in out:
            by_ref.setdefault(r["media_ref"], []).append(r)
        durs = dict(zip(assets.column("media_ref").to_pylist(),
                        assets.column("duration_ms").to_pylist()))
        for ref, rows in by_ref.items():
            rows.sort(key=lambda r: r["frame_idx"])
            want_n = min(5, -(-durs[ref] // 60_000))
            assert len(rows) == want_n
            assert [r["ts_ms"] for r in rows] == \
                [i * 60_000 for i in range(len(rows))]
            assert all(len(r["features"]) == 8 for r in rows)
        # deterministic + layout-independent
        again = frame_sample(ray.data.from_arrow(assets).repartition(4),
                             every_ms=60_000, max_frames=5).take_all()
        key = lambda r: (r["media_ref"], r["frame_idx"])
        a = sorted(((r["media_ref"], r["frame_idx"], r["ts_ms"],
                     tuple(r["features"])) for r in out))
        b = sorted(((r["media_ref"], r["frame_idx"], r["ts_ms"],
                     tuple(r["features"])) for r in again))
        assert a == b

    def test_real_decode_raises(self, ray_session):
        import pytest as _pytest
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            frame_sample,
        )
        ds = frame_sample(ray.data.from_arrow(self._assets()), use_fake=False)
        with _pytest.raises(Exception):
            ds.take_all()
