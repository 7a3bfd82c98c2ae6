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


def test_decode_media_real_kernel_on_fake_payload_tags_not_ok():
    # a legacy fake payload (magic + random bytes) is not a decodable codec
    # stream: real mode tags it decode_ok=False instead of raising
    stage = MediaDecodeStage(use_fake=False)
    ok, kind, w, h, dur, feats, tw, th = stage._decode_real(
        b"\x89PNG\r\n\x1a\n" + b"garbage" * 10)
    assert not ok and kind == "image" and list(feats) == [0.0] * 8


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

    def test_real_mode_on_fake_assets_emits_nothing(self, ray_session):
        # legacy fake payloads aren't real containers: the real sampler
        # skips every clip (mp4-magic payloads aren't AVI) without raising
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            frame_sample,
        )
        out = frame_sample(ray.data.from_arrow(self._assets()),
                           use_fake=False).take_all()
        assert out == []


class TestRealCodecs:
    """Real-codec path: PNG/WAV/AVI assets, decode + frame-sample verified
    against first-principles goldens computed from the SOURCE arrays."""

    REFS = [(f"doc-{i}", f"media://doc-{i}/0") for i in range(40)]

    def test_decode_matches_golden(self, ray_session):
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.goldencheck import golden_diff
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            decode_digests,
            decode_media,
            media_consistency_gate,
            media_decode_golden,
            real_assets_for_docs,
        )

        assets = real_assets_for_docs(self.REFS, mismatch_frac=0.15,
                                      corrupt_frac=0.15)
        got = decode_digests(decode_media(
            media_consistency_gate(ray.data.from_arrow(assets)),
            use_fake=False))
        want = media_decode_golden(self.REFS, mismatch_frac=0.15,
                                   corrupt_frac=0.15)
        diff = golden_diff(got, ray.data.from_arrow(want),
                           key="media_ref").take_all()
        assert diff == []

    def test_planted_classes_all_present(self, ray_session):
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            media_decode_golden,
        )
        digs = media_decode_golden(self.REFS, mismatch_frac=0.15,
                                   corrupt_frac=0.15).column("decode_digest").to_pylist()
        assert any(d == "!corrupt" for d in digs)
        assert any("|c0|" in d for d in digs)       # mislabeled kinds flagged
        assert any("|c1|" in d for d in digs)
        for kind in ("image", "audio", "video"):
            assert any(d.startswith(kind + "|") for d in digs)

    def test_frame_sample_matches_golden(self, ray_session):
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.goldencheck import golden_diff
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            frame_digests,
            frame_sample,
            frame_sample_golden,
            real_assets_for_docs,
        )

        assets = real_assets_for_docs(self.REFS)
        got = frame_digests(frame_sample(ray.data.from_arrow(assets),
                                         use_fake=False, every_ms=500,
                                         max_frames=6))
        want = frame_sample_golden(self.REFS, every_ms=500, max_frames=6)
        assert want.num_rows > 0
        diff = golden_diff(got, ray.data.from_arrow(want),
                           key="media_ref").take_all()
        assert diff == []

    def test_corrupt_payloads_fail_structurally(self):
        # the planted corruption must break DECODE, never silently alter
        # data (RIFF formats have no checksum — see _corrupt)
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            MediaDecodeStage,
            _asset_spec,
            _corrupt,
            _spec_payload,
        )
        stage = MediaDecodeStage(use_fake=False)
        seen = set()
        for i in range(30):
            ref = f"media://c-{i}/0"
            spec = _asset_spec(ref, 42)
            payload = _corrupt(_spec_payload(spec), ref, 42, spec["kind"])
            ok = stage._decode_real(payload)[0]
            assert not ok, (ref, spec["kind"])
            seen.add(spec["kind"])
        assert seen == {"image", "audio", "video"}


class TestAudioFeatures:
    """audio_features: real WAV decode -> spectral/energy features."""

    REFS = [(f"doc_{i}", f"media/audio_test_{i}.bin") for i in range(40)]

    def test_stage_matches_source_golden_bit_exact(self, ray_session):
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            audio_features, audio_features_golden, real_assets_for_docs)

        assets = real_assets_for_docs(self.REFS)
        got = sorted(audio_features(ray.data.from_arrow(assets)).take_all(),
                     key=lambda r: r["media_ref"])
        want = audio_features_golden(self.REFS).to_pylist()
        assert len(want) > 0  # the 40-ref pool must contain audio assets
        assert got == want

    def test_dominant_freq_recovers_planted_sine(self, ray_session):
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            _asset_spec, audio_features, real_assets_for_docs)

        assets = real_assets_for_docs(self.REFS)
        rows = audio_features(ray.data.from_arrow(assets)).take_all()
        checked = 0
        for r in rows:
            spec = _asset_spec(r["media_ref"], 42)
            assert spec["kind"] == "audio"
            # synth plants a sine at an integer frequency; the FFT-argmax
            # estimate must land within one bin (rate/n) of it
            n, rate = r["n_samples"], r["rate"]
            est_hz = r["dom_freq_q9"] / 1e9
            planted = None
            # recover the planted freq by regenerating the spec's RNG draw
            import hashlib
            import numpy as np
            h = hashlib.blake2b(f"42:{r['media_ref']}".encode(),
                                digest_size=8).digest()
            rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
            assert ["image", "audio", "video"][rng.randint(0, 3)] == "audio"
            rng.randint(800, 8000)  # n (already known)
            planted = float(rng.randint(100, 2000))
            assert abs(est_hz - planted) <= rate / n + 1e-9
            checked += 1
        assert checked > 0

    def test_non_audio_and_corrupt_payloads_are_skipped(self, ray_session):
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            audio_features, real_assets_for_docs)

        assets = real_assets_for_docs(self.REFS, mismatch_frac=0.5,
                                      corrupt_frac=0.3)
        rows = audio_features(ray.data.from_arrow(assets)).take_all()
        clean = real_assets_for_docs(self.REFS)
        n_audio_clean = sum(1 for r in clean.to_pylist()
                            if r["kind"] == "audio")
        # corruption knocks some audio out; mislabels must never let a
        # PNG/AVI payload through the WAV parser
        assert 0 < len(rows) <= n_audio_clean
        for r in rows:
            assert r["rate"] == 16000


class TestSceneCuts:
    """scene_cuts: real AVI decode -> inter-frame-difference cut detection."""

    REFS = [(f"doc_{i}", f"media/video_test_{i}.bin") for i in range(60)]

    def test_controlled_scenes_cut_exactly_at_boundary(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from insurance_pdf_extractor_ray.functions import codecs
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            ASSET_SCHEMA, scene_cuts)

        # two static 4-frame scenes (gray 10 then gray 200): exactly one
        # cut at frame index 4; within-scene diffs are 0
        a = np.full((4, 8, 8, 3), 10, np.uint8)
        b = np.full((4, 8, 8, 3), 200, np.uint8)
        payload = codecs.encode_avi(np.concatenate([a, b]), fps=5)
        assets = pa.table({
            "media_ref": pa.array(["clip"], pa.string()),
            "doc_id": pa.array(["d0"], pa.string()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([payload], pa.binary()),
            "mime": pa.array(["video/x-msvideo"], pa.string()),
            "width": pa.array([8], pa.int32()),
            "height": pa.array([8], pa.int32()),
            "duration_ms": pa.array([1600], pa.int32()),
        }, schema=ASSET_SCHEMA)
        rows = scene_cuts(ray.data.from_arrow(assets)).take_all()
        assert len(rows) == 1
        r = rows[0]
        assert r["n_frames"] == 8 and r["fps_q3"] == 5000
        assert r["n_cuts"] == 1 and r["cuts"] == "4"
        diffs = [int(x) for x in r["diffs_q3"].split(",")]
        assert diffs == [0, 0, 0, 190000, 0, 0, 0]

    def test_stage_matches_source_golden_bit_exact(self, ray_session):
        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            real_assets_for_docs, scene_cuts, scene_cuts_golden)

        assets = real_assets_for_docs(self.REFS)
        got = sorted(scene_cuts(ray.data.from_arrow(assets)).take_all(),
                     key=lambda r: r["media_ref"])
        want = scene_cuts_golden(self.REFS).to_pylist()
        assert len(want) > 0
        assert got == want


class TestVideoNearDup:
    """near_dup_video_groups: K-frame dHash signatures + banded Hamming LSH
    over real AVI decode (pipelines/videodedup.py)."""

    REFS = [(f"doc_{i}", f"media/vdup_test_{i}.bin") for i in range(80)]

    def test_signature_invariant_to_integer_upscale(self):
        import numpy as np

        from insurance_pdf_extractor_ray.functions import codecs
        from insurance_pdf_extractor_ray.pipelines.videodedup import _signature

        rng = np.random.RandomState(7)
        frames = rng.randint(0, 256, size=(6, 10, 14, 3)).astype(np.uint8)
        for scale in (2, 3):
            up = np.repeat(np.repeat(frames, scale, axis=1), scale, axis=2)
            assert _signature(frames) == _signature(up)
        # lossless codec round trip preserves the signature too
        dec, _fps = codecs.decode_avi_frames(codecs.encode_avi(frames, 5))
        assert _signature(dec) == _signature(frames)

    def test_planted_twins_grouped_distinct_clips_not(self, ray_session):
        from insurance_pdf_extractor_ray.pipelines.videodedup import (
            assets_with_video_dups, near_dup_video_groups)

        assets, golden = assets_with_video_dups(self.REFS)
        got = near_dup_video_groups(ray.data.from_arrow(assets),
                                    max_hamming=3, bands=4)
        assert golden.num_rows > 0  # at least one video in the ref mix
        assert sorted(got.take_all(), key=lambda r: r['media_ref']) == golden.to_pylist()
        # every planted twin maps to its base; at least one group of size 2
        groups = [r["group"] for r in golden.to_pylist()]
        assert any(groups.count(g) == 2 for g in set(groups))

    def test_bands_guard(self):
        import pyarrow as pa

        from insurance_pdf_extractor_ray.pipelines.videodedup import (
            near_dup_video_groups)

        with pytest.raises(ValueError):
            near_dup_video_groups(ray.data.from_arrow(
                pa.table({"media_ref": pa.array([], pa.string()),
                          "payload": pa.array([], pa.binary())})),
                max_hamming=4, bands=4)


class TestAudioNearDup:
    """near_dup_audio_groups: 64-bit temporal energy-gradient fingerprints
    + shared banded Hamming LSH over real WAV decode
    (pipelines/audiodedup.py, pipelines/fingerprint.py)."""

    REFS = [(f"doc_{i}", f"media/adup_test_{i}.bin") for i in range(80)]

    def test_fingerprint_invariant_to_gain_polarity_reencode(self):
        import numpy as np

        from insurance_pdf_extractor_ray.functions import codecs
        from insurance_pdf_extractor_ray.pipelines.audiodedup import (
            audio_fingerprint64)

        rng = np.random.RandomState(11)
        t = np.arange(4000)
        x = (5000 * np.sin(2 * np.pi * 440 * t / 16000)
             + rng.randint(-400, 400, size=4000)).astype(np.int16)[:, None]
        base = audio_fingerprint64(x)
        assert audio_fingerprint64(x.astype(np.int64) * 3) == base  # gain
        assert audio_fingerprint64(-x.astype(np.int64)) == base     # polarity
        dec, _ = codecs.decode_wav(codecs.encode_wav(x, 16000))
        assert audio_fingerprint64(dec) == base                     # re-encode

    def test_distinct_clips_far_apart(self):
        import numpy as np

        from insurance_pdf_extractor_ray.functions import codecs
        from insurance_pdf_extractor_ray.pipelines.audiodedup import (
            audio_fingerprint64)

        rng = np.random.RandomState(5)
        fps = []
        for freq in (150, 500, 1100, 1900):
            t = np.arange(5000)
            x = (6000 * np.sin(2 * np.pi * freq * t / 16000)
                 + rng.randint(-500, 500, size=5000)).astype(np.int16)
            fps.append(audio_fingerprint64(x[:, None]))
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                assert codecs.hamming64(fps[i], fps[j]) > 3

    def test_planted_twins_grouped_distinct_clips_not(self, ray_session):
        from insurance_pdf_extractor_ray.pipelines.audiodedup import (
            assets_with_audio_dups, near_dup_audio_groups)

        assets, golden = assets_with_audio_dups(self.REFS)
        got = near_dup_audio_groups(ray.data.from_arrow(assets),
                                    max_hamming=3, bands=4)
        assert golden.num_rows > 0  # at least one audio clip in the ref mix
        assert sorted(got.take_all(), key=lambda r: r['media_ref']) == golden.to_pylist()
        groups = [r["group"] for r in golden.to_pylist()]
        assert any(groups.count(g) == 2 for g in set(groups))


class TestDocAssetComponents:
    """doc_asset_components: star edges per shared asset + distributed
    min-label components over the doc/asset bipartite relation."""

    def test_chain_pairs_and_singletons(self, ray_session):
        import pyarrow as pa

        from insurance_pdf_extractor_ray.pipelines.multimodal import (
            doc_asset_components)

        # d1-d2 share m1; d2-d3 share m2 (chain -> one component of 3);
        # d4-d5 share m3 (pair); d6 alone (singleton)
        rows = [("d1", "m1"), ("d2", "m1"), ("d2", "m2"), ("d3", "m2"),
                ("d4", "m3"), ("d5", "m3"), ("d6", "m4")]
        tbl = pa.table({
            "doc_id": pa.array([d for d, _ in rows], pa.string()),
            "media_ref": pa.array([m for _, m in rows], pa.string())})
        got = sorted((r["doc_id"], r["component"]) for r in
                     doc_asset_components(
                         ray.data.from_arrow(tbl)).take_all())
        assert got == [("d1", "d1"), ("d2", "d1"), ("d3", "d1"),
                       ("d4", "d4"), ("d5", "d4"), ("d6", "d6")]
