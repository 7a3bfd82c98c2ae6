"""Round-trip and malformed-input tests for the pure-stdlib media codecs
(functions/codecs.py): PNG (all five filters), WAV PCM16, AVI/DIB container,
resize kernel, and the shared feature kernels' decode-equals-source gate."""

import numpy as np
import pytest

from insurance_pdf_extractor_ray.functions.codecs import (
    AviReader,
    audio_features,
    decode_avi_frames,
    decode_png,
    decode_wav,
    encode_avi,
    encode_png,
    encode_wav,
    image_features,
    resize_nearest,
    video_features,
)


def _img(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8) if c > 1 else \
        rng.randint(0, 256, size=(h, w), dtype=np.uint8)


class TestPng:
    @pytest.mark.parametrize("h,w,c", [(1, 1, 3), (7, 5, 3), (16, 16, 3),
                                       (9, 13, 4), (11, 3, 1), (64, 48, 3)])
    def test_roundtrip_filter_cycle(self, h, w, c):
        src = _img(h, w, c, seed=h * 100 + w)
        out = decode_png(encode_png(src))
        exp = src if src.ndim == 3 else src[:, :, None]
        np.testing.assert_array_equal(out, exp)

    def test_roundtrip_filter0(self):
        src = _img(10, 10, 3, seed=3)
        np.testing.assert_array_equal(decode_png(encode_png(src, filter_cycle=False)), src)

    def test_all_filters_exercised(self):
        # >=5 rows with filter_cycle guarantees every filter type appears
        src = _img(8, 8, 3, seed=9)
        data = encode_png(src)
        np.testing.assert_array_equal(decode_png(data), src)

    def test_gradient_image(self):
        # smooth gradients are where Sub/Up/Average/Paeth differ most
        y, x = np.mgrid[0:32, 0:40]
        src = np.stack([(x * 6) % 256, (y * 7) % 256, (x + y) % 256],
                       axis=2).astype(np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(src)), src)

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="bad signature"):
            decode_png(b"NOTAPNG" + b"\x00" * 64)

    def test_crc_corruption(self):
        data = bytearray(encode_png(_img(6, 6, 3)))
        data[40] ^= 0xFF  # flip a byte inside IDAT body
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(data))

    def test_truncated(self):
        data = encode_png(_img(6, 6, 3))
        with pytest.raises(ValueError):
            decode_png(data[: len(data) // 2])


class TestWav:
    def test_roundtrip_mono(self):
        rng = np.random.RandomState(1)
        src = rng.randint(-32768, 32767, size=4000, dtype=np.int16)
        out, rate = decode_wav(encode_wav(src, 16000))
        assert rate == 16000
        np.testing.assert_array_equal(out[:, 0], src)

    def test_roundtrip_stereo(self):
        rng = np.random.RandomState(2)
        src = rng.randint(-32768, 32767, size=(1000, 2), dtype=np.int16)
        out, rate = decode_wav(encode_wav(src, 8000))
        assert rate == 8000
        np.testing.assert_array_equal(out, src)

    def test_bad_header(self):
        with pytest.raises(ValueError, match="RIFF/WAVE"):
            decode_wav(b"RIFFxxxxAVI " + b"\x00" * 32)


class TestAvi:
    def _frames(self, n, h, w, seed=0):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)

    @pytest.mark.parametrize("h,w", [(8, 8), (5, 7), (16, 12)])  # w=7: row padding
    def test_roundtrip(self, h, w):
        src = self._frames(6, h, w, seed=h * 10 + w)
        frames, fps = decode_avi_frames(encode_avi(src, fps=10))
        assert fps == 10.0
        np.testing.assert_array_equal(frames, src)

    def test_header_fields(self):
        src = self._frames(12, 8, 8, seed=4)
        r = AviReader(encode_avi(src, fps=4))
        assert (r.width, r.height, r.n_frames) == (8, 8, 12)
        assert r.fps == 4.0
        assert r.duration_ms == 3000

    def test_seek_clock(self):
        src = self._frames(10, 4, 4, seed=5)
        r = AviReader(encode_avi(src, fps=2))  # 500ms per frame
        assert r.frame_index_at(0) == 0
        assert r.frame_index_at(499) == 0
        assert r.frame_index_at(500) == 1
        assert r.frame_index_at(10_000) == 9  # clamped
        np.testing.assert_array_equal(r.decode_frame(3), src[3])

    def test_selective_decode(self):
        src = self._frames(8, 6, 6, seed=6)
        frames, _ = decode_avi_frames(encode_avi(src, fps=8), indices=[0, 7, 2])
        np.testing.assert_array_equal(frames, src[[0, 7, 2]])

    def test_bad_header(self):
        with pytest.raises(ValueError, match="RIFF"):
            AviReader(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


class TestResize:
    def test_downscale_dims(self):
        out = resize_nearest(_img(100, 60, 3), 32)
        assert out.shape == (32, 19, 3)

    def test_noop_when_small(self):
        src = _img(10, 20, 3)
        assert resize_nearest(src, 64) is src

    def test_nearest_values_come_from_source(self):
        src = _img(50, 50, 3, seed=7)
        out = resize_nearest(src, 10)
        flat_src = {tuple(p) for p in src.reshape(-1, 3)}
        assert all(tuple(p) in flat_src for p in out.reshape(-1, 3))


class TestFeatureGate:
    """features(decode(encode(x))) == features(x) — the lossless-codec gate
    the *_check queries build on."""

    def test_image(self):
        src = _img(24, 30, 3, seed=11)
        np.testing.assert_array_equal(
            image_features(decode_png(encode_png(src))), image_features(src))

    def test_audio(self):
        rng = np.random.RandomState(12)
        src = rng.randint(-20000, 20000, size=(3000, 1), dtype=np.int16)
        out, rate = decode_wav(encode_wav(src, 16000))
        np.testing.assert_array_equal(audio_features(out, rate),
                                      audio_features(src, 16000))

    def test_video(self):
        rng = np.random.RandomState(13)
        src = rng.randint(0, 256, size=(5, 12, 12, 3), dtype=np.uint8)
        r = AviReader(encode_avi(src, fps=5))
        np.testing.assert_array_equal(
            video_features(r.decode_frame(0), r.n_frames, r.fps),
            video_features(src[0], 5, 5.0))
