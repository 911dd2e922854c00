"""Host-side preprocessing (framefusion_tpu/preprocess.py + native/prep.cpp).

Oracles:
- PIL float ("F"-mode) resize — the semantics every HF image processor
  assumes (the reference delegates to those processors at runtime).
- transformers' own ``smart_resize`` for the Qwen2-VL geometry rule.
- NumPy twin vs the native C++ kernel: identical math, fp32-order noise only.
"""

import numpy as np
import pytest

from framefusion_tpu import preprocess as pp


def _pil_resize_f32(img_hw: np.ndarray, out_h: int, out_w: int, resample: str):
    from PIL import Image

    modes = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC}
    im = Image.fromarray(np.asarray(img_hw, np.float32), mode="F")
    return np.asarray(im.resize((out_w, out_h), resample=modes[resample]), np.float32)


class TestResizeVsPIL:
    @pytest.mark.parametrize("resample", ["bilinear", "bicubic"])
    @pytest.mark.parametrize("shape", [((48, 64), (24, 32)),   # downscale
                                       ((17, 23), (40, 56)),   # upscale
                                       ((37, 53), (37, 20)),   # mixed
                                       ((30, 30), (28, 28))])  # mild
    def test_matches_pil_float(self, resample, shape):
        (h, w), (oh, ow) = shape
        rng = np.random.default_rng(0)
        img = rng.random((h, w)).astype(np.float32) * 255.0
        want = _pil_resize_f32(img, oh, ow, resample)
        got = pp.resize_frames(img[..., None], oh, ow, resample=resample,
                               impl="numpy")[..., 0]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)

    def test_multichannel_multiframe(self):
        rng = np.random.default_rng(1)
        frames = rng.random((3, 32, 40, 3)).astype(np.float32) * 255
        out = pp.resize_frames(frames, 16, 20, impl="numpy")
        for t in range(3):
            for c in range(3):
                want = _pil_resize_f32(frames[t, :, :, c], 16, 20, "bicubic")
                np.testing.assert_allclose(out[t, :, :, c], want, rtol=2e-4, atol=2e-3)


class TestSmartResize:
    def test_matches_transformers(self):
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            smart_resize as hf_smart_resize,
        )

        rng = np.random.default_rng(2)
        for _ in range(40):
            h = int(rng.integers(28, 3000))
            w = int(rng.integers(28, 3000))
            if max(h, w) / min(h, w) > 200:
                continue
            assert pp.smart_resize(h, w) == tuple(
                np.atleast_1d(hf_smart_resize(h, w))
            ) or pp.smart_resize(h, w) == hf_smart_resize(h, w)

    def test_rejects_tiny_and_extreme(self):
        with pytest.raises(ValueError):
            pp.smart_resize(10, 100)
        with pytest.raises(ValueError):
            pp.smart_resize(28, 28 * 300)


class TestNativeParity:
    """The C++ kernel is the NumPy twin's equal: same weights, same pass
    order; differences are fp32 accumulation order only."""

    @pytest.fixture(scope="class")
    def lib(self):
        from framefusion_tpu import native

        lib = native.load(required=False)
        if lib is None:
            pytest.skip(f"no native toolchain: {native._CACHE['error']}")
        return lib

    @pytest.mark.parametrize("resample", ["bilinear", "bicubic"])
    @pytest.mark.parametrize("geom", [((48, 64), (24, 32)), ((17, 23), (40, 56)),
                                      ((64, 48), (64, 48))])
    def test_resize_matches_numpy(self, lib, resample, geom):
        (h, w), (oh, ow) = geom
        rng = np.random.default_rng(3)
        frames = rng.random((2, h, w, 3)).astype(np.float32) * 255
        want = pp.resize_frames(frames, oh, ow, resample=resample, impl="numpy")
        got = pp.resize_frames(frames, oh, ow, resample=resample, impl="native")
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_fused_normalize_matches(self, lib):
        rng = np.random.default_rng(4)
        frames = rng.integers(0, 256, (2, 30, 44, 3)).astype(np.float32)
        mean, std = pp.FAMILY_IMAGE_STATS["qwen2_vl"]
        want = pp.resize_frames(frames, 28, 28, impl="numpy",
                                normalize=(mean, std, 1 / 255))
        got = pp.resize_frames(frames, 28, 28, impl="native",
                               normalize=(mean, std, 1 / 255))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_standalone_normalize(self, lib):
        from framefusion_tpu import native

        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (40, 3)).astype(np.float32)
        mean, std = pp.FAMILY_IMAGE_STATS["internvl"]
        want = pp.normalize_frames(frames, mean, std)
        got = native.normalize_frames(lib, frames.copy(), mean, std, 1 / 255)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestPreprocessFrames:
    def test_qwen2vl_geometry(self):
        rng = np.random.default_rng(6)
        frames = rng.integers(0, 256, (2, 100, 150, 3)).astype(np.uint8)
        out = pp.preprocess_frames(frames, "qwen2_vl", factor=28, impl="numpy")
        assert out.shape[1] % 28 == 0 and out.shape[2] % 28 == 0
        assert out.dtype == np.float32
        # normalized stats: roughly centered
        assert abs(float(out.mean())) < 2.0

    def test_fixed_target(self):
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, (1, 61, 87, 3)).astype(np.uint8)
        out = pp.preprocess_frames(frames, "llava_video", target=(28, 28), impl="numpy")
        assert out.shape == (1, 28, 28, 3)
        # siglip stats: (x/255 - .5)/.5 in [-1, 1]
        assert float(out.min()) >= -1.001 and float(out.max()) <= 1.001
