"""Native C++ data plane (cpp/dataplane) vs the python/PIL pipeline.

Decode AND pad-square bicubic preprocessing must be bit-identical (same
libjpeg/libpng underneath; the resize replicates Pillow's fixed-point u8 /
clamped-I;16 pipelines exactly); the weighted sampler is checked for exact
per-point values (delta certainty) and for drawing from the right
distribution.
"""

import io

import numpy as np
import pytest
from PIL import Image

from self_supervise_sfm_tpu.data.preprocess import (
    preprocess_image,
    sample_correspondence_and_depth,
)
from self_supervise_sfm_tpu.native import dataplane as dp

pytestmark = pytest.mark.skipif(
    not dp.available(), reason="native dataplane unavailable"
)


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _png16_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr.astype(np.uint16)).save(buf, format="PNG")
    return buf.getvalue()


class TestDecode:
    def test_jpeg_matches_pil(self, rng):
        arr = (rng.uniform(size=(37, 53, 3)) * 255).astype(np.uint8)
        data = _jpeg_bytes(arr)
        ours = dp.jpeg_decode(data)
        ref = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(ours, ref)

    def test_png16_matches_pil(self, rng):
        arr = (rng.uniform(size=(23, 31)) * 65535).astype(np.uint16)
        data = _png16_bytes(arr)
        ours = dp.png16_decode(data)
        ref = np.array(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(ours, ref.astype(np.uint16))


class TestPreprocess:
    @pytest.mark.parametrize("w,h", [(64, 48), (48, 64), (70, 70), (30, 90)])
    def test_rgb_matches_python(self, rng, w, h):
        arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        data = _jpeg_bytes(arr)
        img, k2kp, kp2k = dp.preprocess_rgb(data, 32)
        pil = Image.open(io.BytesIO(data))
        ref, rk2kp, rkp2k = preprocess_image(pil, 32, is_depth=False)
        np.testing.assert_allclose(k2kp, rk2kp, rtol=1e-6)
        np.testing.assert_allclose(kp2k, rkp2k, rtol=1e-6)
        # bit-identical: the C++ resize replicates Pillow's fixed-point
        # u8 pipeline (per-pass clip8, 1<<22 coefficient quantisation)
        np.testing.assert_array_equal(img, ref)

    @pytest.mark.parametrize("w,h", [(64, 48), (40, 56)])
    def test_depth_matches_python(self, rng, w, h):
        depth = (rng.uniform(size=(h, w)) * 5000).astype(np.uint16)
        data = _png16_bytes(depth)
        out, raw, k2kp, kp2k = dp.preprocess_depth(data, 32)
        pil = Image.open(io.BytesIO(data))
        ref, rk2kp, rkp2k = preprocess_image(pil, 32, is_depth=True)
        np.testing.assert_allclose(k2kp, rk2kp, rtol=1e-6)
        # bit-identical: per-pass round + [0, 65535] clamp matches Pillow's
        # I;16 resample exactly
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_allclose(
            raw, depth.astype(np.float32) / 1000.0, rtol=1e-6
        )


class TestSamplePair:
    def _warp_bytes(self, rng, hs, ws, conf_u16):
        cx = (rng.uniform(size=(hs, ws)) * 65535).astype(np.uint16)
        cy = (rng.uniform(size=(hs, ws)) * 65535).astype(np.uint16)
        return (
            _png16_bytes(cx), _png16_bytes(cy), _png16_bytes(conf_u16),
            cx, cy,
        )

    def test_delta_certainty_exact(self, rng):
        """One pixel above threshold -> every draw hits it; values must match
        the python sampler exactly for that pixel."""
        hs, ws = 9, 13
        conf = np.zeros((hs, ws), np.uint16)
        conf[4, 7] = 900  # 0.9
        xb, yb, cb, cx, cy = self._warp_bytes(rng, hs, ws, conf)
        d_src = rng.uniform(0.5, 3.0, size=(21, 17)).astype(np.float32)
        d_dst = rng.uniform(0.5, 3.0, size=(19, 23)).astype(np.float32)

        sxy, dxy, sd, dd = dp.sample_pair(xb, yb, cb, d_src, d_dst, 16, 0.1, 7)

        # python reference restricted to the same single point
        coords_dst = np.stack(
            [cx.astype(np.float32) / 65535 * 2 - 1,
             cy.astype(np.float32) / 65535 * 2 - 1], axis=-1
        )
        xx, yy = np.meshgrid(
            np.linspace(-1 + 1 / ws, 1 - 1 / ws, ws),
            np.linspace(-1 + 1 / hs, 1 - 1 / hs, hs),
            indexing="xy",
        )
        coords_src = np.stack([xx, yy], axis=-1).astype(np.float32)
        rs, rd, rsd, rdd = sample_correspondence_and_depth(
            coords_src, coords_dst, conf.astype(np.float32) / 1000.0,
            d_src, d_dst, sample_num=16, min_corres_conf=0.1,
            rng=np.random.default_rng(0),
        )
        np.testing.assert_allclose(sxy, rs, atol=1e-4)
        np.testing.assert_allclose(dxy, rd, atol=1e-4)
        np.testing.assert_allclose(sd, rsd, atol=1e-5)
        np.testing.assert_allclose(dd, rdd, atol=1e-5)

    def test_weighted_distribution(self, rng):
        """Two pixels with 1:3 certainty mass are drawn ~1:3."""
        hs, ws = 8, 8
        conf = np.zeros((hs, ws), np.uint16)
        conf[2, 2] = 250
        conf[5, 5] = 750
        xb, yb, cb, _, _ = self._warp_bytes(rng, hs, ws, conf)
        d = np.ones((16, 16), np.float32)
        sxy, _, _, _ = dp.sample_pair(xb, yb, cb, d, d, 4000, 0.1, 123)
        # identify draws by the src x pixel coordinate
        x_a = (-1 + (2 * 2 + 1) / ws + 1) * (16 - 1) / 2
        frac_a = np.isclose(sxy[:, 0], x_a, atol=1e-4).mean()
        assert 0.20 < frac_a < 0.30, frac_a

    def test_below_threshold_raises(self, rng):
        conf = np.zeros((6, 6), np.uint16)
        xb, yb, cb, _, _ = self._warp_bytes(rng, 6, 6, conf)
        d = np.ones((8, 8), np.float32)
        with pytest.raises(ValueError, match="min_corres_conf"):
            dp.sample_pair(xb, yb, cb, d, d, 8, 0.1, 1)


class TestLoaderEquivalence:
    def test_native_scene_matches_python(self, tmp_path, rng):
        from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes
        from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset

        make_synthetic_dataset(
            str(tmp_path), num_scenes=1, num_images=3, image_size=(64, 48)
        )
        kw = dict(sample_num=64, num_images=3, target_size=28)
        ds_py = IMC2021Scenes(str(tmp_path), use_native=False, **kw)
        ds_nat = IMC2021Scenes(str(tmp_path), use_native=True, **kw)
        a = ds_py.load_scene(0, np.random.default_rng(0))
        b = ds_nat.load_scene(0, np.random.default_rng(0))

        assert a["image_names"] == b["image_names"]
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(
            a["depth_processed"], b["depth_processed"]
        )
        for k in ("K_to_K_prime", "K_prime_to_K", "K_gt", "poses_w2c_gt"):
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6)
        np.testing.assert_array_equal(a["pair_valid"], b["pair_valid"])
        np.testing.assert_array_equal(a["src_idx"], b["src_idx"])
        np.testing.assert_array_equal(a["dst_idx"], b["dst_idx"])
        # sampling streams differ; sampled values live on the same grids
        valid = a["pair_valid"] > 0
        assert b["src_coords"][valid].min() >= 0
        assert (b["src_depth"][valid] >= 0).all()
        assert b["src_coords"].shape == a["src_coords"].shape
