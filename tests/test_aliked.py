"""ALIKED-class extractor tests.

The deformable convolution is golden-tested against an independent torch
implementation of the same math (offset conv + bilinear sampling, the
torchvision ``deform_conv2d`` semantics); the detector/descriptor paths get
property tests (static shapes, blob detection, descriptor invariances).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_supervise_sfm_tpu.pipeline import aliked as A


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def _torch_deform_conv(torch, x, offsets, w, b):
    """Reference DCNv1: x (H,W,Cin), offsets (H,W,9,2) as (dy,dx) row-major
    kernel taps, w (3,3,Cin,Cout). Bilinear with zero padding."""
    H, W, Cin = x.shape
    Cout = w.shape[-1]
    out = torch.zeros(H, W, Cout, dtype=torch.float64)
    xpad = x

    def sample(yy, xx):
        y0 = int(np.floor(yy)); x0 = int(np.floor(xx))
        wy = yy - y0; wx = xx - x0
        v = torch.zeros(Cin, dtype=torch.float64)
        for (iy, ix, ww) in (
            (y0, x0, (1 - wy) * (1 - wx)),
            (y0, x0 + 1, (1 - wy) * wx),
            (y0 + 1, x0, wy * (1 - wx)),
            (y0 + 1, x0 + 1, wy * wx),
        ):
            if 0 <= iy < H and 0 <= ix < W:
                v = v + ww * xpad[iy, ix]
        return v

    for py in range(H):
        for px in range(W):
            acc = torch.zeros(Cout, dtype=torch.float64)
            k = 0
            for ky in (-1, 0, 1):
                for kx in (-1, 0, 1):
                    dy, dx = offsets[py, px, k]
                    v = sample(py + ky + float(dy), px + kx + float(dx))
                    acc = acc + v @ w[ky + 1, kx + 1]
                    k += 1
            out[py, px] = acc
    return out + b


class TestDeformConv:
    def test_matches_torch_reference(self, torch, rng):
        H, W, Cin, Cout = 7, 6, 3, 4
        x = rng.normal(size=(H, W, Cin))
        off = rng.normal(scale=0.7, size=(H, W, 9, 2))
        w = rng.normal(size=(3, 3, Cin, Cout))
        b = rng.normal(size=(Cout,))
        ref = _torch_deform_conv(
            torch,
            torch.from_numpy(x), torch.from_numpy(off),
            torch.from_numpy(w), torch.from_numpy(b),
        ).numpy()
        got = A.deform_conv(
            jnp.asarray(x, jnp.float32)[None],
            jnp.asarray(off.reshape(H, W, 18), jnp.float32)[None],
            jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32),
        )[0]
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    def test_zero_offsets_equal_plain_conv(self, rng):
        """With zero offsets a deformable conv is exactly a SAME conv —
        the zero-init contract that makes DCN start as a plain conv."""
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
        got = A.deform_conv(x, jnp.zeros((1, 8, 8, 18)), w, b)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestALIKED:
    @pytest.fixture(scope="class")
    def params(self):
        return A.init_aliked(jax.random.PRNGKey(0))

    def test_dense_shapes(self, params, rng):
        img = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32)
        scores, feats = A.aliked_dense(params, img)
        assert scores.shape == (1, 64, 96)
        assert feats.shape == (1, 64, 96, 128)
        s = np.asarray(scores)
        assert (s >= 0).all() and (s <= 1).all()  # sigmoid head
        n = np.linalg.norm(np.asarray(feats), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-3)  # L2-normalised

    def test_keypoints_static_shapes_and_padding(self, params, rng):
        img = jnp.asarray(rng.uniform(size=(50, 70, 3)), jnp.float32)  # not /32
        xy, s, d = A.aliked_keypoints(params, img, 64)
        assert xy.shape == (64, 2) and s.shape == (64,) and d.shape == (64, 128)
        live = np.asarray(xy)[np.asarray(s) > 0]
        if len(live):
            # inside the unpadded image: border-8 detection mask, sub-pixel
            # refinement can move a peak by at most 2 px
            assert live[:, 0].min() >= 6 and live[:, 0].max() <= 70 - 6
            assert live[:, 1].min() >= 6 and live[:, 1].max() <= 50 - 6

    def test_descriptors_translation_consistency(self, params, rng):
        """SDDH descriptors follow their keypoint: translating the image and
        the query point gives (approximately) the same descriptor."""
        base = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        shift = 8
        img1 = jnp.asarray(base)
        img2 = jnp.asarray(np.roll(base, shift, axis=1))
        _, f1 = A.aliked_dense(params, img1[None])
        _, f2 = A.aliked_dense(params, img2[None])
        kp = jnp.asarray([[24.0, 32.0], [30.0, 20.0]])
        d1 = A.sddh_descriptors(params, f1[0], kp)
        d2 = A.sddh_descriptors(params, f2[0], kp + jnp.asarray([[shift, 0.0]]))
        cos = np.sum(np.asarray(d1) * np.asarray(d2), -1)
        assert (cos > 0.99).all(), cos

    def test_zoo_registration(self, rng):
        from self_supervise_sfm_tpu.pipeline import extractors as E

        zoo = E.initialize_feature_extractors("aliked", max_pts=32)
        xy = zoo["aliked"](rng.uniform(size=(64, 64, 3)).astype(np.float32))
        assert xy.ndim == 2 and xy.shape[1] == 2
