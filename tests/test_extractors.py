"""Extractor zoo tests: SuperPoint architecture golden vs a torch reference
implementation (lightglue layout), DoG blob detection, zoo union."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_supervise_sfm_tpu.pipeline import extractors as E


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def _torch_superpoint_forward(torch, sd, img):
    """Reference forward with the public architecture (magicleap/lightglue):
    VGG encoder -> 65-way cell softmax (dustbin dropped) -> pixel shuffle;
    descriptor head L2-normalised."""
    import torch.nn.functional as F

    x = torch.from_numpy(img)[None, None]

    def conv(name, x, pad):
        w = sd[f"{name}.weight"]
        b = sd[f"{name}.bias"]
        return F.conv2d(x, w, b, padding=pad)

    x = F.relu(conv("conv1a", x, 1)); x = F.relu(conv("conv1b", x, 1))
    x = F.max_pool2d(x, 2, 2)
    x = F.relu(conv("conv2a", x, 1)); x = F.relu(conv("conv2b", x, 1))
    x = F.max_pool2d(x, 2, 2)
    x = F.relu(conv("conv3a", x, 1)); x = F.relu(conv("conv3b", x, 1))
    x = F.max_pool2d(x, 2, 2)
    x = F.relu(conv("conv4a", x, 1)); feat = F.relu(conv("conv4b", x, 1))

    cPa = F.relu(conv("convPa", feat, 1))
    logits = conv("convPb", cPa, 0)
    probs = torch.softmax(logits, 1)[:, :-1]
    b, _, hc, wc = probs.shape
    scores = probs.permute(0, 2, 3, 1).reshape(b, hc, wc, 8, 8)
    scores = scores.permute(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

    cDa = F.relu(conv("convDa", feat, 1))
    desc = conv("convDb", cDa, 0)
    desc = F.normalize(desc, p=2, dim=1)
    return scores[0].numpy(), desc[0].permute(1, 2, 0).numpy()


def _random_sd(torch, rng):
    shapes = [
        ("conv1a", 64, 1, 3), ("conv1b", 64, 64, 3),
        ("conv2a", 64, 64, 3), ("conv2b", 64, 64, 3),
        ("conv3a", 128, 64, 3), ("conv3b", 128, 128, 3),
        ("conv4a", 128, 128, 3), ("conv4b", 128, 128, 3),
        ("convPa", 256, 128, 3), ("convPb", 65, 256, 1),
        ("convDa", 256, 128, 3), ("convDb", 256, 256, 1),
    ]
    sd = {}
    for name, co, ci, k in shapes:
        sd[f"{name}.weight"] = torch.from_numpy(
            rng.normal(scale=(2.0 / (k * k * ci)) ** 0.5, size=(co, ci, k, k)).astype(np.float32)
        )
        sd[f"{name}.bias"] = torch.from_numpy(
            rng.normal(scale=0.01, size=(co,)).astype(np.float32)
        )
    return sd


class TestSuperPoint:
    def test_dense_matches_torch(self, torch, rng):
        sd = _random_sd(torch, rng)
        img = rng.uniform(size=(64, 48)).astype(np.float32)
        ref_scores, ref_desc = _torch_superpoint_forward(torch, sd, img)
        p = E.convert_torch_superpoint({k: v.numpy() for k, v in sd.items()})
        scores, desc = E.superpoint_dense(p, jnp.asarray(img)[None])
        np.testing.assert_allclose(np.asarray(scores[0]), ref_scores, atol=2e-5)
        np.testing.assert_allclose(np.asarray(desc[0]), ref_desc, atol=2e-5)

    def test_keypoints_static_shapes(self, torch, rng):
        sd = _random_sd(torch, rng)
        p = E.convert_torch_superpoint({k: v.numpy() for k, v in sd.items()})
        img = jnp.asarray(rng.uniform(size=(64, 48, 3)), jnp.float32)
        xy, s, d = E.superpoint_keypoints(p, img, 100)
        assert xy.shape == (100, 2) and s.shape == (100,) and d.shape == (100, 256)
        s = np.asarray(s)
        assert (np.diff(s) <= 1e-7).all()  # top-k sorted
        live = np.asarray(xy)[s > 0]
        if len(live):
            assert live[:, 0].max() < 48 and live[:, 1].max() < 64
            assert live.min() >= 4  # border removed

    def test_simple_nms_isolates_peaks(self):
        s = jnp.zeros((1, 32, 32)).at[0, 10, 10].set(1.0).at[0, 11, 11].set(0.5)
        out = np.asarray(E.simple_nms(s, radius=2))
        assert out[0, 10, 10] == 1.0
        assert out[0, 11, 11] == 0.0  # suppressed by the stronger neighbour


class TestDoG:
    def test_detects_blobs(self, rng):
        H, W = 96, 128
        img = np.zeros((H, W), np.float32)
        yy, xx = np.mgrid[:H, :W]
        centers = [(30, 40), (60, 90), (20, 100)]
        for cy, cx in centers:
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2))
        xy, s = E.dog_keypoints(jnp.asarray(img), max_pts=16)
        xy = np.asarray(xy)[np.asarray(s) > 0]
        assert len(xy) >= len(centers)
        for cy, cx in centers:
            d = np.abs(xy - np.asarray([cx, cy])).sum(-1).min()
            assert d <= 3.0, (cy, cx, d)

    def test_flat_image_no_detections(self):
        xy, s = E.dog_keypoints(jnp.full((64, 64), 0.5), max_pts=8)
        assert (np.asarray(s) == 0).all()


class TestZoo:
    def test_union_and_dedup(self, rng):
        img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        zoo = E.initialize_feature_extractors("shi_tomasi+dog", max_pts=64)
        assert set(zoo) == {"shi_tomasi", "dog"}
        xy = E.extract_keypoints_union(img, zoo)
        assert xy.ndim == 2 and xy.shape[1] == 2
        ints = np.round(xy).astype(int)
        assert len(np.unique(ints, axis=0)) == len(ints)

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError, match="unknown extractor"):
            E.initialize_feature_extractors("r2d2")


def test_superpoint_non_multiple_of_8(rng):
    """The standard 518px frames are not a multiple of the VGG encoder's 8x
    stride; the input must be padded up and the score map cropped back
    (previously crashed with a broadcast error)."""
    import jax
    import jax.numpy as jnp

    from self_supervise_sfm_tpu.pipeline import extractors as E

    p = jax.jit(lambda k: E.init_superpoint(k))(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.uniform(size=(70, 66)).astype(np.float32))
    xy, score, desc = E.superpoint_keypoints(p, img, max_pts=32)
    assert xy.shape == (32, 2) and desc.shape[0] == 32
    assert np.all(np.asarray(xy)[:, 0] < 66) and np.all(np.asarray(xy)[:, 1] < 70)
