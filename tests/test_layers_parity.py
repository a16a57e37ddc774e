"""Golden parity tests: layers vs the reference torch implementation.

Each test builds the reference torch module with random weights, converts the
state dict with ``utils/converter.py`` and asserts forward equality on fixed
inputs (fp32, tolerance ~1e-5).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.layers import params as P
from self_supervise_sfm_tpu.layers import rope as R
from self_supervise_sfm_tpu.layers.attention import AttentionConfig, attention
from self_supervise_sfm_tpu.layers.block import BlockConfig, block
from self_supervise_sfm_tpu.layers.vit import ViTConfig, vit_forward
from self_supervise_sfm_tpu.utils import converter as C

from tests._reference import import_reference


@pytest.fixture(scope="module")
def torch():
    return import_reference()


def to_np(t):
    return t.detach().cpu().numpy()


class TestRoPE:
    def test_matches_reference(self, torch, rng):
        from sailrecon.layers.rope import PositionGetter, RotaryPositionEmbedding2D

        B, H, N_extra, heads, hd = 2, 3, 5, 4, 32
        gh, gw = 6, 7
        pos_getter = PositionGetter()
        pos_t = pos_getter(B, gh, gw, device="cpu") + 1  # aggregator adds 1
        pos_special = torch.zeros(B, N_extra, 2, dtype=pos_t.dtype)
        pos_t = torch.cat([pos_special, pos_t], dim=1)
        x = torch.from_numpy(
            rng.normal(size=(B, heads, N_extra + gh * gw, hd)).astype(np.float32)
        )
        ref_rope = RotaryPositionEmbedding2D(frequency=100.0)
        ref_out = to_np(ref_rope(x, pos_t))

        cos, sin = R.rope_tables(jnp.asarray(to_np(pos_t)), hd, 100.0)
        ours = np.asarray(R.apply_rope(jnp.asarray(to_np(x)), cos, sin))
        np.testing.assert_allclose(ours, ref_out, atol=2e-5)

    def test_position_grid(self, torch):
        from sailrecon.layers.rope import PositionGetter

        ref = to_np(PositionGetter()(1, 5, 9, device="cpu"))[0]
        ours = np.asarray(R.position_grid(5, 9))
        np.testing.assert_array_equal(ours, ref)


class TestAttention:
    @pytest.mark.parametrize("qk_norm", [False, True])
    @pytest.mark.parametrize("use_rope", [False, True])
    def test_matches_reference(self, torch, rng, qk_norm, use_rope):
        from sailrecon.layers.attention import Attention
        from sailrecon.layers.rope import PositionGetter, RotaryPositionEmbedding2D

        dim, heads = 64, 4
        B, gh, gw = 2, 4, 5
        N = gh * gw
        ref_rope = RotaryPositionEmbedding2D(frequency=100.0) if use_rope else None
        ref = Attention(dim, num_heads=heads, qk_norm=qk_norm, rope=ref_rope).eval()

        x_t = torch.from_numpy(rng.normal(size=(B, N, dim)).astype(np.float32))
        pos_t = PositionGetter()(B, gh, gw, device="cpu") if use_rope else None
        with torch.no_grad():
            ref_out = to_np(ref(x_t, pos=pos_t))

        sd = {f"a.{k}": v for k, v in C.torch_module_to_state_dict(ref).items()}
        p = C.convert_attention(sd, "a", qk_norm)
        cfg = AttentionConfig(dim=dim, num_heads=heads, qk_norm=qk_norm, impl="dense")
        rope_tabs = None
        if use_rope:
            cos, sin = R.rope_tables(jnp.asarray(to_np(pos_t)).astype(jnp.float32), dim // heads)
            rope_tabs = (cos, sin)
        ours = np.asarray(attention(p, jnp.asarray(to_np(x_t)), cfg, rope_tabs))
        np.testing.assert_allclose(ours, ref_out, atol=2e-5)

    def test_bool_mask(self, torch, rng):
        from sailrecon.layers.attention import Attention

        dim, heads, B, N = 64, 4, 1, 10
        ref = Attention(dim, num_heads=heads).eval()
        x_t = torch.from_numpy(rng.normal(size=(B, N, dim)).astype(np.float32))
        mask = torch.rand(1, 1, N, N) > 0.3
        mask |= torch.eye(N, dtype=torch.bool)[None, None]
        with torch.no_grad():
            ref_out = to_np(ref(x_t, attn_mask=mask))
        sd = {f"a.{k}": v for k, v in C.torch_module_to_state_dict(ref).items()}
        p = C.convert_attention(sd, "a", False)
        cfg = AttentionConfig(dim=dim, num_heads=heads, impl="dense")
        ours = np.asarray(
            attention(p, jnp.asarray(to_np(x_t)), cfg, mask=jnp.asarray(to_np(mask)))
        )
        np.testing.assert_allclose(ours, ref_out, atol=2e-5)


class TestBlock:
    def test_matches_reference(self, torch, rng):
        from sailrecon.layers.block import Block

        dim, heads = 64, 4
        ref = Block(dim, heads, init_values=0.01, qk_norm=True).eval()
        x_t = torch.from_numpy(rng.normal(size=(2, 12, dim)).astype(np.float32))
        with torch.no_grad():
            ref_out = to_np(ref(x_t))
        p = C.convert_block(
            {f"blk.{k}": v for k, v in C.torch_module_to_state_dict(ref).items()},
            "blk",
            qk_norm=True,
        )
        cfg = BlockConfig(dim=dim, num_heads=heads, qk_norm=True, attn_impl="dense")
        ours = np.asarray(block(p, jnp.asarray(to_np(x_t)), cfg))
        np.testing.assert_allclose(ours, ref_out, atol=3e-5)


class TestViT:
    def test_matches_reference_small(self, torch, rng):
        """vit_small at its native grid (no pos-embed interpolation)."""
        from sailrecon.layers.vision_transformer import vit_small

        img = 56  # 4x4 patches at patch_size 14
        ref = vit_small(
            img_size=img,
            patch_size=14,
            num_register_tokens=4,
            block_chunks=0,
            init_values=1.0,
        ).eval()
        x_t = torch.from_numpy(rng.normal(size=(2, 3, img, img)).astype(np.float32))
        with torch.no_grad():
            ref_out = ref.forward_features(x_t)
        sd = C.torch_module_to_state_dict(ref)
        p = C.convert_vit(sd, "", depth=12)
        cfg = ViTConfig(
            img_size=img, patch_size=14, embed_dim=384, depth=12, num_heads=6,
            attn_impl="dense",
        )
        ours = vit_forward(p, jnp.asarray(to_np(x_t).transpose(0, 2, 3, 1)), cfg)
        np.testing.assert_allclose(
            np.asarray(ours["x_norm_patchtokens"]),
            to_np(ref_out["x_norm_patchtokens"]),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ours["x_norm_clstoken"]),
            to_np(ref_out["x_norm_clstoken"]),
            atol=5e-4,
        )


def test_resample_pos_embed_identity_and_shape():
    """Param-level pos-embed resampling (the coarse-to-fine hand-off):
    same-grid is exact identity; cross-grid keeps the cls slot untouched
    and matches the runtime interp path's matrices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from self_supervise_sfm_tpu.layers.vit import (
        _interpolate_pos_embed, resample_pos_embed)

    rng = np.random.default_rng(0)
    pe = jnp.asarray(rng.normal(size=(1, 1 + 11 * 11, 32)), jnp.float32)
    same = resample_pos_embed(pe, 11)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pe))
    up = resample_pos_embed(pe, 37)
    assert up.shape == (1, 1 + 37 * 37, 32)
    np.testing.assert_array_equal(np.asarray(up[:, :1]), np.asarray(pe[:, :1]))
    ref = _interpolate_pos_embed(pe, (37, 37), 11)
    np.testing.assert_array_equal(np.asarray(up), np.asarray(ref))
