"""Fused LN+QKV+rope kernel tests: golden vs the unfused production chain,
interpret-mode kernel equivalence, custom-vjp gradients, ragged token counts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.layers import attention as A
from self_supervise_sfm_tpu.layers import block as BL
from self_supervise_sfm_tpu.layers import params as P
from self_supervise_sfm_tpu.layers import rope as R
from self_supervise_sfm_tpu.ops import fused_qkv as FQ


def make_inputs(rng, B=2, N=300, C=128, nh=4, dtype=jnp.float32):
    d = C // nh
    x = jnp.asarray(rng.normal(size=(B, N, C)), dtype)
    args = dict(
        ln_scale=jnp.asarray(1 + 0.1 * rng.normal(size=(C,)), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
        w=jnp.asarray(rng.normal(scale=C**-0.5, size=(C, 3 * C)), jnp.float32),
        b=jnp.asarray(0.1 * rng.normal(size=(3 * C,)), jnp.float32),
        qn_scale=jnp.asarray(1 + 0.1 * rng.normal(size=(d,)), jnp.float32),
        qn_bias=jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32),
        kn_scale=jnp.asarray(1 + 0.1 * rng.normal(size=(d,)), jnp.float32),
        kn_bias=jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32),
    )
    pos = jnp.asarray(rng.uniform(0, 30, size=(N, 2)), jnp.float32)
    cos, sin = R.rope_tables(pos, d)
    return x, args, cos, sin, nh


class TestShrinkBlockLegality:
    """Mosaic requires partial blocks to be 8-divisible; only a block equal
    to the full token axis may take an arbitrary size. Regression: at the
    154px frame site (N=252, flagship C=1024) the shrinker inherited N's
    remainder mod 64 and returned the illegal partial block 188."""

    @pytest.mark.parametrize("C,nh", [(1024, 16), (2048, 16), (128, 4)])
    def test_result_is_full_axis_or_8_divisible(self, C, nh):
        d = C // nh
        for N in list(range(8, 600, 4)) + [1374, 2048]:
            for itemsize in (2, 4):
                bn = FQ._shrink_qkv_bn(256, N, C, nh, d, itemsize)
                assert bn == N or bn % 8 == 0, (N, C, itemsize, bn)

    def test_154px_frame_site_shape_runs(self, rng):
        # the exact shape that crashed: bf16, N=252, C=1024
        x, args, cos, sin, nh = make_inputs(rng, B=1, N=252, C=1024, nh=16,
                                            dtype=jnp.bfloat16)
        ref = FQ.reference_qkv(x, *args.values(), cos, sin, num_heads=nh)
        got = FQ.fused_qkv_kernel(
            x, *args.values(), cos, sin, num_heads=nh, interpret=True)
        for g, r, nm in zip(got, ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(r, np.float32),
                atol=0.05, err_msg=nm)


class TestFusedQKVKernel:
    @pytest.mark.parametrize("N", [256, 300, 458])
    def test_kernel_matches_reference_f32(self, rng, N):
        x, args, cos, sin, nh = make_inputs(rng, N=N)
        ref = FQ.reference_qkv(x, *args.values(), cos, sin, num_heads=nh)
        got = FQ.fused_qkv_kernel(
            x, *args.values(), cos, sin, num_heads=nh, block_n=128,
            interpret=True,
        )
        for g, r, nm in zip(got, ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=2e-5, err_msg=nm
            )

    def test_kernel_matches_reference_bf16(self, rng):
        x, args, cos, sin, nh = make_inputs(rng, N=300, dtype=jnp.bfloat16)
        ref = FQ.reference_qkv(x, *args.values(), cos, sin, num_heads=nh)
        got = FQ.fused_qkv_kernel(
            x, *args.values(), cos, sin, num_heads=nh, block_n=128,
            interpret=True,
        )
        for g, r, nm in zip(got, ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(r, np.float32),
                atol=0.05, err_msg=nm,
            )

    def test_reference_matches_production_chain(self, rng):
        """reference_qkv must equal layer_norm + qkv_heads (the unfused
        production ops) — it is the custom-vjp backward's forward."""
        x, args, cos, sin, nh = make_inputs(rng)
        C = x.shape[-1]
        ref = FQ.reference_qkv(x, *args.values(), cos, sin, num_heads=nh)

        norm_p = {"scale": args["ln_scale"], "bias": args["ln_bias"]}
        attn_p = {
            "qkv": {"w": args["w"], "b": args["b"]},
            "q_norm": {"scale": args["qn_scale"], "bias": args["qn_bias"]},
            "k_norm": {"scale": args["kn_scale"], "bias": args["kn_bias"]},
        }
        cfg = A.AttentionConfig(dim=C, num_heads=nh, qk_norm=True)
        h = P.layer_norm(norm_p, x)
        q, k, v = A.qkv_heads(attn_p, h, cfg, (cos, sin))
        for g, r, nm in zip(ref, (q, k, v), "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-6, err_msg=nm
            )

    def test_custom_vjp_gradients(self, rng):
        x, args, cos, sin, nh = make_inputs(rng, B=1, N=64, C=64, nh=2)

        def loss_fused(x, w):
            a = dict(args, w=w)
            q, k, v = FQ.fused_ln_qkv_rope(
                x, *a.values(), cos, sin, nh, 1e-5, 512
            )
            return jnp.sum(q * q) + jnp.sum(k) + jnp.sum(v * v * v)

        def loss_ref(x, w):
            a = dict(args, w=w)
            q, k, v = FQ.reference_qkv(x, *a.values(), cos, sin, num_heads=nh)
            return jnp.sum(q * q) + jnp.sum(k) + jnp.sum(v * v * v)

        gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, args["w"])
        gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, args["w"])
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-5)


class TestFusedProj:
    @pytest.mark.parametrize("N", [256, 300])
    def test_kernel_matches_reference(self, rng, N):
        B, nh, d = 2, 4, 32
        C = nh * d
        o = jnp.asarray(rng.normal(size=(B, nh, N, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        w = jnp.asarray(rng.normal(scale=C**-0.5, size=(C, C)), jnp.float32)
        b = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32)
        ls = jnp.asarray(0.01 * rng.normal(size=(C,)), jnp.float32)
        ref = FQ.reference_proj(o, x, w, b, ls)
        got = FQ.fused_proj_kernel(o, x, w, b, ls, block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_reference_matches_production_chain(self, rng):
        B, nh, N, d = 1, 4, 100, 32
        C = nh * d
        o = jnp.asarray(rng.normal(size=(B, nh, N, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        proj = {"w": jnp.asarray(rng.normal(size=(C, C)), jnp.float32),
                "b": jnp.asarray(rng.normal(size=(C,)), jnp.float32)}
        ls = {"gamma": jnp.asarray(0.01 * rng.normal(size=(C,)), jnp.float32)}
        ref = FQ.reference_proj(o, x, proj["w"], proj["b"], ls["gamma"])
        m = A._merge_heads(o)
        prod = x + P.layer_scale(ls, P.linear(proj, m))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(prod), atol=1e-6)

    def test_gradients(self, rng):
        B, nh, N, d = 1, 2, 64, 16
        C = nh * d
        o = jnp.asarray(rng.normal(size=(B, nh, N, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(C, C)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
        ls = jnp.asarray(0.01 * rng.normal(size=(C,)), jnp.float32)
        g1 = jax.grad(lambda *a: jnp.sum(FQ.fused_proj_residual(*a) ** 2),
                      argnums=(0, 1, 2))(o, x, w, b, ls)
        g2 = jax.grad(lambda *a: jnp.sum(FQ.reference_proj(*a) ** 2),
                      argnums=(0, 1, 2))(o, x, w, b, ls)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)


class TestFusedMLP:
    def _inputs(self, rng, B=2, N=300, C=64, Ch=256, dtype=jnp.float32):
        x = jnp.asarray(rng.normal(size=(B, N, C)), dtype)
        return x, (
            jnp.asarray(1 + 0.1 * rng.normal(size=(C,)), jnp.float32),
            jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
            jnp.asarray(rng.normal(scale=C**-0.5, size=(C, Ch)), jnp.float32),
            jnp.asarray(0.1 * rng.normal(size=(Ch,)), jnp.float32),
            jnp.asarray(rng.normal(scale=Ch**-0.5, size=(Ch, C)), jnp.float32),
            jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32),
            jnp.asarray(0.01 * rng.normal(size=(C,)), jnp.float32),
        )

    def test_kernel_matches_reference(self, rng):
        x, args = self._inputs(rng)
        ref = FQ.reference_mlp(x, *args)
        got = FQ.fused_mlp_kernel(x, *args, block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_reference_matches_production_chain(self, rng):
        from self_supervise_sfm_tpu.layers.block import mlp

        x, args = self._inputs(rng)
        ln_s, ln_b, w1, b1, w2, b2, ls = args
        ref = FQ.reference_mlp(x, *args)
        h = P.layer_norm({"scale": ln_s, "bias": ln_b}, x)
        prod = x + P.layer_scale(
            {"gamma": ls},
            mlp({"fc1": {"w": w1, "b": b1}, "fc2": {"w": w2, "b": b2}}, h),
        )
        np.testing.assert_allclose(np.asarray(ref), np.asarray(prod), atol=1e-6)

    def test_gradients(self, rng):
        x, args = self._inputs(rng, B=1, N=64, C=32, Ch=64)
        g1 = jax.grad(lambda *a: jnp.sum(FQ.fused_mlp_residual(*a) ** 2),
                      argnums=(0, 3, 5))(x, *args)
        g2 = jax.grad(lambda *a: jnp.sum(FQ.reference_mlp(*a) ** 2),
                      argnums=(0, 3, 5))(x, *args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestBlockIntegration:
    def test_block_fused_flag_matches_unfused(self, rng):
        """block() with fused_qkv='on' (reference dispatch off-TPU) must equal
        fused_qkv='off' — validates the wiring and the applicability gate."""
        from self_supervise_sfm_tpu.layers.block import BlockConfig, block, init_block

        C, nh, N = 128, 4, 200
        cfg_on = BlockConfig(dim=C, num_heads=nh, qk_norm=True, fused_qkv="on",
                             fused_mlp="on", attn_impl="dense")
        cfg_off = BlockConfig(dim=C, num_heads=nh, qk_norm=True, fused_qkv="off",
                              fused_mlp="off", attn_impl="dense")
        p = init_block(jax.random.PRNGKey(0), cfg_on)
        # init_linear has no bias randomisation; give qkv a nonzero bias
        p["attn"]["qkv"]["b"] = jnp.asarray(rng.normal(size=(3 * C,)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(2, N, C)), jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 20, size=(N, 2)), jnp.float32)
        tabs = R.rope_tables(pos, C // nh)
        out_on = block(p, x, cfg_on, tabs)
        out_off = block(p, x, cfg_off, tabs)
        np.testing.assert_allclose(
            np.asarray(out_on), np.asarray(out_off), atol=1e-6
        )

    def test_block_plain_fused_matches_unfused(self, rng):
        """ViT-style block (no rope, no qk-norm): plain fused path == unfused."""
        from self_supervise_sfm_tpu.layers.block import BlockConfig, block, init_block

        C, nh, N = 128, 4, 200
        cfg_on = BlockConfig(dim=C, num_heads=nh, fused_qkv="on",
                             fused_mlp="on", attn_impl="dense")
        cfg_off = BlockConfig(dim=C, num_heads=nh, fused_qkv="off",
                              fused_mlp="off", attn_impl="dense")
        p = init_block(jax.random.PRNGKey(1), cfg_on)
        p["attn"]["qkv"]["b"] = jnp.asarray(rng.normal(size=(3 * C,)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(2, N, C)), jnp.float32)
        out_on = block(p, x, cfg_on)
        out_off = block(p, x, cfg_off)
        np.testing.assert_allclose(
            np.asarray(out_on), np.asarray(out_off), atol=1e-6
        )

    def test_plain_kernel_matches_reference(self, rng):
        x, args, _, _, nh = make_inputs(rng, N=300)
        plain_args = (args["ln_scale"], args["ln_bias"], args["w"], args["b"])
        ref = FQ.reference_qkv_plain(x, *plain_args, num_heads=nh)
        got = FQ.fused_qkv_plain_kernel(
            x, *plain_args, num_heads=nh, block_n=128, interpret=True
        )
        for g, r, nm in zip(got, ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=2e-5, err_msg=nm
            )

    def test_plain_gradients(self, rng):
        x, args, _, _, nh = make_inputs(rng, B=1, N=64, C=64, nh=2)
        plain = (args["ln_scale"], args["ln_bias"], args["w"], args["b"])

        def lf(x, w):
            q, k, v = FQ.fused_ln_qkv(x, plain[0], plain[1], w, plain[3], nh)
            return jnp.sum(q * q) + jnp.sum(k) + jnp.sum(v * v * v)

        def lr(x, w):
            q, k, v = FQ.reference_qkv_plain(x, plain[0], plain[1], w, plain[3],
                                             num_heads=nh)
            return jnp.sum(q * q) + jnp.sum(k) + jnp.sum(v * v * v)

        g1 = jax.grad(lf, argnums=(0, 1))(x, args["w"])
        g2 = jax.grad(lr, argnums=(0, 1))(x, args["w"])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
