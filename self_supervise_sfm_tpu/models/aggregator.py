"""Alternating-attention aggregator: the VGGT-style trunk, TPU-first.

Re-design of ``sailrecon/models/aggregator.py`` (Aggregator). Per layer l of
24, with anchors-first frame layout ``[anchor_0..anchor_{A-1}, query_0..]``:

1. frame attention  — every frame independently over its P = 1369+5 tokens
   (``aggregator.py:643-670``), batched as (B*S, P, C).
2. scene-token subsampling — per anchor frame keep the 5 special tokens plus
   ``rank`` randomly-permuted patch tokens (``aggregator.py:277-285,580-626``);
   indices are precomputed per layer from an explicit PRNG key (the torch
   per-rank Generator becomes key folding, ``aggregator.py:628-641``).
3. global-reloc attention — queries attend to [compressed anchors ‖ own
   frame]; the reference runs the full block over the concatenation and
   discards the anchor rows (``aggregator.py:672-741``), we compute K/V-only
   for the anchor context (identical numerics, ~A*(R+5)/(A*(R+5)+Q*P) fewer
   attention rows).
4. global attention — anchors jointly over all A*P tokens
   (``aggregator.py:743-769``).

Taps at layers {4, 11, 17, 23} emit [frame ‖ reloc] features of the query
frames for the DPT heads (``aggregator.py:403-413``); the final layer also
emits the anchor camera tokens (``aggregator.py:414-423``).

TPU mapping: the 24 layers are depth-stacked and driven by segmented
``lax.scan`` (one compiled body instead of 24), with ``jax.checkpoint`` for
rematerialisation instead of ``torch.utils.checkpoint``. Relocalisation uses
an explicit HBM-resident KV-cache pytree with static shapes — replacing the
reference's stateful first-pass-returns-zeros CPU-offload trick
(``layers/attention.py:84-100``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache as _lru_cache
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..layers import params as P
from ..layers import rope as R
from ..layers.block import (
    BlockConfig,
    block,
    block_context_kv,
    init_block,
)
from ..layers.vit import ViTConfig, init_vit, vit_forward, vit_large
from ..parallel.sharding import CONTEXT_AXIS, DATA_AXIS, constrain
from ..ops.mask_spec import RelocMask

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class AggregatorConfig:
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qk_norm: bool = True
    rope_freq: float = 100.0
    init_values: float = 0.01
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    vit: ViTConfig = field(default_factory=vit_large)
    compute_dtype: str = "float32"  # trunk dtype; taps are returned in fp32
    remat: bool = False
    attn_impl: str = "auto"
    # attention impl for the unmasked global-attention site only: "ring"
    # switches to shard_map ring attention (ops/ring_attention.py) when a mesh
    # with context extent > 1 is active, keeping K/V sharded across devices
    # instead of all-gathered.
    global_attn_impl: str = "auto"
    # scene-cache storage layout:
    # - "heads": (depth, B, H, N, 64) — the raw flash-kernel layout, but
    #   (…, N, 64) arrays lane-pad 64 -> 128 under TPU T(8,128) tiling, so
    #   the RESIDENT cache costs 2x its true bytes;
    # - "packed": heads merged to (depth, B, N, C) — dense 128-lane tiling
    #   (the r3 default; S_max 130 -> 195), split per layer at consumption;
    # - "kv2" (default): head-major with k/v interleaved on the lane axis,
    #   (depth, B, H, N, 2*64=128) under key "kv" — dense tiling like
    #   "packed", AND consumable in place by the direct-HBM reloc kernel
    #   (ops/flash_attention.frame_ctx_packed_kernel): the depth-stacked
    #   array goes straight into the pallas_call with the layer picked in
    #   the BlockSpec index map, so reloc holds NO per-layer transient and
    #   NO loop copy of the stacks (the r3 "scan xs windowing" 2x tax).
    cache_layout: str = "kv2"
    # reloc cache consumption structure. "scan": lax.scan over depth with the
    # cache as xs — XLA's windowed-DMA while-loop then keeps a full COPY of
    # the cache stacks resident (measured 0.0558 vs 0.028 true GB/anchor, r3
    # open items; a dynamic_index closure compiles to the same loop, git
    # 9d09add). "unrolled" (default, required for "kv2"): python-unrolled
    # depth loop — no while loop, no windowed copy; with "kv2" the cache is
    # never sliced at the HLO level at all.
    reloc_consume: str = "unrolled"

    @property
    def patch_start_idx(self) -> int:
        return 1 + self.num_register_tokens

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def block_cfg(self) -> BlockConfig:
        return BlockConfig(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm,
            ln_eps=1e-5,
            init_values=self.init_values,
            attn_impl=self.attn_impl,
        )

    @property
    def global_block_cfg(self) -> BlockConfig:
        return BlockConfig(
            dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm,
            ln_eps=1e-5,
            init_values=self.init_values,
            attn_impl=self.global_attn_impl,
        )

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


def init_aggregator(key, cfg: AggregatorConfig):
    kv, kf, kg, kr, kt = jax.random.split(key, 5)

    def stack_init(k):
        keys = jax.random.split(k, cfg.depth)
        return jax.vmap(lambda kk: init_block(kk, cfg.block_cfg))(keys)

    C = cfg.embed_dim
    reg = cfg.num_register_tokens
    tkeys = jax.random.split(kt, 4)
    return {
        "vit": init_vit(kv, cfg.vit),
        "frame_blocks": stack_init(kf),
        "global_blocks": stack_init(kg),
        "reloc_blocks": stack_init(kr),
        # index 0: first frame; index 1: all other frames (aggregator.py:164-173)
        "camera_token": 1e-6 * jax.random.normal(tkeys[0], (1, 2, 1, C)),
        "register_token": 1e-6 * jax.random.normal(tkeys[1], (1, 2, reg, C)),
        "camera_token_reloc": 1e-6 * jax.random.normal(tkeys[2], (1, 1, 1, C)),
        "register_token_reloc": 1e-6 * jax.random.normal(tkeys[3], (1, 1, reg, C)),
    }


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _normalize_images(images: jax.Array) -> jax.Array:
    """(..., H, W, 3) in [0,1] -> resnet-normalised."""
    mean = jnp.asarray(_RESNET_MEAN, images.dtype)
    std = jnp.asarray(_RESNET_STD, images.dtype)
    return (images - mean) / std


def _embed_frames(
    p, cfg: AggregatorConfig, images: jax.Array, is_query: jax.Array,
    duplicated: bool = False, frame_chunk: Optional[int] = None,
):
    """images (B, S, H, W, 3) -> tokens (B, S, P, C), P = patches + specials.

    ``is_query``: static bool array (S,) — query frames get the reloc
    camera/register tokens; anchor frame 0 gets token index 0, other anchors
    index 1 (slice_expand_and_flatten semantics, ``aggregator.py:806-829``).

    ``duplicated``: the inference entry points duplicate each image into an
    anchor copy and a query copy (``train/demo_imc_forward.py:76-101``,
    ``train/train_imc.py:107-139``). The two copies differ only in their
    special tokens — the ViT patch tokens are identical — so with
    ``duplicated=True`` (requires S even, frames [a_0..a_{n-1}, q_0..q_{n-1}]
    with q_i the same image as a_i) the ViT runs once per unique image and
    its patch tokens are reused for both copies: same math at half the
    patch-embed FLOPs (outputs agree to fp tolerance; XLA reduction order
    differs with the smaller batch).
    """
    B, S, H, W, _ = images.shape
    if duplicated:
        assert S % 2 == 0
        images = images[:, : S // 2]
    Su = images.shape[1]
    if (frame_chunk is not None and 0 < frame_chunk < Su
            and Su % frame_chunk == 0):
        # frame-chunked ViT: the patch embedding is per-frame independent, so
        # its (large) per-layer transients only need to be live for one chunk
        # of frames at a time — the capacity companion of the anchor-chunked
        # build layers (``_build_layer_chunked``). Normalisation happens
        # inside the loop too (a full normalised copy would double the
        # image-sized resident set).
        G = frame_chunk

        def vit_chunk(imc):
            xc = _normalize_images(imc).reshape(B * G, H, W, 3)
            out = vit_forward(p["vit"], xc, cfg.vit, compute_dtype=cfg.dtype)
            return out["x_norm_patchtokens"]  # (B*G, P0, C)

        pt_sd = jax.eval_shape(
            vit_chunk, jax.ShapeDtypeStruct((B, G, H, W, 3), images.dtype)
        )
        P0 = pt_sd.shape[1]

        def body(s, buf):
            imc = jax.lax.dynamic_slice_in_dim(images, s * G, G, axis=1)
            pt = vit_chunk(imc).reshape(B, G, P0, -1)
            return jax.lax.dynamic_update_slice_in_dim(buf, pt, s * G, axis=1)

        patch_tokens = jax.lax.fori_loop(
            0, Su // G, body,
            jnp.zeros((B, Su, P0, pt_sd.shape[-1]), pt_sd.dtype),
        ).reshape(B * Su, P0, -1)
    else:
        x = _normalize_images(images).reshape(B * Su, H, W, 3)
        vit_out = vit_forward(p["vit"], x, cfg.vit, compute_dtype=cfg.dtype)
        patch_tokens = vit_out["x_norm_patchtokens"]  # (B*Su, P0, C)
        P0 = patch_tokens.shape[1]
    if duplicated:
        patch_tokens = jnp.concatenate(
            [patch_tokens.reshape(B, Su, P0, -1)] * 2, axis=1
        ).reshape(B * S, P0, -1)
    C = cfg.embed_dim

    cam_anchor = jnp.concatenate(
        [p["camera_token"][0, 0:1], jnp.repeat(p["camera_token"][0, 1:2], max(S - 1, 0), axis=0)],
        axis=0,
    )  # (S, 1, C) as if all frames were anchors
    reg_anchor = jnp.concatenate(
        [p["register_token"][0, 0:1], jnp.repeat(p["register_token"][0, 1:2], max(S - 1, 0), axis=0)],
        axis=0,
    )
    cam_reloc = jnp.broadcast_to(p["camera_token_reloc"][0, 0], (S, 1, C))
    reg_reloc = jnp.broadcast_to(
        p["register_token_reloc"][0, 0], (S, cfg.num_register_tokens, C)
    )
    isq = is_query[:, None, None]
    cam = jnp.where(isq, cam_reloc, cam_anchor)
    reg = jnp.where(isq, reg_reloc, reg_anchor)
    special = jnp.concatenate([cam, reg], axis=1).astype(cfg.dtype)  # (S, 5, C)
    special = jnp.broadcast_to(special[None], (B, S) + special.shape[1:])

    tokens = jnp.concatenate(
        [special, patch_tokens.reshape(B, S, P0, C)], axis=2
    )  # (B, S, P, C)
    return tokens, P0


def _rope_tables_frame(cfg: AggregatorConfig, grid_h: int, grid_w: int):
    """(cos, sin) for one frame's [5 specials + grid] tokens, shape (P, hd)."""
    pos = R.position_grid(grid_h, grid_w) + 1  # aggregator.py:322 (pos + 1)
    pos_special = jnp.zeros((cfg.patch_start_idx, 2), pos.dtype)
    pos = jnp.concatenate([pos_special, pos], axis=0)  # (P, 2)
    return R.rope_tables(pos, cfg.head_dim, cfg.rope_freq)


def _tile_tables(tabs, n: int):
    cos, sin = tabs
    return jnp.tile(cos, (n, 1)), jnp.tile(sin, (n, 1))


def _subsample_indices(
    key, cfg: AggregatorConfig, B: int, num_anchor: int, P0: int, rank: int
) -> jax.Array:
    """Per-(layer, batch, anchor) keep-indices into the full token axis.

    Returns int32 (depth, B, num_anchor, rank + patch_start_idx): the 5
    special-token indices followed by ``rank`` patch indices drawn by random
    permutation (``aggregator.py:593-626``), offset past the specials.
    """
    rank = min(rank, P0)
    n = cfg.depth * B * num_anchor
    keys = jax.random.split(key, n)
    perm = jax.vmap(lambda k: jax.random.permutation(k, P0)[:rank])(keys)
    perm = perm.reshape(cfg.depth, B, num_anchor, rank) + cfg.patch_start_idx
    specials = jnp.broadcast_to(
        jnp.arange(cfg.patch_start_idx, dtype=perm.dtype),
        (cfg.depth, B, num_anchor, cfg.patch_start_idx),
    )
    return jnp.concatenate([specials, perm], axis=-1)


def _reloc_allow_mask(num_ctx: int, num_query: int, P: int) -> RelocMask:
    """Allow-mask spec: full context + own-frame only.

    Token-level structure of ``build_allow_block`` rows for query frames
    (``aggregator.py:832-851``): queries see all compressed anchors and
    themselves, never each other. Materialised lazily by the dense attention
    path; evaluated per-tile (with dead-tile skipping) by the flash kernel.
    """
    return RelocMask(n_ctx=num_ctx, frame_size=P, num_frames=num_query)




def _make_indices(cfg, subsample_key, subsample_indices, B, A, P0, rank):
    """Either derive keep-indices from a PRNG key or take explicit patch-relative
    indices (depth, B, A, rank) — the latter exists for golden-parity tests
    against the reference's torch.Generator draws."""
    rank = min(rank, P0)
    if subsample_indices is not None:
        assert subsample_indices.shape[-1] == rank
        perm = subsample_indices.astype(jnp.int32) + cfg.patch_start_idx
        specials = jnp.broadcast_to(
            jnp.arange(cfg.patch_start_idx, dtype=perm.dtype),
            perm.shape[:-1] + (cfg.patch_start_idx,),
        )
        return jnp.concatenate([specials, perm], axis=-1)
    if subsample_key is None:
        # full rank keeps every patch token and the outputs are invariant to
        # permutation order (KV-set invariance, tests/test_model_parity) —
        # no randomness is needed, so default-argument callers (e.g.
        # pose_forward with rank=P0) work without a key
        assert rank == P0, (
            "subsample_key (or explicit subsample_indices) is required when "
            f"rank ({rank}) < num patch tokens ({P0})"
        )
        idx = jnp.arange(cfg.patch_start_idx + P0, dtype=jnp.int32)
        return jnp.broadcast_to(
            idx, (cfg.depth, B, A, cfg.patch_start_idx + P0)
        )
    return _subsample_indices(subsample_key, cfg, B, A, P0, rank)


# ---------------------------------------------------------------------------
# joint forward (training / single-pass inference)
# ---------------------------------------------------------------------------


def aggregator_forward(
    p,
    cfg: AggregatorConfig,
    images: jax.Array,
    num_anchor: int,
    num_query: int,
    rank: int,
    subsample_key: Optional[jax.Array] = None,
    subsample_indices: Optional[jax.Array] = None,
    images_duplicated: bool = False,
) -> Tuple[Dict[int, jax.Array], int, jax.Array]:
    """Joint anchors+queries forward.

    Args:
        images: (B, S, H, W, 3) in [0, 1], NHWC, anchors first. S = A + Q.
        num_anchor / num_query: static frame counts (Q >= 1).
        rank: static scene-token rank (300 at every reference call site).
        subsample_key: PRNG key driving the per-layer token subsampling.
        images_duplicated: promise that queries are the same images as the
            anchors (the standard inference layout) — the ViT patch embed
            then runs once per unique image (see ``_embed_frames``).

    Returns:
        (taps, patch_start_idx, cam_token_last_layer) where taps maps layer
        index in ``cfg.intermediate_layer_idx`` (plus -1 = last) to fp32
        (B, Q, P, 2C) [frame ‖ reloc] features, and cam_token_last_layer is
        fp32 (B, A, 2C).
    """
    B, S, H, W, _ = images.shape
    A, Q = num_anchor, num_query
    assert S == A + Q and Q >= 1
    gh, gw = H // cfg.patch_size, W // cfg.patch_size

    if images_duplicated:
        assert A == Q, "duplicated layout requires anchors == queries"
    is_query = jnp.asarray([False] * A + [True] * Q)
    tokens, P0 = _embed_frames(p, cfg, images, is_query, images_duplicated)
    C = cfg.embed_dim
    Ptok = P0 + cfg.patch_start_idx
    rank = min(rank, P0)
    R5 = rank + cfg.patch_start_idx

    idx = _make_indices(cfg, subsample_key, subsample_indices, B, A, P0, rank)

    t_frame = _rope_tables_frame(cfg, gh, gw)  # (P, hd) x2
    t_global = _tile_tables(t_frame, A)
    bcfg = cfg.block_cfg
    bcfg_g = cfg.global_block_cfg

    from ..parallel.sp_block import (
        frame_block_sharded, global_block_ring, reloc_block_sharded,
    )

    def layer(tokens, fp, gp, rp, idx_l):
        # 1. frame attention — frames sharded over (data x context); under a
        # mesh the shard_map variant keeps the Pallas kernels device-local
        with jax.named_scope("frame_attn"):
            t = tokens.reshape(B * S, Ptok, C)
            t = constrain(t, (DATA_AXIS, CONTEXT_AXIS), None, None)
            t = frame_block_sharded(fp, t, bcfg, t_frame)
            t = t.reshape(B, S, Ptok, C)
        frame_out = t
        anchors = t[:, :A]
        queries = t[:, A:]
        # 2. compressed scene representation
        with jax.named_scope("scene_subsample"):
            down = jnp.take_along_axis(anchors, idx_l[..., None], axis=2)
            down = down.reshape(B, A * R5, C)
            down_cos = t_frame[0][idx_l].reshape(B, A * R5, -1)
            down_sin = t_frame[1][idx_l].reshape(B, A * R5, -1)
        # 3. global-reloc attention — frame-major layout: queries stay
        # (B*Q, P, C) with frames folded into batch (sharded over
        # data x context like frame attention) while the small compressed
        # scene rep stays (B, A*R5, C), replicated / all-gathered over ICI.
        # The [ctx ‖ own-frame] allow structure is expressed by layout — no
        # mask, no fold/unfold transposes around the attention kernel.
        with jax.named_scope("reloc_attn"):
            q = queries.reshape(B * Q, Ptok, C)
            q = constrain(q, (DATA_AXIS, CONTEXT_AXIS), None, None)
            q = reloc_block_sharded(
                rp, q, down, bcfg, t_frame, (down_cos, down_sin)
            )
            reloc_out = q.reshape(B, Q, Ptok, C)
        # 4. global attention — the long (A*P) token axis is context-sharded:
        # sequence parallelism via the shard_map ring block (K/V stay sharded,
        # ppermute rotation, local fused kernels) when the axis divides, else
        # GSPMD constrain + XLA all-gather ("dense" forces the latter).
        with jax.named_scope("global_attn"):
            g = anchors.reshape(B, A * Ptok, C)
            g = constrain(g, DATA_AXIS, CONTEXT_AXIS, None)
            if cfg.global_attn_impl in ("ring", "auto"):
                g = global_block_ring(gp, g, bcfg_g, t_global)
            else:
                g = block(gp, g, bcfg_g, t_global)
            global_out = g.reshape(B, A, Ptok, C)

        new_tokens = jnp.concatenate([global_out, reloc_out], axis=1)
        return new_tokens, frame_out, reloc_out, global_out

    if cfg.remat:
        layer = jax.checkpoint(layer, prevent_cse=False)

    # One scan over all layers. Tapped layers write their [frame ‖ reloc]
    # features into a carry buffer via lax.cond + in-place dynamic update —
    # unrolling the tap layers instead (the previous form) made XLA
    # materialise per-layer slices of every stacked weight (~2.5 ms/step of
    # (4096, 1024)-class copies) and compile 7 copies of the layer graph.
    tap_list = tuple(cfg.intermediate_layer_idx)
    assert tap_list == tuple(sorted(tap_list))
    assert tap_list[-1] == cfg.depth - 1, "last layer must be an intermediate tap"
    n_tap = len(tap_list)
    tap_idx_arr = jnp.asarray(tap_list, jnp.int32)
    taps_buf = jnp.zeros((n_tap, B, Q, Ptok, 2 * C), jnp.float32)
    cam_buf = jnp.zeros((B, A, 2 * C), jnp.float32)

    def body(carry, xs):
        tokens, taps_buf, cam_buf = carry
        (fp, gp, rp), idx_l, l = xs
        new_tokens, frame_out, reloc_out, global_out = layer(
            tokens, fp, gp, rp, idx_l
        )
        is_tap = jnp.any(tap_idx_arr == l)
        slot = jnp.sum((tap_idx_arr < l).astype(jnp.int32))

        def write(tb):
            feat = jnp.concatenate(
                [frame_out[:, A:], reloc_out], axis=-1
            ).astype(jnp.float32)
            return jax.lax.dynamic_update_index_in_dim(tb, feat, slot, 0)

        taps_buf = jax.lax.cond(is_tap, write, lambda tb: tb, taps_buf)
        cam = jnp.concatenate(
            [frame_out[:, :A, 0], global_out[:, :, 0]], axis=-1
        ).astype(jnp.float32)
        cam_buf = jnp.where(l == cfg.depth - 1, cam, cam_buf)
        return (new_tokens, taps_buf, cam_buf), None

    stacks = (p["frame_blocks"], p["global_blocks"], p["reloc_blocks"])
    (_, taps_buf, cam_token_last_layer), _ = jax.lax.scan(
        body,
        (tokens, taps_buf, cam_buf),
        (stacks, idx, jnp.arange(cfg.depth, dtype=jnp.int32)),
    )

    taps: Dict[int, jax.Array] = {li: taps_buf[i] for i, li in enumerate(tap_list)}
    taps[-1] = taps[tap_list[-1]]
    return taps, cfg.patch_start_idx, cam_token_last_layer


# ---------------------------------------------------------------------------
# scene-cache build + relocalisation (two-phase inference)
# ---------------------------------------------------------------------------


def _build_layer_chunked(cfg: AggregatorConfig, fp, gp, rp, tokens, idx_l,
                         B: int, A: int, Ptok: int, R5: int, t_frame,
                         anchor_chunk: int):
    """One build layer with the anchor axis processed in chunks of
    ``anchor_chunk`` frames: transients scale with the CHUNK, resident state
    with the scene.

    The one-shot build layer's HBM peak is dominated by per-layer transients
    over ALL anchor frames at once (fused-QKV q/k/v, the 4C MLP hidden —
    measured 0.041 GB/anchor of the staged build's 0.0442 slope,
    SCENE_STAGED_r05.json). Only the *global-attention K/V* genuinely needs
    every anchor token; everything else is per-frame (frame block, reloc-KV
    downsample) or per-token (global QKV projection, out-proj + MLP). So:

    - pass 1 (fori_loop over anchor chunks): frame block -> ``frame_out``
      buffer; reloc-cache KV -> ``kv2`` buffer; global-block fused QKV ->
      full k/v buffers (q is NOT stored: pass 2 recomputes it per chunk by
      re-running the same fused QKV kernel on the same input — bit-identical
      q at the cost of re-projecting k/v that get discarded; the build is
      capacity-bound, not FLOP-bound, so one resident buffer beats one
      matmul).
    - pass 2 (fori_loop over chunks): recompute the q chunk, flash
      attention against the FULL k/v (identical per-row math to the
      unchunked call — the kv-tile reduction order does not depend on how
      the q axis is partitioned), then fused out-proj + layer-scale +
      residual + MLP per chunk -> ``global_out`` buffer.

    Resident state is 4 token-sized buffers (tokens-in, frame_out, k, v /
    global_out) instead of the all-at-once transients. Single-chip capacity
    knob (the chunk loop crosses the context-sharding axis, so it
    deliberately skips the ``constrain`` annotations of the unchunked
    path); requires the "kv2" cache layout.
    """
    C = cfg.embed_dim
    Hh = cfg.num_heads
    hd = cfg.head_dim
    bcfg = cfg.block_cfg
    bcfg_g = cfg.global_block_cfg
    G = anchor_chunk
    nck = A // G
    dt = tokens.dtype

    from ..layers.attention import attention_heads_out
    from ..layers.block import attn_out_mlp, qkv_parts
    from ..parallel.sp_block import frame_block_sharded

    t_global_G = _tile_tables(t_frame, G)

    # exact output dtypes of the chunk computations (qk-norm etc. may upcast)
    q_sd, k_sd, v_sd = jax.eval_shape(
        lambda g_: qkv_parts(gp, g_, bcfg_g, t_global_G),
        jax.ShapeDtypeStruct((B, G * Ptok, C), dt),
    )
    kv_sd = jax.eval_shape(
        lambda d_, c_, s_: jnp.concatenate(
            block_context_kv(rp, d_, bcfg, (c_, s_)), axis=-1
        ),
        jax.ShapeDtypeStruct((B, G * R5, C), dt),
        jax.ShapeDtypeStruct((B, G * R5, t_frame[0].shape[-1]),
                             t_frame[0].dtype),
        jax.ShapeDtypeStruct((B, G * R5, t_frame[1].shape[-1]),
                             t_frame[1].dtype),
    )

    fo_buf = jnp.zeros((B, A, Ptok, C), dt)
    k_buf = jnp.zeros((B, Hh, A * Ptok, hd), k_sd.dtype)
    v_buf = jnp.zeros((B, Hh, A * Ptok, hd), v_sd.dtype)
    kv_buf = jnp.zeros((B, Hh, A * R5, 2 * hd), kv_sd.dtype)

    def p1(s, bufs):
        fo_buf, k_buf, v_buf, kv_buf = bufs
        a0 = s * G
        tc = jax.lax.dynamic_slice_in_dim(tokens, a0, G, axis=1)
        t = frame_block_sharded(
            fp, tc.reshape(B * G, Ptok, C), bcfg, t_frame
        )
        fo = t.reshape(B, G, Ptok, C)
        idx_c = jax.lax.dynamic_slice_in_dim(idx_l, a0, G, axis=1)
        down = jnp.take_along_axis(
            fo, idx_c[..., None], axis=2
        ).reshape(B, G * R5, C)
        down_cos = t_frame[0][idx_c].reshape(B, G * R5, -1)
        down_sin = t_frame[1][idx_c].reshape(B, G * R5, -1)
        kv2 = jnp.concatenate(
            block_context_kv(rp, down, bcfg, (down_cos, down_sin)), axis=-1
        )
        _, kc, vc = qkv_parts(
            gp, fo.reshape(B, G * Ptok, C), bcfg_g, t_global_G
        )
        return (
            jax.lax.dynamic_update_slice_in_dim(fo_buf, fo, a0, axis=1),
            jax.lax.dynamic_update_slice_in_dim(k_buf, kc, a0 * Ptok, axis=2),
            jax.lax.dynamic_update_slice_in_dim(v_buf, vc, a0 * Ptok, axis=2),
            jax.lax.dynamic_update_slice_in_dim(kv_buf, kv2, a0 * R5, axis=2),
        )

    fo_buf, k_buf, v_buf, kv_buf = jax.lax.fori_loop(
        0, nck, p1, (fo_buf, k_buf, v_buf, kv_buf)
    )

    def p2(s, go_buf):
        a0 = s * G
        xc = jax.lax.dynamic_slice_in_dim(
            fo_buf, a0, G, axis=1
        ).reshape(B, G * Ptok, C)
        qc, _, _ = qkv_parts(gp, xc, bcfg_g, t_global_G)
        o = attention_heads_out(gp["attn"], qc, k_buf, v_buf, bcfg_g.attn)
        out = attn_out_mlp(gp, o, xc, bcfg_g)
        return jax.lax.dynamic_update_slice_in_dim(
            go_buf, out.reshape(B, G, Ptok, C).astype(dt), a0, axis=1
        )

    go_buf = jax.lax.fori_loop(0, nck, p2, jnp.zeros((B, A, Ptok, C), dt))
    return go_buf, fo_buf, go_buf, (kv_buf,)


def _build_cache_scan(cfg: AggregatorConfig, stacks, tokens, idx,
                      B: int, A: int, Ptok: int, R5: int, t_frame, t_global,
                      anchor_chunk: Optional[int] = None):
    """Scan ``len(idx)`` build layers: (tokens', (kvs, frame_cam, global_cam)).

    Shared by the one-shot build (full depth) and the host-staged build
    (a contiguous layer segment at a time); ``stacks`` are the per-layer
    (frame, global, reloc) block params with leading dim == idx.shape[0].
    With ``anchor_chunk`` set (and dividing A, "kv2" layout), each layer runs
    the anchor-chunked two-pass variant (:func:`_build_layer_chunked`) whose
    peak scales with the chunk size instead of the scene size.
    """
    C = cfg.embed_dim
    bcfg = cfg.block_cfg
    bcfg_g = cfg.global_block_cfg

    chunked = (
        anchor_chunk is not None
        and 0 < anchor_chunk < A
        and A % anchor_chunk == 0
        and cfg.cache_layout == "kv2"
    )

    from ..parallel.sp_block import frame_block_sharded, global_block_ring

    def layer(tokens, fp, gp, rp, idx_l):
        if chunked:
            return _build_layer_chunked(
                cfg, fp, gp, rp, tokens, idx_l, B, A, Ptok, R5, t_frame,
                anchor_chunk,
            )
        t = tokens.reshape(B * A, Ptok, C)
        t = constrain(t, (DATA_AXIS, CONTEXT_AXIS), None, None)
        t = frame_block_sharded(fp, t, bcfg, t_frame)
        t = t.reshape(B, A, Ptok, C)
        frame_out = t
        down = jnp.take_along_axis(t, idx_l[..., None], axis=2).reshape(B, A * R5, C)
        # the compressed-scene token axis (A*R5) context-shards: the cache
        # this produces is the scan output below, and keeping it sharded is
        # what lets scenes grow past one chip's HBM (SURVEY §2.6; budget in
        # SCENE_SHARDED_r03.json)
        down = constrain(down, DATA_AXIS, CONTEXT_AXIS, None)
        down_cos = t_frame[0][idx_l].reshape(B, A * R5, -1)
        down_sin = t_frame[1][idx_l].reshape(B, A * R5, -1)
        kv = block_context_kv(rp, down, bcfg, (down_cos, down_sin))
        if cfg.cache_layout == "kv2":
            # (B, H, N, d) x2 -> (B, H, N, 2d): k/v interleaved on the lane
            # axis — 128 lanes exact (see AggregatorConfig.cache_layout)
            kv = (jnp.concatenate(kv, axis=-1),)
        elif cfg.cache_layout == "packed":
            # (B, H, N, d) -> (B, N, C): dense lane tiling for the stored
            # cache
            kv = tuple(
                t_.transpose(0, 2, 1, 3).reshape(B, A * R5, C) for t_ in kv
            )
        g = constrain(t.reshape(B, A * Ptok, C), DATA_AXIS, CONTEXT_AXIS, None)
        if cfg.global_attn_impl in ("ring", "auto"):
            g = global_block_ring(gp, g, bcfg_g, t_global)
        else:
            g = block(gp, g, bcfg_g, t_global)
        global_out = g.reshape(B, A, Ptok, C)
        return global_out, frame_out, global_out, kv

    if cfg.remat:
        layer = jax.checkpoint(layer, prevent_cse=False)

    def body(carry, xs):
        (fp, gp, rp), idx_l = xs
        new_tokens, frame_out, global_out, kv = layer(carry, fp, gp, rp, idx_l)
        return new_tokens, (kv, frame_out[:, :, 0], global_out[:, :, 0])

    return jax.lax.scan(body, tokens, (stacks, idx))


def aggregator_build_cache(
    p,
    cfg: AggregatorConfig,
    anchor_images: jax.Array,
    rank: int,
    subsample_key: Optional[jax.Array] = None,
    subsample_indices: Optional[jax.Array] = None,
    anchor_chunk: Optional[int] = None,
    chunk_embed: bool = True,
):
    """Phase 1: run anchors, record per-layer reloc-block K/V of the
    compressed scene tokens.

    ``anchor_chunk``: process the build in chunks of this many anchor frames
    (see :func:`_build_layer_chunked`) — bit-equal to the unchunked build.
    ``chunk_embed``: also chunk the ViT patch embedding (the embed program's
    peak otherwise scales with the scene). The chunked ViT is a DIFFERENT
    XLA program (batch G vs batch A), so bf16 reduction-order deviations of
    the PARITY_BF16 class appear relative to the unchunked embed; set False
    for bit-equality at the cost of the embed peak.

    Equivalent to ``SailRecon.tmp_forward`` (``models/sail_recon.py:176-199``)
    + the cache-fill branch of ``Attention.forward`` — but pure: returns a
    static-shape cache pytree kept in HBM (sharded over the context axis under
    pjit) instead of mutating module state onto the host.

    Returns:
        (cache, cam_token_last_layer). Cache pytree per ``cfg.cache_layout``:
        "kv2" (default) dict(kv=(depth, B, heads, A*(rank+5), 2*head_dim))
        with k/v interleaved on the 128-exact lane axis; "packed"
        dict(k, v) heads-merged (depth, B, A*(rank+5), C); "heads"
        dict(k, v) raw (depth, B, heads, A*(rank+5), head_dim).
    """
    B, A, H, W, _ = anchor_images.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    is_query = jnp.asarray([False] * A)
    tokens, P0 = _embed_frames(
        p, cfg, anchor_images, is_query,
        frame_chunk=anchor_chunk if chunk_embed else None,
    )
    Ptok = P0 + cfg.patch_start_idx
    rank = min(rank, P0)
    R5 = rank + cfg.patch_start_idx

    idx = _make_indices(cfg, subsample_key, subsample_indices, B, A, P0, rank)
    t_frame = _rope_tables_frame(cfg, gh, gw)
    t_global = _tile_tables(t_frame, A)

    stacks = (p["frame_blocks"], p["global_blocks"], p["reloc_blocks"])
    tokens, (kvs, frame_cam, global_cam) = _build_cache_scan(
        cfg, stacks, tokens, idx, B, A, Ptok, R5, t_frame, t_global,
        anchor_chunk=anchor_chunk,
    )

    if cfg.cache_layout == "kv2":
        cache = {"kv": kvs[0]}  # (depth, B, heads, A*R5, 2*hd)
    else:
        cache = {"k": kvs[0], "v": kvs[1]}  # (depth, B, heads, A*R5, hd)
    cam_token_last_layer = jnp.concatenate(
        [frame_cam[-1], global_cam[-1]], axis=-1
    ).astype(jnp.float32)
    return cache, cam_token_last_layer


def aggregator_reloc(
    p,
    cfg: AggregatorConfig,
    cache,
    images: jax.Array,
) -> Tuple[Dict[int, jax.Array], int]:
    """Phase 2: localise query frames against a frozen scene cache.

    Batched over query frames (each query attends the cache + itself only) —
    replacing the sequential python loop at ``train/demo_imc.py:97-107``.
    Mirrors ``Aggregator.forward_with_cache`` (``aggregator.py:435-578``).
    """
    B, Q, H, W, _ = images.shape
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    is_query = jnp.asarray([True] * Q)
    tokens, P0 = _embed_frames(p, cfg, images, is_query)
    C = cfg.embed_dim
    Ptok = P0 + cfg.patch_start_idx
    t_frame = _rope_tables_frame(cfg, gh, gw)
    bcfg = cfg.block_cfg

    from ..layers.attention import attention_heads_out
    from ..layers.block import attn_out_mlp, qkv_parts
    from ..parallel.sp_block import frame_block_sharded

    def layer(tokens, fp, rp, kv_l, layer_idx=None):
        if cfg.cache_layout == "kv2":
            # shared with the host-staged path — the kernel consumes the
            # depth-stacked kv2 cache in place, layer_idx in its BlockSpec
            return _reloc_layer_kv2(
                cfg, fp, rp, tokens, cache["kv"], layer_idx, t_frame,
                B, Q, Ptok,
            )
        t = tokens.reshape(B * Q, Ptok, C)
        t = constrain(t, (DATA_AXIS, CONTEXT_AXIS), None, None)
        t = frame_block_sharded(fp, t, bcfg, t_frame)
        frame_out = t.reshape(B, Q, Ptok, C)
        if cfg.cache_layout == "packed" and kv_l is not None:
            # unpack this layer's (B, N, C) cache slice to the (B, H, N, d)
            # kernel layout — transient, vs a 2x-padded resident cache
            H_, d_ = cfg.num_heads, cfg.head_dim
            kv_l = tuple(
                t_.reshape(t_.shape[0], t_.shape[1], H_, d_).transpose(
                    0, 2, 1, 3
                )
                for t_ in kv_l
            )
        # reloc block against cached context K/V — frame-major layout: each
        # query frame attends [scene cache ‖ itself], expressed by the
        # (B*Q, P, C) vs (B, H, n_ctx, hd) batch split (no mask needed);
        # qkv_parts / attn_out_mlp give this site the same fused kernels as
        # the joint-forward reloc block
        q, k, v = qkv_parts(rp, t, bcfg, t_frame)
        o = attention_heads_out(rp["attn"], q, k, v, bcfg.attn, extra_kv=kv_l)
        out = attn_out_mlp(rp, o, t, bcfg)
        reloc_out = out.reshape(B, Q, Ptok, C)
        return reloc_out, frame_out, reloc_out

    if cfg.remat:
        layer = jax.checkpoint(layer, prevent_cse=False, static_argnums=(4,))

    tap_list = tuple(cfg.intermediate_layer_idx)
    assert tap_list == tuple(sorted(tap_list))
    assert tap_list[-1] == cfg.depth - 1, "last layer must be an intermediate tap"

    if cfg.cache_layout == "kv2" or cfg.reloc_consume == "unrolled":
        # python-unrolled depth loop: no while loop, so there is nothing for
        # the windowed-DMA pass to copy the cache stacks into (the copy
        # costs a full extra cache footprint under "scan"; see the
        # reloc_consume field note). With "kv2" the cache is consumed in
        # place by the kernel; legacy layouts statically slice per layer.
        taps: Dict[int, jax.Array] = {}
        cur = tokens
        for l in range(cfg.depth):
            fp = jax.tree.map(lambda x: x[l], p["frame_blocks"])
            rp = jax.tree.map(lambda x: x[l], p["reloc_blocks"])
            if cfg.cache_layout == "kv2":
                kv_l = None
            else:
                # tie layer l's cache slice to layer l-1's output: without
                # the barrier XLA prefetches every layer's slice up front
                # and the whole cache is live twice (measured slope 0.080
                # GB/anchor vs scan's 0.056)
                k_l, v_l, cur = jax.lax.optimization_barrier(
                    (cache["k"][l], cache["v"][l], cur)
                )
                kv_l = (k_l, v_l)
            cur, frame_out, reloc_out = layer(cur, fp, rp, kv_l, l)
            if l in tap_list:
                taps[l] = jnp.concatenate(
                    [frame_out, reloc_out], axis=-1
                ).astype(jnp.float32)
        taps[-1] = taps[tap_list[-1]]
        return taps, cfg.patch_start_idx

    # "scan": single scan with in-carry tap accumulation (see
    # aggregator_forward)
    n_tap = len(tap_list)
    tap_idx_arr = jnp.asarray(tap_list, jnp.int32)
    taps_buf = jnp.zeros((n_tap, B, Q, Ptok, 2 * C), jnp.float32)

    def body(carry, xs):
        tokens, taps_buf = carry
        (fp, rp), kv, l = xs
        new_tokens, frame_out, reloc_out = layer(
            tokens, fp, rp, (kv["k"], kv["v"]), None
        )
        is_tap = jnp.any(tap_idx_arr == l)
        slot = jnp.sum((tap_idx_arr < l).astype(jnp.int32))

        def write(tb):
            feat = jnp.concatenate(
                [frame_out, reloc_out], axis=-1
            ).astype(jnp.float32)
            return jax.lax.dynamic_update_index_in_dim(tb, feat, slot, 0)

        taps_buf = jax.lax.cond(is_tap, write, lambda tb: tb, taps_buf)
        return (new_tokens, taps_buf), None

    (_, taps_buf), _ = jax.lax.scan(
        body,
        (tokens, taps_buf),
        (
            (p["frame_blocks"], p["reloc_blocks"]),
            cache,
            jnp.arange(cfg.depth, dtype=jnp.int32),
        ),
    )
    taps: Dict[int, jax.Array] = {li: taps_buf[i] for i, li in enumerate(tap_list)}
    taps[-1] = taps[tap_list[-1]]
    return taps, cfg.patch_start_idx


# ---------------------------------------------------------------------------
# host-staged build/reloc: scene size bounded by HOST RAM, not HBM
# ---------------------------------------------------------------------------


def _reloc_layer_kv2(cfg: AggregatorConfig, fp, rp, tokens, ckv, layer_idx,
                     t_frame, B: int, Q: int, Ptok: int):
    """One reloc layer against a kv2 cache stack (device- or segment-depth).

    Shared by the resident-cache unrolled path (:func:`aggregator_reloc`)
    and the host-staged path; ``layer_idx`` indexes ``ckv``'s leading dim
    inside the kernel's BlockSpec (no HLO slice, no transient).
    """
    C = cfg.embed_dim
    bcfg = cfg.block_cfg
    from ..layers.block import attn_out_mlp, qkv_parts
    from ..ops.flash_attention import packed_ctx_attention
    from ..parallel.sp_block import frame_block_sharded

    t = tokens.reshape(B * Q, Ptok, C)
    t = constrain(t, (DATA_AXIS, CONTEXT_AXIS), None, None)
    t = frame_block_sharded(fp, t, bcfg, t_frame)
    frame_out = t.reshape(B, Q, Ptok, C)
    q, k, v = qkv_parts(rp, t, bcfg, t_frame)
    o = packed_ctx_attention(q, k, v, ckv, layer_idx, impl=bcfg.attn.impl)
    out = attn_out_mlp(rp, o, t, bcfg)
    reloc_out = out.reshape(B, Q, Ptok, C)
    return reloc_out, frame_out, reloc_out


@_lru_cache(maxsize=8)
def _staged_build_programs_cached(cfg, B, A, H, W, rank, num_segments,
                                  anchor_chunk, chunk_embed):
    return _staged_build_programs_impl(cfg, B, A, H, W, rank, num_segments,
                                       None, anchor_chunk, chunk_embed)


def staged_build_programs(cfg: AggregatorConfig, B: int, A: int, H: int,
                          W: int, rank: int, num_segments: int,
                          subsample_indices=None,
                          anchor_chunk: Optional[int] = None,
                          chunk_embed: bool = True):
    """(embed_jit, run_segment_jit, seg_len) — the two programs of the
    host-staged build, exposed for AOT memory analysis
    (``tools/scene_staged_capacity.py``). Cached per geometry so repeated
    staged builds reuse the compiled executables (explicit
    ``subsample_indices`` — the golden-test path — bypass the cache: arrays
    are not hashable)."""
    if subsample_indices is None:
        return _staged_build_programs_cached(cfg, B, A, H, W, rank,
                                             num_segments, anchor_chunk,
                                             chunk_embed)
    return _staged_build_programs_impl(cfg, B, A, H, W, rank, num_segments,
                                       subsample_indices, anchor_chunk,
                                       chunk_embed)


def _staged_build_programs_impl(cfg, B, A, H, W, rank, num_segments,
                                subsample_indices, anchor_chunk=None,
                                chunk_embed=True):
    from functools import partial

    assert cfg.cache_layout == "kv2", "staged build requires the kv2 layout"
    assert cfg.depth % num_segments == 0, (
        f"depth {cfg.depth} must divide into {num_segments} segments")
    seg_len = cfg.depth // num_segments
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    P0 = gh * gw
    Ptok = P0 + cfg.patch_start_idx
    R5 = min(rank, P0) + cfg.patch_start_idx

    @jax.jit
    def embed(p, images, key):
        is_query = jnp.asarray([False] * A)
        tokens, P0_ = _embed_frames(
            p, cfg, images, is_query,
            frame_chunk=anchor_chunk if chunk_embed else None,
        )
        idx = _make_indices(cfg, key, subsample_indices, B, A, P0_, rank)
        return tokens, idx

    @partial(jax.jit, donate_argnums=(1,))
    def run_segment(p, tokens, idx, start):
        stacks = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, start, seg_len, 0),
            (p["frame_blocks"], p["global_blocks"], p["reloc_blocks"]),
        )
        idx_seg = jax.lax.dynamic_slice_in_dim(idx, start, seg_len, 0)
        t_frame = _rope_tables_frame(cfg, gh, gw)
        t_global = _tile_tables(t_frame, A)
        tokens, (kvs, frame_cam, global_cam) = _build_cache_scan(
            cfg, stacks, tokens, idx_seg, B, A, Ptok, R5, t_frame, t_global,
            anchor_chunk=anchor_chunk,
        )
        return tokens, kvs[0], frame_cam[-1], global_cam[-1]

    return embed, run_segment, seg_len


def aggregator_build_cache_staged(
    p,
    cfg: AggregatorConfig,
    anchor_images,
    rank: int,
    subsample_key: Optional[jax.Array] = None,
    subsample_indices: Optional[jax.Array] = None,
    num_segments: int = 4,
    anchor_chunk: Optional[int] = None,
    chunk_embed: bool = True,
):
    """Host-staged phase 1: the cache streams to HOST RAM as it is built.

    The reference's scene size is bounded by host RAM because its cache is
    CPU-offloaded (``sailrecon/layers/attention.py:92-97``); the one-shot
    :func:`aggregator_build_cache` instead keeps the whole cache in HBM,
    which makes the BUILD the binding capacity bound (SCENE_CAPACITY.json:
    0.0712 GB/anchor ≈ 0.028 cache + 0.043 activations). This variant is the
    TPU-idiomatic answer: depth splits into ``num_segments`` contiguous
    layer ranges, each compiled ONCE (segment start is a traced scalar, so
    all segments share one executable); after each segment the kv2 slice is
    fetched to host and its device buffer freed. Device peak holds only
    activations + one segment's cache (0.028/num_segments GB/anchor).

    Returns ``({"kv": np.ndarray (depth, B, H, A*R5, 2hd)}, cam_token np)``
    — a HOST cache, consumed by :func:`aggregator_reloc_staged` (or
    uploadable wholesale to :func:`aggregator_reloc` when it fits).
    """
    import numpy as np

    B, A, H, W, _ = anchor_images.shape
    seg_len = cfg.depth // num_segments
    embed, run_segment, _ = staged_build_programs(
        cfg, B, A, H, W, rank, num_segments,
        subsample_indices=subsample_indices, anchor_chunk=anchor_chunk,
        chunk_embed=chunk_embed,
    )
    tokens, idx = embed(p, anchor_images, subsample_key)
    host_kv = []
    fc = gc = None
    for s in range(num_segments):
        tokens, kv_seg, fc, gc = run_segment(
            p, tokens, idx, jnp.asarray(s * seg_len, jnp.int32)
        )
        host_kv.append(np.asarray(kv_seg))  # device_get; buffer freed below
        del kv_seg
    cam_token = np.concatenate(
        [np.asarray(fc), np.asarray(gc)], axis=-1
    ).astype(np.float32)
    return {"kv": np.concatenate(host_kv, axis=0)}, cam_token


@_lru_cache(maxsize=8)
def staged_reloc_programs(cfg: AggregatorConfig, B: int, Q: int, H: int,
                          W: int, num_segments: int):
    """(embed_jit, run_segment_jit, seg_len) for the host-staged reloc —
    cached per geometry and exposed for AOT memory analysis."""
    from functools import partial

    assert cfg.cache_layout == "kv2", "staged reloc requires the kv2 layout"
    assert cfg.depth % num_segments == 0
    seg_len = cfg.depth // num_segments
    gh, gw = H // cfg.patch_size, W // cfg.patch_size
    P0 = gh * gw
    Ptok = P0 + cfg.patch_start_idx
    tap_list = tuple(cfg.intermediate_layer_idx)
    assert tap_list == tuple(sorted(tap_list))
    assert tap_list[-1] == cfg.depth - 1
    tap_idx_arr_vals = tap_list

    @jax.jit
    def embed(p, images):
        is_query = jnp.asarray([True] * Q)
        tokens, _ = _embed_frames(p, cfg, images, is_query)
        return tokens

    @partial(jax.jit, donate_argnums=(1, 2))
    def run_segment(p, tokens, taps_buf, kv_seg, start):
        tap_idx_arr = jnp.asarray(tap_idx_arr_vals, jnp.int32)
        t_frame = _rope_tables_frame(cfg, gh, gw)
        cur = tokens
        for li in range(seg_len):
            l = start + li
            fp = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, l, 0, keepdims=False),
                p["frame_blocks"],
            )
            rp = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, l, 0, keepdims=False),
                p["reloc_blocks"],
            )
            cur, frame_out, reloc_out = _reloc_layer_kv2(
                cfg, fp, rp, cur, kv_seg, li, t_frame, B, Q, Ptok
            )
            is_tap = jnp.any(tap_idx_arr == l)
            slot = jnp.sum((tap_idx_arr < l).astype(jnp.int32))

            def write(tb, fo=frame_out, ro=reloc_out, s_=slot):
                feat = jnp.concatenate([fo, ro], axis=-1).astype(jnp.float32)
                return jax.lax.dynamic_update_index_in_dim(tb, feat, s_, 0)

            taps_buf = jax.lax.cond(is_tap, write, lambda tb: tb, taps_buf)
        return cur, taps_buf

    return embed, run_segment, seg_len


def aggregator_reloc_staged(
    p,
    cfg: AggregatorConfig,
    host_cache,
    images,
    num_segments: int = 4,
) -> Tuple[Dict[int, jax.Array], int]:
    """Phase 2 against a HOST-RAM cache: upload one layer segment at a time.

    Device peak holds query activations + one segment's kv2 slice — the
    serving-side mirror of :func:`aggregator_build_cache_staged`. Each
    segment is one dispatch whose cache argument is a host numpy slice (the
    transfer happens at dispatch; on a directly-attached host this is PCIe
    bandwidth, through the remote-TPU tunnel it is the tunnel's rate).
    """
    seg_len = cfg.depth // num_segments
    B, Q, H, W, _ = images.shape
    P0 = (H // cfg.patch_size) * (W // cfg.patch_size)
    Ptok = P0 + cfg.patch_start_idx
    C = cfg.embed_dim
    tap_list = tuple(cfg.intermediate_layer_idx)
    n_tap = len(tap_list)
    embed, run_segment, _ = staged_reloc_programs(cfg, B, Q, H, W,
                                                  num_segments)
    tokens = embed(p, jnp.asarray(images))
    taps_buf = jnp.zeros((n_tap, B, Q, Ptok, 2 * C), jnp.float32)
    kv = host_cache["kv"]
    for s in range(num_segments):
        lo = s * seg_len
        tokens, taps_buf = run_segment(
            p, tokens, taps_buf, kv[lo : lo + seg_len],
            jnp.asarray(lo, jnp.int32),
        )
    taps: Dict[int, jax.Array] = {
        li: taps_buf[i] for i, li in enumerate(tap_list)
    }
    taps[-1] = taps[tap_list[-1]]
    return taps, cfg.patch_start_idx
