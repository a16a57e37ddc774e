"""End-to-end training-step tests on synthetic scenes (tiny model, CPU).

Covers: loss finiteness/gradient flow, multi-device pjit data+context
parallelism vs single-device numerical equality, and checkpoint round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_supervise_sfm_tpu.data.imc2021 import IMC2021Scenes, stack_scenes
from self_supervise_sfm_tpu.data.synthetic import make_synthetic_dataset
from self_supervise_sfm_tpu.models import sailrecon as M
from self_supervise_sfm_tpu.parallel import sharding as Sh
from self_supervise_sfm_tpu.train import loop as L
from self_supervise_sfm_tpu.train.loss import LossConfig


IMG = 28  # 2x2 grid with patch 14


def tiny_model_cfg():
    return M.make_config(
        img_size=IMG, embed_dim=64, depth=4, num_heads=4,
        vit_depth=2, intermediate_layer_idx=(0, 1, 2, 3), attn_impl="dense",
    )


def tiny_train_cfg():
    return L.TrainConfig(
        max_lr=1e-4, warmup_steps=10, total_steps=100, rank=2, num_images=2,
        loss=LossConfig(num_bins=50),
    )


@pytest.fixture(scope="module")
def batch():
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_dataset(root, num_scenes=2, num_images=3,
                               image_size=(40, 32))
        ds = IMC2021Scenes(root, sample_num=128, num_images=2, target_size=IMG)
        rng = np.random.default_rng(0)
        scenes = [ds.load_scene(i, rng) for i in range(2)]
        return stack_scenes(scenes)


class TestLossGoldenVsReference:
    """End-to-end parity of the composed training objective AND its full
    train-step gradient vs the reference.

    One synthetic scene flows through BOTH frameworks on identical converted
    weights: the reference path is the literal ``train_imc`` wiring
    (``prepare_model_input`` -> ``SailRecon.forward`` ->
    ``compute_loss`` (``train/train_imc.py:141-268``) -> ``.backward()``);
    ours is ``models.sailrecon.forward`` -> ``train/loss.py:scene_loss`` ->
    ``jax.grad``. Loss values and every per-leaf dL/dparam must agree.

    The CDF module is built with the batch's real per-frame pair indices
    (the module's intended semantics, validated by its own self-test,
    ``cdf_loss.py:263-524``). The trainer's literal construction with dummy
    ``[0]`` indices (``train_imc.py:338-346``) either indexes out of bounds
    (>1 pair) or collapses every frame into one histogram (1 pair) — a
    reference bug not replicated, like the unset ``min_rank``
    (SURVEY §7.2).
    """

    IMG = 28
    DIM = 384
    DEPTH = 4
    VIT_DEPTH = 12
    HEADS = 6
    S = 3
    K = 64

    def _build_reference_model(self, torch):
        """Toy reference SailRecon: the real class/forward wired to
        small-dim submodules (the stock ctor hard-codes ViT-L/24,
        ``sail_recon.py:24-68``)."""
        from sailrecon.models.sail_recon import SailRecon
        from sailrecon.models.aggregator import Aggregator
        from sailrecon.heads.camera_head import CameraHead
        from sailrecon.heads.dpt_head import DPTHead

        torch.manual_seed(5)
        tm = SailRecon.__new__(SailRecon)
        torch.nn.Module.__init__(tm)
        tm.aggregator = Aggregator(
            img_size=self.IMG, patch_size=14, embed_dim=self.DIM,
            depth=self.DEPTH, num_heads=self.HEADS,
            patch_embed="dinov2_vits14_reg",
            intermediate_layer_idx=[0, 1, 2, 3], kv_cache=False,
        )
        head_kw = dict(dim_in=2 * self.DIM, features=8,
                       out_channels=[8, 16, 32, 32],
                       intermediate_layer_idx=[0, 1, 2, 3],
                       conf_activation="expp1")
        tm.camera_head = CameraHead(dim_in=2 * self.DIM)
        tm.point_head = DPTHead(output_dim=4, activation="inv_log", **head_kw)
        tm.depth_head = DPTHead(output_dim=2, activation="exp", **head_kw)
        tm.cam_token_last_layer = None
        tm.need_re_forward = False
        # Well-condition the pose decode at random init: the relu'd FoV
        # sits at the tan(0) singularity (focal -> inf) with random
        # weights. Shrink the pose-MLP output and bias FoV/qw so the
        # 4 accumulated delta iterations land at ~1 rad FoV / unit quat.
        with torch.no_grad():
            tm.camera_head.pose_branch.fc2.weight.mul_(0.01)
            b = tm.camera_head.pose_branch.fc2.bias
            b.mul_(0.01)
            b[3] = 0.25
            b[7] = 0.25
            b[8] = 0.25
        tm.train()
        return tm

    def _our_config(self):
        from self_supervise_sfm_tpu.models.aggregator import AggregatorConfig
        from self_supervise_sfm_tpu.heads.camera import CameraHeadConfig
        from self_supervise_sfm_tpu.heads.dpt import DPTHeadConfig
        from self_supervise_sfm_tpu.layers.vit import ViTConfig

        vit = ViTConfig(img_size=self.IMG, embed_dim=self.DIM,
                        depth=self.VIT_DEPTH, num_heads=self.HEADS,
                        attn_impl="dense")
        agg = AggregatorConfig(img_size=self.IMG, embed_dim=self.DIM,
                               depth=self.DEPTH, num_heads=self.HEADS,
                               intermediate_layer_idx=(0, 1, 2, 3), vit=vit,
                               attn_impl="dense")
        head_kw = dict(dim_in=2 * self.DIM, patch_size=14,
                       intermediate_layer_idx=(0, 1, 2, 3), features=8,
                       out_channels=(8, 16, 32, 32))
        return M.SailReconConfig(
            aggregator=agg,
            camera=CameraHeadConfig(dim_in=2 * self.DIM, attn_impl="dense"),
            point=DPTHeadConfig(output_dim=4, activation="inv_log", **head_kw),
            depth=DPTHeadConfig(output_dim=2, activation="exp", **head_kw),
        )

    def test_loss_and_grad_golden_vs_reference(self):
        import tempfile

        from tests._reference import import_reference_trainer
        from self_supervise_sfm_tpu.utils import converter as C

        torch, train_imc = import_reference_trainer()
        from losses.cdf_loss import CDFLossIndexPytorch

        torch.Tensor.cuda = lambda self, *a, **k: self

        S, K = self.S, self.K
        with tempfile.TemporaryDirectory() as root:
            make_synthetic_dataset(root, num_scenes=1, num_images=S,
                                   image_size=(40, 32))
            ds = IMC2021Scenes(root, sample_num=K, num_images=S,
                               target_size=self.IMG)
            scene = ds.load_scene(0, np.random.default_rng(0))
        vs = scene["pair_valid"].astype(bool)
        assert vs.all(), "fixture scene must have no padded pairs"

        tm = self._build_reference_model(torch)
        imgs_np = scene["images"].astype(np.float32)
        batch_t = {
            "scene_name": scene["scene_name"],
            "rgb_processed": torch.from_numpy(imgs_np.transpose(0, 3, 1, 2)),
            "K_prime_to_K": torch.from_numpy(scene["K_prime_to_K"]),
            "shared_focal": False,
            "src_coords": torch.from_numpy(scene["src_coords"][vs]),
            "dst_coords": torch.from_numpy(scene["dst_coords"][vs]),
            "src_depth": torch.from_numpy(scene["src_depth"][vs]),
            "dst_depth": torch.from_numpy(scene["dst_depth"][vs]),
            "src_idx": torch.from_numpy(scene["src_idx"][vs].astype(np.int64)),
            "dst_idx": torch.from_numpy(scene["dst_idx"][vs].astype(np.int64)),
        }
        dup, no_reloc, reloc = train_imc.prepare_model_input(batch_t, "cpu")
        preds_t = tm.forward(dup, no_reloc_list=no_reloc, reloc_list=reloc,
                             fix_rank=4)
        cdf_mod = CDFLossIndexPytorch(
            min_val=0.0, max_val=15.0, num_bins=250,
            src_indices=batch_t["src_idx"], dst_indices=batch_t["dst_idx"],
            gradient_smooth=0.05, num_nodes=S,
        )
        loss_t = train_imc.compute_loss(preds_t, batch_t, "cpu", cdf_mod)["loss"]
        loss_t.backward()

        cfg = self._our_config()
        params = C.convert_sailrecon(C.torch_module_to_state_dict(tm),
                                     depth=self.DEPTH,
                                     vit_depth=self.VIT_DEPTH)
        jimgs = jnp.asarray(np.concatenate([imgs_np, imgs_np], 0)[None])
        jscene = {k: jnp.asarray(v) for k, v in scene.items()
                  if isinstance(v, np.ndarray)}
        lcfg = LossConfig()

        def loss_fn(p):
            preds = M.forward(p, cfg, jimgs, num_anchor=S, num_query=S,
                              rank=4, subsample_key=jax.random.PRNGKey(0),
                              images_duplicated=True)
            from self_supervise_sfm_tpu.train.loss import scene_loss

            return scene_loss(preds["extrinsic"][0], preds["intrinsic"][0],
                              jscene, lcfg)[0]

        loss_j, grads_j = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                                   rtol=1e-5, atol=1e-6)

        # convert the torch gradients through the SAME (purely linear)
        # converter so both gradient trees share one layout
        grad_sd = {
            name: (np.zeros(p.shape, np.float32) if p.grad is None
                   else p.grad.detach().numpy())
            for name, p in tm.named_parameters()
        }
        grads_t = C.convert_sailrecon(grad_sd, depth=self.DEPTH,
                                      vit_depth=self.VIT_DEPTH)

        flat_j = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_flatten_with_path(grads_j)[0]
        )
        flat_t = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_flatten_with_path(grads_t)[0]
        )
        assert set(flat_j) == set(flat_t)
        dpt_zero = 0
        for k in sorted(flat_j):
            a, b = np.asarray(flat_j[k]), np.asarray(flat_t[k])
            if "point_head" in k or "depth_head" in k:
                # the objective never consumes the dense heads: both
                # frameworks must agree the gradient is exactly zero
                # (torch: .grad None under find_unused_parameters)
                assert np.abs(a).max() == 0.0, k
                assert np.abs(b).max() == 0.0, k
                dpt_zero += 1
                continue
            scale = max(np.abs(b).max(), 1e-8)
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                       err_msg=k)
        assert dpt_zero > 20


class TestTrainStep:
    def test_single_device_step(self, batch):
        mcfg, tcfg = tiny_model_cfg(), tiny_train_cfg()
        state = L.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        step = L.make_train_step(mcfg, tcfg)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        state, metrics = step(state, jbatch)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
        assert int(state["step"]) == 1
        # a second step must reuse the compilation and keep making progress
        state, metrics2 = step(state, jbatch)
        assert np.isfinite(float(metrics2["loss"]))

    def test_multi_device_matches_single(self, batch):
        """(data=2, context=2) mesh result == single-device result."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mcfg, tcfg = tiny_model_cfg(), tiny_train_cfg()

        state0 = L.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        step_single = L.make_train_step(mcfg, tcfg)
        ref_state, ref_metrics = step_single(state0, jbatch)

        mesh = Sh.make_mesh(num_data=2, num_context=2)
        state1 = L.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        with Sh.activate_mesh(mesh):
            step_multi = L.make_train_step(mcfg, tcfg)
            sharded = Sh.shard_batch(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
                mesh,
            )
            out_state, out_metrics = step_multi(state1, sharded)

        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]), atol=1e-5
        )
        # parameters after one step must agree across the two programs
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            ref_state["params"], jax.device_get(out_state["params"]),
        )
        assert max(jax.tree.leaves(diffs)) < 1e-4

    def test_checkpoint_roundtrip(self, batch, tmp_path):
        from self_supervise_sfm_tpu.train.checkpoint import CheckpointManager

        mcfg, tcfg = tiny_model_cfg(), tiny_train_cfg()
        state = L.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(0, state)
        mgr.wait()
        restored = mgr.restore(template=state)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))),
            state["params"], restored["params"],
        )
        assert max(jax.tree.leaves(diffs)) == 0.0
        assert int(restored["step"]) == 0
        mgr.close()
