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
