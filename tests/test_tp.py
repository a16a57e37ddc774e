"""Tensor-parallelism tests: Megatron-style param sharding over the `model`
mesh axis (parallel/sharding.py::param_sharding) must leave the training-step
math unchanged — GSPMD inserts the all-reduces, the numbers must match the
single-device program."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import PartitionSpec as P

from self_supervise_sfm_tpu.parallel import sharding as Sh
from self_supervise_sfm_tpu.train import loop as L
from tests.test_train_step import batch, tiny_model_cfg, tiny_train_cfg  # noqa: F401


class TestParamShardingRules:
    def test_megatron_rules(self):
        mesh = Sh.make_mesh(num_data=2, num_context=1, num_model=2)
        # stacked-layer shapes like the scanned aggregator blocks carry
        tree = {
            "blocks": {
                "attn": {
                    "qkv": {"w": jnp.zeros((4, 64, 192)), "b": jnp.zeros((4, 192))},
                    "proj": {"w": jnp.zeros((4, 64, 64)), "b": jnp.zeros((4, 64))},
                },
                "mlp": {
                    "fc1": {"w": jnp.zeros((4, 64, 256)), "b": jnp.zeros((4, 256))},
                    "fc2": {"w": jnp.zeros((4, 256, 64)), "b": jnp.zeros((4, 64))},
                },
            },
            # patch-embed conv named "proj" but NOT under attn: untouched by tp
            "patch_embed": {"proj": {"w": jnp.zeros((14, 14, 3, 64))}},
        }
        sh = Sh.param_sharding(mesh, tree, tp=True)

        def spec(*path):
            node = sh
            for k in path:
                node = node[k]
            return node.spec

        assert spec("blocks", "attn", "qkv", "w") == P(None, None, "model")
        assert spec("blocks", "attn", "qkv", "b") == P(None, "model")
        assert spec("blocks", "attn", "proj", "w") == P(None, "model", None)
        assert spec("blocks", "attn", "proj", "b") == P(None, None)
        assert spec("blocks", "mlp", "fc1", "w") == P(None, None, "model")
        assert spec("blocks", "mlp", "fc2", "w") == P(None, "model", None)
        assert spec("patch_embed", "proj", "w") == P(None, None, None, None)

    def test_fsdp_composes_with_tp(self):
        mesh = Sh.make_mesh(num_data=2, num_context=1, num_model=2)
        tree = {"attn": {"qkv": {"w": jnp.zeros((512, 768))}}}
        sh = Sh.param_sharding(mesh, tree, fsdp=True, tp=True)
        # tp takes the output dim; fsdp takes the largest remaining dim
        assert sh["attn"]["qkv"]["w"].spec == P("data", "model")


class TestTPTrainStep:
    def test_tp_matches_single(self, batch):
        """model=2 mesh result == single-device result."""
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        mcfg, tcfg = tiny_model_cfg(), tiny_train_cfg()

        state0 = L.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        ref_state, ref_metrics = L.make_train_step(mcfg, tcfg)(state0, jbatch)

        mesh = Sh.make_mesh(num_data=1, num_context=1, num_model=2)
        state1 = L.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        state1 = jax.device_put(
            state1,
            jax.tree.map(
                lambda s: s,
                {
                    "params": Sh.param_sharding(mesh, state1["params"], tp=True),
                    "opt_state": Sh.param_sharding(mesh, state1["opt_state"], tp=True),
                    "step": Sh.replicated(mesh),
                    "key": Sh.replicated(mesh),
                },
            ),
        )
        with Sh.activate_mesh(mesh):
            out_state, out_metrics = L.make_train_step(mcfg, tcfg)(state1, jbatch)

        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]), atol=1e-5
        )
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            ref_state["params"], jax.device_get(out_state["params"]),
        )
        assert max(jax.tree.leaves(diffs)) < 1e-4

    def test_dp_sp_tp_combined(self, batch):
        """Full 3-D mesh (data=2, context=2, model=2) over 8 devices."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mcfg, tcfg = tiny_model_cfg(), tiny_train_cfg()

        state0 = L.init_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        ref_state, ref_metrics = L.make_train_step(mcfg, tcfg)(state0, jbatch)

        mesh = Sh.make_mesh(num_data=2, num_context=2, num_model=2)
        tcfg_f = L.TrainConfig(**{**tcfg.__dict__, "fsdp": True})
        state1 = L.init_train_state_sharded(
            jax.random.PRNGKey(0), mcfg, tcfg_f, mesh, fsdp=True, tp=True
        )
        with Sh.activate_mesh(mesh):
            step = L.make_train_step(mcfg, tcfg_f)
            sharded = Sh.shard_batch(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
                mesh,
            )
            out_state, out_metrics = step(state1, sharded)

        np.testing.assert_allclose(
            float(out_metrics["loss"]), float(ref_metrics["loss"]), atol=1e-5
        )
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            ref_state["params"], jax.device_get(out_state["params"]),
        )
        assert max(jax.tree.leaves(diffs)) < 1e-4
