"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gmf_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, data_parallel_shardings,
)
from gmf_tpu.data import SyntheticCorrespondenceLoader
from gmf_tpu.models import PointDSC
from gmf_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step


class TestMesh:
    def test_mesh_shapes(self):
        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1}
        mesh2 = make_mesh(n_data=4, n_model=2)
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_shard_batch_places_on_devices(self):
        mesh = make_mesh()
        x = {"a": np.arange(16.0).reshape(8, 2)}
        sharded = shard_batch(x, mesh)
        assert len(sharded["a"].sharding.device_set) == 8

    def test_psum_over_mesh(self):
        mesh = make_mesh()
        repl, batched = data_parallel_shardings(mesh)
        x = jax.device_put(np.ones((8, 4), np.float32), batched)

        @jax.jit
        def mean_all(x):
            return jnp.mean(x)  # XLA inserts the cross-device reduction

        assert float(mean_all(x)) == 1.0

    def test_process_shard_disjoint_and_complete(self):
        from gmf_tpu.parallel.mesh import process_shard

        items = list(range(23))
        shards = [process_shard(items, p, 4) for p in range(4)]
        flat = sorted(x for s in shards for x in s)
        assert flat == items  # complete, disjoint
        assert all(len(s) in (5, 6) for s in shards)
        # single-host identity (jax.process_count() == 1 here)
        assert process_shard(items) == items


class TestDataParallelTrainStep:
    def test_sharded_step_matches_single_device(self):
        """One DP train step on the 8-device mesh: runs, updates params,
        and agrees with the unsharded step."""
        model = PointDSC(num_layers=1, num_channels=16, ratio=0.1, k=10)
        loader = SyntheticCorrespondenceLoader(
            batch_size=8, num_corr=64, steps_per_epoch=1, image_hw=(16, 16))
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
        variables = model.init(
            jax.random.PRNGKey(0), batch["corr_pos"], batch["src_keypts"],
            batch["tgt_keypts"], batch["p_image"], batch["q_image"])
        cfg = TrainConfig()
        opt = make_optimizer(cfg, 10)
        opt_state = opt.init(variables["params"])
        step = jax.jit(make_train_step(model, opt, cfg))

        # Single-device result
        p1, _, _, m1 = step(variables["params"], variables["batch_stats"],
                            opt_state, batch, jnp.asarray(1))

        # Data-parallel result
        mesh = make_mesh()
        params = replicate(variables["params"], mesh)
        bstats = replicate(variables["batch_stats"], mesh)
        ostate = replicate(opt_state, mesh)
        sbatch = shard_batch(batch, mesh)
        p8, _, _, m8 = step(params, bstats, ostate, sbatch, jnp.asarray(1))

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-4)
        l1 = jax.tree.leaves(p1)[0]
        l8 = jax.tree.leaves(p8)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), atol=1e-5)
