r"""Multi-host DCN wiring, CPU-simulated: flag gating, process-local dataset
sharding, and globally-sharded batch assembly feeding the DP train step
(repo ROADMAP item 7 / VERDICT round-1 item 10)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustcap_tpu.parallel import (dataset_shard_indices,
                                    global_batch_from_local,
                                    initialize_distributed,
                                    make_dp_train_step, make_global_mesh,
                                    process_local_batch)


class TestFlagGating:
    def test_noop_without_coordinator(self, monkeypatch):
        r"""No coordinator configured -> single-process, distributed runtime
        untouched (the behind-a-flag requirement)."""
        monkeypatch.delenv("ROBUSTCAP_COORDINATOR", raising=False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        ctx = initialize_distributed()
        assert not ctx.enabled
        assert ctx.process_index == 0
        assert ctx.process_count == 1
        assert ctx.global_device_count == len(jax.devices())


class TestDatasetSharding:
    def test_strided_partition_covers_everything(self):
        parts = [dataset_shard_indices(23, p, 4) for p in range(4)]
        joined = np.sort(np.concatenate(parts))
        np.testing.assert_array_equal(joined, np.arange(23))
        # strided: process 1 of 4 gets 1, 5, 9, ...
        np.testing.assert_array_equal(parts[1], [1, 5, 9, 13, 17, 21])
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1

    def test_process_local_batch_slices(self):
        sls = [process_local_batch(16, p, 4) for p in range(4)]
        rows = np.concatenate([np.arange(16)[s] for s in sls])
        np.testing.assert_array_equal(rows, np.arange(16))
        with pytest.raises(AssertionError, match="must divide"):
            process_local_batch(10, 0, 4)

    def test_defaults_use_jax_process_info(self):
        idx = dataset_shard_indices(8)
        np.testing.assert_array_equal(idx, np.arange(8))  # 1 process


class TestGlobalBatchAssembly:
    def test_global_array_matches_local_data(self):
        mesh = make_global_mesh()
        rng = np.random.RandomState(0)
        local = {"xs": rng.randn(8, 5).astype(np.float32),
                 "lengths": np.full(8, 7, np.int32)}
        g = global_batch_from_local(local, mesh)
        assert g["xs"].shape == (8, 5)     # process_count=1: global == local
        np.testing.assert_array_equal(np.asarray(g["xs"]), local["xs"])
        # sharded over the data axis
        assert len(g["xs"].sharding.device_set) == len(jax.devices())

    def test_feeds_dp_train_step(self):
        r"""The multi-host assembly path drives the SAME DP train step used
        single-host, producing identical updates to plain numpy inputs."""
        import optax

        from robustcap_tpu.nn.rnn import init_rnn_params
        from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
        from robustcap_tpu.train import make_forward_fn, make_fk_pose_loss

        mesh = make_global_mesh()
        model = ParametricModel(data=synthetic_smpl_data(num_verts=256))
        params = init_rnn_params(jax.random.PRNGKey(0), 141, 144, 16, 2)
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        step = make_dp_train_step(make_forward_fn(0.1),
                                  make_fk_pose_loss(model), tx, mesh)

        T, B = 6, 8
        rng = np.random.RandomState(1)
        xs = rng.randn(T, B, 141).astype(np.float32)
        ys = rng.randn(T, B, 144).astype(np.float32)
        lengths = np.full(B, T, np.int32)

        # "multi-host" path: local slice -> globally sharded arrays
        sl = process_local_batch(B)
        g = global_batch_from_local(
            {"xs": xs[:, sl], "ys": ys[:, sl]}, mesh, axis=1)
        g_len = global_batch_from_local(lengths[sl], mesh, axis=0)
        p1, _, loss1 = step(params, opt_state, g["xs"], g["ys"], g_len,
                            None, jax.random.PRNGKey(2))
        # plain single-host path
        p2, _, loss2 = step(params, opt_state, jnp.asarray(xs),
                            jnp.asarray(ys), jnp.asarray(lengths), None,
                            jax.random.PRNGKey(2))
        assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestTwoProcess:
    r"""REAL two-process jax.distributed run on localhost CPU (gloo
    collectives): exercises the actual initialize / global-array /
    cross-process-reduction path that the monkeypatched tests above only
    simulate (VERDICT r2 weakness 5)."""

    def test_two_process_dp_step(self, tmp_path):
        import json
        import os
        import socket
        import subprocess
        import sys

        with socket.socket() as s:  # free localhost port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coordinator = f"127.0.0.1:{port}"
        child = os.path.join(os.path.dirname(__file__), "_dist_child.py")

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # child sets its own (2 devices/proc)
        procs = [subprocess.Popen(
            [sys.executable, child, coordinator, "2", str(p)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True) for p in range(2)]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
            outs.append(json.loads(out.strip().splitlines()[-1]))

        by_proc = {o["proc"]: o for o in outs}
        assert set(by_proc) == {0, 1}
        for o in outs:
            assert o["enabled"] and o["procs"] == 2
            assert o["local_devices"] == 2 and o["global_devices"] == 4

        # the all-reduced quantities agree across processes and match the
        # single-process ground truth computed here
        rng = np.random.RandomState(0)
        full = rng.randn(8, 16).astype(np.float32)
        expect = float((full * full).sum())
        for o in outs:
            assert o["sum_sq"] == pytest.approx(expect, rel=1e-5)
        assert by_proc[0]["loss"] == pytest.approx(by_proc[1]["loss"],
                                                   rel=1e-6)
        assert by_proc[0]["param_leaf0"] == pytest.approx(
            by_proc[1]["param_leaf0"], rel=1e-6)

        # dataset sharding is complementary across the two processes
        assert sorted(by_proc[0]["shard_idx"]
                      + by_proc[1]["shard_idx"]) == list(range(10))
