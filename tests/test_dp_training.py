r"""Data-parallel training over the virtual 8-device mesh: loop integration
and gradient equivalence with the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from robustcap_tpu.nn.rnn import init_rnn_params
from robustcap_tpu.parallel import make_dp_train_step, make_mesh
from robustcap_tpu.train import SeqDataset, make_forward_fn, masked_mse, train


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
class TestDPTraining:
    def test_dp_step_matches_single_device(self):
        mesh = make_mesh()
        n = len(jax.devices())
        params = init_rnn_params(jax.random.PRNGKey(0), 8, 2, 16, 2)
        tx = optax.adam(1e-2)
        opt_state = tx.init(params)
        fwd = make_forward_fn(0.0)
        rng = np.random.RandomState(0)
        B = 2 * n
        xs = jnp.asarray(rng.randn(6, B, 8), jnp.float32)
        ys = jnp.asarray(rng.randn(6, B, 2), jnp.float32)
        lengths = jnp.full((B,), 6, jnp.int32)

        dp_step = make_dp_train_step(fwd, masked_mse, tx, mesh)
        p_dp, _, loss_dp = dp_step(params, opt_state, xs, ys, lengths, None,
                                   jax.random.PRNGKey(1))

        def local_step(params, opt_state):
            def compute(p):
                return masked_mse(fwd(p, xs, lengths, None, None), ys,
                                  lengths)
            loss, grads = jax.value_and_grad(compute)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), loss

        p_ref, loss_ref = jax.jit(local_step)(params, opt_state)
        np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_train_loop_with_mesh(self, tmp_path):
        mesh = make_mesh()
        rng = np.random.RandomState(0)
        data = [rng.randn(12, 8).astype(np.float32) for _ in range(16)]
        label = [d[:, :2] * 0.5 for d in data]
        ds = SeqDataset(data, label)
        params = init_rnn_params(jax.random.PRNGKey(0), 8, 2, 16, 2)
        out = train(params, make_forward_fn(0.0), masked_mse, ds, ds,
                    str(tmp_path), num_epoch=2, batch_size=8,
                    learning_rate=1e-2, mesh=mesh, log_metrics=True)
        assert out is not None
        import json
        recs = [json.loads(l) for l in
                open(tmp_path / "metrics.jsonl").read().splitlines()]
        assert all(np.isfinite(r["train_loss"]) for r in recs)
