r"""LSTM stack parity against torch.nn.LSTM (the reference's backbone)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from robustcap_tpu.nn import (  # noqa: E402
    init_rnn_params, init_state, rnn_step, rnn_scan, rnn_forward_padded,
    init_net_apply, rnn_params_from_torch)


def make_torch_module(in_size=12, out_size=5, hidden=16, layers=2, seed=0,
                      with_init=False):
    torch.manual_seed(seed)
    mod = torch.nn.ModuleDict({
        "linear1": torch.nn.Linear(in_size, hidden),
        "rnn": torch.nn.LSTM(hidden, hidden, layers),
        "linear2": torch.nn.Linear(hidden, out_size),
    })
    if with_init:
        mod["init_net"] = torch.nn.Sequential(
            torch.nn.Linear(out_size, hidden), torch.nn.ReLU(),
            torch.nn.Linear(hidden, hidden * layers), torch.nn.ReLU(),
            torch.nn.Linear(hidden * layers, 2 * layers * hidden))
    return mod


def to_numpy_sd(mod):
    sd = {}
    for k, v in mod.state_dict().items():
        sd[k.replace("init_net.", "init_net.")] = v.detach().numpy()
    return sd


def torch_forward(mod, x_np, h0=None):
    with torch.no_grad():
        x = torch.from_numpy(x_np)            # [T, B, in]
        y = torch.relu(mod["linear1"](x))
        y, (h, c) = mod["rnn"](y, h0)
        y = mod["linear2"](y)
    return y.numpy(), h.numpy(), c.numpy()


class TestLSTMParity:
    def test_scan_matches_torch(self):
        mod = make_torch_module()
        params = rnn_params_from_torch(to_numpy_sd(mod))
        x = np.random.RandomState(0).randn(7, 3, 12).astype(np.float32)
        ys, (h, c) = rnn_scan(params, jnp.asarray(x))
        y_ref, h_ref, c_ref = torch_forward(mod, x)
        np.testing.assert_allclose(ys, y_ref, atol=2e-5)
        np.testing.assert_allclose(h, h_ref, atol=2e-5)
        np.testing.assert_allclose(c, c_ref, atol=2e-5)

    def test_streaming_step_equals_scan(self):
        mod = make_torch_module(seed=1)
        params = rnn_params_from_torch(to_numpy_sd(mod))
        x = np.random.RandomState(1).randn(5, 12).astype(np.float32)
        ys, _ = rnn_scan(params, jnp.asarray(x))
        state = init_state(params)
        outs = []
        for t in range(5):
            o, state = rnn_step(params, jnp.asarray(x[t]), state)
            outs.append(o)
        np.testing.assert_allclose(jnp.stack(outs), ys, atol=1e-6)

    def test_init_net_matches_torch(self):
        mod = make_torch_module(seed=2, with_init=True)
        params = rnn_params_from_torch(to_numpy_sd(mod))
        first = np.random.RandomState(2).randn(4, 5).astype(np.float32)
        with torch.no_grad():
            out = mod["init_net"](torch.from_numpy(first))
            h_ref, c_ref = out.view(-1, 2, 2, 16).permute(1, 2, 0, 3)
        h, c = init_net_apply(params, jnp.asarray(first))
        np.testing.assert_allclose(h, h_ref.numpy(), atol=2e-5)
        np.testing.assert_allclose(c, c_ref.numpy(), atol=2e-5)
        # regressed state feeds the scan exactly like torch
        x = np.random.RandomState(3).randn(6, 4, 12).astype(np.float32)
        ys, _ = rnn_scan(params, jnp.asarray(x), (h, c))
        y_ref, _, _ = torch_forward(mod, x, (h_ref.contiguous(), c_ref.contiguous()))
        np.testing.assert_allclose(ys, y_ref, atol=2e-5)

    def test_padded_batch_equals_per_sequence(self):
        key = jax.random.PRNGKey(0)
        params = init_rnn_params(key, 12, 5, 16, 2)
        rng = np.random.RandomState(4)
        lengths = np.array([7, 3, 5])
        T = 7
        xs = rng.randn(T, 3, 12).astype(np.float32)
        ys, (h, c) = rnn_forward_padded(params, jnp.asarray(xs),
                                        jnp.asarray(lengths))
        for b, L in enumerate(lengths):
            y_solo, (h_solo, c_solo) = rnn_scan(params, jnp.asarray(xs[:L, b]))
            np.testing.assert_allclose(ys[:L, b], y_solo, atol=1e-5)
            np.testing.assert_allclose(ys[L:, b], 0.0, atol=0)
            np.testing.assert_allclose(h[:, b], h_solo, atol=1e-5)
            np.testing.assert_allclose(c[:, b], c_solo, atol=1e-5)

    def test_dropout_train_path_runs(self):
        key = jax.random.PRNGKey(1)
        params = init_rnn_params(key, 12, 5, 16, 2)
        xs = jnp.asarray(np.random.RandomState(5).randn(4, 2, 12), jnp.float32)
        ys, _ = rnn_scan(params, xs, dropout=0.4, rng=jax.random.PRNGKey(2))
        assert ys.shape == (4, 2, 5)
        assert np.isfinite(np.asarray(ys)).all()


class TestPairStep:
    r"""rnn_pair_step: the batched rnn7/rnn8 head evaluation (the fused
    SigMP step runs the two same-geometry stacks on one shared input —
    reference sig_mp.py:169-170); must match two separate rnn_step calls."""

    def _pair(self, hidden_b=16, seed=0):
        from robustcap_tpu.nn import rnn_pair_step  # noqa: F401
        ka, kb, kx = jax.random.split(jax.random.PRNGKey(seed), 3)
        pa = init_rnn_params(ka, 14, 9, 16, 2)
        pb = init_rnn_params(kb, 14, 2, hidden_b, 2)
        x = jax.random.normal(kx, (14,))
        return pa, pb, x

    def test_matches_two_steps(self):
        from robustcap_tpu.nn import rnn_pair_step
        pa, pb, x = self._pair()
        sa, sb = init_state(pa), init_state(pb)
        oa, na = rnn_step(pa, x, sa)
        ob, nb = rnn_step(pb, x, sb)
        oa2, ob2, na2, nb2 = rnn_pair_step(pa, pb, x, sa, sb)
        np.testing.assert_allclose(oa2, oa, atol=1e-6)
        np.testing.assert_allclose(ob2, ob, atol=1e-6)
        for got, want in ((na2, na), (nb2, nb)):
            for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
                np.testing.assert_allclose(g, w, atol=1e-6)

    def test_heterogeneous_geometry_falls_back(self):
        from robustcap_tpu.nn import rnn_pair_step
        pa, pb, x = self._pair(hidden_b=12)
        sa, sb = init_state(pa), init_state(pb)
        oa, _ = rnn_step(pa, x, sa)
        ob, _ = rnn_step(pb, x, sb)
        oa2, ob2, _, _ = rnn_pair_step(pa, pb, x, sa, sb)
        np.testing.assert_allclose(oa2, oa, atol=0)
        np.testing.assert_allclose(ob2, ob, atol=0)

    def test_int8_compute_path(self):
        from robustcap_tpu.nn import (dequantize_non_gate_params,
                                      quantize_params, rnn_pair_step)
        pa, pb, x = self._pair(seed=3)
        qa = dequantize_non_gate_params(quantize_params(pa))
        qb = dequantize_non_gate_params(quantize_params(pb))
        sa, sb = init_state(qa), init_state(qb)
        oa, _ = rnn_step(qa, x, sa, int8_compute=True)
        ob, _ = rnn_step(qb, x, sb, int8_compute=True)
        oa2, ob2, _, _ = rnn_pair_step(qa, qb, x, sa, sb, int8_compute=True)
        np.testing.assert_allclose(oa2, oa, atol=1e-5)
        np.testing.assert_allclose(ob2, ob, atol=1e-5)

    def test_group_of_three_matches_steps(self):
        # the steady-variant fused triple: rnn3 + speculative rnn7/rnn8
        # all consume one input vector (sig_mp.py:145,169-170)
        from robustcap_tpu.nn import rnn_group_step
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        ps = tuple(init_rnn_params(k, 14, out, 16, 2)
                   for k, out in zip(keys[:3], (3, 9, 2)))
        x = jax.random.normal(keys[3], (14,))
        sts = tuple(init_state(p) for p in ps)
        want = [rnn_step(p, x, s) for p, s in zip(ps, sts)]
        outs, news = rnn_group_step(ps, x, sts)
        for (wo, wn), go, gn in zip(want, outs, news):
            np.testing.assert_allclose(go, wo, atol=1e-6)
            for g, w in zip(jax.tree.leaves(gn), jax.tree.leaves(wn)):
                np.testing.assert_allclose(g, w, atol=1e-6)

    def test_group_mixed_geometry_falls_back(self):
        from robustcap_tpu.nn import rnn_group_step
        keys = jax.random.split(jax.random.PRNGKey(8), 4)
        ps = (init_rnn_params(keys[0], 14, 3, 16, 2),
              init_rnn_params(keys[1], 14, 9, 16, 2),
              init_rnn_params(keys[2], 14, 2, 12, 2))  # odd one out
        x = jax.random.normal(keys[3], (14,))
        sts = tuple(init_state(p) for p in ps)
        outs, _ = rnn_group_step(ps, x, sts)
        for p, s, got in zip(ps, sts, outs):
            want, _ = rnn_step(p, x, s)
            np.testing.assert_allclose(got, want, atol=0)

    def test_batched_input(self):
        # the offline path vmaps the step over sequences: a leading batch
        # dim on x/state must flow through the pair fusion unchanged
        from robustcap_tpu.nn import rnn_pair_step
        pa, pb, x = self._pair(seed=5)
        B = 3
        xB = jnp.broadcast_to(x, (B, 14)) + jnp.arange(B)[:, None] * 0.1
        sa, sb = init_state(pa, (B,)), init_state(pb, (B,))
        oa, na = rnn_step(pa, xB, sa)
        ob, nb = rnn_step(pb, xB, sb)
        oa2, ob2, na2, nb2 = rnn_pair_step(pa, pb, xB, sa, sb)
        np.testing.assert_allclose(oa2, oa, atol=1e-6)
        np.testing.assert_allclose(ob2, ob, atol=1e-6)
        for g, w in zip(jax.tree.leaves((na2, nb2)),
                        jax.tree.leaves((na, nb))):
            np.testing.assert_allclose(g, w, atol=1e-6)
