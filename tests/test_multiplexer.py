r"""Streaming multiplexer: batched sessions equal independent streams."""

import numpy as np
import jax
import pytest

import jax.numpy as jnp
import robustcap_tpu.math as M
from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.models import sig_mp
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data
from robustcap_tpu.streaming import StreamingMultiplexer

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
    params = sig_mp.init_params(jax.random.PRNGKey(5), SPECS)
    return model, params


def inputs(seed, T):
    rng = np.random.RandomState(seed)
    j2dc = np.concatenate([rng.randn(T, 33, 2) * 0.1,
                           np.full((T, 33, 1), 0.92)], 2).astype(np.float32)
    accc = rng.randn(T, 6, 3).astype(np.float32)
    aa = (rng.randn(T * 6, 3) * 0.2).astype(np.float32)
    oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                      ).reshape(T, 6, 3, 3)
    return j2dc, accc, oric


class TestMultiplexer:
    def test_matches_independent_streams(self, world):
        model, params = world
        cfg = SigMPConfig()
        T = 6
        streams = [inputs(s, T) for s in range(3)]
        mux = StreamingMultiplexer(params, model, cfg, capacity=4)
        slots = [mux.open_slot() for _ in range(3)]
        first = np.zeros(4, bool)
        first[:3] = True
        poses, trans = [], []
        for t in range(T):
            j = np.zeros((4, 33, 3), np.float32)
            a = np.zeros((4, 6, 3), np.float32)
            o = np.tile(np.eye(3, dtype=np.float32), (4, 6, 1, 1))
            for k, (j2, ac, orc) in enumerate(streams):
                j[slots[k]], a[slots[k]], o[slots[k]] = j2[t], ac[t], orc[t]
            p, tr = mux.step(j, a, o, first_frame=first if t == 0 else None)
            poses.append(p)
            trans.append(tr)

        for k, (j2, ac, orc) in enumerate(streams):
            net = sig_mp.StreamingNet(params, model, cfg)
            for t in range(T):
                p_ref, t_ref = net.forward_online(
                    j2[t], ac[t], orc[t], first_frame=(t == 0))
                np.testing.assert_allclose(poses[t][slots[k]], p_ref,
                                           atol=3e-5)
                np.testing.assert_allclose(trans[t][slots[k]], t_ref,
                                           atol=3e-5)

    def test_slot_reset_mid_session(self, world):
        model, params = world
        mux = StreamingMultiplexer(params, model, SigMPConfig(), capacity=2)
        s0 = mux.open_slot()
        j2, ac, orc = inputs(9, 4)
        batch = lambda t: (np.repeat(j2[t][None], 2, 0),
                           np.repeat(ac[t][None], 2, 0),
                           np.repeat(orc[t][None], 2, 0))
        ff = np.array([True, False])
        mux.step(*batch(0), first_frame=ff)
        mux.step(*batch(1))
        # a new subject joins slot 1: resets to fresh state
        s1 = mux.open_slot()
        assert s1 != s0
        p, tr = mux.step(*batch(2), first_frame=np.array([False, True]))
        # fresh slot behaves like a new first-frame stream
        net = sig_mp.StreamingNet(params, model, SigMPConfig())
        p_ref, t_ref = net.forward_online(j2[2], ac[2], orc[2],
                                          first_frame=True)
        np.testing.assert_allclose(p[s1], p_ref, atol=3e-5)
        np.testing.assert_allclose(tr[s1], t_ref, atol=3e-5)

    def test_capacity_limit(self, world):
        model, params = world
        mux = StreamingMultiplexer(params, model, SigMPConfig(), capacity=1)
        mux.open_slot()
        with pytest.raises(RuntimeError):
            mux.open_slot()
        mux.close_slot(0)
        assert mux.open_slot() == 0
