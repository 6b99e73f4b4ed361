r"""Fused geometry-tail kernel (ops/pallas_tail.py) vs the XLA tail.

The kernel is a drop-in for everything below the rnn7/rnn8 heads in
``heads_and_tail`` (models/sig_mp.py, mirroring reference sig_mp.py:169-261).
These tests run the FULL step both ways — ``cfg.pallas_tail`` on vs off —
so any disagreement in pose/translation/contact, the floor ring, the
landmark resynthesis, or the carried state surfaces directly. On CPU the
kernel executes in interpret mode (identical code path to the TPU build
modulo Mosaic lowering, which bench.py exercises on the real chip).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.models import sig_mp
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SMALL_SPECS = {
    "rnn2": (72, 69, 16, 0.4, True),
    "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False),
    "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False),
    "rnn8": (141, 2, 16, 0.4, False),
}

ATOL = 2e-4  # matmul-vs-sum accumulation order inside the kernel


@pytest.fixture(scope="module")
def setup():
    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(0), SMALL_SPECS)
    return model, params


def _frames(key, T, conf_pattern, first_tran=None, first_frame=False):
    r"""Synthetic frame stream whose per-frame confidence follows
    ``conf_pattern`` (values in [0, 1], length T)."""
    ks = jax.random.split(key, 3)
    j2dc = jax.random.uniform(ks[0], (T, 33, 3), minval=0.2, maxval=0.9)
    conf = jnp.asarray(conf_pattern, jnp.float32)[:, None]
    j2dc = j2dc.at[:, :, 2].set(conf)
    # keep z well away from 0 for the reproj math
    j2dc = j2dc.at[:, :, 2].set(jnp.clip(j2dc[:, :, 2], 0.05, None))
    j2dc = j2dc.at[:, :, 2].set(conf)
    accc = jax.random.normal(ks[1], (T, 6, 3))
    import robustcap_tpu.math as M
    oric = M.r6d_to_rotation_matrix(
        jax.random.normal(ks[2], (T * 6, 6))).reshape(T, 6, 3, 3)
    return sig_mp._sequence_frames(j2dc, accc, oric, first_tran,
                                   first_frame, None)


def _run(params, model, cfg, frames, cond_updater):
    step = sig_mp.make_step(model, cfg, include_first_frame_step=False,
                            output_contacts=True, cond_updater=cond_updater)
    frame0 = jax.tree.map(lambda x: x[0], frames)
    carry = sig_mp.prescan_first_frame(params, model,
                                       sig_mp.init_carry(params), frame0)
    carry, out = jax.lax.scan(partial(step, params), carry, frames)
    return carry, out


def _assert_trees_close(a, b, atol=ATOL):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa, np.float64),
                                   np.asarray(xb, np.float64), atol=atol,
                                   rtol=0)


# mixed regime: occluded, mid-confidence, and fully-confident frames
MIXED = [0.2, 0.75, 0.95, 0.1, 0.9, 0.72, 0.95, 0.3, 0.95, 0.95,
         0.05, 0.78, 0.95, 0.95, 0.2, 0.95]


class TestStepAgreement:
    @pytest.mark.parametrize("cond_updater", [False, True])
    def test_mixed_confidence(self, setup, cond_updater):
        model, params = setup
        cfg = SigMPConfig()
        frames = _frames(jax.random.PRNGKey(1), len(MIXED), MIXED,
                         first_tran=jnp.asarray([0.1, 0.2, 1.5]))
        ca, oa = _run(params, model, cfg, frames, cond_updater)
        cb, ob = _run(params, model,
                      dataclasses.replace(cfg, pallas_tail=True),
                      frames, cond_updater)
        _assert_trees_close(oa, ob)
        _assert_trees_close(ca, cb)

    def test_floor_append_and_snap(self, setup):
        model, params = setup
        # low contact threshold so cmax > threshold fires, all-confident
        # stream so the ring fills past 11 and the snap branch executes
        cfg = SigMPConfig(contact_threshold=0.2, height_threshold=5.0)
        pattern = [0.95] * 20
        frames = _frames(jax.random.PRNGKey(2), 20, pattern,
                         first_frame=True)
        ca, oa = _run(params, model, cfg, frames, True)
        cb, ob = _run(params, model,
                      dataclasses.replace(cfg, pallas_tail=True), frames,
                      True)
        assert int(ca["floor_cnt"]) == 11  # the snap regime was reached
        _assert_trees_close(oa, ob)
        _assert_trees_close(ca, cb)

    def test_live_throttle(self, setup):
        model, params = setup
        cfg = SigMPConfig(live=True, update_vision_freq=3,
                          conf_range=(0.5, 0.6))
        pattern = [0.3, 0.2, 0.9, 0.1, 0.2, 0.3, 0.1, 0.9, 0.2, 0.1]
        frames = _frames(jax.random.PRNGKey(3), len(pattern), pattern,
                         first_tran=jnp.asarray([0.0, 0.0, 2.0]))
        for cond in (False, True):
            ca, oa = _run(params, model, cfg, frames, cond)
            cb, ob = _run(params, model,
                          dataclasses.replace(cfg, pallas_tail=True),
                          frames, cond)
            _assert_trees_close(oa, ob)
            _assert_trees_close(ca, cb)

    def test_no_vision_updater(self, setup):
        model, params = setup
        cfg = SigMPConfig(use_vision_updater=False, use_flat_floor=False)
        frames = _frames(jax.random.PRNGKey(4), len(MIXED), MIXED,
                         first_tran=jnp.asarray([0.0, 0.1, 1.0]))
        ca, oa = _run(params, model, cfg, frames, False)
        cb, ob = _run(params, model,
                      dataclasses.replace(cfg, pallas_tail=True), frames,
                      False)
        _assert_trees_close(oa, ob)
        _assert_trees_close(ca, cb)

    def test_reproj_opt(self, setup):
        model, params = setup
        cfg = SigMPConfig(use_reproj_opt=True)
        frames = _frames(jax.random.PRNGKey(5), len(MIXED), MIXED,
                         first_tran=jnp.asarray([0.0, 0.1, 1.5]))
        ca, oa = _run(params, model, cfg, frames, True)
        cb, ob = _run(params, model,
                      dataclasses.replace(cfg, pallas_tail=True), frames,
                      True)
        _assert_trees_close(oa, ob, atol=5e-4)  # reproj divides by z^4
        _assert_trees_close(ca, cb, atol=5e-4)

    def test_pose_blendshape(self, setup):
        _, params = setup
        model = ParametricModel(data=synthetic_smpl_data(),
                                use_pose_blendshape=True)
        cfg = SigMPConfig()
        frames = _frames(jax.random.PRNGKey(6), len(MIXED), MIXED,
                         first_tran=jnp.asarray([0.1, 0.0, 1.2]))
        ca, oa = _run(params, model, cfg, frames, True)
        cb, ob = _run(params, model,
                      dataclasses.replace(cfg, pallas_tail=True), frames,
                      True)
        _assert_trees_close(oa, ob)
        _assert_trees_close(ca, cb)


class TestEndToEnd:
    def test_forward_offline(self, setup):
        model, params = setup
        cfg = SigMPConfig()
        T = 24
        key = jax.random.PRNGKey(7)
        pattern = np.resize(MIXED, T).tolist()
        frames = _frames(key, T, pattern)
        j2dc, accc, oric = frames["j2dc"], frames["accc"], frames["oric"]
        pa, ta = sig_mp.forward_offline(params, model, cfg, j2dc, accc,
                                        oric, first_frame=True)
        pb, tb = sig_mp.forward_offline(
            params, model, dataclasses.replace(cfg, pallas_tail=True),
            j2dc, accc, oric, first_frame=True)
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=ATOL)
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=ATOL)

    def test_streaming_net_chunk(self, setup):
        model, params = setup
        cfg = SigMPConfig(pallas_tail=True)
        net = sig_mp.StreamingNet(params, model, cfg)
        net_ref = sig_mp.StreamingNet(params, model, SigMPConfig())
        key = jax.random.PRNGKey(8)
        pattern = [0.9, 0.2, 0.95, 0.1, 0.8, 0.75, 0.3, 0.95]
        frames = _frames(key, len(pattern), pattern)
        # per-frame then a chunk, state carried across
        f0 = jax.tree.map(lambda x: x[0], frames)
        p0, t0 = net.forward_online(f0["j2dc"], f0["accc"], f0["oric"],
                                    first_frame=True)
        q0, u0 = net_ref.forward_online(f0["j2dc"], f0["accc"], f0["oric"],
                                        first_frame=True)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(q0), atol=ATOL)
        np.testing.assert_allclose(np.asarray(t0), np.asarray(u0), atol=ATOL)
        pc, tc = net.forward_chunk(frames["j2dc"][1:], frames["accc"][1:],
                                   frames["oric"][1:])
        qc, uc = net_ref.forward_chunk(frames["j2dc"][1:],
                                       frames["accc"][1:],
                                       frames["oric"][1:])
        np.testing.assert_allclose(np.asarray(pc), np.asarray(qc), atol=ATOL)
        np.testing.assert_allclose(np.asarray(tc), np.asarray(uc), atol=ATOL)
