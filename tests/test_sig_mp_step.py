r"""Branchless-scan vs explicit-branching oracle for the SigMP fusion step.

The oracle below re-implements ``Net.forward_online``'s documented control
flow (reference net/sig_mp.py:114-274) with plain Python if/else and mutable
state, reusing the same RNN/FK primitives. The production code expresses the
same semantics branchlessly inside ``lax.scan``; the two must agree exactly
on every confidence regime, first-frame mode, and flag set.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import robustcap_tpu.math as M
from robustcap_tpu.config import SigMPConfig, VEL_SCALE, MP_VERTEX_MASK
from robustcap_tpu.models import sig_mp
from robustcap_tpu.nn.rnn import rnn_step, init_state, init_net_apply
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SMALL_SPECS = {
    "rnn2": (72, 69, 16, 0.4, True),
    "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False),
    "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False),
    "rnn8": (141, 2, 16, 0.4, False),
}

MP_MASK = np.asarray(MP_VERTEX_MASK)


@pytest.fixture(scope="module")
def setup():
    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(0), SMALL_SPECS)
    return model, params


class Oracle:
    """Stateful reference-semantics implementation with explicit branching."""

    def __init__(self, params, model, cfg: SigMPConfig):
        self.p = params
        self.model = model
        self.cfg = cfg
        self.hidden = {k: init_state(params[k]) for k in params}
        self.last_pfoot = None
        self.last_tran = None
        self.floor_y = []
        self.first_reach = True
        self.update_vision_count = 0
        self.j_temp = None

    def _f(self, name, x):
        out, self.hidden[name] = rnn_step(self.p[name], x, self.hidden[name])
        return np.asarray(out)

    def _fk_joints(self, poseg):
        tree = self.model.tree
        b = np.asarray(self.model._bone_vector)
        pb = np.zeros((24, 3), np.float32)
        for i in range(1, 24):
            pb[i] = np.asarray(poseg)[tree.parent[i]] @ b[i]
        out = np.zeros((24, 3), np.float32)
        out[0] = pb[0]
        for i in range(1, 24):
            out[i] = out[tree.parent[i]] + pb[i]
        return out

    @staticmethod
    def _bbox_norm(j2dc):
        j2dc = j2dc.copy()
        scale = max(j2dc[:, 0].max() - j2dc[:, 0].min(),
                    j2dc[:, 1].max() - j2dc[:, 1].min())
        j2dc[:, :2] = j2dc[:, :2] / scale
        center = j2dc[23, :2].copy()
        j2dc[24:, :2] -= center
        j2dc[:23, :2] -= center
        return j2dc

    def step(self, j2dc, accc, oric, first_tran=None, first_frame=False,
             gravityc=None):
        cfg = self.cfg
        lo, hi = cfg.conf_range
        g = np.asarray(gravityc if gravityc is not None
                       else sig_mp.DEFAULT_GRAVITY)
        cat = lambda *xs: jnp.concatenate([jnp.asarray(x).reshape(-1)
                                           for x in xs])
        c = float(np.mean(j2dc[:, 2]))
        Rcr = oric[-1]

        accr = accc @ Rcr
        orir = np.einsum("ij,njk->nik", Rcr.T, oric)
        j3dr_i = self._f("rnn2", cat(accr, orir))
        vr = self._f("rnn3", cat(accr, orir, j3dr_i))

        pc = None
        j3dc = None
        if c > lo or first_frame:
            j2dc_n = self._bbox_norm(j2dc)
            j3dc = self._f("rnn4", cat(accc, oric, j2dc_n))
            j3dr_v = j3dc.reshape(23, 3) @ Rcr
            if first_frame:
                pc = self._f("rnn6", cat(accc, oric, j2dc, j3dc)).reshape(3)
        if c >= hi:
            j3dr = j3dr_v.reshape(-1)
            pc = self._f("rnn6", cat(accc, oric, j2dc, j3dc)).reshape(3)
        elif c > lo:
            k = (c - lo) / (hi - lo)
            j3dr = (1 - k) * j3dr_i.reshape(-1) + k * j3dr_v.reshape(-1)
            pc = self._f("rnn6", cat(accc, oric, j2dc, j3dc)).reshape(3)
        else:
            j3dr = j3dr_i.reshape(-1)

        poseg6d = self._f("rnn7", cat(accr, orir, j3dr))
        contact = np.asarray(jax.nn.sigmoid(
            jnp.asarray(self._f("rnn8", cat(accr, orir, j3dr)))))

        poseg = np.asarray(M.r6d_to_rotation_matrix(
            jnp.asarray(poseg6d))).reshape(24, 3, 3)
        pose = np.array(M.inverse_kinematics_R(
            jnp.asarray(poseg)[None], self.model.tree))[0]
        pose[0] = Rcr

        if c >= hi and cfg.use_imu_updater and self.first_reach:
            self.first_reach = False
            h, cc = init_net_apply(self.p["rnn2"], jnp.asarray(j3dr)[None])
            self.hidden["rnn2"] = (h[:, 0], cc[:, 0])

        pfoot = self._fk_joints(poseg)[10:12] @ Rcr.T
        if contact.max() < cfg.contact_threshold or self.last_pfoot is None:
            v = Rcr @ vr.reshape(3) * VEL_SCALE / 60
        else:
            v = (self.last_pfoot - pfoot)[int(np.argmax(contact))]
        tran = v if self.last_tran is None else self.last_tran + v

        if c >= hi:
            k = min((c - lo) / (hi - lo), 1.0)
            if (np.linalg.norm(pc - tran) > cfg.distance_threshold
                    or cfg.tran_filter_num > 1):
                tran = pc.copy()
            else:
                t = cfg.tran_filter_num * k
                tran = (1 - t) * tran + t * pc

        if (len(self.floor_y) < 11 and not first_frame and first_tran is None
                and contact.max() > cfg.contact_threshold
                and cfg.use_flat_floor and c >= hi):
            p0 = np.dot(pfoot[0] + tran, g) * g
            p1 = np.dot(pfoot[1] + tran, g) * g
            self.floor_y.append(p1 if np.linalg.norm(p0) < np.linalg.norm(p1)
                                else p0)
        if (cfg.use_flat_floor and len(self.floor_y) > 10
                and contact.max() > cfg.contact_threshold):
            p0 = np.dot(pfoot[0] + tran, g) * g
            p1 = np.dot(pfoot[1] + tran, g) * g
            m = sum(self.floor_y[-6:]) / 6
            if (np.linalg.norm(p0) < np.linalg.norm(p1)
                    and np.linalg.norm(m - p1) < cfg.height_threshold):
                tran = tran + (m - p1)
            elif np.linalg.norm(m - p0) < cfg.height_threshold:
                tran = tran + (m - p0)

        if first_tran is not None:
            tran = np.asarray(first_tran, np.float32)
        elif first_frame:
            tran = pc.copy()

        self.last_pfoot = pfoot
        joint = j = None
        if cfg.use_reproj_opt or cfg.use_vision_updater:
            run_fk = (not cfg.live) or self.update_vision_count == 0
            if run_fk:
                _, jb, vb = self.model.forward_kinematics(
                    jnp.asarray(pose)[None], tran=jnp.asarray(tran)[None],
                    calc_mesh=True, vertex_ids=MP_MASK)
                joint = np.asarray(jb[0])
                j = np.asarray(sig_mp.sync_mp3d(vb[0], jb[0]))
                if cfg.live:
                    self.j_temp = j
                    self.update_vision_count = cfg.update_vision_freq
            else:
                j = self.j_temp
                self.update_vision_count -= 1

        if cfg.use_reproj_opt and c > lo:
            p = j2dc[:, 2]
            ax = (p / j[:, 2] ** 2).sum() + cfg.smooth
            bx = (p * (-j[:, 0] / j[:, 2] ** 2 + j2dc[:, 0] / j[:, 2])).sum()
            by = (p * (-j[:, 1] / j[:, 2] ** 2 + j2dc[:, 1] / j[:, 2])).sum()
            d = np.array([bx / ax, by / ax, 0], np.float32)
            tran = tran + d
            j = j + d
            az = (p * (j[:, 0] ** 2 + j[:, 1] ** 2) / j[:, 2] ** 4).sum() + cfg.smooth
            bz = (p * ((j[:, 0] / j[:, 2] - j2dc[:, 0]) * j[:, 0] / j[:, 2] ** 2
                       + (j[:, 1] / j[:, 2] - j2dc[:, 1]) * j[:, 1] / j[:, 2] ** 2)).sum()
            d = np.array([0, 0, bz / az], np.float32)
            tran = tran + d
            j = j + d

        if (cfg.use_vision_updater and c <= lo
                and (self.update_vision_count == cfg.update_vision_freq
                     or not cfg.live)):
            j2dc_syn = j / j[:, 2:]
            j3dc_syn = joint[1:] - joint[:1]
            self._f("rnn6", cat(accc, oric, j2dc_syn, j3dc_syn))
            j2dc_syn = self._bbox_norm(j2dc_syn)
            self._f("rnn4", cat(accc, oric, j2dc_syn))

        self.last_tran = np.asarray(tran, np.float32)
        return pose, np.asarray(tran)


def make_inputs(T, conf_pattern, seed=0):
    rng = np.random.RandomState(seed)
    aa = rng.normal(0, 0.2, (T * 6, 3)).astype(np.float32)
    oric = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                      ).reshape(T, 6, 3, 3)
    accc = rng.normal(0, 1.0, (T, 6, 3)).astype(np.float32)
    j2dc = np.zeros((T, 33, 3), np.float32)
    j2dc[..., :2] = rng.normal(0, 0.3, (T, 33, 2))
    j2dc[..., 2] = np.asarray(conf_pattern)[:, None]
    return j2dc, accc, oric


def run_compare(setup, cfg, conf_pattern, first_tran=None, first_frame=False,
                seed=0, atol=2e-4):
    model, params = setup
    T = len(conf_pattern)
    j2dc, accc, oric = make_inputs(T, conf_pattern, seed)
    # scan path
    pose_s, tran_s = sig_mp.forward_offline(
        params, model, cfg, j2dc, accc, oric, first_tran=first_tran,
        first_frame=first_frame)
    # oracle path
    oracle = Oracle(params, model, cfg)
    poses, trans = [], []
    for t in range(T):
        p, tr = oracle.step(j2dc[t], accc[t], oric[t],
                            first_tran=first_tran if t == 0 else None,
                            first_frame=first_frame and t == 0)
        poses.append(p)
        trans.append(tr)
    np.testing.assert_allclose(np.asarray(pose_s), np.stack(poses), atol=atol)
    np.testing.assert_allclose(np.asarray(tran_s), np.stack(trans), atol=atol)


class TestScanVsOracle:
    def test_high_confidence(self, setup):
        conf = np.full(12, 0.95, np.float32)
        run_compare(setup, SigMPConfig(), conf, first_tran=np.array([0, 0, 3.0]))

    def test_low_confidence(self, setup):
        conf = np.full(12, 0.2, np.float32)
        run_compare(setup, SigMPConfig(), conf, first_tran=np.array([0, 0, 3.0]))

    def test_mixed_confidence(self, setup):
        conf = np.array([0.95, 0.95, 0.75, 0.3, 0.3, 0.75, 0.95, 0.2, 0.9,
                         0.74, 0.95, 0.5], np.float32)
        run_compare(setup, SigMPConfig(), conf, first_tran=np.array([0, 0, 3.0]))

    def test_first_frame_mode(self, setup):
        conf = np.array([0.9, 0.3, 0.95, 0.75, 0.2, 0.9], np.float32)
        run_compare(setup, SigMPConfig(), conf, first_frame=True)

    def test_first_frame_low_conf(self, setup):
        # first frame forces the visual branch + double rnn6 step even when
        # occluded (sig_mp.py:149,156 then 267)
        conf = np.array([0.2, 0.2, 0.9, 0.9], np.float32)
        run_compare(setup, SigMPConfig(), conf, first_frame=True)

    def test_no_first_seed(self, setup):
        conf = np.array([0.9, 0.75, 0.3, 0.95], np.float32)
        run_compare(setup, SigMPConfig(), conf)

    def test_no_flat_floor_profile(self, setup):
        conf = np.full(10, 0.9, np.float32)
        run_compare(setup, SigMPConfig(use_flat_floor=False), conf,
                    first_tran=np.array([0.1, 0.2, 4.0]))

    def test_reproj_opt(self, setup):
        conf = np.array([0.9, 0.75, 0.3, 0.95, 0.6], np.float32)
        # keep z away from 0: reproj divides by landmark depth
        run_compare(setup, SigMPConfig(use_reproj_opt=True), conf,
                    first_tran=np.array([0, 0, 5.0]), atol=5e-4)

    def test_live_mode_counter(self, setup):
        conf = np.concatenate([np.full(3, 0.95), np.full(8, 0.3),
                               np.full(3, 0.95)]).astype(np.float32)
        cfg = SigMPConfig.live_mode()
        cfg = SigMPConfig(live=True, conf_range=cfg.conf_range,
                          tran_filter_num=cfg.tran_filter_num,
                          update_vision_freq=3)
        run_compare(setup, cfg, conf, first_tran=np.array([0, 0, 3.0]))

    def test_no_updaters(self, setup):
        conf = np.array([0.9, 0.3, 0.95, 0.75], np.float32)
        run_compare(setup, SigMPConfig(use_vision_updater=False,
                                       use_imu_updater=False), conf,
                    first_tran=np.array([0, 0, 3.0]))

    def test_pose_blendshape_fast_path(self, setup):
        r"""use_pose_blendshape=True: the scan step's closed-form landmark
        LBS (posedirs-shifted rest vertices, no second tree walk) must match
        the oracle, whose landmark synthesis goes through the generic
        ``forward_kinematics`` blendshape path (model.py:237). Posedirs are
        amplified 100x so a dropped/incorrect blendshape term would exceed
        the tolerance (landmark shifts ~0.8 m) instead of hiding below it."""
        import dataclasses
        _, params = setup
        data = synthetic_smpl_data()
        data = dataclasses.replace(data, posedirs=data.posedirs * 100.0)
        model_bs = ParametricModel(data=data, use_pose_blendshape=True)
        conf = np.array([0.9, 0.3, 0.3, 0.95, 0.75, 0.2, 0.2, 0.9],
                        np.float32)
        run_compare((model_bs, params), SigMPConfig(), conf,
                    first_tran=np.array([0, 0, 3.0]))
        run_compare((model_bs, params), SigMPConfig(use_reproj_opt=True),
                    conf, first_tran=np.array([0, 0, 5.0]), atol=5e-4)


class TestStreamingWrapper:
    def test_streaming_equals_scan(self, setup):
        model, params = setup
        cfg = SigMPConfig()
        conf = np.array([0.9, 0.75, 0.3, 0.95], np.float32)
        j2dc, accc, oric = make_inputs(4, conf, seed=3)
        pose_s, tran_s = sig_mp.forward_offline(
            params, model, cfg, j2dc, accc, oric,
            first_tran=np.array([0, 0, 3.0]))
        net = sig_mp.StreamingNet(params, model, cfg)
        for t in range(4):
            p, tr = net.forward_online(
                j2dc[t], accc[t], oric[t],
                first_tran=np.array([0, 0, 3.0]) if t == 0 else None)
            np.testing.assert_allclose(p, pose_s[t], atol=1e-5)
            np.testing.assert_allclose(tr, tran_s[t], atol=1e-5)
        # reset really resets
        net.reset_states()
        p, tr = net.forward_online(j2dc[0], accc[0], oric[0],
                                   first_tran=np.array([0, 0, 3.0]))
        np.testing.assert_allclose(p, pose_s[0], atol=1e-5)


class TestBatched:
    def test_batched_matches_single(self, setup):
        model, params = setup
        cfg = SigMPConfig()
        seqs = []
        for s in range(3):
            conf = np.clip(np.random.RandomState(s).uniform(0.1, 1.0, 6), 0, 1
                           ).astype(np.float32)
            seqs.append(make_inputs(6, conf, seed=s))
        frames = [sig_mp._sequence_frames(j, a, o, np.array([0, 0, 3.0]),
                                          False, None)
                  for j, a, o in seqs]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
        pose_b, tran_b = sig_mp.forward_offline_batched(params, model, cfg,
                                                        batched)
        for i, (j, a, o) in enumerate(seqs):
            pose_1, tran_1 = sig_mp.forward_offline(
                params, model, cfg, j, a, o, first_tran=np.array([0, 0, 3.0]))
            np.testing.assert_allclose(pose_b[i], pose_1, atol=1e-5)
            np.testing.assert_allclose(tran_b[i], tran_1, atol=1e-5)


class TestCondUpdater:
    r"""The serving-only ``lax.cond`` single-tail form must agree with the
    branchless speculative-plus-final form across confidence regimes and
    live throttling (the two coincide mathematically; see make_step)."""

    @pytest.mark.parametrize("live", [False, True])
    def test_cond_matches_branchless(self, setup, live):
        from functools import partial
        model, params = setup
        cfg = SigMPConfig.live_mode() if live else SigMPConfig()
        conf = np.array([0.9, 0.2, 0.2, 0.75, 0.05, 0.05, 0.95, 0.5],
                        np.float32)
        j2dc, accc, oric = make_inputs(8, conf, seed=11)
        frames = sig_mp._sequence_frames(jnp.asarray(j2dc),
                                         jnp.asarray(accc),
                                         jnp.asarray(oric), None, True, None)
        frame0 = jax.tree.map(lambda x: x[0], frames)
        sp = sig_mp.prepare_scan_params(params, cfg.int8_compute)
        carry0 = sig_mp.prescan_first_frame(sp, model,
                                            sig_mp.init_carry(sp), frame0)
        outs = {}
        for cond in (False, True):
            step = sig_mp.make_step(model, cfg,
                                    include_first_frame_step=False,
                                    cond_updater=cond)
            c, (po, tr) = jax.lax.scan(partial(step, sp), carry0, frames)
            outs[cond] = (po, tr, c)
        np.testing.assert_allclose(outs[True][0], outs[False][0], atol=2e-5)
        np.testing.assert_allclose(outs[True][1], outs[False][1], atol=2e-5)
        # carry states accumulate the (CI-bounded) group-vs-pair head
        # stacking drift over the sequence; same tolerance as the oracle
        for a, b in zip(jax.tree.leaves(outs[True][2]),
                        jax.tree.leaves(outs[False][2])):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b, np.float64), atol=2e-4)
