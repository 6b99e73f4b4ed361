r"""Cross-implementation parity against the ACTUAL torch reference.

These tests import and execute `/root/reference` (net/sig_mp.py,
articulate/utils/torch/rnn.py) via ``tests/_reference_harness.py``: a
randomly initialized reference ``Net`` runs ``forward_online`` frame by frame
(sig_mp.py:114-274) and the converted weights drive this repo's branchless
scan step. Frame-by-frame pose/tran agreement is asserted across every
confidence regime, first-frame mode, flag set, and the live throttle —
replacing the builder-written oracle in test_sig_mp_step.py as ground truth
(a shared misreading of the reference cannot pass here, since the reference
itself produces the expected values).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_harness import (load_reference, make_reference_net,
                                torch_state_dict_numpy)

import jax.numpy as jnp

from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.models import sig_mp as jx
from robustcap_tpu.nn.rnn import (init_net_apply, rnn_forward_padded,
                                  rnn_params_from_torch)
from robustcap_tpu.smpl.model import ParametricModel

POSE_TOL = 5e-4
TRAN_TOL = 1e-3


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def net_and_params(ref):
    net = make_reference_net(seed=0)
    # bias the contact head so contact>threshold frames occur and the
    # contact-velocity / flat-floor branches (sig_mp.py:186-221) execute
    with torch.no_grad():
        net.rnn8.linear2.bias += 2.5
    params = jx.params_from_torch_state_dict(torch_state_dict_numpy(net))
    return net, params


@pytest.fixture(scope="module")
def body_model(ref):
    return ParametricModel(data=ref.smpl_data)


def _make_inputs(T, conf, seed=42):
    r"""Random sequence inputs: valid rotations for oric, Gaussian acc,
    keypoints with the given per-frame confidence schedule."""
    rng = np.random.RandomState(seed)
    g = torch.Generator().manual_seed(seed)
    q = torch.nn.functional.normalize(torch.randn(T * 6, 4, generator=g),
                                      dim=-1)
    import articulate as art
    oric = art.math.quaternion_to_rotation_matrix(q).view(T, 6, 3, 3).numpy()
    accc = rng.normal(0, 2, (T, 6, 3)).astype(np.float32)
    j2dc = rng.normal(0, 0.25, (T, 33, 3)).astype(np.float32)
    j2dc[:, :, 2] = np.asarray(conf, np.float32)[:, None]
    return j2dc, accc, oric.astype(np.float32)


def _run_reference(net, j2dc, accc, oric, first_tran=None, first_frame=False,
                   gravityc=None):
    net.reset_states()
    if gravityc is None:
        # the reference holds gravityc as mutable (class) state set by eval
        # drivers (evaluate.py:73); restore the default between scenarios
        net.gravityc = torch.from_numpy(jx.DEFAULT_GRAVITY.copy())
    poses, trans = [], []
    for t in range(j2dc.shape[0]):
        if gravityc is not None:
            net.gravityc = torch.from_numpy(np.asarray(gravityc[t], np.float32))
        p, tr = net.forward_online(
            torch.from_numpy(j2dc[t]), torch.from_numpy(accc[t]),
            torch.from_numpy(oric[t]),
            first_tran=(torch.from_numpy(np.asarray(first_tran, np.float32))
                        if (t == 0 and first_tran is not None) else None),
            first_frame=(first_frame and t == 0))
        poses.append(p.numpy())
        trans.append(tr.numpy())
    return np.stack(poses), np.stack(trans)


def _assert_close(ours, theirs, pose_tol=POSE_TOL, tran_tol=TRAN_TOL):
    op, ot = np.asarray(ours[0]), np.asarray(ours[1])
    rp, rt = theirs
    np.testing.assert_allclose(op, rp, atol=pose_tol,
                               err_msg="pose mismatch vs reference")
    np.testing.assert_allclose(ot, rt, atol=tran_tol,
                               err_msg="tran mismatch vs reference")


# confidence schedules crossing every gate regime of sig_mp.py:159-167
RAMP = np.concatenate([np.full(12, 0.5), np.linspace(0.7, 0.95, 12),
                       np.full(16, 0.95), np.full(10, 0.3)])
HIGH = np.full(30, 0.95)
LOW = np.full(30, 0.4)
MID = np.concatenate([np.full(10, 0.95), np.full(20, 0.75)])


@pytest.mark.parametrize("name,conf,kw", [
    ("ramp_first_tran", RAMP, dict(first_tran=[0.0, 0.0, 3.0])),
    ("high_first_frame", HIGH, dict(first_frame=True)),
    ("occluded", LOW, dict(first_tran=[0.0, 0.0, 3.0])),
    ("lerp_zone", MID, dict(first_frame=True)),
])
def test_forward_online_parity(ref, net_and_params, body_model, name, conf, kw):
    r"""Frame-by-frame agreement of forward_offline (scan + hoisted first
    frame) with the reference's per-frame forward_online across confidence
    regimes and first-frame modes (sig_mp.py:114-274)."""
    net, params = net_and_params
    j2dc, accc, oric = _make_inputs(len(conf), conf)
    expect = _run_reference(net, j2dc, accc, oric, **kw)
    got = jx.forward_offline(params, body_model, SigMPConfig(), j2dc, accc,
                             oric, **kw)
    _assert_close(got, expect)


def test_forward_online_parity_no_flat_floor_per_frame_gravity(
        ref, net_and_params, body_model):
    r"""3DPW protocol: use_flat_floor=False + per-frame gravity
    (evaluate.py:254,284-285)."""
    net, params = net_and_params
    net.use_flat_floor = False
    try:
        T = 30
        j2dc, accc, oric = _make_inputs(T, RAMP[:T], seed=7)
        rng = np.random.RandomState(3)
        g = rng.normal(0, 1, (T, 3))
        g = (g / np.linalg.norm(g, axis=1, keepdims=True)).astype(np.float32)
        expect = _run_reference(net, j2dc, accc, oric,
                                first_tran=[0.0, 0.0, 3.0], gravityc=g)
        cfg = SigMPConfig(use_flat_floor=False)
        got = jx.forward_offline(params, body_model, cfg, j2dc, accc, oric,
                                 first_tran=[0.0, 0.0, 3.0], gravityc=g)
        _assert_close(got, expect)
    finally:
        net.use_flat_floor = True


def test_forward_online_parity_reproj_opt(ref, net_and_params, body_model):
    r"""Closed-form reprojection refinement on (sig_mp.py:244-261)."""
    net, params = net_and_params
    net.use_reproj_opt = True
    try:
        T = 24
        conf = np.full(T, 0.95)
        j2dc, accc, oric = _make_inputs(T, conf, seed=11)
        expect = _run_reference(net, j2dc, accc, oric,
                                first_tran=[0.0, 0.0, 3.0])
        cfg = SigMPConfig(use_reproj_opt=True)
        got = jx.forward_offline(params, body_model, cfg, j2dc, accc, oric,
                                 first_tran=[0.0, 0.0, 3.0])
        # tran flows through two least-squares solves; slightly looser
        _assert_close(got, expect, tran_tol=5e-3)
    finally:
        net.use_reproj_opt = False


def test_forward_online_parity_updaters_off(ref, net_and_params, body_model):
    r"""use_imu_updater / use_vision_updater disabled (sig_mp.py:31-33)."""
    net, params = net_and_params
    net.use_imu_updater = False
    net.use_vision_updater = False
    try:
        T = 30
        j2dc, accc, oric = _make_inputs(T, RAMP[:T], seed=5)
        expect = _run_reference(net, j2dc, accc, oric,
                                first_tran=[0.0, 0.0, 3.0])
        cfg = SigMPConfig(use_imu_updater=False, use_vision_updater=False)
        got = jx.forward_offline(params, body_model, cfg, j2dc, accc, oric,
                                 first_tran=[0.0, 0.0, 3.0])
        _assert_close(got, expect)
    finally:
        net.use_imu_updater = True
        net.use_vision_updater = True


def test_forward_online_parity_live_throttle(ref, net_and_params, body_model):
    r"""Live mode: conf_range (0.85, 0.9), tran_filter_num 0.01, and the
    every-30-frames FK throttle with j_temp reuse (sig_mp.py:91-93,233-242).
    An occlusion window longer than update_vision_freq exercises both the
    cached-landmark reuse and the counter reset."""
    net, params = net_and_params
    net.live = True
    net.conf_range = (0.85, 0.9)
    net.tran_filter_num = 0.01
    net.update_vision_count = 0
    net.j_temp = None
    try:
        T = 70
        conf = np.concatenate([np.full(5, 0.95), np.full(55, 0.3),
                               np.full(10, 0.95)])
        j2dc, accc, oric = _make_inputs(T, conf, seed=13)
        expect = _run_reference(net, j2dc, accc, oric, first_frame=True)
        got = jx.forward_offline(params, body_model, SigMPConfig.live_mode(),
                                 j2dc, accc, oric, first_frame=True)
        _assert_close(got, expect)
    finally:
        net.live = False
        net.conf_range = (0.7, 0.8)
        net.tran_filter_num = 0.05
        net.update_vision_count = 0
        net.j_temp = None


def test_streaming_net_matches_reference_per_frame(ref, net_and_params,
                                                   body_model):
    r"""The stateful per-frame StreamingNet wrapper (steady single-eval step;
    first-frame work host-dispatched to the jitted prescan) against the
    reference, frame by frame."""
    net, params = net_and_params
    T = 16
    conf = RAMP[:T]
    j2dc, accc, oric = _make_inputs(T, conf, seed=21)
    rp, rt = _run_reference(net, j2dc, accc, oric, first_tran=[0.0, 0.0, 3.0])
    snet = jx.StreamingNet(params, body_model)
    for t in range(T):
        p, tr = snet.forward_online(
            j2dc[t], accc[t], oric[t],
            first_tran=[0.0, 0.0, 3.0] if t == 0 else None)
        np.testing.assert_allclose(np.asarray(p), rp[t], atol=POSE_TOL)
        np.testing.assert_allclose(np.asarray(tr), rt[t], atol=TRAN_TOL)


def test_streaming_net_first_frame_and_reset(ref, net_and_params, body_model):
    r"""StreamingNet with first_frame=True (TC-eval style, sig_mp.py:148-156:
    the prescan commits rnn4/rnn6's first-frame advances) on a low-confidence
    start, then reset_states + a first_tran sequence on the same instance."""
    net, params = net_and_params
    T = 16
    conf = np.concatenate([np.full(4, 0.3), np.full(6, 0.95), np.full(6, 0.75)])
    j2dc, accc, oric = _make_inputs(T, conf, seed=33)
    rp, rt = _run_reference(net, j2dc, accc, oric, first_frame=True)
    snet = jx.StreamingNet(params, body_model)
    for t in range(T):
        p, tr = snet.forward_online(j2dc[t], accc[t], oric[t],
                                    first_frame=(t == 0))
        np.testing.assert_allclose(np.asarray(p), rp[t], atol=POSE_TOL,
                                   err_msg=f"pose t={t}")
        np.testing.assert_allclose(np.asarray(tr), rt[t], atol=TRAN_TOL,
                                   err_msg=f"tran t={t}")

    snet.reset_states()
    rp2, rt2 = _run_reference(net, j2dc, accc, oric, first_tran=[0.1, 0.2, 3.0])
    for t in range(T):
        p, tr = snet.forward_online(
            j2dc[t], accc[t], oric[t],
            first_tran=[0.1, 0.2, 3.0] if t == 0 else None)
        np.testing.assert_allclose(np.asarray(p), rp2[t], atol=POSE_TOL,
                                   err_msg=f"pose t={t}")
        np.testing.assert_allclose(np.asarray(tr), rt2[t], atol=TRAN_TOL,
                                   err_msg=f"tran t={t}")


# ---------------------------------------------------------------------------
# RNN module parity (articulate/utils/torch/rnn.py:121-133,174-219)
# ---------------------------------------------------------------------------


def test_rnn_forward_parity(ref):
    r"""Reference RNN.forward (pad/pack over a list of variable-length
    sequences) vs rnn_forward_padded with length masking."""
    from articulate.utils.torch import RNN

    torch.manual_seed(3)
    m = RNN(input_size=12, output_size=5, hidden_size=16, num_rnn_layer=2,
            dropout=0.4).eval()
    params = rnn_params_from_torch(torch_state_dict_numpy(m))
    lengths = [9, 4, 7]
    seqs = [torch.randn(l, 12) for l in lengths]
    with torch.no_grad():
        expect = m(seqs)
    T = max(lengths)
    xs = np.zeros((T, len(lengths), 12), np.float32)
    for i, s in enumerate(seqs):
        xs[:lengths[i], i] = s.numpy()
    ys, _ = rnn_forward_padded(params, jnp.asarray(xs),
                               jnp.asarray(lengths))
    ys = np.asarray(ys)
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(ys[:l, i], expect[i].numpy(), atol=1e-5)


def test_rnn_with_init_forward_parity(ref):
    r"""Reference RNNWithInit.forward (init MLP -> (h0, c0) -> RNN) vs
    init_net_apply + rnn_forward_padded (rnn.py:195-218)."""
    from articulate.utils.torch import RNNWithInit

    torch.manual_seed(4)
    m = RNNWithInit(input_size=10, output_size=6, hidden_size=16,
                    num_rnn_layer=2, dropout=0.4).eval()
    params = rnn_params_from_torch(torch_state_dict_numpy(m))
    lengths = [8, 5]
    seqs = [torch.randn(l, 10) for l in lengths]
    inits = [torch.randn(6) for _ in lengths]
    with torch.no_grad():
        expect = m(list(zip(seqs, inits)))
    T = max(lengths)
    xs = np.zeros((T, len(lengths), 10), np.float32)
    for i, s in enumerate(seqs):
        xs[:lengths[i], i] = s.numpy()
    h0, c0 = init_net_apply(params, jnp.asarray(
        np.stack([i.numpy() for i in inits])))
    ys, _ = rnn_forward_padded(params, jnp.asarray(xs),
                               jnp.asarray(lengths), state0=(h0, c0))
    ys = np.asarray(ys)
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(ys[:l, i], expect[i].numpy(), atol=1e-5)


def test_constants_match_reference(ref):
    r"""Domain constants: mp_mask / ji_mask / vi_mask / vel_scale
    (config.py:98-101) must be bit-identical."""
    from robustcap_tpu.config import (IMU_JOINT_MASK, IMU_VERTEX_MASK,
                                      MP_VERTEX_MASK, VEL_SCALE)
    assert list(ref.config.mp_mask) == list(MP_VERTEX_MASK)
    assert list(ref.config.ji_mask) == list(IMU_JOINT_MASK)
    assert list(ref.config.vi_mask) == list(IMU_VERTEX_MASK)
    assert ref.config.vel_scale == VEL_SCALE


def test_pure_rnn_forward_parity(ref):
    r"""Reference PureRNN.forward (bare torch LSTM with proj_size,
    rnn.py:136-172) vs pure_rnn_forward_padded (proj-LSTM cell scan)."""
    from articulate.utils.torch.rnn import PureRNN

    from robustcap_tpu.nn.rnn import (pure_rnn_forward_padded,
                                      pure_rnn_params_from_torch)

    torch.manual_seed(11)
    m = PureRNN(input_size=9, output_size=5, hidden_size=16,
                num_rnn_layer=2).eval()
    params = pure_rnn_params_from_torch(torch_state_dict_numpy(m))
    lengths = [8, 3, 6]
    seqs = [torch.randn(l, 9) for l in lengths]
    with torch.no_grad():
        expect = m(seqs)
    T = max(lengths)
    xs = np.zeros((T, len(lengths), 9), np.float32)
    for i, s in enumerate(seqs):
        xs[:lengths[i], i] = s.numpy()
    ys = np.asarray(pure_rnn_forward_padded(params, jnp.asarray(xs),
                                            jnp.asarray(lengths)))
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(ys[:l, i], expect[i].numpy(), atol=1e-5)


@pytest.mark.parametrize("pred_weight", [1.0, 0.3])
def test_cycle_rnn_forward_parity(ref, pred_weight):
    r"""Reference CycleRNN.forward (autoregressive input-tail lerp,
    rnn.py:222-279) vs cycle_rnn_forward_padded."""
    from articulate.utils.torch.rnn import CycleRNN

    from robustcap_tpu.nn.rnn import (cycle_rnn_forward_padded,
                                      cycle_rnn_params_from_torch)

    torch.manual_seed(12)
    m = CycleRNN(input_size=10, output_size=4, hidden_size=16,
                 num_rnn_layer=2, pred_weight=pred_weight).eval()
    params = cycle_rnn_params_from_torch(torch_state_dict_numpy(m))
    # the reference pads with zeros and runs ALL padded steps (no packing in
    # CycleRNN.forward), so equal lengths keep the comparison exact
    lengths = [7, 7]
    seqs = [torch.randn(l, 10) for l in lengths]
    with torch.no_grad():
        expect = m([s.clone() for s in seqs])
    T = max(lengths)
    xs = np.stack([s.numpy() for s in seqs], axis=1)
    ys = np.asarray(cycle_rnn_forward_padded(
        params, jnp.asarray(xs), jnp.asarray(lengths),
        pred_weight=pred_weight))
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(ys[:l, i], expect[i].numpy(), atol=1e-5)
