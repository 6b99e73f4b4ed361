r"""Cross-implementation parity, extended layers: metric evaluators,
Procrustes, SMPLify loss + GMM prior, IMU synthesis, landmark synthesis —
all executed against the ACTUAL torch reference code."""

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_harness import import_reference_module, load_reference

import jax.numpy as jnp

import robustcap_tpu.math as M
from robustcap_tpu.smpl.model import ParametricModel


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def our_model(ref):
    return ParametricModel(data=ref.smpl_data)


def _rand_pose_seq(T, seed=0, amp=0.3):
    g = torch.Generator().manual_seed(seed)
    aa = torch.randn(T * 24, 3, generator=g) * amp
    import articulate as art
    return art.math.axis_angle_to_rotation_matrix(aa).view(T, 24, 3, 3)


# ---------------------------------------------------------------------------
# FullMotionEvaluator (articulate/evaluator.py:317-394)
# ---------------------------------------------------------------------------


def test_full_motion_evaluator_parity(ref, our_model):
    from robustcap_tpu.eval.evaluator import FullMotionEvaluator

    ref_eval = ref.art.FullMotionEvaluator(ref.smpl_file, joint_mask=[4, 5])
    our_eval = FullMotionEvaluator(model=our_model, joint_mask=[4, 5])
    T = 70   # > fps for the translation-drift window
    pose_p = _rand_pose_seq(T, 1)
    pose_t = _rand_pose_seq(T, 2)
    torch.manual_seed(3)
    tran_p = torch.randn(T, 3) * 0.1
    tran_t = torch.randn(T, 3) * 0.1
    expect = ref_eval(pose_p, pose_t, tran_p=tran_p, tran_t=tran_t).numpy()
    got = np.asarray(our_eval(
        jnp.asarray(pose_p.numpy()), jnp.asarray(pose_t.numpy()),
        tran_p=jnp.asarray(tran_p.numpy()), tran_t=jnp.asarray(tran_t.numpy())))
    # row 4/5 are jerk (fps^3-scaled): compare with relative tolerance
    np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-4,
                               err_msg="FullMotionEvaluator [11,2] mismatch")


def test_position_error_evaluator_parity(ref):
    from robustcap_tpu.eval.evaluator import PositionErrorEvaluator

    torch.manual_seed(4)
    a = torch.randn(50, 3)
    b = torch.randn(50, 3)
    expect = float(ref.art.PositionErrorEvaluator()(a, b))
    got = float(PositionErrorEvaluator()(jnp.asarray(a.numpy()),
                                         jnp.asarray(b.numpy())))
    assert got == pytest.approx(expect, rel=1e-5)


# ---------------------------------------------------------------------------
# Procrustes / PA-MPJPE (utils.py:138-203)
# ---------------------------------------------------------------------------


def test_reconstruction_error_parity(ref):
    from robustcap_tpu.ops.procrustes import reconstruction_error_np

    ref_utils = import_reference_module("utils")
    rng = np.random.RandomState(5)
    S2 = rng.randn(6, 14, 3)
    import articulate as art
    R = art.math.generate_random_rotation_matrix(6).numpy()
    S1 = np.einsum("bij,bnj->bni", R, S2) * 1.3 \
        + rng.randn(6, 1, 3) + rng.randn(6, 14, 3) * 0.05
    expect = ref_utils.reconstruction_error(S1.copy(), S2.copy())
    got = reconstruction_error_np(S1, S2)
    assert float(got) == pytest.approx(float(expect), rel=1e-5)


# ---------------------------------------------------------------------------
# _syn_acc IMU synthesis (preprocess.py:22-33) + sync_mp3d (utils.py:129)
# ---------------------------------------------------------------------------


def test_syn_acc_parity(ref):
    from robustcap_tpu.preprocess.synthesis import syn_acc

    ref_pre = import_reference_module("preprocess")
    torch.manual_seed(6)
    v = torch.randn(40, 6, 3)
    expect = ref_pre._syn_acc(v).numpy()
    got = np.asarray(syn_acc(jnp.asarray(v.numpy())))
    np.testing.assert_allclose(got, expect, atol=1e-2)  # x3600 scaling


def test_sync_mp3d_from_smpl_parity(ref, our_model):
    from robustcap_tpu.config import MP_VERTEX_MASK
    from robustcap_tpu.preprocess.synthesis import sync_3d_mp

    ref_utils = import_reference_module("utils")
    pose = _rand_pose_seq(4, 7)
    grot, joint, vert = ref.sig_mp.body_model.forward_kinematics(
        pose, calc_mesh=True)
    expect = ref_utils.sync_mp3d_from_smpl(vert.clone(), joint).numpy()
    got = np.asarray(sync_3d_mp(
        jnp.asarray(vert.numpy())[:, np.asarray(MP_VERTEX_MASK)],
        jnp.asarray(joint.numpy())))
    np.testing.assert_allclose(got, expect, atol=1e-6)


# ---------------------------------------------------------------------------
# SMPLify loss + GMM prior (net/smplify/losses.py, prior.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gmm_folder(ref, tmp_path_factory):
    r"""A synthetic gmm_08.pkl both implementations load."""
    rng = np.random.RandomState(11)
    means = rng.normal(0, 0.4, (8, 69)).astype(np.float64)
    covs = []
    for _ in range(8):
        a = rng.normal(0, 0.05, (69, 69))
        covs.append(a @ a.T + np.eye(69) * 0.2)
    gmm = {"means": means, "covars": np.stack(covs),
           "weights": rng.dirichlet(np.ones(8))}
    folder = str(tmp_path_factory.mktemp("gmm"))
    with open(os.path.join(folder, "gmm_08.pkl"), "wb") as f:
        pickle.dump(gmm, f)
    return folder


def test_gmm_prior_parity(ref, gmm_folder):
    import net.smplify.prior as ref_prior
    from robustcap_tpu.smplify.prior import MaxMixturePrior

    rp = ref_prior.MaxMixturePrior(prior_folder=gmm_folder, num_gaussians=8)
    op = MaxMixturePrior(gmm_folder, num_gaussians=8)
    torch.manual_seed(12)
    pose = torch.randn(5, 69) * 0.4
    expect = rp(pose, None).detach().numpy()
    got = np.asarray(op(jnp.asarray(pose.numpy())))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_temporal_body_fitting_loss_parity(ref, gmm_folder):
    r"""The complete fitting objective (losses.py:23-91) on identical
    inputs: reprojection GMoF, GMM prior, angle prior, 3-D consistency,
    IMU-orientation term, 2-D/3-D smoothness."""
    import net.smplify.losses as ref_losses
    import net.smplify.prior as ref_prior
    from robustcap_tpu.smplify.losses import temporal_body_fitting_loss
    from robustcap_tpu.smplify.prior import MaxMixturePrior

    torch.manual_seed(13)
    B = 6
    body_pose = torch.randn(B, 72) * 0.3
    model_joints = torch.randn(B, 33, 3) * 0.4 + torch.tensor([0, 0, 3.0])
    joints_2d = torch.randn(B, 33, 2) * 100 + 500
    conf = torch.rand(B, 33)
    cam_k = torch.tensor([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    body_3d = torch.randn(B, 33, 3) * 0.4 + torch.tensor([0, 0, 3.0])
    import articulate as art
    imu_ori = art.math.axis_angle_to_rotation_matrix(
        torch.randn(B * 6, 3) * 0.3).view(B, 6, 3, 3)
    ori = art.math.axis_angle_to_rotation_matrix(
        torch.randn(B * 6, 3) * 0.3).view(B, 6, 3, 3)

    rp = ref_prior.MaxMixturePrior(prior_folder=gmm_folder, num_gaussians=8)
    op = MaxMixturePrior(gmm_folder, num_gaussians=8)

    for output in ("sum", "reprojection"):
        expect = ref_losses.temporal_body_fitting_loss(
            body_pose, model_joints, joints_2d, conf, rp, cam_k, body_3d,
            imu_ori, ori, output=output)
        got = temporal_body_fitting_loss(
            jnp.asarray(body_pose.numpy()), jnp.asarray(model_joints.numpy()),
            jnp.asarray(joints_2d.numpy()), jnp.asarray(conf.numpy()), op,
            jnp.asarray(cam_k.numpy()), jnp.asarray(body_3d.numpy()),
            jnp.asarray(imu_ori.numpy()), jnp.asarray(ori.numpy()),
            output=output)
        np.testing.assert_allclose(np.asarray(got),
                                   expect.detach().numpy(),
                                   rtol=1e-4, atol=1e-3,
                                   err_msg=f"output={output}")


def test_gmof_and_angle_prior_parity(ref):
    import net.smplify.losses as ref_losses
    from robustcap_tpu.smplify.losses import angle_prior, gmof

    torch.manual_seed(14)
    x = torch.randn(7, 33, 2) * 50
    np.testing.assert_allclose(
        np.asarray(gmof(jnp.asarray(x.numpy()), 100.0)),
        ref_losses.gmof(x, 100).numpy(), rtol=1e-6)
    pose = torch.randn(4, 69) * 0.5
    np.testing.assert_allclose(
        np.asarray(angle_prior(jnp.asarray(pose.numpy()))),
        ref_losses.angle_prior(pose).numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# RNNDataset chunking / collate semantics (articulate/utils/torch/rnn.py)
# ---------------------------------------------------------------------------


def test_rnn_dataset_split_parity(ref):
    from articulate.utils.torch import RNNDataset

    from robustcap_tpu.train.data import SeqDataset

    torch.manual_seed(15)
    data = [torch.randn(n, 4) for n in (10, 7, 3)]
    label = [torch.randn(n, 2) for n in (10, 7, 3)]
    ref_ds = RNNDataset(data, label, split_size=4)
    our_ds = SeqDataset([d.numpy() for d in data],
                        [l.numpy() for l in label], split_size=4)
    assert len(ref_ds) == len(our_ds)
    for i in range(len(ref_ds)):
        d_ref, l_ref = ref_ds[i]
        np.testing.assert_allclose(our_ds.data[i], d_ref.numpy(), atol=0)
        np.testing.assert_allclose(our_ds.label[i], l_ref.numpy(), atol=0)
