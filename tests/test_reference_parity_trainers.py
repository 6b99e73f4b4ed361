r"""Cross-implementation parity for the trainers' feature engineering.

The reference defines its per-RNN dataset builders *inside*
``train_rnn{2,3,4,6,7,8}`` (net/sig_mp.py:301-839). These tests lift the
genuine nested definitions out with ``extract_trainer_inner`` (AST, executed
under the reference module's own globals), feed both sides the same
synthetic corpus saved as a torch ``.pt``, and assert the produced
``(data, label)`` sequences agree.

Notably covers the reference's rnn4 occluded-branch quirk
(net/sig_mp.py:481: the bbox division is applied to the already-consumed
clean ``j2dc`` instead of ``j2dc_occ``), which
``train.features.cliff_normalize_seq(bbox_scale=False)`` reproduces.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_harness import (extract_trainer_inner, load_reference,
                                reference_scratch_root)

from robustcap_tpu.preprocess import build_fixture_dataset
from robustcap_tpu.smpl.model import ParametricModel
from robustcap_tpu.train import features as F

N_SEQ, T, N_CAM = 2, 22, 2


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def our_model(ref):
    return ParametricModel(data=ref.smpl_data)


@pytest.fixture(scope="module")
def corpus(ref, our_model, tmp_path_factory):
    r"""One synthetic corpus in the preprocessed AIST/AMASS schema, as a
    numpy dict (for our feature functions) and as a saved ``train.pt``
    (for the reference builders). Camera lists are padded to the
    reference's hard-coded 9 views (sig_mp.py:446 ``for j in range(9)``)
    with ``None`` entries."""
    ds = build_fixture_dataset(our_model, n_seq=N_SEQ, T=T, n_cam=N_CAM,
                               seed=11)
    rng = np.random.RandomState(3)
    # occluded-detector variants: jittered keypoints, new confidence; one
    # view gets a length-mismatched track to exercise the skip branch
    ds["joint2d_occ"] = []
    for i in range(N_SEQ):
        occ_cams = []
        for j, kp in enumerate(ds["joint2d_mp"][i]):
            occ = np.array(kp, np.float32)
            occ[..., :2] += rng.normal(0, 0.004, occ[..., :2].shape)
            occ[..., 2] = np.clip(rng.uniform(0.2, 1.0, (T, 1)), 0, 1)
            occ_cams.append(occ.astype(np.float32))
        occ_cams[-1] = occ_cams[-1][: T - 3]  # mismatched length -> skipped
        ds["joint2d_occ"].append(occ_cams)

    def tt(x):
        # fixture arrays can be F-ordered (np.apply_along_axis); real
        # corpora are C-contiguous, and the reference relies on .view()
        return torch.from_numpy(np.ascontiguousarray(x, np.float32))

    def pad9(cams):
        return [None if c is None else tt(c) for c in cams] \
            + [None] * (9 - len(cams))

    ds_t = {
        "name": list(ds["name"]),
        "pose": [tt(p) for p in ds["pose"]],
        "tran": [tt(t) for t in ds["tran"]],
        "joint3d": [tt(j) for j in ds["joint3d"]],
        "imu_ori": [tt(o) for o in ds["imu_ori"]],
        "imu_acc": [tt(a) for a in ds["imu_acc"]],
        "sync_3d_mp": [tt(m) for m in ds["sync_3d_mp"]],
        "joint2d_mp": [pad9(c) for c in ds["joint2d_mp"]],
        "joint2d_occ": [pad9(c) for c in ds["joint2d_occ"]],
        "cam_K": [[tt(K) for K in cams] for cams in ds["cam_K"]],
        "cam_T": [[tt(Tm) for Tm in cams] for cams in ds["cam_T"]],
    }
    data_dir = tmp_path_factory.mktemp("trainer_corpus")
    torch.save(ds_t, os.path.join(str(data_dir), "train.pt"))
    return ds, str(data_dir)


def _ref_lists(dataset):
    r"""(data, label) numpy lists out of a reference RNNDataset."""
    return ([d.detach().cpu().numpy() for d in dataset.data],
            [l.detach().cpu().numpy() for l in dataset.label])


def _assert_pairs_close(ref_pair, our_pair, atol, label_atol=None):
    rd, rl = ref_pair
    od, ol = our_pair
    assert len(rd) == len(od) and len(rl) == len(ol)
    assert len(rd) > 0
    for a, b in zip(rd, od):
        assert a.shape == np.asarray(b).shape
        np.testing.assert_allclose(a, b, atol=atol)
    for a, b in zip(rl, ol):
        np.testing.assert_allclose(a, b, atol=label_atol or atol)


# ---------------------------------------------------------------------------
# rnn2: IMU -> root-relative joints (sig_mp.py:301-336)
# ---------------------------------------------------------------------------


def test_rnn2_aist_builder_parity(corpus):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn2", "AISTDataset")
    ref_ds = builder(data_dir, "train")
    _assert_pairs_close(_ref_lists(ref_ds), F.rnn2_features(ds), atol=2e-5)


def test_rnn2_amass_builder_parity(corpus):
    # the AMASS builder rotates relative joints instead of subtracting
    # rotated absolutes (sig_mp.py:327) — algebraically the same transform
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn2", "AMASSDataset")
    ref_ds = builder(data_dir, "train")
    _assert_pairs_close(_ref_lists(ref_ds), F.rnn2_features(ds), atol=2e-5)


def test_rnn2_split_size_chunking(corpus):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn2", "AISTDataset")
    ref_ds = builder(data_dir, "train", split_size=8)
    from robustcap_tpu.train.data import SeqDataset
    data, label = F.rnn2_features(ds)
    ours = SeqDataset(data, label, split_size=8)
    assert len(ref_ds.data) == len(ours.data)
    for a, b in zip(ref_ds.data, ours.data):
        np.testing.assert_allclose(a.detach().cpu().numpy(), b, atol=2e-5)


# ---------------------------------------------------------------------------
# rnn3: IMU + joints -> scaled root velocity (sig_mp.py:359-405)
# ---------------------------------------------------------------------------


def test_rnn3_aist_builder_parity(corpus):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn3", "AISTDataset")
    ref_ds = builder(data_dir, "train")
    assert ref_ds.augment_fn is not None  # noise augment present
    _assert_pairs_close(_ref_lists(ref_ds), F.rnn3_features(ds), atol=2e-5)


def test_rnn3_amass_builder_parity(corpus):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn3", "AMASSDataset")
    ref_ds = builder(data_dir, "train")
    _assert_pairs_close(_ref_lists(ref_ds), F.rnn3_features(ds), atol=2e-5)


# ---------------------------------------------------------------------------
# rnn4: camera-frame IMU + CLIFF-normalized keypoints (sig_mp.py:444-486)
# ---------------------------------------------------------------------------


def test_rnn4_aist_builder_parity_including_occlusion_quirk(corpus):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn4", "AISTDataset")
    ref_ds = builder(data_dir, "train")
    rd, rl = _ref_lists(ref_ds)
    # clean + occluded samples per camera, minus the length-mismatched one
    assert len(rd) == N_SEQ * N_CAM * 2 - N_SEQ
    _assert_pairs_close((rd, rl), F.rnn4_features_aist(ds), atol=3e-5)


def test_rnn4_occluded_samples_are_not_bbox_scaled(corpus):
    r"""Pin the quirk itself: the occluded keypoints the reference emits are
    NOT bbox-normalized (the division at sig_mp.py:481 lands on the dead
    clean tensor), so naive full normalization must NOT match."""
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn4", "AISTDataset")
    rd, _ = _ref_lists(builder(data_dir, "train"))
    occ_sample = rd[1]  # seq0/cam0 occluded variant
    kp_ref = occ_sample[:, 72:].reshape(-1, 33, 3)
    import jax.numpy as jnp
    Kinv = np.linalg.inv(np.asarray(ds["cam_K"][0][0], np.float32))
    kp = F._detector_kp(ds, "joint2d_occ", 0, 0, Kinv)
    wrong = F.cliff_normalize_seq(kp)[1:-1]
    right = F.cliff_normalize_seq(kp, bbox_scale=False)[1:-1]
    np.testing.assert_allclose(kp_ref, right, atol=3e-5)
    assert not np.allclose(kp_ref, wrong, atol=1e-3)


# ---------------------------------------------------------------------------
# rnn6: camera-frame IMU + raw keypoints + joints -> translation
# (sig_mp.py:583-616)
# ---------------------------------------------------------------------------


def test_rnn6_aist_builder_parity(corpus):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn6", "AISTDataset")
    ref_ds = builder(data_dir, "train")
    _assert_pairs_close(_ref_lists(ref_ds), F.rnn6_features_aist(ds),
                        atol=3e-5)


# ---------------------------------------------------------------------------
# rnn7: IMU (pelvis unrotated) + joints -> global 6-D pose
# (sig_mp.py:700-747)
# ---------------------------------------------------------------------------


def test_rnn7_aist_builder_parity(corpus, our_model):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn7", "AISTDataset")
    ref_ds = builder(data_dir, "train")
    # labels go through forward_kinematics_R of the respective body models
    _assert_pairs_close(_ref_lists(ref_ds), F.rnn7_features(ds, our_model),
                        atol=2e-5, label_atol=1e-4)


def test_rnn7_amass_builder_parity(corpus, our_model):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn7", "AMASSDataset")
    ref_ds = builder(data_dir, "train")
    _assert_pairs_close(_ref_lists(ref_ds), F.rnn7_features(ds, our_model),
                        atol=2e-5, label_atol=1e-4)


# ---------------------------------------------------------------------------
# rnn8: IMU + joints -> foot contacts (sig_mp.py:790-821)
# ---------------------------------------------------------------------------


def test_rnn8_amass_builder_parity(corpus):
    ds, data_dir = corpus
    builder = extract_trainer_inner("train_rnn8", "AMASSDataset")
    ref_ds = builder(data_dir, "train")
    rd, rl = _ref_lists(ref_ds)
    od, ol = F.rnn8_features(ds)
    _assert_pairs_close((rd, rl), (od, ol), atol=2e-5)
    # labels are hard {0,1} contacts; require exact agreement
    for a, b in zip(rl, ol):
        assert np.array_equal(a, np.asarray(b, np.float32).reshape(a.shape))


# ---------------------------------------------------------------------------
# rnn4/rnn6 AMASS base sequences (random-camera synthesis happens per draw
# in __getitem__; the deterministic base data/label is built in __init__,
# sig_mp.py:489-518 / :619-647)
# ---------------------------------------------------------------------------


def _instantiate_amass_class(trainer, data_dir, conf_pool):
    cls = extract_trainer_inner(trainer, "AMASSDataset")
    scratch = reference_scratch_root()
    conf_file = os.path.join(scratch, "data", "dataset_work", "syn_c.pt")
    os.makedirs(os.path.dirname(conf_file), exist_ok=True)
    torch.save(torch.from_numpy(conf_pool), conf_file)
    cwd = os.getcwd()
    os.chdir(scratch)  # self.conf loads from a relative path (sig_mp.py:497)
    try:
        return cls(data_dir, "train")
    finally:
        os.chdir(cwd)


@pytest.mark.parametrize("trainer", ["train_rnn4", "train_rnn6"])
def test_amass_mp_base_parity(corpus, trainer):
    ds, data_dir = corpus
    # the real syn_c.pt holds per-frame-per-landmark confidence [N, 33, 1]
    conf_pool = np.random.RandomState(5).uniform(
        0.5, 1.0, (64, 33, 1)).astype(np.float32)
    ref_ds = _instantiate_amass_class(trainer, data_dir, conf_pool)
    _assert_pairs_close(_ref_lists(ref_ds), F.amass_mp_base(ds), atol=2e-5)


def test_amass_camera_augment_matches_reference_given_same_draws(corpus):
    r"""Drive the reference rnn4 AMASS ``__getitem__`` (sig_mp.py:520-552)
    with pinned randomness (constant confidence 1 -> zero keypoint noise,
    patched rotation/uniform draws) and check our jittable
    ``amass_camera_augment`` reproduces it given the same draws."""
    import jax
    import jax.numpy as jnp

    ds, data_dir = corpus
    ref = load_reference()
    # p=1 -> normal(x, 0) == x, and random.sample order becomes irrelevant
    conf_pool = np.ones((64, 33, 1), np.float32)
    ref_ds = _instantiate_amass_class("train_rnn4", data_dir, conf_pool)

    fixed_aa = torch.tensor([0.2, -0.4, 0.1])
    fixed_u3 = torch.tensor([0.3, 0.7, 0.25])
    art_math = ref.art.math
    orig_rot = art_math.generate_random_rotation_matrix_constrained
    orig_rand = torch.rand
    try:
        fixed_R = orig_rot(n=1, y=(-180, 180), p=(-30, 30), r=(-5, 5))
        fixed_R[0] = art_math.axis_angle_to_rotation_matrix(fixed_aa)[0]
        art_math.generate_random_rotation_matrix_constrained = \
            lambda *a, **k: fixed_R.clone()
        torch.rand = lambda *a, **k: fixed_u3.clone()
        data_ref, label_ref = ref_ds[0]
    finally:
        art_math.generate_random_rotation_matrix_constrained = orig_rot
        torch.rand = orig_rand

    base_data, base_label = F.amass_mp_base(ds)
    out, lbl = F.amass_camera_augment(
        jax.random.PRNGKey(0), jnp.asarray(base_data[0]),
        jnp.asarray(base_label[0]), jnp.asarray(conf_pool), target="rnn4",
        draws={"Rc0c": np.asarray(fixed_R[0].numpy()),
               "uniform3": np.asarray(fixed_u3.numpy())})
    np.testing.assert_allclose(np.asarray(out),
                               data_ref.detach().cpu().numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(lbl),
                               label_ref.detach().cpu().numpy(), atol=5e-5)
