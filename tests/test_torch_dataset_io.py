r"""Torch .pt dataset round trip: the reference's on-disk artifacts load
through our host-side IO into the eval pipeline."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from robustcap_tpu.eval import build_aist_sequences, load_torch_file
from robustcap_tpu.preprocess import build_fixture_dataset
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data


def test_pt_round_trip(tmp_path):
    model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
    ds = build_fixture_dataset(model, n_seq=1, T=16, n_cam=2, seed=4)
    # store with torch tensors, like the reference's preprocess output
    ds_t = {
        "name": ds["name"],
        "pose": [torch.from_numpy(np.asarray(p)) for p in ds["pose"]],
        "tran": [torch.from_numpy(np.asarray(t)) for t in ds["tran"]],
        "joint3d": [torch.from_numpy(np.asarray(j)) for j in ds["joint3d"]],
        "imu_ori": [torch.from_numpy(np.asarray(o)) for o in ds["imu_ori"]],
        "imu_acc": [torch.from_numpy(np.asarray(a)) for a in ds["imu_acc"]],
        "joint2d_mp": [[torch.from_numpy(np.asarray(k)) for k in cams]
                       for cams in ds["joint2d_mp"]],
        "cam_K": [[torch.from_numpy(np.asarray(K)) for K in cams]
                  for cams in ds["cam_K"]],
        "cam_T": [[torch.from_numpy(np.asarray(T_)) for T_ in cams]
                  for cams in ds["cam_T"]],
    }
    path = tmp_path / "test.pt"
    torch.save(ds_t, path)

    loaded = load_torch_file(str(path))
    seqs_a = build_aist_sequences(loaded)
    seqs_b = build_aist_sequences(ds)
    assert len(seqs_a) == len(seqs_b) == 2
    for a, b in zip(seqs_a, seqs_b):
        np.testing.assert_allclose(a.j2dc, b.j2dc, atol=1e-5)
        np.testing.assert_allclose(a.pose_gt, b.pose_gt, atol=1e-5)
        np.testing.assert_allclose(a.gravityc, b.gravityc, atol=1e-6)
