r"""3DPW-schema evaluation path: camera-frame data, per-frame gravity,
flat floor disabled (BASELINE.json configs[3])."""

import numpy as np
import jax
import pytest

from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.eval import build_pw3d_sequences, evaluate_sequences
from robustcap_tpu.models import sig_mp
from robustcap_tpu.preprocess import build_fixture_dataset_pw3d
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data(num_verts=500))
    params = sig_mp.init_params(jax.random.PRNGKey(3), SPECS)
    ds = build_fixture_dataset_pw3d(model, n_seq=2, T=32, seed=21)
    return model, params, ds


class TestPw3d:
    def test_sequence_assembly(self, world):
        model, _, ds = world
        seqs = build_pw3d_sequences(ds)
        assert len(seqs) == 2
        s = seqs[0]
        assert s.gravityc.shape == (32, 3)
        # per-frame gravity: unit vectors, slowly varying
        np.testing.assert_allclose(np.linalg.norm(s.gravityc, axis=1), 1,
                                   atol=1e-4)
        assert s.first_tran is not None and not s.first_frame
        # normalized keypoints reproject GT hips approximately
        j3 = s.pose_gt  # rotations; just sanity on kp range instead
        assert np.isfinite(s.j2dc).all()

    def test_eval_profile(self, world):
        model, params, ds = world
        seqs = build_pw3d_sequences(ds)
        out = evaluate_sequences(
            seqs, params=params, model=model,
            cfg=SigMPConfig(use_flat_floor=False),
            first_tran_mode="gt", run_smplify=False, pad_to_multiple=32)
        assert np.isfinite(out["mpjpe"]) and np.isfinite(out["pampjpe"])
        assert out["pose_p"][0].shape == (32, 24, 3, 3)

    def test_skip_none_keypoints(self, world):
        model, _, ds = world
        import copy
        ds2 = {k: list(v) for k, v in ds.items()}
        ds2["joint2d_mp"] = [None, ds["joint2d_mp"][1]]
        seqs = build_pw3d_sequences(ds2)
        assert len(seqs) == 1
