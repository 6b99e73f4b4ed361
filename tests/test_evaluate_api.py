r"""Public evaluate.py-equivalent API on fixture datasets (caching, profiles,
visualization export)."""

import os

import numpy as np
import jax
import pytest

from robustcap_tpu.models import sig_mp
from robustcap_tpu.preprocess import build_fixture_dataset
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data(num_verts=400))
    params = sig_mp.init_params(jax.random.PRNGKey(1), SPECS)
    ds = build_fixture_dataset(model, n_seq=1, T=32, n_cam=2, seed=9)
    return model, params, ds


class TestEvaluateAPI:
    def test_evaluate_aist_entry(self, world, tmp_path, monkeypatch):
        model, params, ds = world
        from robustcap_tpu import config as C
        monkeypatch.setenv("ROBUSTCAP_DATA", str(tmp_path))
        monkeypatch.setattr(C, "paths", C.Paths(data_root=str(tmp_path)))
        import robustcap_tpu.eval.evaluate as E
        monkeypatch.setattr(E, "paths", C.Paths(data_root=str(tmp_path)))
        out = E.evaluate_aist_ours(run_smplify=False, params=params,
                                   model=model, dataset=ds, use_cache=True)
        assert np.isfinite(out["mpjpe"])
        cache = os.path.join(str(tmp_path), "dataset_work/AIST/result.pt")
        assert os.path.exists(cache)
        # second run consumes the cache (no params needed)
        out2 = E.evaluate_aist_ours(run_smplify=False, params=None,
                                    model=model, dataset=ds, use_cache=True)
        np.testing.assert_allclose(out2["mpjpe"], out["mpjpe"], rtol=1e-5)

    def test_evaluate_tc_entry(self, world, tmp_path, monkeypatch):
        model, params, ds = world
        from robustcap_tpu import config as C
        import robustcap_tpu.eval.evaluate as E
        monkeypatch.setattr(E, "paths", C.Paths(data_root=str(tmp_path)))
        # fixture has 2 cameras; tc wants per-camera lists too
        import robustcap_tpu.eval.datasets as D
        seqs = D.build_tc_sequences(ds, num_cameras=2)
        assert all(s.first_frame for s in seqs)
        out = E.evaluate_sequences(seqs, params=params, model=model,
                                   first_tran_mode="first_frame",
                                   pad_to_multiple=32)
        assert np.isfinite(out["mpjpe"])

    def test_view_aist_software_render(self, world):
        model, params, ds = world
        from robustcap_tpu.eval import view_aist
        frames = view_aist(0, 0, run_smplify=False, params=params,
                           model=model, dataset=ds, max_frames=2)
        assert len(frames) == 2
        assert frames[0].shape == (1080, 1920, 3)
        assert frames[0].sum() > 0  # something rendered

    def test_view_aist_unity_export(self, world, tmp_path):
        model, params, ds = world
        from robustcap_tpu.eval import view_aist_unity
        out_dir = view_aist_unity(0, 0, params=params, model=model,
                                  dataset=ds, out_dir=str(tmp_path / "u"))
        pose_lines = open(os.path.join(out_dir, "pose.txt")).read().split("\n")
        assert len(pose_lines) == 32
        assert len(pose_lines[0].split(",")) == 72
        tran0 = [float(v) for v in
                 open(os.path.join(out_dir, "tran.txt")).readline().split(",")]
        np.testing.assert_allclose(tran0, 0, atol=1e-4)
