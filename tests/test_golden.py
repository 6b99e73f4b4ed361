r"""Golden-trajectory regression: the fused scan's output over a recorded
fixture must stay bit-stable (within float noise) across refactors.

Regenerate the fixture with ``python tests/make_golden.py`` only after an
*intentional* semantic change, and explain the change in the commit.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_trajectory.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden fixture not generated")
def test_matches_golden_trajectory():
    from make_golden import build
    pose, tran = build()
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(pose, ref["pose"], atol=5e-4)
    np.testing.assert_allclose(tran, ref["tran"], atol=5e-4)


def test_return_r6d_tap_is_pure_diagnostic():
    r"""``forward_offline(return_r6d=True)`` appends the raw rnn7 head
    output [T, 144] WITHOUT perturbing pose/tran (the tap must be
    dead-code-eliminated from the main outputs), and the tapped r6d
    Gram-Schmidts to the returned global pose for vision-confident frames
    (bench.py uses it to localize parity-outlier conditioning)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from robustcap_tpu.config import SigMPConfig
    from robustcap_tpu.eval import build_aist_sequences
    from robustcap_tpu.models import sig_mp
    from robustcap_tpu.preprocess import build_fixture_dataset
    from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

    specs = {
        "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
        "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
        "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
    }
    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(7), specs)
    ds = build_fixture_dataset(model, n_seq=1, T=16, n_cam=1, seed=5)
    s = build_aist_sequences(ds, num_cameras=1)[0]
    cfg = SigMPConfig()
    pose, tran = sig_mp.forward_offline(
        params, model, cfg, s.j2dc, s.accc, s.oric,
        first_tran=s.first_tran, gravityc=s.gravityc)
    pose2, tran2, r6d = sig_mp.forward_offline(
        params, model, cfg, s.j2dc, s.accc, s.oric,
        first_tran=s.first_tran, gravityc=s.gravityc, return_r6d=True)
    np.testing.assert_array_equal(np.asarray(pose), np.asarray(pose2))
    np.testing.assert_array_equal(np.asarray(tran), np.asarray(tran2))
    assert r6d.shape == (16, 144)

    import dataclasses
    with pytest.raises(ValueError):
        sig_mp.forward_offline(
            params, model, dataclasses.replace(cfg, pallas_serve=True),
            s.j2dc, s.accc, s.oric, return_r6d=True)
