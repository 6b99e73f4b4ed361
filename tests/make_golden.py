r"""Regenerate the golden trajectory fixture (run manually after an
*intentional* semantic change; tests/test_golden.py compares against it).

    python tests/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402


def build():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
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
    params = sig_mp.init_params(jax.random.PRNGKey(42), specs)

    def conf_fn(rng, T):
        conf = np.full(T, 0.95, np.float32)
        conf[8:16] = 0.2
        conf[20:24] = 0.75
        return conf

    ds = build_fixture_dataset(model, n_seq=1, T=32, n_cam=1, seed=1234,
                               conf_fn=conf_fn)
    s = build_aist_sequences(ds, num_cameras=1)[0]
    pose, tran = sig_mp.forward_offline(
        params, model, SigMPConfig(), s.j2dc, s.accc, s.oric,
        first_tran=s.first_tran, gravityc=s.gravityc)
    return np.asarray(pose), np.asarray(tran)


if __name__ == "__main__":
    pose, tran = build()
    out = os.path.join(os.path.dirname(__file__), "golden_trajectory.npz")
    np.savez_compressed(out, pose=pose, tran=tran)
    print("wrote", out, pose.shape, tran.shape)
