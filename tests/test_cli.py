r"""CLI surface (``python -m robustcap_tpu ...``, no reference counterpart
— the reference drives workflows by editing ``__main__`` blocks,
SURVEY.md §5). In-process invocations of ``main(argv)``."""

import json
import os

import numpy as np
import pytest

import jax

from robustcap_tpu.__main__ import main
from robustcap_tpu.models import sig_mp
from robustcap_tpu.nn import rnn as R
from robustcap_tpu.train import load_pytree, save_pytree

SMALL_SPECS = {
    "rnn2": (72, 69, 16, 0.4, True),
    "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False),
    "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False),
    "rnn8": (141, 2, 16, 0.4, False),
}


def test_help_lists_all_subcommands(capsys):
    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("eval", "latency", "live-server", "imu-bridge",
                "preprocess", "train", "quantize", "export"):
        assert cmd in out


def test_quantize_pickle_round_trip(tmp_path, capsys):
    params = sig_mp.init_params(jax.random.PRNGKey(0), SMALL_SPECS)
    src = str(tmp_path / "weights.pkl")
    dst = str(tmp_path / "weights.int8.pkl")
    save_pytree(params, src)

    main(["quantize", "--weights", src, "--out", dst])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["out"] == dst

    qp = load_pytree(dst)
    assert R.is_quantized(qp)
    # smaller than the f32 source (toy widths carry proportionally more
    # f32 bias/scale overhead than the full-size bank's ~4x shrink)
    f32_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))
    assert info["bytes"] < 0.55 * f32_bytes
    # the artifact drives the fusion step directly
    np.testing.assert_allclose(
        np.asarray(R.dequantize_tensor(qp["rnn2"]["linear1"]["w"],
                                       jax.numpy.float32)),
        np.asarray(params["rnn2"]["linear1"]["w"]), atol=2e-2)


def test_quantize_orbax_output(tmp_path, capsys):
    params = sig_mp.init_params(jax.random.PRNGKey(1), SMALL_SPECS)
    src = str(tmp_path / "w.pkl")
    dst = str(tmp_path / "w.int8.orbax")
    save_pytree(params, src)
    main(["quantize", "--weights", src, "--out", dst, "--orbax"])
    from robustcap_tpu.train import load_checkpoint_orbax
    qp = load_checkpoint_orbax(dst)
    assert R.is_quantized(qp)


def test_quantize_is_idempotent_on_quantized_input(tmp_path, capsys):
    params = sig_mp.init_params(jax.random.PRNGKey(2), SMALL_SPECS)
    src = str(tmp_path / "w.pkl")
    mid = str(tmp_path / "w.q1.pkl")
    dst = str(tmp_path / "w.q2.pkl")
    save_pytree(params, src)
    main(["quantize", "--weights", src, "--out", mid])
    main(["quantize", "--weights", mid, "--out", dst])
    a, b = load_pytree(mid), load_pytree(dst)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_export_subcommand_round_trip(tmp_path, capsys):
    r"""CLI export produces a loadable serving bundle."""
    from robustcap_tpu.serving import ServingBundle

    params = sig_mp.init_params(jax.random.PRNGKey(1), SMALL_SPECS)
    src = str(tmp_path / "weights.pkl")
    save_pytree(params, src)
    out = str(tmp_path / "bundle")
    main(["export", "--weights", src, "--out", out, "--platforms", "cpu"])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["platforms"] == ["cpu"]
    bundle = ServingBundle.load(out)
    pose, tran = bundle.forward_online(
        np.full((33, 3), 0.5, np.float32), np.zeros((6, 3), np.float32),
        np.broadcast_to(np.eye(3, dtype=np.float32), (6, 3, 3)).copy(),
        first_frame=True)
    assert np.asarray(pose).shape == (24, 3, 3)
    assert np.all(np.isfinite(np.asarray(tran)))
