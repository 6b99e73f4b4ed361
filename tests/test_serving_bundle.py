r"""AOT serving bundles: jax.export'ed step + prescan round-trips through
disk and matches the live StreamingNet frame-for-frame (serving story —
no model re-trace at load time; robustcap_tpu/serving.py)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import robustcap_tpu.math as M
from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.models import sig_mp
from robustcap_tpu.serving import ServingBundle, export_serving_bundle
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SPECS = {
    "rnn2": (72, 69, 16, 0.4, True), "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False), "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False), "rnn8": (141, 2, 16, 0.4, False),
}


@pytest.fixture(scope="module")
def world():
    model = ParametricModel(data=synthetic_smpl_data(num_verts=300))
    params = sig_mp.init_params(jax.random.PRNGKey(3), SPECS)
    return model, params


def inputs(T, seed=0):
    rng = np.random.RandomState(seed)
    j2 = np.concatenate([rng.randn(T, 33, 2) * 0.1,
                         np.full((T, 33, 1), 0.9)], 2).astype(np.float32)
    ac = rng.randn(T, 6, 3).astype(np.float32)
    aa = (rng.randn(T * 6, 3) * 0.2).astype(np.float32)
    orc = np.asarray(M.axis_angle_to_rotation_matrix(jnp.asarray(aa))
                     ).reshape(T, 6, 3, 3)
    return j2, ac, orc


def test_export_load_matches_streaming_net(world, tmp_path):
    model, params = world
    cfg = SigMPConfig()
    path = str(tmp_path / "bundle")
    manifest = export_serving_bundle(params, model, cfg, path,
                                     platforms=("cpu",))
    assert os.path.exists(os.path.join(path, "step.bin"))
    assert manifest["config"]["use_flat_floor"] is True

    bundle = ServingBundle.load(path)
    net = sig_mp.StreamingNet(params, model, cfg)
    j2, ac, orc = inputs(6)
    for t in range(6):
        pb, tb = bundle.forward_online(j2[t], ac[t], orc[t],
                                       first_frame=(t == 0))
        pn, tn = net.forward_online(j2[t], ac[t], orc[t],
                                    first_frame=(t == 0))
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pn), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tb), np.asarray(tn), atol=1e-5)

    # reset + second run with first_tran
    bundle.reset_states()
    net2 = sig_mp.StreamingNet(params, model, cfg)
    for t in range(4):
        ft = [0.1, 0.0, 3.0] if t == 0 else None
        pb, tb = bundle.forward_online(j2[t], ac[t], orc[t], first_tran=ft)
        pn, tn = net2.forward_online(j2[t], ac[t], orc[t], first_tran=ft)
        np.testing.assert_allclose(np.asarray(tb), np.asarray(tn), atol=1e-5)


def test_bundle_load_rejects_wrong_version(world, tmp_path):
    model, params = world
    path = str(tmp_path / "bundle")
    export_serving_bundle(params, model, SigMPConfig(), path,
                          platforms=("cpu",))
    mpath = os.path.join(path, "manifest.json")
    m = json.load(open(mpath))
    m["format_version"] = 999
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="format"):
        ServingBundle.load(path)


def test_quantized_bundle(world, tmp_path):
    r"""int8 weights + int8_compute survive export/serialize/load."""
    from robustcap_tpu.nn.rnn import quantize_params
    import dataclasses

    model, params = world
    qparams = quantize_params(params)
    cfg = dataclasses.replace(SigMPConfig(), int8_compute=True)
    path = str(tmp_path / "qbundle")
    export_serving_bundle(qparams, model, cfg, path, platforms=("cpu",))
    bundle = ServingBundle.load(path)
    assert bundle.cfg.int8_compute
    net = sig_mp.StreamingNet(qparams, model, cfg)
    j2, ac, orc = inputs(4, seed=5)
    for t in range(4):
        pb, tb = bundle.forward_online(j2[t], ac[t], orc[t],
                                       first_frame=(t == 0))
        pn, tn = net.forward_online(j2[t], ac[t], orc[t],
                                    first_frame=(t == 0))
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pn), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tb), np.asarray(tn), atol=1e-5)


def test_live_server_runs_on_bundle(world, tmp_path):
    r"""The live engine (transport-free core) accepts a loaded bundle as its
    net — the serving process needs no model code path."""
    from robustcap_tpu.streaming.server import LiveServer

    model, params = world
    path = str(tmp_path / "bundle")
    export_serving_bundle(params, model, SigMPConfig.live_mode(), path,
                          platforms=("cpu",))
    engine = LiveServer(net=ServingBundle.load(path))
    rng = np.random.RandomState(2)
    uv = np.concatenate([rng.randn(33, 2) * 0.1,
                         np.full((33, 1), 0.95)], 1).astype(np.float32)
    ori = np.broadcast_to(np.eye(3, dtype=np.float32), (6, 3, 3)).copy()
    acc = rng.randn(6, 3).astype(np.float32)
    rcm = np.eye(3, dtype=np.float32)
    for _ in range(3):
        pose_aa, tran = engine.process(uv, ori, acc, rcm)
        assert pose_aa.shape == (24, 3)
        assert np.all(np.isfinite(pose_aa)) and np.all(np.isfinite(tran))
    # frame 1 zeroes the world translation at the start position
    engine.reset()
    _, tran0 = engine.process(uv, ori, acc, rcm)
    np.testing.assert_allclose(tran0, 0.0, atol=1e-6)


def test_chunk_export_pallas_serve(world, tmp_path):
    r"""AOT chunk program: the whole-step weight-resident kernel exported
    via jax.export, loaded without model code, agreeing with StreamingNet."""
    import dataclasses
    model, params = world
    cfg = dataclasses.replace(SigMPConfig(), pallas_serve=True)
    path = str(tmp_path / "bundle_chunk")
    manifest = export_serving_bundle(params, model, cfg, path,
                                     platforms=("cpu",), chunk_len=5)
    assert manifest["chunk_mode"] == "pallas_serve"
    assert os.path.exists(os.path.join(path, "chunk.bin"))

    bundle = ServingBundle.load(path)
    ref = sig_mp.StreamingNet(params, model, SigMPConfig())
    j2, ac, orc = inputs(11, seed=5)
    pb0, tb0 = bundle.forward_online(j2[0], ac[0], orc[0], first_frame=True)
    pn0, tn0 = ref.forward_online(j2[0], ac[0], orc[0], first_frame=True)
    np.testing.assert_allclose(np.asarray(pb0), np.asarray(pn0), atol=3e-4)
    for sl in (slice(1, 6), slice(6, 11)):
        pb, tb = bundle.forward_chunk(j2[sl], ac[sl], orc[sl])
        pn, tn = ref.forward_chunk(j2[sl], ac[sl], orc[sl])
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pn), atol=3e-4)
        np.testing.assert_allclose(np.asarray(tb), np.asarray(tn), atol=3e-4)
    with pytest.raises(ValueError):
        bundle.forward_chunk(j2[:3], ac[:3], orc[:3])


def test_multi_length_chunk_export(world, tmp_path):
    r"""extra_chunk_lens: one artifact with several XLA-scan chunk programs;
    forward_chunk dispatches on input length, and a K-then-2K pair advances
    state identically to the per-frame step (the differencing pair bench.py
    uses for the loaded bundle's RTT-free device cost)."""
    model, params = world
    cfg = SigMPConfig()
    path = str(tmp_path / "bundle_multi")
    manifest = export_serving_bundle(params, model, cfg, path,
                                     platforms=("cpu",), chunk_len=4,
                                     extra_chunk_lens=(8,))
    assert manifest["chunk_mode"] == "xla_scan"
    assert manifest["extra_chunk_lens"] == [8]
    assert os.path.exists(os.path.join(path, "chunk.bin"))
    assert os.path.exists(os.path.join(path, "chunk_8.bin"))

    bundle = ServingBundle.load(path)
    net = sig_mp.StreamingNet(params, model, cfg)
    j2, ac, orc = inputs(13, seed=7)
    bundle.forward_online(j2[0], ac[0], orc[0], first_frame=True)
    net.forward_online(j2[0], ac[0], orc[0], first_frame=True)
    pb4, tb4 = bundle.forward_chunk(j2[1:5], ac[1:5], orc[1:5])
    pn4, tn4 = net.forward_chunk(j2[1:5], ac[1:5], orc[1:5])
    np.testing.assert_allclose(np.asarray(pb4), np.asarray(pn4), atol=3e-4)
    pb8, tb8 = bundle.forward_chunk(j2[5:13], ac[5:13], orc[5:13])
    pn8, tn8 = net.forward_chunk(j2[5:13], ac[5:13], orc[5:13])
    np.testing.assert_allclose(np.asarray(pb8), np.asarray(pn8), atol=3e-4)
    np.testing.assert_allclose(np.asarray(tb8), np.asarray(tn8), atol=3e-4)
    with pytest.raises(ValueError):
        bundle.forward_chunk(j2[:6], ac[:6], orc[:6])
