r"""Fused whole-step serving kernel (ops/pallas_serve.py) vs the XLA scan.

The kernel implements the branchless steady step (models/sig_mp.py::make_step
with include_first_frame_step=False, cond_updater=False) for a whole chunk in
one launch. These tests run identical frame streams through both paths and
compare per-frame outputs AND the final carry (states, floor ring, flags), so
any divergence in the cells, the gate, the refeed selects, the IMU updater,
or the tail surfaces directly. CPU runs the kernel in interpret mode — the
identical kernel code the TPU build compiles (bench.py measures it on chip).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustcap_tpu.config import SigMPConfig
from robustcap_tpu.models import sig_mp
from robustcap_tpu.ops.pallas_serve import prepare_serve_params, serve_scan
from robustcap_tpu.smpl import ParametricModel, synthetic_smpl_data

SMALL_SPECS = {
    "rnn2": (72, 69, 16, 0.4, True),
    "rnn3": (141, 3, 16, 0.4, False),
    "rnn4": (171, 69, 24, 0.4, False),
    "rnn6": (240, 3, 20, 0.4, False),
    "rnn7": (141, 144, 16, 0.1, False),
    "rnn8": (141, 2, 16, 0.4, False),
}

ATOL = 3e-4  # split/fused matmul accumulation-order differences, compounded
             # through the carried hidden states over a chunk


@pytest.fixture(scope="module")
def setup():
    model = ParametricModel(data=synthetic_smpl_data())
    params = sig_mp.init_params(jax.random.PRNGKey(0), SMALL_SPECS)
    return model, params


def _frames(key, conf_pattern, first_tran=None, first_frame=True):
    T = len(conf_pattern)
    ks = jax.random.split(key, 3)
    j2dc = jax.random.uniform(ks[0], (T, 33, 3), minval=0.2, maxval=0.9)
    conf = jnp.asarray(conf_pattern, jnp.float32)[:, None]
    j2dc = j2dc.at[:, :, 2].set(conf)
    accc = jax.random.normal(ks[1], (T, 6, 3))
    import robustcap_tpu.math as M
    oric = M.r6d_to_rotation_matrix(
        jax.random.normal(ks[2], (T * 6, 6))).reshape(T, 6, 3, 3)
    return sig_mp._sequence_frames(j2dc, accc, oric, first_tran,
                                   first_frame, None)


def _run_xla(params, model, cfg, frames):
    r"""Oracle: the branchless steady scan (the form the kernel mirrors)."""
    step = sig_mp.make_step(model, cfg, include_first_frame_step=False,
                            output_contacts=True, cond_updater=False,
                            fuse_spec_heads=False)
    frame0 = jax.tree.map(lambda x: x[0], frames)
    carry = sig_mp.prescan_first_frame(params, model,
                                       sig_mp.init_carry(params), frame0)
    carry, out = jax.lax.scan(partial(step, params), carry, frames)
    return carry, out


def _run_serve(params, model, cfg, frames, stream=()):
    prepped = prepare_serve_params(params, dtype=jnp.float32, stream=stream)
    frame0 = jax.tree.map(lambda x: x[0], frames)
    carry = sig_mp.prescan_first_frame(params, model,
                                       sig_mp.init_carry(params), frame0)
    return serve_scan(prepped, model, cfg, frames, carry)


def _check(params, model, cfg, frames, stream=(), atol=ATOL):
    carry_x, (pose_x, tran_x, contact_x) = _run_xla(params, model, cfg,
                                                    frames)
    pose_s, tran_s, contact_s, carry_s = _run_serve(params, model, cfg,
                                                    frames, stream)
    np.testing.assert_allclose(np.asarray(pose_s), np.asarray(pose_x),
                               atol=atol, rtol=0)
    np.testing.assert_allclose(np.asarray(tran_s), np.asarray(tran_x),
                               atol=atol, rtol=0)
    np.testing.assert_allclose(np.asarray(contact_s), np.asarray(contact_x),
                               atol=atol, rtol=0)
    for name in SMALL_SPECS:
        for i in (0, 1):
            np.testing.assert_allclose(
                np.asarray(carry_s["states"][name][i]),
                np.asarray(carry_x["states"][name][i]), atol=atol, rtol=0,
                err_msg=f"state {name}[{i}]")
    for key in ("last_tran", "floor_buf", "j_temp", "last_pfoot"):
        np.testing.assert_allclose(np.asarray(carry_s[key], np.float64),
                                   np.asarray(carry_x[key], np.float64),
                                   atol=atol, rtol=0, err_msg=key)
    for key in ("floor_cnt", "vision_count"):
        assert int(carry_s[key]) == int(carry_x[key]), key
    for key in ("has_pfoot", "has_tran", "first_reach"):
        assert bool(carry_s[key]) == bool(carry_x[key]), key
    return carry_s


MIXED = [0.2, 0.75, 0.95, 0.1, 0.9, 0.72, 0.95, 0.3, 0.95, 0.95,
         0.05, 0.78, 0.95, 0.95, 0.2, 0.95]


class TestServeAgreement:
    def test_mixed_confidence(self, setup):
        model, params = setup
        frames = _frames(jax.random.PRNGKey(1), MIXED,
                         first_tran=jnp.asarray([0.1, 0.2, 1.5]))
        _check(params, model, SigMPConfig(), frames)

    def test_imu_updater_fires_midchunk(self, setup):
        model, params = setup
        # starts occluded (first_reach stays set), then the first confident
        # frame triggers the one-shot rnn2 state rewrite inside the chunk
        pattern = [0.1, 0.2, 0.1, 0.95, 0.9, 0.3, 0.95, 0.1]
        frames = _frames(jax.random.PRNGKey(2), pattern, first_frame=False)
        carry = _check(params, model, SigMPConfig(), frames)
        assert not bool(carry["first_reach"])

    def test_floor_fill_and_snap(self, setup):
        model, params = setup
        cfg = SigMPConfig(contact_threshold=0.2, height_threshold=5.0)
        frames = _frames(jax.random.PRNGKey(3), [0.95] * 20)
        carry = _check(params, model, cfg, frames)
        assert int(carry["floor_cnt"]) == 11

    def test_live_throttle(self, setup):
        model, params = setup
        cfg = SigMPConfig(live=True, update_vision_freq=3,
                          conf_range=(0.5, 0.6))
        pattern = [0.3, 0.2, 0.9, 0.1, 0.2, 0.3, 0.1, 0.9, 0.2, 0.1]
        frames = _frames(jax.random.PRNGKey(4), pattern,
                         first_tran=jnp.asarray([0.0, 0.0, 2.0]))
        _check(params, model, cfg, frames)

    def test_live_throttle_streamed(self, setup):
        r"""Live skip + DMA streaming together: the frame-top prefetch and
        the in-cells wait are both inside the same pl.when, so the
        semaphore pairing must survive skipped frames."""
        model, params = setup
        cfg = SigMPConfig(live=True, update_vision_freq=3,
                          conf_range=(0.5, 0.6))
        pattern = [0.3, 0.2, 0.9, 0.1, 0.2, 0.3, 0.1, 0.9, 0.2, 0.1]
        frames = _frames(jax.random.PRNGKey(12), pattern,
                         first_tran=jnp.asarray([0.0, 0.0, 2.0]))
        _check(params, model, cfg, frames, stream=("rnn6",))

    def test_no_flat_floor(self, setup):
        model, params = setup
        frames = _frames(jax.random.PRNGKey(5), MIXED)
        _check(params, model, SigMPConfig(use_flat_floor=False), frames)

    def test_pose_blendshape(self, setup):
        _, params = setup
        model = ParametricModel(data=synthetic_smpl_data(),
                                use_pose_blendshape=True)
        frames = _frames(jax.random.PRNGKey(6), MIXED,
                         first_tran=jnp.asarray([0.1, 0.0, 1.2]))
        _check(params, model, SigMPConfig(), frames)

    def test_streamed_weights_dma(self, setup):
        r"""The per-frame HBM->VMEM gate-matrix DMA path, interpret mode."""
        model, params = setup
        frames = _frames(jax.random.PRNGKey(7), MIXED[:8])
        _check(params, model, SigMPConfig(), frames, stream=("rnn6",))

    def test_chunk_chaining(self, setup):
        r"""Carry handoff: two chunks == one double-length chunk."""
        model, params = setup
        frames = _frames(jax.random.PRNGKey(8), MIXED)
        prepped = prepare_serve_params(params, dtype=jnp.float32, stream=())
        frame0 = jax.tree.map(lambda x: x[0], frames)
        carry = sig_mp.prescan_first_frame(params, model,
                                           sig_mp.init_carry(params), frame0)
        pose_a, tran_a, _, _ = serve_scan(prepped, model, SigMPConfig(),
                                          frames, carry)
        half = len(MIXED) // 2
        f1 = jax.tree.map(lambda x: x[:half], frames)
        f2 = jax.tree.map(lambda x: x[half:], frames)
        p1, t1, _, carry_mid = serve_scan(prepped, model, SigMPConfig(),
                                          f1, carry)
        p2, t2, _, _ = serve_scan(prepped, model, SigMPConfig(), f2,
                                  carry_mid)
        np.testing.assert_allclose(np.concatenate([p1, p2]),
                                   np.asarray(pose_a), atol=1e-5, rtol=0)
        np.testing.assert_allclose(np.concatenate([t1, t2]),
                                   np.asarray(tran_a), atol=1e-5, rtol=0)


class TestEndToEnd:
    def test_forward_offline(self, setup):
        r"""Public surface: cfg.pallas_serve vs the default (cond) scan."""
        import dataclasses
        model, params = setup
        frames = _frames(jax.random.PRNGKey(9), np.resize(MIXED, 24).tolist())
        j2dc, accc, oric = frames["j2dc"], frames["accc"], frames["oric"]
        pa, ta, ca = sig_mp.forward_offline(params, model, SigMPConfig(),
                                            j2dc, accc, oric,
                                            first_frame=True,
                                            return_contacts=True)
        cfg = dataclasses.replace(SigMPConfig(), pallas_serve=True)
        pb, tb, cb = sig_mp.forward_offline(params, model, cfg, j2dc, accc,
                                            oric, first_frame=True,
                                            return_contacts=True)
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa), atol=ATOL)
        np.testing.assert_allclose(np.asarray(tb), np.asarray(ta), atol=ATOL)
        np.testing.assert_allclose(np.asarray(cb), np.asarray(ca), atol=ATOL)

    def test_streaming_net_chunk(self, setup):
        r"""StreamingNet.forward_chunk: serve kernel vs the XLA chunk,
        state carried across a frame dispatch and two chunks."""
        import dataclasses
        model, params = setup
        cfg = dataclasses.replace(SigMPConfig(), pallas_serve=True)
        net = sig_mp.StreamingNet(params, model, cfg)
        ref = sig_mp.StreamingNet(params, model, SigMPConfig())
        frames = _frames(jax.random.PRNGKey(10), MIXED[:10])
        f0 = jax.tree.map(lambda x: x[0], frames)
        p0, t0 = net.forward_online(f0["j2dc"], f0["accc"], f0["oric"],
                                    first_frame=True)
        q0, u0 = ref.forward_online(f0["j2dc"], f0["accc"], f0["oric"],
                                    first_frame=True)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(q0), atol=ATOL)
        for sl in (slice(1, 6), slice(6, 10)):
            pc, tc = net.forward_chunk(frames["j2dc"][sl],
                                       frames["accc"][sl],
                                       frames["oric"][sl])
            qc, uc = ref.forward_chunk(frames["j2dc"][sl],
                                       frames["accc"][sl],
                                       frames["oric"][sl])
            np.testing.assert_allclose(np.asarray(pc), np.asarray(qc),
                                       atol=ATOL)
            np.testing.assert_allclose(np.asarray(tc), np.asarray(uc),
                                       atol=ATOL)


class TestInt8Gates:
    def test_int8_agreement(self, setup):
        r"""int8-resident gate mode vs the XLA int8c branchless scan (the
        approximate serving mode's own oracle). Exact matching of the
        dynamic activation quantization is rounding-sensitive (bf16 sums
        reach the quantizer through different partial-sum orders; and the
        kernel computes its gate transcendentals as round_bf16(f(x_f32)) —
        required for on-chip Mosaic compilability and identical to XLA:TPU's
        f32-internal bf16 transcendentals, but ~1 bf16 ulp off XLA:CPU's,
        which is what this interpret-mode oracle runs on), so the tolerance
        is looser than f32 — but far tighter than the int8c mode's own
        deviation from f32 (docs/PERFORMANCE.md)."""
        from robustcap_tpu.nn.rnn import quantize_params
        model, params = setup
        qp = quantize_params(params)
        cfg8 = SigMPConfig(int8_compute=True)
        frames = _frames(jax.random.PRNGKey(11), MIXED,
                         first_tran=jnp.asarray([0.1, 0.2, 1.5]))
        sp = sig_mp.prepare_scan_params(qp, True)
        step = sig_mp.make_step(model, cfg8, include_first_frame_step=False,
                                output_contacts=True, cond_updater=False,
                                fuse_spec_heads=False)
        frame0 = jax.tree.map(lambda x: x[0], frames)
        carry0 = sig_mp.prescan_first_frame(sp, model,
                                            sig_mp.init_carry(sp), frame0,
                                            int8_compute=True)
        _, (pose_x, tran_x, _) = jax.lax.scan(partial(step, sp), carry0,
                                              frames)
        prepped = prepare_serve_params(qp, int8_gates=True)
        pose_s, tran_s, _, _ = serve_scan(prepped, model, cfg8, frames,
                                          carry0)
        np.testing.assert_allclose(np.asarray(pose_s), np.asarray(pose_x),
                                   atol=6e-2, rtol=0)
        np.testing.assert_allclose(np.asarray(tran_s), np.asarray(tran_x),
                                   atol=6e-2, rtol=0)
        # and it must stay close to the exact f32 trajectory (quality bound
        # of the int8c contract, tests/test_quantization.py)
        carry_f, (pose_f, tran_f, _) = _run_xla(params, model,
                                                SigMPConfig(), frames)
        assert float(jnp.abs(pose_s - pose_f).max()) < 0.2
