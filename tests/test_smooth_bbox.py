r"""Cross-implementation parity for the smooth-bbox / crop pipeline.

Loads the reference's actual ``scripts/smooth_bbox.py`` (the vendored
human_dynamics algorithm) and checks our rebuild byte-for-byte on shared
keypoint fixtures, including the crop-window math of
``run_3dpw_detector.py:33-53``.
"""

import importlib.util
import os

import numpy as np
import pytest

from robustcap_tpu.preprocess.smooth_bbox import (
    get_all_bbox_params, get_smooth_bbox_params, kp_to_bbox_param,
    pw3d_crop_windows, smooth_bbox_params)

REF = "/root/reference/scripts/smooth_bbox.py"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF):
        pytest.skip("reference checkout unavailable")
    spec = importlib.util.spec_from_file_location("ref_smooth_bbox", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _kps(T=60, J=18, seed=0, gaps=((10, 14), (40, 41)), lead=3, trail=2):
    r"""Jittery keypoint track with middle gaps and invalid head/tail."""
    rng = np.random.RandomState(seed)
    kp = np.zeros((T, J, 3), np.float32)
    cx = 960 + np.cumsum(rng.randn(T)) * 5
    cy = 540 + np.cumsum(rng.randn(T)) * 3
    for t in range(T):
        kp[t, :, 0] = cx[t] + rng.randn(J) * 80
        kp[t, :, 1] = cy[t] + rng.randn(J) * 150
        kp[t, :, 2] = rng.uniform(0.2, 1.0, J)
    for a, b in gaps:
        kp[a:b, :, 2] = 0.0
    kp[:lead, :, 2] = 0.0
    if trail:
        kp[-trail:, :, 2] = 0.0
    return kp


class TestParity:
    def test_kp_to_bbox_param(self, ref):
        kp = _kps(T=8, seed=1)
        for t in range(8):
            for thresh in (0.3, 2):
                ours = kp_to_bbox_param(kp[t], thresh)
                theirs = ref.kp_to_bbox_param(kp[t], thresh)
                if theirs is None:
                    assert ours is None
                else:
                    np.testing.assert_array_equal(ours, theirs)
        assert kp_to_bbox_param(None, 0.3) is None

    def test_degenerate_box_rejected(self, ref):
        kp = np.zeros((4, 3), np.float32)
        kp[:, :2] = 100.0  # all points coincide -> height < 0.5
        kp[:, 2] = 1.0
        assert kp_to_bbox_param(kp, 0.3) is None
        assert ref.kp_to_bbox_param(kp, 0.3) is None

    def test_get_all_bbox_params(self, ref):
        kp = _kps()
        ours, s0, e0 = get_all_bbox_params(list(kp), vis_thresh=0.3)
        theirs, s1, e1 = ref.get_all_bbox_params(list(kp), vis_thresh=0.3)
        assert (s0, e0) == (s1, e1)
        np.testing.assert_array_equal(ours, theirs)

    def test_smooth_bbox_params_borders(self, ref):
        r"""medfilt zero-padding + reflect Gaussian: borders must match."""
        rng = np.random.RandomState(3)
        params = rng.rand(50, 3).astype(np.float32) * 100
        np.testing.assert_array_equal(
            smooth_bbox_params(params, 11, 8),
            ref.smooth_bbox_params(params, 11, 8))

    @pytest.mark.parametrize("vis_thresh,sigma", [(0.3, 8), (0.1, 3)])
    def test_get_smooth_bbox_params(self, ref, vis_thresh, sigma):
        kp = _kps(seed=7)
        ours, s0, e0 = get_smooth_bbox_params(kp, vis_thresh=vis_thresh,
                                              sigma=sigma)
        theirs, s1, e1 = ref.get_smooth_bbox_params(kp, vis_thresh=vis_thresh,
                                                    sigma=sigma)
        assert (s0, e0) == (s1, e1)
        np.testing.assert_array_equal(ours, theirs)
        assert s0 == 3  # the invalid lead is trimmed to zeros
        assert (ours[:s0] == 0).all()

    def test_none_frames(self, ref):
        kps = [None, _kps(T=1, seed=2, gaps=(), lead=0, trail=0)[0]] * 6
        ours, s0, e0 = get_all_bbox_params(kps, vis_thresh=0.3)
        theirs, s1, e1 = ref.get_all_bbox_params(kps, vis_thresh=0.3)
        assert (s0, e0) == (s1, e1)
        np.testing.assert_array_equal(ours, theirs)


class TestCropWindows:
    r"""run_3dpw_detector.py:33-53 — the consumer of the smoothed track."""

    def _ref_windows(self, params, img_h, img_w, num_people):
        c_x = params[:, 0].astype(np.int32)
        c_y = params[:, 1].astype(np.int32)
        scale = params[:, 2]
        if num_people != 1 or img_h > img_w:
            w = h = 100.0 / scale
            h = h * 1.8
        else:
            w = h = 150.0 / scale
            w = h = h * 1.1
        w = w.astype(np.int32)
        h = h.astype(np.int32)
        return [(int(max(0, c_x[i] - w[i] // 2)),
                 int(max(0, c_y[i] - h[i] // 2)),
                 int(min(c_x[i] + w[i] // 2, img_w)),
                 int(min(c_y[i] + h[i] // 2, img_h)))
                for i in range(len(params))]

    @pytest.mark.parametrize("num_people,hw", [(1, (1080, 1920)),
                                               (2, (1080, 1920)),
                                               (1, (1920, 1080))])
    def test_windows_match(self, ref, num_people, hw):
        kp = _kps(seed=11, lead=0, trail=0, gaps=((20, 24),))
        params, _, _ = ref.get_smooth_bbox_params(kp, vis_thresh=0.3, sigma=8)
        ours = pw3d_crop_windows(params, hw[0], hw[1], num_people)
        theirs = self._ref_windows(params, hw[0], hw[1], num_people)
        assert ours == theirs

    def test_zero_prefix_rows_are_safe(self):
        params = np.zeros((4, 3))
        params[2:] = [[500, 400, 1.0], [510, 410, 1.1]]
        wins = pw3d_crop_windows(params, 1080, 1920, 1)
        assert len(wins) == 4  # inf/NaN-free on the zero prefix


class TestCroppedDetect:
    def test_detect_sequence_cropped_gates_and_maps(self):
        from robustcap_tpu.preprocess.detectors import \
            detect_sequence_cropped
        kp = _kps(T=20, seed=5, lead=2, trail=0, gaps=())
        frames = [np.zeros((1080, 1920, 3), np.uint8) for _ in range(20)]
        calls = []

        def detector(crop):
            calls.append(crop.shape)
            out = np.full((33, 3), 0.5, np.float32)
            return out

        out = detect_sequence_cropped(frames, kp, detector)
        assert out.shape == (20, 33, 3)
        # low-confidence lead frames gated without calling the detector
        assert (out[:2] == 0).all() and len(calls) == 18
        # mapped-back fractions stay in [0, 1]
        assert (out[2:, :, :2] >= 0).all() and (out[2:, :, :2] <= 1).all()
