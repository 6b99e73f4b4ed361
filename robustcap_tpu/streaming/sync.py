r"""IMU <-> camera synchronization + T-pose calibration.

Rebuild of the reference's ``SyncIMUCam`` (live_demo_sync.py:17-268) split
into *pure, testable math* (this module) and threaded IO adapters
(``server.py``). The reference interleaves both in one daemon-thread class.

Pieces:
* ``tpose_calibration`` — computes the frame alignment rotations from 2 s of
  quiet standing: R_MI (inertial -> mocap frame from a flat-placed sensor),
  R_SB (per-sensor sensor -> bone offset), R_CI and R_CM (camera frame
  chain) (live_demo_sync.py:63-108),
* ``detect_jump_sync`` — time offset between the IMU and camera clocks from
  a physical jump: acceleration-norm spikes vs image-sharpness dips
  (live_demo_sync.py:110-205),
* ``ImuCamStream`` — the runtime combiner: native resampler ticks + the
  calibration chain R_CB = R_CI R_IS R_SB, accelerations rotated to camera
  (live_demo_sync.py:207-244).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .. import math as M
from .native import ImuResampler

__all__ = ["tpose_calibration", "detect_spikes", "detect_jump_sync",
           "CalibrationResult", "ImuCamStream"]


def _quat_mean_np(qs: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp
    return np.asarray(M.quaternion_mean(jnp.asarray(
        np.asarray(qs, np.float32))))


def _q2R(q: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp
    return np.asarray(M.quaternion_to_rotation_matrix(
        jnp.asarray(np.asarray(q, np.float32).reshape(-1, 4))))


@dataclass
class CalibrationResult:
    R_MI: np.ndarray      # inertial -> mocap (world) frame, [3, 3]
    R_SB: np.ndarray      # per-sensor sensor -> bone, [n, 3, 3]
    R_CI: np.ndarray      # inertial -> camera frame, [3, 3]
    R_CM: np.ndarray      # mocap -> camera frame, [3, 3]

    def save(self, path: str):
        r"""Persist the calibration (the reference caches RMI.pt/RCI.pt in
        data/temp, live_demo_sync.py:75,87)."""
        np.savez(path, R_MI=self.R_MI, R_SB=self.R_SB, R_CI=self.R_CI,
                 R_CM=self.R_CM)

    @staticmethod
    def load(path: str) -> "CalibrationResult":
        d = np.load(path)
        return CalibrationResult(R_MI=d["R_MI"], R_SB=d["R_SB"],
                                 R_CI=d["R_CI"], R_CM=d["R_CM"])


def tpose_calibration(flat_sensor_quats: np.ndarray,
                      tpose_quats: np.ndarray,
                      camera_up_in_cam: Optional[np.ndarray] = None
                      ) -> CalibrationResult:
    r"""Two-step calibration (live_demo_sync.py:63-108).

    flat_sensor_quats [K, 4]: the reference sensor lying flat (x forward,
    y left, z up) for ~2 s — its mean orientation defines the inertial ->
    mocap alignment R_MI = (R_IS0 R_offset)^T with the axis shuffle that maps
    the flat pose to identity. tpose_quats [n, K, 4]: all sensors during a
    T-pose — R_SB[i] = (R_MI R_IS_i)^T since bone frames are identity in
    T-pose. The camera chain uses gravity: with the camera level, the mocap
    'up' maps to -y of the camera; ``camera_up_in_cam`` overrides that
    default (e.g. from an IMU-derived gravity estimate).
    """
    q0 = _quat_mean_np(np.asarray(flat_sensor_quats))
    R_IS0 = _q2R(q0)[0]
    # flat placement: sensor axes (x fwd, y left, z up) == desired mocap
    # axes, so R_MI undoes the measured orientation
    R_MI = R_IS0.T

    n = tpose_quats.shape[0]
    R_SB = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        qi = _quat_mean_np(np.asarray(tpose_quats[i]))
        R_IS = _q2R(qi)[0]
        R_SB[i] = (R_MI @ R_IS).T

    up_c = (np.asarray([0.0, -1.0, 0.0], np.float32)
            if camera_up_in_cam is None
            else np.asarray(camera_up_in_cam, np.float32))
    up_c = up_c / np.linalg.norm(up_c)
    # build R_CM: mocap z (up) -> up_c; keep mocap x as close to camera x.
    # When gravity is (near-)parallel to camera x (portrait mount), fall
    # back to camera y as the guess axis — otherwise the cross product
    # degenerates to ~0 and the whole calibration silently turns NaN.
    z_c = up_c
    x_guess = np.asarray([1.0, 0, 0], np.float32)
    if abs(float(np.dot(z_c, x_guess))) > 0.99:
        x_guess = np.asarray([0.0, 1.0, 0], np.float32)
    y_c = np.cross(z_c, x_guess)
    y_c /= np.linalg.norm(y_c)
    x_c = np.cross(y_c, z_c)
    R_CM = np.stack([x_c, y_c, z_c], axis=1).astype(np.float32)
    R_CI = (R_CM @ R_MI).astype(np.float32)
    return CalibrationResult(R_MI=R_MI.astype(np.float32), R_SB=R_SB,
                             R_CI=R_CI, R_CM=R_CM)


def detect_spikes(signal: np.ndarray, threshold: float,
                  min_separation: int = 5) -> List[int]:
    r"""Indices of local maxima above ``threshold``, at least
    ``min_separation`` samples apart (the jump detector's peak picking,
    live_demo_sync.py:143-154)."""
    idx = []
    last = -min_separation
    for i in range(1, len(signal) - 1):
        if (signal[i] > threshold and signal[i] >= signal[i - 1]
                and signal[i] >= signal[i + 1] and i - last >= min_separation):
            idx.append(i)
            last = i
    return idx


def detect_jump_sync(imu_acc_norm: np.ndarray, imu_times: np.ndarray,
                     cam_sharpness: np.ndarray, cam_times: np.ndarray,
                     acc_threshold: float = 9.0,
                     require_two: bool = True) -> Optional[float]:
    r"""Clock offset (imu_time - cam_time) from jump events
    (live_demo_sync.py:110-205): landing spikes in ||acc|| paired with
    motion-blur dips (sharpness minima) in the camera. Returns None unless
    the offsets from (two) jumps agree within 50 ms."""
    imu_peaks = detect_spikes(imu_acc_norm, acc_threshold)
    blur = -np.asarray(cam_sharpness)
    cam_peaks = detect_spikes(blur - blur.mean(), blur.std())
    if not imu_peaks or not cam_peaks:
        return None
    n = min(len(imu_peaks), len(cam_peaks))
    if require_two and n < 2:
        return None
    offsets = [imu_times[imu_peaks[k]] - cam_times[cam_peaks[k]]
               for k in range(n)]
    if require_two and abs(offsets[0] - offsets[1]) > 0.05:
        return None
    return float(np.mean(offsets[:2] if require_two else offsets))


class ImuCamStream:
    r"""Runtime combiner: resampled IMU ticks -> camera-frame
    (R_CB [n, 3, 3], acc_C [n, 3]) via the calibration chain
    R_CB = R_CI R_IS R_SB and acc_C = R_CI a_I (live_demo_sync.py:223-231)."""

    def __init__(self, calib: CalibrationResult, n_imu: int = 6,
                 fps: float = 60.0):
        self.calib = calib
        self.resampler = ImuResampler(n_imu, fps)
        self.n_imu = n_imu

    def push(self, imu: int, t: float, quat_wxyz, acc):
        self.resampler.push(imu, t, quat_wxyz, acc)

    def tick(self):
        out = self.resampler.tick()
        if out is None:
            return None
        t, quats, accs = out
        R_IS = _q2R(quats).reshape(self.n_imu, 3, 3)
        R_CB = np.einsum("ij,njk,nkl->nil", self.calib.R_CI, R_IS,
                         self.calib.R_SB)
        acc_C = np.einsum("ij,nj->ni", self.calib.R_CI, accs)
        return t, R_CB.astype(np.float32), acc_C.astype(np.float32)
