r"""Dataset preprocessing: sensor synthesis, fixtures, augmentation."""

from .synthesis import (  # noqa: F401
    syn_acc, synthesize_imu, sync_3d_mp, project_points, normalize_keypoints,
    random_camera, synthesize_confidence)
from .fixtures import build_fixture_dataset, smooth_random_motion  # noqa: F401
