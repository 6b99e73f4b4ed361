r"""Live sensor drivers: Xsens DOT BLE stack, MVNX reader, IMU bridge."""

from .xsens import (XsensDotSet, parse_complete_quaternion,  # noqa: F401
                    encode_complete_quaternion, CompleteQuaternionPayload)
from .mvnx import read_mvnx  # noqa: F401
from .bridge import run_imu_bridge, SyntheticImuSource  # noqa: F401
from .calibration import (calibrate_intrinsics_zhang,  # noqa: F401
                          calibrate_camera_chessboard)
from .noitom import MocapApi, NoitomFrame  # noqa: F401
