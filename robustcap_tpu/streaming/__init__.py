r"""Streaming runtime: native datapath, protocols, sync, live server."""

from .native import (RingBuffer, ImuResampler, encode_imu_packet,  # noqa: F401
                     parse_imu_packet, native_available)
from .protocol import (encode_detector_packet, parse_detector_packet,  # noqa: F401
                       encode_unity_frame, parse_unity_frame)
from .sync import (tpose_calibration, detect_jump_sync, detect_spikes,  # noqa: F401
                   CalibrationResult, ImuCamStream)
from .server import LiveServer, run_live_demo  # noqa: F401
from .latency import measure_streaming_latency  # noqa: F401
from .unity import MotionViewer  # noqa: F401
from .multiplex import StreamingMultiplexer  # noqa: F401
