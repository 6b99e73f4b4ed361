r"""RobustCap-TPU: a TPU-native (JAX/XLA/Pallas) real-time human motion capture
framework fusing monocular 2D keypoints and sparse IMU signals.

A from-scratch rebuild of the capabilities of shaohua-pan/RobustCap
(SIGGRAPH Asia 2023, arXiv 2309.00310), designed TPU-first:

* all rotation / kinematics math is pure JAX (``robustcap_tpu.math``),
* the SMPL parametric body model runs as jitted XLA einsums
  (``robustcap_tpu.smpl``),
* the six-LSTM fusion network is a single branchless scan step with
  persistent carry, batched with ``vmap`` and sharded with ``shard_map``
  (``robustcap_tpu.models.sig_mp``),
* SMPLify refinement is a jitted LBFGS optimizer (``robustcap_tpu.smplify``),
* offline evaluation replaces the reference's per-frame Python loop with
  time-major ``lax.scan`` over bucketed, data-parallel sequence batches
  (``robustcap_tpu.eval``).
"""

__version__ = "0.1.0"

from . import math  # noqa: F401

__all__ = ["math", "__version__"]
