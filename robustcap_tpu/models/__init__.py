r"""Model families: the SigMP camera+IMU fusion network."""

from . import sig_mp  # noqa: F401

__all__ = ["sig_mp"]
