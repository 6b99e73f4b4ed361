r"""Parametric body models (SMPL/MANO/SMPLH) as jitted XLA graphs."""

from .armature import SMPLJoint, MANOJoint, SMPLHJoint  # noqa: F401
from .model import (ParametricModel, SmplData, load_smpl_data,  # noqa: F401
                    synthetic_smpl_data, default_body_model)

__all__ = ["SMPLJoint", "MANOJoint", "SMPLHJoint", "ParametricModel",
           "SmplData", "load_smpl_data", "synthetic_smpl_data",
           "default_body_model"]
