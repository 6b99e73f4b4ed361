r"""Reusable device-side ops: Procrustes, LBFGS."""

from .procrustes import similarity_transform, reconstruction_error  # noqa: F401

__all__ = ["similarity_transform", "reconstruction_error"]
