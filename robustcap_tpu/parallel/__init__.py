r"""Multi-device scaling: mesh construction, data-parallel steps."""

from .mesh import (make_mesh, replicate, shard_batch,  # noqa: F401
                   make_dp_train_step)

__all__ = ["make_mesh", "replicate", "shard_batch", "make_dp_train_step"]
