"""Multi-chip serving: mesh-sharded segments + collective top-k merge."""

from trinity_tpu.parallel.mesh import (
    MeshExecutor,
    MeshSourcesCollection,
    split_segment,
)

__all__ = ["MeshExecutor", "MeshSourcesCollection", "split_segment"]
