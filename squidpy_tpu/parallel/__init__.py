from squidpy_tpu.parallel.mesh import cell_mesh, default_mesh
from squidpy_tpu.parallel.sharded import (
    sharded_moran_scores,
    sharded_pair_counts,
    sharded_permuted_pair_counts,
)

__all__ = [
    "cell_mesh",
    "default_mesh",
    "sharded_pair_counts",
    "sharded_moran_scores",
    "sharded_permuted_pair_counts",
]
