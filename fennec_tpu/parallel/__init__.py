"""Multi-chip parallelism: device meshes, sharded batch compression.

The reference's two concurrency mechanisms map onto JAX meshes:
  - CompressBatch worker pool (batch.go:58-128) → batch axis sharded over
    a Mesh('data') dimension: each chip scores its shard of the mega-batch,
    no cross-chip traffic on the search itself;
  - parallelDo row sharding (resize.go:200-239, ssim.go:84-160) → XLA's
    intra-chip parallelism, plus optional spatial sharding over a second
    mesh axis for very large images — XLA inserts the halo exchanges and
    psum reductions the Go code did by hand with WaitGroups.
"""

from .mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    make_mesh,
)
from .batched import (  # noqa: F401
    batched_quality_search,
    batched_quality_search_sharded,
    batched_ssim,
    quality_search_spatial_sharded,
)
