"""Multi-device execution: mesh setup and corpus-sharded search."""

from vsc2022_tpu.parallel.mesh import corpus_mesh, local_device_count  # noqa: F401
from vsc2022_tpu.parallel.sharded_search import (  # noqa: F401
    ShardedSimilaritySearcher,
)
