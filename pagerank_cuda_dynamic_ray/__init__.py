"""Ray-Data-native link-graph analytics engine.

A from-scratch re-creation of the query/data-processing capabilities of
``puzzlef/pagerank-cuda-dynamic`` (reference at ``/root/reference``, cited
``file:line`` throughout) on Ray Data:

* transcript ingestion (Parquet) -> conv_id->conv_id edge derivation
  (reply / tool-mention edges with stable per-turn ordering),
* static + dynamic PageRank (Naive-Dynamic, Dynamic-Traversal,
  Dynamic-Frontier, Dynamic-Frontier-with-Pruning) over hash-partitioned
  CSR shards held in a fixed actor pool,
* connected components, label propagation, triangle counting,
* training-data pipeline operators over document/embedding tables
  (dedup exact/MinHash-LSH/SimHash, similarity search, text analysis,
  multimodal plumbing).

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by
the caller (tests' conftest, bench.py, or the verification driver).
"""

from .state import ray_join_patch as _ray_join_patch

# Fix Ray 2.49's hash-shuffle join schema-broadcast bug at the source so
# every Dataset.join in the engine streams (see state/ray_join_patch.py);
# stages.dedup._join_safe degrades to its materialize workaround if this
# returns False on a future Ray.
_ray_join_patch.apply()

from .options import PagerankOptions, PagerankResult  # noqa: F401
from .pipelines.graph import GraphContext  # noqa: F401

__version__ = "0.1.0"
