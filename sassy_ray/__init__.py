"""sassy_ray — a Ray-Data-native approximate-matching + record-linkage engine.

A brand-new engine (not a port) with the query/data-processing capabilities of
the reference approximate-string-matching library (``/root/reference``, "sassy"):
edit-distance<=k search with local-minima match selection, reverse-complement
handling, overhang alignments and N-fraction filtering — re-expressed as Ray
Data pipelines (``ray.data.Dataset`` -> ``map_batches`` over Arrow batches,
actor pools for stateful scoring stages) plus the blocking / pair-scoring /
transitive-clustering stages of a web-scale entity-resolution pipeline.
"""

from sassy_ray.kernel.alignments import Continuation
from sassy_ray.kernel.search import Match, Searcher, search_many

__all__ = ["Searcher", "Match", "search_many", "Continuation"]
__version__ = "0.1.0"
