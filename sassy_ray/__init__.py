"""sassy_ray — a Ray-Data-native approximate-matching + record-linkage engine.

A brand-new engine (not a port) with the query/data-processing capabilities of
the reference approximate-string-matching library (``/root/reference``, "sassy"):
edit-distance<=k search with local-minima match selection, reverse-complement
handling, overhang alignments and N-fraction filtering — re-expressed as Ray
Data pipelines (``ray.data.Dataset`` -> ``map_batches`` over Arrow batches,
actor pools for stateful scoring stages) plus the blocking / pair-scoring /
transitive-clustering stages of a web-scale entity-resolution pipeline.
"""

import os as _os

# Pin polars' rayon pool to the task's CPU allocation: Ray caps BLAS/OMP
# threads per worker (OMP_NUM_THREADS=1) and pyarrow follows it, but polars
# sizes its pool from the HARDWARE core count — inside a 32-CPU Ray session
# every blocking/minhash task would spawn 32 threads (32x oversubscription at
# full occupancy, and a silently-multithreaded "1-CPU" scaling leg).  Stage
# tasks here are num_cpus=1, so one polars thread per task is the correct
# sizing; must be set before the first polars import anywhere in the process.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")

from sassy_ray.kernel.alignments import Continuation
from sassy_ray.kernel.search import Match, Searcher, search_many

__all__ = ["Searcher", "Match", "search_many", "Continuation"]
__version__ = "0.1.0"
