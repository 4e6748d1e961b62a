"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in sassy_ray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship ER pipeline (blocking -> Myers pair scoring ->
  transitive clustering) over the interleaved corpus derived from
  /root/testdata/sf0.001 — returns the clusters Dataset.
- ``queries()``: one entry per implemented operator/pipeline
  (see sassy_ray/pipelines/queries.py; SURVEY.md §2 inventory).
- ``oracle_sql()``: DuckDB twins where SQL-expressible; the rest get the
  driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from sassy_ray.pipelines.queries import er_clusters

    return er_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from sassy_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sassy_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
