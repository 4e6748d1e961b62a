"""Driver-contract query catalog: Ray Data pipelines + DuckDB oracle SQL.

Each entry implements one operator family from SURVEY.md §2 as an idiomatic
Ray Data pipeline over the driver's parquet tables, with (where expressible)
an ANSI-SQL twin for the correctness gate.  Column names match the SQL
exactly; float aggregates are rounded identically on both sides.

Ray is initialised by the driver — nothing here calls ray.init().
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["QUERIES", "ORACLE_SQL"]


def _rd():
    import ray.data as rd

    return rd


def _path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _round_col(t: pa.Table, col: str, nd: int) -> pa.Table:
    i = t.column_names.index(col)
    return t.set_column(i, col, pc.round(t.column(col), ndigits=nd))


def _dim_lookup(values, keys: pa.Array, outs: pa.Array, default=None) -> pa.Array:
    """Vectorized broadcast-dim lookup: ``pc.index_in`` against the dim key
    array + ``take`` of the dim value array (no per-row Python)."""
    taken = pc.take(outs, pc.index_in(values, value_set=keys))
    if default is not None:
        taken = pc.fill_null(taken, default)
    return taken


# Join-side size threshold for broadcast vs partitioned execution: a side
# whose parquet row groups decode under this many bytes ships once via
# ray.put and joins as a per-batch lookup (no shuffle at all); bigger sides
# go through the partitioned ``Dataset.join`` shuffle.  At 100 TB the fact
# tables always exceed this, so the shuffle path is the one that scales —
# the broadcast path is the optimizer's choice whenever a side genuinely
# fits in a worker's heap.
def _broadcast_join_limit() -> int:
    return int(os.environ.get("SASSY_BROADCAST_JOIN_LIMIT", 256 << 20))


def _parquet_bytes(path: str) -> int:
    """Decoded size estimate from the parquet FOOTER only (no data read)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    return sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))


def _partial_sum_count(tt: pa.Table, keys: list[str], sum_cols: list[str], count_col: str) -> pa.Table:
    """Per-batch partial aggregation (combiner) BEFORE the groupby shuffle:
    only (distinct keys x blocks) rows leave the map task, so the wide
    groupby moves kilobytes instead of the whole fact table.  The caller's
    final Ray groupby sums the partial sums and partial counts."""
    g = tt.group_by(keys).aggregate([(c, "sum") for c in sum_cols] + [(keys[0], "count")])
    # select by the GENERATED names ("col_sum", "key_count") — the column
    # ordering of TableGroupBy.aggregate output is pyarrow-version-dependent
    # (keys-first in 16.x, aggregates-first earlier), so positional renames
    # would silently mislabel on a pyarrow bump
    cols = {k: g.column(k) for k in keys}
    for c in sum_cols:
        cols[c] = g.column(f"{c}_sum")
    cols[count_col] = g.column(f"{keys[0]}_count")
    return pa.table(cols)


# --- oracle artifact exports ------------------------------------------------
# Some operators (LSH candidate generation, approximate search) are not
# SQL-expressible end-to-end, but their EXPENSIVE stages are independently
# checkable: the query exports a small intermediate (candidate pair list /
# pure-DP oracle matches) as parquet, and the oracle SQL reads it back with
# read_parquet() and recomputes the downstream logic (Jaccard, Hamming,
# connected components, aggregation) from the raw tables.  The export is an
# INPUT to the check, never the checked value itself — the compared numbers
# are computed twice, by Ray/NumPy here and by DuckDB SQL there.

_ORACLE_EXPORT_DIR = "/tmp/sassy_oracle"


def _oracle_export(name: str, tbl: pa.Table) -> None:
    import pyarrow.parquet as pq

    os.makedirs(_ORACLE_EXPORT_DIR, exist_ok=True)
    pq.write_table(tbl, os.path.join(_ORACLE_EXPORT_DIR, f"{name}.parquet"))


def _collect(ds_or_tbl) -> pa.Table:
    if isinstance(ds_or_tbl, pa.Table):
        return ds_or_tbl
    return pa.concat_tables(
        ds_or_tbl.iter_batches(batch_size=65536, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# relational core (SURVEY.md §2.2, §2.4-2.6 -> Ray Data primitives)
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan -> computed cols -> per-batch partial
    aggregation (combiner) -> tiny groupby of the partials.  Exercises
    read-prune, vectorized map_batches, and the partial+final aggregation
    pattern (the reference's thread-local cost histograms merged at the end,
    grep.rs:309-328,575-579) — only (groups x blocks) rows shuffle."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        _path(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    cutoff = datetime(1998, 9, 2)

    def cents(x):
        return pc.cast(pc.round(pc.multiply(x, pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64())

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(cutoff)))
        disc_price = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), t.column("l_tax")))
        tt = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty_centi": cents(t.column("l_quantity")),
                "sum_base_price_cents": cents(t.column("l_extendedprice")),
                "sum_disc_price_cents": cents(disc_price),
                "sum_charge_cents": cents(charge),
            }
        )
        return _partial_sum_count(
            tt,
            ["l_returnflag", "l_linestatus"],
            ["sum_qty_centi", "sum_base_price_cents", "sum_disc_price_cents", "sum_charge_cents"],
            "count_order",
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_centi", alias_name="sum_qty_centi"),
            Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
            Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
            Sum("sum_charge_cents", alias_name="sum_charge_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)                                       AS sum_qty_centi,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)                                  AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)               AS sum_disc_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
       count(*)                                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def filter_project(sf_dir: str):
    """Vectorized filter + projection (M8/S6 family)."""
    ds = _rd().read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity", "l_extendedprice"]
    )
    return ds.map_batches(
        lambda t: t.filter(pc.greater(t.column("l_quantity"), pa.scalar(45.0))),
        batch_format="pyarrow",
    ).select_columns(["l_orderkey", "l_quantity"])


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45
"""


def broadcast_join(sf_dir: str):
    """Broadcast hash join: small dim side shipped once, looked up per batch
    inside map_batches (the reference's pattern-broadcast J1 shape,
    search.rs:1520-1550)."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(
        _path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).combine_chunks()
    dim_ref = ray.put(cust)  # broadcast once; workers read zero-copy from plasma
    orders = _rd().read_parquet(_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def add_seg(t: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        segs = _dim_lookup(
            t.column("o_custkey"),
            dim.column("c_custkey").combine_chunks(),
            dim.column("c_mktsegment").combine_chunks(),
            default="",
        )
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"), pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"c_mktsegment": segs, "price_cents": cents})

    from ray.data.aggregate import Count, Sum

    out = (
        orders.map_batches(add_seg, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("price_cents", alias_name="total_price_cents"), Count(alias_name="n_orders"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


BROADCAST_JOIN_SQL = """
SELECT c.c_mktsegment AS c_mktsegment,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price_cents,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def hash_join(sf_dir: str):
    """Hash join of lineitem x orders -> revenue by order priority, with the
    size-adaptive physical plan a real optimizer picks: when the build side's
    parquet footer says it decodes under the broadcast limit it ships
    ONCE via ray.put and the join is a per-batch ``pc.index_in`` lookup (no
    shuffle; valid because o_orderkey is unique on the build side), followed
    by a per-batch partial aggregation so only (groups x blocks) rows move.
    Above the limit both sides go through the partitioned ``Dataset.join``
    shuffle — the path that scales to two 100 TB fact tables."""
    import ray
    from ray.data.aggregate import Sum

    li = _rd().read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def rev_cents(t: pa.Table) -> pa.Array:
        r = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
        )
        return pc.cast(pc.round(pc.multiply(r, pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64())

    if _parquet_bytes(_path(sf_dir, "orders")) <= _broadcast_join_limit():
        import pyarrow.parquet as pq

        dim = pq.read_table(
            _path(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
        ).combine_chunks()
        dim_ref = ray.put(dim)

        def join_agg(t: pa.Table) -> pa.Table:
            d = ray.get(dim_ref)
            idx = pc.index_in(t.column("l_orderkey"), value_set=d.column("o_orderkey").combine_chunks())
            tt = pa.table(
                {
                    "o_orderpriority": pc.take(d.column("o_orderpriority").combine_chunks(), idx),
                    "revenue_cents": rev_cents(t),
                }
            ).filter(pc.is_valid(idx))  # inner-join semantics: drop misses
            return _partial_sum_count(tt, ["o_orderpriority"], ["revenue_cents"], "n")

        out = (
            li.map_batches(join_agg, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"), Sum("n", alias_name="n"))
        )
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)

    li = li.map_batches(
        lambda t: pa.table({"l_orderkey": t.column("l_orderkey"), "revenue_cents": rev_cents(t)}),
        batch_format="pyarrow",
    )
    orders = _rd().read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    orders = orders.map_batches(
        lambda t: pa.table(
            {"l_orderkey": t.column("o_orderkey"), "o_orderpriority": t.column("o_orderpriority")}
        ),
        batch_format="pyarrow",
    )
    nparts = max(2, min(16, int(ray.cluster_resources().get("CPU", 8))))
    joined = li.join(orders, join_type="inner", num_partitions=nparts, on=("l_orderkey",))
    from ray.data.aggregate import Count

    out = joined.groupby("o_orderpriority").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"), Count(alias_name="n")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


HASH_JOIN_SQL = """
SELECT o.o_orderpriority AS o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def sort_topk(sf_dir: str):
    """Global sort + limit (O1-O4): top-10 orders by price."""
    ds = _rd().read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    )
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


SORT_TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def distinct_pairs(sf_dir: str):
    """Distinct over two columns (§2.7)."""
    ds = _rd().read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_returnflag", "l_linestatus"]
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).count()
    return pa.Table.from_pandas(
        out.to_pandas()[["l_returnflag", "l_linestatus"]], preserve_index=False
    )


DISTINCT_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


def events_window(sf_dir: str):
    """Tumbling 1-hour window per event_type (streaming-shaped groupby)."""
    ds = _rd().read_parquet(_path(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        w = pc.cast(pc.floor_temporal(t.column("ts"), unit="hour"), pa.timestamp("us"))
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64())
        tt = pa.table(
            {"window_start": w, "event_type": t.column("event_type"), "sum_value_cents": cents}
        )
        return _partial_sum_count(
            tt, ["window_start", "event_type"], ["sum_value_cents"], "n_events"
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("sum_value_cents", alias_name="sum_value_cents"), Sum("n_events", alias_name="n_events"))
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


EVENTS_WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents, count(*) AS n_events
FROM events GROUP BY 1, 2
"""


def value_histogram(sf_dir: str):
    """The reference's cost histogram (A1, grep.rs:309-328) transplanted:
    integer-bucket histogram of event values via groupby count."""
    ds = _rd().read_parquet(_path(sf_dir, "events"), columns=["value"])

    def bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(t.column("value")), pa.int64())
        return pa.table({"bucket": b})

    out = ds.map_batches(bucket, batch_format="pyarrow").groupby("bucket").count()
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.rename_columns(["bucket", "n"])


VALUE_HISTOGRAM_SQL = """
SELECT CAST(floor(value) AS BIGINT) AS bucket, count(*) AS n
FROM events GROUP BY 1
"""

# ---------------------------------------------------------------------------
# sassy-parity search operators over the documents table (SURVEY.md §2.2)
# ---------------------------------------------------------------------------

SEARCH_PATTERN = "spark"


def search_exact_count(sf_dir: str):
    """k=0 substring search per doc (M1 with k=0): count of occurrences.
    SQL-checkable via replace-length arithmetic."""
    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    pat = SEARCH_PATTERN

    def count(t: pa.Table) -> pa.Table:
        n = pc.count_substring(t.column("text"), pat)
        return pa.table({"doc_id": t.column("doc_id"), "n_matches": pc.cast(n, pa.int64())})

    out = ds.map_batches(count, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_matches"), 0)), batch_format="pyarrow"
    )


SEARCH_EXACT_COUNT_SQL = f"""
SELECT doc_id,
       CAST((length(text) - length(replace(text, '{SEARCH_PATTERN}', ''))) / length('{SEARCH_PATTERN}') AS BIGINT) AS n_matches
FROM documents
WHERE length(text) - length(replace(text, '{SEARCH_PATTERN}', '')) > 0
"""


_SEARCHER_CACHE: dict = {}


class _SearchActor:
    """Stateful scorer stage (ST1/ST2): Searcher resolved once per actor OR —
    when used as a plain ``map_batches`` function via ``_search_batch`` —
    once per warm Ray worker process (module-level cache, no actor spin-up;
    the Searcher here is cheap profile state, so the warm-task form wins)."""

    def __init__(self, patterns: list[bytes], k: int, alphabet: str = "ascii_ci"):
        s = _SEARCHER_CACHE.get(alphabet)
        if s is None:
            from sassy_ray.kernel.search import Searcher

            s = Searcher(alphabet, rc=False, case_sensitive=False)
            _SEARCHER_CACHE[alphabet] = s
        self.searcher = s
        self.patterns = patterns
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        # texts feed the kernel zero-copy (Arrow buffers -> TextRows, no
        # to_pylist) and matches come back as field arrays — no per-Match
        # attribute-hop emission loop
        arr = self.searcher.search_many_arrays(
            self.patterns, t.column("text").combine_chunks(), self.k
        )
        return pa.table(
            {
                "doc_id": pc.take(
                    t.column("doc_id").combine_chunks(), pa.array(arr["text_idx"])
                ),
                "pattern_idx": pa.array(arr["pattern_idx"]),
                "text_start": pa.array(arr["text_start"]),
                "text_end": pa.array(arr["text_end"]),
                "cost": pa.array(arr["cost"], pa.int32()),
                "cigar": pa.array(arr["cigar"], pa.string()),
            }
        )


def search_approx(sf_dir: str):
    """Approximate search (M1): local-minima matches of 'spark' at k=1 over
    all documents, via an actor-pool map_batches (no SQL equivalent —
    rows-only check).  Memoized per (sf_dir, Ray session): the driver's
    correctness pass consumes this both directly and via
    match_cost_histogram, and the matches are small — one materialized run
    serves both."""
    key = ("search_approx", os.path.abspath(sf_dir), _session_token())
    hit = _GATE_CACHE.get(key)
    if hit is not None:
        return hit
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    pats = [SEARCH_PATTERN.encode()]

    def search_batch(t: pa.Table) -> pa.Table:
        return _SearchActor(patterns=pats, k=1)(t)

    # warm-task form: runs in Ray's pre-started workers (Searcher cached per
    # worker process) — measured faster than spinning an actor pool for this
    # cheap-state stage; repartition so the single-file read parallelizes
    out = ds.repartition(max(2, cpus)).map_batches(
        search_batch, batch_format="pyarrow", batch_size=128
    )
    _export_search_approx_oracle(sf_dir)
    out = out.sort(["doc_id", "text_start", "cost"]).materialize()
    _GATE_CACHE[key] = out
    return out


def filter_matching_docs(sf_dir: str):
    """S6 semantics: emit the doc rows that contain the pattern (k=0),
    preserving all columns — a semi-join on match existence."""
    ds = _rd().read_parquet(_path(sf_dir, "documents"))
    pat = SEARCH_PATTERN
    return ds.map_batches(
        lambda t: t.filter(pc.greater(pc.count_substring(t.column("text"), pat), 0)),
        batch_format="pyarrow",
    )


FILTER_MATCHING_DOCS_SQL = f"""
SELECT * FROM documents WHERE contains(text, '{SEARCH_PATTERN}')
"""


def filter_nonmatching_docs(sf_dir: str):
    """S6 --invert: docs NOT containing the pattern."""
    ds = _rd().read_parquet(_path(sf_dir, "documents"))
    pat = SEARCH_PATTERN
    return ds.map_batches(
        lambda t: t.filter(pc.equal(pc.count_substring(t.column("text"), pat), 0)),
        batch_format="pyarrow",
    )


FILTER_NONMATCHING_DOCS_SQL = f"""
SELECT * FROM documents WHERE NOT contains(text, '{SEARCH_PATTERN}')
"""


# DP-oracle exports run on the driver at correctness-gate scale only (the
# documents table at sf0.01 is 500 rows; the synthesized DNA corpus ~600).
# Bench runs at sf0.1+ skip them so the measured query time stays the
# pipeline's, not the oracle harness's.
_ORACLE_EXPORT_MAX_DOCS = 1500


def _export_search_approx_oracle(sf_dir: str) -> None:
    """Pure-DP (OracleSearcher) matches of the search_approx config over the
    documents table — the independent implementation the kernel pipeline is
    compared against."""
    import pyarrow.parquet as pq

    if pq.read_metadata(_path(sf_dir, "documents")).num_rows > _ORACLE_EXPORT_MAX_DOCS:
        return
    from sassy_ray.kernel.oracle import OracleSearcher

    tbl = pq.read_table(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    osr = OracleSearcher("ascii_ci", rc=False)
    pat = SEARCH_PATTERN.encode()
    rows: dict[str, list] = {k: [] for k in ("doc_id", "pattern_idx", "text_start", "text_end", "cost", "cigar")}
    for did, text in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        for m in osr.search(pat, (text or "").encode(), 1):
            rows["doc_id"].append(did)
            rows["pattern_idx"].append(0)
            rows["text_start"].append(m.text_start)
            rows["text_end"].append(m.text_end)
            rows["cost"].append(m.cost)
            rows["cigar"].append(m.cigar)
    _oracle_export(
        "search_approx_matches",
        pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "pattern_idx": pa.array(rows["pattern_idx"], pa.int64()),
                "text_start": pa.array(rows["text_start"], pa.int64()),
                "text_end": pa.array(rows["text_end"], pa.int64()),
                "cost": pa.array(rows["cost"], pa.int32()),
                "cigar": pa.array(rows["cigar"], pa.string()),
            }
        ),
    )


SEARCH_APPROX_SQL = f"""
SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/search_approx_matches.parquet')
"""

MATCH_COST_HISTOGRAM_SQL = f"""
SELECT cost, count(*) AS n
FROM read_parquet('{_ORACLE_EXPORT_DIR}/search_approx_matches.parquet')
GROUP BY cost
"""


def match_cost_histogram(sf_dir: str):
    """A1 cost histogram over approx matches (kernel side), vs the DP-oracle
    matches aggregated in SQL."""
    matches = search_approx(sf_dir)
    out = matches.groupby("cost").count()
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).rename_columns(
        ["cost", "n"]
    )


# ---------------------------------------------------------------------------
# dedup family (training-data ops) over documents
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition on a 128-bit CONTENT HASH (two independent
    vectorized 64-bit hashes), keep min doc_id per distinct content — the
    raw text column is never used as a shuffle key.  Input is documents
    unioned with itself so the dedup is exercised.  Arrow-native throughout:
    polars' vectorized xxhash over the zero-copy Arrow buffer, int64 views
    (uint64 keys >= 2^63 degrade Ray blocks — see CLAUDE.md), and an Arrow
    cast+binary_join for the fused 128-bit group key."""
    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    doubled = ds.union(_rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"]))
    from ray.data.aggregate import Min

    def content_key(t: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(t.column("text"))
        h1 = s.hash(seed=0x0123456789ABCDEF).to_numpy().view(np.int64)
        h2 = s.hash(seed=0x1EDCBA9876543210).to_numpy().view(np.int64)
        key = pc.binary_join_element_wise(
            pc.cast(pa.array(h1), pa.string()), pc.cast(pa.array(h2), pa.string()), "_"
        )
        return pa.table({"content_key": key, "doc_id": t.column("doc_id")})

    out = (
        doubled.map_batches(content_key, batch_format="pyarrow")
        .groupby("content_key")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    return out.select_columns(["doc_id"])


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id
FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
GROUP BY text
"""


def doc_fingerprint(sf_dir: str):
    """Content fingerprinting: md5 of text per doc (SQL twin: md5())."""
    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        import hashlib

        h = [hashlib.md5(x.encode()).hexdigest() for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "fingerprint": pa.array(h)})

    return ds.map_batches(fp, batch_format="pyarrow")


DOC_FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS fingerprint FROM documents
"""


def dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup clusters (distributed: shingle -> minhash ->
    band groupby -> salted pairs -> exact-Jaccard verify -> components).
    Candidate pairs are exported so the SQL oracle recomputes the verify +
    clustering stages (exact q-gram Jaccard + transitive closure) in DuckDB."""
    from sassy_ray.functions.dedup import minhash_neardup

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    res = minhash_neardup(ds, q=12, tau=0.5)
    _oracle_export("dedup_minhash_pairs", _collect(res["pairs"]))
    return res["clusters_fn"]().sort("doc_id")


# verify + clustering recomputed from scratch in SQL: q-gram shingle sets
# from the raw documents table, integer-exact Jaccard threshold (tau=0.5 <=>
# 2*inter >= union), transitive closure by recursive reachability, cluster
# id = min doc_id in component (matching stages/clustering.py semantics).
DEDUP_MINHASH_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT CAST(doc_id_a AS VARCHAR) AS a, CAST(doc_id_b AS VARCHAR) AS b
  FROM read_parquet('{_ORACLE_EXPORT_DIR}/dedup_minhash_pairs.parquet')
),
d AS (SELECT CAST(doc_id AS VARCHAR) AS id, text FROM documents),
sh AS (
  SELECT id, list_distinct(
    CASE WHEN length(text) < 12 THEN [text]
         ELSE list_transform(range(length(text) - 11), i -> substr(text, i+1, 12)) END
  ) AS s FROM d
),
j AS (
  SELECT p.a, p.b,
         len(list_intersect(sa.s, sb.s)) AS inter,
         len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS uni
  FROM pairs p JOIN sh sa ON sa.id = p.a JOIN sh sb ON sb.id = p.b
),
edges AS (SELECT a, b FROM j WHERE inter * 1000000 >= 500000 * uni),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM d
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
"""


def ngram_jaccard(sf_dir: str):
    """n-gram Jaccard similarity for LSH candidate pairs (verify stage
    exposed standalone).  jac_e6 = inter*1e6 // union is integer-exact, so
    the SQL twin reproduces it bit-for-bit from the exported pair list."""
    from sassy_ray.functions.dedup import minhash_neardup

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    res = minhash_neardup(ds, q=12, tau=0.5)
    _oracle_export("ngram_jaccard_pairs", _collect(res["pairs"]))
    return res["verified"].sort(["doc_id_a", "doc_id_b"])


NGRAM_JACCARD_SQL = f"""
WITH pairs AS (
  SELECT CAST(doc_id_a AS VARCHAR) AS a, CAST(doc_id_b AS VARCHAR) AS b
  FROM read_parquet('{_ORACLE_EXPORT_DIR}/ngram_jaccard_pairs.parquet')
),
d AS (SELECT CAST(doc_id AS VARCHAR) AS id, text FROM documents),
sh AS (
  SELECT id, list_distinct(
    CASE WHEN length(text) < 12 THEN [text]
         ELSE list_transform(range(length(text) - 11), i -> substr(text, i+1, 12)) END
  ) AS s FROM d
),
j AS (
  SELECT p.a AS doc_id_a, p.b AS doc_id_b,
         len(list_intersect(sa.s, sb.s)) AS inter,
         len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS uni
  FROM pairs p JOIN sh sa ON sa.id = p.a JOIN sh sb ON sb.id = p.b
)
SELECT doc_id_a, doc_id_b,
       inter * 1000000 // greatest(uni, 1) AS jac_e6,
       inter * 1000000 >= 500000 * uni AS is_match
FROM j
"""


def dedup_simhash(sf_dir: str):
    """SimHash near-dup clusters (distributed band buckets + Hamming<=3
    verify -> components).  Token hashes are md5 prefixes, so the SQL
    oracle recomputes the 64-bit simhash, the Hamming distances AND the
    transitive clusters from the raw text + exported candidate pairs."""
    from sassy_ray.functions.dedup import simhash_neardup

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    res = simhash_neardup(ds, max_hamming=3)
    _oracle_export("dedup_simhash_pairs", _collect(res["pairs"]))
    return res["clusters_fn"]().sort("doc_id")


# simhash recomputed from scratch: token hash = first 16 md5 hex chars as
# uint64 (mirrors functions/dedup._token_hash64), bit b of the simhash set
# iff 2*count(bit set) > n_tokens, Hamming via bit_count(xor), components
# via recursive closure over the exported candidate pairs.
_SIMHASH_SQL_CTE = """
toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
),
tokh AS (
  SELECT id, CAST(list_sum(list_transform(range(16), i ->
      (strpos('0123456789abcdef', substr(md5(tok), i+1, 1)) - 1)::HUGEINT * (1::HUGEINT << ((15-i)*4))
  )) AS UBIGINT) AS th
  FROM toks WHERE tok <> ''
),
bits AS (
  SELECT id, b.b, sum(CAST((th >> b.b) & 1 AS BIGINT)) AS ones, count(*) AS ntok
  FROM tokh, (SELECT range AS b FROM range(64)) b
  GROUP BY id, b.b
),
sh AS (
  SELECT id, CAST(sum(CASE WHEN ones * 2 > ntok THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS UBIGINT) AS simhash
  FROM bits GROUP BY id
)
"""

DEDUP_SIMHASH_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT CAST(doc_id_a AS VARCHAR) AS a, CAST(doc_id_b AS VARCHAR) AS b
  FROM read_parquet('{_ORACLE_EXPORT_DIR}/dedup_simhash_pairs.parquet')
),
{_SIMHASH_SQL_CTE},
d AS (SELECT CAST(doc_id AS VARCHAR) AS id FROM documents),
ham AS (
  SELECT p.a, p.b, bit_count(xor(coalesce(ha.simhash, 0), coalesce(hb.simhash, 0))) AS hd
  FROM pairs p
  LEFT JOIN sh ha ON ha.id = p.a
  LEFT JOIN sh hb ON hb.id = p.b
),
edges AS (SELECT a, b FROM ham WHERE hd <= 3),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM d
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
"""


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def _e6_half_away(sims: np.ndarray) -> np.ndarray:
    """round(x*1e6) with half-AWAY-from-zero ties — DuckDB's round(), not
    numpy's banker's rounding (the float-parity hazard in CLAUDE.md)."""
    x = np.asarray(sims, dtype=np.float64) * 1e6
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def _duckdb_cos_e6(sf_dir: str, vec_ids, q_vid: int = 0) -> np.ndarray:
    """Bitwise emulation of DuckDB's
    ``CAST(round(list_cosine_similarity(e, q) * 1000000) AS BIGINT)`` on
    ``list<float>`` columns, for a FEW final rows (the reported top-k).

    DuckDB evaluates the whole expression in FLOAT32 — sequential f32
    accumulation of dot/norms, f32 divide, f32 multiply by 1e6 — while the
    distributed scan scores in float64 BLAS.  The two land on opposite
    sides of a .5e-6 rounding boundary ~1e-4 of the time (observed at
    sf0.001: 315127 vs 315128), so the REPORTED values recompute under
    DuckDB's exact precision contract; the scan/selection stays float64."""
    import duckdb

    ids = [int(v) for v in vec_ids]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{_path(sf_dir, 'embeddings')}' "
        f"WHERE vec_id IN ({','.join(map(str, set(ids) | {q_vid}))})"
    ).fetchall()
    con.close()
    emb = {vid: np.asarray(e, dtype=np.float32) for vid, e in rows}
    q = emb[q_vid]
    out = np.empty(len(ids), dtype=np.int64)
    for j, vid in enumerate(ids):
        a = emb[vid]
        d = np.float32(0.0)
        na = np.float32(0.0)
        nb = np.float32(0.0)
        for x, y in zip(a, q):
            d = np.float32(d + x * y)
            na = np.float32(na + x * x)
            nb = np.float32(nb + y * y)
        cos = np.float32(d / np.float32(np.sqrt(np.float32(na * nb))))
        x6 = float(np.float32(cos * np.float32(1_000_000.0)))
        out[j] = np.int64(np.sign(x6) * np.floor(abs(x6) + 0.5))
    return out


def _rerank_duckdb_e6(sf_dir: str, vec_ids: np.ndarray, k: int, q_vid: int = 0) -> pa.Table:
    """Re-rank candidate ids by the DuckDB-contract e6 value and emit the
    final (vec_id, sim_e6) top-k — ties broken by vec_id like the SQL's
    ORDER BY sim_e6 DESC, vec_id."""
    e6 = _duckdb_cos_e6(sf_dir, vec_ids, q_vid)
    order = np.lexsort((np.asarray(vec_ids, dtype=np.int64), -e6))[:k]
    return pa.table(
        {
            "vec_id": pa.array(np.asarray(vec_ids, dtype=np.int64)[order]),
            "sim_e6": pa.array(e6[order]),
        }
    )


def ann_topk(sf_dir: str):
    """Brute-force cosine top-10 neighbors of vec_id=0: numpy matmul per
    batch against the broadcast query vector (the scale path buckets by
    coarse quantizer; this is the exact baseline)."""
    q = _query_vec(sf_dir, 0)
    qn = q / np.linalg.norm(q)
    ds = _rd().read_parquet(_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        from sassy_ray.functions.ann import _emb_matrix

        M = _emb_matrix(t)  # zero-copy flatten+reshape off the Arrow buffer
        sims = (M / np.linalg.norm(M, axis=1, keepdims=True)) @ qn
        sim_e6 = _e6_half_away(sims)
        return pa.table(
            {"vec_id": t.column("vec_id"), "sim_e6": pa.array(sim_e6)}
        )

    # distributed f64 selection takes a small margin past k, then the
    # REPORTED values re-rank under DuckDB's f32 precision contract (the
    # f64-vs-f32 disagreement is ~1e-7 relative, so the margin guards the
    # k-boundary; see _duckdb_cos_e6)
    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["sim_e6", "vec_id"], descending=[True, False])
        .limit(18)
    )
    cand = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _rerank_duckdb_e6(sf_dir, cand.column("vec_id").to_numpy(), 10)


ANN_TOPK_SQL = """
SELECT vec_id,
       CAST(round(list_cosine_similarity(embedding, (SELECT embedding FROM embeddings WHERE vec_id = 0)) * 1000000) AS BIGINT) AS sim_e6
FROM embeddings
ORDER BY sim_e6 DESC, vec_id LIMIT 10
"""


# ---------------------------------------------------------------------------
# text analysis (training-data ops)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a")


def token_stats(sf_dir: str):
    """Token counting + quality features per doc, vectorized."""
    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    sw = set(_STOPWORDS)

    def stats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t.column("text"), " ")
        n_tokens = pc.list_value_length(toks)
        n_chars = pc.utf8_length(t.column("text"))
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        stop = pa.compute.is_in(flat.flatten(), value_set=pa.array(list(sw)))
        # segment sums via cumsum difference at list offsets (no row loop)
        offs = flat.offsets.to_numpy()
        cs = np.concatenate([[0], np.cumsum(stop.to_numpy(zero_copy_only=False).astype(np.int64))])
        n_stop = pa.array(cs[offs[1:]] - cs[offs[:-1]], pa.int64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_stopwords": n_stop,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS n_chars,
       len(list_filter(string_split(text, ' '), x -> x IN {_STOPWORDS!r})) AS n_stopwords
FROM documents
"""


def lang_stats(sf_dir: str):
    """Corpus language profile: docs + mean length per lang tag."""
    from ray.data.aggregate import Count, Mean

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars")
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _round_col(t, "avg_chars", 4)


LANG_STATS_SQL = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# ER pipeline entries (flagship; non-SQL -> rows-only checks)
# ---------------------------------------------------------------------------


def _export_er_closure_inputs(name: str, res, docs: pa.Table) -> None:
    """Export the matched edge list + node list so the SQL twin recomputes
    the TRANSITIVE CLUSTERING independently (DuckDB recursive closure vs
    stages/clustering.py).  The pair scoring itself has no SQL twin — it is
    pinned by the kernel fuzz suites and the F1-vs-exhaustive tests."""
    edges = _collect(res["scored"])
    edges = edges.filter(edges.column("is_match")).select(["doc_id_a", "doc_id_b"])
    _oracle_export(f"{name}_edges", edges)
    _oracle_export(f"{name}_nodes", pa.table({"doc_id": docs.column("doc_id")}))


def _er_closure_sql(name: str) -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT doc_id_a AS a, doc_id_b AS b
  FROM read_parquet('{_ORACLE_EXPORT_DIR}/{name}_edges.parquet')
),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
n AS (SELECT doc_id FROM read_parquet('{_ORACLE_EXPORT_DIR}/{name}_nodes.parquet')),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM n
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src
"""


# Gate-scale result cache: the driver's correctness pass calls er_clusters,
# er_match_edges and er_match_alignments back-to-back; they share one config
# (emit_matches=True is a column superset — cost/k/is_match are computed
# identically), so ONE pipeline execution serves all three.  Keyed by the
# Ray job id so a fresh ray.init (whose materialized blocks are gone)
# rebuilds instead of serving dead object refs.
_GATE_CACHE: dict = {}


def _session_token() -> str:
    try:
        import ray

        return ray.get_runtime_context().get_job_id() if ray.is_initialized() else "-"
    except Exception:
        return "-"


def _er_ascii_run(sf_dir: str):
    """Shared memoized ER run for the three ascii ER queries; returns
    (docs Arrow table, ERConfig, pipeline result dict)."""
    key = ("er_ascii", os.path.abspath(sf_dir), _session_token())
    hit = _GATE_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        from sassy_ray.pipelines.er import ERConfig, run_er_pipeline
        from sassy_ray.sources.synth import interleave_flat_documents
        from sassy_ray.stages.blocking import BlockingConfig
        from sassy_ray.stages.scoring import ScoreConfig

        flat = pq.read_table(_path(sf_dir, "documents"))
        docs, _truth = interleave_flat_documents(flat, seed=7)
        cfg = ERConfig(
            blocking=BlockingConfig(q=12),
            score=ScoreConfig(
                profile="ascii_ci", k_min=3, rel_k=0.03, lowercase=True, emit_matches=True
            ),
            score_concurrency=4,
        )
        res = run_er_pipeline(_rd().from_arrow(docs), cfg)
        hit = (docs, cfg, res)
        _GATE_CACHE[key] = hit
    return hit


def er_clusters(sf_dir: str):
    """Full ER pipeline over the interleaved corpus derived deterministically
    from this sf_dir's documents table: blocking -> pair scoring ->
    transitive clusters.  The clustering stage is SQL-verified via the
    exported match edges (recursive closure twin)."""
    docs, _cfg, res = _er_ascii_run(sf_dir)
    if docs.num_rows <= 4 * _ORACLE_EXPORT_MAX_DOCS:
        _export_er_closure_inputs("er_clusters", res, docs)
    return res["clusters"].sort("doc_id")


ER_CLUSTERS_SQL = _er_closure_sql("er_clusters")


def _er_doc_texts(docs: pa.Table, lowercase: bool) -> dict:
    from sassy_ray.sources.docs import concat_spans

    ids = docs.column("doc_id").to_pylist()
    texts = [t.encode() for t in concat_spans(docs.column("spans")).to_pylist()]
    if lowercase:
        texts = [t.lower() for t in texts]
    return dict(zip(ids, texts))


def _export_er_scored_oracle(name: str, pairs: pa.Table, docs: pa.Table, score, emit: bool) -> None:
    """Pure-DP (O(nm) Sellers) recompute of the ER pair scorer over the same
    candidate pair list — the independent implementation the NumPy kernel's
    scored edges are hash-compared against (same pattern as the
    search_approx oracle above).  Gate scale only."""
    from sassy_ray.kernel.oracle import OracleSearcher, end_costs
    from sassy_ray.kernel.profiles import get_profile

    prof = get_profile(score.profile)
    txt = _er_doc_texts(docs, score.lowercase)
    osr = OracleSearcher(
        "ascii", rc=False, only_best_match=True, case_sensitive=False
    ) if emit else None
    cols: dict[str, list] = {
        k: []
        for k in (
            ["doc_id_a", "doc_id_b", "cost", "k", "is_match"]
            + (["text_start", "text_end", "strand", "cigar"] if emit else [])
        )
    }
    for a, b in zip(pairs.column("doc_id_a").to_pylist(), pairs.column("doc_id_b").to_pylist()):
        ta, tb = txt[a], txt[b]
        pat, t = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
        k_pair = max(score.k_min, int(score.rel_k * len(pat)))
        cost = int(end_costs(pat, t, prof, 0).min())
        if score.rc and prof.supports_rc:
            cost = min(cost, int(end_costs(prof.reverse_complement(pat), t, prof, 0).min()))
        cost = min(cost, k_pair + 1)
        is_match = cost <= k_pair
        if emit and not is_match:
            continue
        cols["doc_id_a"].append(a)
        cols["doc_id_b"].append(b)
        cols["cost"].append(cost)
        cols["k"].append(k_pair)
        cols["is_match"].append(is_match)
        if emit:
            ms = osr.search(pat, t, k_pair)
            best = min(ms, key=lambda m: (m.cost, -m.text_end), default=None)
            cols["text_start"].append(best.text_start if best else -1)
            cols["text_end"].append(best.text_end if best else -1)
            cols["strand"].append(best.strand if best else "")
            cols["cigar"].append(best.cigar if best else "")
    tbl = pa.table(
        {
            "doc_id_a": pa.array(cols["doc_id_a"], pa.string()),
            "doc_id_b": pa.array(cols["doc_id_b"], pa.string()),
            "cost": pa.array(cols["cost"], pa.int32()),
            "k": pa.array(cols["k"], pa.int32()),
            "is_match": pa.array(cols["is_match"], pa.bool_()),
            **(
                {
                    "text_start": pa.array(cols["text_start"], pa.int64()),
                    "text_end": pa.array(cols["text_end"], pa.int64()),
                    "strand": pa.array(cols["strand"], pa.string()),
                    "cigar": pa.array(cols["cigar"], pa.string()),
                }
                if emit
                else {}
            ),
        }
    )
    _oracle_export(name, tbl)


def er_match_edges(sf_dir: str):
    """Scored candidate pairs of the ER pipeline (cost, k, is_match),
    hash-verified against a pure-DP recompute of the same pair list.
    Reuses the memoized shared run; the alignment columns its scorer also
    emitted are projected away (cost/k/is_match are identical either way)."""
    docs, cfg, res = _er_ascii_run(sf_dir)
    if docs.num_rows <= 4 * _ORACLE_EXPORT_MAX_DOCS:
        _export_er_scored_oracle(
            "er_match_edges_oracle", _collect(res["pairs"]), docs, cfg.score, emit=False
        )
    return (
        res["scored"]
        .select_columns(["doc_id_a", "doc_id_b", "cost", "k", "is_match"])
        .sort(["doc_id_a", "doc_id_b"])
    )


ER_MATCH_EDGES_SQL = f"""
SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/er_match_edges_oracle.parquet')
"""


def er_match_alignments(sf_dir: str):
    """ER scored edges WITH full match coordinates (text_start/end, strand,
    cigar) — sassy Match parity for the matched pairs, hash-verified against
    the pure-DP OracleSearcher's traced best matches."""
    docs, cfg, res = _er_ascii_run(sf_dir)
    matched = res["scored"].map_batches(
        lambda b: b.filter(b.column("is_match")), batch_format="pyarrow"
    )
    if docs.num_rows <= 4 * _ORACLE_EXPORT_MAX_DOCS:
        _export_er_scored_oracle(
            "er_match_alignments_oracle", _collect(res["pairs"]), docs, cfg.score, emit=True
        )
    return matched.sort(["doc_id_a", "doc_id_b"])


ER_MATCH_ALIGNMENTS_SQL = f"""
SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/er_match_alignments_oracle.parquet')
"""


def er_clusters_dna(sf_dir: str):
    """ER pipeline over the DNA corpus (RC + overhang duplicate cases);
    corpus size scales with the sf documents table."""
    import pyarrow.parquet as pq

    from sassy_ray.pipelines.er import ERConfig, run_er_pipeline
    from sassy_ray.sources.synth import dna_corpus
    from sassy_ray.stages.blocking import BlockingConfig
    from sassy_ray.stages.scoring import ScoreConfig

    n = pq.read_metadata(_path(sf_dir, "documents")).num_rows
    docs, _truth = dna_corpus(n_docs=max(50, n // 2), seed=42)
    cfg = ERConfig(
        blocking=BlockingConfig(q=8, rc_canonical=True),
        score=ScoreConfig(profile="iupac", rc=True, k_min=4, rel_k=0.12),
        score_concurrency=4,
    )
    res = run_er_pipeline(_rd().from_arrow(docs), cfg)
    if docs.num_rows <= 4 * _ORACLE_EXPORT_MAX_DOCS:
        _export_er_closure_inputs("er_clusters_dna", res, docs)
    return res["clusters"].sort("doc_id")


ER_CLUSTERS_DNA_SQL = _er_closure_sql("er_clusters_dna")


def er_clusters_scale_paths(sf_dir: str):
    """Same corpus + scoring semantics as ``er_clusters``, forced through
    every BEYOND-HEAP scale route at once — the code a 10^12-doc cluster
    deployment actually runs, hash-verified against the same DuckDB
    recursive-closure twin instead of only equality-tested vs the fast
    paths (`tests/test_fastpaths.py`, `test_er_pipeline.py`):

    - pair generation + exact dedup via the spill-capable Dataset-groupby
      shuffle (``PairGenConfig`` limits zeroed — not the manual exchange,
      not the single vectorized task);
    - ``text_mode='join'``: the pair->text attach as two hash-partitioned
      ``Dataset.join`` passes (no fits-in-a-node broadcast assumption);
    - distributed alternating-star connected components
      (``cc_driver_edge_limit=0`` — no driver DSU fast path).
    """
    import pyarrow.parquet as pq

    from sassy_ray.pipelines.er import ERConfig, run_er_pipeline
    from sassy_ray.sources.synth import interleave_flat_documents
    from sassy_ray.stages.blocking import BlockingConfig
    from sassy_ray.stages.pairs import PairGenConfig
    from sassy_ray.stages.scoring import ScoreConfig

    key = ("er_scale_paths", os.path.abspath(sf_dir), _session_token())
    hit = _GATE_CACHE.get(key)
    if hit is None:
        flat = pq.read_table(_path(sf_dir, "documents"))
        docs, _truth = interleave_flat_documents(flat, seed=7)
        cfg = ERConfig(
            blocking=BlockingConfig(q=12),
            score=ScoreConfig(profile="ascii_ci", k_min=3, rel_k=0.03, lowercase=True),
            pairs=PairGenConfig(
                single_task_dedup_limit=0,
                single_task_rows_limit=0,
                exchange_rows_limit=0,
            ),
            text_mode="join",
            cc_driver_edge_limit=0,
            score_concurrency=4,
        )
        res = run_er_pipeline(_rd().from_arrow(docs), cfg)
        hit = (docs, res)
        _GATE_CACHE[key] = hit
    docs, res = hit
    if docs.num_rows <= 4 * _ORACLE_EXPORT_MAX_DOCS:
        _export_er_closure_inputs("er_clusters_scale_paths", res, docs)
    return res["clusters"].sort("doc_id")


ER_CLUSTERS_SCALE_PATHS_SQL = _er_closure_sql("er_clusters_scale_paths")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "filter_project": filter_project,
    "broadcast_join": broadcast_join,
    "hash_join": hash_join,
    "sort_topk": sort_topk,
    "distinct_pairs": distinct_pairs,
    "events_window": events_window,
    "value_histogram": value_histogram,
    "search_exact_count": search_exact_count,
    "search_approx": search_approx,
    "filter_matching_docs": filter_matching_docs,
    "filter_nonmatching_docs": filter_nonmatching_docs,
    "match_cost_histogram": match_cost_histogram,
    "dedup_exact": dedup_exact,
    "doc_fingerprint": doc_fingerprint,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
        "ngram_jaccard": ngram_jaccard,
    "ann_topk": ann_topk,
    "token_stats": token_stats,
    "lang_stats": lang_stats,
    "er_clusters": er_clusters,
    "er_match_edges": er_match_edges,
    "er_clusters_dna": er_clusters_dna,
    "er_clusters_scale_paths": er_clusters_scale_paths,
    "er_match_alignments": er_match_alignments,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "filter_project": FILTER_PROJECT_SQL,
    "broadcast_join": BROADCAST_JOIN_SQL,
    "hash_join": HASH_JOIN_SQL,
    "sort_topk": SORT_TOPK_SQL,
    "distinct_pairs": DISTINCT_SQL,
    "events_window": EVENTS_WINDOW_SQL,
    "value_histogram": VALUE_HISTOGRAM_SQL,
    "search_exact_count": SEARCH_EXACT_COUNT_SQL,
    "filter_matching_docs": FILTER_MATCHING_DOCS_SQL,
    "filter_nonmatching_docs": FILTER_NONMATCHING_DOCS_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "dedup_minhash": DEDUP_MINHASH_SQL,
    "ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "er_clusters": ER_CLUSTERS_SQL,
    "er_clusters_dna": ER_CLUSTERS_DNA_SQL,
    "er_clusters_scale_paths": ER_CLUSTERS_SCALE_PATHS_SQL,
    "er_match_edges": ER_MATCH_EDGES_SQL,
    "er_match_alignments": ER_MATCH_ALIGNMENTS_SQL,
    "ann_topk": ANN_TOPK_SQL,
    "token_stats": TOKEN_STATS_SQL,
    "lang_stats": LANG_STATS_SQL,
}


# ---------------------------------------------------------------------------
# grep / crispr pipelines (sassy CLI parity; rows-only)
# ---------------------------------------------------------------------------


def _dna_docs_table(sf_dir: str) -> pa.Table:
    from sassy_ray.sources.synth import dna_corpus
    import pyarrow.parquet as pq

    n = pq.read_metadata(_path(sf_dir, "documents")).num_rows
    docs, _ = dna_corpus(n_docs=max(50, n // 2), seed=42)
    return docs


def _dna_texts_ds(sf_dir: str):
    """Deterministic DNA corpus (with spans concatenated) sized by sf."""
    from sassy_ray.sources.docs import add_doc_text

    return (
        _rd()
        .from_arrow(_dna_docs_table(sf_dir))
        .map_batches(add_doc_text, batch_format="pyarrow")
    )


def _export_dna_grep_oracle(
    name: str,
    sf_dir: str,
    patterns: list[tuple[str, bytes]],
    k: int,
    all_minima: bool = False,
    rename_pat: str | None = None,
    export_corpus: str | None = None,
) -> pa.Table | None:
    """Pure-DP (OracleSearcher, dna/rc) matches of the given pattern set over
    the synthesized DNA corpus, exported for the SQL twin.  Returns the
    corpus table (or None when skipped at bench scales)."""
    from sassy_ray.functions.matches import matches_to_table
    from sassy_ray.kernel.oracle import OracleSearcher
    from sassy_ray.sources.docs import concat_spans

    docs = _dna_docs_table(sf_dir)
    if docs.num_rows > _ORACLE_EXPORT_MAX_DOCS:
        return None
    ids = docs.column("doc_id").to_pylist()
    texts = [t.encode() for t in concat_spans(docs.column("spans")).to_pylist()]
    osr = OracleSearcher("dna", rc=True)
    rows = []
    for tid, text in zip(ids, texts):
        for pid, pseq in patterns:
            ms = osr.search_all(pseq, text, k) if all_minima else osr.search(pseq, text, k)
            rows.extend((pid, tid, text, m) for m in ms)
    t = matches_to_table(rows, "iupac")
    if rename_pat:
        t = t.rename_columns([rename_pat] + t.column_names[1:])
    _oracle_export(name, t)
    if export_corpus:
        _oracle_export(
            export_corpus,
            pa.table({"doc_id": pa.array(ids), "text": pa.array([t.decode() for t in texts])}),
        )
    return docs


def grep_search(sf_dir: str):
    """sassy search: pattern set vs DNA corpus -> ordered 8-col matches.
    Oracle: the same matches recomputed by the pure-DP OracleSearcher."""
    from sassy_ray.pipelines.grep import GrepConfig, run_grep

    pats = [("p1", b"ACGTACGTACGT"), ("p2", b"TTGACCTTGACC")]
    cfg = GrepConfig(patterns=pats, k=2, alphabet="dna", rc=True)
    _export_dna_grep_oracle("grep_search_matches", sf_dir, pats, k=2)
    return run_grep(_dna_texts_ds(sf_dir), cfg)["matches"]


GREP_SEARCH_SQL = f"""
SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/grep_search_matches.parquet')
"""


def grep_filter(sf_dir: str):
    """sassy filter: docs with >=1 match (all columns preserved).  Oracle:
    semi-join of the exported corpus against the DP-oracle match ids."""
    from sassy_ray.pipelines.grep import GrepConfig, run_grep

    pats = [("p1", b"ACGTACGTACGT")]
    cfg = GrepConfig(patterns=pats, k=2, alphabet="dna", rc=True)
    _export_dna_grep_oracle(
        "grep_filter_matches", sf_dir, pats, k=2, export_corpus="grep_corpus"
    )
    out = run_grep(_dna_texts_ds(sf_dir), cfg)["filtered"]
    return out.select_columns(["doc_id", "text"]).sort("doc_id")


GREP_FILTER_SQL = f"""
SELECT doc_id, text FROM read_parquet('{_ORACLE_EXPORT_DIR}/grep_corpus.parquet')
WHERE doc_id IN (
  SELECT DISTINCT text_id FROM read_parquet('{_ORACLE_EXPORT_DIR}/grep_filter_matches.parquet')
)
"""


def grep_cost_histogram(sf_dir: str):
    from sassy_ray.pipelines.grep import GrepConfig, run_grep

    pats = [("p1", b"ACGTACGTACGT")]
    cfg = GrepConfig(patterns=pats, k=3, alphabet="dna", rc=True)
    _export_dna_grep_oracle("grep_hist_matches", sf_dir, pats, k=3)
    return pa.Table.from_pandas(run_grep(_dna_texts_ds(sf_dir), cfg)["histogram"])


GREP_COST_HISTOGRAM_SQL = f"""
SELECT cost, count(*) AS n
FROM read_parquet('{_ORACLE_EXPORT_DIR}/grep_hist_matches.parquet')
GROUP BY cost
"""


def crispr_offtarget(sf_dir: str):
    """CRISPR off-target search over the DNA corpus (allow_pam_edits ->
    all-minima search).  Oracle: pure-DP search_all with the same guide."""
    from sassy_ray.pipelines.crispr import CrisprConfig, run_crispr

    from sassy_ray.sources.docs import add_doc_text

    # Derive the guide from a 1-row driver-side slice — never materialize or
    # double-consume the corpus dataset (it streams once through run_crispr).
    first = add_doc_text(_dna_docs_table(sf_dir).slice(0, 1))
    seq = first.column("text")[0].as_py()
    texts = _dna_texts_ds(sf_dir)
    guide = (seq[10:25] if len(seq) >= 25 else (seq * 3)[:15]).encode()
    _export_dna_grep_oracle(
        "crispr_matches", sf_dir, [(guide.decode(), guide)], k=2, all_minima=True,
        rename_pat="guide",
    )
    cfg = CrisprConfig([guide], k=2, pam_length=3, allow_pam_edits=True)
    out, _n = run_crispr(texts, cfg)
    return out.sort(["text_id", "start", "guide"])


CRISPR_OFFTARGET_SQL = f"""
SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/crispr_matches.parquet')
"""


def barcode_demux(sf_dir: str):
    """Barcode demultiplex — the reference's flagship v2 eval shape (96x24bp
    barcodes vs Nanopore reads at k=3, evals/src/sassy2/nanopore_results.csv;
    search semantics per (barcode, read) = Searcher::search).  Each read is
    assigned to its best barcode under the total order (cost, start, barcode,
    strand); unassigned reads are absent.  Oracle: ALL (barcode, read)
    matches recomputed by the pure-DP OracleSearcher and exported; the SQL
    twin independently performs the argmin with a window function."""
    from sassy_ray.pipelines.demux import DemuxConfig, run_demux
    from sassy_ray.sources.synth import barcoded_reads

    import pyarrow.parquet as pq

    n = pq.read_metadata(_path(sf_dir, "documents")).num_rows
    reads, barcodes, _truth = barcoded_reads(n_reads=max(100, n), seed=777)
    cfg = DemuxConfig(barcodes, k=3)
    # the pure-DP oracle export is fully determined by (seed, n_reads, k) —
    # skip the per-pair Python DP recompute when the parquet for the same
    # key already exists (bench.py's min-of-2 protocol calls this twice)
    _demux_meta = os.path.join(_ORACLE_EXPORT_DIR, "barcode_demux_matches.key")
    _demux_key = f"seed=777,n={reads.num_rows},k={cfg.k}"
    _demux_cached = False
    if os.path.exists(_demux_meta) and os.path.exists(
        os.path.join(_ORACLE_EXPORT_DIR, "barcode_demux_matches.parquet")
    ):
        with open(_demux_meta) as f:
            _demux_cached = f.read() == _demux_key
    if reads.num_rows <= _ORACLE_EXPORT_MAX_DOCS and not _demux_cached:
        from sassy_ray.kernel.oracle import OracleSearcher

        osr = OracleSearcher("dna", rc=True)
        cols: dict[str, list] = {c: [] for c in ("barcode", "read_id", "cost", "strand", "start", "end")}
        ids = reads.column("read_id").to_pylist()
        texts = [t.encode() for t in reads.column("text").to_pylist()]
        for rid, text in zip(ids, texts):
            for bid, bseq in barcodes:
                for m in osr.search(bseq, text, cfg.k):
                    cols["barcode"].append(bid)
                    cols["read_id"].append(rid)
                    cols["cost"].append(m.cost)
                    cols["strand"].append(m.strand)
                    cols["start"].append(m.text_start)
                    cols["end"].append(m.text_end)
        _oracle_export(
            "barcode_demux_matches",
            pa.table(
                {
                    "barcode": pa.array(cols["barcode"], pa.string()),
                    "read_id": pa.array(cols["read_id"], pa.string()),
                    "cost": pa.array(cols["cost"], pa.int32()),
                    "strand": pa.array(cols["strand"], pa.string()),
                    "start": pa.array(cols["start"], pa.int64()),
                    "end": pa.array(cols["end"], pa.int64()),
                }
            ),
        )
        with open(_demux_meta, "w") as f:
            f.write(_demux_key)
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = _rd().from_arrow(reads).repartition(max(2, cpus))
    return run_demux(ds, cfg)


BARCODE_DEMUX_SQL = f"""
SELECT read_id, barcode, cost, strand, start, "end"
FROM read_parquet('{_ORACLE_EXPORT_DIR}/barcode_demux_matches.parquet')
QUALIFY row_number() OVER (
  PARTITION BY read_id ORDER BY cost, start, barcode, strand, "end") = 1
ORDER BY read_id
"""


# ---------------------------------------------------------------------------
# text analysis / multimodal / ANN extensions
# ---------------------------------------------------------------------------


def lang_id(sf_dir: str):
    """Marker-word heuristic language ID, fully recomputed by the SQL twin
    (distinct lowercase words -> per-language marker intersection -> argmax
    with fixed tie order; integer score_e6)."""
    from sassy_ray.functions.text import lang_id_batch

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    return ds.map_batches(lang_id_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "lang", "pred_lang", "score_e6"]
    )


LANG_ID_SQL = """
WITH w AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(regexp_extract_all(text, '[a-zA-Z]+'), x -> lower(x))) AS words,
         regexp_matches(substr(text, 1, 200), '[一-鿿]') AS cjk
  FROM documents
),
s AS (
  SELECT doc_id, lang, cjk, len(words) AS nw,
         len(list_intersect(words, ['the','and','of','to','in','is','it','that'])) AS n_en,
         len(list_intersect(words, ['der','die','das','und','nicht','ist','ich'])) AS n_de,
         len(list_intersect(words, ['le','la','les','et','est','une','que'])) AS n_fr,
         len(list_intersect(words, ['el','los','las','es','una','que','por'])) AS n_es
  FROM w
)
SELECT doc_id, lang,
  CASE WHEN cjk THEN 'zh'
       WHEN greatest(n_en, n_de, n_fr, n_es) = 0 THEN 'und'
       WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
       WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
       WHEN n_fr >= n_es THEN 'fr'
       ELSE 'es' END AS pred_lang,
  CAST(CASE WHEN cjk THEN 1000000
       ELSE greatest(n_en, n_de, n_fr, n_es) * 1000000 // greatest(nw, 1) END AS BIGINT) AS score_e6
FROM s
"""


def quality_scores(sf_dir: str):
    """Length / punctuation / stopword / word-length features; e6 integer
    ratios recomputed exactly by the SQL twin."""
    from sassy_ray.functions.text import quality_batch

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


QUALITY_SCORES_SQL = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST((length(text) - length(regexp_replace(text, '[.,;:!?()\\[\\]{}"''`]', '', 'g'))) * 1000000
       // greatest(length(text), 1) AS BIGINT) AS punct_e6,
  CAST(len(list_filter(toks, x -> lower(x) IN ('the','and','of','to','in','is','it','that'))) * 1000000
       // greatest(len(toks), 1) AS BIGINT) AS stop_e6,
  CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 1000000
       // greatest(len(toks), 1) AS BIGINT) AS wordlen_e6
FROM t
"""


def token_counts(sf_dir: str):
    from sassy_ray.functions.text import token_count_batch

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


TOKEN_COUNTS_SQL = """
SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       length(regexp_replace(text, '[A-Za-z]+|[0-9]+|[^ A-Za-z0-9]', 'T', 'g'))
         - length(replace(regexp_replace(text, '[A-Za-z]+|[0-9]+|[^ A-Za-z0-9]', 'T', 'g'), 'T', ''))
         + 0 AS bpe_tokens
FROM documents
"""


def doc_fingerprint64(sf_dir: str):
    """64-bit md5-prefix content fingerprint per doc, recomputed by the SQL
    twin (the rolling-hash variant lives in functions/text.fingerprint_batch,
    pinned by tests; this SQL-checkable one is the queries() entry)."""
    from sassy_ray.functions.text import md5_fingerprint_batch

    ds = _rd().read_parquet(_path(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(md5_fingerprint_batch, batch_format="pyarrow")


DOC_FINGERPRINT64_SQL = """
SELECT doc_id,
  CAST(list_sum(list_transform(range(16), i ->
      (strpos('0123456789abcdef', substr(md5(text), i+1, 1)) - 1)::HUGEINT * (1::HUGEINT << ((15-i)*4))
  )) AS UBIGINT) AS fingerprint64
FROM documents
"""


def media_features(sf_dir: str):
    """Multimodal plumbing: media spans -> synthetic payloads -> actor-pool
    decode/feature stage (stubbed codec, real Ray plumbing).  Returns one
    fingerprint row per media ref (kind, frame count, e6-quantized feature
    sum/min/max from a float64 histogram x projection).  The SQL twin
    RECOMPUTES the features from an independently-built byte histogram
    (pure-Python Counter, exported) joined against the exported projection
    matrix — checking the decode+project pipeline against a second
    implementation."""
    import collections

    import pyarrow.parquet as pq

    from sassy_ray.functions.multimodal import (
        MediaDecoder,
        media_refs_from_spans,
        synthesize_media_payloads,
    )
    from sassy_ray.sources.synth import dna_corpus

    n = pq.read_metadata(_path(sf_dir, "documents")).num_rows
    docs, _ = dna_corpus(n_docs=max(50, n // 2), seed=42)
    refs_tbl = media_refs_from_spans(docs)
    refs = sorted(set(refs_tbl.column("media_ref").to_pylist()))
    media = synthesize_media_payloads(refs)

    # oracle inputs: byte histograms via collections.Counter (independent of
    # the decoder's np.bincount path), media metadata, projection matrix
    h_ref, h_byte, h_cnt = [], [], []
    for r, payload in zip(media.column("media_ref").to_pylist(), media.column("payload").to_pylist()):
        for byte, cnt in sorted(collections.Counter(payload).items()):
            h_ref.append(r)
            h_byte.append(byte)
            h_cnt.append(cnt)
    _oracle_export(
        "media_hist",
        pa.table(
            {
                "media_ref": pa.array(h_ref, pa.string()),
                "byte": pa.array(h_byte, pa.int32()),
                "cnt": pa.array(h_cnt, pa.int64()),
            }
        ),
    )
    _oracle_export(
        "media_meta", media.select(["media_ref", "kind", "duration_ms"])
    )
    proj = np.random.default_rng(1234).standard_normal((256, 32))
    b_idx, d_idx = np.meshgrid(np.arange(256), np.arange(32), indexing="ij")
    _oracle_export(
        "media_proj",
        pa.table(
            {
                "byte": pa.array(b_idx.reshape(-1), pa.int32()),
                "dim": pa.array(d_idx.reshape(-1), pa.int32()),
                "w": pa.array(proj.reshape(-1), pa.float64()),
            }
        ),
    )

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    out = (
        _rd()
        .from_arrow(media)
        .map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"mode": "deterministic_fake", "dim": 32},
            batch_format="pyarrow",
            batch_size=64,
            # autoscaling actor pool sized by the cluster (decode stages are
            # the canonical stateful actor-pool shape)
            concurrency=(1, max(2, cpus // 2)),
        )
        .select_columns(["media_ref", "kind", "n_frames", "feat_sum_e6", "feat_min_e6", "feat_max_e6"])
    )
    return out.sort("media_ref")


MEDIA_FEATURES_SQL = f"""
WITH h AS (SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/media_hist.parquet')),
tot AS (SELECT media_ref, sum(cnt) AS n FROM h GROUP BY media_ref),
p AS (SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/media_proj.parquet')),
f AS (
  SELECT h.media_ref, p.dim,
         sum((CAST(h.cnt AS DOUBLE) / greatest(CAST(t.n AS DOUBLE), 1.0)) * p.w) AS v
  FROM h JOIN tot t USING (media_ref) JOIN p ON p.byte = h.byte
  GROUP BY h.media_ref, p.dim
),
agg AS (
  SELECT media_ref,
         CAST(round(sum(v) * 1000000) AS BIGINT) AS feat_sum_e6,
         CAST(round(min(v) * 1000000) AS BIGINT) AS feat_min_e6,
         CAST(round(max(v) * 1000000) AS BIGINT) AS feat_max_e6
  FROM f GROUP BY media_ref
),
m AS (
  SELECT media_ref, kind,
         CASE WHEN kind = 'video' THEN greatest(1, duration_ms // 1000) ELSE 1 END AS n_frames
  FROM read_parquet('{_ORACLE_EXPORT_DIR}/media_meta.parquet')
)
SELECT m.media_ref, m.kind, m.n_frames, a.feat_sum_e6, a.feat_min_e6, a.feat_max_e6
FROM m JOIN agg a USING (media_ref)
"""


def _query_vec(sf_dir: str, vid: int = 0) -> np.ndarray:
    import duckdb

    con = duckdb.connect()
    emb = con.execute(
        f"SELECT embedding FROM '{_path(sf_dir, 'embeddings')}' WHERE vec_id = {vid}"
    ).fetchone()[0]
    con.close()
    return np.asarray(emb, dtype=np.float64)


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate top-k (scale path next to brute force).
    The bucket ASSIGNMENTS and probed-bucket set are exported, so the SQL
    twin recomputes the exact top-k by cosine over the probed subset —
    checking the scoring path independently of the quantizer."""
    from sassy_ray.functions.ann import assign_buckets_batch, coarse_centroids, ivf_topk

    ds = _rd().read_parquet(_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    q = _query_vec(sf_dir, 0)
    # persisted quantizer artifact: built once per (input, config), reused
    # across calls — one fewer pass over embeddings on every later query
    emb_path = _path(sf_dir, "embeddings")
    import hashlib

    ckey = hashlib.md5(
        f"{emb_path}:{os.path.getmtime(emb_path)}:16:42".encode()
    ).hexdigest()[:16]
    C = coarse_centroids(ds, 16, seed=42, cache_path=f"/tmp/sassy_ivf_{ckey}.npy")
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(qn @ C.T))[:4]
    assigns = _collect(
        ds.map_batches(
            lambda b: assign_buckets_batch(b, C), batch_format="pyarrow"
        )
    )
    _oracle_export("ann_ivf_assign", assigns)
    _oracle_export("ann_ivf_probed", pa.table({"bucket": pa.array(probe.astype(np.int64))}))
    # select with margin in f64, report under DuckDB's f32 contract
    # (same rationale as ann_topk; see _duckdb_cos_e6)
    ids, sims, counts = ivf_topk(
        ds, q[None, :], k=18, centroids=C, nprobe=4, quantize=_e6_half_away
    )
    n = int(counts[0])
    return _rerank_duckdb_e6(sf_dir, ids[0][:n], 10)


ANN_IVF_TOPK_SQL = f"""
WITH a AS (SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/ann_ivf_assign.parquet')),
p AS (SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/ann_ivf_probed.parquet'))
SELECT e.vec_id,
       CAST(round(list_cosine_similarity(e.embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = 0)) * 1000000) AS BIGINT) AS sim_e6
FROM embeddings e JOIN a ON a.vec_id = e.vec_id
WHERE a.bucket IN (SELECT bucket FROM p)
ORDER BY sim_e6 DESC, e.vec_id LIMIT 10
"""


def embedding_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (salted bucket candidates +
    bucket-local exact verify).  Candidates are exported; the SQL twin
    recomputes the cosine threshold over them from the raw embeddings."""
    from sassy_ray.functions.ann import embedding_neardup_pairs

    ds = _rd().read_parquet(_path(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    res = embedding_neardup_pairs(ds, tau=0.35)
    # multi-assignment candidates can repeat a pair (found via two buckets):
    # export DISTINCT pairs so the SQL twin and the deduped engine output
    # count each pair once
    cands_full = _collect(res["candidates"])
    cands = cands_full.select(["vec_id_a", "vec_id_b"])
    _oracle_export(
        "embedding_neardup_cands",
        cands.group_by(["vec_id_a", "vec_id_b"]).aggregate([]),
    )
    t = res["pairs_fn"]()
    import pandas as pd

    df = t.to_pandas().sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
    keep = set(zip(df["vec_id_a"], df["vec_id_b"]))
    # precision-contract insurance (same class as _duckdb_cos_e6): the SQL
    # twin thresholds DuckDB's FLOAT32 cosine while the verify matmul is
    # float64 — candidates within 1e-5 of tau re-decide under the f32
    # contract (normally zero rows; the distributed filter stays f64 BLAS)
    cd = cands_full.to_pandas().drop_duplicates(["vec_id_a", "vec_id_b"])
    near = cd[(cd["sim"] - 0.35).abs() < 1e-5]
    if len(near):
        emb = {
            int(r[0]): np.asarray(r[1], dtype=np.float32)
            for r in _collect(ds).select(["vec_id", "embedding"]).to_pandas().itertuples(index=False)
        }
        for a, b in zip(near["vec_id_a"], near["vec_id_b"]):
            va, vb = emb[int(a)], emb[int(b)]
            d = np.float32(0.0)
            na = np.float32(0.0)
            nb = np.float32(0.0)
            for x, y in zip(va, vb):
                d = np.float32(d + x * y)
                na = np.float32(na + x * x)
                nb = np.float32(nb + y * y)
            cos32 = float(np.float32(d / np.float32(np.sqrt(np.float32(na * nb)))))
            if cos32 >= 0.35:
                keep.add((a, b))
            else:
                keep.discard((a, b))
        df = pd.DataFrame(sorted(keep), columns=["vec_id_a", "vec_id_b"]).astype("int64")
    return pa.Table.from_pandas(df[["vec_id_a", "vec_id_b"]], preserve_index=False)


EMBEDDING_NEARDUP_SQL = f"""
WITH c AS (SELECT * FROM read_parquet('{_ORACLE_EXPORT_DIR}/embedding_neardup_cands.parquet'))
SELECT c.vec_id_a, c.vec_id_b
FROM c
JOIN embeddings ea ON ea.vec_id = c.vec_id_a
JOIN embeddings eb ON eb.vec_id = c.vec_id_b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= 0.35
"""


def _fused_sort_key(cols: list, widths: list[int]) -> pa.Array:
    """Fixed-width zero-padded decimal concatenation of non-negative int
    columns — ONE string sort key whose lexicographic order equals the
    multi-column numeric order (Ray's multi-column sort/groupby is ~20x
    slower than a single key column; see CLAUDE.md)."""
    parts = [
        pc.utf8_lpad(pc.cast(pc.cast(c, pa.int64()), pa.string()), w, "0")
        for c, w in zip(cols, widths)
    ]
    return pc.binary_join_element_wise(*parts, "")


_SESSION_GAP_US = 1800 * 1_000_000


def events_sessionize(sf_dir: str):
    """Sessionization: per-user sessions split at >30min gaps.

    NOT a per-user ``groupby().map_groups`` — Ray's aggregate machinery
    invokes Python once per GROUP and millions of users turn the stage into
    per-group-Python overhead (the failure measured in stages/clustering.py).
    Instead the proven sort + vectorized block-pass + boundary-correction
    pattern: one global sort on a fused (user, ts, event_id) key, sessions
    computed vectorized per BLOCK, and only each block's first/last session
    (the only ones that can continue across a block seam) go to the driver
    for an O(2 x blocks) merge."""
    ds = _rd().read_parquet(_path(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def keyed(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t.column("ts"), pa.int64())
        return pa.table(
            {
                "skey": _fused_sort_key(
                    [t.column("user_id"), ts_us, t.column("event_id")], [12, 16, 12]
                ),
                "user": pc.cast(t.column("user_id"), pa.int64()),
                "ts_us": ts_us,
            }
        )

    sorted_ds = ds.map_batches(keyed, batch_format="pyarrow").sort("skey").materialize()

    def block_sessions(b: pa.Table) -> pa.Table:
        """Vectorized sessions over one sorted block; rows tagged edge=1 for
        the block's first/last session (driver merges those), edge=0 final."""
        if b.num_rows == 0:
            return pa.table(
                {
                    "user": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "edge": pa.array([], pa.int8()),
                }
            )
        user = b.column("user").to_numpy()
        ts = b.column("ts_us").to_numpy()
        n = len(user)
        new = np.ones(n, bool)
        new[1:] = (user[1:] != user[:-1]) | (ts[1:] - ts[:-1] > _SESSION_GAP_US)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        ends = starts + counts - 1
        edge = np.zeros(len(starts), np.int8)
        edge[0] = edge[-1] = 1
        return pa.table(
            {
                "user": pa.array(user[starts], pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "edge": pa.array(edge, pa.int8()),
            }
        )

    # batch_size=None: batches == materialized sorted blocks, so block seams
    # are exactly the places the edge flag covers
    sess = sorted_ds.map_batches(
        block_sessions, batch_format="pyarrow", batch_size=None
    ).materialize()
    final = sess.map_batches(
        lambda t: t.filter(pc.equal(t.column("edge"), pa.scalar(0, pa.int8()))),
        batch_format="pyarrow",
    )
    # driver merge of the edge sessions: adjacent-in-time sessions of the
    # same user merge iff gap <= 30min (exact: any interior session between
    # two edge sessions forces their gap above the threshold)
    edges = (
        pa.concat_tables(
            sess.map_batches(
                lambda t: t.filter(pc.equal(t.column("edge"), pa.scalar(1, pa.int8()))),
                batch_format="pyarrow",
            ).iter_batches(batch_size=65536, batch_format="pyarrow")
        )
        .sort_by([("user", "ascending"), ("start_us", "ascending")])
        .drop_columns(["edge"])
    )
    merged = {"user": [], "start_us": [], "n_events": []}
    cur = None  # (user, start, end, n)
    for u, s, e, cnt in zip(
        edges.column("user").to_pylist(),
        edges.column("start_us").to_pylist(),
        edges.column("end_us").to_pylist(),
        edges.column("n_events").to_pylist(),
    ):
        if cur is not None and cur[0] == u and s - cur[2] <= _SESSION_GAP_US:
            cur = (u, cur[1], max(cur[2], e), cur[3] + cnt)
            continue
        if cur is not None:
            merged["user"].append(cur[0])
            merged["start_us"].append(cur[1])
            merged["n_events"].append(cur[3])
        cur = (u, s, e, cnt)
    if cur is not None:
        merged["user"].append(cur[0])
        merged["start_us"].append(cur[1])
        merged["n_events"].append(cur[3])
    drv = pa.table(
        {
            "user_id": pa.array(merged["user"], pa.int64()),
            "session_start": pc.cast(
                pa.array(merged["start_us"], pa.int64()), pa.timestamp("us")
            ),
            "n_events": pa.array(merged["n_events"], pa.int64()),
        }
    )
    body = _collect(
        final.map_batches(
            lambda t: pa.table(
                {
                    "user_id": t.column("user"),
                    "session_start": pc.cast(t.column("start_us"), pa.timestamp("us")),
                    "n_events": t.column("n_events"),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return pa.concat_tables([body, drv])


EVENTS_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM s GROUP BY user_id, session_id
"""


def _highvalue_custkeys(sf_dir: str) -> pa.Array:
    """DISTRIBUTED distinct of the orders fact side: per-batch filter +
    unique (combiner) -> groupby-distinct shuffle of keys only.  The driver
    sees just the distinct key set (small), never the fact table."""
    ds = _rd().read_parquet(_path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    dist = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": pc.unique(
                        t.filter(
                            pc.greater(t.column("o_totalprice"), pa.scalar(400000.0))
                        ).column("o_custkey")
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .count()
    )
    keys = pa.concat_tables(
        dist.select_columns(["o_custkey"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    )
    return keys.column("o_custkey").combine_chunks()


def semi_join_users(sf_dir: str):
    """Semi join: customers that have at least one high-value order —
    distributed distinct on the fact side, then broadcast key set +
    vectorized isin filter (S6/J3 family)."""
    keys = _highvalue_custkeys(sf_dir)
    ds = _rd().read_parquet(_path(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("c_custkey"), value_set=keys)),
        batch_format="pyarrow",
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def anti_join_users(sf_dir: str):
    """Anti join: customers with no high-value orders (same distributed
    distinct + broadcast key set, inverted filter)."""
    keys = _highvalue_custkeys(sf_dir)
    ds = _rd().read_parquet(_path(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    return ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t.column("c_custkey"), value_set=keys))),
        batch_format="pyarrow",
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def union_all_counts(sf_dir: str):
    """Union of two filtered streams + count by source tag."""
    a = _rd().read_parquet(_path(sf_dir, "orders"), columns=["o_orderstatus"])
    a = a.map_batches(
        lambda t: pa.table({"status": t.column("o_orderstatus")}), batch_format="pyarrow"
    )
    b = _rd().read_parquet(_path(sf_dir, "orders"), columns=["o_orderstatus"])
    b = b.map_batches(
        lambda t: pa.table(
            {"status": pc.utf8_lower(t.column("o_orderstatus"))}
        ),
        batch_format="pyarrow",
    )
    out = a.union(b).groupby("status").count()
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).rename_columns(
        ["status", "n"]
    )


UNION_ALL_SQL = """
SELECT status, count(*) AS n FROM (
  SELECT o_orderstatus AS status FROM orders
  UNION ALL
  SELECT lower(o_orderstatus) AS status FROM orders
) GROUP BY status
"""

QUERIES.update(
    {
        "grep_search": grep_search,
        "grep_filter": grep_filter,
        "grep_cost_histogram": grep_cost_histogram,
        "crispr_offtarget": crispr_offtarget,
        "barcode_demux": barcode_demux,
        "lang_id": lang_id,
        "quality_scores": quality_scores,
        "token_counts": token_counts,
        "doc_fingerprint64": doc_fingerprint64,
        "media_features": media_features,
        "ann_ivf_topk": ann_ivf_topk,
        "embedding_neardup": embedding_neardup,
        "events_sessionize": events_sessionize,
        "semi_join_users": semi_join_users,
        "anti_join_users": anti_join_users,
        "union_all_counts": union_all_counts,
    }
)

ORACLE_SQL.update(
    {
        "search_approx": SEARCH_APPROX_SQL,
        "match_cost_histogram": MATCH_COST_HISTOGRAM_SQL,
        "grep_search": GREP_SEARCH_SQL,
        "grep_filter": GREP_FILTER_SQL,
        "grep_cost_histogram": GREP_COST_HISTOGRAM_SQL,
        "crispr_offtarget": CRISPR_OFFTARGET_SQL,
        "barcode_demux": BARCODE_DEMUX_SQL,
        "token_counts": TOKEN_COUNTS_SQL,
        "lang_id": LANG_ID_SQL,
        "quality_scores": QUALITY_SCORES_SQL,
        "doc_fingerprint64": DOC_FINGERPRINT64_SQL,
        "events_sessionize": EVENTS_SESSIONIZE_SQL,
        "semi_join_users": SEMI_JOIN_SQL,
        "anti_join_users": ANTI_JOIN_SQL,
        "union_all_counts": UNION_ALL_SQL,
    }
)


# ---------------------------------------------------------------------------
# as-of join / window aggregate / multi-join (custom-operator compositions)
# ---------------------------------------------------------------------------


def asof_join_orders(sf_dir: str):
    """As-of join (custom operator SURVEY.md §2.4 note): each event matched
    to the user's latest order with o_orderdate <= ts.  Size-adaptive like
    hash_join: when the orders parquet footer says the side decodes under
    the broadcast limit, the deduped orders ship once via ray.put and pandas
    merge_asof runs batch-locally (no shuffle); above the limit both sides
    hash-partition by user key and each partition runs one sorted merge_asof
    (the path that scales — the driver never materializes either side)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Max

    # DISTRIBUTED pre-dedup of the orders side: ties on (custkey, orderdate)
    # make the as-of ambiguous; keep the max orderkey per (custkey, date)
    # (mirrored in the SQL oracle).  The two-column key is fused into ONE
    # int64 (custkey << 22 | epoch_days) — Ray's multi-column groupby sort is
    # ~20x slower than a single key column.
    def fuse(t: pa.Table) -> pa.Table:
        days = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()), pa.int32())
        key = pc.add(
            pc.multiply(pc.cast(t.column("o_custkey"), pa.int64()), pa.scalar(1 << 22, pa.int64())),
            pc.cast(days, pa.int64()),
        )
        return pa.table({"ckey_day": key, "o_orderkey": t.column("o_orderkey")})

    dedup = (
        _rd()
        .read_parquet(_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(fuse, batch_format="pyarrow")
        .groupby("ckey_day")
        .aggregate(Max("o_orderkey", alias_name="o_orderkey"))
    )
    events = _rd().read_parquet(_path(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    if _parquet_bytes(_path(sf_dir, "orders")) <= _broadcast_join_limit():
        # broadcast path: only the deduped (custkey, date, orderkey) side
        # reaches the driver, as the broadcast table
        small = pa.concat_tables(dedup.iter_batches(batch_size=65536, batch_format="pyarrow"))
        fused = small.column("ckey_day").to_numpy()
        orders = (
            pd.DataFrame(
                {
                    "o_custkey": (fused >> 22).astype("int64"),
                    "o_orderdate": pd.to_datetime(fused & ((1 << 22) - 1), unit="D"),
                    "o_orderkey": small.column("o_orderkey").to_numpy().astype("int64"),
                }
            )
            .sort_values("o_orderdate")
            .reset_index(drop=True)
        )
        orders_ref = ray.put(orders)

        def match(df: pd.DataFrame) -> pd.DataFrame:
            odf = ray.get(orders_ref)
            odf = odf.assign(o_orderdate=odf["o_orderdate"].astype(df["ts"].dtype))
            df = df.sort_values("ts").reset_index(drop=True)
            out = pd.merge_asof(
                df,
                odf,
                left_on="ts",
                right_on="o_orderdate",
                left_by="user_id",
                right_by="o_custkey",
                direction="backward",
            )
            out = out[out["o_orderkey"].notna()]
            return pd.DataFrame(
                {
                    "event_id": out["event_id"].astype("int64"),
                    "user_id": out["user_id"].astype("int64"),
                    "o_orderkey": out["o_orderkey"].astype("int64"),
                }
            )

        out = events.map_batches(match, batch_format="pandas")
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)

    # ---- partitioned path (orders side too big to broadcast) --------------
    # Both sides map into ONE unified schema tagged by null-ness (orders rows
    # have event_id=null, events rows o_orderkey=null), hash-partitioned on
    # user.  ONE groupby(part) shuffle co-locates each user's events with
    # their orders; each partition (P = cluster CPUs groups, NOT per-user
    # groups — per-group Python stays O(CPUs)) runs one vectorized sorted
    # merge_asof.  Timestamps compare as int64 micros; a date at midnight
    # matches ts >= date exactly like the broadcast path.
    # power of two so the partition key is one bit_wise_and (pyarrow has no
    # modulo kernel); derived from cluster CPUs (same pattern as er.py's
    # join partitioning) so a bigger cluster gets more shuffle parallelism
    # and each merge_asof task holds ~corpus/nparts, not corpus/32
    import ray as _ray

    _cpus = int(_ray.cluster_resources().get("CPU", 8))
    nparts = 1 << max(2, (_cpus - 1).bit_length())

    def orders_rows(t: pa.Table) -> pa.Table:
        fusedk = t.column("ckey_day")
        user = pc.cast(pc.shift_right(fusedk, 22), pa.int64())
        days = pc.bit_wise_and(fusedk, pa.scalar((1 << 22) - 1, pa.int64()))
        ts_us = pc.multiply(pc.cast(days, pa.int64()), pa.scalar(86_400_000_000, pa.int64()))
        n = t.num_rows
        return pa.table(
            {
                "part": pc.cast(pc.bit_wise_and(user, pa.scalar(nparts - 1, pa.int64())), pa.int64()),
                "user": user,
                "ts_us": ts_us,
                "event_id": pa.nulls(n, pa.int64()),
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            }
        )

    def events_rows(t: pa.Table) -> pa.Table:
        user = pc.cast(t.column("user_id"), pa.int64())
        n = t.num_rows
        return pa.table(
            {
                "part": pc.cast(pc.bit_wise_and(user, pa.scalar(nparts - 1, pa.int64())), pa.int64()),
                "user": user,
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "o_orderkey": pa.nulls(n, pa.int64()),
            }
        )

    both = dedup.map_batches(orders_rows, batch_format="pyarrow").union(
        events.map_batches(events_rows, batch_format="pyarrow")
    )

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        is_order = g["event_id"].isna()
        odf = (
            g.loc[is_order, ["user", "ts_us", "o_orderkey"]]
            .sort_values("ts_us")
            .reset_index(drop=True)
        )
        edf = (
            g.loc[~is_order, ["user", "ts_us", "event_id"]]
            .sort_values("ts_us")
            .reset_index(drop=True)
        )
        if not len(odf) or not len(edf):
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "o_orderkey": pd.Series([], dtype="int64"),
                }
            )
        out = pd.merge_asof(
            edf, odf, on="ts_us", by="user", direction="backward"
        )
        out = out[out["o_orderkey"].notna()]
        return pd.DataFrame(
            {
                "event_id": out["event_id"].astype("int64"),
                "user_id": out["user"].astype("int64"),
                "o_orderkey": out["o_orderkey"].astype("int64"),
            }
        )

    out = both.groupby("part").map_groups(asof_part, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


ASOF_JOIN_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e ASOF JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def window_running_revenue(sf_dir: str):
    """Per-customer running order total (window function shape).

    Same scale pattern as events_sessionize (per-user ``map_groups`` dies at
    millions of groups): ONE global sort on a fused (custkey, orderdate,
    orderkey) key, a boundary-partials pass collecting each block's first/
    last customer sums (O(2 x blocks) rows to the driver), a driver prefix
    scan turning those into per-block offsets, then a vectorized per-block
    cumsum pass that adds the offset to its first customer group."""
    ds = _rd().read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        days = pc.cast(pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()), pa.int32()), pa.int64())
        cents = pc.cast(
            pc.round(
                pc.multiply(t.column("o_totalprice"), pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "skey": _fused_sort_key(
                    [t.column("o_custkey"), days, t.column("o_orderkey")], [12, 8, 14]
                ),
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "cents": cents,
            }
        )

    sorted_ds = ds.map_batches(keyed, batch_format="pyarrow").sort("skey").materialize()

    _EMPTY_PARTIAL = pa.table(
        {
            "bkey": pa.array([], pa.string()),
            "cust": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int8()),
        }
    )

    def boundary_partials(b: pa.Table) -> pa.Table:
        """(block first skey, first/last customer, that customer's block
        sum) — only the first/last customer of a block can span a seam."""
        if b.num_rows == 0:
            return _EMPTY_PARTIAL
        cust = b.column("o_custkey").to_numpy()
        cents = b.column("cents").to_numpy()
        bkey = b.column("skey")[0].as_py()
        first_c, last_c = int(cust[0]), int(cust[-1])
        out = {
            "bkey": [bkey],
            "cust": [first_c],
            "cents": [int(cents[cust == first_c].sum())],
            "pos": [0],
        }
        if last_c != first_c:
            out["bkey"].append(bkey)
            out["cust"].append(last_c)
            out["cents"].append(int(cents[cust == last_c].sum()))
            out["pos"].append(1)
        return pa.table(
            {
                "bkey": pa.array(out["bkey"], pa.string()),
                "cust": pa.array(out["cust"], pa.int64()),
                "cents": pa.array(out["cents"], pa.int64()),
                "pos": pa.array(out["pos"], pa.int8()),
            }
        )

    partials = _collect(
        sorted_ds.map_batches(boundary_partials, batch_format="pyarrow", batch_size=None)
    ).sort_by([("bkey", "ascending"), ("pos", "ascending")])
    # driver prefix scan in block order: offset of a block's FIRST customer
    # group = that customer's total in all earlier blocks (only boundary
    # customers ever accumulate — O(2 x blocks) state)
    corr: dict = {}  # bkey -> offset for the block's first group
    cum: dict = {}  # cust -> running total across blocks seen so far
    for bk, cu, ce, pos in zip(
        partials.column("bkey").to_pylist(),
        partials.column("cust").to_pylist(),
        partials.column("cents").to_pylist(),
        partials.column("pos").to_pylist(),
    ):
        if pos == 0:
            off = cum.get(cu, 0)
            if off:
                corr[bk] = off
            cum[cu] = off + ce
        else:
            cum[cu] = cum.get(cu, 0) + ce

    def running_pass(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "running_cents": pa.array([], pa.int64()),
                }
            )
        cust = b.column("o_custkey").to_numpy()
        cents = b.column("cents").to_numpy()
        cs = np.cumsum(cents)
        new = np.ones(len(cust), bool)
        new[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(cust)))
        base = cs[starts] - cents[starts]  # cumsum before each group
        running = cs - np.repeat(base, counts)
        off = corr.get(b.column("skey")[0].as_py(), 0)
        if off:
            running[: counts[0]] += off
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "running_cents": pa.array(running, pa.int64()),
            }
        )

    out = sorted_ds.map_batches(running_pass, batch_format="pyarrow", batch_size=None)
    return _collect(out)


WINDOW_RUNNING_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM orders
"""


def revenue_by_nation(sf_dir: str):
    """Three-table join: lineitem x orders (hash join) with the
    customer->nation map broadcast — revenue by nation name."""
    import pyarrow.parquet as pq
    import ray

    cust = pq.read_table(_path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(_path(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    # pre-join the two dims on the driver (vectorized), broadcast the result
    cust_nation = pa.table(
        {
            "c_custkey": cust.column("c_custkey"),
            "n_name": _dim_lookup(
                cust.column("c_nationkey"),
                nation.column("n_nationkey").combine_chunks(),
                nation.column("n_name").combine_chunks(),
                default="",
            ),
        }
    ).combine_chunks()
    dim_ref = ray.put(cust_nation)

    def attach_nation(t: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "n_name": _dim_lookup(
                    t.column("o_custkey"),
                    dim.column("c_custkey").combine_chunks(),
                    dim.column("n_name").combine_chunks(),
                    default="",
                ),
            }
        )

    li = _rd().read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def li_rev(t: pa.Table) -> tuple[pa.Array, pa.Array]:
        rc = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), t.column("l_discount")),
                    ),
                    pa.scalar(100.0),
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return t.column("l_orderkey"), rc

    from ray.data.aggregate import Sum

    if _parquet_bytes(_path(sf_dir, "orders")) <= _broadcast_join_limit():
        # orders->nation map fits: pre-join on the driver, broadcast it, and
        # fold the fact scan into lookup + per-batch partial aggregation
        orders_t = pq.read_table(_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
        order_nation = pa.table(
            {
                "o_orderkey": orders_t.column("o_orderkey"),
                "n_name": _dim_lookup(
                    orders_t.column("o_custkey"),
                    cust_nation.column("c_custkey").combine_chunks(),
                    cust_nation.column("n_name").combine_chunks(),
                    default="",
                ),
            }
        ).combine_chunks()
        on_ref = ray.put(order_nation)

        def join_agg(t: pa.Table) -> pa.Table:
            d = ray.get(on_ref)
            ok, rc = li_rev(t)
            idx = pc.index_in(ok, value_set=d.column("o_orderkey").combine_chunks())
            tt = pa.table(
                {"n_name": pc.take(d.column("n_name").combine_chunks(), idx), "revenue_cents": rc}
            ).filter(pc.is_valid(idx))
            return _partial_sum_count(tt, ["n_name"], ["revenue_cents"], "n_items")

        out = (
            li.map_batches(join_agg, batch_format="pyarrow")
            .groupby("n_name")
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"), Sum("n_items", alias_name="n_items"))
        )
        return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)

    orders = _rd().read_parquet(_path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    orders = orders.map_batches(attach_nation, batch_format="pyarrow")
    li = li.map_batches(
        lambda t: pa.table(dict(zip(("l_orderkey", "revenue_cents"), li_rev(t)))),
        batch_format="pyarrow",
    )
    nparts = max(2, min(8, int(ray.cluster_resources().get("CPU", 8))))
    joined = li.join(orders, join_type="inner", num_partitions=nparts, on=("l_orderkey",))
    from ray.data.aggregate import Count

    out = joined.groupby("n_name").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"), Count(alias_name="n_items")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


REVENUE_BY_NATION_SQL = """
SELECT n.n_name AS n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def sample_fraction(sf_dir: str):
    """DETERMINISTIC ~10% sample: keep rows whose 64-bit hash of the fused
    (l_orderkey, l_linenumber) key is 0 mod 10 — reproducible across engines
    and reruns (what a 100 TB pipeline actually wants;
    ``Dataset.random_sample(seed=...)`` remains for seeded randomness but its
    RNG stream is engine-specific).  Fully vectorized: one fused int64 key +
    a numpy murmur-style finalizer that bit-exactly reproduces DuckDB's
    ``hash(BIGINT)``, so the SQL twin is a one-line predicate (no per-row
    Python, no md5)."""
    ds = _rd().read_parquet(_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber"])
    M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
    MUL = np.uint64(0xD6E8FEB86659FD93)

    def keep(t: pa.Table) -> pa.Table:
        key = (
            t.column("l_orderkey").to_numpy().astype(np.int64) * np.int64(100000)
            + t.column("l_linenumber").to_numpy().astype(np.int64)
        )
        # DuckDB's hash(BIGINT) = murmur64 finalizer over the two's-complement bits
        x = key.view(np.uint64).copy()
        x ^= x >> np.uint64(32)
        x = (x * MUL) & M64
        x ^= x >> np.uint64(32)
        x = (x * MUL) & M64
        x ^= x >> np.uint64(32)
        return t.filter(pa.array(x % np.uint64(10) == 0))

    n = ds.map_batches(keep, batch_format="pyarrow").count()
    return pa.table({"sampled_rows": pa.array([n], pa.int64())})


SAMPLE_FRACTION_SQL = """
SELECT count(*) AS sampled_rows FROM lineitem
WHERE hash(l_orderkey * 100000 + l_linenumber) % 10 = 0
"""


QUERIES.update(
    {
        "asof_join_orders": asof_join_orders,
        "window_running_revenue": window_running_revenue,
        "revenue_by_nation": revenue_by_nation,
        "sample_fraction": sample_fraction,
    }
)
ORACLE_SQL.update(
    {
        "asof_join_orders": ASOF_JOIN_SQL,
        "window_running_revenue": WINDOW_RUNNING_SQL,
        "revenue_by_nation": REVENUE_BY_NATION_SQL,
        "sample_fraction": SAMPLE_FRACTION_SQL,
        "ann_ivf_topk": ANN_IVF_TOPK_SQL,
        "media_features": MEDIA_FEATURES_SQL,
        "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    }
)


def json_props_stats(sf_dir: str):
    """JSON scalar extraction (training-data op): extract ``props.k`` and
    aggregate per event_type.  Vectorized via ``pc.extract_regex`` (a single
    scalar key needs no full JSON parse); rows without the key yield null."""
    ds = _rd().read_parquet(_path(sf_dir, "events"), columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k"\s*:\s*(?P<k>-?\d+)')
        ks = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": ks})

    from ray.data.aggregate import Count, Max, Min, Sum

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"),
            Max("k", alias_name="max_k"),
            Count(alias_name="n"),
        )
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    import pyarrow.compute as _pc

    return t.set_column(
        t.column_names.index("sum_k"), "sum_k", _pc.cast(t.column("sum_k"), pa.int64())
    )


JSON_PROPS_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


def value_quantiles(sf_dir: str):
    """Exact quantiles of event value via a DISTRIBUTED value-count
    histogram: per-batch ``pc.value_counts`` (combiner) -> groupby(cents)
    sum -> only the (distinct value, count) histogram reaches the driver.
    The integer-cents domain is bounded, so the histogram stays small at any
    row count; quantiles are nearest-rank over the cumulative counts."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(_path(sf_dir, "events"), columns=["value"])

    def cents_counts(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(t.column("value"), pa.scalar(100.0)), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        vc = pc.value_counts(c)
        return pa.table(
            {"cents": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    hist = (
        ds.map_batches(cents_counts, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("n", alias_name="n"))
    )
    ht = pa.concat_tables(hist.iter_batches(batch_size=65536, batch_format="pyarrow"))
    vals = ht.column("cents").to_numpy()
    counts = ht.column("n").to_numpy()
    order = np.argsort(vals)
    vals, counts = vals[order], counts[order]
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0

    def q(p):
        # nearest-rank (type-1) quantile: deterministic on integers
        import math

        rank = max(1, math.ceil(p * total))
        return int(vals[np.searchsorted(cum, rank)])

    return pa.table(
        {
            "q25": pa.array([q(0.25)], pa.int64()),
            "q50": pa.array([q(0.50)], pa.int64()),
            "q75": pa.array([q(0.75)], pa.int64()),
            "q99": pa.array([q(0.99)], pa.int64()),
        }
    )


VALUE_QUANTILES_SQL = """
WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events)
SELECT CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(cents, 0.50) AS BIGINT) AS q50,
       CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q75,
       CAST(quantile_disc(cents, 0.99) AS BIGINT) AS q99
FROM c
"""

QUERIES.update({"json_props_stats": json_props_stats, "value_quantiles": value_quantiles})
ORACLE_SQL.update({"json_props_stats": JSON_PROPS_SQL, "value_quantiles": VALUE_QUANTILES_SQL})


def region_nations(sf_dir: str):
    """Dim-dim broadcast join: nations per region (covers region+nation)."""
    import pyarrow.parquet as pq

    region = pq.read_table(_path(sf_dir, "region")).combine_chunks()
    rkeys = region.column("r_regionkey").combine_chunks()
    rnames = region.column("r_name").combine_chunks()
    ds = _rd().read_parquet(_path(sf_dir, "nation"), columns=["n_name", "n_regionkey"])

    def attach(t: pa.Table) -> pa.Table:
        rn = _dim_lookup(t.column("n_regionkey"), rkeys, rnames, default="")
        return pa.table({"r_name": rn, "n_name": t.column("n_name")})

    from ray.data.aggregate import Count

    out = ds.map_batches(attach, batch_format="pyarrow").groupby("r_name").aggregate(
        Count(alias_name="n_nations")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


REGION_NATIONS_SQL = """
SELECT r.r_name AS r_name, count(*) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def supplier_balances(sf_dir: str):
    """Supplier account balances by nation (covers supplier)."""
    ds = _rd().read_parquet(_path(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(t.column("s_acctbal"), pa.scalar(100.0)), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table({"s_nationkey": t.column("s_nationkey"), "bal_cents": c})

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby("s_nationkey")
        .aggregate(Sum("bal_cents", alias_name="total_bal_cents"), Count(alias_name="n_suppliers"))
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(
        t.column_names.index("total_bal_cents"),
        "total_bal_cents",
        pc.cast(t.column("total_bal_cents"), pa.int64()),
    )


SUPPLIER_BALANCES_SQL = """
SELECT s_nationkey,
       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_bal_cents,
       count(*) AS n_suppliers
FROM supplier GROUP BY s_nationkey
"""


def parts_by_brand(sf_dir: str):
    """Part stats by brand (covers part): count, avg size, max retail cents."""
    ds = _rd().read_parquet(
        _path(sf_dir, "part"), columns=["p_brand", "p_size", "p_retailprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(t.column("p_retailprice"), pa.scalar(100.0)), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table(
            {
                "p_brand": t.column("p_brand"),
                "p_size": pc.cast(t.column("p_size"), pa.int64()),
                "price_cents": c,
            }
        )

    from ray.data.aggregate import Count, Max, Sum

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("p_size", alias_name="total_size"),
            Max("price_cents", alias_name="max_price_cents"),
        )
    )
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return t.set_column(
        t.column_names.index("total_size"), "total_size", pc.cast(t.column("total_size"), pa.int64())
    )


PARTS_BY_BRAND_SQL = """
SELECT p_brand, count(*) AS n_parts,
       CAST(sum(p_size) AS BIGINT) AS total_size,
       max(CAST(round(p_retailprice * 100) AS BIGINT)) AS max_price_cents
FROM part GROUP BY p_brand
"""

QUERIES.update(
    {
        "region_nations": region_nations,
        "supplier_balances": supplier_balances,
        "parts_by_brand": parts_by_brand,
    }
)
ORACLE_SQL.update(
    {
        "region_nations": REGION_NATIONS_SQL,
        "supplier_balances": SUPPLIER_BALANCES_SQL,
        "parts_by_brand": PARTS_BY_BRAND_SQL,
    }
)
