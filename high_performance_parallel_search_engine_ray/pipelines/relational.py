"""Relational query pipelines over the TPC-H-ish test tables.

Each function takes ``sf_dir`` and returns a Ray Dataset whose column names
match the DuckDB oracle SQL in ``__ray_entry__.oracle_sql`` exactly (the
driver's compare sorts columns by name and hashes values).

Engine patterns exercised (SURVEY.md §2.4/§2.5/§2.6 mapping):
- column-pruned reads (``columns=[...]``)
- vectorized filter/compute in map_batches (pyarrow.compute)
- partial aggregation inside map_batches before the groupby shuffle
- broadcast-small-side joins (dimension dicts via ray.put)
- sort + limit top-k with deterministic tie-breaks
- groupby().map_groups for window/running/sessionize semantics

Float policy: money sums round(2), ratios/averages/revenues round(6) on BOTH
sides, so cross-engine summation-order noise stays below the rounding grain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.distinct import distinct_values
from ..functions.rounding import round_half_away


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no data read."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


# Build sides at or below this row count broadcast (bounded driver pull +
# ray.put once); above it they hash-shuffle join. Tests set this to 0 to
# force the shuffle path (scale-path equivalence).
BROADCAST_THRESHOLD = 2_000_000


def _attach_or_join(
    fact,
    fact_key: str,
    dim,
    dim_key: str,
    value_cols: list[str],
    npart: int,
    broadcast_threshold: int | None = None,
    launder_fact: bool = False,
    dim_count_hint: int | None = None,
):
    """Cost-based inner join of ``dim`` (unique ``dim_key`` + ``value_cols``)
    onto ``fact``: broadcast when the build side is provably small, hash
    shuffle otherwise — the standard engine join selection, which is also
    what keeps these queries both scale-correct AND fast at bench scale.

    - dim.count() <= broadcast_threshold: the dim is pulled ONCE (bounded by
      the threshold constant — NOT an unbounded driver materialization),
      sorted by key, ray.put once, and each fact batch resolves keys with a
      vectorized np.searchsorted (semi-join when value_cols is empty).
      A Ray JoinOperator costs ~1.5-2s of aggregator-pool spin-up per join
      per execution (measured, 600k x 30k rows), so small builds are pure
      overhead on the shuffle path.
    - larger: Dataset.join hash shuffle — the only shape that works when
      the build side is fact-scale (e.g. customer at sf100+). Pass
      launder_fact=True when ``fact`` is a groupby/aggregate output (see
      top_customers docstring for the Acero empty-partition quirk).
    Output: fact columns (fact_key kept) + value_cols.
    """
    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD
    if dim_count_hint is None:
        # derived dims are consumed twice (count + pull/join) -> pin blocks
        dim = dim.materialize()
        n_dim = dim.count()
    else:
        # caller knows the size (parquet footer metadata) -> single pass
        n_dim = dim_count_hint
    if n_dim <= broadcast_threshold:
        pdf = dim.to_pandas()
        keys = pdf[dim_key].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        vals = {c: pdf[c].to_numpy()[order] for c in value_cols}
        ref = ray.put((keys, vals))

        def attach(b: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            bk = b[fact_key].to_numpy()
            idx = np.searchsorted(k, bk)
            idx_c = np.minimum(idx, max(len(k) - 1, 0))
            valid = (k[idx_c] == bk) if len(k) else np.zeros(len(bk), bool)
            t = b.filter(pa.array(valid))
            sel = idx_c[valid]
            for c in value_cols:
                t = t.append_column(c, pa.array(v[c][sel]))
            return t

        return fact.map_batches(attach, batch_format="pyarrow")
    if launder_fact:
        fact = fact.repartition(npart)
    return fact.join(
        dim, join_type="inner", num_partitions=npart,
        on=(fact_key,), right_on=(dim_key,),
    )


def _join_partitions(n_joins: int = 1) -> int:
    """Partition count for Dataset.join, sized to the cluster.

    Each JoinOperator keeps a hash-shuffle aggregator pool of roughly
    ``num_partitions`` actors (~0.25 CPU each) alive for the whole plan; in
    a chained plan ALL join pools are live concurrently, and oversubscribing
    them deadlocks the streaming executor (measured: 2 joins x 32 partitions
    on 8 CPUs hangs; 2 x 16 completes). Pass the number of joins in the
    plan so the pools, together, fit the cluster. On a real multi-node
    cluster this scales with total CPUs automatically.
    """
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus // max(1, n_joins))


def _agg_rename(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """Rename pa.TableGroupBy.aggregate outputs BY NAME ('col_sum',
    'count_all', ...) — the key/aggregate column ORDER is
    pyarrow-version-dependent, so positional rename_columns is unsafe."""
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


def _cast_ts_us(ds, cols: list[str]):
    """Normalize timestamp key columns to timestamp[us]: Ray's sort/groupby
    path can downcast to [s], and while pandas compares Timestamps equal
    across units, keeping the oracle's exact dtype removes a hash-compare
    risk class."""

    def cb(b: pa.Table) -> pa.Table:
        for c in cols:
            b = b.set_column(
                b.schema.get_field_index(c), c, b[c].cast(pa.timestamp("us"))
            )
        return b

    return ds.map_batches(cb, batch_format="pyarrow")


def _round_cols(ds, spec: dict[str, int]):
    def rb(b: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            b = b.set_column(
                b.schema.get_field_index(col), col, round_half_away(b[col], nd)
            )
        return b

    return ds.map_batches(rb, batch_format="pyarrow")


# -- Q1-style pricing summary ----------------------------------------------

def pricing_summary(sf_dir: str):
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        disc_price = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": b["l_quantity"],
                "price": b["l_extendedprice"],
                "disc_price": disc_price,
                "disc": b["l_discount"],
            }
        )
        # partial aggregation inside the batch -> tiny groupby shuffle
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"),
                ("price", "sum"),
                ("disc_price", "sum"),
                ("disc", "sum"),
                ([], "count_all"),
            ]
        )
        return _agg_rename(
            agg,
            {"qty_sum": "sum_qty", "price_sum": "sum_price",
             "disc_price_sum": "sum_disc_price", "disc_sum": "sum_disc",
             "count_all": "n"},
        )

    from ray.data.aggregate import Sum

    partials = li.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("n", alias_name="count_order"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        # Averages divide the ALREADY-ROUNDED sums: the rounded sums are
        # bit-identical across engines (rounding absorbs summation-order
        # noise), so quotient + round are too. The oracle SQL mirrors this.
        n = b["count_order"].to_numpy().astype(np.float64)
        sq = round_half_away(b["sum_qty"], 2)
        sp = round_half_away(b["sum_base_price"], 2)
        sd = round_half_away(b["sum_disc"], 6)
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": sq,
                "sum_base_price": sp,
                "sum_disc_price": round_half_away(b["sum_disc_price"], 2),
                "avg_qty": pa.array(
                    round_half_away(sq.to_numpy() / n, 6), pa.float64()
                ),
                "avg_price": pa.array(
                    round_half_away(sp.to_numpy() / n, 6), pa.float64()
                ),
                "avg_disc": pa.array(
                    round_half_away(sd.to_numpy() / n, 6), pa.float64()
                ),
                "count_order": b["count_order"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- Q3-style: top revenue orders for one segment --------------------------

def top_revenue_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10):
    """Q3 shape as two semi-joins (customer-segment keys onto orders, then
    segment-order keys onto lineitem revenue partials) via _attach_or_join:
    customer and orders are FACT-scale, so neither is ever collected to the
    driver beyond the bounded broadcast threshold — past it the plan is two
    distributed hash-shuffle joins.

    NOTE (Ray 2.49 quirk, shuffle path): JoinOperator partitions fed only
    by blocks from a sort-based AllToAll (groupby aggregate / map_groups)
    can come up empty-with-no-schema and Acero rejects the join; inputs
    here are read/map_batches outputs, which shuffle cleanly. Aggregate
    outputs need launder_fact=True (see top_customers).
    """
    npart = _join_partitions(n_joins=2)
    cust_keys = (
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .filter(expr=f"c_mktsegment == '{segment}'")
        .map_batches(lambda b: b.select(["c_custkey"]), batch_format="pyarrow")
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    seg_orders = _attach_or_join(
        orders, "o_custkey", cust_keys, "c_custkey", [], npart
    ).map_batches(lambda b: b.select(["o_orderkey"]), batch_format="pyarrow")

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        part = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})
        return _agg_rename(
            part.group_by(["l_orderkey"]).aggregate([("rev", "sum")]),
            {"rev_sum": "rev"},
        )

    from ray.data.aggregate import Sum

    revs = (
        _attach_or_join(
            li.map_batches(rev_partial, batch_format="pyarrow"),
            "l_orderkey", seg_orders, "o_orderkey", [], npart,
        )
        .map_batches(
            lambda b: b.rename_columns(
                ["o_orderkey" if c == "l_orderkey" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        .groupby("o_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    out = _round_cols(revs, {"revenue": 6})
    return out.sort(["revenue", "o_orderkey"], descending=[True, False]).limit(k)


# -- Q5-style: revenue by nation within a region ---------------------------

def region_nation_revenue(sf_dir: str, region: str = "ASIA"):
    """Q5 shape. nation/region are TRUE dimensions (25/5 rows) and stay
    broadcast; customer and orders are fact-scale and flow through
    _attach_or_join (bounded broadcast below the threshold, distributed
    hash-shuffle join above) — nothing unbounded ever reaches the driver.

    Dataflow: customer --(broadcast nation filter+decode)--> (c_custkey,
    n_name) --attach/join orders--> (o_orderkey, n_name) --attach/join
    lineitem rev partials--> groupby(n_name).sum.
    """
    npart = _join_partitions(n_joins=2)
    nat = {
        r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
        for r in _read(sf_dir, "nation").take_all()
    }
    reg = {r["r_regionkey"]: r["r_name"] for r in _read(sf_dir, "region").take_all()}
    rkeys = {k for k, v in reg.items() if v == region}
    region_nations = {k: name for k, (name, rk) in nat.items() if rk in rkeys}
    nk_arr = pa.array(sorted(region_nations), pa.int64())
    nm_arr = pa.array([region_nations[k] for k in sorted(region_nations)], pa.string())

    def cust_nation(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["c_nationkey"], value_set=nk_arr)
        t = pa.table({"c_custkey": b["c_custkey"], "idx": idx}).filter(
            pc.is_valid(idx)
        )
        return pa.table(
            {"c_custkey": t["c_custkey"], "n_name": pc.take(nm_arr, t["idx"])}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_nation, batch_format="pyarrow"
    )
    order_nation = _attach_or_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        "o_custkey", cust, "c_custkey", ["n_name"], npart,
    ).map_batches(
        lambda b: b.select(["o_orderkey", "n_name"]), batch_format="pyarrow"
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def rev_partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        part = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})
        return _agg_rename(
            part.group_by(["l_orderkey"]).aggregate([("rev", "sum")]),
            {"rev_sum": "rev"},
        )

    from ray.data.aggregate import Sum

    agg = (
        _attach_or_join(
            li.map_batches(rev_partial, batch_format="pyarrow"),
            "l_orderkey", order_nation, "o_orderkey", ["n_name"], npart,
        )
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    return _round_cols(agg, {"revenue": 2})


# -- top customers by order total ------------------------------------------

def top_customers(sf_dir: str, k: int = 10):
    """Per-customer order totals joined to the (fact-scale) customer table
    via _attach_or_join. On the shuffle path the groupby output needs a
    repartition() laundering hop (launder_fact=True): JoinOperator hash
    partitions fed only by sort-based AllToAll blocks can be
    empty-with-no-schema, which Acero rejects (see top_revenue_orders
    docstring)."""
    from ray.data.aggregate import Count, Sum

    npart = _join_partitions(n_joins=1)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    agg = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spent"),
        Count(alias_name="n_orders"),
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = _attach_or_join(
        agg, "o_custkey", cust, "c_custkey", ["c_name"], npart,
        launder_fact=True, dim_count_hint=_table_rows(sf_dir, "customer"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "c_name": b["c_name"],
                "total_spent": round_half_away(b["total_spent"], 2),
                "n_orders": b["n_orders"],
            }
        )

    out = joined.map_batches(finalize, batch_format="pyarrow")
    return out.sort(["total_spent", "o_custkey"], descending=[True, False]).limit(k)


# -- events: tumbling hourly window ----------------------------------------

def events_hourly(sf_dir: str):
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour")
        t = pa.table({"hour": hour, "event_type": b["event_type"], "value": b["value"]})
        return _agg_rename(
            t.group_by(["hour", "event_type"]).aggregate(
                [("value", "sum"), ([], "count_all")]
            ),
            {"value_sum": "sum_value", "count_all": "n_events"},
        )

    from ray.data.aggregate import Sum

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_events", alias_name="n_events"),
        )
    )
    return _cast_ts_us(_round_cols(agg, {"sum_value": 6}), ["hour"])


# -- partition-grouped per-entity processing ---------------------------------

# Per-entity map_groups (one pandas call per user/customer) pays Ray's
# ~1-2 ms-per-group setup — billions of entities at design scale makes that
# the dominant cost (same lesson as the LSH stages in pipelines/dedup.py).
# These helpers group by a BOUNDED hash partition instead and vectorize over
# ALL entities of the partition inside one pandas/numpy call.
_ENTITY_PARTS = 64


def _with_part(ds, key: str):
    """Append part = hash(key) % _ENTITY_PARTS (deterministic fixed-key
    siphash via pd.util.hash_array; works for int and string keys)."""

    def add_part(b: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_array(
                b[key].to_numpy(zero_copy_only=False), categorize=False
            )
            % _ENTITY_PARTS
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    return ds.map_batches(add_part, batch_format="pyarrow")


def _by_partition(ds, key: str, part_fn):
    """groupby(bounded partition).map_groups(part_fn) — part_fn sees every
    entity of its partition at once (sorted by caller) and must drop the
    'part' column from its output."""
    return _with_part(ds, key).groupby("part").map_groups(
        part_fn, batch_format="pandas"
    )


# -- events: per-user stats -------------------------------------------------

def user_stats(sf_dir: str):
    from ray.data.aggregate import Count, Max, Sum

    ev = _read(sf_dir, "events", ["user_id", "value"])
    agg = ev.groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Max("value", alias_name="max_value"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        sv = round_half_away(b["sum_value"], 6)
        n = b["n_events"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "n_events": b["n_events"],
                "sum_value": sv,
                "avg_value": pa.array(
                    round_half_away(sv.to_numpy() / n, 6), pa.float64()
                ),
                "max_value": round_half_away(b["max_value"], 6),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- events: sessionization (30-min gap) ------------------------------------

def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Per user: number of sessions and largest session (event count), where
    a new session starts when the gap to the previous event exceeds
    ``gap_minutes``. Partition-grouped streaming-window idiom: every user
    of a partition is processed in ONE vectorized pass (sort by (user, ts),
    session starts = user boundary OR gap, session ids by cumsum, per-user
    rollup via a C-speed pandas groupby) — no per-user pandas call. The
    oracle is a SQL window over lag()."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000

    def sess_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = g["user_id"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = users[1:] != users[:-1]
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        sess_id = np.cumsum(new_user | (gap > gap_us))
        df = pd.DataFrame({"user_id": users, "sess_id": sess_id})
        sizes = df.groupby(["user_id", "sess_id"], sort=False).size()
        out = sizes.groupby(level=0, sort=False).agg(["count", "max"])
        return pd.DataFrame(
            {
                "user_id": out.index.to_numpy(),
                "n_sessions": out["count"].to_numpy().astype(np.int64),
                "max_session_events": out["max"].to_numpy().astype(np.int64),
            }
        )

    return _by_partition(ev, "user_id", sess_part)


# -- running totals per customer (window function analog) -------------------

def running_order_totals(sf_dir: str, max_customers: int = 200):
    """Cumulative o_totalprice per customer ordered by (o_orderdate,
    o_orderkey), limited to custkey < max_customers to keep the check
    focused. SQL oracle: SUM() OVER (PARTITION BY ... ORDER BY ...)."""
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ).filter(expr=f"o_custkey < {max_customers}")

    def running_part(g: pd.DataFrame) -> pd.DataFrame:
        # all customers of the partition in one pass: per-customer cumsum
        # via the C-speed pandas groupby (no per-customer call)
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        rt = g.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].to_numpy(),
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "running_total": round_half_away(rt.to_numpy(), 6),
            }
        )

    return _by_partition(orders, "o_custkey", running_part)


# -- simple scans / distinct / counts ---------------------------------------

def segment_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return (
        _read(sf_dir, "customer", ["c_mktsegment"])
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"))
    )


def distinct_brands(sf_dir: str):
    # distinct_values, NOT Dataset.unique() (empty-block crash; see
    # functions/distinct.py)
    vals = distinct_values(_read(sf_dir, "part", ["p_brand"]), "p_brand")
    return rd.from_arrow(pa.table({"p_brand": pa.array(vals, pa.string())}))


def high_value_orders(sf_dir: str, min_price: float = 400000.0, k: int = 20):
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]
    )
    out = orders.map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], min_price)),
        batch_format="pyarrow",
    )
    return out.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def supplier_part_join(sf_dir: str):
    """Per supplier nation, count of distinct part brands supplied (via
    lineitem l_partkey/l_suppkey). nation is a TRUE dimension (25 rows,
    broadcast dict); supplier and part are fact-scale at high SF, so both
    lookups go through _attach_or_join (bounded broadcast here, hash
    shuffle past the threshold)."""
    nat_rows = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    nat_ref = ray.put(
        (pa.array([r["n_nationkey"] for r in nat_rows]),
         pa.array([r["n_name"] for r in nat_rows]))
    )
    npart = _join_partitions(n_joins=2)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    li = _attach_or_join(
        li, "l_suppkey",
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey", ["s_nationkey"], npart,
        dim_count_hint=_table_rows(sf_dir, "supplier"),
    )
    li = _attach_or_join(
        li, "l_partkey",
        _read(sf_dir, "part", ["p_partkey", "p_brand"]),
        "p_partkey", ["p_brand"], npart,
        dim_count_hint=_table_rows(sf_dir, "part"),
    )

    def attach(b: pa.Table) -> pa.Table:
        # vectorized dim lookup: index_in + take (no per-row Python on the
        # fact-scale lineitem batches)
        nkeys, nnames = ray.get(nat_ref)
        idx = pc.index_in(b["s_nationkey"], value_set=nkeys)
        t = pa.table({"n_name": pc.take(nnames, idx), "p_brand": b["p_brand"]})
        # in-batch distinct before the shuffle
        return t.group_by(["n_name", "p_brand"]).aggregate([])

    from ray.data.aggregate import Count

    pairs = li.map_batches(
        lambda b: attach(b.select(["s_nationkey", "p_brand"])),
        batch_format="pyarrow",
    )
    # in-batch distinct above -> tiny groupby dedupes globally -> count per
    # nation. Two cheap shuffles over distinct pairs, no pandas per group.
    distinct_pairs = pairs.groupby(["n_name", "p_brand"]).aggregate(
        Count(alias_name="_n")
    )
    return distinct_pairs.groupby("n_name").aggregate(Count(alias_name="n_brands"))


def order_priority_share(sf_dir: str):
    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", ["o_orderpriority"])
    total = orders.count()
    agg = orders.groupby("o_orderpriority").aggregate(Count(alias_name="n"))

    def share(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy().astype(np.float64)
        return b.append_column(
            "share", pa.array(round_half_away(n / total, 6), pa.float64())
        )

    return agg.map_batches(share, batch_format="pyarrow")


# -- semi-structured: JSON props column -------------------------------------

def events_props_sum(sf_dir: str):
    """Parse the events.props JSON strings and aggregate the embedded 'k'
    metric per event_type (semi-structured extraction inside map_batches;
    oracle uses DuckDB json_extract). The fixed '$.k' integer shape is
    extracted with a vectorized RE2 kernel — no per-row json.loads on the
    fact table; rows whose props lack an integer k fall back to the exact
    per-row parse (none in the test corpus, but JSON floats/strings must
    not silently mis-extract at scale)."""
    import json as _json

    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        hit = pc.extract_regex(b["props"], pattern=r'"k"\s*:\s*(?P<k>-?\d+)\s*[,}]')
        ks = pc.struct_field(hit, "k")
        if ks.null_count:
            miss = pc.is_null(ks).to_numpy(zero_copy_only=False)
            vals = ks.to_pylist()
            props = b["props"].to_pylist()
            for i in np.flatnonzero(miss):
                vals[i] = int(_json.loads(props[i])["k"])
            k_arr = pa.array([int(v) for v in vals], pa.int64())
        else:
            k_arr = pc.cast(ks, pa.int64())
        return pa.table({"event_type": b["event_type"], "k": k_arr})

    return (
        ev.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )


# -- set op: nations present on both customer and supplier sides ------------

def customer_supplier_nations(sf_dir: str):
    """INTERSECT: nations that have at least one customer AND one supplier
    (broadcast both distinct key sets; no shuffle)."""
    cust_nk = set(
        distinct_values(_read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey")
    )
    supp_nk = set(
        distinct_values(_read(sf_dir, "supplier", ["s_nationkey"]), "s_nationkey")
    )
    both = cust_nk & supp_nk
    nat = _read(sf_dir, "nation")
    return nat.map_batches(
        lambda b: b.filter(
            pc.is_in(b["n_nationkey"], value_set=pa.array(sorted(both)))
        ).select(["n_nationkey", "n_name"]),
        batch_format="pyarrow",
    )


# -- window: top-k events per user ------------------------------------------

def top_events_per_user(sf_dir: str, k: int = 3):
    """The ROW_NUMBER() OVER (PARTITION BY user ORDER BY value DESC) <= k
    pattern as groupby().map_groups (deterministic tie-break event_id)."""
    ev = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        # all users of the partition in one sort; per-user head(k) + rank
        # via cumcount (C-speed groupby, no per-user pandas call)
        g = g.sort_values(
            ["user_id", "value", "event_id"], ascending=[True, False, True],
            kind="stable",
        )
        g = g.copy()
        g["rank"] = g.groupby("user_id", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return g[["user_id", "event_id", "value", "rank"]]

    return _by_partition(ev, "user_id", topk_part)


# -- sliding window over events ---------------------------------------------

def events_sliding(sf_dir: str, window_min: int = 60, slide_min: int = 15):
    """Sliding-window counts: each event belongs to window_min/slide_min
    windows; Ray expands events to their windows inside map_batches (the
    classic stream expansion), then a partial-agg groupby. Window start is
    the slide-aligned timestamp. Oracle: generate_series range join."""
    from ray.data.aggregate import Count, Sum

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])
    n_windows = window_min // slide_min

    def expand(b: pa.Table) -> pa.Table:
        import numpy as np

        ts = b["ts"].to_numpy()  # datetime64[us]
        slide = np.timedelta64(slide_min * 60_000_000, "us")
        base = ts.astype("datetime64[us]").astype("int64")
        slide_us = slide_min * 60_000_000
        aligned = (base // slide_us) * slide_us
        parts = []
        for k in range(n_windows):
            start = aligned - k * slide_us
            parts.append(
                pa.table(
                    {
                        "window_start": pa.array(
                            start.astype("datetime64[us]"), pa.timestamp("us")
                        ),
                        "event_type": b["event_type"],
                        "value": b["value"],
                    }
                )
            )
        t = pa.concat_tables(parts)
        return _agg_rename(
            t.group_by(["window_start", "event_type"]).aggregate(
                [("value", "sum"), ([], "count_all")]
            ),
            {"value_sum": "sum_value", "count_all": "n_events"},
        )

    agg = (
        ev.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("sum_value", alias_name="sum_value"),
            Sum("n_events", alias_name="n_events"),
        )
    )
    return _cast_ts_us(_round_cols(agg, {"sum_value": 6}), ["window_start"])


# -- as-of join: last signup before each event ------------------------------

def events_asof_signup(sf_dir: str):
    """For every event, the most recent 'signup' event of the same user at
    or before it (NULL when none): the as-of join pattern as ordered
    per-user map_groups with a forward-fill. Oracle: correlated max()."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    epoch = pd.Timestamp("1970-01-01")

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        # all users of the partition in one pass. Signup rows sort BEFORE
        # other events at an equal ts so the ffill sees them — the oracle's
        # `s.ts <= e.ts` includes same-instant signups regardless of
        # event_id order. The ffill is global over the (user, ts)-sorted
        # frame but masked to reset at user boundaries.
        g = g.copy()
        g["_not_signup"] = (g["event_type"] != "signup").astype(int)
        g = g.sort_values(["user_id", "ts", "_not_signup", "event_id"],
                          kind="stable")
        sign_ts = g["ts"].where(g["event_type"] == "signup")
        filled = sign_ts.ffill()
        # reset per user: positions before a user's first signup must not
        # inherit the previous user's fill
        users = g["user_id"].to_numpy()
        has_signup = (
            (g["event_type"] == "signup").groupby(users, sort=False).cummax()
        )
        # no-signup-yet -> epoch sentinel (nulls hash inconsistently across
        # engines; the oracle COALESCEs identically)
        g["last_signup_ts"] = filled.where(
            has_signup.to_numpy(), other=epoch
        ).fillna(epoch)
        return g[["event_id", "user_id", "last_signup_ts"]]

    return _by_partition(ev, "user_id", asof_part)


# -- lineitem monthly shipping summary (Q12-ish temporal rollup) -------------

def shipping_monthly(sf_dir: str):
    """Per ship month: line count, sum qty, revenue. Partial aggregation
    inside map_batches (floor_temporal month bucketing) before a tiny
    groupby — the temporal-rollup pattern at fact scale."""
    li = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return _monthly_rollup(li)


def _monthly_rollup(li):
    """(ship_month, sum_qty, revenue, n_lines) rollup shared by
    `shipping_monthly` (full scan) and `partitioned_pruned_revenue`
    (partition-pruned scan) — one kernel so the two can never drift."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        month = pc.floor_temporal(b["l_shipdate"], unit="month")
        # integer ten-thousandths of currency: per-line rounding matches the
        # oracle bit-for-bit and int64 summation is ASSOCIATIVE, so the
        # many-group revenue sums can't flip at a 2dp rounding boundary
        # from cross-engine summation order (83 monthly groups make that
        # boundary hit likely with double sums).
        rev4 = round_half_away(
            pc.multiply(
                pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])),
                10000.0,
            ).to_numpy(),
            0,
        ).astype(np.int64)
        t = pa.table(
            {
                "ship_month": month,
                "qty": b["l_quantity"],
                "rev4": pa.array(rev4, pa.int64()),
            }
        )
        return _agg_rename(
            t.group_by(["ship_month"]).aggregate(
                [("qty", "sum"), ("rev4", "sum"), ([], "count_all")]
            ),
            {"qty_sum": "sum_qty", "rev4_sum": "rev4", "count_all": "n_lines"},
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("ship_month")
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("rev4", alias_name="rev4"),
            Sum("n_lines", alias_name="n_lines"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ship_month": b["ship_month"].cast(pa.timestamp("us")),
                "sum_qty": round_half_away(b["sum_qty"], 2),
                "revenue": pa.array(
                    round_half_away(
                        b["rev4"].to_numpy().astype(np.float64) / 10000.0, 2
                    ),
                    pa.float64(),
                ),
                "n_lines": b["n_lines"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def partitioned_pruned_revenue(
    sf_dir: str,
    months: tuple = ("1995-03", "1995-04", "1995-05"),
    out_dir: str | None = None,
):
    """Partitioned-write -> pruned-read roundtrip: lineitem is written as
    one parquet directory PER SHIP MONTH (the resumable-output layout —
    a failed 100-TB job re-runs only missing month dirs), then a month
    range is answered by reading ONLY those partitions' files with the
    column set pruned to the 4 needed — directory-level partition
    pruning plus column pruning, the 'prune at the read' rule made into
    an oracle-checked operator. The rollup kernel is shared with
    `shipping_monthly`, so equality against the WHERE-filtered SQL
    proves the pruned scan lost nothing."""
    import glob
    import os
    import shutil

    out_dir = out_dir or os.path.join(
        "/tmp", "hppse_li_monthly_" + os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(out_dir, ignore_errors=True)

    li = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def with_ym(b: pa.Table) -> pa.Table:
        ym = pc.strftime(b["l_shipdate"], format="%Y-%m")
        return b.append_column("ym", ym)

    li.map_batches(with_ym, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["ym"]
    )

    paths = [
        f
        for m in months
        for f in sorted(glob.glob(f"{out_dir}/ym={m}/*.parquet"))
    ]
    if not paths:
        return pa.schema(
            [
                ("ship_month", pa.timestamp("us")),
                ("sum_qty", pa.float64()),
                ("revenue", pa.float64()),
                ("n_lines", pa.int64()),
            ]
        ).empty_table()
    pruned = rd.read_parquet(
        paths,
        columns=["l_shipdate", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return _monthly_rollup(pruned)


# -- median retail price per brand (percentile aggregate) --------------------

def brand_median_price(sf_dir: str):
    """Per p_brand: median p_retailprice (linear interpolation — matches
    SQL quantile_cont). Ordered-group aggregate via groupby().map_groups."""
    part = _read(sf_dir, "part", ["p_brand", "p_retailprice"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": [g["p_brand"].iloc[0]],
                "median_price": [
                    round_half_away(float(g["p_retailprice"].quantile(0.5)), 6)
                ],
                "n_parts": [len(g)],
            }
        )

    return part.groupby("p_brand").map_groups(med, batch_format="pandas")


# -- orders above their customer's average (correlated-subquery shape) -------

def orders_above_cust_avg(sf_dir: str, factor: float = 1.5, k: int = 50):
    """Orders with o_totalprice > factor * their customer's average order
    price: per-customer aggregate attached back to the fact rows
    (_attach_or_join), vectorized predicate. The average divides the
    2dp-rounded sum so both engines compare the identical double (the
    pricing_summary float policy)."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    npart = _join_partitions(n_joins=1)
    avg = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="spent"), Count(alias_name="n")
    )

    def finalize_avg(b: pa.Table) -> pa.Table:
        sp = round_half_away(b["spent"], 2).to_numpy()
        n = b["n"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "c_key": b["o_custkey"],
                "cust_avg": pa.array(round_half_away(sp / n, 6), pa.float64()),
            }
        )

    cust_avg = avg.map_batches(finalize_avg, batch_format="pyarrow")
    joined = _attach_or_join(
        orders, "o_custkey", cust_avg, "c_key", ["cust_avg"], npart
    )

    def flag(b: pa.Table) -> pa.Table:
        mask = pc.greater(b["o_totalprice"], pc.multiply(b["cust_avg"], factor))
        return b.filter(mask)

    out = joined.map_batches(flag, batch_format="pyarrow")
    return out.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


# -- exact distinct users per day (two-level distinct aggregation) -----------

def distinct_users_daily(sf_dir: str):
    """COUNT(DISTINCT user_id) per day without shipping raw events twice:
    in-batch (day, user) distinct -> groupby dedup -> per-day count."""
    from ray.data.aggregate import Count

    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day")
        t = pa.table({"day": day, "user_id": b["user_id"]})
        return t.group_by(["day", "user_id"]).aggregate([])  # in-batch distinct

    pairs = ev.map_batches(partial, batch_format="pyarrow")
    distinct = pairs.groupby(["day", "user_id"]).aggregate(Count(alias_name="_n"))
    return _cast_ts_us(
        distinct.groupby("day").aggregate(Count(alias_name="n_users")), ["day"]
    )


# -- KMV distinct-count sketch (approximate; mergeable) ----------------------

def kmv_distinct_users(sf_dir: str, k: int = 1024):
    """Approximate COUNT(DISTINCT user_id) via a K-minimum-values sketch:
    each batch keeps its k smallest 64-bit user hashes (vectorized
    np.partition), partial sketches merge associatively in a final
    reduction, and the estimate is (k-1) / kth_min_normalized. Mergeability
    is what matters at 100 TB: the shuffle carries k hashes per block
    instead of the distinct set. Returns one row
    (estimate, exact_at_k_cutoff=n_hashes<k). Deterministic (stable hash);
    accuracy ~ 1/sqrt(k) (~3% at k=1024) — rows-only check + a pytest
    tolerance gate, no SQL oracle for the estimate itself."""
    from ..functions.hashing import stable_hash64

    ev = _read(sf_dir, "events", ["user_id"])

    def sketch_batch(b: pa.Table) -> pa.Table:
        users = b["user_id"].to_numpy(zero_copy_only=False)
        uniq = np.unique(users)
        hs = np.array(
            [stable_hash64(str(u)) for u in uniq], dtype=np.uint64
        )
        if hs.size > k:
            hs = np.partition(hs, k - 1)[:k]
        return pa.table({"h": pa.array(np.sort(hs), pa.uint64())})

    parts = ev.map_batches(sketch_batch, batch_format="pyarrow")
    # merge: k smallest of the union (small data — k per input block)
    merged = np.sort(
        np.unique(parts.to_pandas()["h"].to_numpy().astype(np.uint64))
    )
    if merged.size >= k:
        kth = merged[k - 1]
        est = (k - 1) / (float(kth) / float(2**64))
        exact = False
    else:
        est = float(merged.size)
        exact = True
    return pa.table(
        {
            "estimate": pa.array([round_half_away(est, 2)], pa.float64()),
            "is_exact": pa.array([exact], pa.bool_()),
        }
    )


# -- range join: events within a time window of each other -------------------

def events_nearby_counts(sf_dir: str, window_s: int = 300):
    """Per event: how many OTHER events of the same user fall within
    ±window_s seconds — the RANGE-JOIN pattern. Expressed as ordered
    per-user groups with a vectorized two-pointer (np.searchsorted over the
    sorted timestamp array), so the per-group cost is O(n log n) instead of
    the oracle's O(n^2) self-join. Partitioning assumption: one user's
    events fit one group (same as sessionize)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def nearby_part(g: pd.DataFrame) -> pd.DataFrame:
        # all users of the partition in ONE searchsorted pair: remap each
        # user's timestamps onto a disjoint segment of the number line
        # (user_index * stride, stride > span + window), so windows can
        # never cross users and no per-user loop is needed
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        w = window_s * 1_000_000
        codes, _ = pd.factorize(g["user_id"].to_numpy(), sort=False)
        ts0 = ts - ts.min()
        stride = int(ts0.max()) + 2 * w + 2
        virt = codes.astype(np.int64) * stride + ts0
        lo = np.searchsorted(virt, virt - w, side="left")
        hi = np.searchsorted(virt, virt + w, side="right")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "n_nearby": (hi - lo - 1).astype(np.int64),
            }
        )

    return _by_partition(ev, "user_id", nearby_part)


# -- exact distributed quantiles via value-count histogram --------------------

def grouped_quantiles_disc(
    ds,
    key_col: str,
    val_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9),
    out_names: tuple = ("q25", "q50", "q75", "q90"),
):
    """Per-``key_col`` EXACT discrete quantiles of ``val_col`` computed from
    a distributed value-count histogram — the scale path for quantiles over
    fact tables whose value domain is bounded (quantities, prices in cents,
    durations in ms: distinct values ≪ rows at 100 TB). Never sorts or
    shuffles the fact rows:

      1. per-block (key, val) counts inside map_batches (Arrow group_by);
      2. groupby-sum — the only shuffle, carrying distinct pairs;
      3. per-key assembly: sorted cumsum + pick the ceil(q*n)-th ordered
         element (DuckDB quantile_disc's rule, probed empirically), via
         map_groups over the per-key histograms.

    Contrast brand_median_price (ordered-group quantile_cont via full
    group pull): that is the small-table anchor; this is what survives a
    fact table. Output: one row per key, n_rows + one column per q."""
    import math

    def vc(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], val_col: b[val_col]})
        return t.group_by([key_col, val_col]).aggregate([([], "count_all")])

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(vc, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Sum("count_all", alias_name="cnt"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(val_col, kind="stable")
        cnt = g["cnt"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        out = {key_col: [g[key_col].iloc[0]], "n_rows": [n]}
        vals = g[val_col].to_numpy()
        for q, name in zip(qs, out_names):
            # DuckDB quantile_disc: 1-based ordered index ceil(q*n), same
            # double multiply so float edge cases land identically
            target = max(1, math.ceil(q * n))
            out[name] = [vals[np.searchsorted(cum, target, side="left")]]
        return pd.DataFrame(out)

    return hist.groupby(key_col).map_groups(pick, batch_format="pandas")


def quantity_quantiles(sf_dir: str):
    """Per l_returnflag discrete quantiles of l_quantity (bounded integer
    domain: the histogram carries ~|flags| x 50 pairs through the shuffle
    regardless of fact-table size)."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_quantiles_disc(li, "l_returnflag", "l_quantity")


# -- t-digest quantile sketch (approximate; mergeable) ------------------------

def _compress_centroids(vals, weights, compression: int):
    """Greedy size-capped centroid merge: sorted (value, weight) pairs fold
    left-to-right into at most ``compression`` centroids with uniform
    weight budget — a t-digest-lite whose accuracy suffices for corpus
    monitoring (tolerance-tested, not oracle-exact)."""
    order = np.argsort(vals, kind="stable")
    vals, weights = vals[order], weights[order]
    total = float(weights.sum())
    if total == 0 or len(vals) <= compression:
        return vals, weights
    budget = total / compression
    out_v, out_w = [], []
    cur_v, cur_w = float(vals[0]), float(weights[0])
    for v, w in zip(vals[1:], weights[1:]):
        if cur_w + w <= budget * 1.5:
            cur_v = (cur_v * cur_w + float(v) * float(w)) / (cur_w + float(w))
            cur_w += float(w)
        else:
            out_v.append(cur_v)
            out_w.append(cur_w)
            cur_v, cur_w = float(v), float(w)
    out_v.append(cur_v)
    out_w.append(cur_w)
    return np.asarray(out_v), np.asarray(out_w)


def tdigest_quantiles(
    ds,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    compression: int = 128,
):
    """One-row table of approximate quantiles of ``ds[col]`` via a
    mergeable centroid sketch — the third member of the engine's sketch
    family (KMV = distinct counts, Misra-Gries = heavy hitters, this =
    quantiles). Per-block sorted (value, count) centroids cap at
    ``compression`` entries; the driver merges n_blocks tiny sketches and
    re-compresses — no sort shuffle ever touches the data, and sketch size
    is independent of corpus size. Accuracy is tolerance-tested against
    the exact quantiles (block-partitioning sensitivity is inherent to
    mergeable digests and documented)."""

    def block_digest(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table(
                {"v": pa.array([], pa.float64()), "w": pa.array([], pa.float64())}
            )
        uniq, counts = np.unique(v, return_counts=True)
        cv, cw = _compress_centroids(uniq, counts.astype(np.float64), compression)
        return pa.table({"v": pa.array(cv), "w": pa.array(cw)})

    vals, weights = [], []
    for t in ds.map_batches(block_digest, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        vals.append(t["v"].to_numpy(zero_copy_only=False))
        weights.append(t["w"].to_numpy(zero_copy_only=False))
    v = np.concatenate(vals) if vals else np.array([])
    w = np.concatenate(weights) if weights else np.array([])
    if len(v) == 0:
        return pa.table({f"q{int(q*100)}": pa.array([], pa.float64()) for q in qs})
    v, w = _compress_centroids(v, w, compression)
    cum = np.cumsum(w) - w / 2.0
    cum /= w.sum()
    out = {}
    for q in qs:
        out[f"q{int(q * 100)}"] = pa.array(
            [float(np.interp(q, cum, v))], pa.float64()
        )
    return pa.table(out)


def price_histogram(
    sf_dir: str,
    nbins: int = 20,
    lo: float = 0.0,
    hi: float = 120000.0,
):
    """(bin, lo_edge, hi_edge, n): fixed-width histogram of
    lineitem.l_extendedprice — per-block np.bincount partials over the
    clamped bin index (out-of-range values land in the edge bins), then a
    tiny (bin, n) groupby-sum; only non-empty bins are emitted. The shuffle
    carries at most ``nbins`` rows per block — histogramming at 100 TB is
    a pure map plus a constant-size exchange. Bin math is plain double
    arithmetic in the same operation order as the SQL mirror."""
    from ray.data.aggregate import Sum

    span = float(hi) - float(lo)

    def partial(b: pa.Table) -> pa.Table:
        x = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        idx = np.floor((x - lo) * nbins / span).astype(np.int64)
        np.clip(idx, 0, nbins - 1, out=idx)
        counts = np.bincount(idx, minlength=nbins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )

    def edges(b: pa.Table) -> pa.Table:
        bins = b["bin"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "bin": b["bin"],
                "lo_edge": pa.array(lo + bins * span / nbins, pa.float64()),
                "hi_edge": pa.array(
                    lo + (bins + 1.0) * span / nbins, pa.float64()
                ),
                "n": b["n"],
            }
        )

    return agg.map_batches(edges, batch_format="pyarrow").sort("bin")


def cms_term_counts(
    docs,
    query_terms: list[str] | None = None,
    width: int = 2048,
    depth: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(term, est, true_cnt): count-min-sketch point estimates for
    ``query_terms`` (default: a fixed probe list), next to the exact
    counts so callers can see the one-sided error (CMS guarantees
    est >= true; overestimate bounded by e*N/width w.h.p.). Completes the
    mergeable-sketch family (KMV distinct, Misra-Gries heavy hitters,
    t-digest quantiles).

    Scale shape: each block folds its kept tokens into a depth x width
    int64 counter grid (vectorized np.add.at over row-hashed buckets),
    then emits only its NONZERO (cell, val) rows; a groupby-Sum over at
    most depth*width keys produces the merged sketch, and only that
    constant-size table reaches the driver — the vocabulary never
    shuffles, and driver traffic is independent of block count. The exact
    verification counts use a candidate-bounded is_in filter (probe-list
    sized), the same pattern as frequent_terms' verify pass."""
    from ..functions.hashing import token_hashes
    from .index import tokenize_batch

    if depth < 1 or depth > 8:
        raise ValueError("depth must be in [1, 8] (row-hash multiplier table)")
    if width < 1:
        raise ValueError("width must be positive")
    if query_terms is None:
        query_terms = ["hash", "table", "scan", "merge", "row"]
    qt = sorted(set(query_terms))

    # depth independent row hashes: re-mix the engine-standard token hash
    # with odd multipliers (uint64 array arithmetic — never scalar mod)
    mults = (
        np.array(
            [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
             0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
             0xC4CEB9FE1A85EC53, 0x9E3779B185EBCA87],
            np.uint64,
        )[: depth]
    )

    def grid_of(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        toks = t["term"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(toks, return_counts=True)
        grid = np.zeros((depth, width), np.int64)
        if len(uniq):
            h = token_hashes(list(uniq)).astype(np.uint64)
            for d in range(depth):
                idx = ((h * mults[d]) >> np.uint64(16)) % np.uint64(width)
                np.add.at(grid[d], idx.astype(np.int64), counts)
        flat = grid.ravel()
        nz = np.nonzero(flat)[0]
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "val": pa.array(flat[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        docs.map_batches(grid_of, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("val", alias_name="v"))
        .take_all()  # at most depth*width rows — constant size
    )
    grid = np.zeros(depth * width, np.int64)
    for r in merged:
        grid[int(r["cell"])] = int(r["v"])
    grid = grid.reshape(depth, width)

    qh = token_hashes(qt).astype(np.uint64)
    est = np.full(len(qt), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        idx = ((qh * mults[d]) >> np.uint64(16)) % np.uint64(width)
        est = np.minimum(est, grid[d][idx.astype(np.int64)])

    # exact candidate-bounded verify (probe-list sized is_in filter)
    probe = pa.array(qt)

    def exact_partial(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        kept = t.filter(pc.is_in(t["term"], value_set=probe))
        g = kept.group_by("term").aggregate([([], "count_all")])
        return g.rename_columns(["term", "c"])

    from ray.data.aggregate import Sum

    true_rows = {
        r["term"]: int(r["cnt"])
        for r in docs.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="cnt"))
        .take_all()
    }
    return pa.table(
        {
            "term": pa.array(qt, pa.string()),
            "est": pa.array(est, pa.int64()),
            "true_cnt": pa.array(
                [true_rows.get(t, 0) for t in qt], pa.int64()
            ),
        }
    )


# -- cohort retention (D+1 / D+7) -------------------------------------------

def cohort_retention(sf_dir: str):
    """Activation-cohort retention: users grouped by their first active day
    (the cohort); per cohort, how many users were active again exactly 1
    and 7 days later — the growth-analytics rollup every event warehouse
    ships (the reference's metrics CSV is the 25-doc analog of this kind
    of report, `Serial Version/src/metrics.c`).

    Scale shape: per-block (user_id, day) pre-distinct before the groupby
    shuffle (activity rows collapse ~events/day-fold before moving), the
    per-user first-day table attached back via the cost-based
    broadcast/shuffle join, then one associative flag-sum groupby keyed by
    cohort day. Only integer (user, day) rows ever shuffle; n_users falls
    out of the d0 flag because (user, day) pairs are distinct."""
    from ray.data.aggregate import Min, Sum

    US_PER_DAY = 86_400_000_000

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(b: pa.Table) -> pa.Table:
        # unit-normalize first: parquet written from pandas carries ts[ns]
        day = pc.floor_temporal(pc.cast(b["ts"], pa.timestamp("us")), unit="day")
        dayi = pc.divide(pc.cast(day, pa.int64()), US_PER_DAY)
        t = pa.table({"user_id": b["user_id"], "dayi": dayi})
        return t.group_by(["user_id", "dayi"]).aggregate([])

    # distinct (user, active-day) pairs; consumed twice (first-day dim +
    # flag pass) -> pin blocks once
    act = (
        ev.map_batches(to_days, batch_format="pyarrow")
        .groupby(["user_id", "dayi"])
        .count()
        .select_columns(["user_id", "dayi"])
        .materialize()
    )
    firsts = act.groupby("user_id").aggregate(
        Min("dayi", alias_name="first_dayi")
    )
    joined = _attach_or_join(
        act, "user_id", firsts, "user_id", ["first_dayi"],
        npart=_join_partitions(),
    )

    def flags(b: pa.Table) -> pa.Table:
        off = pc.subtract(b["dayi"], b["first_dayi"])

        def f(k: int):
            return pc.cast(pc.equal(off, k), pa.int64())

        return pa.table(
            {"cohort_dayi": b["first_dayi"], "d0": f(0), "d1": f(1), "d7": f(7)}
        )

    agg = (
        joined.map_batches(flags, batch_format="pyarrow")
        .groupby("cohort_dayi")
        .aggregate(
            Sum("d0", alias_name="n_users"),
            Sum("d1", alias_name="d1_retained"),
            Sum("d7", alias_name="d7_retained"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        ts = pc.cast(
            pc.multiply(b["cohort_dayi"], US_PER_DAY), pa.timestamp("us")
        )
        return pa.table(
            {
                "cohort_day": ts,
                "n_users": b["n_users"],
                "d1_retained": b["d1_retained"],
                "d7_retained": b["d7_retained"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- strict-order funnel ----------------------------------------------------

FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def funnel_counts(sf_dir: str, steps: tuple = FUNNEL_STEPS):
    """Ordered funnel: how many users completed each step strictly AFTER
    their (chained) completion time of the previous step — first qualifying
    occurrence semantics, the standard product-analytics funnel.

    Users are hash-partitioned (users never span partitions), each
    partition walks the step chain with vectorized groupby-min transforms
    (no per-user Python), and emits exactly len(steps) partial rows; a
    constant-size groupby sums the partitions. At 100 TB the only shuffle
    is the user-partition exchange of (user_id, ts, event_type) rows."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def funnel_part(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        prev = None  # Series: user_id -> qualify time of the previous step
        for step in steps:
            cur = g[g["event_type"] == step]
            if prev is not None:
                pm = cur["user_id"].map(prev)
                cur = cur[pm.notna() & (cur["ts"] > pm)]
            mins = cur.groupby("user_id")["ts"].min()
            prev = mins
            counts.append(len(mins))
        return pd.DataFrame(
            {
                "step": list(steps),
                "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
                "n_users": np.asarray(counts, dtype=np.int64),
            }
        )

    parts = _by_partition(ev, "user_id", funnel_part)
    return parts.groupby(["step", "step_idx"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


# -- event-type transition matrix (Markov counts) ---------------------------

def event_transitions(sf_dir: str):
    """(from_type, to_type, n): counts of consecutive event-type pairs per
    user in time order — the Markov transition table behind next-action
    models and bot detection. Users are hash-partitioned; each partition
    computes ALL its users' lag pairs with one sort + one grouped shift
    (no per-user Python), emits (from, to, partial n), and a
    type-squared-bounded groupby merges partitions."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = g.groupby("user_id", sort=False)["event_type"].shift(1)
        keep = prev.notna()
        out = pd.DataFrame(
            {"from_type": prev[keep], "to_type": g["event_type"][keep]}
        )
        agg = out.groupby(["from_type", "to_type"], sort=False).size()
        return agg.rename("n").reset_index()

    parts = _by_partition(ev, "user_id", pairs_part)
    return parts.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n")
    )


# -- rolling 7-day distinct active users ------------------------------------

def rolling_dau(sf_dir: str, window_days: int = 7):
    """Per day D: distinct users active in the window [D-6, D] — the
    trailing-WAU metric. Exact without any driver-side state: distinct
    (user, day) pairs expand to the window_days window-end days each pair
    contributes to, a second distinct collapses multi-day users per
    window, and a count per window end finishes. All integer rows; the
    expansion factor is the constant window_days."""
    from ray.data.aggregate import Count

    US_PER_DAY = 86_400_000_000

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def to_days(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(b["ts"], pa.timestamp("us")), unit="day")
        dayi = pc.divide(pc.cast(day, pa.int64()), US_PER_DAY)
        t = pa.table({"user_id": b["user_id"], "dayi": dayi})
        return t.group_by(["user_id", "dayi"]).aggregate([])

    act = (
        ev.map_batches(to_days, batch_format="pyarrow")
        .groupby(["user_id", "dayi"])
        .count()
        .select_columns(["user_id", "dayi"])
    )

    def expand(b: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "user_id": b["user_id"],
                    "wend": pc.add(b["dayi"], k),
                }
            )
            for k in range(window_days)
        ]
        t = pa.concat_tables(parts)
        return t.group_by(["user_id", "wend"]).aggregate([])

    agg = (
        act.map_batches(expand, batch_format="pyarrow")
        .groupby(["user_id", "wend"])
        .count()
        .select_columns(["wend"])
        .groupby("wend")
        .aggregate(Count(alias_name="n_users"))
    )

    def finalize(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.multiply(b["wend"], US_PER_DAY), pa.timestamp("us"))
        return pa.table({"window_end": ts, "n_users": b["n_users"]})

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- exact-integer Pearson correlation --------------------------------------

def qty_discount_corr(sf_dir: str):
    """Pearson corr(l_quantity, l_discount) per returnflag via the one-pass
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) — the textbook
    distributed-correlation shape: per-block integer partials, a
    group-count-bounded groupby of six associative sums, one finalize.
    Both operands are lattice-valued (integer quantities; discounts on a
    0.01 grid → ×100), so every partial is an EXACT int64 and the final
    double math is bit-identical to the oracle's identical formula —
    summation order can't flip the rounded result."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        x = b["l_quantity"].to_numpy().astype(np.int64)
        y = round_half_away(
            pc.multiply(b["l_discount"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
            }
        )
        return _agg_rename(
            t.group_by("l_returnflag").aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                 ("sxy", "sum"), ("sxx", "sum"), ("syy", "sum")]
            ),
            {f"{c}_sum": c for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]},
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            *[Sum(c, alias_name=c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]]
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        # the variance/covariance differences stay EXACT int64 (bounded by
        # n * max², fine through sf1); only the final sqrt/divide is double
        # — the exact shape the oracle SQL mirrors, so bit-equality holds
        n = b["n"].to_numpy().astype(np.int64)
        sx = b["sx"].to_numpy().astype(np.int64)
        sy = b["sy"].to_numpy().astype(np.int64)
        sxy = b["sxy"].to_numpy().astype(np.int64)
        sxx = b["sxx"].to_numpy().astype(np.int64)
        syy = b["syy"].to_numpy().astype(np.int64)
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        num = (n * sxy - sx * sy).astype(np.float64)
        ok = (d1 > 0) & (d2 > 0)
        denom = np.sqrt(d1.astype(np.float64) * d2.astype(np.float64))
        corr = round_half_away(
            np.where(ok, num / np.where(ok, denom, 1.0), 0.0), 6
        )
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "n": pc.cast(b["n"], pa.int64()),
                "corr_qty_disc": pa.array(corr, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- per-type z-score anomaly flagging ---------------------------------------

def events_anomalies(sf_dir: str, z_cut: float = 3.0):
    """Events whose value sits ≥ ``z_cut`` population standard deviations
    from their event-type mean — the data-quality outlier screen run before
    events feed aggregate training signals. Output: (event_id, event_type,
    value, z) for flagged rows, z rounded 6dp.

    Scale shape — the textbook two-pass distributed z-score:
      1. stats pass: per-block integer partials (n, Σ100v, Σ(100v)²) over
         the 0.01-grid value lattice, then a CARDINALITY-BOUNDED groupby
         (one row per event_type) — sums stay exact int64 well past sf0.1
         and below the 2^53 double threshold, so the derived mean/var
         doubles are bit-identical to the oracle's HUGEINT-summed SQL;
      2. flag pass: the tiny per-type stats dict broadcasts via ray.put
         and a vectorized map_batches emits only the flagged rows.
    Neither pass shuffles event rows; only (type, 3×int64) partials move.
    """
    import ray
    from ray.data.aggregate import Sum

    ev_stats = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        sv = round_half_away(
            pc.multiply(b["value"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(sv), np.int64)),
                "sx": pa.array(sv),
                "sxx": pa.array(sv * sv),
            }
        )
        return _agg_rename(
            t.group_by("event_type").aggregate(
                [("n", "sum"), ("sx", "sum"), ("sxx", "sum")]
            ),
            {f"{c}_sum": c for c in ["n", "sx", "sxx"]},
        )

    stats_rows = (
        ev_stats.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ["n", "sx", "sxx"]])
        .take_all()
    )
    # mean/var in SCALED units with the exact expression the oracle mirrors:
    # mean = sx/n; var = sxx/n - mean*mean  (population variance)
    stats = {}
    for r in stats_rows:
        n = float(r["n"])
        mean = r["sx"] * 1.0 / n
        var = r["sxx"] * 1.0 / n - mean * mean
        stats[r["event_type"]] = (mean, np.sqrt(var) if var > 0 else 0.0)
    stats_ref = ray.put(stats)

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def flag(b: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        types = b["event_type"].to_pylist()
        mean = np.array([st[t][0] for t in types], np.float64)
        std = np.array([st[t][1] for t in types], np.float64)
        sv = round_half_away(
            pc.multiply(b["value"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        z = (sv - mean) / np.where(std > 0, std, 1.0)
        keep = (np.abs(z) >= z_cut) & (std > 0)
        return pa.table(
            {
                "event_id": b["event_id"].filter(pa.array(keep)),
                "event_type": b["event_type"].filter(pa.array(keep)),
                "value": b["value"].filter(pa.array(keep)),
                "z": pa.array(round_half_away(z[keep], 6), pa.float64()),
            }
        )

    return ev.map_batches(flag, batch_format="pyarrow")


# -- robust (median/MAD) outlier screen --------------------------------------

def events_mad_outliers(sf_dir: str):
    """Robust complement to ``events_anomalies``: flag events whose value
    deviates from the per-type MEDIAN by more than 3× the MAD (median
    absolute deviation) — insensitive to the heavy tail that inflates the
    z-score screen's σ. Output (event_id, event_type, value, robust_z)
    with robust_z = (v−med)/(1.4826·MAD) rounded 6dp; the flag itself is
    the EXACT integer comparison |sv−med| > 3·MAD.

    Scale shape — exact distributed median WITHOUT a per-type sort: values
    live on the 0.01 grid, so per-type value histograms are
    CARDINALITY-BOUNDED (grid ≤ ~50k cells/type). Per-block (type, sv)
    count partials → one bounded groupby → per-type median and MAD from
    cumulative counts in one tiny task (MAD reuses the same histogram:
    |sv−med| counts fold the grid in place, no second data pass). The flag
    pass broadcasts the per-type (med, mad) dict. Event rows never shuffle.
    Median index = (n−1)//2 into the sorted multiset — DuckDB's
    ``quantile_disc(0.5)``, which the oracle uses verbatim.
    """
    import ray
    from ray.data.aggregate import Sum

    ev_hist = _read(sf_dir, "events", ["event_type", "value"])

    def hist_part(b: pa.Table) -> pa.Table:
        sv = round_half_away(
            pc.multiply(b["value"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "sv": pa.array(sv),
                "cnt": pa.array(np.ones(len(sv), np.int64)),
            }
        )
        return _agg_rename(
            t.group_by(["event_type", "sv"]).aggregate([("cnt", "sum")]),
            {"cnt_sum": "cnt"},
        )

    hist = (
        ev_hist.map_batches(hist_part, batch_format="pyarrow")
        .groupby(["event_type", "sv"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )

    def disc_quantile(vals: np.ndarray, cnts: np.ndarray) -> int:
        # quantile_disc(0.5): element at index (n-1)//2 of the sorted
        # multiset, located via cumulative counts
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        idx = (cnts.sum() - 1) // 2
        return int(vals[np.searchsorted(np.cumsum(cnts), idx + 1)])

    by_type: dict = {}
    for r in hist:
        by_type.setdefault(r["event_type"], []).append((r["sv"], r["cnt"]))
    stats = {}
    for et, pairs in by_type.items():
        vals = np.array([p[0] for p in pairs], np.int64)
        cnts = np.array([p[1] for p in pairs], np.int64)
        med = disc_quantile(vals, cnts)
        # MAD from the SAME histogram: fold deviations (grid stays bounded)
        mad = disc_quantile(np.abs(vals - med), cnts)
        stats[et] = (med, mad)
    stats_ref = ray.put(stats)

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def flag(b: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        types = b["event_type"].to_pylist()
        med = np.array([st[t][0] for t in types], np.int64)
        mad = np.array([st[t][1] for t in types], np.int64)
        sv = round_half_away(
            pc.multiply(b["value"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        dev = np.abs(sv - med)
        keep = (mad > 0) & (dev > 3 * mad)  # exact integer flag
        rz = (sv - med) / (1.4826 * np.where(mad > 0, mad, 1))
        return pa.table(
            {
                "event_id": b["event_id"].filter(pa.array(keep)),
                "event_type": b["event_type"].filter(pa.array(keep)),
                "value": b["value"].filter(pa.array(keep)),
                "robust_z": pa.array(
                    round_half_away(rz[keep], 6), pa.float64()
                ),
            }
        )

    return ev.map_batches(flag, batch_format="pyarrow")


# -- cross-table integrity audit ---------------------------------------------

def order_reconcile(sf_dir: str, k: int = 50):
    """Cross-table integrity audit: per order, the header's ``o_totalprice``
    vs the recomputed lineitem total Σ extprice·(1−disc)·(1+tax); returns
    the top-``k`` discrepancies by |diff| (o_orderkey tiebreak) — the
    reconciliation report a pipeline runs before trusting header-level
    aggregates. Orders with no lineitems (and orphan lineitems) surface
    with the full header (resp. computed) amount as the discrepancy.

    Scale shape: NO join — both fact tables collapse to per-block partials
    in the same (okey, tgt, calc) layout on the exact integer lattice
    (cents × the two 0.01-grid factors → ×10⁴ units, int64 through sf1),
    union, then a PARTITION-GROUPED merge (hash(okey) % 64, one pandas
    groupby-sum per partition — Ray's order-scale Aggregate measured 54 s
    of per-group combine tax here, the basket_pairs lesson) with a
    per-partition top-k prune, so the global sort sees ≤ 64·k rows. All
    money math is exact integers; the three final divisions are mirrored
    by the oracle bit-for-bit.
    """
    N_PARTS = 64

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def li_part(b: pa.Table) -> pa.Table:
        ep = round_half_away(
            pc.multiply(b["l_extendedprice"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        d = round_half_away(
            pc.multiply(b["l_discount"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        t = round_half_away(
            pc.multiply(b["l_tax"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        calc = ep * (100 - d) * (100 + t)
        tab = pa.table(
            {
                "okey": b["l_orderkey"],
                "tgt": pa.array(np.zeros(len(ep), np.int64)),
                "calc": pa.array(calc),
            }
        )
        return _agg_rename(
            tab.group_by("okey").aggregate([("tgt", "sum"), ("calc", "sum")]),
            {"tgt_sum": "tgt", "calc_sum": "calc"},
        )

    def o_part(b: pa.Table) -> pa.Table:
        tgt = round_half_away(
            pc.multiply(b["o_totalprice"], 100.0).to_numpy(), 0
        ).astype(np.int64) * 10_000
        return pa.table(
            {
                "okey": b["o_orderkey"],
                "tgt": pa.array(tgt),
                "calc": pa.array(np.zeros(len(tgt), np.int64)),
            }
        )

    def add_part(b: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_array(
                b["okey"].to_numpy(zero_copy_only=False), categorize=False
            )
            % N_PARTS
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        # one pandas groupby-sum per PARTITION (not per order), then the
        # partition's k worst discrepancies only
        agg = g.groupby("okey", sort=False)[["tgt", "calc"]].sum().reset_index()
        d = agg["tgt"].to_numpy() - agg["calc"].to_numpy()
        agg["absu"] = np.abs(d)
        return agg.sort_values(
            ["absu", "okey"], ascending=[False, True], kind="stable"
        ).head(k)

    top = (
        li.map_batches(li_part, batch_format="pyarrow")
        .union(orders.map_batches(o_part, batch_format="pyarrow"))
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_part, batch_format="pandas")
        .sort(["absu", "okey"], descending=[True, False])
        .limit(k)
    )

    def finalize(b: pa.Table) -> pa.Table:
        tgt = b["tgt"].to_numpy().astype(np.int64)
        calc = b["calc"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "o_orderkey": b["okey"],
                "o_totalprice": pa.array(
                    round_half_away(tgt / 1_000_000.0, 2), pa.float64()
                ),
                "lineitem_total": pa.array(
                    round_half_away(calc / 1_000_000.0, 2), pa.float64()
                ),
                "diff": pa.array(
                    round_half_away((tgt - calc) / 1_000_000.0, 2), pa.float64()
                ),
            }
        )

    return top.map_batches(finalize, batch_format="pyarrow")


# -- ROLLUP subtotals --------------------------------------------------------

def revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(status, priority) over orders: finest cells,
    per-status subtotals, and the grand total, tagged with the SQL
    grouping level (0 finest, 1 priority rolled, 3 both rolled; rolled
    keys surface as 'ALL'). Money sums ride the exact integer-cents
    lattice so subtotal re-aggregation can't drift from the oracle.

    Scale shape: the fact table collapses to per-block partials before
    the (status, priority) shuffle; the rollup levels derive from the
    CARDINALITY-BOUNDED finest table in one single-block vectorized
    task — no driver pull, no second pass over the fact."""
    from ray.data.aggregate import Sum

    orders = _read(
        sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = round_half_away(
            pc.multiply(b["o_totalprice"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        t = pa.table(
            {
                "status": b["o_orderstatus"],
                "priority": b["o_orderpriority"],
                "cents": pa.array(cents),
                "n": pa.array(np.ones(len(cents), np.int64)),
            }
        )
        return _agg_rename(
            t.group_by(["status", "priority"]).aggregate(
                [("cents", "sum"), ("n", "sum")]
            ),
            {"cents_sum": "cents", "n_sum": "n"},
        )

    finest = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["status", "priority"])
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        lvl0 = df.assign(lvl=np.int64(0))
        lvl1 = (
            df.groupby("status", as_index=False)[["cents", "n"]]
            .sum()
            .assign(priority="ALL", lvl=np.int64(1))
        )
        lvl2 = pd.DataFrame(
            {
                "status": ["ALL"],
                "priority": ["ALL"],
                "cents": [df["cents"].sum()],
                "n": [df["n"].sum()],
                "lvl": [np.int64(3)],
            }
        )
        out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
        out["revenue"] = (out["cents"].astype(np.float64) / 100.0).round(2)
        out["n_orders"] = out["n"].astype(np.int64)
        return out[["status", "priority", "lvl", "revenue", "n_orders"]]

    return finest.repartition(1).map_batches(rollup, batch_format="pandas")


# -- fixed-category pivot ----------------------------------------------------

PIVOT_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def events_pivot(sf_dir: str, types: tuple = PIVOT_EVENT_TYPES):
    """Daily wide-format event counts: one column per (fixed, known)
    event type — the PIVOT every dashboard query runs. Per-block
    indicator partials collapse to (day, n_<type>...) rows before the
    day-keyed groupby; column set is static so the schema is stable."""
    from ray.data.aggregate import Sum

    US_PER_DAY = 86_400_000_000

    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(pc.cast(b["ts"], pa.timestamp("us")), unit="day")
        dayi = pc.divide(pc.cast(day, pa.int64()), US_PER_DAY)
        cols = {"dayi": dayi}
        for t in types:
            cols[f"n_{t}"] = pc.cast(
                pc.equal(b["event_type"], t), pa.int64()
            )
        tb = pa.table(cols)
        return _agg_rename(
            tb.group_by("dayi").aggregate(
                [(f"n_{t}", "sum") for t in types]
            ),
            {f"n_{t}_sum": f"n_{t}" for t in types},
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("dayi")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in types])
    )

    def finalize(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.multiply(b["dayi"], US_PER_DAY), pa.timestamp("us"))
        cols = {"day": ts}
        for t in types:
            cols[f"n_{t}"] = b[f"n_{t}"]
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- order inter-arrival gaps ------------------------------------------------

def order_interarrival(sf_dir: str):
    """Per customer: number of orders and the mean gap in days between
    consecutive orders (date-ordered, o_orderkey tiebreak) — the
    inter-arrival statistic behind churn/frequency models. Customers with
    a single order carry no gap and are excluded, matching the oracle's
    lag() NULL behavior.

    Scale shape: customers are hash-partitioned; one sort + one grouped
    diff per partition (vectorized), emitting one row per customer."""
    US_PER_DAY = 86_400_000_000

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    NS_PER_DAY = 86_400_000_000_000.0

    def gaps_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                          kind="stable")
        # integer-nanosecond gaps: partial sums are EXACT int64, so the
        # single final division matches the oracle bit-for-bit regardless
        # of summation order
        ts_ns = g["o_orderdate"].to_numpy().astype("datetime64[ns]").astype(
            np.int64
        )
        prev = pd.Series(ts_ns, index=g.index).groupby(
            g["o_custkey"].to_numpy(), sort=False
        ).shift(1)
        keep = prev.notna()
        sub = pd.DataFrame(
            {
                "o_custkey": g["o_custkey"][keep],
                "gap_ns": (ts_ns[keep.to_numpy()] - prev[keep].to_numpy()
                           ).astype(np.int64),
            }
        )
        agg = sub.groupby("o_custkey", sort=False).agg(
            n_gaps=("gap_ns", "size"), sum_ns=("gap_ns", "sum")
        )
        out = agg.reset_index()
        out["avg_gap_days"] = round_half_away(
            out["sum_ns"].to_numpy().astype(np.float64)
            / (out["n_gaps"].to_numpy() * NS_PER_DAY),
            6,
        )
        out["n_orders"] = (out["n_gaps"] + 1).astype(np.int64)
        return out[["o_custkey", "n_orders", "avg_gap_days"]]

    return _by_partition(orders, "o_custkey", gaps_part)


# -- chi-square independence (segment x priority) ---------------------------

def segment_priority_chi2(sf_dir: str):
    """Pearson chi-square statistic for independence of customer market
    segment vs order priority — contingency-table analytics past plain SQL
    aggregates. The fact scan collapses to exact integer (segment,
    priority) counts (cost-based segment attach, per-block partials); the
    chi2 sum runs over the CARDINALITY-BOUNDED contingency table in one
    single-block task with double math mirrored by the oracle.

    Output: one row — (chi2 round 6, dof, n)."""
    from ray.data.aggregate import Sum

    npart = _join_partitions()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    with_seg = _attach_or_join(
        orders, "o_custkey", cust, "c_custkey", ["c_mktsegment"], npart,
        dim_count_hint=_table_rows(sf_dir, "customer"),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "segment": b["c_mktsegment"],
                "priority": b["o_orderpriority"],
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return _agg_rename(
            t.group_by(["segment", "priority"]).aggregate([("n", "sum")]),
            {"n_sum": "n"},
        )

    cont = (
        with_seg.map_batches(partial, batch_format="pyarrow")
        .groupby(["segment", "priority"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def chi2(df: pd.DataFrame) -> pd.DataFrame:
        # zero-fill the full segment x priority grid: absent cells still
        # contribute their expectation (the oracle builds the same grid)
        piv = df.pivot_table(
            index="segment", columns="priority", values="n",
            fill_value=0, aggfunc="sum",
        ).astype(np.int64)
        obs = piv.to_numpy().astype(np.float64)
        row = obs.sum(axis=1, keepdims=True)
        col = obs.sum(axis=0, keepdims=True)
        total = obs.sum()
        exp = row @ col / total
        stat = ((obs - exp) ** 2 / exp).sum()
        dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
        return pd.DataFrame(
            {
                "chi2": round_half_away(np.array([stat]), 6),
                "dof": np.array([dof], np.int64),
                "n": np.array([int(total)], np.int64),
            }
        )

    return cont.repartition(1).map_batches(chi2, batch_format="pandas")


# -- market-basket pair mining ----------------------------------------------

def basket_pairs(sf_dir: str, k: int = 50):
    """Top-k co-purchased part pairs (the A-Priori first pass): for every
    order's distinct part set, count unordered pairs across the corpus.
    The pair expansion is ORDER-LOCAL (a TPC-H order holds ≤7 lines, so
    the blow-up is ≤ C(7,2) per order, not quadratic in the corpus);
    orders co-locate via the bounded hash-partition groupby, each
    partition expands ALL its orders with one self-merge, and only
    (part_a, part_b, partial n) rows reach the final bounded groupby +
    distributed top-k sort."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        b = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = b.merge(b, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        agg = (
            m.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return agg.rename(
            columns={"l_partkey_a": "part_a", "l_partkey_b": "part_b"}
        )

    parts = _by_partition(li, "l_orderkey", pairs_part)

    # merge the per-order-partition partial counts. The pair table is
    # pairs-of-catalog scale (1.2M mostly-singleton groups at sf0.1) and
    # Ray's Aggregate over it measured 223s of per-group combine overhead
    # — so merge partition-grouped instead (bounded hash partitions, one
    # C-speed pandas groupby-sum per partition; the repo's standard
    # high-cardinality idiom), then prune each partition to its own top-k
    # before the final (tiny) sort.
    N_PAIR_PARTS = 64

    def add_pair_part(b: pa.Table) -> pa.Table:
        key = (
            b["part_a"].to_numpy().astype(np.int64) << np.int64(32)
        ) | b["part_b"].to_numpy().astype(np.int64)
        part = (
            pd.util.hash_array(key, categorize=False) % N_PAIR_PARTS
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["part_a", "part_b"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        order = np.lexsort(
            (agg["part_b"].to_numpy(), agg["part_a"].to_numpy(),
             -agg["n"].to_numpy())
        )[:k]
        return agg.iloc[np.sort(order)]

    merged = (
        parts.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: merge_part(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )
    return merged.sort(
        ["n", "part_a", "part_b"], descending=[True, False, False]
    ).limit(k)


# -- grouped OLS regression (distributed sufficient statistics) ---------------

def brand_price_trend(sf_dir: str):
    """(p_brand, n, slope_cents_per_qty, intercept_cents): per-brand OLS of
    line price (cents) on quantity — distributed regression via the same
    one-pass exact sufficient-statistics shape as `qty_discount_corr`
    (n, Σx, Σy, Σxy, Σx² as associative int64 partials; x = quantity,
    y = extendedprice ×100 cents), extended from correlation to the
    regression coefficients a training-signal pipeline fits per segment.

    The brand arrives on the fact rows through the cost-based
    `_attach_or_join` (part is dim-scale → broadcast searchsorted at bench
    scale, hash-shuffle join beyond); after the attach only
    (brand, 5 int64 partials) rows — brand-cardinality-bounded — enter the
    groupby. The finalize double expressions are structurally identical to
    the SQL mirror, so rounded results are bit-equal."""
    from ray.data.aggregate import Sum

    npart = _join_partitions(n_joins=1)
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    part_dim = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    branded = _attach_or_join(
        li, "l_partkey", part_dim, "p_partkey", ["p_brand"], npart
    )

    def partial(b: pa.Table) -> pa.Table:
        x = b["l_quantity"].to_numpy().astype(np.int64)
        y = round_half_away(
            pc.multiply(b["l_extendedprice"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        t = pa.table(
            {
                "p_brand": b["p_brand"],
                "n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )
        return _agg_rename(
            t.group_by("p_brand").aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                 ("sxy", "sum"), ("sxx", "sum")]
            ),
            {f"{c}_sum": c for c in ["n", "sx", "sy", "sxy", "sxx"]},
        )

    agg = (
        branded.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(*[Sum(c, alias_name=c) for c in ["n", "sx", "sy", "sxy", "sxx"]])
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy().astype(np.int64)
        sx = b["sx"].to_numpy().astype(np.int64)
        sy = b["sy"].to_numpy().astype(np.int64)
        sxy = b["sxy"].to_numpy().astype(np.int64)
        sxx = b["sxx"].to_numpy().astype(np.int64)
        den = n * sxx - sx * sx  # exact int64
        ok = den > 0
        den_f = np.where(ok, den, 1).astype(np.float64)
        slope = (n * sxy - sx * sy).astype(np.float64) / den_f
        slope = np.where(ok, slope, 0.0)
        intercept = (sy.astype(np.float64) - slope * sx.astype(np.float64)) / n.astype(
            np.float64
        )
        return pa.table(
            {
                "p_brand": b["p_brand"],
                "n": pc.cast(b["n"], pa.int64()),
                "slope_cents_per_qty": pa.array(
                    round_half_away(slope, 6), pa.float64()
                ),
                "intercept_cents": pa.array(
                    round_half_away(intercept, 6), pa.float64()
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort("p_brand")


# -- bloom-pushdown semi-join --------------------------------------------------

_BLOOM_SALT_A = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_SALT_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _splitmix64_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)."""
    z = x.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 + i*h2 mod nbits."""
    x = keys.astype(np.uint64)
    h1 = _splitmix64_vec(x + _BLOOM_SALT_A)
    h2 = _splitmix64_vec(x ^ _BLOOM_SALT_B) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(nbits)).astype(np.int64)


def bloom_semi_join(
    sf_dir: str,
    price_cutoff: float = 400000.0,
    nbits: int = 1 << 20,
    n_hashes: int = 4,
    n_parts: int = 64,
):
    """Monthly (revenue, n_lines) of lineitems whose ORDER qualifies
    (o_totalprice > cutoff) — the classic bloom-pushdown semi-join, with the
    EXACT result restored by a partition-grouped verify:

      1. build side: qualifying order keys never leave their blocks as a
         list — each block emits ONE packed 128 KB bitmap partial
         (positions from vectorized splitmix64 double hashing) and the
         driver ORs the per-block bitmaps (block-count-bounded, constant
         size) into a single filter shared via ray.put.
      2. probe side: each lineitem batch tests membership vectorized and
         drops non-members BEFORE any shuffle — at a 20%-selective cutoff
         this removes ~80% of the fact table for 128 KB of broadcast state,
         which is the entire point of the pattern at 100 TB (an exact key
         set would be fact-scale; a shuffle semi-join would move every row).
      3. exact verify: bloom false positives are killed by co-locating
         survivor partials with the qualifying keys (hash(okey) % n_parts
         union groupby — same shape as minhash's verify), so the output is
         bit-equal to the plain SQL semi-join; the fp rate only costs
         shuffle volume ((1-e^{-kn/m})^k ≈ 2e-4 at 6k keys / 2^20 bits).

    Month revenue uses the `shipping_monthly` integer ten-thousandths
    lattice so the 2dp rounding is order-independent."""
    import ray as _ray

    words = nbits // 8

    qualifying = (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .filter(expr=f"o_totalprice > {price_cutoff}")
        .map_batches(
            lambda b: b.select(["o_orderkey"]), batch_format="pyarrow"
        )
        .materialize()
    )

    def bitmap_partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(nbits, dtype=bool)
        pos = _bloom_positions(b["o_orderkey"].to_numpy(), nbits, n_hashes)
        bits[pos.ravel()] = True
        return pa.table({"bm": pa.array([np.packbits(bits).tobytes()], pa.large_binary())})

    merged = np.zeros(words, dtype=np.uint8)
    for t in qualifying.map_batches(
        bitmap_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in t["bm"].to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint8)
    bloom_ref = _ray.put(np.unpackbits(merged).astype(bool))

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def probe(b: pa.Table) -> pa.Table:
        bloom = _ray.get(bloom_ref)
        okey = b["l_orderkey"].to_numpy()
        pos = _bloom_positions(okey, nbits, n_hashes)
        mask = bloom[pos].all(axis=1)
        b = b.filter(pa.array(mask))
        if b.num_rows == 0:
            return pa.table(
                {
                    "okey": pa.array([], pa.int64()),
                    "ship_month": pa.array([], pa.timestamp("us")),
                    "rev4": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                    "tag": pa.array([], pa.int8()),
                }
            )
        month = pc.floor_temporal(b["l_shipdate"], unit="month")
        rev4 = round_half_away(
            pc.multiply(
                pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])),
                10000.0,
            ).to_numpy(),
            0,
        ).astype(np.int64)
        t = pa.table(
            {
                "okey": pc.cast(b["l_orderkey"], pa.int64()),
                "ship_month": pc.cast(month, pa.timestamp("us")),
                "rev4": pa.array(rev4, pa.int64()),
                "n_lines": pa.array(np.ones(len(rev4), np.int64)),
            }
        )
        g = _agg_rename(
            t.group_by(["okey", "ship_month"]).aggregate(
                [("rev4", "sum"), ("n_lines", "sum")]
            ),
            {"rev4_sum": "rev4", "n_lines_sum": "n_lines"},
        )
        part = (g["okey"].to_numpy() % n_parts).astype(np.int32)
        return g.append_column("part", pa.array(part)).append_column(
            "tag", pa.array(np.zeros(g.num_rows, np.int8))
        )

    def key_rows(b: pa.Table) -> pa.Table:
        okey = b["o_orderkey"].to_numpy().astype(np.int64)
        n = len(okey)
        return pa.table(
            {
                "okey": pa.array(okey),
                "ship_month": pa.array([None] * n, pa.timestamp("us")),
                "rev4": pa.array(np.zeros(n, np.int64)),
                "n_lines": pa.array(np.zeros(n, np.int64)),
                "part": pa.array((okey % n_parts).astype(np.int32)),
                "tag": pa.array(np.ones(n, np.int8)),
            }
        )

    survivors = li.map_batches(probe, batch_format="pyarrow")
    keyed = qualifying.map_batches(key_rows, batch_format="pyarrow")

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        keys = g.loc[g["tag"] == 1, "okey"].to_numpy()
        surv = g[g["tag"] == 0]
        surv = surv[np.isin(surv["okey"].to_numpy(), keys)]
        if surv.empty:
            return pd.DataFrame(
                {
                    "ship_month": pd.Series([], dtype="datetime64[us]"),
                    "rev4": pd.Series([], dtype="int64"),
                    "n_lines": pd.Series([], dtype="int64"),
                }
            )
        out = (
            surv.groupby("ship_month", as_index=False)[["rev4", "n_lines"]].sum()
        )
        return out[["ship_month", "rev4", "n_lines"]]

    from ray.data.aggregate import Sum

    agg = (
        survivors.union(keyed)
        .groupby("part")
        .map_groups(verify_part, batch_format="pandas")
        .groupby("ship_month")
        .aggregate(Sum("rev4", alias_name="rev4"), Sum("n_lines", alias_name="n_lines"))
    )

    def finalize(b: pa.Table) -> pa.Table:
        rev = round_half_away(
            b["rev4"].to_numpy().astype(np.int64) / 10000.0, 2
        )
        return pa.table(
            {
                "ship_month": b["ship_month"],
                "revenue": pa.array(rev, pa.float64()),
                "n_lines": pc.cast(b["n_lines"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- HyperLogLog distinct sketch ------------------------------------------------

_HLL_P = 12          # 2^12 = 4096 registers, ~1.6% standard error
_HLL_M = 1 << _HLL_P


def _hll_partial(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per key — splitmix64 hash, top p bits pick the
    register, rho = leading-zero run of the remaining 52 bits + 1. The
    float64 exponent trick (np.frexp) gives exact bit lengths for w < 2^53,
    so rho is deterministic and cross-run stable."""
    h = _splitmix64_vec(keys.astype(np.uint64))
    reg = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    w = (h & np.uint64((1 << (64 - _HLL_P)) - 1)).astype(np.float64)
    bl = np.frexp(w)[1]  # bit length; 0 for w == 0
    rho = (64 - _HLL_P) - bl + 1
    return reg, rho.astype(np.int64)


def hll_distinct_users(sf_dir: str):
    """(event_type, n_users_est): per-type approximate distinct users via a
    HyperLogLog sketch — the mergeable-register companion of the KMV sketch
    (`kmv_distinct_users`), and the shape that answers per-group COUNT
    DISTINCT at 100 TB without ever shuffling the group's members:

      - per block: vectorized (register, rho) for each user hash, folded
        to per-(type, register) maxima inside the block (<= types x 4096
        rows leave any block, whatever its size);
      - one groupby over (type, register) merges partials with MAX — the
        HLL merge IS register-wise max, so the result is independent of
        partitioning (a pytest asserts repartition invariance);
      - per-type finalize applies the standard bias-corrected harmonic
        estimate with the small-range linear-counting correction.

    Deterministic (seedless splitmix64), so rows-only driver checks are
    stable; accuracy is pinned by a tolerance pytest instead of an oracle
    (the estimate is not SQL-expressible)."""
    from ray.data.aggregate import Max

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def partials(b: pa.Table) -> pa.Table:
        reg, rho = _hll_partial(b["user_id"].to_numpy())
        t = pa.table(
            {
                "event_type": b["event_type"],
                "reg": pa.array(reg),
                "rho": pa.array(rho),
            }
        )
        return _agg_rename(
            t.group_by(["event_type", "reg"]).aggregate([("rho", "max")]),
            {"rho_max": "rho"},
        )

    merged = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "reg"])
        .aggregate(Max("rho", alias_name="rho"))
    )

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(_HLL_M, dtype=np.float64)
        regs[g["reg"].to_numpy()] = g["rho"].to_numpy()
        m = float(_HLL_M)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-regs))
        zeros = float(np.count_nonzero(regs == 0))
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users_est": np.array([round(e)], np.int64),
            }
        )

    return merged.groupby("event_type").map_groups(
        estimate, batch_format="pandas"
    )


# -- table profiling -------------------------------------------------------------

def profile_events(sf_dir: str):
    """(column, n_rows, n_null, n_distinct) for every events column — the
    data-profiling pass a lake engine runs before ingesting a new feed
    (null-rate and cardinality drive partition/encoding choices and catch
    schema drift).

    Scale shape: null/row counts are per-block integer partials; distinct
    counts pre-dedup per block (each block emits only its OWN distinct
    (column, value) pairs, values cast injectively to strings) before the
    one groupby — the same per-block-partial rule as every aggregate here.
    NULLs are excluded from n_distinct (SQL COUNT(DISTINCT) semantics).
    For an unbounded-cardinality column at 100 TB you'd swap the exact
    distinct for the HLL register shape above; exact is the oracle anchor."""
    from ray.data.aggregate import Count, Sum

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ev = _read(sf_dir, "events", cols)

    def count_partials(b: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            arr = b[c]
            rows.append(
                {
                    "column": c,
                    "n_rows": b.num_rows,
                    "n_null": arr.null_count,
                }
            )
        return pa.Table.from_pylist(rows)

    counts = (
        ev.map_batches(count_partials, batch_format="pyarrow")
        .groupby("column")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_null", alias_name="n_null"),
        )
    )

    def distinct_partials(b: pa.Table) -> pa.Table:
        out_col, out_val = [], []
        for c in cols:
            arr = b[c].combine_chunks()
            if pa.types.is_timestamp(arr.type):
                arr = pc.cast(arr, pa.int64())
            vals = pc.unique(pc.cast(arr, pa.string()).drop_null())
            out_col.extend([c] * len(vals))
            out_val.extend(vals.to_pylist())
        return pa.table(
            {"column": pa.array(out_col, pa.string()),
             "v": pa.array(out_val, pa.string())}
        )

    distincts = (
        ev.map_batches(distinct_partials, batch_format="pyarrow")
        .groupby(["column", "v"])
        .aggregate(Count(alias_name="_dup"))
        .map_batches(
            lambda b: pa.table(
                {"column": b["column"],
                 "one": pa.array(np.ones(b.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        )
        .groupby("column")
        .aggregate(Sum("one", alias_name="n_distinct"))
    )

    joined = _attach_or_join(
        counts, "column", distincts, "column", ["n_distinct"],
        _join_partitions(n_joins=1), launder_fact=True,
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "column": b["column"],
                "n_rows": pc.cast(b["n_rows"], pa.int64()),
                "n_null": pc.cast(b["n_null"], pa.int64()),
                "n_distinct": pc.cast(b["n_distinct"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# -- skyline (Pareto front) -------------------------------------------------------


def _staircase_2d(df: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact 2-D min-min skyline of one in-memory frame: rows not strictly
    dominated on (x, y). Vectorized staircase — sort by (x, y), collapse
    equal-x groups to their y-minimum (anything else is dominated within
    the group), then keep a group iff its y is strictly below the running
    y-minimum of all strictly-cheaper groups. Equal (x, y) duplicates are
    mutual non-dominators and all survive, matching the SQL NOT EXISTS
    strict-dominance predicate."""
    if len(df) == 0:
        return df
    df = df.sort_values([x, y], kind="stable")
    gmin = df.groupby(x, sort=False)[y].transform("min")
    df = df[df[y].to_numpy() == gmin.to_numpy()]
    xs = df[x].to_numpy()
    ys = df[y].to_numpy()
    new_x = np.empty(len(df), dtype=bool)
    new_x[0] = True
    new_x[1:] = xs[1:] != xs[:-1]
    prefmin = np.minimum.accumulate(ys.astype(np.float64))
    group_start = np.maximum.accumulate(
        np.where(new_x, np.arange(len(df)), 0)
    )
    prev_min = np.where(
        group_start == 0, np.inf, prefmin[np.maximum(group_start - 1, 0)]
    )
    return df[ys < prev_min]


def part_skyline(sf_dir: str):
    """(p_partkey, p_size, p_retailprice): the Pareto front of the part
    table minimizing (retail price, size) — parts for which no other part
    is at-most-equal on both axes and strictly better on one. The
    multi-criteria companion of plain top-k (`top_revenue_orders` sorts on
    ONE metric; a skyline surfaces every trade-off-optimal row without a
    weighting choice).

    Scale shape — dominance has local witnesses, so
    skyline(S) ⊆ UNION of per-block skylines: a row dominated inside its
    own block is dominated globally and can be dropped before anything
    shuffles. Each block therefore collapses to its own staircase first
    (expected O(log n) survivors per block on non-adversarial data), and
    only that bounded union moves to the single final staircase pass.
    Degenerate inputs (anti-correlated axes) can leave the skyline
    fact-scale — that is a property of the QUERY, not the plan; the final
    pass would then need the same partition-grouped treatment as the pair
    merges. No reference analog (the reference ranks on one score,
    `Serial Version/src/bm25.c`); this is engine-native coverage.
    """
    parts = _read(
        sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"]
    )

    def local_prune(b: pa.Table) -> pa.Table:
        sky = _staircase_2d(b.to_pandas(), "p_retailprice", "p_size")
        return pa.Table.from_pandas(sky, preserve_index=False)

    def final(b: pa.Table) -> pa.Table:
        sky = _staircase_2d(b.to_pandas(), "p_retailprice", "p_size")
        sky = sky.sort_values("p_partkey", kind="stable")
        return pa.table(
            {
                "p_partkey": pa.array(
                    sky["p_partkey"].to_numpy().astype(np.int64)
                ),
                "p_size": pa.array(sky["p_size"].to_numpy().astype(np.int64)),
                # pass-through double: no arithmetic, bit-exact vs the oracle
                "p_retailprice": pa.array(
                    sky["p_retailprice"].to_numpy(), pa.float64()
                ),
            }
        )

    return (
        parts.map_batches(local_prune, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# -- anti-join --------------------------------------------------------------------


def customers_without_orders(sf_dir: str, priority: str | None = "1-URGENT"):
    """(c_custkey, c_name): customers with no order matching ``priority``
    (None = no order at all) — the distributed ANTI-join, completing the
    join family (broadcast/shuffle inner `_attach_or_join`, bloom-pushdown
    SEMI `bloom_semi_join`, as-of, range).

    Scale shape: the probe predicate filters the orders scan FIRST (an
    anti-join's probe side prunes like any other scan), then each block
    collapses to its DISTINCT custkeys before anything shuffles; both
    sides co-locate by hash(custkey) % 64 bounded partitions and the
    per-partition anti is one vectorized np.isin — the `dedup_keep_first`
    shape. Only (custkey, name) rows ever move; order payload columns
    never leave the scan."""
    N_PARTS = 64
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    order_cols = ["o_custkey"] + (
        ["o_orderpriority"] if priority is not None else []
    )
    orders = _read(sf_dir, "orders", order_cols)
    if priority is not None:
        orders = orders.map_batches(
            lambda b: b.filter(
                pc.equal(b["o_orderpriority"], priority)
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )

    def cust_side(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys),
                "name": pc.cast(b["c_name"], pa.large_string()),
                "part": pa.array((keys % N_PARTS).astype(np.int32)),
                "tag": pa.array(np.zeros(len(keys), np.int8)),
            }
        )

    def orders_side(b: pa.Table) -> pa.Table:
        keys = pc.unique(b["o_custkey"]).to_numpy().astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys),
                "name": pa.array([""] * len(keys), pa.large_string()),
                "part": pa.array((keys % N_PARTS).astype(np.int32)),
                "tag": pa.array(np.ones(len(keys), np.int8)),
            }
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["tag"] == 1, "key"].to_numpy()
        c = g[g["tag"] == 0]
        keep = c[~np.isin(c["key"].to_numpy(), have)]
        return pd.DataFrame(
            {"c_custkey": keep["key"].to_numpy(), "c_name": keep["name"]}
        )

    return (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(orders_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(anti, batch_format="pandas")
    )


def event_type_overlap(sf_dir: str):
    """(type_a, type_b, n_users): for every unordered pair of event types,
    the number of DISTINCT users active in both — the audience-overlap
    matrix behind cross-sell/funnel design, and the exact companion of the
    sketch path (`kmv_distinct_users` / `hll_distinct_users` estimate one
    set each; this intersects them exactly).

    Scale shape: per-block DISTINCT (user, type) partials first (each block
    emits at most its own distinct pairs), then ONE co-location by
    hash(user) % 64 — after which the global distinct, the per-user
    type-pair self-merge (bounded: #types is small, so <= C(#types, 2)
    rows per user), and the per-pair partial counts all run inside the
    partition. Only (pair, count) rows — a few dozen — reach the final
    groupby. User ids never appear in the output; event payloads never
    leave the scan."""
    from ray.data.aggregate import Sum

    N_PARTS = 64
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def block_distinct(b: pa.Table) -> pa.Table:
        t = b.group_by(["user_id", "event_type"]).aggregate([])
        users = t["user_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users),
                "event_type": t["event_type"],
                "part": pa.array((users % N_PARTS).astype(np.int32)),
            }
        )

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"])
        m = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        out = (
            m.groupby(["event_type_a", "event_type_b"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        return out.rename(
            columns={"event_type_a": "type_a", "event_type_b": "type_b"}
        )

    partials = (
        ev.map_batches(block_distinct, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_counts, batch_format="pandas")
    )

    agg = partials.groupby(["type_a", "type_b"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "type_a": b["type_a"],
                "type_b": b["type_b"],
                "n_users": pc.cast(b["n_users"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def order_price_percent_rank(sf_dir: str, bucket_cents: int = 10_000):
    """(o_orderkey, o_orderpriority, pr): SQL
    ``percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY
    o_totalprice)`` — the distributed WINDOW-FUNCTION shape. A naive plan
    map_groups's five fact-scale priority partitions (one task each — the
    exact anti-pattern the per-group tax rule forbids at fact scale); a
    sort-based plan needs global block prefixes Ray Data doesn't expose.
    This is the textbook two-pass range-bucket window instead:

      pass 1 (bounded grid): prices live on the cents lattice; per-block
        integer partials count (priority, cents // bucket_cents) — the
        grid is value-range/bucket_cents × #priorities rows (~thousands),
        NOT fact-scale. One groupby folds it; the driver pulls only the
        grid, prefix-sums offsets per priority, and ray.put's the lookup.
      pass 2 (co-located exact ranks): rows co-locate by
        hash(priority, bucket) % 64 — ties share a cents value, so they
        can never span buckets — and within a partition the per-bucket
        min-ranks are one vectorized pandas groupby().rank(method="min").
        global rank = bucket offset + local rank;
        pr = (rank - 1) / (n_priority - 1), the identical expression DuckDB
        evaluates, rounded 9dp on both sides.

    Bucket skew (a single hot price value) concentrates one bucket's rows
    in one partition — bounded by value-frequency, the same caveat as any
    range partitioner; bucket_cents trades grid size against it."""
    import ray
    from ray.data.aggregate import Sum

    N_PARTS = 64
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def grid_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["o_totalprice"].to_numpy() * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "prio": b["o_orderpriority"],
                "bucket": pa.array(cents // bucket_cents),
                "n": pa.array(np.ones(len(cents), np.int64)),
            }
        )
        return _agg_rename(
            t.group_by(["prio", "bucket"]).aggregate([("n", "sum")]),
            {"n_sum": "n"},
        )

    grid = (
        orders.map_batches(grid_partial, batch_format="pyarrow")
        .groupby(["prio", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: priorities x (price range / bucket_cents)
        .sort_values(["prio", "bucket"])
    )
    offsets: dict[tuple, int] = {}
    totals: dict[str, int] = {}
    for prio, g in grid.groupby("prio", sort=False):
        run = 0
        for bucket, n in zip(g["bucket"], g["n"]):
            offsets[(prio, int(bucket))] = run
            run += int(n)
        totals[prio] = run
    lookup_ref = ray.put((offsets, totals))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        offs, tots = ray.get(lookup_ref)
        g = g.copy()
        # min-rank within the bucket (ties share cents, so share rank)
        g["local"] = (
            g.groupby(["prio", "bucket"], sort=False)["cents"].rank(
                method="min"
            )
            - 1.0
        )
        off = np.array(
            [offs[(p, b)] for p, b in zip(g["prio"], g["bucket"])], np.int64
        )
        n = np.array([tots[p] for p in g["prio"]], np.int64)
        rank = off + g["local"].to_numpy().astype(np.int64)  # 0-based
        pr = np.where(n > 1, rank / (n - 1), 0.0)
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"],
                "o_orderpriority": g["prio"],
                "pr": round_half_away(pr, 9),
            }
        )

    def tag(b: pa.Table) -> pa.Table:
        cents = np.rint(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        bucket = cents // bucket_cents
        prio_codes = pc.index_in(
            b["o_orderpriority"],
            pa.array(sorted(totals.keys())),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "prio": b["o_orderpriority"],
                "cents": pa.array(cents),
                "bucket": pa.array(bucket),
                "part": pa.array(
                    ((prio_codes * 131 + bucket) % N_PARTS).astype(np.int32)
                ),
            }
        )

    return (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
    )


def events_twap(sf_dir: str):
    """(event_type, twap, n_events): TIME-WEIGHTED average value per event
    type — the irregular-sampling mean (step-function integral / observed
    span) behind TWAP/uptime/billing metrics, where the plain AVG
    over-weights bursts. Ordering-dependent, so it can't be a plain
    groupby; and event_type has ~5 values, so one map_groups per type is a
    fact-scale single-task sort (the skew anti-pattern). Two-level exact
    plan instead:

      local: rows co-locate by hash(type, DAY) — within a partition one
        vectorized sort + consecutive-pair product per (type, day) bucket
        emits (inner int64 pair-sum, first/last boundary row) per bucket.
        Ties order (tms, event_id), and a tie can never straddle buckets.
      driver: the bounded (types x days) bucket rows chain in day order —
        each bucket boundary adds last_vc[i] * (first_tms[i+1] -
        last_tms[i]) — then ONE double division per type, the identical
        expression the SQL lead() plan evaluates (value on the cents
        lattice x epoch-ms ints = exact int64 partials, order-free).

    Types with < 2 events carry no interval and are excluded (the
    oracle's HAVING)."""
    N_PARTS = 64
    MS_PER_DAY = 86_400_000

    events = _read(sf_dir, "events", ["event_type", "event_id", "ts", "value"])

    def tag(b: pa.Table) -> pa.Table:
        ts = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[ns]")
            .astype(np.int64)
        )
        tms = ts // 1_000_000
        day = tms // MS_PER_DAY
        vc = np.rint(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        tcodes = pd.util.hash_array(
            b["event_type"].to_numpy(zero_copy_only=False), categorize=False
        ).astype(np.int64)
        return pa.table(
            {
                "t": b["event_type"],
                "eid": pc.cast(b["event_id"], pa.int64()),
                "tms": pa.array(tms),
                "day": pa.array(day),
                "vc": pa.array(vc),
                "part": pa.array(
                    ((tcodes * 1_000_003 + day) % N_PARTS).astype(np.int32)
                ),
            }
        )

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "day", "tms", "eid"], kind="stable")
        rows = []
        # bounded loop: <= types x days buckets exist in the WHOLE dataset
        for (t, day), sub in g.groupby(["t", "day"], sort=False):
            tms = sub["tms"].to_numpy()
            vc = sub["vc"].to_numpy()
            inner = (
                int(np.sum(vc[:-1] * (tms[1:] - tms[:-1])))
                if len(tms) > 1
                else 0
            )
            rows.append(
                {
                    "t": t,
                    "day": int(day),
                    "inner": inner,
                    "first_tms": int(tms[0]),
                    "last_tms": int(tms[-1]),
                    "last_vc": int(vc[-1]),
                    "n": len(tms),
                }
            )
        return pd.DataFrame(
            rows,
            columns=["t", "day", "inner", "first_tms", "last_tms", "last_vc", "n"],
        )

    buckets = (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_stats, batch_format="pandas")
        .to_pandas()  # bounded: types x days rows
        .sort_values(["t", "day"])
    )
    out_t, out_twap, out_n = [], [], []
    for t, sub in buckets.groupby("t", sort=True):
        n = int(sub["n"].sum())
        if n < 2:
            continue
        total = int(sub["inner"].sum())
        lv = sub["last_vc"].to_numpy()
        lt = sub["last_tms"].to_numpy()
        ft = sub["first_tms"].to_numpy()
        if len(sub) > 1:
            total += int(np.sum(lv[:-1] * (ft[1:] - lt[:-1])))
        span = int(sub["last_tms"].iloc[-1] - sub["first_tms"].iloc[0])
        out_t.append(t)
        out_twap.append(round_half_away(float(total) / (100.0 * span), 9))
        out_n.append(n)
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "twap": pa.array(out_twap, pa.float64()),
            "n_events": pa.array(out_n, pa.int64()),
        }
    )


def returnflag_mode_quantity(sf_dir: str):
    """(l_returnflag, mode_quantity, n): the MODAL order quantity per
    return flag — grouped mode with the deterministic (count desc, value
    asc) tie-break. The fact scan collapses to exact integer (flag,
    quantity) counts per block (bounded grid: flags x distinct quantities
    ~ 150 rows), one small groupby merges the partials, and the argmax
    runs in one task over the grid — no fact row ever shuffles."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "f": b["l_returnflag"],
                "m": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        return _agg_rename(
            t.group_by(["f", "m"]).aggregate([("n", "sum")]), {"n_sum": "n"}
        )

    grid = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["f", "m"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded grid
    )
    top = grid.sort_values(
        ["f", "n", "m"], ascending=[True, False, True], kind="stable"
    ).drop_duplicates("f")
    return pa.table(
        {
            "l_returnflag": pa.array(top["f"].to_numpy(), pa.string()),
            "mode_quantity": pa.array(
                top["m"].to_numpy().astype(np.int64), pa.int64()
            ),
            "n": pa.array(top["n"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


def daily_outer_join(sf_dir: str):
    """(day, n_orders, n_ships): daily order volume FULL OUTER JOINed with
    daily ship volume — the join family's last missing shape (inner/_attach,
    bloom SEMI, ANTI, as-of, range are covered elsewhere). The date ranges
    genuinely differ (shipping trails ordering), so both null sides occur.

    Scale shape: each fact table collapses to per-block (day, n) integer
    partials BEFORE any shuffle; the tagged union of the two day-bounded
    partial sets co-locates by day in ONE groupby-sum whose zero-fill IS
    the outer join — no row-level join, no fact-scale exchange."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate"])
    ships = _read(sf_dir, "lineitem", ["l_shipdate"])

    def day_partial(col: str, tag: int):
        def f(b: pa.Table) -> pa.Table:
            days = (
                b[col].to_numpy(zero_copy_only=False)
                .astype("datetime64[D]")
                .astype(np.int64)
            )
            u, c = np.unique(days, return_counts=True)
            zero = np.zeros(len(u), np.int64)
            return pa.table(
                {
                    "day_i": pa.array(u),
                    "n_orders": pa.array(c if tag == 0 else zero),
                    "n_ships": pa.array(c if tag == 1 else zero),
                }
            )

        return f

    merged = (
        orders.map_batches(day_partial("o_orderdate", 0), batch_format="pyarrow")
        .union(
            ships.map_batches(day_partial("l_shipdate", 1), batch_format="pyarrow")
        )
        .groupby("day_i")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_ships", alias_name="n_ships"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        days = b["day_i"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        return pa.table(
            {
                "day": pa.array(days.astype("datetime64[us]")),
                "n_orders": pc.cast(b["n_orders"], pa.int64()),
                "n_ships": pc.cast(b["n_ships"], pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def key_skew_profile(sf_dir: str, table: str = "lineitem", key: str = "l_partkey"):
    """One-row (n_keys, n_rows, top1_share, top10_share, gini): the
    partition-skew profile of a shuffle key — the diagnostic behind every
    "salt the hot keys / pick the partitioner" decision this engine makes
    (the north rule's explicit-skew-handling story, measured rather than
    assumed). Gini over per-key counts: 0 = perfectly balanced partitions,
    →1 = one hot key owns the table.

    Exact at scale without sorting the key counts: the (key, n) table
    collapses to a COUNT-OF-COUNTS histogram (n, m) — bounded by the
    number of DISTINCT count values, tiny in practice — and the Gini's
    rank sum folds from the histogram with pure int64 arithmetic:
    ascending-rank block starting after s keys contributes
    n * (m*s + m*(m+1)//2). One final double expression, mirrored in SQL."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, table, [key])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"k": b[key], "n": pa.array(np.ones(b.num_rows, np.int64))}
        )
        return _agg_rename(
            t.group_by(["k"]).aggregate([("n", "sum")]), {"n_sum": "n"}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, m = np.unique(n, return_counts=True)
        return pa.table(
            {"n": pa.array(u), "m": pa.array(m.astype(np.int64))}
        )

    hist = (
        counts.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n")
        .aggregate(Sum("m", alias_name="m"))
        .to_pandas()  # bounded: distinct count VALUES
        .sort_values("n")
    )
    nvals = hist["n"].to_numpy().astype(np.int64)
    mvals = hist["m"].to_numpy().astype(np.int64)
    n_keys = int(mvals.sum())
    n_rows = int((nvals * mvals).sum())
    # exact rank sum over the ascending count multiset
    starts = np.concatenate(([0], np.cumsum(mvals)[:-1]))
    s1 = int(np.sum(nvals * (mvals * starts + mvals * (mvals + 1) // 2)))
    gini = 2.0 * s1 / (n_keys * n_rows) - (n_keys + 1.0) / n_keys
    # top-k shares from the histogram tail (largest counts first)
    top1 = int(nvals[-1])
    remaining, top10 = 10, 0
    for n, m in zip(nvals[::-1], mvals[::-1]):
        take = min(remaining, int(m))
        top10 += int(n) * take
        remaining -= take
        if remaining == 0:
            break
    return pa.table(
        {
            "n_keys": pa.array([n_keys], pa.int64()),
            "n_rows": pa.array([n_rows], pa.int64()),
            "top1_share": pa.array(
                [round_half_away(top1 / n_rows, 9)], pa.float64()
            ),
            "top10_share": pa.array(
                [round_half_away(top10 / n_rows, 9)], pa.float64()
            ),
            "gini": pa.array([round_half_away(gini, 9)], pa.float64()),
        }
    )


def user_value_intervals(sf_dir: str):
    """(user_id, valid_from, valid_to, value): the SCD-2 validity-interval
    table built from the user's event stream — each event's value holds
    from its timestamp until the user's next event; the open tail closes
    at the 9999-12-31 sentinel (the standard warehouse idiom, and it keeps
    the oracle compare null-free). Ordering ties break on event_id, the
    same ORDER BY the SQL lead() evaluates.

    Scale shape: users hash-partition (the `order_interarrival` plan); one
    vectorized sort + grouped shift per partition; only (user, ts, value,
    event_id) rows move, once."""
    SENTINEL = np.datetime64("9999-12-31T00:00:00", "us")

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def intervals_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        # us precision: the 9999 sentinel overflows datetime64[ns]
        ts_us = g["ts"].astype("datetime64[us]")
        nxt = (
            ts_us.groupby(g["user_id"].to_numpy(), sort=False)
            .shift(-1)
            .fillna(pd.Timestamp(SENTINEL))
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"],
                "valid_from": ts_us,
                "valid_to": nxt.astype("datetime64[us]"),
                "value": g["value"],
            }
        )

    return _by_partition(ev, "user_id", intervals_part)


def customer_spend_deciles(sf_dir: str, tiles: int = 10):
    """(decile, n_customers, total_spend): customers bucketed into
    equal-height spend deciles (SQL NTILE) and aggregated — the
    distributed EQUI-HEIGHT bucketing shape (percent_rank's sibling:
    NTILE needs global ROW numbers, not min-ranks, so the tie-break
    (spend, custkey) makes the order total and row_number == rank).

    Plan: lineitem collapses to exact per-customer spend cents via the
    orders join (cost-based `_attach_or_join`); the two-pass range-bucket
    window then runs on the CUSTOMER-scale table: bounded spend-cents
    grid -> driver prefix offsets -> hash(bucket) co-location where each
    partition computes exact global row numbers vectorized; ntile =
    (rank0 * tiles) // n + 1 reproduces SQL NTILE's earlier-tiles-bigger
    split. The final decile aggregate is tiles-bounded."""
    from ray.data.aggregate import Sum

    N_PARTS = 64
    BUCKET = 1_000_000  # cents per grid cell

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def li_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table({"o_orderkey": b["l_orderkey"], "cents": pa.array(cents)})
        return _agg_rename(
            t.group_by(["o_orderkey"]).aggregate([("cents", "sum")]),
            {"cents_sum": "cents"},
        )

    per_order = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("cents", alias_name="cents"))
    )
    with_cust = _attach_or_join(
        per_order,
        "o_orderkey",
        orders,
        "o_orderkey",
        ["o_custkey"],
        _join_partitions(n_joins=1),
        launder_fact=True,
        dim_count_hint=_table_rows(sf_dir, "orders"),
    )
    spend = (
        with_cust.map_batches(
            lambda b: pa.table(
                {"cust": b["o_custkey"], "cents": b["cents"]}
            ),
            batch_format="pyarrow",
        )
        .groupby("cust")
        .aggregate(Sum("cents", alias_name="cents"))
    ).materialize()

    # pass 1: bounded (bucket, count) grid -> offsets
    def grid_partial(b: pa.Table) -> pa.Table:
        bu = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64) // BUCKET
        u, c = np.unique(bu, return_counts=True)
        return pa.table({"bucket": pa.array(u), "n": pa.array(c.astype(np.int64))})

    grid = (
        spend.map_batches(grid_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    offsets = dict(
        zip(
            grid["bucket"].astype(int),
            np.concatenate(([0], np.cumsum(grid["n"].to_numpy())[:-1])).astype(int),
        )
    )
    n_total = int(grid["n"].sum())
    off_ref = ray.put(offsets)

    def tag(b: pa.Table) -> pa.Table:
        cents = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        bu = cents // BUCKET
        return pa.table(
            {
                "cust": pc.cast(b["cust"], pa.int64()),
                "cents": pa.array(cents),
                "bucket": pa.array(bu),
                "part": pa.array((bu * 2654435761 % N_PARTS).astype(np.int32)),
            }
        )

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["bucket", "cents", "cust"], kind="stable")
        local = g.groupby("bucket", sort=False).cumcount().to_numpy()
        base = np.array([offs[int(x)] for x in g["bucket"]], np.int64)
        rank0 = base + local
        # SQL NTILE split: first (n % k) tiles carry one extra row
        q, r = divmod(n_total, tiles)
        cut = r * (q + 1)
        in_big = rank0 // (q + 1)  # tiles of size q+1
        in_small = r + np.maximum(rank0 - cut, 0) // max(q, 1)
        decile = np.where(rank0 < cut, in_big, in_small) + 1
        return pd.DataFrame(
            {
                "decile": decile.astype(np.int64),
                "n_customers": np.ones(len(g), np.int64),
                "cents": g["cents"].to_numpy(),
            }
        )

    per_tile = (
        spend.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
        .groupby("decile")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("cents", alias_name="cents"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        cents = b["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "decile": pc.cast(b["decile"], pa.int64()),
                "n_customers": pc.cast(b["n_customers"], pa.int64()),
                "total_spend": pa.array(
                    round_half_away(cents / 100.0, 2), pa.float64()
                ),
            }
        )

    return per_tile.map_batches(finish, batch_format="pyarrow")


# -- watermark-gated streaming window (late-data policy) ----------------------

def events_watermark_agg(
    sf_dir: str,
    window_min: int = 60,
    watermark_min: int = 30,
    max_late_ms: int = 5_400_000,
):
    """Streaming tumbling-window aggregate with WATERMARK semantics on a
    batch engine: each event gets a deterministic synthetic arrival time
    (event-time + a hash jitter ≤ ``max_late_ms`` — the out-of-order
    delivery a real ingest pipeline sees), the watermark is the max
    arrival seen so far minus ``watermark_min``, a window FIRES when the
    watermark passes its end, and events arriving after their window
    fired are LATE — excluded from the aggregate and counted, the
    drop-late policy of every streaming engine. Deterministic given the
    total arrival order (ties break by event_id), so the whole semantics
    is exactly SQL-checkable via a running-max window function.

    Scale shape (no global sort, no fact-scale window function): an event
    is late iff SOME strictly-earlier arrival already carried the
    watermark past its window end — i.e. iff an arrival exists in
    [t_fire(e), arr(e)) (plus the arr-tie/id rule). That probe range is
    bounded by the jitter bound, so arrivals are announced to their own
    and the NEXT ``max_late_ms`` bucket (duplication ×2 of (arr, id)
    pairs only), queries co-locate with their own bucket, and one
    vectorized searchsorted pass per partition (disjoint virtual
    segments per bucket, dense composite ranks for the tie rule) flags
    every event. Per-partition integer partials then one tiny
    (windows × partitions)-bounded groupby-sum finish it."""
    import ray
    from ray.data.aggregate import Sum

    WIN = window_min * 60_000
    FIRE = WIN + watermark_min * 60_000
    B = max_late_ms  # probe width arr-t_fire < max_late - watermark < B
    N_PARTS = 64

    ev = _read(sf_dir, "events", ["event_id", "ts", "value"])

    def expand(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tms = (
            b["ts"].to_numpy().astype("datetime64[ms]").astype(np.int64)
        )
        v100 = round_half_away(
            pc.multiply(b["value"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        # overflow-safe jitter (round-4 advice): reduce mod B BEFORE the
        # multiply — (e*k) % B == ((e%B)*k) % B, and (B-1)*k ~ 1.4e16 stays
        # inside int64 at ANY id range (a raw e*k wraps silently in numpy
        # at e >= ~3.5e9 while DuckDB raises, a latent parity split). The
        # oracle SQL applies the same pre-reduction.
        arr = tms + ((ids % B) * 2654435761) % B
        ws = tms // WIN * WIN
        t_fire = ws + FIRE
        bkt = arr // B
        n = len(ids)
        # query rows (role 0) to their own bucket; arrival announcements
        # (role 1) to own and next bucket
        return pa.table(
            {
                "bkt": pa.array(np.concatenate([bkt, bkt, bkt + 1])),
                "part": pa.array(
                    (np.concatenate([bkt, bkt, bkt + 1]) % N_PARTS).astype(
                        np.int32
                    )
                ),
                "role": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(2 * n, np.int8)]
                    )
                ),
                "arr": pa.array(np.concatenate([arr, arr, arr])),
                "event_id": pa.array(np.concatenate([ids, ids, ids])),
                "t_fire": pa.array(
                    np.concatenate([t_fire, np.zeros(2 * n, np.int64)])
                ),
                "ws": pa.array(
                    np.concatenate([ws, np.zeros(2 * n, np.int64)])
                ),
                "v100": pa.array(
                    np.concatenate([v100, np.zeros(2 * n, np.int64)])
                ),
            }
        )

    def flag_part(g: pd.DataFrame) -> pd.DataFrame:
        stride = 3 * B
        is_q = g["role"].to_numpy() == 0
        bkt = g["bkt"].to_numpy().astype(np.int64)
        arr = g["arr"].to_numpy().astype(np.int64)
        ids = g["event_id"].to_numpy().astype(np.int64)
        virt = bkt * stride + (arr - (bkt - 1) * B)
        q_virt, q_ids = virt[is_q], ids[is_q]
        t_virt = bkt[is_q] * stride + (
            g["t_fire"].to_numpy().astype(np.int64)[is_q] - (bkt[is_q] - 1) * B
        )
        a_virt, a_ids = virt[~is_q], ids[~is_q]
        # dense composite ranks so the (virt, id) lex order searchsorts as
        # ONE int64 key (virt*const would overflow on epoch-scale values)
        vpool = np.unique(np.concatenate([a_virt, q_virt, t_virt]))
        ipool = np.unique(np.concatenate([a_ids, q_ids]))
        M = len(ipool) + 1
        a_key = np.searchsorted(vpool, a_virt) * M + (
            np.searchsorted(ipool, a_ids) + 1
        )
        q_key = np.searchsorted(vpool, q_virt) * M + (
            np.searchsorted(ipool, q_ids) + 1
        )
        t_key = np.searchsorted(vpool, t_virt) * M  # id = -inf
        a_key.sort()
        ins = np.searchsorted(a_key, q_key, side="left")
        lo = np.searchsorted(a_key, t_key, side="left")
        late = ins > lo
        ws = g["ws"].to_numpy().astype(np.int64)[is_q]
        v100 = g["v100"].to_numpy().astype(np.int64)[is_q]
        out = pd.DataFrame(
            {
                "window_start_ms": ws,
                "n_on_time": (~late).astype(np.int64),
                "n_late": late.astype(np.int64),
                "sum_v100": np.where(late, 0, v100),
            }
        )
        return (
            out.groupby("window_start_ms", as_index=False)[
                ["n_on_time", "n_late", "sum_v100"]
            ].sum()
        )

    partials = (
        ev.map_batches(expand, batch_format="pyarrow")
        .groupby("part")
        .map_groups(flag_part, batch_format="pandas")
    )
    return partials.groupby("window_start_ms").aggregate(
        Sum("n_on_time", alias_name="n_on_time"),
        Sum("n_late", alias_name="n_late"),
        Sum("sum_v100", alias_name="sum_v100"),
    )


# -- order-invariant table checksum (replication / migration integrity) -------

def events_checksum(sf_dir: str):
    """Per event_type: row count + ORDER-INVARIANT content checksum —
    the anti-entropy primitive that verifies a replicated / migrated /
    re-partitioned copy of a fact table without sorting or shuffling it
    (sums commute, so any block order and any partitioning give the same
    answer; compare two copies' outputs to find which type diverged).

    Row digest: md5 over a canonical '|'-joined string of the row's
    fields with floats pinned to the 0.01 integer lattice and timestamps
    to epoch-ms, so both engines hash IDENTICAL bytes; the first 8 hex
    chars as int64 summed per type (32-bit digests keep the int64 sum
    exact up to ~2^31 rows per type — the 100-TB variant widens to two
    parallel 8-hex sums). Per-block integer partials, one tiny groupby."""
    import hashlib

    from ray.data.aggregate import Sum

    ev = _read(
        sf_dir, "events", ["event_id", "user_id", "event_type", "value", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        typ = b["event_type"].to_pylist()
        sv = round_half_away(
            pc.multiply(b["value"], 100.0).to_numpy(), 0
        ).astype(np.int64)
        tms = b["ts"].to_numpy().astype("datetime64[ms]").astype(np.int64)
        digests = np.fromiter(
            (
                int(
                    hashlib.md5(
                        f"{i}|{u}|{t}|{s}|{m}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                for i, u, t, s, m in zip(ids, uid, typ, sv, tms)
            ),
            np.int64,
            len(ids),
        )
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(len(ids), np.int64)),
                "csum": pa.array(digests),
            }
        )
        return _agg_rename(
            t.group_by("event_type").aggregate([("n", "sum"), ("csum", "sum")]),
            {"n_sum": "n", "csum_sum": "csum"},
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Sum("csum", alias_name="checksum"),
        )
    )


# -- per-user journey assembly + sequence pattern match ------------------------

def user_journey_match(sf_dir: str, pattern: str = "v[ce]*p"):
    """Sequence analytics over event streams: each user's events collapse
    (ordered by ts, event_id) into a JOURNEY string of event-type
    initials (c/e/p/s/v — unique by construction in this domain), and
    users whose journey matches a regex are returned with the journey —
    the behavioral-cohort query ("viewed, then purchased with only
    clicks/errors between") that funnels can't express because ORDER and
    INTERVENING events matter. Default pattern: view -> purchase with
    only click/error between.

    Scale shape: events co-locate once by hash(user) % 64 (the
    sessionize partitioning assumption: one user's events fit one
    group); per partition ONE vectorized sort + groupby-join builds all
    journeys and one compiled-regex pass flags them. Journey rows are
    user-bounded, never event-bounded."""
    import re as _re

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def initial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "ts": b["ts"],
                "ini": pc.utf8_slice_codeunits(b["event_type"], 0, 1),
            }
        )

    rx = _re.compile(pattern)

    def journeys(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        j = g.groupby("user_id", sort=True)["ini"].agg("".join).reset_index()
        j.columns = ["user_id", "journey"]
        keep = j["journey"].map(lambda s: rx.search(s) is not None)
        return j[keep]

    return _by_partition(ev.map_batches(initial, batch_format="pyarrow"),
                         "user_id", journeys)


# -- keyed MERGE / upsert (CDC apply) ------------------------------------------

def merge_upsert(
    base,
    upserts,
    deletes,
    key_col: str = "doc_id",
    val_col: str = "text",
):
    """Lakehouse MERGE INTO: apply a change batch — upsert rows (insert or
    replace by key) and delete keys — to a keyed base table, producing the
    next snapshot; the batch-side CDC APPLY that pairs with `corpus_diff`
    (diff extracts the change set, this replays it elsewhere).

    Scale shape: ONE hash(key) co-location of the tagged union (base rows
    + upsert rows + delete markers); inside each partition a vectorized
    keep-last-by-priority (upsert > base) + delete mask resolves every
    key — no driver state, change batches and base both stream. Exact
    against the FULL OUTER JOIN + COALESCE SQL."""
    N_PARTS = 64

    def tag(role: int, with_val: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                key_col: pa.array(ids),
                "part": pa.array(
                    (ids * 2654435761 % N_PARTS).astype(np.int32)
                ),
                "role": pa.array(np.full(len(ids), role, np.int8)),
            }
            if with_val:
                # normalize to string: parquet corpora read as large_string
                # and a mixed union emits schema-inconsistent blocks
                cols[val_col] = pc.cast(b[val_col], pa.string())
            else:
                cols[val_col] = pa.array([None] * len(ids), pa.string())
            return pa.table(cols)

        return f

    tagged = (
        base.map_batches(tag(0, True), batch_format="pyarrow")
        .union(upserts.map_batches(tag(1, True), batch_format="pyarrow"))
        .union(deletes.map_batches(tag(2, False), batch_format="pyarrow"))
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # highest role wins per key: delete(2) > upsert(1) > base(0)
        g = g.sort_values([key_col, "role"], kind="stable")
        last = g.groupby(key_col, sort=False).tail(1)
        keep = last[last["role"] != 2]
        return keep[[key_col, val_col]]

    return tagged.groupby("part").map_groups(resolve, batch_format="pandas")
