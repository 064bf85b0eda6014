"""Driver-checked query suite: Ray Data pipelines + DuckDB oracle SQL.

Every entry implements one operator/pipeline from SURVEY §2 as an idiomatic
Ray Data pipeline over the driver's parquet tables, with (where
SQL-expressible) a DuckDB oracle producing identical column names/types so
the driver's row-count + schema + order-insensitive value-hash passes.

Conventions:
* every computed float that involves arithmetic is rounded to a fixed
  number of decimals on BOTH sides (fp-reassociation differs between
  engines); pass-through values are left exact.
* timestamps stay ``timestamp[us]``; int aggregates cast to int64/BIGINT.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..stages import window as SW
from ..stages.asof import asof_join
from ..stages.relational import broadcast_join, semi_join

GAP_30M_US = 1_800_000_000


def _read(sf_dir: str, table: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round(ds: Dataset, cols: dict[str, int]) -> Dataset:
    """Round float columns to fixed decimals (half-away-from-zero, matching
    DuckDB's ROUND) so value-hashes are fp-reassociation-proof."""
    def fn(t: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            arr = pc.round(pc.cast(t[c], pa.float64()), ndigits=nd,
                           round_mode="half_towards_infinity")
            t = t.set_column(t.column_names.index(c),
                             pa.field(c, pa.float64()), arr)
        return t
    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Relational core (TPC-H-ish; proves general query capability)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H Q1 shape: filtered grouped aggregate over lineitem with a
    vectorized derived column (S2+M10+G1 analog)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = pa.scalar(datetime.datetime(1998, 9, 2), type=pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Mean("l_quantity", alias_name="avg_qty"),
        Mean("l_extendedprice", alias_name="avg_price"),
        Count(alias_name="count_order"),
    )
    return _round(out, {"sum_base_price": 2, "sum_disc_price": 2,
                        "avg_qty": 4, "avg_price": 4})


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                    AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4)                         AS avg_qty,
       round(avg(l_extendedprice), 4)                    AS avg_price,
       count(*)                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def filter_high_value_orders(sf_dir: str) -> Dataset:
    """Predicate filter + projection (M12 analog); values pass through
    exactly (no rounding needed)."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
                "o_orderstatus"])

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater(t["o_totalprice"], pa.scalar(200000.0)),
                       pc.equal(t["o_orderstatus"], pa.scalar("O")))
        return t.filter(mask).select(
            ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])

    return ds.map_batches(fn, batch_format="pyarrow")


FILTER_HIGH_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders WHERE o_totalprice > 200000 AND o_orderstatus = 'O'
"""


def topk_orders(sf_dir: str) -> Dataset:
    """Global top-k: sort + limit (O3 analog, generalized)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"],
                   descending=[True, False]).limit(10)


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def customers_per_nation(sf_dir: str) -> Dataset:
    """Broadcast dimension join + grouped aggregate (J1/J2 analog)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey",
                                      "c_acctbal"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    joined = broadcast_join(cust, nation, left_key="c_nationkey",
                            right_key="n_nationkey",
                            right_value_cols=["n_name"])
    out = joined.groupby("n_name").aggregate(
        Count(alias_name="n_customers"),
        Mean("c_acctbal", alias_name="avg_acctbal"))
    return _round(out, {"avg_acctbal": 4})


CUSTOMERS_PER_NATION_SQL = """
SELECT n_name, count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def lineitem_big_parts(sf_dir: str) -> Dataset:
    """Broadcast semi-join filter (M13 analog) + grouped count."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"])
    parts = _read(sf_dir, "part", ["p_partkey", "p_size"]).filter(
        lambda r: r["p_size"] >= 40)
    filtered = semi_join(li, parts, left_key="l_partkey",
                         right_key="p_partkey")
    return filtered.groupby("l_returnflag").aggregate(
        Count(alias_name="n_items"))


LINEITEM_BIG_PARTS_SQL = """
SELECT l_returnflag, count(*) AS n_items
FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
GROUP BY l_returnflag
"""


def events_by_type(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="value_sum"),
        Mean("value", alias_name="value_avg"))
    return _round(out, {"value_sum": 4, "value_avg": 6})


EVENTS_BY_TYPE_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS value_sum,
       round(avg(value), 6) AS value_avg
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Windowed operators over events (the engine's core semantics)
# ---------------------------------------------------------------------------

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def lag_events(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "events", _EVENT_COLS)
    out = SW.shift(ds, "user_id", ["ts"], ["value"], periods=1,
                   num_buckets=32)
    return out.select_columns(["event_id", "user_id", "ts", "value",
                               "value_lag1"])


LAG_EVENTS_SQL = """
SELECT event_id, user_id, ts, value,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag1
FROM events
"""


def lead_events(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "events", _EVENT_COLS)
    out = SW.shift(ds, "user_id", ["ts"], ["value"], periods=-1,
                   num_buckets=32)
    return out.select_columns(["event_id", "user_id", "ts", "value",
                               "value_lead1"])


LEAD_EVENTS_SQL = """
SELECT event_id, user_id, ts, value,
       lead(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lead1
FROM events
"""


def sessionize_events(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = SW.sessionize(ds, "user_id", "ts",
                        datetime.timedelta(minutes=30), num_buckets=32)
    return out.select_columns(["event_id", "user_id", "ts", "session_id"])


SESSIONIZE_EVENTS_SQL = f"""
SELECT event_id, user_id, ts,
       CAST(SUM(CASE WHEN gap > {GAP_30M_US} THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (SELECT event_id, user_id, ts,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                       ts) AS gap
      FROM events)
"""


def sliding_mean_events(sf_dir: str) -> Dataset:
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = SW.sliding_agg(ds, "user_id", ["ts"], "value", 5,
                         aggs=("mean",), num_buckets=32)
    out = out.select_columns(["event_id", "user_id", "ts", "value_w5_mean"])
    return _round(out, {"value_w5_mean": 6})


SLIDING_MEAN_EVENTS_SQL = """
SELECT event_id, user_id, ts,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS 4 PRECEDING), 6) AS value_w5_mean
FROM events
"""


def ffill_events(sf_dir: str) -> Dataset:
    """Forward-fill a sparse derived column (last purchase value per user —
    J3/backfill analog); values pass through exactly."""
    ds = _read(sf_dir, "events", _EVENT_COLS)

    def derive(t: pa.Table) -> pa.Table:
        pv = pc.if_else(pc.equal(t["event_type"], pa.scalar("purchase")),
                        t["value"], pa.nulls(len(t), type=pa.float64()))
        return t.append_column("purchase_value", pv)

    ds = ds.map_batches(derive, batch_format="pyarrow")
    out = SW.fill(ds, "user_id", ["ts"], ["purchase_value"],
                  method="ffill", num_buckets=32)
    return out.select_columns(["event_id", "user_id", "ts",
                               "purchase_value_ffill"])


FFILL_EVENTS_SQL = """
SELECT event_id, user_id, ts,
       last_value(CASE WHEN event_type = 'purchase' THEN value END
                  IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS purchase_value_ffill
FROM events
"""


def _asof_events_orders(sf_dir: str, broadcast: bool) -> Dataset:
    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])
    # dedupe right side per (entity, ts) so the matched row is unambiguous
    right = orders.groupby(["o_custkey", "o_orderdate"]).aggregate(
        Max("o_totalprice", alias_name="order_price"))
    return asof_join(events, right,
                     left_by="user_id", right_by="o_custkey",
                     left_on="ts", right_on="o_orderdate",
                     right_value_cols=["order_price"],
                     broadcast=broadcast, num_buckets=32)


def asof_events_orders(sf_dir: str) -> Dataset:
    """Partitioned (large-large) as-of join plan (J6 / north-rule op)."""
    return _asof_events_orders(sf_dir, broadcast=False)


def asof_events_orders_broadcast(sf_dir: str) -> Dataset:
    """Broadcast (small right) as-of join plan over the same inputs."""
    return _asof_events_orders(sf_dir, broadcast=True)


ASOF_EVENTS_ORDERS_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_totalprice) AS order_price
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts, r.order_price
FROM events e
ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


def session_stats_events(sf_dir: str) -> Dataset:
    """Composition: sessionize → per-(user, session) aggregate (the
    reference's per-group feature row shape, SQL-checkable)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    sess = SW.sessionize(ds, "user_id", "ts",
                         datetime.timedelta(minutes=30), num_buckets=32)

    def agg(t: pa.Table) -> pa.Table:
        # per-bucket final aggregate: sessions are bucket-complete
        import numpy as np
        from ..functions import tokenstats as TS
        from ..stages.partition import sort_table
        t = sort_table(t, ["user_id", "session_id", "ts"])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        sid = t["session_id"].to_numpy(zero_copy_only=False)
        new = np.r_[True, (uid[1:] != uid[:-1]) | (sid[1:] != sid[:-1])] \
            if len(t) else np.zeros(0, bool)
        gid = np.cumsum(new) - 1
        offs = TS.group_offsets(gid)
        starts, n_rows = offs[:-1], np.diff(offs)
        tsv = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ends = offs[1:] - 1
        val = t["value"].cast(pa.float64()).to_numpy(zero_copy_only=False)
        vsum = np.add.reduceat(val, starts) if len(t) else np.zeros(0)
        return pa.table({
            "user_id": pa.array(uid[starts], type=pa.int64()),
            "session_id": pa.array(sid[starts], type=pa.int64()),
            "n_events": pa.array(n_rows, type=pa.int64()),
            "span_us": pa.array(tsv[ends] - tsv[starts], type=pa.int64()),
            "value_sum": pa.array(vsum, type=pa.float64()),
        })

    out = SW.bucketed_apply(sess, "user_id", agg, num_buckets=32,
                            drop_bucket=False)
    return _round(out, {"value_sum": 4})


SESSION_STATS_SQL = f"""
WITH s AS (
  SELECT user_id, ts, value,
         CAST(SUM(CASE WHEN gap > {GAP_30M_US} THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (SELECT user_id, ts, value,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                         ts) AS gap
        FROM events)
)
SELECT user_id, session_id, count(*) AS n_events,
       date_diff('microsecond', min(ts), max(ts)) AS span_us,
       round(sum(value), 4) AS value_sum
FROM s GROUP BY user_id, session_id
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "filter_high_value_orders": filter_high_value_orders,
    "topk_orders": topk_orders,
    "customers_per_nation": customers_per_nation,
    "lineitem_big_parts": lineitem_big_parts,
    "events_by_type": events_by_type,
    "lag_events": lag_events,
    "lead_events": lead_events,
    "sessionize_events": sessionize_events,
    "sliding_mean_events": sliding_mean_events,
    "ffill_events": ffill_events,
    "asof_events_orders": asof_events_orders,
    "asof_events_orders_broadcast": asof_events_orders_broadcast,
    "session_stats_events": session_stats_events,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "filter_high_value_orders": FILTER_HIGH_SQL,
    "topk_orders": TOPK_SQL,
    "customers_per_nation": CUSTOMERS_PER_NATION_SQL,
    "lineitem_big_parts": LINEITEM_BIG_PARTS_SQL,
    "events_by_type": EVENTS_BY_TYPE_SQL,
    "lag_events": LAG_EVENTS_SQL,
    "lead_events": LEAD_EVENTS_SQL,
    "sessionize_events": SESSIONIZE_EVENTS_SQL,
    "sliding_mean_events": SLIDING_MEAN_EVENTS_SQL,
    "ffill_events": FFILL_EVENTS_SQL,
    "asof_events_orders": ASOF_EVENTS_ORDERS_SQL,
    "asof_events_orders_broadcast": ASOF_EVENTS_ORDERS_SQL,
    "session_stats_events": SESSION_STATS_SQL,
}
