"""Spatial fixtures derived deterministically from the driver testdata.

FIXTURES.md §8: every spatial operator needs an ANSI-SQL-expressible
oracle, so geometry columns are derived from numeric columns of the
TPC-H-ish tables by plain arithmetic — the SAME expressions live here
once, emitted both as vectorized Arrow readers (Ray side) and as SQL
snippets (DuckDB oracle side).

Fixtures:
* points  — events:   id=event_id, x=value, y=user_id (as double)
* rects   — lineitem: unit envelopes around (extendedprice, 1000*discount)
* rectsS  — supplier: envelopes from (s_acctbal, 10*s_nationkey)  (small join side)
* rectsP  — part:     envelopes from (p_retailprice, p_size)      (large join side)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import grid as G

# ---- points (events) ------------------------------------------------------

POINTS_SQL = (
    "SELECT event_id AS id, value AS x, CAST(user_id AS DOUBLE) AS y FROM events"
)


def points_ds(sf_dir: str, num_blocks: int | None = None):
    from .io import read_parquet_sized

    kw = {} if num_blocks is None else {"override_num_blocks": num_blocks}
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "value", "user_id"], **kw
    )

    def f(b: pa.Table) -> pa.Table:
        x = b.column("value").to_numpy()
        y = b.column("user_id").to_numpy().astype(np.float64)
        return pa.table(
            {
                "id": b.column("event_id"),
                "x": b.column("value"),
                "y": y,
                "minx": x, "miny": y, "maxx": x, "maxy": y,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# world bounds for the events fixture: value <= ~561, user_id <= 1499 at
# sf0.1. Fixed constants (NOT data-dependent) so cell ids are stable
# across scale factors; cell_coords clips outliers into edge cells.
POINTS_BOUNDS = G.Bounds(-1.0, -1.0, 1100.0, 2100.0)


# ---- rects (lineitem) -----------------------------------------------------

# width = l_quantity (1..50), height = 100*(l_tax+0.01); anchored at
# (l_extendedprice, 1000*l_discount).
RECTS_SQL = (
    "SELECT l_orderkey * 8 + l_linenumber AS id, "
    "l_extendedprice AS minx, 1000*l_discount AS miny, "
    "l_extendedprice + l_quantity AS maxx, "
    "1000*l_discount + 100*l_tax + 1.0 AS maxy "
    "FROM lineitem"
)


def rects_ds(sf_dir: str):
    from .io import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity", "l_discount", "l_tax"],
    )

    def f(b: pa.Table) -> pa.Table:
        ep = b.column("l_extendedprice").to_numpy()
        qt = b.column("l_quantity").to_numpy()
        di = b.column("l_discount").to_numpy()
        tx = b.column("l_tax").to_numpy()
        oid = b.column("l_orderkey").to_numpy() * 8 + b.column("l_linenumber").to_numpy()
        return pa.table(
            {
                "id": oid.astype(np.int64),
                "minx": ep,
                "miny": 1000 * di,
                "maxx": ep + qt,
                "maxy": 1000 * di + 100 * tx + 1.0,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


RECTS_BOUNDS = G.Bounds(-1.0, -1.0, 120000.0, 200.0)


# ---- join sides: supplier x part -----------------------------------------

# Both sides mapped into the same plane: x ~ price-ish, y ~ small-int code.
JOIN_LEFT_SQL = (
    "SELECT s_suppkey AS id, s_acctbal AS minx, CAST(s_nationkey AS DOUBLE) AS miny, "
    "s_acctbal + 2000.0 AS maxx, CAST(s_nationkey AS DOUBLE) + 3.0 AS maxy FROM supplier"
)
JOIN_RIGHT_SQL = (
    "SELECT p_partkey AS id, p_retailprice AS minx, CAST(p_size AS DOUBLE) / 2 AS miny, "
    "p_retailprice + 150.0 AS maxx, CAST(p_size AS DOUBLE) / 2 + 2.0 AS maxy FROM part"
)


def join_left_ds(sf_dir: str):
    from .io import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal", "s_nationkey"])

    def f(b: pa.Table) -> pa.Table:
        x = b.column("s_acctbal").to_numpy()
        y = b.column("s_nationkey").to_numpy().astype(np.float64)
        return pa.table(
            {"id": b.column("s_suppkey"), "minx": x, "miny": y,
             "maxx": x + 2000.0, "maxy": y + 3.0}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def join_right_ds(sf_dir: str):
    from .io import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice", "p_size"])

    def f(b: pa.Table) -> pa.Table:
        x = b.column("p_retailprice").to_numpy()
        y = b.column("p_size").to_numpy().astype(np.float64) / 2
        return pa.table(
            {"id": b.column("p_partkey"), "minx": x, "miny": y,
             "maxx": x + 150.0, "maxy": y + 2.0}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


JOIN_BOUNDS = G.Bounds(-1100.0, -1.0, 12000.0, 40.0)

# ---- circles (custom-geometry registry, object.rs:100-153) ----------------

# The reference's own RTreeObject/PointDistance worked example is a
# Circle; this fixture derives circles from events: center = (value,
# user_id), radius = 1 + event_id % 5. Row layout per geom.py: x0/y0 =
# center, x1 = radius.
CIRCLES_SQL = (
    "SELECT event_id AS id, value AS cx, CAST(user_id AS DOUBLE) AS cy, "
    "1.0 + CAST(event_id % 5 AS DOUBLE) AS r FROM events"
)


def circles_ds(sf_dir: str):
    from .io import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "value", "user_id"]
    )

    def f(b: pa.Table) -> pa.Table:
        cx = b.column("value").to_numpy()
        cy = b.column("user_id").to_numpy().astype(np.float64)
        r = 1.0 + (b.column("event_id").to_numpy() % 5).astype(np.float64)
        n = len(b)
        return pa.table(
            {
                "id": b.column("event_id"),
                "minx": cx - r, "miny": cy - r,
                "maxx": cx + r, "maxy": cy + r,
                "geom_kind": pa.array(["circle"] * n),
                "x0": cx, "y0": cy, "x1": r, "y1": np.zeros(n),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


# ---- 3-d fixtures (dimension-generic surface, point.rs:295-323) -----------

POINTS3D_SQL = (
    "SELECT event_id AS id, value AS x, CAST(user_id AS DOUBLE) AS y, "
    "CAST(event_id % 97 AS DOUBLE) AS z FROM events"
)


def points3d_ds(sf_dir: str):
    from .io import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "value", "user_id"]
    )

    def f(b: pa.Table) -> pa.Table:
        z = (b.column("event_id").to_numpy() % 97).astype(np.float64)
        return pa.table(
            {
                "id": b.column("event_id"),
                "x": b.column("value"),
                "y": b.column("user_id").to_numpy().astype(np.float64),
                "z": z,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


POINTS3D_BOUNDS = G.BoundsND([-1.0, -1.0, -1.0], [1100.0, 2100.0, 98.0])

# 3-d join: the 2-d supplier x part sides extruded into a z slab keyed
# by (key % 7) so only overlapping slabs pair up.
JOIN3_LEFT_SQL = (
    "SELECT s_suppkey AS id, s_acctbal AS minx, CAST(s_nationkey AS DOUBLE) AS miny, "
    "CAST(s_suppkey % 7 AS DOUBLE) AS minz, s_acctbal + 2000.0 AS maxx, "
    "CAST(s_nationkey AS DOUBLE) + 3.0 AS maxy, "
    "CAST(s_suppkey % 7 AS DOUBLE) + 1.5 AS maxz FROM supplier"
)
JOIN3_RIGHT_SQL = (
    "SELECT p_partkey AS id, p_retailprice AS minx, CAST(p_size AS DOUBLE) / 2 AS miny, "
    "CAST(p_partkey % 7 AS DOUBLE) AS minz, p_retailprice + 150.0 AS maxx, "
    "CAST(p_size AS DOUBLE) / 2 + 2.0 AS maxy, "
    "CAST(p_partkey % 7 AS DOUBLE) + 1.5 AS maxz FROM part"
)


def join3_left_ds(sf_dir: str):
    from .io import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal", "s_nationkey"]
    )

    def f(b: pa.Table) -> pa.Table:
        x = b.column("s_acctbal").to_numpy()
        y = b.column("s_nationkey").to_numpy().astype(np.float64)
        z = (b.column("s_suppkey").to_numpy() % 7).astype(np.float64)
        return pa.table(
            {"id": b.column("s_suppkey"), "minx": x, "miny": y, "minz": z,
             "maxx": x + 2000.0, "maxy": y + 3.0, "maxz": z + 1.5}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def join3_right_ds(sf_dir: str):
    from .io import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice", "p_size"]
    )

    def f(b: pa.Table) -> pa.Table:
        x = b.column("p_retailprice").to_numpy()
        y = b.column("p_size").to_numpy().astype(np.float64) / 2
        z = (b.column("p_partkey").to_numpy() % 7).astype(np.float64)
        return pa.table(
            {"id": b.column("p_partkey"), "minx": x, "miny": y, "minz": z,
             "maxx": x + 150.0, "maxy": y + 2.0, "maxz": z + 1.5}
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


JOIN3_BOUNDS = G.BoundsND([-1100.0, -1.0, -1.0], [12000.0, 40.0, 9.0])
