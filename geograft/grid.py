"""Hierarchical quadkey cell grid — level 1 of the two-level index.

Plays the role of the *upper levels* of rstar's R*-tree
(rstar/src/node.rs:39-45) in the distributed engine: instead of a
pointer tree, a Z-order (Morton) cell id over a fixed world rectangle
partitions the Dataset. ``groupby(cell_id)`` is the shuffle; the cell
directory (per-cell envelope + count, SURVEY.md §2.6) is the "root
node" the planner prunes against, exactly like
``SelectionIterator::should_unpack_parent`` prunes parent envelopes
(rstar/src/iterators.rs:56-95).

Cell ids are int64: ``(level << 58) | morton`` with ``level <= 28``
(2*28 = 56 Morton bits). Packing the level lets ADAPTIVE resolutions
coexist in one key column — hot cells are re-keyed to child cells for
skew splitting (SURVEY.md §4.2) and the ids never collide across
levels.

All functions are vectorized numpy over float64 coordinate columns.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 28
_LEVEL_SHIFT = 58
_MORTON_MASK = (1 << _LEVEL_SHIFT) - 1


class Bounds:
    """World rectangle the grid is defined over (inclusive-exclusive)."""

    __slots__ = ("minx", "miny", "maxx", "maxy")

    def __init__(self, minx: float, miny: float, maxx: float, maxy: float):
        if not (maxx > minx and maxy > miny):
            raise ValueError("degenerate bounds")
        self.minx, self.miny, self.maxx, self.maxy = (
            float(minx),
            float(miny),
            float(maxx),
            float(maxy),
        )

    @property
    def width(self) -> float:
        return self.maxx - self.minx

    @property
    def height(self) -> float:
        return self.maxy - self.miny

    def __repr__(self):
        return f"Bounds({self.minx}, {self.miny}, {self.maxx}, {self.maxy})"

    def to_list(self) -> list[float]:
        return [self.minx, self.miny, self.maxx, self.maxy]


UNIT = Bounds(0.0, 0.0, 1.0, 1.0)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into even bit positions."""
    x = x.astype(np.uint64)
    x &= np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _unpart1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def cell_coords(x, y, level: int, bounds: Bounds = UNIT) -> tuple[np.ndarray, np.ndarray]:
    """Integer cell coordinates at `level`, clipped into the grid."""
    n = 1 << level
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cx = np.floor((x - bounds.minx) / bounds.width * n).astype(np.int64)
    cy = np.floor((y - bounds.miny) / bounds.height * n).astype(np.int64)
    return np.clip(cx, 0, n - 1), np.clip(cy, 0, n - 1)


def pack(cx: np.ndarray, cy: np.ndarray, level: int) -> np.ndarray:
    """(cx, cy, level) -> int64 cell id."""
    if level > MAX_LEVEL:
        raise ValueError(f"level {level} > MAX_LEVEL {MAX_LEVEL}")
    morton = _part1by1(np.asarray(cx)) | (_part1by1(np.asarray(cy)) << np.uint64(1))
    return (morton | (np.uint64(level) << np.uint64(_LEVEL_SHIFT))).astype(np.int64)


def unpack(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cell id -> (cx, cy, level)."""
    cid = np.asarray(cell_id).astype(np.uint64)
    level = (cid >> np.uint64(_LEVEL_SHIFT)).astype(np.int64)
    morton = cid & np.uint64(_MORTON_MASK)
    return (
        _unpart1by1(morton).astype(np.int64),
        _unpart1by1(morton >> np.uint64(1)).astype(np.int64),
        level,
    )


def cell_of_points(x, y, level: int, bounds: Bounds = UNIT) -> np.ndarray:
    cx, cy = cell_coords(x, y, level, bounds)
    return pack(cx, cy, level)


def cell_envelope(cell_id, bounds: Bounds = UNIT) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minx, miny, maxx, maxy) of each cell."""
    cx, cy, level = unpack(cell_id)
    n = np.exp2(level)
    wx, wy = bounds.width / n, bounds.height / n
    minx = bounds.minx + cx * wx
    miny = bounds.miny + cy * wy
    return minx, miny, minx + wx, miny + wy


def covering_cells(minx, miny, maxx, maxy, level: int, bounds: Bounds = UNIT) -> np.ndarray:
    """All cell ids at `level` whose envelope intersects the query box.

    The distributed analogue of should_unpack_parent at the root: the
    planner intersects the query against the grid, then prunes to cells
    that actually exist via the cell directory.
    """
    (cx0,), (cy0,) = cell_coords([minx], [miny], level, bounds)
    (cx1,), (cy1,) = cell_coords([maxx], [maxy], level, bounds)
    xs = np.arange(cx0, cx1 + 1, dtype=np.int64)
    ys = np.arange(cy0, cy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack(gx.ravel(), gy.ravel(), level)


def enumerate_cell_ranges(
    cx0: np.ndarray, cy0: np.ndarray, cx1: np.ndarray, cy1: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand n inclusive 2-d integer ranges into their member cells.

    Returns (row_index, cx, cy): one entry per (range, contained cell).
    The shared replication arithmetic behind covering-cell routing and
    tile joins."""
    nx = cx1 - cx0 + 1
    ny = cy1 - cy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # local enumeration 0..counts[i)-1 for every range
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    nyr = np.repeat(ny, counts)
    cx = np.repeat(cx0, counts) + offs // nyr
    cy = np.repeat(cy0, counts) + offs % nyr
    return row_idx, cx, cy


def covering_cells_of_envelopes(
    minx, miny, maxx, maxy, level: int, bounds: Bounds = UNIT
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized multi-cell replication for n envelopes.

    Returns (row_index, cell_id) pairs — one pair per (envelope, cell it
    touches). Used by spatial_join to route envelopes that span cell
    borders to every partition they intersect (SURVEY.md §7.4).
    """
    cx0, cy0 = cell_coords(minx, miny, level, bounds)
    cx1, cy1 = cell_coords(maxx, maxy, level, bounds)
    row_idx, cx, cy = enumerate_cell_ranges(cx0, cy0, cx1, cy1)
    return row_idx, pack(cx, cy, level)


def owner_cell(minx, miny, level: int, bounds: Bounds = UNIT) -> np.ndarray:
    """Owner-cell rule (SURVEY.md §7.4): the unique cell containing an
    envelope's min corner. A replicated geometry / join pair is reported
    only by its owner so results stay exactly-once."""
    return cell_of_points(minx, miny, level, bounds)


def cell_min_dist2(cell_id, qx: float, qy: float, bounds: Bounds = UNIT) -> np.ndarray:
    """Lower-bound squared distance from a point to each cell's envelope —
    the partition-granularity analogue of the envelope distance used for
    kNN pruning (rstar/src/nearest_neighbor.rs:261-270)."""
    minx, miny, maxx, maxy = cell_envelope(cell_id, bounds)
    dx = np.clip(qx, minx, maxx) - qx
    dy = np.clip(qy, miny, maxy) - qy
    return dx * dx + dy * dy


def children(cell_id: np.ndarray) -> np.ndarray:
    """The 4 child cells (one level finer) of each cell. Levels are
    computed PER ROW so mixed-level inputs (which adaptive skew splits
    produce) each get their own child level."""
    cx, cy, level = unpack(np.atleast_1d(cell_id))
    child_lvl = (level + 1).astype(np.uint64)
    if np.any(level + 1 > MAX_LEVEL):
        raise ValueError(f"child level would exceed MAX_LEVEL {MAX_LEVEL}")
    out = []
    for dx in (0, 1):
        for dy in (0, 1):
            morton = _part1by1(cx * 2 + dx) | (_part1by1(cy * 2 + dy) << np.uint64(1))
            out.append((morton | (child_lvl << np.uint64(_LEVEL_SHIFT))).astype(np.int64))
    return np.concatenate(out)


# --------------------------------------------------------------------------
# N-dimensional grid (the reference is dimension-generic, point.rs:295-323)
# --------------------------------------------------------------------------

class BoundsND:
    """World hyper-rectangle for d >= 2 axes (inclusive-exclusive)."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi):
        self.lo = np.asarray(lo, dtype=np.float64)
        self.hi = np.asarray(hi, dtype=np.float64)
        if self.lo.shape != self.hi.shape or self.lo.ndim != 1:
            raise ValueError("lo/hi must be equal-length 1-d")
        if not (self.hi > self.lo).all():
            raise ValueError("degenerate bounds")

    @property
    def ndim(self) -> int:
        return len(self.lo)

    @property
    def width(self) -> np.ndarray:
        return self.hi - self.lo

    def to_list(self) -> list[list[float]]:
        return [self.lo.tolist(), self.hi.tolist()]


def max_level_nd(d: int) -> int:
    """Finest level whose d-axis Morton code fits the 56 id bits."""
    return _LEVEL_SHIFT // d


def cell_coords_nd(coords: np.ndarray, level: int, bounds: BoundsND) -> np.ndarray:
    """(n, d) float coords -> (n, d) integer cell coords, clipped."""
    n = 1 << level
    c = np.floor((coords - bounds.lo) / bounds.width * n).astype(np.int64)
    return np.clip(c, 0, n - 1)


def pack_nd(cells: np.ndarray, level: int) -> np.ndarray:
    """(n, d) integer cell coords -> int64 cell id: d-axis Morton
    interleave + packed level. Bit loop is over level*d (< 60) rounds,
    each fully vectorized over rows."""
    d = cells.shape[1]
    if level > max_level_nd(d):
        raise ValueError(f"level {level} > max {max_level_nd(d)} for d={d}")
    out = np.zeros(len(cells), dtype=np.uint64)
    c = cells.astype(np.uint64)
    for bit in range(level):
        for ax in range(d):
            out |= ((c[:, ax] >> np.uint64(bit)) & np.uint64(1)) << np.uint64(bit * d + ax)
    return (out | (np.uint64(level) << np.uint64(_LEVEL_SHIFT))).astype(np.int64)


def cell_of_points_nd(coords: np.ndarray, level: int, bounds: BoundsND) -> np.ndarray:
    return pack_nd(cell_coords_nd(coords, level, bounds), level)


def unpack_nd(cell_id: np.ndarray, d: int) -> tuple[np.ndarray, np.ndarray]:
    """int64 n-d cell ids -> ((n, d) integer coords, (n,) levels) — the
    inverse of pack_nd. Mixed-level inputs (skew-split children) decode
    per row; bits beyond each row's own level*d are zero by
    construction, so one loop to the global max level is exact."""
    cid = np.asarray(cell_id).astype(np.uint64)
    level = (cid >> np.uint64(_LEVEL_SHIFT)).astype(np.int64)
    morton = cid & np.uint64(_MORTON_MASK)
    out = np.zeros((len(cid), d), dtype=np.uint64)
    lmax = int(level.max(initial=0))
    for bit in range(lmax):
        for ax in range(d):
            out[:, ax] |= ((morton >> np.uint64(bit * d + ax)) & np.uint64(1)) << np.uint64(bit)
    return out.astype(np.int64), level


def enumerate_cell_ranges_nd(c0: np.ndarray, c1: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Expand n inclusive d-dim integer ranges into member cells.
    Returns (row_index, (m, d) cells) — mixed-radix enumeration,
    vectorized over the expanded rows."""
    spans = c1 - c0 + 1                      # (n, d)
    counts = spans.prod(axis=1)
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    d = c0.shape[1]
    out = np.empty((total, d), dtype=np.int64)
    rem = offs
    # row-major decode: last axis fastest
    for ax in range(d - 1, -1, -1):
        sp = np.repeat(spans[:, ax], counts)
        out[:, ax] = np.repeat(c0[:, ax], counts) + rem % sp
        rem = rem // sp
    return row_idx, out


def covering_cells_of_envelopes_nd(
    lo: np.ndarray, hi: np.ndarray, level: int, bounds: BoundsND
) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, cell_id) for every cell each (n, d) envelope touches."""
    c0 = cell_coords_nd(lo, level, bounds)
    c1 = cell_coords_nd(hi, level, bounds)
    row_idx, cells = enumerate_cell_ranges_nd(c0, c1)
    return row_idx, pack_nd(cells, level)


def owner_cell_nd(lo: np.ndarray, level: int, bounds: BoundsND) -> np.ndarray:
    """Owner-cell rule in d dims: the cell containing the min corner."""
    return cell_of_points_nd(lo, level, bounds)


def parent(cell_id: np.ndarray) -> np.ndarray:
    cx, cy, level = unpack(np.asarray(cell_id))
    lv = level - 1
    if np.any(lv < 0):
        raise ValueError("level-0 cell has no parent")
    morton = _part1by1(cx >> 1) | (_part1by1(cy >> 1) << np.uint64(1))
    return (morton | (lv.astype(np.uint64) << np.uint64(_LEVEL_SHIFT))).astype(np.int64)
