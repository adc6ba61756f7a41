"""Vectorized numpy ports of rstar's geometric kernels.

Every function here is a column-oriented (batch) equivalent of a scalar
method in the reference; citations point at the behaviour being
reproduced (rstar/src/aabb.rs, point.rs, primitives/line.rs,
primitives/rectangle.rs). Floating-point operation ORDER is kept
identical to the reference's fold order so f64 results (distances,
min_max_dist_2) are bit-identical — required for exact tie semantics in
`nearest_neighbors` (SURVEY.md §7.5).

Envelope representation: a pair of float64 arrays ``lower``/``upper`` of
shape (n, d) (d >= 2, matching rstar's dimension >= 2 invariant,
params.rs:90-113). 2-d convenience wrappers take flat minx/miny/maxx/maxy
columns, the Arrow layout used by the Dataset operators.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "env_from_points",
    "env_merge_all",
    "env_contains_point",
    "env_contains_env",
    "env_intersects",
    "env_distance_2",
    "env_min_max_dist_2",
    "env_area",
    "env_center",
    "env_perimeter",
    "point_distance_2",
    "line_distance_2",
    "line_nearest_point",
    "new_empty_env",
]


def _as2d(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.float64)
    return a[None, :] if a.ndim == 1 else a


def env_from_points(pts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """AABB::from_point (aabb.rs:36-41): degenerate box lower=upper=pt."""
    pts = _as2d(pts)
    return pts.copy(), pts.copy()


def new_empty_env(d: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """AABB::new_empty (aabb.rs:127-134): inverted [+max, -max] box.

    For f64 the reference uses f64::MAX / f64::MIN; merging an empty box
    with X yields X (test aabb.rs:256-275) because min/max against the
    sentinels is an identity.
    """
    return (
        np.full((1, d), np.finfo(np.float64).max),
        np.full((1, d), -np.finfo(np.float64).max),
    )


def env_merge_all(lower: np.ndarray, upper: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Union of n envelopes (Envelope::merge, aabb.rs:150-160 reduced)."""
    lower, upper = _as2d(lower), _as2d(upper)
    if len(lower) == 0:
        return new_empty_env(lower.shape[1] if lower.ndim == 2 else 2)
    return lower.min(axis=0, keepdims=True), upper.max(axis=0, keepdims=True)


def env_contains_point(lower, upper, pt) -> np.ndarray:
    """AABB::contains_point (aabb.rs:140-143): closed bounds <= / >=."""
    lower, upper = _as2d(lower), _as2d(upper)
    pt = np.asarray(pt, dtype=np.float64)
    return np.logical_and((lower <= pt).all(axis=1), (upper >= pt).all(axis=1))


def env_contains_env(olow, oup, ilow, iup) -> np.ndarray:
    """AABB::contains_envelope (aabb.rs:145-148): outer fully contains inner."""
    olow, oup, ilow, iup = map(_as2d, (olow, oup, ilow, iup))
    return np.logical_and((olow <= ilow).all(axis=1), (oup >= iup).all(axis=1))


def env_intersects(alow, aup, blow, bup) -> np.ndarray:
    """AABB::intersects (aabb.rs:162-165): closed — touching boxes intersect."""
    alow, aup, blow, bup = map(_as2d, (alow, aup, blow, bup))
    return np.logical_and((alow <= bup).all(axis=1), (aup >= blow).all(axis=1))


def env_distance_2(lower, upper, pt) -> np.ndarray:
    """AABB::distance_2 (aabb.rs:107-118): clamp pt into box, squared dist.

    0 when contained. Sum order is axis 0..d left-to-right, matching
    Point::length_2's fold (point.rs:241-243).
    """
    lower, upper = _as2d(lower), _as2d(upper)
    pt = np.asarray(pt, dtype=np.float64)
    clamped = np.minimum(upper, np.maximum(lower, pt))
    diff = clamped - pt
    acc = diff[:, 0] * diff[:, 0]
    for i in range(1, diff.shape[1]):
        acc = acc + diff[:, i] * diff[:, i]
    return acc


def env_min_max_dist_2(lower, upper, pt) -> np.ndarray:
    """AABB::min_max_dist_2 (aabb.rs:178-203), Roussopoulos et al. 1995.

    Exact port including the FP order of operations pinned by the
    reference regression test (aabb.rs:277-288): per axis square l and u
    offsets, swap so min<=max, pick the axis with the LARGEST diff
    (ties: highest axis index wins, because the reference updates on
    `>=`), use that axis's near face and every other axis's far corner;
    accumulate axis 0..d left-to-right.
    """
    lower, upper = _as2d(lower), _as2d(upper)
    pt = np.asarray(pt, dtype=np.float64)
    l2 = (lower - pt) ** 2
    u2 = (upper - pt) ** 2
    mn = np.minimum(l2, u2)
    mx = np.maximum(l2, u2)
    diff = mx - mn
    d = diff.shape[1]
    # last axis achieving the max diff (reference overwrites on >=)
    best = (d - 1) - np.argmax(diff[:, ::-1], axis=1)
    result = mx.copy()
    rows = np.arange(len(result))
    result[rows, best] = mn[rows, best]
    acc = result[:, 0]
    for i in range(1, d):
        acc = acc + result[:, i]
    return acc


def env_area(lower, upper) -> np.ndarray:
    """AABB::area (aabb.rs:167-172): product of per-axis extents clamped at 0."""
    lower, upper = _as2d(lower), _as2d(upper)
    diag = np.maximum(upper - lower, 0.0)
    acc = np.ones(len(diag))
    for i in range(diag.shape[1] - 1, -1, -1):
        # reference fold: acc starts at one, acc = max(cur,0) * acc
        acc = diag[:, i] * acc
    return acc


def env_center(lower, upper) -> np.ndarray:
    """AABB::center (aabb.rs:205-209): (l+u)/2 per axis.

    Integer input keeps RTreeNum integer semantics (point.rs:98-100):
    the division is truncating INTEGER division l + (u-l)//2 — exact for
    the full int64 range, never a float midpoint."""
    lower = np.asarray(lower)
    upper = np.asarray(upper)
    if np.issubdtype(lower.dtype, np.integer) and np.issubdtype(upper.dtype, np.integer):
        if lower.ndim == 1:
            lower, upper = lower[None, :], upper[None, :]
        # overflow-safe floor((l+u)/2): (upper - lower) overflows int64
        # when lower is large-negative and upper large-positive, so
        # split each operand into halves + parity instead. Equal to
        # lower + (upper - lower)//2 for all valid (lower <= upper)
        # boxes, including mixed-sign int64 extremes.
        return lower // 2 + upper // 2 + (lower % 2 + upper % 2) // 2
    lower, upper = _as2d(lower), _as2d(upper)
    return (lower + upper) / 2.0


def env_perimeter(lower, upper) -> np.ndarray:
    """AABB::perimeter_value (aabb.rs:219-223): sum of extents clamped at 0."""
    lower, upper = _as2d(lower), _as2d(upper)
    diag = upper - lower
    acc = diag[:, 0]
    for i in range(1, diag.shape[1]):
        acc = acc + diag[:, i]
    return np.maximum(acc, 0.0)


def point_distance_2(pts: np.ndarray, q) -> np.ndarray:
    """Point distance_2 (object.rs:202-218 via point.rs length_2 fold order)."""
    pts = _as2d(pts)
    q = np.asarray(q, dtype=np.float64)
    diff = pts - q
    acc = diff[:, 0] * diff[:, 0]
    for i in range(1, diff.shape[1]):
        acc = acc + diff[:, i] * diff[:, i]
    return acc


def line_nearest_point(p1: np.ndarray, p2: np.ndarray, q) -> np.ndarray:
    """Line::nearest_point (primitives/line.rs:71-95): project q onto the
    segment, clamping the parameter t to [0, 1]."""
    p1, p2 = _as2d(p1), _as2d(p2)
    q = np.asarray(q, dtype=np.float64)
    dir_ = p2 - p1
    len2 = np.einsum("ij,ij->i", dir_, dir_)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.einsum("ij,ij->i", q - p1, dir_) / len2
    t = np.where(len2 == 0.0, 0.0, np.clip(t, 0.0, 1.0))
    return p1 + dir_ * t[:, None]


def line_distance_2(p1: np.ndarray, p2: np.ndarray, q) -> np.ndarray:
    """Line::distance_2 (primitives/line.rs:97-113)."""
    near = line_nearest_point(p1, p2, q)
    return point_distance_2(near, q)


def poly_contains_point(flat_xy: np.ndarray, offsets: np.ndarray, q) -> np.ndarray:
    """Point-in-polygon (even-odd ray cast) for n polygons at once.

    ``flat_xy``: (m, 2) concatenated vertex rings; ``offsets``: (n+1,)
    ring boundaries. Vectorized over ALL edges of ALL polygons in one
    pass (np.add.at crossing counter). Boundary points follow the
    standard half-open ray-cast convention (a point exactly on an edge
    may land either side) — rstar itself leaves containment to the
    geometry impl (PointDistance::contains_point, object.rs:154-200),
    so this is the engine's polygon contract.
    """
    q = np.asarray(q, dtype=np.float64)
    n = len(offsets) - 1
    m = len(flat_xy)
    if m == 0:
        return np.zeros(n, dtype=bool)
    # next-vertex index with per-ring wraparound (empty rings skipped —
    # writing offsets[i]-1 for a zero-length ring would clobber the
    # PREVIOUS ring's closing edge)
    nxt = np.arange(1, m + 1, dtype=np.int64)
    ring_len = np.diff(offsets)
    nonempty = ring_len > 0
    nxt[offsets[1:][nonempty] - 1] = offsets[:-1][nonempty]
    x1, y1 = flat_xy[:, 0], flat_xy[:, 1]
    x2, y2 = flat_xy[nxt, 0], flat_xy[nxt, 1]
    straddle = (y1 > q[1]) != (y2 > q[1])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (q[1] - y1) / (y2 - y1) + x1
    cross = straddle & (q[0] < xint)
    poly_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, poly_idx[cross], 1)
    return (counts % 2) == 1
