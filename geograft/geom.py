"""Custom geometry registry — the Dataset-layer counterpart of
implementing ``RTreeObject`` + ``PointDistance`` for a user type
(rstar/src/object.rs:83-200; the Circle worked example at
object.rs:100-153).

A geometry KIND registers vectorized kernels over masked batch rows:

  distance_2(batch, mask, q)      -> d2 values for the masked rows
  contains_point(batch, mask, q)  -> bool mask for the masked rows

Rows carry a ``geom_kind`` column; ``ops._exact_distance_2`` and
``ops.locate_all_at_point`` consult the registry for kinds beyond the
built-ins (point / rect / line), so every distance- and containment-
based operator (locate_within_distance, knn via nn_stream, drains,
removals) works on registered kinds with no further wiring — the same
leverage the trait gives in the reference.

Kernels receive the FULL Arrow batch plus a boolean row mask and pull
whatever payload columns their geometry needs (a circle reads its
center from x0/y0 and its radius from x1). They must be vectorized
numpy — they run inside map_batches on the hot path.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

_BUILTINS = {"point", "rect", "line"}


class GeometrySpec:
    __slots__ = ("kind", "distance_2", "contains_point")

    def __init__(self, kind: str,
                 distance_2: Callable,
                 contains_point: Callable | None):
        self.kind = kind
        self.distance_2 = distance_2
        self.contains_point = contains_point


REGISTRY: dict[str, GeometrySpec] = {}


def register_geometry(kind: str, distance_2: Callable,
                      contains_point: Callable | None = None) -> None:
    """Register kernels for a custom geom_kind.

    distance_2(batch, mask, q) must return exact squared distances for
    the masked rows (PointDistance::distance_2). contains_point
    defaults to ``distance_2 <= 0`` (the trait's default contains_point,
    object.rs:154-200); pass an exact kernel when one exists.
    """
    if kind in _BUILTINS:
        raise ValueError(f"'{kind}' is a built-in kind")
    REGISTRY[kind] = GeometrySpec(kind, distance_2, contains_point)


def unregister_geometry(kind: str) -> None:
    REGISTRY.pop(kind, None)


def registry_snapshot() -> dict[str, GeometrySpec]:
    """Capture the registry for closure shipping. Ray worker processes
    import geograft.geom FRESH (their module-level REGISTRY is empty —
    registration happened on the driver), so operators must capture
    this snapshot at construction time and let cloudpickle ship the
    specs inside the per-batch closure."""
    return dict(REGISTRY)


# ---------------------------------------------------------------------------
# Circle — the reference's own worked example (object.rs:100-153):
# envelope = center +- radius; distance_2 = max(|q - c| - r, 0)^2;
# contains_point = |q - c|^2 <= r^2 (exact, no sqrt).
# Row layout: x0/y0 = center, x1 = radius (x1 doubles as payload).
# ---------------------------------------------------------------------------

def circle_distance_2(batch: pa.Table, mask: np.ndarray, q: np.ndarray) -> np.ndarray:
    cx = batch.column("x0").to_numpy()[mask]
    cy = batch.column("y0").to_numpy()[mask]
    r = batch.column("x1").to_numpy()[mask]
    dx = q[0] - cx
    dy = q[1] - cy
    d = np.sqrt(dx * dx + dy * dy) - r
    d = np.maximum(d, 0.0)
    return d * d


def circle_contains_point(batch: pa.Table, mask: np.ndarray, q: np.ndarray) -> np.ndarray:
    cx = batch.column("x0").to_numpy()[mask]
    cy = batch.column("y0").to_numpy()[mask]
    r = batch.column("x1").to_numpy()[mask]
    dx = q[0] - cx
    dy = q[1] - cy
    return dx * dx + dy * dy <= r * r


def register_circle() -> None:
    """Idempotent registration of the built-in-adjacent circle kind."""
    register_geometry("circle", circle_distance_2, circle_contains_point)
