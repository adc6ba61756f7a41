"""geograft — a Ray-Data-native distributed spatial-join + tiling engine.

Reimagines georust/rstar's single-process R*-tree (reference at
/root/reference, studied for behaviour only) as a two-level index:

* level 1: a global hierarchical quadkey cell grid (``geograft.grid``)
  drives ``ray.data.Dataset`` partitioning (groupby-on-cell shuffle with
  explicit skew splitting of hot cells);
* level 2: per-partition STR/OMT bulk-loaded packed R-trees
  (``geograft.ptree``) live inside actor-pool workers and answer
  ``locate_in_envelope``, point containment, kNN and spatial joins via
  ``map_batches`` over zero-copy Arrow.

The geometric contract mirrors rstar's two-trait surface
(``RTreeObject::envelope`` + ``PointDistance::distance_2``,
rstar/src/object.rs:83-200): ``geograft.kernels`` holds the vectorized
numpy ports of the envelope algebra (rstar/src/aabb.rs:31-247) and the
primitive distance kernels (line.rs / rectangle.rs).
"""

__version__ = "0.1.0"
