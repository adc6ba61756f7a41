"""Property-based tests (hypothesis) for the kernel + tree layer.

Generalizes the reference's seeded-random sweeps (test_utilities.rs):
instead of two fixed seeds, hypothesis searches the input space and
shrinks counterexamples.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from geograft import grid as G
from geograft import kernels as K
from geograft.ptree import PTree

coords = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)


@st.composite
def envelopes(draw, n_min=1, n_max=64, d=2):
    n = draw(st.integers(n_min, n_max))
    lo = draw(arrays(np.float64, (n, d), elements=coords))
    ext = draw(arrays(np.float64, (n, d),
                      elements=st.floats(0, 1e5, allow_nan=False, width=64)))
    return lo, lo + ext


@settings(max_examples=60, deadline=None)
@given(envelopes(), arrays(np.float64, (2,), elements=coords))
def test_min_max_dist_bounds_exact_distance(env, p):
    """min_dist2 <= dist2(any contained point) <= min_max_dist2: for any
    box the clamped distance lower-bounds, and MinMaxDist upper-bounds,
    the distance to at least one point of the box (Roussopoulos inv.)."""
    lo, up = env
    mind = K.env_distance_2(lo, up, p)
    minmax = K.env_min_max_dist_2(lo, up, p)
    assert (mind <= minmax + 1e-9 * np.maximum(1, np.abs(minmax))).all()
    # the box CENTER is a containable point: its distance ≥ min
    center = K.env_center(lo, up)
    cd = K.point_distance_2(center, p)
    assert (mind <= cd + 1e-9 * np.maximum(1, cd)).all()


@settings(max_examples=60, deadline=None)
@given(envelopes())
def test_merge_contains_all(env):
    lo, up = env
    mlo, mup = K.env_merge_all(lo, up)
    assert K.env_contains_env(mlo, mup, lo, up).all()


@settings(max_examples=40, deadline=None)
@given(envelopes(n_min=1, n_max=200),
       arrays(np.float64, (2,), elements=coords),
       arrays(np.float64, (2,), elements=st.floats(0, 1e5, allow_nan=False, width=64)))
def test_ptree_envelope_query_equals_bruteforce(env, qlo_base, ext):
    lo, up = env
    qlo = qlo_base
    qhi = qlo + ext
    t = PTree(lo, up)
    t.sanity_check()
    got = np.sort(t.locate_in_envelope_intersecting(qlo, qhi))
    want = np.nonzero(K.env_intersects(lo, up, qlo, qhi))[0]
    np.testing.assert_array_equal(got, want)
    got_c = np.sort(t.locate_in_envelope(qlo, qhi))
    want_c = np.nonzero(K.env_contains_env(qlo[None], qhi[None], lo, up))[0]
    np.testing.assert_array_equal(got_c, want_c)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 300), st.integers(1, 12), st.integers(0, 2**31 - 1))
def test_ptree_knn_matches_sort(n, k, seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-100, 100, (n, 2))
    q = rng.uniform(-100, 100, 2)
    t = PTree(pts)
    rows, d2 = t.knn(q, k)
    full = K.point_distance_2(pts, q)
    want = np.lexsort((np.arange(n), full))[: min(k, n)]
    np.testing.assert_array_equal(rows, want)
    np.testing.assert_array_equal(d2, full[want])


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 16))
def test_grid_covering_cells_complete(seed, level):
    level = min(level, 12)
    rng = np.random.default_rng(seed)
    q = np.sort(rng.uniform(0, 1, 2))
    r = np.sort(rng.uniform(0, 1, 2))
    cells = G.covering_cells(q[0], r[0], q[1], r[1], level)
    px = rng.uniform(q[0], q[1], 50)
    py = rng.uniform(r[0], r[1], 50)
    assert np.isin(G.cell_of_points(px, py, level), cells).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_replication_owner_unique(seed):
    rng = np.random.default_rng(seed)
    n = 40
    minx = rng.uniform(0, 0.9, n)
    miny = rng.uniform(0, 0.9, n)
    maxx = minx + rng.uniform(0, 0.4, n)
    maxy = miny + rng.uniform(0, 0.4, n)
    rows, cells = G.covering_cells_of_envelopes(minx, miny, maxx, maxy, 4)
    owners = G.owner_cell(minx, miny, 4)
    for i in range(n):
        mine = cells[rows == i]
        assert (mine == owners[i]).sum() == 1


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 6), st.integers(2, 16), st.integers(2, 16),
       st.integers(0, 2**31 - 1))
def test_y4m_round_trip_property(t, h, w, seed):
    # any frame count / geometry round-trips bit-exact through the
    # YUV4MPEG2 codec (mono path)
    from geograft import mediaops as M

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
    got, fps = M.decode_y4m(M.encode_y4m(frames))
    assert fps == (25, 1)
    np.testing.assert_array_equal(got, frames)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1),
       st.floats(0.2, 0.95))
def test_jaccard_prefix_candidates_complete(seed, tau):
    # property behind the AllPairs prefix filter: for ANY random corpus
    # and tau, every pair with J >= tau shares its smallest common
    # shingle inside both docs' prefixes — the index can't lose a pair
    from geograft import textops as T

    rng = np.random.default_rng(seed)
    n = 40
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, rng.integers(4, 20)))
             for _ in range(n)]
    # plant a couple of heavy overlaps
    texts[1] = texts[0]
    texts[3] = texts[2] + " w0"
    import pyarrow as pa

    doc_idx, sh = T._shingle_hashes(pa.array(texts), 3)
    sets = [set() for _ in range(n)]
    for d, s in zip(doc_idx, sh):
        sets[d].add(int(s))
    # prefix per doc = smallest (len - ceil(tau*len) + 1) hashes
    prefixes = [set(sorted(s)[: len(s) - int(np.ceil(tau * len(s))) + 1])
                for s in sets]
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= tau:
                assert prefixes[i] & prefixes[j], (
                    f"tau-similar pair ({i},{j}) invisible to prefix index")
