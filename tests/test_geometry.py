"""PIP vs brute-force oracle (SURVEY.md §5.5)."""

from __future__ import annotations

import numpy as np
import pytest

from georay.geometry import PolygonSet, make_box_ring, points_in_ring


def _brute_pip(lon, lat, rx, ry):
    """Independent scalar crossing-number implementation."""
    out = np.zeros(len(lon), dtype=bool)
    n = len(rx) - 1 if (rx[0] == rx[-1] and ry[0] == ry[-1]) else len(rx)
    for i in range(len(lon)):
        c = False
        for j in range(n):
            x1, y1, x2, y2 = rx[j], ry[j], rx[(j + 1) % n], ry[(j + 1) % n]
            if (y1 > lat[i]) != (y2 > lat[i]):
                if lon[i] < (x2 - x1) * (lat[i] - y1) / (y2 - y1) + x1:
                    c = not c
        out[i] = c
    return out


def test_box_ring():
    rx, ry = make_box_ring(-10, 20, 5, 4)
    lon = np.array([-7.5, -11.0, -4.9, -9.9])
    lat = np.array([22.0, 22.0, 22.0, 19.9])
    assert points_in_ring(lon, lat, rx, ry).tolist() == [True, False, False, False]


def test_nonconvex_ring_vs_brute():
    # non-convex "staircase" hexagon
    rx = np.array([0.0, 10.0, 10.0, 5.0, 5.0, 0.0])
    ry = np.array([0.0, 0.0, 5.0, 5.0, 10.0, 10.0])
    rng = np.random.RandomState(9)
    lon = rng.uniform(-2, 12, 4000)
    lat = rng.uniform(-2, 12, 4000)
    got = points_in_ring(lon, lat, rx, ry)
    want = _brute_pip(lon, lat, rx, ry)
    assert np.array_equal(got, want)
    assert got.any() and not got.all()


def test_random_polygons_vs_brute():
    rng = np.random.RandomState(4)
    for _ in range(5):
        m = rng.randint(5, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        r = rng.uniform(2, 8, m)
        rx = 20 + r * np.cos(ang)
        ry = -30 + r * np.sin(ang)
        lon = rng.uniform(10, 30, 1000)
        lat = rng.uniform(-40, -20, 1000)
        assert np.array_equal(
            points_in_ring(lon, lat, rx, ry), _brute_pip(lon, lat, rx, ry)
        )


def test_polygonset_matches_per_ring():
    rng = np.random.RandomState(8)
    ids, rings = [], []
    for i in range(20):
        lon0 = rng.uniform(-170, 140)
        lat0 = rng.uniform(-80, 60)
        rings.append(make_box_ring(lon0, lat0, rng.uniform(2, 20), rng.uniform(2, 15)))
        ids.append(i)
    ps = PolygonSet(ids, rings, bits=12)
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(-90, 90, 3000)
    p_idx, g_idx = ps.contains(lon, lat)
    got = set(zip(p_idx.tolist(), g_idx.tolist()))
    want = set()
    for g, (rx, ry) in enumerate(rings):
        inside = points_in_ring(lon, lat, rx, ry)
        want |= {(int(i), g) for i in np.flatnonzero(inside)}
    assert got == want


def test_split_antimeridian_ring():
    from georay.geometry import split_antimeridian_ring

    # box 170..195 (crosses +180), lat 0..10, continuous lons
    rx = np.array([170.0, 195.0, 195.0, 170.0, 170.0])
    ry = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    parts = split_antimeridian_ring(rx, ry)
    assert len(parts) == 2
    for px, py in parts:
        assert px.max() <= 180.0 and px.min() >= -180.0
    # combined containment == original (tested at shifted coordinates)
    test_pts = [(175.0, 5.0, True), (-175.0, 5.0, True), (-160.0, 5.0, False),
                (160.0, 5.0, False), (175.0, 15.0, False)]
    for lon, lat, want in test_pts:
        got = any(
            points_in_ring(np.array([lon]), np.array([lat]), px, py)[0]
            for px, py in parts
        )
        assert got == want, (lon, lat)


def test_split_no_crossing_passthrough():
    from georay.geometry import split_antimeridian_ring

    rx, ry = make_box_ring(-10, 0, 20, 10)
    parts = split_antimeridian_ring(rx, ry)
    assert len(parts) == 1
    assert np.array_equal(parts[0][0], rx)


def test_split_rejects_jump():
    from georay.geometry import split_antimeridian_ring

    rx = np.array([170.0, -170.0, -170.0, 170.0, 170.0])  # ±360-style jump
    ry = np.array([0.0, 0.0, 10.0, 10.0, 0.0])
    with pytest.raises(ValueError):
        split_antimeridian_ring(rx, ry)


def test_split_west_crossing():
    from georay.geometry import split_antimeridian_ring

    rx = np.array([-195.0, -170.0, -170.0, -195.0, -195.0])
    ry = np.array([-5.0, -5.0, 5.0, 5.0, -5.0])
    parts = split_antimeridian_ring(rx, ry)
    assert len(parts) == 2
    for lon, lat, want in [(-175.0, 0.0, True), (170.0, 0.0, True), (160.0, 0.0, False)]:
        got = any(
            points_in_ring(np.array([lon]), np.array([lat]), px, py)[0]
            for px, py in parts
        )
        assert got == want, (lon, lat)


def test_strtree_matches_brute_bbox():
    from georay.geometry import STRtree

    rng = np.random.RandomState(7)
    n = 500
    x0 = rng.uniform(-170, 150, n); y0 = rng.uniform(-80, 60, n)
    boxes = np.stack([x0, y0, x0 + rng.uniform(1, 20, n), y0 + rng.uniform(1, 15, n)], 1)
    tree = STRtree(boxes)
    for _ in range(200):
        lon, lat = rng.uniform(-180, 180), rng.uniform(-90, 90)
        got = set(tree.query_point(lon, lat).tolist())
        want = set(np.flatnonzero(
            (boxes[:, 0] <= lon) & (boxes[:, 2] >= lon)
            & (boxes[:, 1] <= lat) & (boxes[:, 3] >= lat)
        ).tolist())
        assert got == want


def test_polygonset_rtree_backend_matches_cells():
    rng = np.random.RandomState(8)
    ids, rings = [], []
    for i in range(30):
        rings.append(make_box_ring(rng.uniform(-170, 140), rng.uniform(-80, 60),
                                   rng.uniform(2, 25), rng.uniform(2, 18)))
        ids.append(i)
    a = PolygonSet(ids, rings, bits=12, backend="cells")
    b = PolygonSet(ids, rings, bits=12, backend="rtree")
    lon = rng.uniform(-180, 180, 1500)
    lat = rng.uniform(-90, 90, 1500)
    pa_, ga = a.contains(lon, lat)
    pb, gb = b.contains(lon, lat)
    assert set(zip(pa_.tolist(), ga.tolist())) == set(zip(pb.tolist(), gb.tolist()))


def test_strtree_query_points_matches_per_point():
    from georay.geometry import STRtree

    rng = np.random.RandomState(11)
    n = 800
    x0 = rng.uniform(-170, 150, n); y0 = rng.uniform(-80, 60, n)
    boxes = np.stack([x0, y0, x0 + rng.uniform(0.5, 10, n), y0 + rng.uniform(0.5, 8, n)], 1)
    tree = STRtree(boxes)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    pi, bi = tree.query_points(lon, lat)
    got = set(zip(pi.tolist(), bi.tolist()))
    want = set()
    for i in range(lon.size):
        for b in tree.query_point(float(lon[i]), float(lat[i])).tolist():
            want.add((i, b))
    assert got == want


def test_pip_fixture_tiles_backend_parity(ray_session):
    # the images_pip polygon fixture (non-convex hexes, antimeridian pair,
    # pole tile) must give identical pairs through both PolygonSet backends
    from georay import fixtures

    ids, _zooms, rings = fixtures.make_tiles()
    rng = np.random.RandomState(12)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-90, 90, 5000)
    a = PolygonSet(ids, rings, bits=10, backend="cells")
    b = PolygonSet(ids, rings, bits=10, backend="rtree")
    pa_, ga = a.contains(lon, lat)
    pb, gb = b.contains(lon, lat)
    assert set(zip(pa_.tolist(), ga.tolist())) == set(zip(pb.tolist(), gb.tolist()))
    assert pa_.size > 0


def test_strtree_empty():
    from georay.geometry import STRtree

    tree = STRtree(np.empty((0, 4)))
    assert tree.query_point(0.0, 0.0).size == 0


def test_polygonset_empty_rtree():
    ps = PolygonSet([], [], backend="rtree")
    p, g = ps.contains(np.array([1.0]), np.array([2.0]))
    assert p.size == 0 and g.size == 0
