"""PIP vs brute-force oracle (SURVEY.md §5.5)."""

from __future__ import annotations

import numpy as np

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
