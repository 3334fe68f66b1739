"""Conformance tests for the cell codec — SURVEY.md §5 items 1–4 / FIXTURES.md F3."""

from __future__ import annotations

import numpy as np
import pytest

from georay import codec

LON_EZS42, LAT_EZS42 = -5.603, 42.605


def test_known_vectors_string():
    out = codec.encode_str(np.array([LON_EZS42]), np.array([LAT_EZS42]), 5)
    assert out[0] == b"ezs42"
    out = codec.encode_str(np.array([10.40744]), np.array([57.64911]), 11)
    assert out[0] == b"u4pruydqqvj"


def test_known_vector_decode_center():
    lon, lat = codec.decode_str(np.array([b"ezs42"]))
    assert lon[0] == -5.60302734375
    assert lat[0] == 42.60498046875


def test_known_vector_int64():
    code = codec.encode(np.array([LON_EZS42]), np.array([LAT_EZS42]), 25)
    assert code[0] == 0xDFE082  # right-aligned 25-bit Morton code
    # left-aligned 64-bit form
    assert (int(code[0]) << (64 - 25)) == 0x6FF0410000000000


def test_int64_string_crosswalk():
    # the int64 code at 5p bits chunks to the string code
    code = codec.encode(np.array([LON_EZS42]), np.array([LAT_EZS42]), 25)
    assert codec.int_to_str(code, 5)[0] == b"ezs42"
    ints, p = codec.str_to_int(np.array([b"ezs42"]))
    assert p == 5 and ints[0] == 0xDFE082


@pytest.mark.parametrize("precision", range(1, 13))
def test_roundtrip_string(precision):
    rng = np.random.RandomState(42)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    codes = codec.encode_str(lon, lat, precision)
    dlon, dlat = codec.decode_str(codes)
    lon_err, lat_err = codec.error_with_str_precision(precision)
    assert np.all(np.abs(dlon - lon) <= lon_err / 2 + 1e-12)
    assert np.all(np.abs(dlat - lat) <= lat_err / 2 + 1e-12)
    # re-encoding the center lands in the same cell
    assert np.array_equal(codec.encode_str(dlon, dlat, precision), codes)


@pytest.mark.parametrize("bits", [5, 10, 15, 20, 25, 32, 45, 60])
def test_roundtrip_int64(bits):
    rng = np.random.RandomState(7)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    codes = codec.encode(lon, lat, bits)
    dlon, dlat = codec.decode(codes, bits)
    lon_err, lat_err = codec.error_with_precision(bits)
    assert np.all(np.abs(dlon - lon) <= lon_err / 2 + 1e-9)
    assert np.all(np.abs(dlat - lat) <= lat_err / 2 + 1e-9)
    assert np.array_equal(codec.encode(dlon, dlat, bits), codes)


def test_two_encoders_agree():
    # bisection-free grid encoder ≡ interleave of floor-grid (x, y) — the
    # bijection underpinning the SQL oracle (SURVEY.md §5.6)
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for bits in (8, 15, 24):
        x, y = codec.xy_from_lonlat(lon, lat, bits)
        codes = codec.encode(lon, lat, bits)
        rx, ry = codec.deinterleave(codes, bits)
        assert np.array_equal(x, rx)
        assert np.array_equal(y, ry)


def test_error_table():
    # SURVEY.md §8 validated table (spot rows)
    assert codec.error_with_str_precision(1) == (45.0, 45.0)
    assert codec.error_with_str_precision(2) == (11.25, 5.625)
    assert codec.error_with_str_precision(5) == (0.0439453125, 0.0439453125)
    assert codec.error_with_str_precision(12) == (
        3.3527612686157227e-07,
        1.6763806343078613e-07,
    )


def test_whole_earth_cover_counts():
    for p, n in [(1, 32), (2, 1024), (3, 32768)]:
        _, lon_boxes, lat_boxes, _, _ = codec.grid_properties(None, 5 * p)
        assert lon_boxes * lat_boxes == n
    # p=4 via grid shape only (1M cells — don't materialize)
    _, lon_boxes, lat_boxes, _, _ = codec.grid_properties(None, 20)
    assert lon_boxes * lat_boxes == 1048576


def test_grid_properties_box():
    # 1°×1° box at p=5 → 24×24 = 576 cells (SURVEY.md §8)
    _, lon_boxes, lat_boxes, _, _ = codec.grid_properties((-6, 42, -5, 43), 25)
    assert (lon_boxes, lat_boxes) == (24, 24)
    cover = codec.bounding_boxes((-6, 42, -5, 43), 25)
    assert cover.size == 576
    assert np.unique(cover).size == 576
    # every cover cell's bbox intersects the box
    lon_min, lat_min, lon_max, lat_max = codec.bounding_box(cover, 25)
    assert np.all(lon_max >= -6) and np.all(lon_min <= -5)
    assert np.all(lat_max >= 42) and np.all(lat_min <= 43)


def test_neighbors_known_set():
    ints, p = codec.str_to_int(np.array([b"ezs42"]))
    codes8, valid = codec.neighbors(ints, 5 * p)
    assert valid.all()
    got = set(codec.int_to_str(codes8[0], 5).tolist())
    assert got == {b"ezefp", b"ezefr", b"ezefx", b"ezs40", b"ezs41", b"ezs43", b"ezs48", b"ezs49"}


def test_neighbors_str_wrapper():
    out = codec.neighbors_str(np.array([b"ezs42"]))
    assert set(out[0].tolist()) == {
        b"ezefp", b"ezefr", b"ezefx", b"ezs40", b"ezs41", b"ezs43", b"ezs48", b"ezs49"
    }


def test_neighbors_compass_order_contract():
    # frozen order contract: N, NE, E, SE, S, SW, W, NW (codec.NEIGHBOR_ORDER)
    assert codec.NEIGHBOR_ORDER == ("N", "NE", "E", "SE", "S", "SW", "W", "NW")
    bits = 10
    code = codec.encode(np.array([0.1]), np.array([0.1]), bits)
    x0, y0 = codec.deinterleave(code, bits)
    codes8, valid = codec.neighbors(code, bits)
    assert valid.all()
    expect = {"N": (0, 1), "NE": (1, 1), "E": (1, 0), "SE": (1, -1),
              "S": (0, -1), "SW": (-1, -1), "W": (-1, 0), "NW": (-1, 1)}
    for j, name in enumerate(codec.NEIGHBOR_ORDER):
        xn, yn = codec.deinterleave(codes8[:, j], bits)
        dx, dy = expect[name]
        assert (int(xn[0]) - int(x0[0]), int(yn[0]) - int(y0[0])) == (dx, dy), name


def test_area_wgs84_geodesic():
    # WGS84 zone areas: whole-earth cover sums to the authalic ellipsoid
    # surface area (~5.10065622e14 m^2, Snyder); per-cell deviation from the
    # spherical model peaks ~0.3% at mid-latitudes
    cover = codec.bounding_boxes(None, 5)
    a_w = codec.area(cover, 5, model="wgs84")
    assert np.all(a_w > 0)
    wgs84_surface = 5.100656217240886e14
    assert abs(a_w.sum() - wgs84_surface) / wgs84_surface < 1e-6
    a_s = codec.area(cover, 5)
    rel = np.abs(a_w - a_s) / a_s
    assert rel.max() < 0.006 and rel.max() > 1e-4


def test_neighbors_antimeridian_wrap():
    # a cell on the -180 edge must wrap to the +180 edge in x
    bits = 10  # 32 x 32 grid
    code = codec.encode(np.array([-179.9]), np.array([0.0]), bits)
    codes8, valid = codec.neighbors(code, bits)
    assert valid.all()
    xs, _ = codec.deinterleave(codes8[0], bits)
    assert 31 in xs.tolist()  # wrapped to the last x column


def test_neighbors_pole_clamp():
    bits = 10
    code = codec.encode(np.array([0.0]), np.array([89.9]), bits)
    _, valid = codec.neighbors(code, bits)
    assert valid[0].sum() == 5  # 3 northward neighbors out of range


def test_bounding_box_contains_point():
    rng = np.random.RandomState(11)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    codes = codec.encode(lon, lat, 30)
    lon_min, lat_min, lon_max, lat_max = codec.bounding_box(codes, 30)
    assert np.all((lon >= lon_min) & (lon < lon_max + 1e-12))
    assert np.all((lat >= lat_min) & (lat < lat_max + 1e-12))


def test_area_positive_and_sums_to_earth():
    # p=1: 32 cells tile the earth; areas sum to the sphere's area
    cover = codec.bounding_boxes(None, 5)
    areas = codec.area(cover, 5)
    assert np.all(areas > 0)
    sphere = 4 * np.pi * 6371008.8**2
    assert abs(areas.sum() - sphere) / sphere < 1e-9


def test_transform_parent_consistency():
    rng = np.random.RandomState(5)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    fine = codec.encode(lon, lat, 20)
    coarse = codec.transform(fine, 20, 8)
    direct = codec.encode(lon, lat, 8)
    assert np.array_equal(coarse, direct)


def test_edge_clipping():
    # lon=180 / lat=90 land in the last cell, not out of range
    code = codec.encode(np.array([180.0]), np.array([90.0]), 10)
    x, y = codec.deinterleave(code, 10)
    assert x[0] == 31 and y[0] == 31


def test_decode_round():
    lon, lat = codec.decode_str(np.array([b"ezs42"]), round_=True)
    # p=5 err 0.0439° → 2 significant decimals
    assert abs(lon[0] - -5.6) < 0.05 and abs(lat[0] - 42.6) < 0.05
