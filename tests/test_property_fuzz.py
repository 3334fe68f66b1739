"""Property-based fuzz of the codec substrate (SURVEY.md §5.5, hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from georay import cells, codec

lon_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
bits_s = st.integers(min_value=2, max_value=60)
str_p_s = st.integers(min_value=1, max_value=12)


@settings(max_examples=300, deadline=None)
@given(lon=lon_s, lat=lat_s, bits=bits_s)
def test_int64_roundtrip_within_bound(lon, lat, bits):
    code = codec.encode(np.array([lon]), np.array([lat]), bits)
    dlon, dlat = codec.decode(code, bits)
    lon_err, lat_err = codec.error_with_precision(bits)
    assert abs(dlon[0] - lon) <= lon_err / 2 + 1e-9 or abs(lon) == 180.0
    assert abs(dlat[0] - lat) <= lat_err / 2 + 1e-9 or abs(lat) == 90.0
    # center re-encodes to the same cell
    assert codec.encode(dlon, dlat, bits)[0] == code[0]


@settings(max_examples=200, deadline=None)
@given(lon=lon_s, lat=lat_s, p=str_p_s)
def test_string_int64_crosswalk(lon, lat, p):
    s = codec.encode_str(np.array([lon]), np.array([lat]), p)
    ints, p2 = codec.str_to_int(s)
    assert p2 == p
    assert codec.int_to_str(ints, p)[0] == s[0]
    assert ints[0] == codec.encode(np.array([lon]), np.array([lat]), 5 * p)[0]


@settings(max_examples=200, deadline=None)
@given(lon=lon_s, lat=lat_s, bits=st.integers(min_value=4, max_value=60),
       drop=st.integers(min_value=1, max_value=8))
def test_parent_contains_child(lon, lat, bits, drop):
    parent_bits = max(2, bits - drop)
    fine = codec.encode(np.array([lon]), np.array([lat]), bits)
    parent = cells.cell_to_parent(fine, bits, parent_bits)
    direct = codec.encode(np.array([lon]), np.array([lat]), parent_bits)
    assert parent[0] == direct[0]
    # the parent's bbox contains the child's bbox
    plo, pla, phi, pha = codec.bounding_box(parent, parent_bits)
    clo, cla, chi, cha = codec.bounding_box(fine, bits)
    assert plo[0] <= clo[0] + 1e-12 and phi[0] >= chi[0] - 1e-12
    assert pla[0] <= cla[0] + 1e-12 and pha[0] >= cha[0] - 1e-12


@settings(max_examples=100, deadline=None)
@given(lon=lon_s, lat=lat_s, bits=st.integers(min_value=4, max_value=40))
def test_neighbors_are_adjacent(lon, lat, bits):
    code = codec.encode(np.array([lon]), np.array([lat]), bits)
    nbrs, valid = codec.neighbors(code, bits)
    nx, ny = codec.split_bits(bits)
    x, y = codec.deinterleave(code, bits)
    for j in range(8):
        if not valid[0, j]:
            continue
        xn, yn = codec.deinterleave(nbrs[0, j : j + 1], bits)
        dx = min((int(xn[0]) - int(x[0])) % (1 << nx),
                 (int(x[0]) - int(xn[0])) % (1 << nx))
        assert dx <= 1 and abs(int(yn[0]) - int(y[0])) <= 1
        assert (dx, abs(int(yn[0]) - int(y[0]))) != (0, 0)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=512))
def test_content_hash_deterministic(data):
    from georay import images

    a = images.content_hash64(data)
    b = images.content_hash64(data)
    assert a == b
    if data:
        flipped = bytes([data[0] ^ 1]) + data[1:]
        assert images.content_hash64(flipped) != a
