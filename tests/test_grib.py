"""GRIB2 raster source tests.

The fixtures are built by an independent spec-conformant encoder below
(WMO FM 92 GRIB edition 2 octet layouts written out by hand), so the
reader in ``io/grib.py`` is tested against the specification, not
against itself.  Reference behavior: GDAL's GRIB driver behind
``gdal.Open`` (reference raster/sources.py:66-71).
"""
import os
import struct

import numpy as np
import pytest

from dask_geomodeling_tpu.io.grib import read_grib


# ---------------------------------------------------------------- encoder


def _sm(value, n):
    """GRIB sign-magnitude encoding of a signed int in n octets."""
    sign = 0
    if value < 0:
        sign = 1 << (8 * n - 1)
        value = -value
    return (value | sign).to_bytes(n, "big")


def _pack_bits(values, nbits):
    """Big-endian bitstream of unsigned ints, padded to whole octets."""
    out = bytearray()
    acc = 0
    na = 0
    for v in values:
        for b in range(nbits - 1, -1, -1):
            acc = (acc << 1) | ((int(v) >> b) & 1)
            na += 1
            if na == 8:
                out.append(acc)
                acc = 0
                na = 0
    if na:
        out.append(acc << (8 - na))
    return bytes(out)


def _section(number, body):
    return struct.pack(">IB", len(body) + 5, number) + body


def _sec1(year=2024, month=3, day=15, hour=6):
    return _section(
        1,
        struct.pack(">HHBBB", 0, 0, 2, 1, 1)
        + struct.pack(">HBBBBB", year, month, day, hour, 0, 0),
    )


def _sec3_latlon(ni, nj, la1, lo1, la2, lo2, di, dj, scan):
    tpl = bytearray()
    tpl += bytes([6])  # shape of earth: sphere 6 371 229 m
    tpl += bytes(5)  # radius scale factor + value (unused for shape 6)
    tpl += bytes(10)  # major/minor scale factors + values
    tpl += struct.pack(">II", ni, nj)
    tpl += bytes(8)  # basic angle + subdivisions: 0 -> 1e-6 degrees
    tpl += _sm(round(la1 * 1e6), 4)
    tpl += _sm(round((lo1 % 360.0) * 1e6), 4)
    tpl += bytes([0x30])  # resolution flags: Di and Dj are given
    tpl += _sm(round(la2 * 1e6), 4)
    tpl += _sm(round((lo2 % 360.0) * 1e6), 4)
    tpl += struct.pack(">II", round(di * 1e6), round(dj * 1e6))
    tpl += bytes([scan])
    body = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 0) + tpl
    return _section(3, bytes(body))


def _sec3_lambert(ni, nj, la1, lo1, lad, lov, dx, dy, latin1, latin2, scan):
    tpl = bytearray()
    tpl += bytes([6])
    tpl += bytes(15)
    tpl += struct.pack(">II", ni, nj)
    tpl += _sm(round(la1 * 1e6), 4)
    tpl += _sm(round((lo1 % 360.0) * 1e6), 4)
    tpl += bytes([0x08])
    tpl += _sm(round(lad * 1e6), 4)
    tpl += _sm(round((lov % 360.0) * 1e6), 4)
    tpl += struct.pack(">II", round(dx * 1e3), round(dy * 1e3))
    tpl += bytes([0])  # projection centre: north pole
    tpl += bytes([scan])
    tpl += _sm(round(latin1 * 1e6), 4)
    tpl += _sm(round(latin2 * 1e6), 4)
    tpl += _sm(-90000000, 4) + bytes(4)  # southern pole
    body = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 30) + tpl
    return _section(3, bytes(body))


def _sec3_mercator(ni, nj, la1, lo1, lad, di, dj, scan):
    tpl = bytearray()
    tpl += bytes([6])
    tpl += bytes(15)
    tpl += struct.pack(">II", ni, nj)
    tpl += _sm(round(la1 * 1e6), 4)
    tpl += _sm(round((lo1 % 360.0) * 1e6), 4)
    tpl += bytes([0x08])
    tpl += _sm(round(lad * 1e6), 4)
    tpl += _sm(0, 4) + _sm(0, 4)  # La2 / Lo2 (derivable)
    tpl += bytes([scan])
    tpl += struct.pack(">I", 0)  # orientation
    tpl += struct.pack(">II", round(di * 1e3), round(dj * 1e3))
    body = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 10) + tpl
    return _section(3, bytes(body))


def _sec3_polar(ni, nj, la1, lo1, lad, lov, dx, dy, scan, south=False):
    tpl = bytearray()
    tpl += bytes([6])
    tpl += bytes(15)
    tpl += struct.pack(">II", ni, nj)
    tpl += _sm(round(la1 * 1e6), 4)
    tpl += _sm(round((lo1 % 360.0) * 1e6), 4)
    tpl += bytes([0x08])
    tpl += _sm(round(lad * 1e6), 4)
    tpl += _sm(round((lov % 360.0) * 1e6), 4)
    tpl += struct.pack(">II", round(dx * 1e3), round(dy * 1e3))
    tpl += bytes([0x80 if south else 0x00])
    tpl += bytes([scan])
    body = struct.pack(">BIBBH", 0, ni * nj, 0, 0, 20) + tpl
    return _section(3, bytes(body))


def _sec4(category=1, number=8, time_unit=1, forecast=3,
          surface=(1, 0, 0), template=0):
    # product definition template 4.0 (4.8 etc. share the leading octets)
    stype, sscale, svalue = surface
    tpl = struct.pack(
        ">BBBBBHBB", category, number, 2, 0, 0, 0, 0, time_unit
    ) + _sm(forecast, 4) + struct.pack(
        ">BBIBBI", stype, sscale, svalue, 255, 0, 0
    )
    return _section(4, struct.pack(">HH", 0, template) + tpl)


def _sec5_simple(npts, R, E, D, nbits):
    tpl = struct.pack(">f", R) + _sm(E, 2) + _sm(D, 2) + bytes([nbits, 0])
    return _section(5, struct.pack(">IH", npts, 0) + tpl)


def _sec6(mask=None):
    if mask is None:
        return _section(6, bytes([255]))
    return _section(6, bytes([0]) + _pack_bits(mask.astype(int), 1))


def _sec7_simple(packed, nbits):
    return _section(7, _pack_bits(packed, nbits))


def _message(sections, discipline=0):
    inner = b"".join(sections)
    total = 16 + len(inner) + 4
    return (
        b"GRIB" + bytes(2) + bytes([discipline, 2])
        + struct.pack(">Q", total) + inner + b"7777"
    )


def _simple_message(values, la1=55.0, lo1=4.0, di=0.5, dj=0.5, scan=0,
                    R=0.0, E=0, D=0, bitmap=None, forecast=3):
    """One GRIB2 message with simple packing of the *stored point
    sequence* ``values`` ((nj, ni), row 0 = first scan row).  ``la1``/
    ``lo1`` always name the NORTH/WEST edge of the grid; the first
    grid point follows from the scanning mode."""
    nj, ni = values.shape
    if scan & 0x40:  # +j: first point is the southern edge
        first_lat, la2 = la1 - dj * (nj - 1), la1
    else:
        first_lat, la2 = la1, la1 - dj * (nj - 1)
    if scan & 0x80:  # -i: first point is the eastern edge
        first_lon, lo2 = lo1 + di * (ni - 1), lo1
    else:
        first_lon, lo2 = lo1, lo1 + di * (ni - 1)
    flat = values.ravel()
    if bitmap is not None:
        flat = flat[bitmap.ravel()]
    nbits = max(int(flat.max()).bit_length(), 1) if flat.size else 1
    return _message([
        _sec1(),
        _sec3_latlon(ni, nj, first_lat, first_lon, la2, lo2, di, dj, scan),
        _sec4(forecast=forecast),
        _sec5_simple(flat.size, R, E, D, nbits),
        _sec6(None if bitmap is None else bitmap.ravel()),
        _sec7_simple(flat, nbits),
    ])


# ------------------------------------------------------------------ tests


def _write(tmp_path, raw, name="test.grib2"):
    path = os.path.join(str(tmp_path), name)
    with open(path, "wb") as f:
        f.write(raw)
    return path


def test_simple_packing_roundtrip(tmp_path):
    values = np.arange(20, dtype=np.int64).reshape(4, 5)
    path = _write(tmp_path, _simple_message(values))
    data = read_grib(path)
    assert data.array.shape == (1, 4, 5)
    np.testing.assert_array_equal(data.array[0], values)
    assert data.projection == "EPSG:4326"
    # node registration: half-pixel shift around the first grid point
    np.testing.assert_allclose(
        data.geo_transform, (4 - 0.25, 0.5, 0, 55 + 0.25, 0, -0.5)
    )
    assert "parameterCategory=1" in data.metadata[0]
    assert "refTime=2024-03-15T06:00:00" in data.metadata[0]
    assert "forecastTime=+3h" in data.metadata[0]


def test_scaling(tmp_path):
    # Y = (R + X * 2^E) / 10^D with E=-1, D=1
    packed = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int64)
    path = _write(tmp_path, _simple_message(packed, R=1.5, E=-1, D=1))
    data = read_grib(path)
    expected = (1.5 + packed * 0.5) / 10.0
    np.testing.assert_allclose(data.array[0], expected)


def test_bitmap(tmp_path):
    values = np.arange(1, 13, dtype=np.int64).reshape(3, 4)
    bitmap = np.ones((3, 4), dtype=bool)
    bitmap[1, 2] = False
    bitmap[2, 0] = False
    path = _write(tmp_path, _simple_message(values, bitmap=bitmap))
    data = read_grib(path)
    out = data.array[0]
    assert out[1, 2] == data.no_data_value
    assert out[2, 0] == data.no_data_value
    np.testing.assert_array_equal(out[bitmap], values[bitmap])


def test_multi_message_stack(tmp_path):
    a = np.arange(6, dtype=np.int64).reshape(2, 3)
    b = a * 7
    raw = _simple_message(a, forecast=0) + _simple_message(b, forecast=6)
    path = _write(tmp_path, raw)
    data = read_grib(path)
    assert data.array.shape == (2, 2, 3)
    np.testing.assert_array_equal(data.array[0], a)
    np.testing.assert_array_equal(data.array[1], b)
    assert "forecastTime=+0h" in data.metadata[0]
    assert "forecastTime=+6h" in data.metadata[1]


@pytest.mark.parametrize("scan", [0x00, 0x40, 0x80, 0xC0, 0x10])
def test_scanning_modes(tmp_path, scan):
    """All axis orders decode to the same north-up array."""
    north_up = np.arange(12, dtype=np.int64).reshape(3, 4)
    stored = north_up
    if scan & 0x40:
        stored = stored[::-1]
    if scan & 0x80:
        stored = stored[:, ::-1]
    if scan & 0x10:  # boustrophedon: alternate rows reverse
        stored = stored.copy()
        stored[1::2] = stored[1::2, ::-1]
    path = _write(tmp_path, _simple_message(stored, scan=scan))
    data = read_grib(path)
    np.testing.assert_array_equal(data.array[0], north_up)
    np.testing.assert_allclose(
        data.geo_transform, (4 - 0.25, 0.5, 0, 55 + 0.25, 0, -0.5)
    )


def test_consecutive_j(tmp_path):
    """Scanning mode 0x20: adjacent points run along j (column-major)."""
    north_up = np.arange(12, dtype=np.int64).reshape(3, 4)
    ni, nj = 4, 3
    la1, lo1, di, dj = 55.0, 4.0, 0.5, 0.5
    la2, lo2 = la1 - dj * (nj - 1), lo1 + di * (ni - 1)
    flat = north_up.T.ravel()  # column-major point sequence
    nbits = 4
    raw = _message([
        _sec1(),
        _sec3_latlon(ni, nj, la1, lo1, la2, lo2, di, dj, 0x20),
        _sec4(),
        _sec5_simple(flat.size, 0.0, 0, 0, nbits),
        _sec6(None),
        _sec7_simple(flat, nbits),
    ])
    data = read_grib(_write(tmp_path, raw))
    np.testing.assert_array_equal(data.array[0], north_up)


def test_complex_packing(tmp_path):
    """Data template 7.2: two groups with distinct widths, plus a
    primary-missing-value group entry."""
    # group 1: 4 values around ref 10 (width 2); group 2: constant 3
    g1 = [10, 11, 13, 12]
    g2 = [3, 3, 3]
    values = np.array(g1 + g2, dtype=np.int64)
    ni, nj = 7, 1
    nbits = 5
    refs = [10, 3]
    widths = [2, 0]
    lengths = [4, 3]
    sec5_tpl = (
        struct.pack(">f", 0.0) + _sm(0, 2) + _sm(0, 2)
        + bytes([nbits, 0])  # bits, field type
        + bytes([1])  # group splitting method: general
        + bytes([0])  # missing value management: none
        + bytes(8)  # primary/secondary missing substitutes
        + struct.pack(">I", 2)  # NG
        + bytes([0])  # group width reference
        + bytes([8])  # bits for group widths
        + struct.pack(">I", 0)  # group length reference
        + bytes([1])  # length increment
        + struct.pack(">I", 3)  # true length of last group
        + bytes([8])  # bits for scaled group lengths
    )
    sec5 = _section(5, struct.pack(">IH", values.size, 2) + sec5_tpl)
    stream = (
        _pack_bits(refs, nbits)
        + _pack_bits(widths, 8)
        + _pack_bits(lengths, 8)
        + _pack_bits([v - refs[0] for v in g1], 2)
    )
    raw = _message([
        _sec1(),
        _sec3_latlon(ni, nj, 55.0, 4.0, 55.0, 7.0, 0.5, 0.5, 0),
        _sec4(),
        sec5,
        _sec6(None),
        _section(7, stream),
    ])
    data = read_grib(_write(tmp_path, raw))
    np.testing.assert_array_equal(data.array[0, 0], values)


def test_complex_packing_missing_values(tmp_path):
    """Missing value management 1: all-ones codes mark missing points."""
    ni, nj = 5, 1
    nbits = 4
    # one group, width 2: packed 0,1,3(missing),2,1 around ref 7
    packed = [0, 1, 3, 2, 1]
    sec5_tpl = (
        struct.pack(">f", 0.0) + _sm(0, 2) + _sm(0, 2)
        + bytes([nbits, 0, 1, 1])  # splitting general, missing mgmt 1
        + bytes(8)
        + struct.pack(">I", 1)
        + bytes([0, 8])
        + struct.pack(">I", 0)
        + bytes([1])
        + struct.pack(">I", 5)
        + bytes([8])
    )
    sec5 = _section(5, struct.pack(">IH", 5, 2) + sec5_tpl)
    stream = (
        _pack_bits([7], nbits)
        + _pack_bits([2], 8)
        + _pack_bits([5], 8)
        + _pack_bits(packed, 2)
    )
    raw = _message([
        _sec1(),
        _sec3_latlon(ni, nj, 55.0, 4.0, 55.0, 6.0, 0.5, 0.5, 0),
        _sec4(),
        sec5,
        _sec6(None),
        _section(7, stream),
    ])
    data = read_grib(_write(tmp_path, raw))
    out = data.array[0, 0]
    np.testing.assert_array_equal(
        out[[0, 1, 3, 4]], np.array([7, 8, 9, 8], dtype=float)
    )
    assert out[2] == data.no_data_value


@pytest.mark.parametrize("order", [1, 2])
def test_spatial_differencing(tmp_path, order):
    """Data template 7.3: encode a smooth field's differences by hand,
    decode, and compare against the original (g2lib semantics)."""
    field = np.array([100, 103, 108, 115, 124, 135, 148, 150, 149, 151],
                     dtype=np.int64)
    npts = field.size
    if order == 1:
        diffs = np.diff(field)
        initials = [int(field[0])]
    else:
        diffs = np.diff(np.diff(field))
        initials = [int(field[0]), int(field[1])]
    gmin = int(diffs.min())
    # packed stream: `order` placeholder zeros, then diffs - gmin
    packed = np.concatenate(
        [np.zeros(order, dtype=np.int64), diffs - gmin]
    )
    nbits = max(int(packed.max()).bit_length(), 1)
    nb = 2  # octets per extra descriptor
    sec5_tpl = (
        struct.pack(">f", 0.0) + _sm(0, 2) + _sm(0, 2)
        + bytes([nbits, 0, 1, 0])
        + bytes(8)
        + struct.pack(">I", 1)  # one group
        + bytes([0, 8])
        + struct.pack(">I", 0)
        + bytes([1])
        + struct.pack(">I", npts)
        + bytes([8])
        + bytes([order, nb])
    )
    sec5 = _section(5, struct.pack(">IH", npts, 3) + sec5_tpl)
    stream = (
        b"".join(_sm(v, nb) for v in initials)
        + _sm(gmin, nb)
        + _pack_bits([0], nbits)  # group reference
        + _pack_bits([nbits], 8)  # group width
        + _pack_bits([npts], 8)  # scaled group length
        + _pack_bits(packed, nbits)
    )
    raw = _message([
        _sec1(),
        _sec3_latlon(npts, 1, 55.0, 4.0, 55.0, 4 + 0.5 * (npts - 1),
                     0.5, 0.5, 0),
        _sec4(),
        sec5,
        _sec6(None),
        _section(7, stream),
    ])
    data = read_grib(_write(tmp_path, raw))
    np.testing.assert_array_equal(data.array[0, 0], field)


def test_png_packing(tmp_path):
    """Data template 7.41: the data section is a PNG stream."""
    from dask_geomodeling_tpu.io.png import write_png_bytes

    values = (np.arange(24, dtype=np.uint8).reshape(4, 6) * 9) % 251
    png = write_png_bytes(values[np.newaxis])
    sec5_tpl = struct.pack(">f", 0.0) + _sm(0, 2) + _sm(0, 2) + bytes([8, 0])
    sec5 = _section(5, struct.pack(">IH", values.size, 41) + sec5_tpl)
    raw = _message([
        _sec1(),
        _sec3_latlon(6, 4, 55.0, 4.0, 53.5, 6.5, 0.5, 0.5, 0),
        _sec4(),
        sec5,
        _sec6(None),
        _section(7, png),
    ])
    data = read_grib(_write(tmp_path, raw))
    np.testing.assert_array_equal(data.array[0], values)


def test_lambert_grid(tmp_path):
    """Grid template 3.30 maps onto the native LCC CRS."""
    values = np.arange(12, dtype=np.int64).reshape(3, 4)
    nj, ni = values.shape
    flat = values.ravel()
    raw = _message([
        _sec1(),
        _sec3_lambert(ni, nj, la1=46.0, lo1=5.0, lad=52.0, lov=10.0,
                      dx=3000.0, dy=3000.0, latin1=48.0, latin2=56.0,
                      scan=0x40),  # rows south -> north (HRRR-style)
        _sec4(),
        _sec5_simple(values.size, 0.0, 0, 0, 4),
        _sec6(None),
        _sec7_simple(flat, 4),
    ])
    data = read_grib(_write(tmp_path, raw))
    assert "+proj=lcc" in data.projection
    assert "+lat_1=48" in data.projection
    # +j scanning: stored row 0 is the southernmost -> flipped on decode
    np.testing.assert_array_equal(data.array[0], values[::-1])
    gt = data.geo_transform
    assert gt[1] == 3000.0 and gt[5] == -3000.0
    # the first grid point (la1, lo1) is the grid's SW node: the north
    # edge sits (nj-1) rows above it, plus the half-pixel shift
    from dask_geomodeling_tpu.geo.crs import get_transform_func

    x1, y1 = get_transform_func("EPSG:4326", data.projection)(
        np.array([5.0]), np.array([46.0])
    )
    np.testing.assert_allclose(gt[0], float(x1[0]) - 1500.0, rtol=1e-9)
    np.testing.assert_allclose(
        gt[3], float(y1[0]) + 2 * 3000.0 + 1500.0, rtol=1e-9
    )


def test_element_and_level_metadata(tmp_path):
    """GDAL-style band descriptions: element short name + fixed surface."""
    values = np.ones((2, 2), dtype=np.int64)
    raw = _message([
        _sec1(),
        _sec3_latlon(2, 2, 55.0, 4.0, 54.5, 4.5, 0.5, 0.5, 0),
        _sec4(category=3, number=5, surface=(100, 0, 50000)),  # HGT @ 500hPa
        _sec5_simple(4, 0.0, 0, 0, 1),
        _sec6(None),
        _sec7_simple(values.ravel(), 1),
    ])
    data = read_grib(_write(tmp_path, raw))
    meta = data.metadata[0]
    assert "element=HGT" in meta
    assert "level=isobaric (Pa) 50000" in meta
    # default fixture surface: plain ground surface
    path2 = _write(tmp_path, _simple_message(values), name="t2.grib2")
    assert "element=APCP" in read_grib(path2).metadata[0]
    assert "level=surface" in read_grib(path2).metadata[0]


def test_forecast_label_template_4_8(tmp_path):
    """Review regression: the template number lives at section-4 octets
    8-9; templates like 4.8 (accumulations) must keep forecastTime."""
    values = np.ones((2, 2), dtype=np.int64)
    raw = _message([
        _sec1(),
        _sec3_latlon(2, 2, 55.0, 4.0, 54.5, 4.5, 0.5, 0.5, 0),
        _sec4(category=20, number=1, forecast=6, template=8),
        _sec5_simple(4, 0.0, 0, 0, 1),
        _sec6(None),
        _sec7_simple(values.ravel(), 1),
    ])
    meta = read_grib(_write(tmp_path, raw)).metadata[0]
    assert "forecastTime=+6h" in meta  # category 20 > 15 must not gate it
    assert "parameterCategory=20" in meta


def test_basic_angle_units(tmp_path):
    """Review regression: basic=1/subdivisions=1000 means coordinates in
    thousandths of a degree (NOT the 1e-6 default)."""
    def sec3_units(basic, subdiv, la1, lo1, la2, lo2, di, dj):
        tpl = bytearray()
        tpl += bytes([6]) + bytes(5) + bytes(10)
        tpl += struct.pack(">II", 2, 2)
        tpl += struct.pack(">II", basic, subdiv)
        tpl += _sm(la1, 4) + _sm(lo1, 4)
        tpl += bytes([0x30])
        tpl += _sm(la2, 4) + _sm(lo2, 4)
        tpl += struct.pack(">II", di, dj)
        tpl += bytes([0])
        return _section(
            3, struct.pack(">BIBBH", 0, 4, 0, 0, 0) + bytes(tpl)
        )

    values = np.arange(4, dtype=np.int64).reshape(2, 2)
    # all coordinate fields in units of 1/1000 degree
    raw = _message([
        _sec1(),
        sec3_units(1, 1000, la1=55, lo1=4, la2=54, lo2=5, di=1, dj=1),
        _sec4(),
        _sec5_simple(4, 0.0, 0, 0, 2),
        _sec6(None),
        _sec7_simple(values.ravel(), 2),
    ])
    data = read_grib(_write(tmp_path, raw))
    np.testing.assert_allclose(
        data.geo_transform,
        (0.004 - 0.0005, 0.001, 0, 0.055 + 0.0005, 0, -0.001),
        rtol=1e-12,
    )


def test_corrupt_section_length_raises(tmp_path):
    raw = bytearray(_simple_message(np.ones((2, 2), dtype=np.int64)))
    # zero the first section's length field (offset 16)
    struct.pack_into(">I", raw, 16, 0)
    with pytest.raises(ValueError, match="Corrupt GRIB section"):
        read_grib(_write(tmp_path, bytes(raw)))


def test_complex_packing_scales(tmp_path):
    """Review regression: complex-packed decode must not be quadratic in
    the group count (the bitstream unpacks once)."""
    import time

    rng = np.random.RandomState(3)
    ny, nx = 200, 250
    field = rng.randint(0, 4, size=ny * nx).astype(np.int64)
    ngroups = 2500
    size = field.size // ngroups
    nbits = 5
    refs, widths, lengths, payload = [], [], [], []
    for g in range(ngroups):
        chunk = field[g * size : (g + 1) * size]
        refs.append(int(chunk.min()))
        widths.append(2)
        lengths.append(chunk.size)
        payload.extend(int(v) - refs[-1] for v in chunk)
    sec5_tpl = (
        struct.pack(">f", 0.0) + _sm(0, 2) + _sm(0, 2)
        + bytes([nbits, 0, 1, 0]) + bytes(8)
        + struct.pack(">I", ngroups)
        + bytes([0, 8])
        + struct.pack(">I", 0) + bytes([1])
        + struct.pack(">I", lengths[-1]) + bytes([16])
    )
    sec5 = _section(5, struct.pack(">IH", field.size, 2) + sec5_tpl)
    stream = (
        _pack_bits(refs, nbits) + _pack_bits(widths, 8)
        + _pack_bits(lengths, 16) + _pack_bits(payload, 2)
    )
    raw = _message([
        _sec1(),
        _sec3_latlon(nx, ny, 55.0, 4.0, 55.0 - 0.01 * (ny - 1),
                     4.0 + 0.01 * (nx - 1), 0.01, 0.01, 0),
        _sec4(), sec5, _sec6(None), _section(7, stream),
    ])
    t0 = time.perf_counter()
    data = read_grib(_write(tmp_path, raw))
    elapsed = time.perf_counter() - t0
    np.testing.assert_array_equal(data.array[0].ravel(), field)
    assert elapsed < 2.0, "complex unpack took %.1fs" % elapsed


def test_mercator_grid(tmp_path):
    """Grid template 3.10: the standard parallel scales the projection."""
    values = np.arange(20, dtype=np.int64).reshape(4, 5)
    raw = _message([
        _sec1(),
        _sec3_mercator(5, 4, la1=50.0, lo1=0.0, lad=20.0,
                       di=10000.0, dj=10000.0, scan=0),
        _sec4(),
        _sec5_simple(20, 0.0, 0, 0, 5),
        _sec6(None),
        _sec7_simple(values.ravel(), 5),
    ])
    data = read_grib(_write(tmp_path, raw))
    assert "+proj=merc" in data.projection
    assert "+lat_ts=20" in data.projection
    np.testing.assert_array_equal(data.array[0], values)
    gt = data.geo_transform
    assert gt[1] == 10000.0 and gt[5] == -10000.0
    from dask_geomodeling_tpu.geo.crs import get_transform_func

    x1, y1 = get_transform_func("EPSG:4326", data.projection)(
        np.array([0.0]), np.array([50.0])
    )
    # scan 0: the first point is the NW node
    np.testing.assert_allclose(gt[0], float(x1[0]) - 5000.0, atol=1e-6)
    np.testing.assert_allclose(gt[3], float(y1[0]) + 5000.0, atol=1e-6)
    # the standard parallel contracts x vs a lat_ts=0 Mercator
    x_plain, _ = get_transform_func(
        "EPSG:4326",
        "+proj=merc +lat_ts=0 +lon_0=0 +a=6371229 +b=6371229 +units=m",
    )(np.array([10.0]), np.array([0.0]))
    x_ts, _ = get_transform_func("EPSG:4326", data.projection)(
        np.array([10.0]), np.array([0.0])
    )
    assert abs(float(x_ts[0])) < abs(float(x_plain[0]))


@pytest.mark.parametrize("south", [False, True])
def test_polar_stereographic_grid(tmp_path, south):
    """Grid template 3.20, both projection-centre hemispheres."""
    values = np.arange(12, dtype=np.int64).reshape(3, 4)
    la1 = -60.0 if south else 60.0
    raw = _message([
        _sec1(),
        _sec3_polar(4, 3, la1=la1, lo1=10.0, lad=la1, lov=350.0,
                    dx=25000.0, dy=25000.0, scan=0x40, south=south),
        _sec4(),
        _sec5_simple(12, 0.0, 0, 0, 4),
        _sec6(None),
        _sec7_simple(values.ravel(), 4),
    ])
    data = read_grib(_write(tmp_path, raw))
    assert "+proj=stere" in data.projection
    assert ("+lat_0=-90" if south else "+lat_0=90") in data.projection
    assert "+lon_0=-10" in data.projection  # 350 normalised to -10
    # +j scanning: stored row 0 is the southern strip
    np.testing.assert_array_equal(data.array[0], values[::-1])
    from dask_geomodeling_tpu.geo.crs import get_transform_func

    x1, y1 = get_transform_func("EPSG:4326", data.projection)(
        np.array([10.0]), np.array([la1])
    )
    gt = data.geo_transform
    np.testing.assert_allclose(gt[0], float(x1[0]) - 12500.0, rtol=1e-9)
    np.testing.assert_allclose(
        gt[3], float(y1[0]) + 2 * 25000.0 + 12500.0, rtol=1e-9
    )


def test_raster_file_source_integration(tmp_path):
    """GRIB2 behind RasterFileSource: request protocol end to end."""
    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import RasterFileSource

    values = np.arange(100, dtype=np.int64).reshape(10, 10)
    path = _write(tmp_path, _simple_message(
        values, la1=55.0, lo1=4.0, di=0.1, dj=0.1))
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource("test.grib2")
        assert source.projection == "EPSG:4326"
        assert len(source) == 1
        data = source.get_data(
            mode="vals",
            bbox=(3.95, 54.15, 4.95, 55.05),
            projection="EPSG:4326",
            width=10,
            height=9,
        )
    assert data["values"].shape == (1, 9, 10)
    np.testing.assert_array_equal(data["values"][0], values[:9].astype("f8"))
    meta = source.get_data(mode="meta", start=None, stop=None)
    assert "GRIB discipline=0" in meta["meta"][0]


def test_errors(tmp_path):
    with pytest.raises(IOError, match="Not a GRIB"):
        read_grib(_write(tmp_path, b"NOPE" + bytes(20)))
    # unknown editions are rejected with a clear message (1 and 2 parse)
    raw = bytearray(_simple_message(np.ones((2, 2), dtype=np.int64)))
    raw[7] = 3
    with pytest.raises(ValueError, match="edition"):
        read_grib(_write(tmp_path, bytes(raw)))


def test_jpeg2000_packing(tmp_path):
    """Data template 7.40: the data section is a JPEG2000 codestream
    (NCEP's common GFS packing)."""
    from io import BytesIO

    PIL = pytest.importorskip("PIL.Image")
    from PIL import features

    if not features.check("jpg_2000"):
        pytest.skip("OpenJPEG not available")
    values = ((np.arange(24) * 9) % 251).astype(np.uint8).reshape(4, 6)
    buf = BytesIO()
    PIL.fromarray(values).save(
        buf, format="JPEG2000", quality_mode="lossless", irreversible=False
    )
    sec5_tpl = (
        struct.pack(">f", 0.0) + _sm(-1, 2) + _sm(1, 2)  # E=-1, D=1
        + bytes([8, 0])
    )
    sec5 = _section(5, struct.pack(">IH", values.size, 40) + sec5_tpl)
    raw = _message([
        _sec1(),
        _sec3_latlon(6, 4, 55.0, 4.0, 53.5, 6.5, 0.5, 0.5, 0),
        _sec4(),
        sec5,
        _sec6(None),
        _section(7, buf.getvalue()),
    ])
    data = read_grib(_write(tmp_path, raw))
    np.testing.assert_allclose(
        data.array[0], (values.astype(float) * 0.5) / 10.0
    )


# ------------------------------------------------------------ edition 1
# An independent spec-conformant GRIB1 encoder (WMO FM 92 edition-1
# octet layouts), mirroring the edition-2 encoder above: the reader is
# tested against the specification, not against itself.


def _ibm(value):
    """IBM System/360 single-precision encoding (BDS reference value)."""
    if value == 0:
        return bytes(4)
    sign = 0x80000000 if value < 0 else 0
    value = abs(float(value))
    exponent = 64
    while value >= 1.0:
        value /= 16.0
        exponent += 1
    while value < 1.0 / 16.0:
        value *= 16.0
        exponent -= 1
    mantissa = int(round(value * (1 << 24)))
    if mantissa == 1 << 24:  # rounded up past the mantissa field
        mantissa >>= 4
        exponent += 1
    return struct.pack(">I", sign | (exponent << 24) | mantissa)


def _g1_pds(parameter=61, level_type=1, level=0, year=24, month=3,
            day=15, hour=6, minute=0, time_unit=1, p1=3, p2=0, trange=0,
            century=21, D=0, has_gds=True, has_bms=False, grid_id=255):
    # ``year`` is the year of the century (PDS octet 13)
    body = bytearray()
    body += (28).to_bytes(3, "big")  # section length
    body += bytes([2, 0, 0, grid_id])  # table version, centre, process, grid
    body += bytes([(0x80 if has_gds else 0) | (0x40 if has_bms else 0)])
    body += bytes([parameter, level_type])
    body += level.to_bytes(2, "big")
    body += bytes([year, month, day, hour, minute, time_unit, p1, p2, trange])
    body += bytes(2)  # number in average
    body += bytes([0, century, 0])  # missing, century, sub-centre
    body += _sm(D, 2)
    return bytes(body)


def _g1_gds_latlon(ni, nj, la1, lo1, la2, lo2, di=None, dj=None, scan=0):
    body = bytearray()
    body += (32).to_bytes(3, "big")
    body += bytes([0, 255, 0])  # NV, PV=none, representation 0 (lat/lon)
    body += struct.pack(">HH", ni, nj)
    body += _sm(round(la1 * 1e3), 3) + _sm(round(lo1 * 1e3), 3)
    body += bytes([0x80 if di is not None else 0])  # increments given
    body += _sm(round(la2 * 1e3), 3) + _sm(round(lo2 * 1e3), 3)
    body += (round(di * 1e3) if di is not None else 0xFFFF).to_bytes(2, "big")
    body += (round(dj * 1e3) if dj is not None else 0xFFFF).to_bytes(2, "big")
    body += bytes([scan])
    body += bytes(4)  # reserved
    return bytes(body)


def _g1_gds_lambert(nx, ny, la1, lo1, lov, dx, dy, latin1, latin2, scan=0):
    body = bytearray()
    body += (42).to_bytes(3, "big")
    body += bytes([0, 255, 3])  # representation 3 (Lambert conformal)
    body += struct.pack(">HH", nx, ny)
    body += _sm(round(la1 * 1e3), 3) + _sm(round(lo1 * 1e3), 3)
    body += bytes([0])  # resolution flags: sphere
    body += _sm(round(lov * 1e3), 3)
    body += round(dx).to_bytes(3, "big") + round(dy).to_bytes(3, "big")
    body += bytes([0])  # projection centre: north pole
    body += bytes([scan])
    body += _sm(round(latin1 * 1e3), 3) + _sm(round(latin2 * 1e3), 3)
    body += _sm(-90000, 3) + _sm(0, 3)  # south pole of projection
    body += bytes(2)
    return bytes(body)


def _g1_bms(mask):
    bits = _pack_bits(mask.ravel().astype(int), 1)
    unused = (8 - mask.size % 8) % 8
    body = (6 + len(bits)).to_bytes(3, "big") + bytes([unused, 0, 0]) + bits
    return body


def _g1_bds(values, R, E, D, nbits, flags=0):
    X = np.round((np.asarray(values, float) * 10.0 ** D - R) / 2.0 ** E)
    packed = _pack_bits(X.astype(np.int64), nbits) if nbits else b""
    body = bytearray()
    body += bytes(3)  # length patched below
    unused = (8 - values.size * nbits % 8) % 8 if nbits else 0
    body += bytes([(flags << 4) | unused])
    body += _sm(E, 2)
    body += _ibm(R)
    body += bytes([nbits])
    body += packed
    if len(body) % 2:  # BDS lengths are even by spec
        body += b"\x00"
    body[0:3] = len(body).to_bytes(3, "big")
    return bytes(body)


def _g1_message(pds, gds=b"", bms=b"", bds=b""):
    inner = pds + gds + bms + bds
    total = 8 + len(inner) + 4
    return b"GRIB" + total.to_bytes(3, "big") + bytes([1]) + inner + b"7777"


def _g1_simple(values, la1=55.0, lo1=4.0, di=0.5, dj=0.5, scan=0,
               R=0.0, E=0, D=0, nbits=12, **pds_kw):
    nj, ni = values.shape
    la2 = la1 - (nj - 1) * dj if not scan & 0x40 else la1 + (nj - 1) * dj
    lo2 = lo1 + (ni - 1) * di if not scan & 0x80 else lo1 - (ni - 1) * di
    return _g1_message(
        _g1_pds(D=D, **pds_kw),
        _g1_gds_latlon(ni, nj, la1, lo1, la2, lo2, di, dj, scan),
        b"",
        _g1_bds(values.ravel(), R, E, D, nbits),
    )


def test_grib1_simple_roundtrip(tmp_path):
    values = np.arange(24.0).reshape(4, 6)
    data = read_grib(_write(tmp_path, _g1_simple(values), "test.grb"))
    assert data.array.shape == (1, 4, 6)
    np.testing.assert_allclose(data.array[0], values)
    assert data.projection == "EPSG:4326"
    x0, dx, _, y0, _, dy = data.geo_transform
    assert (dx, dy) == (0.5, -0.5)
    np.testing.assert_allclose((x0, y0), (4.0 - 0.25, 55.0 + 0.25))


def test_grib1_scaling_and_ibm_reference(tmp_path):
    # D=1, E=2, non-zero reference: Y = (R + X*2^E) / 10^D
    values = (np.arange(12.0).reshape(3, 4) * 0.4) + 10.0
    raw = _g1_simple(values, R=100.0, E=2, D=1, nbits=10)
    data = read_grib(_write(tmp_path, raw, "t.grb"))
    np.testing.assert_allclose(data.array[0], values)


def test_grib1_constant_field(tmp_path):
    # nbits=0: every grid point equals the (scaled) reference value
    values = np.full((3, 4), 2.5)
    raw = _g1_simple(values, R=25.0, D=1, nbits=0)
    data = read_grib(_write(tmp_path, raw, "t.grb"))
    np.testing.assert_allclose(data.array[0], 2.5)


def test_grib1_bitmap(tmp_path):
    values = np.arange(24.0).reshape(4, 6)
    mask = np.ones((4, 6), bool)
    mask[0, 0] = mask[3, 5] = False
    raw = _g1_message(
        _g1_pds(has_bms=True),
        _g1_gds_latlon(6, 4, 55.0, 4.0, 53.5, 6.5, 0.5, 0.5),
        _g1_bms(mask),
        _g1_bds(values[mask], 0.0, 0, 0, 12),
    )
    data = read_grib(_write(tmp_path, raw, "t.grb"))
    np.testing.assert_allclose(data.array[0][mask], values[mask])
    fill = np.float32(data.no_data_value)
    assert np.all(data.array[0][~mask] == fill)


def test_grib1_scanning_modes(tmp_path):
    base = np.arange(24.0).reshape(4, 6)
    for scan in (0x00, 0x80, 0x40, 0xC0, 0x20):
        if scan & 0x20:
            sent = base.T.ravel()
            raw = _g1_message(
                _g1_pds(),
                _g1_gds_latlon(6, 4, 55.0, 4.0, 53.5, 6.5, 0.5, 0.5, scan),
                b"",
                _g1_bds(sent, 0.0, 0, 0, 12),
            )
        else:
            sent = base.copy()
            if scan & 0x40:
                sent = sent[::-1]
            if scan & 0x80:
                sent = sent[:, ::-1]
            la1 = 53.5 if scan & 0x40 else 55.0
            lo1 = 6.5 if scan & 0x80 else 4.0
            raw = _g1_simple(sent, la1=la1, lo1=lo1, scan=scan)
        data = read_grib(_write(tmp_path, raw, "t.grb"))
        np.testing.assert_allclose(data.array[0], base, err_msg=hex(scan))
        np.testing.assert_allclose(
            data.geo_transform, (3.75, 0.5, 0, 55.25, 0, -0.5),
            err_msg=hex(scan),
        )


def test_grib1_multi_message_and_mixed_editions(tmp_path):
    a = np.arange(24.0).reshape(4, 6)
    b = a * 2.0
    raw1 = _g1_simple(a)
    raw2 = _simple_message(b, la1=55.0, lo1=4.0, di=0.5, dj=0.5)
    data = read_grib(_write(tmp_path, raw1 + raw2, "t.grb"))
    assert data.array.shape == (2, 4, 6)
    np.testing.assert_allclose(data.array[0], a)
    np.testing.assert_allclose(data.array[1], b)


def test_grib1_lambert_grid(tmp_path):
    values = np.arange(20.0).reshape(4, 5)
    raw = _g1_message(
        _g1_pds(),
        _g1_gds_lambert(5, 4, 46.0, 8.0, 9.0, 2500.0, 2500.0, 46.0, 49.0,
                        scan=0x40),
        b"",
        _g1_bds(values.ravel(), 0.0, 0, 0, 12),
    )
    data = read_grib(_write(tmp_path, raw, "t.grb"))
    assert data.array.shape == (1, 4, 5)
    assert "+proj=lcc" in data.projection
    assert "+lat_1=46" in data.projection
    _, dx, _, _, _, dy = data.geo_transform
    np.testing.assert_allclose((dx, dy), (2500.0, -2500.0))


def test_grib1_metadata(tmp_path):
    raw = _g1_simple(
        np.arange(6.0).reshape(2, 3),
        parameter=61, level_type=105, level=2, p1=6,
        year=99, century=20, month=12, day=31, hour=18,
    )
    data = read_grib(_write(tmp_path, raw, "t.grb"))
    meta = data.metadata[0]
    assert "element=APCP" in meta
    assert 'level="2 height above ground (m)"' in meta
    assert "forecastTime=+6h" in meta
    assert "refTime=1999-12-31T18:00:00" in meta


def test_grib1_rejects_unsupported(tmp_path):
    values = np.arange(6.0)
    # second-order packing flag
    raw = _g1_message(
        _g1_pds(),
        _g1_gds_latlon(3, 2, 55.0, 4.0, 54.5, 5.0, 0.5, 0.5),
        b"",
        _g1_bds(values, 0.0, 0, 0, 12, flags=0x4),
    )
    with pytest.raises(ValueError, match="second-order"):
        read_grib(_write(tmp_path, raw, "t.grb"))
    # pre-defined grid (no GDS)
    raw = _g1_message(
        _g1_pds(has_gds=False, grid_id=21), b"", b"",
        _g1_bds(values, 0.0, 0, 0, 12),
    )
    with pytest.raises(ValueError, match="pre-defined grid"):
        read_grib(_write(tmp_path, raw, "t.grb"))


def test_grib1_derived_increments(tmp_path):
    # increments flagged missing: derived from the corner coordinates
    values = np.arange(24.0).reshape(4, 6)
    raw = _g1_message(
        _g1_pds(),
        _g1_gds_latlon(6, 4, 55.0, 4.0, 53.5, 6.5, None, None),
        b"",
        _g1_bds(values.ravel(), 0.0, 0, 0, 12),
    )
    data = read_grib(_write(tmp_path, raw, "t.grb"))
    np.testing.assert_allclose(
        data.geo_transform, (3.75, 0.5, 0, 55.25, 0, -0.5)
    )


# ------------------------------------------------------- thinned grids


def _sec3_latlon_thinned(row_counts, la1, lo1, la2, lo2, dj, scan=0):
    """Template 3.0 with Ni missing and trailing per-row point counts."""
    nj = len(row_counts)
    tpl = bytearray()
    tpl += bytes([6])
    tpl += bytes(5)
    tpl += bytes(10)
    tpl += struct.pack(">II", 0xFFFFFFFF, nj)
    tpl += bytes(8)
    tpl += _sm(round(la1 * 1e6), 4)
    tpl += _sm(round((lo1 % 360.0) * 1e6), 4)
    tpl += bytes([0x10])  # only Dj given; Di derives from the corners
    tpl += _sm(round(la2 * 1e6), 4)
    tpl += _sm(round((lo2 % 360.0) * 1e6), 4)
    tpl += struct.pack(">II", 0, round(dj * 1e6))
    tpl += bytes([scan])
    counts = b"".join(int(c).to_bytes(2, "big") for c in row_counts)
    body = (
        struct.pack(">BIBBH", 0, int(sum(row_counts)), 2, 1, 0)
        + bytes(tpl) + counts
    )
    return _section(3, body)


def test_grib2_thinned_latlon(tmp_path):
    counts = [4, 2, 4]
    flat = np.array([1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    msg = _message(
        [
            _sec1(),
            _sec3_latlon_thinned(counts, 55.0, 4.0, 54.0, 5.5, dj=0.5),
            _sec4(),
            _sec5_simple(flat.size, 0.0, 0, 0, 8),
            _sec6(),
            _sec7_simple(flat.astype(int), 8),
        ]
    )
    data = read_grib(_write(tmp_path, msg, "thin.grib2"))
    assert data.array.shape == (1, 3, 4)
    np.testing.assert_array_equal(data.array[0, 0], [1, 2, 3, 4])
    # the 2-point row expands nearest-neighbour (value-preserving)
    np.testing.assert_array_equal(data.array[0, 1], [5, 5, 6, 6])
    np.testing.assert_array_equal(data.array[0, 2], [7, 8, 9, 10])
    assert data.geo_transform[1] == pytest.approx(1.5 / 3)


def test_grib2_thinned_with_bitmap(tmp_path):
    counts = [3, 2]
    flat = np.array([1.0, 2, 3, 4, 5])
    mask = np.array([1, 0, 1, 1, 1], bool)
    present = flat[mask]
    msg = _message(
        [
            _sec1(),
            _sec3_latlon_thinned(counts, 55.0, 4.0, 54.5, 5.0, dj=0.5),
            _sec4(),
            _sec5_simple(present.size, 0.0, 0, 0, 8),
            _sec6(mask),
            _sec7_simple(present.astype(int), 8),
        ]
    )
    data = read_grib(_write(tmp_path, msg, "thinbm.grib2"))
    nodata = data.no_data_value
    # row 0: [1, nodata, 3]; expanded hole stays a hole
    assert data.array.shape == (1, 2, 3)
    assert data.array[0, 0, 0] == 1.0
    assert data.array[0, 0, 1] == nodata
    assert data.array[0, 0, 2] == 3.0


def _g1_gds_latlon_thinned(row_counts, la1, lo1, la2, lo2, scan=0):
    nj = len(row_counts)
    body = bytearray()
    body += (32 + 2 * nj).to_bytes(3, "big")
    body += bytes([0, 33, 0])  # NV=0, PL list at octet 33, rep 0
    body += struct.pack(">HH", 0xFFFF, nj)
    body += _sm(round(la1 * 1e3), 3) + _sm(round(lo1 * 1e3), 3)
    body += bytes([0])  # increments not given
    body += _sm(round(la2 * 1e3), 3) + _sm(round(lo2 * 1e3), 3)
    body += (0xFFFF).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
    body += bytes([scan])
    body += bytes(4)
    for count in row_counts:
        body += int(count).to_bytes(2, "big")
    return bytes(body)


def test_grib1_thinned_latlon(tmp_path):
    counts = [2, 4]
    flat = np.array([1.0, 2, 3, 4, 5, 6])
    msg = _g1_message(
        _g1_pds(),
        _g1_gds_latlon_thinned(counts, 55.0, 4.0, 54.5, 5.5),
        b"",
        _g1_bds(flat, 0.0, 0, 0, 8),
    )
    data = read_grib(_write(tmp_path, msg, "thin.grb"))
    assert data.array.shape == (1, 2, 4)
    np.testing.assert_array_equal(data.array[0, 0], [1, 1, 2, 2])
    np.testing.assert_array_equal(data.array[0, 1], [3, 4, 5, 6])


def test_grib1_thinned_without_list_rejected(tmp_path):
    gds = bytearray(
        _g1_gds_latlon_thinned([2, 2], 55.0, 4.0, 54.5, 5.0)
    )
    gds[4] = 0xFF  # PL location: none
    msg = _g1_message(
        _g1_pds(), bytes(gds), b"", _g1_bds(np.zeros(4), 0.0, 0, 0, 8)
    )
    with pytest.raises(ValueError, match="point-count"):
        read_grib(_write(tmp_path, msg, "bad.grb"))


# ----------------------------------------------------- CCSDS packing


def _sec5_ccsds(npts, R, E, D, nbits, flags, block, rsi):
    tpl = struct.pack(">f", R) + _sm(E, 2) + _sm(D, 2)
    tpl += bytes([nbits, 0, flags, block])
    tpl += struct.pack(">H", rsi)
    return _section(5, struct.pack(">IH", npts, 42) + tpl)


def test_grib2_ccsds_packed(tmp_path):
    """Template 5.42: the payload is a CCSDS/AEC stream produced by the
    AUTHORITATIVE encoder (libaec aec_buffer_encode)."""
    from dask_geomodeling_tpu.io import ccsds

    if not ccsds.aec_available():
        pytest.skip("libaec not loadable")
    values = ((np.arange(24) * 37) % 1800).reshape(4, 6) / 10.0
    nbits, flags, block, rsi = 12, 8 | 4, 16, 64  # PREPROCESS | MSB
    packed = np.round(values * 10.0).astype(">u2")  # D=1, E=0, R=0
    stream = ccsds.aec_encode(
        packed.tobytes(), bits_per_sample=nbits, block_size=block,
        rsi=rsi, flags=flags,
    )
    msg = _message(
        [
            _sec1(),
            _sec3_latlon(6, 4, 55.0, 4.0, 53.5, 6.5, 0.5, 0.5, 0),
            _sec4(),
            _sec5_ccsds(values.size, 0.0, 0, 1, nbits, flags, block, rsi),
            _sec6(),
            _section(7, bytes(stream)),
        ]
    )
    from dask_geomodeling_tpu.io.grib import read_grib

    data = read_grib(_write(tmp_path, msg, "ccsds.grib2"))
    np.testing.assert_allclose(data.array[0], values, atol=1e-9)


def test_grib2_ccsds_3byte_cells(tmp_path):
    """5.42 with 17-24 bit samples and the AEC_DATA_3BYTE flag: cells
    occupy exactly three octets."""
    from dask_geomodeling_tpu.io import ccsds

    if not ccsds.aec_available():
        pytest.skip("libaec not loadable")
    values = ((np.arange(24) * 977) % 100000).reshape(4, 6).astype(float)
    nbits, flags, block, rsi = 20, 8 | 4 | 2, 16, 64  # PREPROCESS|MSB|3BYTE
    packed = np.round(values).astype(np.int64).ravel()
    triplets = np.zeros((packed.size, 3), np.uint8)
    triplets[:, 0] = (packed >> 16) & 0xFF
    triplets[:, 1] = (packed >> 8) & 0xFF
    triplets[:, 2] = packed & 0xFF
    stream = ccsds.aec_encode(
        triplets.tobytes(), bits_per_sample=nbits, block_size=block,
        rsi=rsi, flags=flags,
    )
    msg = _message(
        [
            _sec1(),
            _sec3_latlon(6, 4, 55.0, 4.0, 53.5, 6.5, 0.5, 0.5, 0),
            _sec4(),
            _sec5_ccsds(values.size, 0.0, 0, 0, nbits, flags, block, rsi),
            _sec6(),
            _section(7, bytes(stream)),
        ]
    )
    from dask_geomodeling_tpu.io.grib import read_grib

    data = read_grib(_write(tmp_path, msg, "ccsds3.grib2"))
    np.testing.assert_allclose(data.array[0], values, atol=1e-9)
