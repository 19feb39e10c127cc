"""HDF4 raster source tests.

The fixtures are built by an independent encoder below (DD chains,
NDG/SDD/SD objects, Vdata/Vgroup records, special elements written out
octet by octet), so the reader in ``io/hdf4.py`` is tested against the
container layout, not against itself.  Reference behavior: GDAL's HDF4
driver behind ``gdal.Open`` (reference raster/sources.py:66-71).
"""
import struct
import zlib

import numpy as np
import pytest

from dask_geomodeling_tpu.io.hdf4 import is_hdf4, read_hdf4

MAGIC = b"\x0e\x03\x13\x01"

TAG_LINKED = 20
TAG_COMPRESSED = 40
TAG_CHUNK = 61
TAG_NT = 106
TAG_SDD = 701
TAG_SD = 702
TAG_CAL = 731
TAG_FV = 732
TAG_NDG = 720
TAG_VH = 1962
TAG_VS = 1963
TAG_VG = 1965
SPECIAL = 0x4000

DFNT = {"u1": 21, "i1": 20, "i2": 22, "u2": 23, "i4": 24, "u4": 25,
        "f4": 5, "f8": 6}


class Writer:
    def __init__(self):
        self.objs = []

    def add(self, tag, ref, data):
        self.objs.append((tag, ref, bytes(data)))
        return ref

    def tobytes(self):
        count = len(self.objs)
        data_start = 4 + 6 + 12 * count
        entries = b""
        payload = b""
        for tag, ref, data in self.objs:
            entries += struct.pack(
                ">HHii", tag, ref, data_start + len(payload), len(data)
            )
            payload += data
        return (
            MAGIC + struct.pack(">hi", count, 0) + entries + payload
        )

    def write(self, tmp_path, name="test.hdf"):
        path = str(tmp_path / name)
        with open(path, "wb") as f:
            f.write(self.tobytes())
        return path


def _nt(writer, ref, kind):
    # version, type, width-in-bits, class
    width = np.dtype(kind).itemsize * 8
    return writer.add(TAG_NT, ref, bytes([1, DFNT[kind], width, 0]))


def _sdd(writer, ref, dims, nt_ref):
    body = struct.pack(">h", len(dims))
    body += struct.pack(">%di" % len(dims), *dims)
    body += struct.pack(">HH", TAG_NT, nt_ref)  # data NT
    for _ in dims:
        body += struct.pack(">HH", TAG_NT, nt_ref)  # scale NTs
    return writer.add(TAG_SDD, ref, body)


def _ndg(writer, ref, members):
    body = b"".join(struct.pack(">HH", t, r) for t, r in members)
    return writer.add(TAG_NDG, ref, body)


def _simple_sds(writer, values, ref=2, kind=None, extra_ndg=()):
    kind = kind or values.dtype.str.lstrip("<>=|")
    nt_ref = _nt(writer, ref, kind)
    sdd_ref = _sdd(writer, ref, values.shape, nt_ref)
    writer.add(TAG_SD, ref, values.astype(">" + kind).tobytes())
    _ndg(writer, ref, [(TAG_SDD, sdd_ref), (TAG_SD, ref)] + list(extra_ndg))
    return ref


def _vdata(writer, ref, name, vclass, kind, values):
    values = np.atleast_1d(values)
    if kind in ("c", "char"):
        payload = values[0].encode("latin-1")
        type_code, isize, order = 4, len(payload), len(payload)
        nrec, recsize = 1, len(payload)
    else:
        payload = values.astype(">" + kind).tobytes()
        itemsize = np.dtype(kind).itemsize
        type_code, isize, order = DFNT[kind], itemsize, 1
        nrec, recsize = len(values), itemsize
    field = b"VALUES"
    header = struct.pack(">hihh", 0, nrec, recsize, 1)
    header += struct.pack(">h", type_code)
    header += struct.pack(">h", isize)
    header += struct.pack(">h", 0)  # offset
    header += struct.pack(">h", order)
    header += struct.pack(">h", len(field)) + field
    header += struct.pack(">h", len(name)) + name.encode()
    header += struct.pack(">h", len(vclass)) + vclass.encode()
    header += struct.pack(">HHhh", 0, 0, 3, 0)
    writer.add(TAG_VH, ref, header)
    writer.add(TAG_VS, ref, payload)
    return ref


def _vgroup(writer, ref, name, vclass, members):
    body = struct.pack(">h", len(members))
    body += struct.pack(">%dH" % len(members), *[t for t, _ in members])
    body += struct.pack(">%dH" % len(members), *[r for _, r in members])
    body += struct.pack(">H", len(name)) + name.encode()
    body += struct.pack(">H", len(vclass)) + vclass.encode()
    body += struct.pack(">HHH", 0, 0, 3)
    return writer.add(TAG_VG, ref, body)


# ------------------------------------------------------------------ tests


def test_magic_detection(tmp_path):
    writer = Writer()
    _simple_sds(writer, np.arange(6, dtype=np.int16).reshape(2, 3))
    path = writer.write(tmp_path)
    assert is_hdf4(path)
    assert not is_hdf4(__file__)
    with pytest.raises(IOError, match="Not an HDF4"):
        read_hdf4(__file__)


def test_simple_int16_roundtrip(tmp_path):
    values = np.arange(24, dtype=np.int16).reshape(4, 6)
    writer = Writer()
    _simple_sds(writer, values)
    data = read_hdf4(writer.write(tmp_path))
    assert data.array.shape == (1, 4, 6)
    np.testing.assert_array_equal(data.array[0], values)
    # no georeferencing: unit pixel grid
    assert data.geo_transform == (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    assert data.projection is None


def test_rank3_multiband(tmp_path):
    values = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    writer = Writer()
    _simple_sds(writer, values, kind="f4")
    data = read_hdf4(writer.write(tmp_path))
    assert data.array.shape == (2, 3, 4)
    np.testing.assert_array_equal(data.array, values)


def test_fill_value_and_calibration(tmp_path):
    values = np.array([[1, 2], [3, -99]], np.int16)
    writer = Writer()
    fv_ref = writer.add(TAG_FV, 2, np.array(-99, ">i2").tobytes())
    cal = struct.pack(">dddd", 0.5, 0.0, 10.0, 0.0) + struct.pack(">i", 1)
    cal_ref = writer.add(TAG_CAL, 2, cal)
    _simple_sds(
        writer, values,
        extra_ndg=[(TAG_FV, fv_ref), (TAG_CAL, cal_ref)],
    )
    data = read_hdf4(writer.write(tmp_path))
    # value = cal * (stored - offset); fill masked before calibration
    expected = 0.5 * (values.astype(float) - 10.0)
    mask = values == -99
    np.testing.assert_allclose(data.array[0][~mask], expected[~mask])
    assert np.all(data.array[0][mask] == np.float32(data.no_data_value))


def test_sd_api_attributes(tmp_path):
    """_FillValue / scale_factor / add_offset via Attr0.0 Vdatas in the
    variable's Var0.0 Vgroup (the modern SD layout)."""
    values = np.array([[100, 200], [300, 999]], np.int32)
    writer = Writer()
    _simple_sds(writer, values, ref=2)
    _vdata(writer, 11, "_FillValue", "Attr0.0", "i4", [999])
    _vdata(writer, 12, "scale_factor", "Attr0.0", "f8", [0.01])
    _vdata(writer, 13, "long_name", "Attr0.0", "c", ["ignored"])
    _vgroup(writer, 20, "ndvi", "Var0.0",
            [(TAG_NDG, 2), (TAG_VH, 11), (TAG_VH, 12), (TAG_VH, 13)])
    data = read_hdf4(writer.write(tmp_path))
    mask = values == 999
    np.testing.assert_allclose(
        data.array[0][~mask], values[~mask] * 0.01
    )
    assert np.all(data.array[0][mask] == np.float32(data.no_data_value))
    assert data.metadata[0] == "ndvi"


def test_deflate_compressed_element(tmp_path):
    values = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = values.tobytes()
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    # special compressed SD: descriptor + DFTAG_COMPRESSED payload
    desc = struct.pack(">HHiHHH", 3, 0, len(raw), 7, 0, 4)
    desc += struct.pack(">H", 6)  # deflate level info
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, zlib.compress(raw, 6))
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def test_rle_compressed_element(tmp_path):
    values = np.zeros((4, 8), np.uint8)
    values[1] = 7
    raw = values.tobytes()
    # independent RLE encoding: run of 8 zeros, run of 7s, run of zeros
    rle = bytes([127 + 8, 0, 127 + 8, 7, 127 + 16, 0])
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    desc = struct.pack(">HHiHHH", 3, 0, len(raw), 7, 0, 1)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, rle)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def test_linked_blocks_element(tmp_path):
    values = np.arange(40, dtype=np.uint8).reshape(5, 8)
    raw = values.tobytes()
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    # three data blocks of 16/16/8 bytes behind one link table
    desc = struct.pack(">HiiiH", 1, len(raw), 16, 3, 30)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    table = struct.pack(">HHHH", 0, 31, 32, 33)  # next=none + 3 refs
    writer.add(TAG_LINKED, 30, table)
    writer.add(TAG_LINKED, 31, raw[:16])
    writer.add(TAG_LINKED, 32, raw[16:32])
    writer.add(TAG_LINKED, 33, raw[32:])
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def _chunk_table(writer, ref, entries, ndims):
    """The standard _HDF_CHK_TBL Vdata: origin[ndims], chk_tag, chk_ref."""
    payload = b""
    for origin, tag, chunk_ref in entries:
        payload += struct.pack(">%di" % ndims, *origin)
        payload += struct.pack(">HH", tag, chunk_ref)
    recsize = 4 * ndims + 4
    header = struct.pack(">hihh", 0, len(entries), recsize, 3)
    header += struct.pack(">hhh", DFNT["i4"], DFNT["u2"], DFNT["u2"])  # types
    header += struct.pack(">hhh", 4, 2, 2)  # isizes
    header += struct.pack(">hhh", 0, 4 * ndims, 4 * ndims + 2)  # offsets
    header += struct.pack(">hhh", ndims, 1, 1)  # orders
    for field in (b"origin", b"chk_tag", b"chk_ref"):
        header += struct.pack(">h", len(field)) + field
    name = b"_HDF_CHK_TBL_0"
    header += struct.pack(">h", len(name)) + name
    vclass = b"_HDF_CHK_TBL_"
    header += struct.pack(">h", len(vclass)) + vclass
    header += struct.pack(">HHhh", 0, 0, 3, 0)
    writer.add(TAG_VH, ref, header)
    writer.add(TAG_VS, ref, payload)
    return ref


def test_chunked_element(tmp_path):
    values = np.arange(30, dtype=np.int16).reshape(5, 6)
    chunk_dims = (3, 4)  # 2x2 chunk grid with ragged edges
    writer = Writer()
    nt_ref = _nt(writer, 2, "i2")
    _sdd(writer, 2, values.shape, nt_ref)

    entries = []
    ref = 40
    for ci in range(2):
        for cj in range(2):
            block = np.zeros(chunk_dims, np.int16)
            ys = slice(ci * 3, min(ci * 3 + 3, 5))
            xs = slice(cj * 4, min(cj * 4 + 4, 6))
            part = values[ys, xs]
            block[: part.shape[0], : part.shape[1]] = part
            writer.add(TAG_CHUNK, ref, block.astype(">i2").tobytes())
            entries.append(((ci, cj), TAG_CHUNK, ref))
            ref += 1
    _chunk_table(writer, 50, entries, 2)

    fill = np.array(-1, ">i2").tobytes()
    desc = struct.pack(">HBiiii", 6, 1, 0, values.size * 2, 24, 2)
    desc += struct.pack(">HHHH", TAG_VH, 50, 0, 0)
    desc += struct.pack(">i", 2)  # ndims
    desc += struct.pack(">iii", 0, 5, 3)
    desc += struct.pack(">iii", 0, 6, 4)
    desc += struct.pack(">i", len(fill)) + fill
    writer.add(TAG_SD | SPECIAL, 2, desc)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def test_chunked_compressed_chunks(tmp_path):
    """Each chunk is itself a deflate special element (MODIS layout)."""
    values = np.arange(16, dtype=np.uint8).reshape(4, 4)
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)

    entries = []
    ref = 40
    for ci in range(2):
        block = values[ci * 2 : ci * 2 + 2, :]
        raw = block.tobytes()
        desc = struct.pack(">HHiHHH", 3, 0, len(raw), ref + 100, 0, 4)
        writer.add(TAG_CHUNK | SPECIAL, ref, desc)
        writer.add(TAG_COMPRESSED, ref + 100, zlib.compress(raw))
        entries.append(((ci, 0), TAG_CHUNK, ref))
        ref += 1
    _chunk_table(writer, 50, entries, 2)

    desc = struct.pack(">HBiiii", 6, 1, 1, values.size, 21, 1)
    desc += struct.pack(">HHHH", TAG_VH, 50, 0, 0)
    desc += struct.pack(">i", 2)
    desc += struct.pack(">iii", 0, 4, 2)
    desc += struct.pack(">iii", 0, 4, 4)
    desc += struct.pack(">i", 0)  # no fill value
    writer.add(TAG_SD | SPECIAL, 2, desc)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def test_dfsd_standalone_pair(tmp_path):
    """Old DFSD-API files carry SDD/SD pairs without an NDG."""
    values = np.arange(12, dtype=np.float32).reshape(3, 4)
    writer = Writer()
    nt_ref = _nt(writer, 2, "f4")
    _sdd(writer, 2, values.shape, nt_ref)
    writer.add(TAG_SD, 2, values.astype(">f4").tobytes())
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


_SINU_META = """GROUP=SwathStructure
END_GROUP=SwathStructure
GROUP=GridStructure
  GROUP=GRID_1
    GridName="MOD_Grid"
    XDim=4
    YDim=3
    UpperLeftPointMtrs=(-20015109.354,1111950.520)
    LowerRightMtrs=(-18903158.834,0.0)
    Projection=GCTP_SNSOID
    ProjParams=(6371007.181,0,0,0,0,0,0,0,0,0,0,0,0)
    SphereCode=-1
  END_GROUP=GRID_1
END_GROUP=GridStructure
END
"""


def test_hdfeos_sinusoidal_grid(tmp_path):
    values = np.arange(12, dtype=np.int16).reshape(3, 4)
    writer = Writer()
    _simple_sds(writer, values)
    _vdata(writer, 60, "StructMetadata.0", "Attr0.0", "c", [_SINU_META])
    data = read_hdf4(writer.write(tmp_path))
    assert "+proj=sinu" in data.projection
    assert "+R=6371007.18" in data.projection
    x0, dx, _, y0, _, dy = data.geo_transform
    np.testing.assert_allclose(x0, -20015109.354)
    np.testing.assert_allclose(y0, 1111950.520)
    np.testing.assert_allclose(dx, (20015109.354 - 18903158.834) / 4)
    np.testing.assert_allclose(dy, -1111950.520 / 3)


_GEO_META = """GROUP=GridStructure
  GROUP=GRID_1
    XDim=4
    YDim=3
    UpperLeftPointMtrs=(4000000.0,55000000.0)
    LowerRightMtrs=(6000000.0,52000000.0)
    Projection=GCTP_GEO
  END_GROUP=GRID_1
END_GROUP=GridStructure
END
"""


def test_hdfeos_geo_grid_packed_dms(tmp_path):
    values = np.arange(12, dtype=np.int16).reshape(3, 4)
    writer = Writer()
    _simple_sds(writer, values)
    _vdata(writer, 60, "StructMetadata.0", "Attr0.0", "c", [_GEO_META])
    data = read_hdf4(writer.write(tmp_path))
    assert data.projection == "EPSG:4326"
    x0, dx, _, y0, _, dy = data.geo_transform
    np.testing.assert_allclose((x0, y0), (4.0, 55.0))
    np.testing.assert_allclose((dx, dy), (0.5, -1.0))


def test_raster_file_source_integration(tmp_path):
    from dask_geomodeling_tpu.raster import RasterFileSource

    values = np.arange(12, dtype=np.int16).reshape(3, 4)
    writer = Writer()
    _simple_sds(writer, values)
    _vdata(writer, 60, "StructMetadata.0", "Attr0.0", "c", [_GEO_META])
    path = writer.write(tmp_path)
    source = RasterFileSource(path)
    data = source.get_data(
        mode="vals", bbox=(4.0, 52.0, 6.0, 55.0), projection="EPSG:4326",
        width=4, height=3, start=None, stop=None,
    )
    np.testing.assert_array_equal(data["values"][0], values)


def test_unsupported_coder_message(tmp_path):
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, (2, 2), nt_ref)
    desc = struct.pack(">HHiHHH", 3, 0, 4, 7, 0, 5)  # szip
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, b"\x00\x00\x00\x00")
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    with pytest.raises(ValueError, match="szip"):
        read_hdf4(writer.write(tmp_path))


# ---------------------------------------------------------- windowed reads


class TestWindowedReads:
    """The repo-wide invariant: a windowed read is bit-exact with the
    matching slice of the whole-file read."""

    def _chunked_file(self, tmp_path, name="chunked.hdf"):
        values = (np.arange(30 * 28) % 251).astype(np.uint8).reshape(30, 28)
        writer = Writer()
        nt_ref = _nt(writer, 2, "u1")
        _sdd(writer, 2, values.shape, nt_ref)
        entries = []
        ref = 40
        for ci in range(3):
            for cj in range(4):
                block = np.zeros((10, 7), np.uint8)
                part = values[ci * 10 : ci * 10 + 10, cj * 7 : cj * 7 + 7]
                block[: part.shape[0], : part.shape[1]] = part
                raw = block.tobytes()
                desc = struct.pack(">HHiHHH", 3, 0, len(raw), ref + 100, 0, 4)
                writer.add(TAG_CHUNK | SPECIAL, ref, desc)
                writer.add(TAG_COMPRESSED, ref + 100, zlib.compress(raw))
                entries.append(((ci, cj), TAG_CHUNK, ref))
                ref += 1
        _chunk_table(writer, 50, entries, 2)
        desc = struct.pack(">HBiiii", 6, 1, 1, values.size, 21, 70)
        desc += struct.pack(">HHHH", TAG_VH, 50, 0, 0)
        desc += struct.pack(">i", 2)
        desc += struct.pack(">iii", 0, 30, 10)
        desc += struct.pack(">iii", 0, 28, 7)
        desc += struct.pack(">i", 0)
        writer.add(TAG_SD | SPECIAL, 2, desc)
        _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
        _vdata(writer, 60, "StructMetadata.0", "Attr0.0", "c", [
            _GEO_META.replace("XDim=4", "XDim=28").replace("YDim=3", "YDim=30")
        ])
        return writer.write(tmp_path, name), values

    def test_chunked_window_bit_exact(self, tmp_path):
        from dask_geomodeling_tpu.io.hdf4 import read_hdf4, read_hdf4_window

        path, values = self._chunked_file(tmp_path)
        whole = read_hdf4(path)
        for window in [(0, 30, 0, 28), (5, 17, 3, 22), (9, 11, 6, 8),
                       (0, 1, 0, 28), (29, 30, 27, 28)]:
            r0, r1, c0, c1 = window
            part = read_hdf4_window(path, *window)
            np.testing.assert_array_equal(
                part.array, whole.array[:, r0:r1, c0:c1], err_msg=str(window)
            )
            # shifted anchor: the window IS a smaller file
            x0, dx, _, y0, _, dy = whole.geo_transform
            np.testing.assert_allclose(
                part.geo_transform,
                (x0 + c0 * dx, dx, 0, y0 + r0 * dy, 0, dy),
            )

    def test_contiguous_window_bit_exact(self, tmp_path):
        from dask_geomodeling_tpu.io.hdf4 import read_hdf4, read_hdf4_window

        values = (np.arange(20 * 16) % 200).astype(np.int16).reshape(20, 16)
        writer = Writer()
        _simple_sds(writer, values)
        path = writer.write(tmp_path)
        whole = read_hdf4(path)
        part = read_hdf4_window(path, 3, 12, 5, 14)
        np.testing.assert_array_equal(
            part.array, whole.array[:, 3:12, 5:14]
        )

    def test_info_is_metadata_only(self, tmp_path):
        from dask_geomodeling_tpu.io.hdf4 import read_hdf4_info

        path, values = self._chunked_file(tmp_path)
        info = read_hdf4_info(path)
        assert (info.width, info.height, info.bands) == (28, 30, 1)
        assert info.projection == "EPSG:4326"
        assert info.dtype == "float64"

    def test_source_windowed_requests(self, tmp_path):
        """RasterFileSource decodes only touched chunks above the
        windowed-read limit, bit-exactly with the whole-file path."""
        from dask_geomodeling_tpu import config
        from dask_geomodeling_tpu.raster import RasterFileSource

        path, values = self._chunked_file(tmp_path)
        source = RasterFileSource(path)
        request = dict(
            mode="vals", bbox=(4.25, 52.5, 4.75, 53.5),
            projection="EPSG:4326", width=4, height=4,
            start=None, stop=None,
        )
        whole = source.get_data(**request)
        with config.set({"geomodeling.windowed-read-limit": 16}):
            windowed = source.get_data(**request)
        np.testing.assert_array_equal(whole["values"], windowed["values"])


def test_external_element(tmp_path):
    """SDS data living in a companion file (hfile.h EXT_EXTERN)."""
    values = np.arange(48, dtype=np.uint8).reshape(6, 8)
    raw = values.tobytes()
    companion = tmp_path / "payload.dat"
    padding = b"xx"  # data starts at a nonzero offset
    companion.write_bytes(padding + raw)

    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    name = b"payload.dat"
    desc = struct.pack(">Hiii", 2, len(raw), len(padding), len(name)) + name
    writer.add(TAG_SD | SPECIAL, 2, desc)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def test_external_element_missing_file(tmp_path):
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, (2, 2), nt_ref)
    name = b"gone.dat"
    desc = struct.pack(">Hiii", 2, 4, 0, len(name)) + name
    writer.add(TAG_SD | SPECIAL, 2, desc)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    with pytest.raises(ValueError, match="not found"):
        read_hdf4(writer.write(tmp_path))


def test_external_element_escaping_path_confined(tmp_path):
    """A hostile ../ name resolves to its basename NEXT TO the .hdf."""
    values = np.zeros((2, 2), np.uint8)
    (tmp_path / "safe.dat").write_bytes(values.tobytes())
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    name = b"../../../../etc/safe.dat"
    desc = struct.pack(">Hiii", 2, 4, 0, len(name)) + name
    writer.add(TAG_SD | SPECIAL, 2, desc)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def test_szip_compressed_element(tmp_path):
    """szip (CCSDS extended-Rice) elements decode through the system
    libsz — the stream below comes from the AUTHORITATIVE encoder
    (SZ_BufftoBuffCompress), not a re-implementation."""
    from dask_geomodeling_tpu.io import ccsds

    if not ccsds.szip_available():
        pytest.skip("libsz not loadable")
    values = ((np.arange(256) * 7) % 211).astype(np.uint8).reshape(16, 16)
    raw = values.tobytes()
    options_mask = 32 | 4 | 1  # NN | EC | ALLOW_K13
    compressed = ccsds.szip_compress(
        raw, options_mask, bits_per_pixel=8, pixels_per_block=8,
        pixels_per_scanline=16,
    )
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    desc = struct.pack(">HHiHHH", 3, 0, len(raw), 7, 0, 5)
    # coder info: pixels, pixels_per_scanline, options_mask,
    # bits_per_pixel, pixels_per_block (hcomp.h comp_info.szip)
    desc += struct.pack(">iiiii", values.size, 16, options_mask, 8, 8)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, compressed)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


def test_szip_16bit_element(tmp_path):
    from dask_geomodeling_tpu.io import ccsds

    if not ccsds.szip_available():
        pytest.skip("libsz not loadable")
    values = ((np.arange(512) * 13) % 4099).astype(">u2").reshape(16, 32)
    raw = values.tobytes()
    options_mask = 32 | 4 | 16 | 1  # NN | EC | MSB | ALLOW_K13
    compressed = ccsds.szip_compress(
        raw, options_mask, bits_per_pixel=16, pixels_per_block=16,
        pixels_per_scanline=32,
    )
    writer = Writer()
    nt_ref = _nt(writer, 2, "u2")
    _sdd(writer, 2, values.shape, nt_ref)
    desc = struct.pack(">HHiHHH", 3, 0, len(raw), 7, 0, 5)
    desc += struct.pack(">iiiii", values.size, 32, options_mask, 16, 16)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, compressed)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(
        data.array[0], values.astype(np.uint16)
    )


class TestNbitCoding:
    """HDF4 n-bit coder: packed bit fields expand to full elements."""

    def _pack_fields(self, fields, bit_len):
        bits = []
        for value in fields:
            bits += [(value >> b) & 1 for b in range(bit_len - 1, -1, -1)]
        while len(bits) % 8:
            bits.append(0)
        return np.packbits(np.array(bits, np.uint8)).tobytes()

    def _make(self, tmp_path, stream, expected_len, shape, kind, nt_code,
              sign_ext, fill_one, start_bit, bit_len):
        writer = Writer()
        nt_ref = _nt(writer, 2, kind)
        _sdd(writer, 2, shape, nt_ref)
        desc = struct.pack(">HHiHHH", 3, 0, expected_len, 7, 0, 2)
        desc += struct.pack(
            ">iiiii", nt_code, sign_ext, fill_one, start_bit, bit_len
        )
        writer.add(TAG_SD | SPECIAL, 2, desc)
        writer.add(TAG_COMPRESSED, 7, stream)
        _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
        return writer.write(tmp_path)

    def test_unsigned_fields(self, tmp_path):
        # 6-bit fields at start_bit 5 in uint8 cells: value == field
        fields = [0, 1, 17, 63, 32, 5, 63, 2]
        stream = self._pack_fields(fields, 6)
        path = self._make(
            tmp_path, stream, 8, (2, 4), "u1", 21, 0, 0, 5, 6
        )
        data = read_hdf4(path)
        np.testing.assert_array_equal(
            data.array[0], np.array(fields, np.uint8).reshape(2, 4)
        )

    def test_shifted_field_with_fill_one(self, tmp_path):
        # 4-bit fields at bits 5..2 of uint8, other bits filled with 1:
        # value = 0b110_ffff_11? layout: bits 7,6 = 1; bits 5..2 = field;
        # bits 1,0 = 1
        fields = [0b1010, 0b0001]
        stream = self._pack_fields(fields, 4)
        path = self._make(
            tmp_path, stream, 2, (1, 2), "u1", 21, 0, 1, 5, 4
        )
        data = read_hdf4(path)
        expected = np.array(
            [0b11101011, 0b11000111], np.uint8
        ).reshape(1, 2)
        np.testing.assert_array_equal(data.array[0], expected)

    def test_signed_extension_int16(self, tmp_path):
        # 5-bit two's-complement fields at start_bit 4 of int16
        fields = [0b11111, 0b00001, 0b10000, 0b01111]  # -1, 1, -16, 15
        stream = self._pack_fields(fields, 5)
        path = self._make(
            tmp_path, stream, 8, (1, 4), "i2", 22, 1, 0, 4, 5
        )
        data = read_hdf4(path)
        np.testing.assert_array_equal(
            data.array[0], np.array([[-1, 1, -16, 15]], np.int16)
        )


def test_chunked_szip_elements(tmp_path):
    """Chunked dataset whose chunks are szip special elements (the other
    MODIS layout); streams from the authoritative encoder."""
    from dask_geomodeling_tpu.io import ccsds

    if not ccsds.szip_available():
        pytest.skip("libsz not loadable")
    values = ((np.arange(64) * 11) % 199).astype(np.uint8).reshape(8, 8)
    options_mask = 32 | 4 | 1
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)

    entries = []
    ref = 40
    for ci in range(2):
        block = values[ci * 4 : ci * 4 + 4, :]
        raw = block.tobytes()
        compressed = ccsds.szip_compress(
            raw, options_mask, bits_per_pixel=8, pixels_per_block=8,
            pixels_per_scanline=8,
        )
        desc = struct.pack(">HHiHHH", 3, 0, len(raw), ref + 100, 0, 5)
        desc += struct.pack(">iiiii", block.size, 8, options_mask, 8, 8)
        writer.add(TAG_CHUNK | SPECIAL, ref, desc)
        writer.add(TAG_COMPRESSED, ref + 100, compressed)
        entries.append(((ci, 0), TAG_CHUNK, ref))
        ref += 1
    _chunk_table(writer, 50, entries, 2)

    desc = struct.pack(">HBiiii", 6, 1, 1, values.size, 21, 1)
    desc += struct.pack(">HHHH", TAG_VH, 50, 0, 0)
    desc += struct.pack(">i", 2)
    desc += struct.pack(">iii", 0, 8, 4)
    desc += struct.pack(">iii", 0, 8, 8)
    desc += struct.pack(">i", 0)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)


# ------------------------------------------------------- skip-huffman


def _hdf4_sd():
    """The system HDF4 SD API via ctypes, or None if not loadable.

    Used to produce AUTHORITATIVE skip-huffman files: the whole file
    (DD chain, chunking, compressed stream) comes from the real HDF4
    library, and the native reader must reproduce the original array.
    """
    import ctypes

    try:
        ctypes.CDLL("libdfalt.so.0", mode=ctypes.RTLD_GLOBAL)
        lib = ctypes.CDLL("libmfhdfalt.so.0", mode=ctypes.RTLD_GLOBAL)
    except OSError:
        return None
    lib.SDstart.restype = ctypes.c_int32
    lib.SDstart.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.SDcreate.restype = ctypes.c_int32
    lib.SDcreate.argtypes = [
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.SDsetcompress.restype = ctypes.c_int
    lib.SDsetcompress.argtypes = [
        ctypes.c_int32, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.SDwritedata.restype = ctypes.c_int
    lib.SDwritedata.argtypes = [
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_void_p,
    ]
    return lib


def _write_skphuff(lib, path, values, nt, skip_size):
    import ctypes

    class CompInfo(ctypes.Structure):
        # comp_info is a union; skphuff only uses the leading intn
        _fields_ = [("skp_size", ctypes.c_int), ("pad", ctypes.c_int * 13)]

    values = np.ascontiguousarray(values)
    fid = lib.SDstart(path.encode(), 4)  # DFACC_CREATE
    assert fid != -1
    dims = (ctypes.c_int32 * values.ndim)(*values.shape)
    sds = lib.SDcreate(fid, b"data", nt, values.ndim, dims)
    assert sds != -1
    info = CompInfo()
    info.skp_size = skip_size
    assert lib.SDsetcompress(sds, 3, ctypes.byref(info)) == 0
    start = (ctypes.c_int32 * values.ndim)(*([0] * values.ndim))
    edge = (ctypes.c_int32 * values.ndim)(*values.shape)
    assert lib.SDwritedata(
        sds, start, None, edge, values.ctypes.data_as(ctypes.c_void_p)
    ) == 0
    assert lib.SDendaccess(sds) == 0
    assert lib.SDend(fid) == 0


def test_skphuff_uint8(tmp_path):
    """Skip-huffman elements decode; the file comes whole from the
    AUTHORITATIVE encoder (the system HDF4 library's SD API)."""
    lib = _hdf4_sd()
    if lib is None:
        pytest.skip("system HDF4 library not loadable")
    values = ((np.arange(21 * 17) * 7) % 40).astype(np.uint8).reshape(21, 17)
    path = str(tmp_path / "skp.hdf")
    _write_skphuff(lib, path, values, 21, 1)  # DFNT_UINT8
    data = read_hdf4(path)
    np.testing.assert_array_equal(data.array[0], values)


def test_skphuff_multibyte_skip_trees(tmp_path):
    """skip_size > 1: one splay tree per byte position of the element
    (int16 -> 2 interleaved trees, float32 -> 4)."""
    lib = _hdf4_sd()
    if lib is None:
        pytest.skip("system HDF4 library not loadable")
    rng = np.random.default_rng(42)
    i16 = rng.integers(-900, 900, size=(13, 19)).astype(np.int16)
    path16 = str(tmp_path / "skp16.hdf")
    _write_skphuff(lib, path16, i16, 22, 2)  # DFNT_INT16
    data = read_hdf4(path16)
    np.testing.assert_array_equal(data.array[0], i16)

    f32 = (rng.integers(0, 50, size=(9, 11)) * 0.25).astype(np.float32)
    path32 = str(tmp_path / "skp32.hdf")
    _write_skphuff(lib, path32, f32, 5, 4)  # DFNT_FLOAT32
    data = read_hdf4(path32)
    np.testing.assert_array_equal(data.array[0], f32)

    # DFNT_LITEND: the library stores native little-endian and marks
    # the NT class DFNTI_IBO — the order must come from the class byte
    pathle = str(tmp_path / "skple.hdf")
    _write_skphuff(lib, pathle, i16, 22 | 0x4000, 2)
    data = read_hdf4(pathle)
    np.testing.assert_array_equal(data.array[0], i16)


def test_skphuff_truncated_stream_raises(tmp_path):
    """A skip-huffman element whose bit stream ends early reports a
    truncation error, not a raw exception."""
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, (8, 8), nt_ref)
    desc = struct.pack(">HHiHHH", 3, 0, 64, 7, 0, 3)  # coder 3 = skphuff
    desc += struct.pack(">i", 1)  # skp_size
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, b"\xff\x00")  # far too short for 64 bytes
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    with pytest.raises(ValueError, match="truncated"):
        read_hdf4(writer.write(tmp_path))


def test_skphuff_implausible_skip_size_raises(tmp_path):
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, (8, 8), nt_ref)
    desc = struct.pack(">HHiHHH", 3, 0, 64, 7, 0, 3)
    desc += struct.pack(">i", 1 << 20)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, b"\x00" * 64)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    with pytest.raises(ValueError, match="skip size"):
        read_hdf4(writer.write(tmp_path))


def test_chunked_file_from_authoritative_library(tmp_path):
    """A chunked (deflate) dataset written whole by the system HDF4
    library: the real chunk table, DD chain and special-element
    records, full read AND chunk-level windowed read."""
    import ctypes

    lib = _hdf4_sd()
    if lib is None:
        pytest.skip("system HDF4 library not loadable")

    class ChunkDef(ctypes.Structure):
        # HDF_CHUNK_DEF.comp: chunk_lengths[32], comp_type, comp_info
        _fields_ = [("chunk_lengths", ctypes.c_int32 * 32),
                    ("comp_type", ctypes.c_int32),
                    ("cinfo", ctypes.c_int * 14)]

    lib.SDsetchunk.argtypes = [ctypes.c_int32, ChunkDef, ctypes.c_int32]
    lib.SDsetchunk.restype = ctypes.c_int

    values = ((np.arange(40 * 50) * 5) % 61).astype(np.uint8).reshape(40, 50)
    path = str(tmp_path / "chunked.hdf")
    fid = lib.SDstart(path.encode(), 4)
    dims = (ctypes.c_int32 * 2)(*values.shape)
    sds = lib.SDcreate(fid, b"data", 21, 2, dims)
    cd = ChunkDef()
    cd.chunk_lengths[0] = 16
    cd.chunk_lengths[1] = 16
    cd.comp_type = 4  # COMP_CODE_DEFLATE (the library refuses skphuff
    cd.cinfo[0] = 6   # chunks, so no real-world file can carry those)
    assert lib.SDsetchunk(sds, cd, 3) == 0  # HDF_CHUNK | HDF_COMP
    start = (ctypes.c_int32 * 2)(0, 0)
    edge = (ctypes.c_int32 * 2)(*values.shape)
    assert lib.SDwritedata(
        sds, start, None, edge, values.ctypes.data_as(ctypes.c_void_p)
    ) == 0
    assert lib.SDendaccess(sds) == 0
    assert lib.SDend(fid) == 0

    data = read_hdf4(path)
    np.testing.assert_array_equal(data.array[0], values)
    from dask_geomodeling_tpu.io.hdf4 import read_hdf4_window

    win = read_hdf4_window(path, 5, 33, 7, 49)
    np.testing.assert_array_equal(win.array[0], values[5:33, 7:49])


def test_chunked_skphuff_chunks(tmp_path):
    """Chunks that are skip-huffman special elements resolve through
    the same recursive coder path (synthetic layout: the system
    library cannot produce this combination, but the container format
    allows it)."""
    lib = _hdf4_sd()
    if lib is None:
        pytest.skip("system HDF4 library not loadable")
    values = ((np.arange(64) * 11) % 29).astype(np.uint8).reshape(8, 8)

    # authoritative per-chunk streams: write each 4x8 block as its own
    # skphuff SDS and lift the compressed payload out of the container
    def _payload(block, name):
        p = str(tmp_path / name)
        _write_skphuff(lib, p, block, 21, 1)
        buf = open(p, "rb").read()
        from dask_geomodeling_tpu.io import hdf4 as h4

        f = h4._File(buf, p)
        for (tag, ref) in f.dds:
            if tag == (TAG_SD | SPECIAL):
                desc = f.raw(tag, ref)
                (_v, n, data_ref, _m, coder) = struct.unpack_from(
                    ">HiHHH", desc, 2
                )
                assert coder == 3
                return f.element(TAG_COMPRESSED, data_ref), n

    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    entries = []
    ref = 40
    for ci in range(2):
        block = values[ci * 4 : ci * 4 + 4, :]
        stream, n = _payload(block, "chunk%d.hdf" % ci)
        desc = struct.pack(">HHiHHH", 3, 0, n, ref + 100, 0, 3)
        desc += struct.pack(">i", 1)  # skp_size
        writer.add(TAG_CHUNK | SPECIAL, ref, desc)
        writer.add(TAG_COMPRESSED, ref + 100, stream)
        entries.append(((ci, 0), TAG_CHUNK, ref))
        ref += 1
    _chunk_table(writer, 50, entries, 2)

    desc = struct.pack(">HBiiii", 6, 1, 1, values.size, 21, 1)
    desc += struct.pack(">HHHH", TAG_VH, 50, 0, 0)
    desc += struct.pack(">i", 2)
    desc += struct.pack(">iii", 0, 8, 4)
    desc += struct.pack(">iii", 0, 8, 8)
    desc += struct.pack(">i", 0)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    data = read_hdf4(writer.write(tmp_path))
    np.testing.assert_array_equal(data.array[0], values)
