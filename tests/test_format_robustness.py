"""Corrupt-input robustness for the native format decoders.

A serving process opens paths supplied by clients (WMS layer configs,
view JSON); a malformed file must raise a clean, catchable error —
(ValueError, OSError) — never an uncontrolled IndexError/struct.error
or an unbounded loop.  Fuzz strategy: systematic truncations plus
seeded random byte corruptions of valid synthetic files built by the
spec-conformant test encoders.
"""
import zlib

import numpy as np
import pytest

ACCEPTABLE = (ValueError, OSError, EOFError, MemoryError, NotImplementedError)


def _grib2_bytes():
    from tests.test_grib import _simple_message

    return _simple_message(np.arange(24.0).reshape(4, 6))


def _grib1_bytes():
    from tests.test_grib import _g1_simple

    return _g1_simple(np.arange(24.0).reshape(4, 6))


def _hdf4_bytes():
    from tests.test_hdf4 import (
        TAG_COMPRESSED, TAG_SD, TAG_SDD, SPECIAL, Writer, _ndg, _nt, _sdd,
    )
    import struct

    values = np.arange(64, dtype=np.uint8).reshape(8, 8)
    raw = values.tobytes()
    writer = Writer()
    nt_ref = _nt(writer, 2, "u1")
    _sdd(writer, 2, values.shape, nt_ref)
    desc = struct.pack(">HHiHHH", 3, 0, len(raw), 7, 0, 4)
    writer.add(TAG_SD | SPECIAL, 2, desc)
    writer.add(TAG_COMPRESSED, 7, zlib.compress(raw))
    _ndg(writer, 2, [(TAG_SDD, 2), (TAG_SD, 2)])
    return writer.tobytes()


def _geotiff_bytes(tmp_path):
    from dask_geomodeling_tpu.io.geotiff import write_geotiff

    path = str(tmp_path / "ok.tif")
    write_geotiff(
        path,
        np.arange(64, dtype=np.uint8).reshape(1, 8, 8),
        geo_transform=(0, 1, 0, 0, 0, -1),
        projection="EPSG:4326",
        no_data_value=255,
    )
    return open(path, "rb").read()


def _nitf_bytes(tmp_path):
    from tests.test_nitf import _make_nitf

    values = np.arange(48, dtype=np.uint8).reshape(1, 6, 8)
    return open(_make_nitf(tmp_path, values), "rb").read()


def _readers(tmp_path):
    from dask_geomodeling_tpu.io.geotiff import read_geotiff
    from dask_geomodeling_tpu.io.grib import read_grib
    from dask_geomodeling_tpu.io.hdf4 import read_hdf4
    from dask_geomodeling_tpu.io.nitf import read_nitf

    return [
        ("grib2", _grib2_bytes(), read_grib, "x.grib2"),
        ("grib1", _grib1_bytes(), read_grib, "x.grb"),
        ("hdf4", _hdf4_bytes(), read_hdf4, "x.hdf"),
        ("geotiff", _geotiff_bytes(tmp_path), read_geotiff, "x.tif"),
        ("nitf", _nitf_bytes(tmp_path), read_nitf, "x.ntf"),
    ]


@pytest.mark.parametrize("which", ["grib2", "grib1", "hdf4", "geotiff", "nitf"])
def test_truncations_raise_cleanly(which, tmp_path):
    for name, payload, reader, filename in _readers(tmp_path):
        if name != which:
            continue
        path = str(tmp_path / filename)
        # every truncation point in small files, strided in larger ones
        step = max(len(payload) // 24, 1)
        for cut in range(4, len(payload), step):
            with open(path, "wb") as f:
                f.write(payload[:cut])
            try:
                reader(path)
            except ACCEPTABLE:
                pass  # a clean, catchable format error


@pytest.mark.parametrize("which", ["grib2", "grib1", "hdf4", "geotiff", "nitf"])
def test_byte_corruptions_raise_cleanly(which, tmp_path):
    for name, payload, reader, filename in _readers(tmp_path):
        if name != which:
            continue
        path = str(tmp_path / filename)
        rng = np.random.RandomState(zlib.crc32(name.encode()))
        for _ in range(60):
            corrupt = bytearray(payload)
            for _ in range(rng.randint(1, 4)):
                corrupt[rng.randint(4, len(corrupt))] = rng.randint(256)
            with open(path, "wb") as f:
                f.write(bytes(corrupt))
            try:
                reader(path)
            except ACCEPTABLE:
                pass  # decodable-or-clean-error is the contract
