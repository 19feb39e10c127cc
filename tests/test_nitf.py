"""NITF 2.1 raster source tests.

The fixtures come from an independent spec-conformant encoder below
(MIL-STD-2500C fixed-width field layouts written out by hand), so the
reader in ``io/nitf.py`` is tested against the specification, not
against itself.  Reference behavior: GDAL's NITF driver behind
``gdal.Open`` (reference raster/sources.py:66-71).
"""
import numpy as np
import pytest

from dask_geomodeling_tpu.io.nitf import read_nitf, read_nitf_info


# ---------------------------------------------------------------- encoder


def _field(value, n):
    text = str(value)
    if len(text) > n:
        raise AssertionError("field overflow: %r > %d" % (value, n))
    return text.ljust(n).encode("latin-1")


def _num(value, n):
    return str(int(value)).rjust(n, "0").encode("latin-1")


def _security_21():
    return b" " * 167


def _file_header(image_segments):
    """NITF 2.1 file header for the given (subheader, data) pairs."""
    body = bytearray()
    body += b"NITF02.10"
    body += _num(3, 2)  # CLEVEL
    body += _field("BF01", 4)
    body += _field("TESTSTA", 10)  # OSTAID
    body += _field("20240315060000", 14)  # FDT
    body += _field("test file", 80)  # FTITLE
    body += b"U"  # FSCLAS
    body += _security_21()
    body += _num(0, 5) + _num(1, 5)  # FSCOP, FSCPYS
    body += b"0"  # ENCRYP
    body += bytes(3)  # FBKGC
    body += _field("", 24) + _field("", 18)  # ONAME, OPHONE
    # FL + HL patched below
    body += b"?" * 12 + b"?" * 6
    body += _num(len(image_segments), 3)  # NUMI
    for subheader, data in image_segments:
        body += _num(len(subheader), 6) + _num(len(data), 10)
    for count in (3, 3, 3, 3, 3):  # NUMS, NUMX, NUMT, NUMDES, NUMRES
        body += _num(0, count)
    body += _num(0, 5) + _num(0, 5)  # UDHDL, XHDL
    header = bytes(body)
    total = len(header) + sum(
        len(sub) + len(data) for sub, data in image_segments
    )
    header = bytearray(header)
    fl_at = header.index(b"?" * 12)
    header[fl_at : fl_at + 12] = _num(total, 12)
    header[fl_at + 12 : fl_at + 18] = _num(len(header), 6)
    return bytes(header)


def _image_subheader(values, imode="B", nbpr=1, nbpc=1, nppbh=None,
                     nppbv=None, icords="D", igeolo=None, pvtype="INT",
                     nbpp=8, abpp=None, ic=b"NC"):
    bands, nrows, ncols = values.shape
    body = bytearray()
    body += b"IM"
    body += _field("IID1", 10)
    body += _field("20240315060000", 14)
    body += _field("", 17)  # TGTID
    body += _field("test image", 80)  # IID2
    body += b"U"
    body += _security_21()
    body += b"0"  # ENCRYP
    body += _field("synthetic", 42)  # ISORCE
    body += _num(nrows, 8) + _num(ncols, 8)
    body += _field(pvtype, 3)
    body += _field("MULTI" if bands > 1 else "MONO", 8)  # IREP
    body += _field("VIS", 8)  # ICAT
    body += _num(abpp or nbpp, 2)
    body += b"R"  # PJUST
    body += _field(icords, 1)
    if icords.strip():
        body += _field(igeolo, 60)
    body += _num(0, 1)  # NICOM
    body += ic
    if ic not in (b"NC", b"NM"):
        body += _field("", 4)  # COMRAT (absent for NC and NM)
    body += _num(bands, 1)
    for _ in range(bands):
        body += _field("M", 2) + _field("", 6) + b"N" + _field("", 3)
        body += _num(0, 1)  # NLUTS
    body += b"0"  # ISYNC
    body += _field(imode, 1)
    body += _num(nbpr, 4) + _num(nbpc, 4)
    body += _num(nppbh or ncols, 4) + _num(nppbv or nrows, 4)
    body += _num(nbpp, 2)
    body += _num(1, 3) + _num(0, 3)  # IDLVL, IALVL
    body += _field("0000000000", 10)  # ILOC
    body += _field("1.0 ", 4)  # IMAG
    body += _num(0, 5) + _num(0, 5)  # UDIDL, IXSHDL
    return bytes(body)


def _blocked_payload(values, imode, nbpr, nbpc, nppbh, nppbv, dtype):
    bands, nrows, ncols = values.shape
    padded = np.zeros((bands, nbpc * nppbv, nbpr * nppbh), dtype)
    padded[:, :nrows, :ncols] = values
    blocks = padded.reshape(bands, nbpc, nppbv, nbpr, nppbh)
    blocks = blocks.transpose(0, 1, 3, 2, 4)  # (bands, nbpc, nbpr, bh, bw)
    big = np.dtype(dtype).newbyteorder(">")
    if imode == "S":
        return blocks.astype(big).tobytes()
    if imode == "B":
        return np.moveaxis(blocks, 0, 2).astype(big).tobytes()
    if imode == "P":
        return np.moveaxis(blocks, 0, -1).astype(big).tobytes()
    raise AssertionError(imode)


def _make_nitf(tmp_path, values, name="test.ntf", dtype=np.uint8,
               imode="B", nbpr=1, nbpc=1, nppbh=None, nppbv=None,
               icords="D", igeolo=None, pvtype="INT", nbpp=8, abpp=None):
    values = np.asarray(values, dtype)
    nppbh = nppbh or values.shape[2]
    nppbv = nppbv or values.shape[1]
    if igeolo is None and icords == "D":
        # UL (52, 4), one degree per pixel-step grid
        nrows, ncols = values.shape[1:]
        corners = [
            (52.0, 4.0),
            (52.0, 4.0 + (ncols - 1) * 0.01),
            (52.0 - (nrows - 1) * 0.01, 4.0 + (ncols - 1) * 0.01),
            (52.0 - (nrows - 1) * 0.01, 4.0),
        ]
        igeolo = "".join(
            "%+07.3f%+08.3f" % (lat, lon) for lat, lon in corners
        )
    subheader = _image_subheader(
        values, imode=imode, nbpr=nbpr, nbpc=nbpc, nppbh=nppbh,
        nppbv=nppbv, icords=icords, igeolo=igeolo, pvtype=pvtype,
        nbpp=nbpp, abpp=abpp,
    )
    payload = _blocked_payload(
        values, imode, nbpr, nbpc, nppbh, nppbv, dtype
    )
    blob = _file_header([(subheader, payload)]) + subheader + payload
    path = str(tmp_path / name)
    with open(path, "wb") as fh:
        fh.write(blob)
    return path


# ------------------------------------------------------------------ tests


def test_single_band_roundtrip(tmp_path):
    values = np.arange(48, dtype=np.uint8).reshape(1, 6, 8)
    data = read_nitf(_make_nitf(tmp_path, values))
    np.testing.assert_array_equal(data.array, values)
    assert data.projection == "EPSG:4326"
    gt = data.geo_transform
    assert gt[1] == pytest.approx(0.01)
    assert gt[5] == pytest.approx(-0.01)
    assert gt[0] == pytest.approx(4.0 - 0.005)


@pytest.mark.parametrize("imode", ["B", "S", "P"])
def test_multiband_imodes(tmp_path, imode):
    rng = np.random.RandomState(3)
    values = rng.randint(0, 255, (3, 5, 7)).astype(np.uint8)
    data = read_nitf(_make_nitf(tmp_path, values, imode=imode))
    np.testing.assert_array_equal(data.array, values)


def test_blocked_layout_with_padding(tmp_path):
    rng = np.random.RandomState(5)
    values = rng.randint(0, 255, (2, 10, 13)).astype(np.uint8)
    data = read_nitf(
        _make_nitf(
            tmp_path, values, imode="B", nbpr=4, nbpc=3, nppbh=4, nppbv=4
        )
    )
    np.testing.assert_array_equal(data.array, values)


def test_int16_and_float32(tmp_path):
    values = (np.arange(24).reshape(1, 4, 6) * 100 - 500).astype(np.int16)
    data = read_nitf(
        _make_nitf(tmp_path, values, dtype=np.int16, pvtype="SI", nbpp=16)
    )
    np.testing.assert_array_equal(data.array, values)

    values = (np.arange(24, dtype=np.float32) / 3).reshape(1, 4, 6)
    data = read_nitf(
        _make_nitf(
            tmp_path, values, name="f.ntf", dtype=np.float32,
            pvtype="R", nbpp=32,
        )
    )
    np.testing.assert_array_equal(data.array, values)


def test_dms_corners(tmp_path):
    values = np.zeros((1, 3, 3), np.uint8)
    igeolo = (
        "520000N0040000E"
        "520000N0040200E"
        "515800N0040200E"
        "515800N0040000E"
    )
    data = read_nitf(
        _make_nitf(tmp_path, values, icords="G", igeolo=igeolo)
    )
    gt = data.geo_transform
    # two arc-minutes across two pixel steps = one arc-minute per pixel
    assert gt[1] == pytest.approx(1 / 60.0)
    assert gt[5] == pytest.approx(-1 / 60.0)


def test_abpp_masking(tmp_path):
    # 6 significant bits in an 8-bit container
    values = (np.arange(16, dtype=np.uint8) % 64).reshape(1, 4, 4)
    path = _make_nitf(tmp_path, values | 0xC0, abpp=6)  # junk high bits
    data = read_nitf(path)
    np.testing.assert_array_equal(data.array, values)


def test_info_header_only(tmp_path):
    values = np.zeros((2, 6, 9), np.uint8)
    info = read_nitf_info(_make_nitf(tmp_path, values))
    assert (info.width, info.height, info.bands) == (9, 6, 2)
    assert info.dtype == "uint8"
    assert info.projection == "EPSG:4326"


def test_raster_file_source_serves_nitf(tmp_path):
    from datetime import datetime

    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import RasterFileSource

    values = np.arange(64, dtype=np.uint8).reshape(1, 8, 8)
    path = _make_nitf(tmp_path, values)
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource(path, time_first=datetime(2000, 1, 1))
        assert source.dtype == np.uint8
        extent = source.geo_transform
        data = source.get_data(
            mode="vals",
            bbox=source._get_extent().bbox,
            projection="EPSG:4326",
            width=8,
            height=8,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(data["values"], values)


def test_corrupt_rejected(tmp_path):
    path = str(tmp_path / "bad.ntf")
    with open(path, "wb") as fh:
        fh.write(b"NITF02.10" + b"\x00" * 20)
    with pytest.raises(ValueError):
        read_nitf(path)
    with open(path, "wb") as fh:
        fh.write(b"NOTNITF!!" + b"\x00" * 400)
    with pytest.raises(ValueError, match="Not a NITF"):
        read_nitf(path)


def test_masked_nm_blocks(tmp_path):
    """IC=NM: a block mask subheader with one absent block filling from
    the pad pixel code."""
    values = np.zeros((1, 8, 8), np.uint8)
    values[0, :4, :4] = 11  # block (0,0)
    values[0, :4, 4:] = 22  # block (0,1)
    values[0, 4:, :4] = 33  # block (1,0); block (1,1) will be ABSENT

    # blocked payload WITHOUT the absent block, offsets table marking it
    blocks = [
        values[0, :4, :4], values[0, :4, 4:], values[0, 4:, :4],
    ]
    data = b"".join(b.tobytes() for b in blocks)
    per_record = 16
    mask = bytearray()
    offsets = [0, per_record, 2 * per_record, 0xFFFFFFFF]
    imdatoff = 10 + 1 + 4 * len(offsets)
    mask += imdatoff.to_bytes(4, "big")
    mask += (4).to_bytes(2, "big")  # BMRLNTH
    mask += (0).to_bytes(2, "big")  # TMRLNTH
    mask += (8).to_bytes(2, "big")  # TPXCDLNTH bits
    mask += bytes([99])  # pad pixel code
    for off in offsets:
        mask += off.to_bytes(4, "big")
    payload = bytes(mask) + data

    subheader = _image_subheader(
        values, imode="B", nbpr=2, nbpc=2, nppbh=4, nppbv=4,
        icords="D",
        igeolo="".join(
            "%+07.3f%+08.3f" % (lat, lon)
            for lat, lon in [(52, 4), (52, 4.07), (51.93, 4.07), (51.93, 4)]
        ),
        ic=b"NM",
    )
    blob = _file_header([(subheader, payload)]) + subheader + payload
    path = str(tmp_path / "masked.ntf")
    with open(path, "wb") as fh:
        fh.write(blob)
    data_out = read_nitf(path)
    expected = values.copy()
    expected[0, 4:, 4:] = 99  # the absent block fills with the pad code
    np.testing.assert_array_equal(data_out.array, expected)


def test_masked_jpeg_blocks(tmp_path):
    """IC=M3: present blocks are standalone JPEG codestreams; absent
    blocks fill with the pad pixel code (lossless check via constant
    blocks — baseline JPEG preserves flat fields)."""
    import io as _io

    from PIL import Image

    def jpeg_block(value):
        img = Image.fromarray(np.full((4, 4), value, np.uint8), "L")
        buf = _io.BytesIO()
        img.save(buf, "JPEG", quality=100)
        return buf.getvalue()

    values = np.zeros((1, 8, 8), np.uint8)
    values[0, :4, :4] = 50
    values[0, :4, 4:] = 100
    values[0, 4:, :4] = 150
    streams = [jpeg_block(50), jpeg_block(100), jpeg_block(150)]
    offsets, data = [], b""
    for stream in streams:
        offsets.append(len(data))
        data += stream
    offsets.append(0xFFFFFFFF)  # block (1,1) absent

    mask = bytearray()
    imdatoff = 10 + 1 + 4 * len(offsets)
    mask += imdatoff.to_bytes(4, "big")
    mask += (4).to_bytes(2, "big")
    mask += (0).to_bytes(2, "big")
    mask += (8).to_bytes(2, "big")
    mask += bytes([200])  # pad pixel code
    for off in offsets:
        mask += off.to_bytes(4, "big")
    payload = bytes(mask) + data

    subheader = _image_subheader(
        values, imode="B", nbpr=2, nbpc=2, nppbh=4, nppbv=4,
        icords="D",
        igeolo="".join(
            "%+07.3f%+08.3f" % (lat, lon)
            for lat, lon in [(52, 4), (52, 4.07), (51.93, 4.07), (51.93, 4)]
        ),
        ic=b"M3",
    )
    blob = _file_header([(subheader, payload)]) + subheader + payload
    path = str(tmp_path / "m3.ntf")
    with open(path, "wb") as fh:
        fh.write(blob)
    out = read_nitf(path)
    expected = values.copy()
    expected[0, 4:, 4:] = 200
    np.testing.assert_array_equal(out.array, expected)
