"""JPEG2000 raster sources (.jp2) with GeoJP2 georeferencing.

The reference opens these through GDAL's JP2 drivers (reference
raster/sources.py:66-71).  The codestream rides Pillow's OpenJPEG
binding (the image ships it); georeferencing comes from, in order:

1. the **GeoJP2** ``uuid`` box — a degenerate GeoTIFF whose tags
   (ModelPixelScale / ModelTiepoint / GeoKeyDirectory) this module
   parses with the in-repo TIFF machinery (io/geotiff.py),
2. a world file (``.j2w``/``.wld``) plus ``.prj`` sidecar,
3. pixel-index georeferencing with the EPSG:4326 default shared with
   the other sidecar-georeferenced formats.

``write_jp2`` saves a lossless codestream and splices a GeoJP2 box in
front of the ``jp2c`` box (the layout GDAL emits); nodata travels in a
GDAL-style ``.aux.xml`` PAM sidecar, which the reader honours.
"""
import os
import struct

import numpy as np

__all__ = ["read_jp2", "write_jp2"]

#: the GeoJP2 box UUID (GeoTIFF-in-JPEG2000 specification)
_GEOJP2_UUID = bytes(
    [0xB1, 0x4B, 0xF8, 0xBD, 0x08, 0x3D, 0x4B, 0x43,
     0xA5, 0xAE, 0x8C, 0xD7, 0xD5, 0xA6, 0xCE, 0x03]
)


def _boxes(raw):
    """Top-level JP2 boxes: yields (type, payload, start, end)."""
    pos = 0
    n = len(raw)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        box_type = raw[pos + 4 : pos + 8]
        header = 8
        if length == 1:  # XLBox: 64-bit length followss
            if pos + 16 > n:
                break
            (length,) = struct.unpack(">Q", raw[pos + 8 : pos + 16])
            header = 16
        elif length == 0:  # to end of file
            length = n - pos
        if length < header or pos + length > n:
            break
        yield box_type, raw[pos + header : pos + length], pos, pos + length
        pos += length


def _geotiff_tags_from_bytes(blob):
    """Parse a (degenerate) in-memory GeoTIFF's first IFD tags."""
    from io import BytesIO

    from dask_geomodeling_tpu.io.geotiff import _read_ifd

    if blob[:2] == b"II":
        byte_order = "<"
    elif blob[:2] == b"MM":
        byte_order = ">"
    else:
        return None
    (magic,) = struct.unpack(byte_order + "H", blob[2:4])
    stream = BytesIO(blob)
    if magic == 42:
        stream.seek(4)
        (offset,) = struct.unpack(byte_order + "I", stream.read(4))
    elif magic == 43:
        stream.seek(8)
        (offset,) = struct.unpack(byte_order + "Q", stream.read(8))
    else:
        return None
    stream.seek(offset)
    tags, _ = _read_ifd(stream, byte_order, magic == 43)
    return tags


def _pam_nodata(path):
    """NoDataValue from a GDAL PAM sidecar (<path>.aux.xml), if any."""
    from dask_geomodeling_tpu.io.geotiff import _pam_overrides

    return _pam_overrides(path)[1]


def read_jp2(path):
    """Read a JPEG2000 file into a RasterData payload."""
    from io import BytesIO

    from PIL import Image

    from dask_geomodeling_tpu.io.asciigrid import _sidecar_projection
    from dask_geomodeling_tpu.io.geotiff import (
        _GEO_ASCII_PARAMS,
        _GEO_KEY_DIRECTORY,
        _MODEL_PIXEL_SCALE,
        _MODEL_TIEPOINT,
        _projection_from_geokeys,
    )
    from dask_geomodeling_tpu.raster.sources import RasterData

    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b"\x00\x00\x00\x0c" and raw[:4] != b"\xff\x4f\xff\x51":
        raise IOError("Not a JPEG2000 file: '%s'" % path)

    with Image.open(BytesIO(raw)) as image:
        pixels = np.asarray(image)
    array = pixels[None] if pixels.ndim == 2 else pixels.transpose(2, 0, 1)

    geo_transform = None
    projection = None
    for box_type, payload, _, _ in _boxes(raw):
        if box_type == b"uuid" and payload[:16] == _GEOJP2_UUID:
            tags = _geotiff_tags_from_bytes(payload[16:])
            if not tags:
                continue
            scale = tags.get(_MODEL_PIXEL_SCALE)
            tie = tags.get(_MODEL_TIEPOINT)
            if scale and tie and len(tie) >= 6:
                # tiepoint maps raster (i, j) to world (x, y)
                geo_transform = (
                    tie[3] - tie[0] * scale[0], scale[0], 0.0,
                    tie[4] + tie[1] * scale[1], 0.0, -scale[1],
                )
            if _GEO_KEY_DIRECTORY in tags:
                projection = _projection_from_geokeys(
                    tags[_GEO_KEY_DIRECTORY], tags.get(_GEO_ASCII_PARAMS)
                )
            break

    if geo_transform is None:
        from dask_geomodeling_tpu.io.png import _world_file

        geo_transform = _world_file(
            path, extensions=(".j2w", ".wld", ".J2W")
        ) or (0.0, 1.0, 0.0, float(array.shape[1]), 0.0, -1.0)
    if projection is None:
        projection = _sidecar_projection(path)

    nodata = _pam_nodata(path)
    if nodata is None:
        from dask_geomodeling_tpu.geo import get_dtype_max

        nodata = float(get_dtype_max(array.dtype))
    return RasterData(
        array=np.ascontiguousarray(array),
        projection=projection,
        geo_transform=tuple(geo_transform),
        no_data_value=float(nodata),
        metadata=[""] * array.shape[0],
    )


def write_jp2(path, values, geo_transform, projection=None,
              no_data_value=None):
    """Write (bands, h, w) uint8/uint16 data as a lossless GeoJP2 file."""
    import tempfile
    from io import BytesIO

    from PIL import Image

    values = np.asarray(values)
    if values.ndim == 2:
        values = values[None]
    bands = values.shape[0]
    if bands == 1:
        image = Image.fromarray(values[0])
    elif bands in (3, 4):
        image = Image.fromarray(values.transpose(1, 2, 0))
    else:
        raise ValueError("JPEG2000 writes 1-, 3- or 4-band data")
    buf = BytesIO()
    image.save(buf, format="JPEG2000", quality_mode="lossless",
               irreversible=False)
    raw = buf.getvalue()

    # the GeoJP2 payload: a degenerate (1x1) GeoTIFF carrying the tags
    from dask_geomodeling_tpu.io.geotiff import write_geotiff

    with tempfile.TemporaryDirectory() as tmp:
        degenerate = os.path.join(tmp, "geo.tif")
        write_geotiff(
            degenerate, np.zeros((1, 1, 1), np.uint8), geo_transform,
            projection=projection, no_data_value=None, compress=None,
        )
        with open(degenerate, "rb") as f:
            geotiff = f.read()
    payload = _GEOJP2_UUID + geotiff
    box = struct.pack(">I", 8 + len(payload)) + b"uuid" + payload

    # splice in front of the codestream box (GDAL's layout)
    insert_at = len(raw)
    for box_type, _, start, _ in _boxes(raw):
        if box_type == b"jp2c":
            insert_at = start
            break
    with open(path, "wb") as f:
        f.write(raw[:insert_at] + box + raw[insert_at:])

    if no_data_value is not None:
        with open(path + ".aux.xml", "w") as f:
            f.write(
                '<PAMDataset>\n  <PAMRasterBand band="1">\n'
                "    <NoDataValue>%r</NoDataValue>\n"
                "  </PAMRasterBand>\n</PAMDataset>\n" % float(no_data_value)
            )
