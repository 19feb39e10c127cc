"""Minimal VRT (GDAL virtual mosaic) writer and reader.

``build_vrt`` replaces ``gdal.BuildVRT`` (reference raster/sinks.py:141):
it writes a standard VRT XML that GDAL can open elsewhere, mosaicking the
given GeoTIFF tiles onto a common grid.  ``read_vrt`` opens such a file
natively (used by RasterFileSource and the tests).
"""
import os
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["build_vrt", "read_vrt"]

_GDAL_TYPES = {
    "u1": "Byte",
    "i1": "Int8",
    "u2": "UInt16",
    "i2": "Int16",
    "u4": "UInt32",
    "i4": "Int32",
    "f4": "Float32",
    "f8": "Float64",
}
_NUMPY_TYPES = {v: k for k, v in _GDAL_TYPES.items()}


def build_vrt(target, source_paths):
    """Write a VRT XML mosaicking the given GeoTIFF files."""
    from dask_geomodeling_tpu.io.geotiff import read_geotiff_info

    if not source_paths:
        raise IOError("Cannot build a VRT from zero sources")

    infos = [read_geotiff_info(p) for p in source_paths]

    # common grid: all tiles must share resolution; origin is the envelope
    first = infos[0]
    px_w = first.geo_transform[1]
    px_h = first.geo_transform[5]
    x1 = min(i.geo_transform[0] for i in infos)
    y2 = max(i.geo_transform[3] for i in infos)
    x2 = max(i.geo_transform[0] + i.width * px_w for i in infos)
    y1 = min(i.geo_transform[3] + i.height * px_h for i in infos)
    width = int(round((x2 - x1) / px_w))
    height = int(round((y1 - y2) / px_h))

    root = ET.Element(
        "VRTDataset", rasterXSize=str(width), rasterYSize=str(height)
    )
    if first.projection:
        from dask_geomodeling_tpu.geo.crs import get_sr

        ET.SubElement(root, "SRS").text = get_sr(first.projection).ExportToWkt()
    ET.SubElement(root, "GeoTransform").text = ", ".join(
        repr(v) for v in (x1, px_w, 0.0, y2, 0.0, px_h)
    )

    dtype_key = np.dtype(first.dtype).str.lstrip("<>|=")
    band = ET.SubElement(
        root, "VRTRasterBand", dataType=_GDAL_TYPES[dtype_key], band="1"
    )
    if first.no_data_value is not None:
        ET.SubElement(band, "NoDataValue").text = repr(first.no_data_value)

    for path, info in zip(source_paths, infos):
        source = ET.SubElement(band, "ComplexSource")
        ET.SubElement(
            source, "SourceFilename", relativeToVRT="0"
        ).text = os.path.abspath(path)
        ET.SubElement(source, "SourceBand").text = "1"
        ET.SubElement(
            source,
            "SrcRect",
            xOff="0",
            yOff="0",
            xSize=str(info.width),
            ySize=str(info.height),
        )
        x_off = int(round((info.geo_transform[0] - x1) / px_w))
        y_off = int(round((info.geo_transform[3] - y2) / px_h))
        ET.SubElement(
            source,
            "DstRect",
            xOff=str(x_off),
            yOff=str(y_off),
            xSize=str(info.width),
            ySize=str(info.height),
        )
        if info.no_data_value is not None:
            ET.SubElement(source, "NODATA").text = repr(info.no_data_value)

    ET.indent(root)
    ET.ElementTree(root).write(target, encoding="unicode")


def read_vrt(path):
    """Read a VRT mosaic into a RasterData (materializes the full grid)."""
    from dask_geomodeling_tpu.geo.crs import get_epsg_or_wkt
    from dask_geomodeling_tpu.io.geotiff import read_geotiff
    from dask_geomodeling_tpu.raster.sources import RasterData

    tree = ET.parse(path)
    root = tree.getroot()
    width = int(root.get("rasterXSize"))
    height = int(root.get("rasterYSize"))
    geo_transform = tuple(
        float(v) for v in root.findtext("GeoTransform").split(",")
    )
    srs = root.findtext("SRS")
    projection = get_epsg_or_wkt(srs) if srs else None

    band = root.find("VRTRasterBand")
    dtype = np.dtype(_NUMPY_TYPES[band.get("dataType")])
    no_data_text = band.findtext("NoDataValue")
    no_data_value = float(no_data_text) if no_data_text is not None else None

    fill = no_data_value if no_data_value is not None else 0
    array = np.full((1, height, width), fill, dtype=dtype)

    for source in band:
        if source.tag not in ("ComplexSource", "SimpleSource"):
            continue
        filename = source.findtext("SourceFilename")
        dst = source.find("DstRect")
        x_off = int(dst.get("xOff"))
        y_off = int(dst.get("yOff"))
        tile = read_geotiff(filename)
        h, w = tile.array.shape[1:]
        array[0, y_off : y_off + h, x_off : x_off + w] = tile.array[0]

    return RasterData(
        array=array,
        projection=projection,
        geo_transform=geo_transform,
        no_data_value=no_data_value,
        metadata=None,
    )
