"""Cross-format consistency matrix: ONE grid through every raster
writer, read back through ``RasterFileSource``, with identical pixel
values and georeferencing.  A single invariant pinning the whole io/
family against cross-format drift (half-pixel shifts, row flips, codec
round-trip loss) — the class of bug each format's own tests can miss
when writer and reader share an assumption.
"""
import os

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.raster import RasterFileSource

# uint8 values exercise every codec losslessly; the grid is asymmetric
# so row/column flips cannot cancel out
VALUES = ((np.arange(96 * 128) * 31) % 251).astype("u1").reshape(1, 96, 128)
GT = (84000.0, 2.0, 0.0, 444000.0, 0.0, -2.0)
PROJECTION = "EPSG:28992"


def _write_geotiff(path):
    from dask_geomodeling_tpu.io.geotiff import write_geotiff

    write_geotiff(path, VALUES, GT, PROJECTION, 255.0)


def _write_cog(path):
    from dask_geomodeling_tpu.io.geotiff import write_geotiff

    write_geotiff(path, VALUES, GT, PROJECTION, 255.0, cog=True,
                  tile_size=64)


def _write_geotiff_zstd_tiled(path):
    from dask_geomodeling_tpu.io.geotiff import write_geotiff

    write_geotiff(path, VALUES, GT, PROJECTION, 255.0, compress="zstd",
                  tiled=True, tile_size=64)


def _write_png(path):
    from dask_geomodeling_tpu.io.png import write_png

    write_png(path, VALUES, geo_transform=GT, projection=PROJECTION)


def _write_netcdf(path):
    from dask_geomodeling_tpu.io.netcdf import write_netcdf

    write_netcdf(path, VALUES, GT, projection=PROJECTION,
                 no_data_value=255.0)


def _write_zarr(path):
    from dask_geomodeling_tpu.io.zarr import write_zarr

    write_zarr(path, VALUES, GT, projection=PROJECTION, no_data_value=255.0)


def _write_envi(path):
    from dask_geomodeling_tpu.io.envi import write_envi

    write_envi(path, VALUES, geo_transform=GT, projection=PROJECTION,
               no_data_value=255.0)


def _write_hfa(path):
    from dask_geomodeling_tpu.io.hfa import write_hfa

    write_hfa(path, VALUES, geo_transform=GT, projection=PROJECTION,
              no_data_value=255.0)


def _write_gpkg(path):
    from dask_geomodeling_tpu.io.gpkg_raster import write_gpkg_raster

    write_gpkg_raster(path, VALUES, GT, projection=PROJECTION)


def _write_jp2(path):
    from dask_geomodeling_tpu.io.jp2 import write_jp2

    write_jp2(path, VALUES, GT, projection=PROJECTION, no_data_value=255.0)


def _prj_sidecar(path):
    from dask_geomodeling_tpu.geo.crs import get_sr

    with open(os.path.splitext(path)[0] + ".prj", "w") as f:
        f.write(get_sr(PROJECTION).ExportToWkt())


def _write_surfer(path):
    from dask_geomodeling_tpu.io.simplegrids import write_surfer

    write_surfer(path, VALUES.astype("f8"), GT)
    _prj_sidecar(path)


def _write_saga(path):
    from dask_geomodeling_tpu.io.simplegrids import write_saga

    write_saga(path, VALUES, GT)
    _prj_sidecar(path)


def _write_vrt(path):
    from dask_geomodeling_tpu.io.geotiff import write_geotiff
    from dask_geomodeling_tpu.io.vrt import build_vrt

    tile = os.path.join(os.path.dirname(path), "member.tif")
    write_geotiff(tile, VALUES, GT, PROJECTION, 255.0)
    build_vrt(path, [tile])


CASES = [
    ("grid.tif", _write_geotiff, True),
    ("grid_cog.tif", _write_cog, True),
    ("grid_zstd.tif", _write_geotiff_zstd_tiled, True),
    ("grid.vrt", _write_vrt, True),
    ("grid.png", _write_png, True),
    ("grid.nc", _write_netcdf, True),
    ("grid.zarr", _write_zarr, True),
    ("grid.hdr", _write_envi, True),
    ("grid.img", _write_hfa, True),
    ("grid.gpkg", _write_gpkg, True),
    ("grid.jp2", _write_jp2, True),
    ("grid.grd", _write_surfer, False),  # Surfer stores float64
    ("grid.sgrd", _write_saga, True),
]


@pytest.mark.parametrize("name,writer,exact_dtype", CASES)
def test_format_matrix(tmp_path, name, writer, exact_dtype):
    if name.endswith(".jp2"):
        PIL = pytest.importorskip("PIL.Image")
        from PIL import features

        if not features.check("jpg_2000"):
            pytest.skip("OpenJPEG not available")
    writer(os.path.join(str(tmp_path), name))
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource(name)
        # the native grid reproduces exactly through the request protocol
        np.testing.assert_allclose(tuple(source.geo_transform), GT)
        data = source.get_data(
            mode="vals",
            bbox=(GT[0], GT[3] - 96 * 2.0, GT[0] + 128 * 2.0, GT[3]),
            projection=PROJECTION, width=128, height=96,
        )
    np.testing.assert_array_equal(
        np.asarray(data["values"], dtype=VALUES.dtype), VALUES
    )
    if exact_dtype and not name.endswith((".nc", ".grd")):
        assert np.asarray(data["values"]).shape == VALUES.shape


@pytest.mark.parametrize("name,writer,exact_dtype", CASES)
def test_format_matrix_cross_crs_consistency(tmp_path, name, writer,
                                             exact_dtype):
    """Every format warps identically through a cross-CRS request (a
    half-pixel registration bug in any reader/writer shows up here)."""
    if name.endswith(".jp2"):
        pytest.importorskip("PIL.Image")
        from PIL import features

        if not features.check("jpg_2000"):
            pytest.skip("OpenJPEG not available")
    writer(os.path.join(str(tmp_path), name))
    from dask_geomodeling_tpu.geo.crs import transform_extent

    # a window centred on the data, slightly inset, in WGS84
    x1, y1 = GT[0] + 30.0, GT[3] - 96 * 2.0 + 30.0
    x2, y2 = GT[0] + 128 * 2.0 - 30.0, GT[3] - 30.0
    bbox = transform_extent((x1, y1, x2, y2), PROJECTION, "EPSG:4326")
    request = dict(
        mode="vals", bbox=bbox,
        projection="EPSG:4326", width=64, height=48,
    )
    with config.set({"geomodeling.root": str(tmp_path)}):
        result = RasterFileSource(name).get_data(**request)
    key = "reference.tif"
    if name != "grid.tif":
        _write_geotiff(os.path.join(str(tmp_path), key))
        with config.set({"geomodeling.root": str(tmp_path)}):
            reference = RasterFileSource(key).get_data(**request)
        np.testing.assert_array_equal(
            np.asarray(result["values"], dtype=VALUES.dtype),
            np.asarray(reference["values"], dtype=VALUES.dtype),
        )
