"""JPEG2000 (.jp2) raster source tests (GDAL JP2 driver role,
reference raster/sources.py:66-71): lossless codestream via OpenJPEG,
GeoJP2 (degenerate-GeoTIFF uuid box) georeferencing."""
import os
import struct

import numpy as np
import pytest

pytest.importorskip("PIL.Image")
from PIL import features

if not features.check("jpg_2000"):  # pragma: no cover
    pytest.skip("OpenJPEG not available", allow_module_level=True)

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.jp2 import read_jp2, write_jp2

GT = (100000.0, 2.5, 0.0, 450000.0, 0.0, -2.5)


def test_geojp2_roundtrip(tmp_path):
    values = ((np.arange(60 * 80) * 7) % 251).astype("u1").reshape(1, 60, 80)
    path = str(tmp_path / "a.jp2")
    write_jp2(path, values, GT, projection="EPSG:28992",
              no_data_value=255.0)
    data = read_jp2(path)
    np.testing.assert_array_equal(data.array, values)
    np.testing.assert_allclose(data.geo_transform, GT)
    assert data.projection == "EPSG:28992"
    assert data.no_data_value == 255.0  # via the PAM sidecar


def test_rgb(tmp_path):
    rgb = ((np.arange(3 * 40 * 50) * 11) % 251).astype("u1").reshape(
        3, 40, 50
    )
    path = str(tmp_path / "rgb.jp2")
    write_jp2(path, rgb, GT, projection="EPSG:28992")
    data = read_jp2(path)
    np.testing.assert_array_equal(data.array, rgb)
    assert data.projection == "EPSG:28992"


def test_uint16(tmp_path):
    import warnings
    from io import BytesIO

    from PIL import Image

    values = ((np.arange(30 * 40) * 97) % 60001).astype("u2").reshape(30, 40)
    buf = BytesIO()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # PIL mode-parameter deprecation
        Image.fromarray(values, mode="I;16").save(
            buf, format="JPEG2000", quality_mode="lossless",
            irreversible=False,
        )
    path = str(tmp_path / "u16.jp2")
    open(path, "wb").write(buf.getvalue())
    data = read_jp2(path)
    np.testing.assert_array_equal(data.array[0], values)


def test_world_file_fallback(tmp_path):
    """A jp2 without a GeoJP2 box: .j2w + .prj sidecars georeference."""
    from io import BytesIO

    from PIL import Image

    values = np.full((20, 20), 9, dtype="u1")
    buf = BytesIO()
    Image.fromarray(values).save(buf, format="JPEG2000",
                                 quality_mode="lossless", irreversible=False)
    path = str(tmp_path / "w.jp2")
    open(path, "wb").write(buf.getvalue())
    # GDAL-convention world file: pixel sizes + center-of-first-pixel
    open(str(tmp_path / "w.j2w"), "w").write(
        "2.5\n0\n0\n-2.5\n%r\n%r\n" % (GT[0] + 1.25, GT[3] - 1.25)
    )
    from dask_geomodeling_tpu.geo.crs import get_sr

    open(str(tmp_path / "w.prj"), "w").write(
        get_sr("EPSG:28992").ExportToWkt()
    )
    data = read_jp2(path)
    np.testing.assert_allclose(data.geo_transform, GT)
    assert data.projection == "EPSG:28992"


def test_raster_file_source_integration(tmp_path):
    from dask_geomodeling_tpu.raster import RasterFileSource

    values = ((np.arange(50 * 50) * 3) % 251).astype("u1").reshape(1, 50, 50)
    gt = (0.0, 1.0, 0.0, 50.0, 0.0, -1.0)
    write_jp2(str(tmp_path / "s.jp2"), values, gt, projection="EPSG:28992")
    with config.set({"geomodeling.root": str(tmp_path)}):
        source = RasterFileSource("s.jp2")
        assert source.projection == "EPSG:28992"
        out = source.get_data(
            mode="vals", bbox=(0, 0, 50, 50), projection="EPSG:28992",
            width=50, height=50,
        )
    np.testing.assert_array_equal(out["values"], values)


def test_not_a_jp2(tmp_path):
    path = str(tmp_path / "x.jp2")
    open(path, "wb").write(b"definitely not jpeg2000 content")
    with pytest.raises(IOError, match="JPEG2000"):
        read_jp2(path)
