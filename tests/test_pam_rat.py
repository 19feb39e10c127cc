"""GDAL PAM raster attribute tables (io/pam.py).

Reference behavior: RAT is a GDAL dataset property
(``band.GetDefaultRAT()``) behind the "anything gdal.Open reads"
envelope (reference raster/sources.py:66-71); the sidecar layout
mirrored here is GDAL's own PAM serialization (gdal_rat.cpp).
"""
import numpy as np
import pytest

from dask_geomodeling_tpu.io.geotiff import write_geotiff
from dask_geomodeling_tpu.io.pam import (
    rat_as_reclassify_data,
    read_raster_attribute_table,
    write_raster_attribute_table,
)
from dask_geomodeling_tpu.raster.misc import Reclassify
from dask_geomodeling_tpu.raster.sources import RasterFileSource

GDAL_SIDECAR = """<PAMDataset>
  <PAMRasterBand band="1">
    <GDALRasterAttributeTable tableType="thematic" Row0Min="0" BinSize="1">
      <FieldDefn index="0">
        <Name>VALUE</Name>
        <Type>0</Type>
        <Usage>5</Usage>
      </FieldDefn>
      <FieldDefn index="1">
        <Name>CLASS</Name>
        <Type>2</Type>
        <Usage>2</Usage>
      </FieldDefn>
      <FieldDefn index="2">
        <Name>SUITABILITY</Name>
        <Type>1</Type>
        <Usage>0</Usage>
      </FieldDefn>
      <Row index="0">
        <F>1</F>
        <F>water</F>
        <F>0.25</F>
      </Row>
      <Row index="1">
        <F>2</F>
        <F>forest</F>
        <F>0.75</F>
      </Row>
      <Row index="2">
        <F>5</F>
        <F>urban</F>
        <F>0.1</F>
      </Row>
    </GDALRasterAttributeTable>
  </PAMRasterBand>
</PAMDataset>
"""

RAT = {
    "fields": [
        {"name": "VALUE", "type": "int", "usage": "minmax"},
        {"name": "CLASS", "type": "string", "usage": "name"},
        {"name": "SUITABILITY", "type": "float", "usage": "generic"},
    ],
    "rows": [[1, "water", 0.25], [2, "forest", 0.75], [5, "urban", 0.1]],
}


def _tif(tmp_path, values=None):
    path = str(tmp_path / "thematic.tif")
    if values is None:
        values = np.array([[[1, 2], [5, 1]]], np.uint8)
    write_geotiff(path, values, (0.0, 1.0, 0.0, 2.0, 0.0, -1.0),
                  "EPSG:28992", 255)
    return path


def test_read_gdal_sidecar(tmp_path):
    path = _tif(tmp_path)
    (tmp_path / "thematic.tif.aux.xml").write_text(GDAL_SIDECAR)
    rat = read_raster_attribute_table(path)
    assert rat == RAT
    # typed: ints are ints, floats floats
    assert isinstance(rat["rows"][0][0], int)
    assert isinstance(rat["rows"][0][2], float)


def test_absent_or_corrupt_sidecar_is_none(tmp_path):
    path = _tif(tmp_path)
    assert read_raster_attribute_table(path) is None
    (tmp_path / "thematic.tif.aux.xml").write_text("<PAMDataset")
    assert read_raster_attribute_table(path) is None
    (tmp_path / "thematic.tif.aux.xml").write_text("<PAMDataset/>")
    assert read_raster_attribute_table(path) is None


def test_other_band_is_none(tmp_path):
    path = _tif(tmp_path)
    (tmp_path / "thematic.tif.aux.xml").write_text(GDAL_SIDECAR)
    assert read_raster_attribute_table(path, band=2) is None


def test_ragged_rows_skipped(tmp_path):
    path = _tif(tmp_path)
    broken = GDAL_SIDECAR.replace("        <F>0.75</F>\n", "", 1)
    (tmp_path / "thematic.tif.aux.xml").write_text(broken)
    rat = read_raster_attribute_table(path)
    assert [r[0] for r in rat["rows"]] == [1, 5]


def test_write_roundtrip(tmp_path):
    path = _tif(tmp_path)
    write_raster_attribute_table(path, RAT)
    assert read_raster_attribute_table(path) == RAT


def test_write_merges_existing_pam(tmp_path):
    """Writing a RAT preserves other PAM content (SRS/nodata) and the
    PAM overrides keep working on the merged sidecar."""
    from dask_geomodeling_tpu.io.geotiff import read_geotiff_info

    path = _tif(tmp_path)
    (tmp_path / "thematic.tif.aux.xml").write_text(
        "<PAMDataset><SRS>EPSG:4326</SRS><PAMRasterBand band=\"1\">"
        "<NoDataValue>7</NoDataValue></PAMRasterBand></PAMDataset>"
    )
    write_raster_attribute_table(path, RAT)
    assert read_raster_attribute_table(path) == RAT
    info = read_geotiff_info(path)
    assert info.no_data_value == 7
    # replace, not append
    write_raster_attribute_table(path, RAT)
    text = (tmp_path / "thematic.tif.aux.xml").read_text()
    assert text.count("GDALRasterAttributeTable") == 2  # one open, one close


def test_write_validates_rows():
    with pytest.raises(ValueError, match="declared fields"):
        write_raster_attribute_table(
            "/nonexistent", {"fields": RAT["fields"], "rows": [[1]]}
        )


def test_rat_as_reclassify_data_and_view(tmp_path):
    """RAT semantics end-to-end: the table drives a Reclassify view on
    the thematic raster it annotates."""
    path = _tif(tmp_path)
    write_raster_attribute_table(path, RAT)
    rat = read_raster_attribute_table(path)
    data = rat_as_reclassify_data(rat, target="SUITABILITY")
    assert data == [[1, 0.25], [2, 0.75], [5, 0.1]]

    source = RasterFileSource(path)
    view = Reclassify(source, data, select=True)
    result = view.get_data(
        mode="vals", bbox=(0, 0, 2, 2), projection="EPSG:28992",
        width=2, height=2,
    )
    np.testing.assert_allclose(
        result["values"][0], [[0.25, 0.75], [0.1, 0.25]]
    )


def test_rat_as_reclassify_data_validation():
    with pytest.raises(TypeError, match="numeric"):
        rat_as_reclassify_data(RAT, target="CLASS")
    with pytest.raises(KeyError, match="no field"):
        rat_as_reclassify_data(RAT, target="MISSING")
    # usage lookup and explicit value field
    assert rat_as_reclassify_data(RAT, target="generic", value="VALUE")
    no_value = {
        "fields": [{"name": "X", "type": "float", "usage": "generic"}],
        "rows": [[1.0]],
    }
    with pytest.raises(KeyError, match="minmax"):
        rat_as_reclassify_data(no_value, target="X")
    bad_value = {
        "fields": [
            {"name": "VALUE", "type": "float", "usage": "minmax"},
            {"name": "Y", "type": "float", "usage": "generic"},
        ],
        "rows": [[1.0, 2.0]],
    }
    with pytest.raises(TypeError, match="integer column"):
        rat_as_reclassify_data(bad_value, target="Y")
