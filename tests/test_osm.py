"""OpenStreetMap XML vector sources (the reference reads .osm via
GDAL's OSM driver, reference geometry/sources.py:95)."""
import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.osm import read_osm
from dask_geomodeling_tpu.io.vectorfile import read_vector

OSM = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="52.00" lon="4.00"><tag k="amenity" v="pub"/>
    <tag k="name" v="De Kroeg"/></node>
  <node id="2" lat="52.01" lon="4.00"/>
  <node id="3" lat="52.01" lon="4.01"/>
  <node id="4" lat="52.00" lon="4.01"/>
  <node id="5" lat="52.02" lon="4.02"/>
  <node id="6" lat="52.03" lon="4.03"/>
  <node id="10" lat="52.10" lon="4.10"/>
  <node id="11" lat="52.10" lon="4.20"/>
  <node id="12" lat="52.20" lon="4.20"/>
  <node id="13" lat="52.20" lon="4.10"/>
  <node id="20" lat="52.12" lon="4.12"/>
  <node id="21" lat="52.12" lon="4.14"/>
  <node id="22" lat="52.14" lon="4.14"/>
  <node id="23" lat="52.14" lon="4.12"/>
  <way id="100"><nd ref="2"/><nd ref="5"/><nd ref="6"/>
    <tag k="highway" v="residential"/><tag k="name" v="Dorpsstraat"/></way>
  <way id="101"><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="2"/>
    <tag k="building" v="house"/></way>
  <way id="102"><nd ref="10"/><nd ref="11"/><nd ref="12"/></way>
  <way id="103"><nd ref="12"/><nd ref="13"/><nd ref="10"/></way>
  <way id="104"><nd ref="20"/><nd ref="21"/><nd ref="22"/><nd ref="23"/>
    <nd ref="20"/></way>
  <relation id="200">
    <member type="way" ref="102" role="outer"/>
    <member type="way" ref="103" role="outer"/>
    <member type="way" ref="104" role="inner"/>
    <tag k="type" v="multipolygon"/><tag k="landuse" v="forest"/>
  </relation>
  <relation id="201">
    <member type="way" ref="100" role=""/>
    <tag k="type" v="route"/>
  </relation>
</osm>
"""


@pytest.fixture()
def osm_path(tmp_path):
    path = tmp_path / "extract.osm"
    path.write_text(OSM)
    return str(path)


class TestOsm:
    def test_points(self, osm_path):
        points = read_osm(osm_path, layer="points")
        assert len(points) == 1  # only tagged nodes
        assert points["osm_id"].tolist() == ["1"]
        assert points["amenity"].tolist() == ["pub"]
        assert points.geometry.iloc[0].coords[0] == (4.00, 52.00)

    def test_lines(self, osm_path):
        lines = read_osm(osm_path, layer="lines")
        # way 100 (highway); the closed building and the bare relation
        # member ways are NOT lines
        assert lines["osm_id"].tolist() == ["100"]
        geometry = lines.geometry.iloc[0]
        assert type(geometry).__name__ == "LineString"
        assert list(geometry.coords) == [
            (4.00, 52.01), (4.02, 52.02), (4.03, 52.03)
        ]

    def test_multipolygons(self, osm_path):
        polys = read_osm(osm_path, layer="multipolygons")
        assert sorted(polys["osm_id"]) == ["101", "200"]
        by_id = {row for row in polys["osm_id"]}
        building = polys[polys["osm_id"] == "101"].geometry.iloc[0]
        assert type(building).__name__ == "Polygon"
        relation = polys[polys["osm_id"] == "200"].geometry.iloc[0]
        assert type(relation).__name__ == "Polygon"
        # the stitched outer ring spans 0.1 x 0.1 deg; the inner ring
        # 0.02 x 0.02 punches a hole
        np.testing.assert_allclose(
            relation.area, 0.1 * 0.1 - 0.02 * 0.02, atol=1e-12
        )
        assert polys[polys["osm_id"] == "200"]["landuse"].iloc[0] == "forest"

    def test_default_concatenates_with_layer_column(self, osm_path):
        everything = read_vector(osm_path)
        assert sorted(everything["layer"].unique()) == [
            "lines", "multipolygons", "points"
        ]
        assert len(everything) == 4
        assert everything.crs == "EPSG:4326"

    def test_unknown_layer_raises(self, osm_path):
        with pytest.raises(ValueError, match="Unknown OSM layer"):
            read_osm(osm_path, layer="bogus")

    def test_not_osm(self, tmp_path):
        path = tmp_path / "x.osm"
        path.write_text("<gpx></gpx>")
        with pytest.raises(ValueError, match="not an OSM"):
            read_osm(str(path))

    def test_geometry_file_source(self, osm_path, tmp_path):
        from dask_geomodeling_tpu.geometry import GeometryFileSource
        from dask_geomodeling_tpu.geo.geometry import box

        with config.set({"geomodeling.root": str(tmp_path)}):
            source = GeometryFileSource("extract.osm", id_field=None)
            result = source.get_data(
                mode="intersects",
                geometry=box(3.9, 51.9, 4.05, 52.05),
                projection="EPSG:4326",
                limit=None, min_size=None, start=None, stop=None,
                filters={},
            )
        frame = result["features"]
        # the pub, the highway and the building fall in the bbox; the
        # northern forest relation does not
        assert sorted(frame["osm_id"]) == ["1", "100", "101"]
