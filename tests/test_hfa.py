"""ERDAS Imagine (.img / HFA) raster sources (the reference opens these
via GDAL's HFA driver, reference raster/sources.py:66-71)."""
import struct
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.hfa import (
    _HFAFile,
    _rle_decode,
    read_hfa,
    write_hfa,
)
from dask_geomodeling_tpu.raster import RasterFileSource

GT = (5000.0, 10.0, 0.0, 8000.0, 0.0, -10.0)


@pytest.fixture()
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


class TestRoundtrip:
    @pytest.mark.parametrize(
        "dtype", ["u1", "i1", "u2", "i2", "u4", "i4", "f4", "f8"]
    )
    def test_dtypes(self, tmp_path, dtype):
        rng = np.random.RandomState(0)
        info = (
            np.iinfo(dtype) if np.dtype(dtype).kind in "ui" else None
        )
        if info is not None:
            values = rng.randint(
                max(info.min, -1000), min(info.max, 1000), (2, 50, 70)
            ).astype(dtype)
        else:
            values = rng.rand(2, 50, 70).astype(dtype) * 100
        path = str(tmp_path / "a.img")
        write_hfa(path, values, geo_transform=GT, projection="EPSG:32633")
        data = read_hfa(path)
        np.testing.assert_array_equal(data.array, values)
        np.testing.assert_allclose(data.geo_transform, GT)
        assert data.projection == "EPSG:32633"

    def test_multiblock_ragged(self, tmp_path):
        """150x170 with 64-px blocks: interior, edge, and corner blocks."""
        rng = np.random.RandomState(1)
        values = rng.randint(0, 255, (1, 150, 170)).astype(np.uint8)
        path = str(tmp_path / "big.img")
        write_hfa(path, values, geo_transform=GT)
        np.testing.assert_array_equal(read_hfa(path).array, values)

    def test_nodata(self, tmp_path):
        values = np.zeros((1, 10, 10), np.int16)
        path = str(tmp_path / "nd.img")
        write_hfa(path, values, geo_transform=GT, no_data_value=-9999.0)
        assert read_hfa(path).no_data_value == -9999.0

    def test_projections(self, tmp_path):
        for projection in ("EPSG:4326", "EPSG:32718", "EPSG:26710"):
            path = str(tmp_path / "p.img")
            write_hfa(
                path, np.zeros((1, 4, 4), np.uint8),
                geo_transform=GT, projection=projection,
            )
            assert read_hfa(path).projection == projection

    def test_not_hfa(self, tmp_path):
        path = tmp_path / "x.img"
        path.write_bytes(b"not an imagine file at all")
        with pytest.raises(ValueError, match="ERDAS Imagine"):
            read_hfa(str(path))


class TestDictionary:
    def test_file_dictionary_parses_and_sizes(self, tmp_path):
        path = str(tmp_path / "a.img")
        write_hfa(path, np.zeros((1, 4, 4), np.uint8), geo_transform=GT)
        hfa = _HFAFile(path)
        dic = hfa.dictionary
        assert dic.type_size("Eprj_Coordinate") == 16
        assert dic.type_size("Edms_VirtualBlockInfo") == 14
        assert dic.type_size("Eimg_Layer") == 20
        assert dic.type_size("Eprj_MapInfo") == 40  # five 8-byte pointers

    def test_inline_x_type_definitions_parse(self):
        """GDAL-written dictionaries contain inline ``x{...}NAME`` types
        (e.g. Eimg_RRDNamesList in pyramided files); the grammar is
        x{subfields}TYPENAME,FIELDNAME, (review finding)."""
        from dask_geomodeling_tpu.io.hfa import _Dictionary

        dic = _Dictionary(
            "{1:lnumnames,0:pcalgorithm,0:x{0:pcstring,}string,nameList,}"
            "Eimg_RRDNamesList,{1:dx,1:dy,}Eprj_Coordinate,."
        )
        fields = dic.types["Eimg_RRDNamesList"]
        assert [f.name for f in fields] == [
            "numnames", "algorithm", "nameList"
        ]
        assert fields[2].item == "x" and fields[2].obj_type[0].name == "string"
        assert dic.type_size("Eprj_Coordinate") == 16

    def test_tree_structure(self, tmp_path):
        path = str(tmp_path / "a.img")
        write_hfa(
            path, np.zeros((2, 4, 4), np.uint8), geo_transform=GT,
            projection="EPSG:4326",
        )
        hfa = _HFAFile(path)
        names = [node.name for node in hfa.root.children()]
        assert names == ["Layer_1", "Layer_2"]
        layer = hfa.root.find(name="Layer_1")
        child_types = [node.type for node in layer.children()]
        assert "Edms_State" in child_types
        assert "Eprj_MapInfo" in child_types
        assert "Eprj_ProParameters" in child_types


class TestRLE:
    def _block(self, minimum, runs, n_bits, counts_bytes, values_bytes):
        head = struct.pack("<ii", minimum, runs)
        data_offset = 13 + len(counts_bytes)
        head += struct.pack("<I", data_offset) + bytes([n_bits])
        return head + counts_bytes + values_bytes

    def test_simple_runs_8bit(self):
        # 3 runs: 4x7, 2x9, 3x7 -> counts one byte each, values 8-bit
        block = self._block(
            5, 3, 8, bytes([4, 2, 3]), bytes([2, 4, 2])
        )
        out = _rle_decode(block, 0, 9)
        np.testing.assert_array_equal(out, [7, 7, 7, 7, 9, 9, 7, 7, 7])

    def test_multibyte_count_and_16bit_values(self):
        # one run of 300 (needs 2 count bytes: 0x40|1, 44), value 700-100
        counts = bytes([0x40 | 0x01, 0x2C])
        values = struct.pack(">H", 600)
        block = self._block(100, 1, 16, counts, values)
        out = _rle_decode(block, 0, 300)
        assert out.shape == (300,) and (out == 700).all()

    def test_two_bit_values_lsb_first(self):
        # runs 1,1,1,1 with 2-bit values 3,0,2,1 packed LSB-first: the
        # byte is 1<<6 | 2<<4 | 0<<2 | 3 = 0b01100011
        block = self._block(
            10, 4, 2, bytes([1, 1, 1, 1]), bytes([0b01100011])
        )
        out = _rle_decode(block, 0, 4)
        np.testing.assert_array_equal(out, [13, 10, 12, 11])

    def test_uncompressed_marker(self):
        # numruns == -1: per-pixel packed values at +13
        head = struct.pack("<ii", 50, -1) + struct.pack("<I", 0) + bytes([8])
        block = head + bytes([1, 2, 3, 4])
        out = _rle_decode(block, 0, 4)
        np.testing.assert_array_equal(out, [51, 52, 53, 54])

    def test_compressed_block_in_file(self, tmp_path):
        """Splice an RLE block into a written file: flip the block's
        compression flag and rewrite its payload as RLE."""
        values = np.full((1, 8, 8), 7, np.uint8)
        values[0, 0, :4] = 9
        path = str(tmp_path / "rle.img")
        write_hfa(path, values, geo_transform=GT)
        raw = bytearray(open(path, "rb").read())
        hfa = _HFAFile(path)
        layer = hfa.root.find(name="Layer_1")
        dms = layer.find(name="RasterDMS")
        info_ptr = dms.get("blockinfo")
        (block_offset,) = struct.unpack_from("<i", bytes(raw), info_ptr + 2)
        # RLE: runs [4x9, 60x7] -> min 7, values 2,0 at 8 bits
        payload = (
            struct.pack("<iiI", 7, 2, 15)
            + bytes([8])
            + bytes([4, 60])
            + bytes([2, 0])
        )
        raw[block_offset : block_offset + len(payload)] = payload
        struct.pack_into("<H", raw, info_ptr + 12, 1)  # compressed flag
        open(path, "wb").write(bytes(raw))
        data = read_hfa(path)
        np.testing.assert_array_equal(data.array, values)


class TestSource:
    def test_raster_file_source(self, root):
        rng = np.random.RandomState(2)
        values = rng.randint(0, 1000, (3, 40, 50)).astype(np.int32)
        write_hfa(
            str(root / "src.img"), values, geo_transform=GT,
            projection="EPSG:28992", no_data_value=-1.0,
        )
        source = RasterFileSource("src.img", time_first=datetime(2000, 1, 1),
                                  time_delta=300000)
        assert source.projection == "EPSG:28992"
        assert source.dtype == np.int32
        assert source.fillvalue == -1.0
        assert len(source) == 3
        result = source.get_data(
            mode="vals",
            bbox=(5000.0, 8000.0 - 400.0, 5500.0, 8000.0),
            projection="EPSG:28992", width=50, height=40,
            start=datetime(2000, 1, 1), stop=datetime(2000, 1, 2),
        )
        np.testing.assert_array_equal(result["values"], values)
