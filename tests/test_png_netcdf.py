"""PNG and netCDF-classic raster sources (native readers for formats the
reference opens via GDAL's PNG/netCDF drivers,
reference raster/sources.py:66-71)."""
import struct
import zlib
from datetime import datetime

import numpy as np
import pytest

from dask_geomodeling_tpu import config
from dask_geomodeling_tpu.io.netcdf import read_netcdf, write_netcdf
from dask_geomodeling_tpu.io.png import read_png, write_png
from dask_geomodeling_tpu.raster import RasterFileSource


@pytest.fixture()
def root(tmp_path):
    with config.set({"geomodeling.root": str(tmp_path)}):
        yield tmp_path


class TestPng:
    def test_gray8_roundtrip_with_world_file(self, root):
        values = np.arange(12, dtype=np.uint8).reshape(1, 3, 4)
        gt = (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)
        path = str(root / "gray.png")
        write_png(path, values, geo_transform=gt, projection="EPSG:28992")
        data = read_png(path)
        np.testing.assert_array_equal(data.array, values)
        np.testing.assert_allclose(data.geo_transform, gt)
        assert data.projection == "EPSG:28992"

    def test_gray16(self, root):
        values = (np.arange(12, dtype=np.uint16) * 1000).reshape(1, 3, 4)
        path = str(root / "gray16.png")
        write_png(path, values)
        data = read_png(path)
        assert data.array.dtype == np.uint16
        np.testing.assert_array_equal(data.array, values)

    def test_rgb_and_rgba(self, root):
        rng = np.random.RandomState(0)
        for bands, name in ((3, "rgb"), (4, "rgba")):
            values = rng.randint(0, 255, (bands, 5, 7)).astype(np.uint8)
            path = str(root / (name + ".png"))
            write_png(path, values)
            data = read_png(path)
            np.testing.assert_array_equal(data.array, values)

    def test_all_filter_types_decode(self, root):
        """Hand-encode each scanline with a different filter (a foreign
        file: our writer only emits filter None)."""
        rng = np.random.RandomState(1)
        values = rng.randint(0, 255, (5, 8)).astype(np.uint8)
        bpp = 1

        def sub(line, prev):
            out = line.astype(np.int16).copy()
            out[bpp:] -= line[:-bpp]
            return (out % 256).astype(np.uint8)

        def up(line, prev):
            return ((line.astype(np.int16) - prev) % 256).astype(np.uint8)

        def average(line, prev):
            out = np.empty_like(line)
            recon = np.zeros(len(line), np.int16)
            for i in range(len(line)):
                left = recon[i - bpp] if i >= bpp else 0
                pred = (left + prev[i]) >> 1
                out[i] = (int(line[i]) - pred) % 256
                recon[i] = line[i]
            return out

        def paeth(line, prev):
            out = np.empty_like(line)
            for i in range(len(line)):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out[i] = (int(line[i]) - pred) % 256
            return out

        filters = [
            (0, lambda line, prev: line),
            (1, sub),
            (2, up),
            (3, average),
            (4, paeth),
        ]
        stream = b""
        prev = np.zeros(8, np.int16)
        for row, (ftype, encode) in zip(values, filters):
            stream += bytes([ftype]) + encode(row, prev).tobytes()
            prev = row.astype(np.int16)

        def chunk(tag, payload):
            crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", crc)
            )

        raw = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(stream))
            + chunk(b"IEND", b"")
        )
        path = str(root / "filters.png")
        open(path, "wb").write(raw)
        data = read_png(path)
        np.testing.assert_array_equal(data.array[0], values)

    def test_sub_byte_depths(self, root):
        # 1-bit: 8 pixels per byte, big-endian bit order
        def chunk(tag, payload):
            crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", crc)
            )

        bits = np.array([[1, 0, 1, 1, 0, 0, 1, 0]], np.uint8)
        packed = np.packbits(bits[0])
        stream = b"\x00" + packed.tobytes()
        raw = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 1, 1, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(stream))
            + chunk(b"IEND", b"")
        )
        path = str(root / "bits.png")
        open(path, "wb").write(raw)
        data = read_png(path)
        np.testing.assert_array_equal(data.array[0], bits)

    def test_raster_file_source(self, root):
        values = np.arange(12, dtype=np.uint8).reshape(1, 3, 4)
        gt = (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)
        write_png(
            str(root / "source.png"), values, geo_transform=gt,
            projection="EPSG:28992",
        )
        source = RasterFileSource(
            "source.png", time_first=datetime(2000, 1, 1)
        )
        assert source.projection == "EPSG:28992"
        result = source.get_data(
            mode="vals", bbox=(1000.0, 2000.0, 1200.0, 2150.0),
            projection="EPSG:28992", width=4, height=3,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"], values)

    def test_palette_trns_alpha_bytes(self, root):
        """Palette tRNS is per-index ALPHA bytes: the first transparent
        index is nodata (review finding: was parsed as a uint16 level)."""
        import zlib as _zlib

        def chunk(tag, payload):
            crc = _zlib.crc32(tag + payload) & 0xFFFFFFFF
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", crc)
            )

        indices = np.array([[0, 1, 2, 1]], np.uint8)
        stream = b"\x00" + indices.tobytes()
        raw = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", bytes(9))
            # index 1 fully transparent, 0 and 2 opaque
            + chunk(b"tRNS", b"\xff\x00\xff")
            + chunk(b"IDAT", _zlib.compress(stream))
            + chunk(b"IEND", b"")
        )
        path = str(root / "pal.png")
        open(path, "wb").write(raw)
        data = read_png(path)
        np.testing.assert_array_equal(data.array[0], indices)
        assert data.no_data_value == 1.0

    def test_not_a_png(self, root):
        path = root / "junk.png"
        path.write_bytes(b"not a png at all")
        with pytest.raises(IOError):
            read_png(str(path))


class TestJpeg:
    def test_jpeg_with_world_file(self, root):
        PIL = pytest.importorskip("PIL.Image")
        from dask_geomodeling_tpu.io.jpeg import read_jpeg

        rng = np.random.RandomState(0)
        pixels = rng.randint(0, 255, (16, 16), dtype=np.uint8)
        path = str(root / "photo.jpg")
        PIL.fromarray(pixels, mode="L").save(path, quality=95)
        gt = (1000.0, 50.0, 0.0, 2800.0, 0.0, -50.0)
        (root / "photo.jgw").write_text(
            "\n".join(
                "%.10f" % v
                for v in (50.0, 0.0, 0.0, -50.0, 1025.0, 2775.0)
            )
        )
        (root / "photo.prj").write_text("EPSG:28992")
        data = read_jpeg(path)
        assert data.array.shape == (1, 16, 16)
        np.testing.assert_allclose(data.geo_transform, gt)
        assert data.projection == "EPSG:28992"
        # lossy codec: values within JPEG quantization error
        assert np.abs(
            data.array[0].astype(int) - pixels.astype(int)
        ).mean() < 20

    def test_jpeg_rgb_source(self, root):
        PIL = pytest.importorskip("PIL.Image")

        rng = np.random.RandomState(1)
        pixels = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
        path = str(root / "rgb.jpg")
        PIL.fromarray(pixels, mode="RGB").save(path, quality=95)
        (root / "rgb.jgw").write_text(
            "\n".join(str(v) for v in (1.0, 0.0, 0.0, -1.0, 0.5, 7.5))
        )
        source = RasterFileSource("rgb.jpg", time_first=datetime(2000, 1, 1))
        result = source.get_data(
            mode="vals", bbox=(0.0, 0.0, 8.0, 8.0),
            projection=source.projection, width=8, height=8,
            start=datetime(2000, 1, 1),
        )
        assert result["values"].shape == (1, 8, 8)  # band 1 of 3


class TestNetcdf:
    def test_roundtrip_float(self, root):
        values = np.linspace(0, 1, 12, dtype=np.float32).reshape(1, 3, 4)
        gt = (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)
        path = str(root / "data.nc")
        write_netcdf(
            path, values, gt, projection="EPSG:28992", no_data_value=-1.0
        )
        data = read_netcdf(path)
        np.testing.assert_allclose(data.array, values)
        np.testing.assert_allclose(data.geo_transform, gt)
        assert data.no_data_value == -1.0
        # the CRS travels as a spatial_ref WKT global attribute
        from dask_geomodeling_tpu.geo.crs import get_sr

        assert get_sr(data.projection).code == 28992

    def test_multiband_int(self, root):
        values = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
        gt = (0.0, 1.0, 0.0, 3.0, 0.0, -1.0)
        path = str(root / "multi.nc")
        write_netcdf(path, values, gt)
        data = read_netcdf(path)
        assert data.array.shape == (2, 3, 4)
        np.testing.assert_array_equal(data.array, values)

    def test_south_up_flips(self, root):
        # ascending y coordinates (south-up storage) must flip into the
        # north-up contract
        values = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
        gt_south = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)  # dy > 0
        path = str(root / "south.nc")
        write_netcdf(path, values, gt_south)
        data = read_netcdf(path)
        assert data.geo_transform[5] < 0
        np.testing.assert_array_equal(data.array[0], values[0, ::-1])

    def test_scale_offset_unpacking(self, root):
        # CF packing: stored int16 + scale/offset unpack to float32;
        # fill cells become the float32 sentinel
        packed = np.array([[[0, 100], [200, -32768]]], np.int16)
        gt = (0.0, 1.0, 0.0, 2.0, 0.0, -1.0)
        path = str(root / "packed.nc")
        write_netcdf(
            path, packed, gt, no_data_value=-32768,
            scale_factor=0.01, add_offset=20.0,
        )
        data = read_netcdf(path)
        assert data.array.dtype == np.float32
        np.testing.assert_allclose(
            data.array[0, 0], [20.0, 21.0], atol=1e-6
        )
        np.testing.assert_allclose(data.array[0, 1, 0], 22.0, atol=1e-6)
        assert data.no_data_value == float(np.finfo(np.float32).max)
        assert data.array[0, 1, 1] == data.no_data_value

    def test_netcdf4_invalid_or_gated(self, root):
        # with h5py present a truncated HDF5 file fails as an IO error;
        # without it the gate raises NotImplementedError
        path = root / "h5.nc"
        path.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
        with pytest.raises((NotImplementedError, OSError)):
            read_netcdf(str(path))

    def test_raster_file_source(self, root):
        values = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
        gt = (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)
        write_netcdf(
            str(root / "source.nc"), values, gt, projection="EPSG:28992",
            no_data_value=-9999.0,
        )
        source = RasterFileSource(
            "source.nc", time_first=datetime(2000, 1, 1)
        )
        assert source.fillvalue == -9999.0
        result = source.get_data(
            mode="vals", bbox=(1000.0, 2000.0, 1200.0, 2150.0),
            projection="EPSG:28992", width=4, height=3,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"], values)


try:
    import h5py
except ImportError:  # the gate: only TestNetcdf4 needs it
    h5py = None


@pytest.mark.skipif(h5py is None, reason="netCDF-4 path is h5py-gated")
class TestNetcdf4:
    """netCDF-4 (HDF5) raster reading through the gated h5py path."""

    def _write(self, path, values, xs, ys, wkt=None, dim_scales=True,
               fill=None, scale=None, offset=None, **dataset_kwargs):
        with h5py.File(path, "w") as f:
            ds = f.create_dataset("data", data=values, **dataset_kwargs)
            if fill is not None:
                ds.attrs["_FillValue"] = np.asarray(fill, values.dtype)
            if scale is not None:
                ds.attrs["scale_factor"] = float(scale)
            if offset is not None:
                ds.attrs["add_offset"] = float(offset)
            if dim_scales:
                names = ["band", "y", "x"][3 - values.ndim:]
                coords = [None] * (values.ndim - 2) + [ys, xs]
                for axis, (name, coord) in enumerate(zip(names, coords)):
                    if coord is None:
                        coord = np.arange(values.shape[axis], dtype=float)
                    cv = f.create_dataset(name, data=np.asarray(coord, float))
                    cv.make_scale(name)
                    ds.dims[axis].attach_scale(cv)
            if wkt is not None:
                gm = f.create_dataset("crs", data=0)
                gm.attrs["spatial_ref"] = wkt
                ds.attrs["grid_mapping"] = "crs"

    def test_reads_cf_file(self, root):
        from dask_geomodeling_tpu.geo.crs import get_sr

        values = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
        gt = (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)
        xs = gt[0] + gt[1] * (np.arange(4) + 0.5)
        ys = gt[3] + gt[5] * (np.arange(3) + 0.5)
        path = str(root / "data.nc4")
        self._write(path, values, xs, ys,
                    wkt=get_sr("EPSG:28992").ExportToWkt(), fill=-1.0)
        data = read_netcdf(path)
        np.testing.assert_allclose(data.array, values[None])
        np.testing.assert_allclose(data.geo_transform, gt)
        assert data.no_data_value == -1.0
        assert get_sr(data.projection).code == 28992

    def test_chunked_deflate_shuffle(self, root):
        values = np.arange(64 * 96, dtype=np.int32).reshape(64, 96)
        xs = np.arange(96) + 0.5
        ys = 64 - (np.arange(64) + 0.5)
        path = str(root / "comp.h5")
        self._write(path, values, xs, ys, chunks=(16, 32),
                    compression="gzip", shuffle=True)
        data = read_netcdf(path)
        np.testing.assert_array_equal(data.array[0], values)
        np.testing.assert_allclose(
            data.geo_transform, (0.0, 1.0, 0.0, 64.0, 0.0, -1.0)
        )

    def test_south_up_flips(self, root):
        values = np.arange(12, dtype=np.float64).reshape(3, 4)
        xs = np.arange(4) + 0.5
        ys = np.arange(3) + 0.5  # ascending: south-up storage
        path = str(root / "south.nc4")
        self._write(path, values, xs, ys)
        data = read_netcdf(path)
        assert data.geo_transform[5] < 0
        np.testing.assert_array_equal(data.array[0], values[::-1])

    def test_scale_offset_unpacking(self, root):
        packed = np.array([[0, 100], [200, -32768]], np.int16)
        path = str(root / "packed.nc4")
        self._write(
            path, packed, np.arange(2) + 0.5, 2 - (np.arange(2) + 0.5),
            fill=-32768, scale=0.01, offset=20.0,
        )
        data = read_netcdf(path)
        assert data.array.dtype == np.float32
        np.testing.assert_allclose(data.array[0, 0], [20.0, 21.0], atol=1e-6)
        assert data.array[0, 1, 1] == float(np.finfo(np.float32).max)

    def test_multiband_and_variable_select(self, root):
        values = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        path = str(root / "multi.h5")
        self._write(path, values, np.arange(4) + 0.5,
                    3 - (np.arange(3) + 0.5))
        with h5py.File(path, "a") as f:
            grp = f.create_group("nested")
            grp.create_dataset("small", data=np.zeros((2, 2), np.float32))
        data = read_netcdf(path)  # largest variable wins
        assert data.array.shape == (2, 3, 4)
        np.testing.assert_array_equal(data.array, values)
        small = read_netcdf(path, variable="small")
        assert small.array.shape == (1, 2, 2)

    def test_no_dim_scales_pixel_grid(self, root):
        values = np.ones((3, 4), np.float32)
        path = str(root / "bare.h5")
        self._write(path, values, None, None, dim_scales=False)
        data = read_netcdf(path)
        # pixel-index grid, flipped north-up
        assert data.geo_transform[1] == 1.0
        assert data.geo_transform[5] == -1.0

    def test_raster_file_source(self, root):
        from dask_geomodeling_tpu.geo.crs import get_sr

        values = np.arange(12, dtype=np.float32).reshape(3, 4)
        gt = (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)
        xs = gt[0] + gt[1] * (np.arange(4) + 0.5)
        ys = gt[3] + gt[5] * (np.arange(3) + 0.5)
        self._write(str(root / "source.nc4"), values, xs, ys,
                    wkt=get_sr("EPSG:28992").ExportToWkt(), fill=-9999.0)
        source = RasterFileSource(
            "source.nc4", time_first=datetime(2000, 1, 1)
        )
        assert source.fillvalue == -9999.0
        result = source.get_data(
            mode="vals", bbox=(1000.0, 2000.0, 1200.0, 2150.0),
            projection="EPSG:28992", width=4, height=3,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"], values[None])

    def test_square_grid_name_disambiguation(self, root):
        """Unattached dim scales on a square grid must match by NAME,
        not first-length-hit (review finding: ys silently became xs)."""
        values = np.zeros((4, 4), np.float32)
        path = str(root / "square.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("data", data=values)
            # deliberately NOT attached via DIMENSION_LIST
            y = f.create_dataset("y", data=400.0 - 100.0 * (np.arange(4) + 0.5))
            y.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
            x = f.create_dataset("x", data=1000.0 + 10.0 * (np.arange(4) + 0.5))
            x.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
        data = read_netcdf(path)
        np.testing.assert_allclose(
            data.geo_transform, (1000.0, 10.0, 0.0, 400.0, 0.0, -100.0)
        )


class TestEnvi:
    """ENVI .hdr + raw pairs (native reader for GDAL's ENVI driver role)."""

    def test_bsq_roundtrip_with_wkt_crs(self, root):
        from dask_geomodeling_tpu.io.envi import read_envi, write_envi

        values = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        gt = (500000.0, 10.0, 0.0, 4649776.0, 0.0, -10.0)
        path = str(root / "scene.img")
        write_envi(path, values, geo_transform=gt, projection="EPSG:32631",
                   no_data_value=-9999.0, band_names=["b1", "b2"])
        data = read_envi(path)
        np.testing.assert_array_equal(data.array, values)
        np.testing.assert_allclose(data.geo_transform, gt)
        assert data.no_data_value == -9999.0
        assert data.metadata == ["b1", "b2"]
        from dask_geomodeling_tpu.geo import get_epsg_or_wkt
        assert get_epsg_or_wkt(data.projection) == "EPSG:32631"
        # reading via the .hdr path gives the same payload
        np.testing.assert_array_equal(
            read_envi(str(root / "scene.img.hdr")).array, values
        )

    @pytest.mark.parametrize("interleave", ["bil", "bip"])
    def test_interleaves_and_byte_order(self, root, interleave):
        from dask_geomodeling_tpu.io.envi import read_envi

        values = np.arange(24, dtype=">i2").reshape(2, 3, 4)
        if interleave == "bil":
            on_disk = values.transpose(1, 0, 2)  # (lines, bands, samples)
        else:
            on_disk = values.transpose(1, 2, 0)  # (lines, samples, bands)
        data_path = root / "raw.dat"
        np.ascontiguousarray(on_disk).tofile(str(data_path))
        (root / "raw.hdr").write_text(
            "ENVI\nsamples = 4\nlines = 3\nbands = 2\n"
            "data type = 2\ninterleave = %s\nbyte order = 1\n" % interleave
        )
        data = read_envi(str(data_path))
        np.testing.assert_array_equal(data.array, values.astype("=i2"))

    def test_utm_map_info_projection(self, root):
        from dask_geomodeling_tpu.io.envi import read_envi

        np.zeros(12, dtype=np.uint8).tofile(str(root / "utm.bsq"))
        (root / "utm.hdr").write_text(
            "ENVI\nsamples = 4\nlines = 3\nbands = 1\ndata type = 1\n"
            "interleave = bsq\n"
            "map info = {UTM, 1.0, 1.0, 500000.0, 4649776.0, 30.0, 30.0,"
            " 31, North, WGS-84, units=Meters}\n"
        )
        data = read_envi(str(root / "utm.bsq"))
        assert data.projection == "EPSG:32631"
        np.testing.assert_allclose(
            data.geo_transform, (500000.0, 30.0, 0.0, 4649776.0, 0.0, -30.0)
        )

    def test_raster_file_source(self, root):
        from dask_geomodeling_tpu.io.envi import write_envi

        values = np.arange(12, dtype=np.uint8).reshape(1, 3, 4)
        gt = (1000.0, 50.0, 0.0, 2150.0, 0.0, -50.0)
        write_envi(str(root / "src.img"), values, geo_transform=gt,
                   projection="EPSG:28992")
        source = RasterFileSource("src.img", time_first=datetime(2000, 1, 1))
        assert source.projection == "EPSG:28992"
        result = source.get_data(
            mode="vals", bbox=(1000.0, 2000.0, 1200.0, 2150.0),
            projection="EPSG:28992", width=4, height=3,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"], values)

    def test_header_semicolons_and_braced_scalars(self, root):
        """';' inside braced values is data, not a comment; braced scalars
        unwrap (review findings: both previously corrupted the parse)."""
        from dask_geomodeling_tpu.io.envi import read_envi

        np.full(12, 7, dtype=np.uint8).tofile(str(root / "c.bsq"))
        (root / "c.hdr").write_text(
            "ENVI\n"
            "; a leading comment line\n"
            "description = {File Imported into ENVI; georeferenced}\n"
            "samples = 4\nlines = 3\nbands = 1\ndata type = 1\n"
            "interleave = bsq\n"
            "data ignore value = {255}\n"
        )
        data = read_envi(str(root / "c.bsq"))
        assert data.array.shape == (1, 3, 4)
        assert data.no_data_value == 255.0

    def test_write_rejects_rotated_geotransform(self, root):
        from dask_geomodeling_tpu.io.envi import write_envi

        values = np.zeros((1, 2, 2), dtype=np.uint8)
        with pytest.raises(NotImplementedError):
            write_envi(str(root / "r.img"), values,
                       geo_transform=(0, 10, 5, 0, 5, -10))
        with pytest.raises(NotImplementedError):
            write_envi(str(root / "s.img"), values,
                       geo_transform=(0, 10, 0, 0, 0, 10))

    def test_hdr_target_writes_img_data(self, root):
        from dask_geomodeling_tpu.io.envi import read_envi, write_envi

        values = np.arange(6, dtype=np.int16).reshape(1, 2, 3)
        write_envi(str(root / "t.hdr"), values)
        assert (root / "t.img").exists()
        np.testing.assert_array_equal(read_envi(str(root / "t.hdr")).array,
                                      values)

    def test_raw_extension_file_source(self, root):
        from dask_geomodeling_tpu.io.envi import write_envi

        values = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
        write_envi(str(root / "r.raw"), values,
                   geo_transform=(0.0, 1.0, 0.0, 3.0, 0.0, -1.0),
                   projection="EPSG:28992")
        source = RasterFileSource("r.raw", time_first=datetime(2000, 1, 1))
        out = source.get_data(
            mode="vals", bbox=(0.0, 0.0, 4.0, 3.0),
            projection="EPSG:28992", width=4, height=3,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(out["values"], values)

    def test_header_rewrite_invalidates_cache(self, root):
        """Editing the .hdr next to a cached data file re-reads the pair."""
        from dask_geomodeling_tpu.io.envi import read_envi, write_envi
        from dask_geomodeling_tpu.runtime.pipeline import read_geotiff_cached

        values = np.zeros((1, 2, 2), dtype=np.uint8)
        path = str(root / "cache.img")
        write_envi(path, values, no_data_value=1.0)
        assert read_geotiff_cached(path).no_data_value == 1.0
        header = path + ".hdr"
        text = open(header).read().replace(
            "data ignore value = 1.0", "data ignore value = 2.0"
        )
        open(header, "w").write(text)
        assert read_geotiff_cached(path).no_data_value == 2.0


class TestBmpGif:
    """BMP/GIF rasters via the Pillow-backed reader with GDAL-convention
    world files (.bpw / .gfw)."""

    @pytest.mark.parametrize("ext,world", [("bmp", "bpw"), ("gif", "gfw")])
    def test_roundtrip_with_world_file(self, root, ext, world):
        from PIL import Image

        values = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
        path = str(root / ("img." + ext))
        Image.fromarray(values, mode="L").save(path)
        (root / ("img." + world)).write_text(
            "50.0\n0.0\n0.0\n-50.0\n1025.0\n2125.0\n"
        )
        (root / "img.prj").write_text("EPSG:28992")
        source = RasterFileSource(
            "img." + ext, time_first=datetime(2000, 1, 1)
        )
        assert source.projection == "EPSG:28992"
        result = source.get_data(
            mode="vals", bbox=(1000.0, 2000.0, 1200.0, 2150.0),
            projection="EPSG:28992", width=4, height=3,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"][0], values)

    def test_gif_palette_converts_to_rgb(self, root):
        from PIL import Image

        from dask_geomodeling_tpu.io.jpeg import read_jpeg

        rgb = np.zeros((4, 4, 3), dtype=np.uint8)
        rgb[..., 0] = 200
        path = str(root / "pal.gif")
        Image.fromarray(rgb).convert("P").save(path)
        data = read_jpeg(path)
        assert data.array.shape == (3, 4, 4)
        # GIF palette quantization may shift levels slightly
        assert (np.abs(data.array[0].astype(int) - 200) < 16).all()
        assert (data.array[1] == 0).all() and (data.array[2] == 0).all()


class TestGpkgRaster:
    """GeoPackage tile pyramids (GDAL GPKG raster driver role)."""

    def test_roundtrip_via_file_source(self, root):
        from dask_geomodeling_tpu.io.gpkg_raster import (
            read_gpkg_raster,
            write_gpkg_raster,
        )

        values = np.arange(3 * 300 * 520, dtype=np.uint8).reshape(
            3, 300, 520
        ) % 251
        gt = (10000.0, 2.0, 0.0, 50000.0, 0.0, -2.0)
        path = str(root / "tiles.gpkg")
        write_gpkg_raster(path, values, gt, projection="EPSG:28992")
        data = read_gpkg_raster(path)
        # the mosaic is padded up to whole 256px tiles
        assert data.array.shape == (3, 512, 768)
        np.testing.assert_array_equal(data.array[:, :300, :520], values)
        np.testing.assert_allclose(data.geo_transform, gt)
        assert data.projection == "EPSG:28992"

        source = RasterFileSource(
            "tiles.gpkg", time_first=datetime(2000, 1, 1)
        )
        assert source.projection == "EPSG:28992"
        result = source.get_data(
            mode="vals",
            bbox=(10000.0, 50000.0 - 64.0, 10064.0, 50000.0),
            projection="EPSG:28992", width=32, height=32,
            start=datetime(2000, 1, 1),
        )
        # bands are time frames for a RasterFileSource; a bare start
        # selects the first frame
        np.testing.assert_array_equal(result["values"], values[:1, :32, :32])

    def test_sparse_pyramid_offsets(self, root):
        """Tiles missing at the matrix origin: the mosaic anchors at the
        first present tile, not at (0, 0)."""
        import sqlite3

        from dask_geomodeling_tpu.io.gpkg_raster import (
            read_gpkg_raster,
            write_gpkg_raster,
        )

        values = np.ones((1, 256, 256), dtype=np.uint8)
        gt = (0.0, 1.0, 0.0, 1024.0, 0.0, -1.0)
        path = str(root / "sparse.gpkg")
        write_gpkg_raster(path, values, gt, projection="EPSG:28992")
        # shift the single tile to column 2, row 3 of the matrix
        con = sqlite3.connect(path)
        con.execute("UPDATE tiles SET tile_column = 2, tile_row = 3")
        con.commit()
        con.close()
        data = read_gpkg_raster(path)
        assert data.array.shape == (1, 256, 256)
        np.testing.assert_allclose(
            data.geo_transform,
            (512.0, 1.0, 0.0, 1024.0 - 768.0, 0.0, -1.0),
        )

    def test_vector_gpkg_still_reads_as_vector(self, root):
        """A features GeoPackage keeps going through the vector reader."""
        from dask_geomodeling_tpu.io.gpkg_raster import is_raster_gpkg
        from dask_geomodeling_tpu.io.vectorfile import write_vector
        import pandas as pd

        from dask_geomodeling_tpu.geo.features import GeoDataFrame
        from dask_geomodeling_tpu.geo.geometry import box

        frame = GeoDataFrame(
            pd.DataFrame({"v": [1]}), geometry=[box(0, 0, 1, 1)],
            crs="EPSG:4326",
        )
        path = str(root / "vec.gpkg")
        write_vector(frame, path)
        assert not is_raster_gpkg(path)


class TestMbtiles:
    """MBTiles pyramids (GDAL MBTiles driver role): Web Mercator grid,
    TMS row axis (row 0 at the south edge)."""

    # zoom 10 resolution for 256-px tiles
    RES = 2 * 20037508.342789244 / (256 * 2**10)

    def _grid_aligned_gt(self, col, row_xyz, px_off=0, py_off=0):
        span = 256 * self.RES
        ox = -20037508.342789244 + col * span + px_off * self.RES
        oy = 20037508.342789244 - row_xyz * span - py_off * self.RES
        return (ox, self.RES, 0.0, oy, 0.0, -self.RES)

    def test_roundtrip_via_file_source(self, root):
        from dask_geomodeling_tpu.io.mbtiles import read_mbtiles, write_mbtiles

        values = (
            np.arange(3 * 300 * 520, dtype=np.uint8).reshape(3, 300, 520)
            % 251
        )
        gt = self._grid_aligned_gt(col=520, row_xyz=330)
        path = str(root / "tiles.mbtiles")
        write_mbtiles(path, values, gt, projection="EPSG:3857")
        data = read_mbtiles(path)
        assert data.array.shape == (3, 512, 768)  # padded to whole tiles
        np.testing.assert_array_equal(data.array[:, :300, :520], values)
        np.testing.assert_allclose(data.geo_transform, gt, rtol=1e-12)
        assert data.projection == "EPSG:3857"

        source = RasterFileSource(
            "tiles.mbtiles", time_first=datetime(2000, 1, 1)
        )
        assert source.projection == "EPSG:3857"
        result = source.get_data(
            mode="vals",
            bbox=(gt[0], gt[3] - 32 * self.RES, gt[0] + 32 * self.RES, gt[3]),
            projection="EPSG:3857", width=32, height=32,
            start=datetime(2000, 1, 1),
        )
        np.testing.assert_array_equal(result["values"], values[:1, :32, :32])

    def test_mid_tile_origin_pads_to_boundary(self, root):
        from dask_geomodeling_tpu.io.mbtiles import read_mbtiles, write_mbtiles

        values = np.full((1, 100, 100), 7, dtype=np.uint8)
        gt = self._grid_aligned_gt(col=100, row_xyz=200, px_off=40, py_off=60)
        path = str(root / "offset.mbtiles")
        write_mbtiles(path, values, gt)
        data = read_mbtiles(path)
        np.testing.assert_array_equal(
            data.array[0, 60:160, 40:140], values[0]
        )
        # the padding is zeros and the anchor is the tile corner
        assert data.array[0, 0, 0] == 0
        span = 256 * self.RES
        np.testing.assert_allclose(
            data.geo_transform[0], gt[0] - 40 * self.RES, rtol=1e-12
        )
        np.testing.assert_allclose(
            data.geo_transform[3], gt[3] + 60 * self.RES, rtol=1e-12
        )
        assert span > 0

    def test_tms_row_flip(self, root):
        """tile_row counts from the south: two vertically stacked tiles
        land in the right order."""
        import sqlite3

        from dask_geomodeling_tpu.io.mbtiles import read_mbtiles, write_mbtiles

        top = np.full((1, 256, 256), 9, dtype=np.uint8)
        bottom = np.full((1, 256, 256), 4, dtype=np.uint8)
        values = np.concatenate([top, bottom], axis=1)
        gt = self._grid_aligned_gt(col=12, row_xyz=34)
        path = str(root / "rows.mbtiles")
        write_mbtiles(path, values, gt)
        con = sqlite3.connect(path)
        rows = dict(
            (r[0], r[1])
            for r in con.execute(
                "SELECT tile_row, tile_data FROM tiles"
            ).fetchall()
        )
        con.close()
        assert len(rows) == 2
        # higher TMS row = further north = the 9-valued strip
        hi, lo = max(rows), min(rows)
        assert hi == lo + 1
        data = read_mbtiles(path)
        assert (data.array[0, :256] == 9).all()
        assert (data.array[0, 256:] == 4).all()

    def test_metadata_and_validation(self, root):
        from dask_geomodeling_tpu.io.mbtiles import read_mbtiles, write_mbtiles
        import sqlite3

        values = np.ones((1, 256, 256), dtype=np.uint8)
        gt = self._grid_aligned_gt(col=512, row_xyz=512)  # world center
        path = str(root / "meta.mbtiles")
        write_mbtiles(path, values, gt, name="rain")
        con = sqlite3.connect(path)
        meta = dict(con.execute("SELECT name, value FROM metadata"))
        con.close()
        assert meta["format"] == "png"
        assert meta["minzoom"] == meta["maxzoom"] == "10"
        # the tile's NW corner is the world center: bounds run east/south
        w, s, e, n = [float(v) for v in meta["bounds"].split(",")]
        assert w == 0.0 and n == 0.0 and 0 < e < 1 and -1 < s < 0
        with pytest.raises(ValueError, match="Web Mercator"):
            write_mbtiles(str(root / "x.mbtiles"), values, gt,
                          projection="EPSG:28992")
        with pytest.raises(ValueError, match="zoom ladder"):
            write_mbtiles(str(root / "y.mbtiles"), values,
                          (0, 123.456, 0, 0, 0, -123.456))
        with pytest.raises(IOError, match="vector tiles"):
            vt = str(root / "vec.mbtiles")
            con = sqlite3.connect(vt)
            con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
            con.execute("INSERT INTO metadata VALUES ('format', 'pbf')")
            con.commit()
            con.close()
            read_mbtiles(vt)

    def test_mixed_grayscale_and_rgb_tiles(self, root):
        """Review regression: a pyramid mixing PNG8 and PNG24 tiles
        assembles at the max band count with gray broadcast to RGB."""
        import sqlite3

        from dask_geomodeling_tpu.io.mbtiles import read_mbtiles, write_mbtiles
        from dask_geomodeling_tpu.io.png import write_png_bytes

        values = np.full((1, 256, 512), 7, dtype=np.uint8)
        gt = self._grid_aligned_gt(col=3, row_xyz=5)
        path = str(root / "mixed.mbtiles")
        write_mbtiles(path, values, gt)
        # replace the eastern tile with an RGB blob
        rgb = np.zeros((3, 256, 256), dtype=np.uint8)
        rgb[0] = 200
        rgb[1] = 100
        rgb[2] = 50
        con = sqlite3.connect(path)
        (max_col,) = con.execute(
            "SELECT MAX(tile_column) FROM tiles"
        ).fetchone()
        con.execute(
            "UPDATE tiles SET tile_data = ? WHERE tile_column = ?",
            (write_png_bytes(rgb), max_col),
        )
        con.commit()
        con.close()
        data = read_mbtiles(path)
        assert data.array.shape == (3, 256, 512)
        # the grayscale tile is broadcast across all three bands
        assert (data.array[:, :, :256] == 7).all()
        assert (data.array[0, :, 256:] == 200).all()
        assert (data.array[2, :, 256:] == 50).all()

    def test_all_zero_data_roundtrips(self, root):
        """Review regression: zero is valid data — all-zero tiles are
        written, not dropped (the origin must not shift)."""
        from dask_geomodeling_tpu.io.mbtiles import read_mbtiles, write_mbtiles

        values = np.zeros((1, 256, 512), dtype=np.uint8)
        values[0, 10, 300] = 1  # east tile nonzero, west tile all zeros
        gt = self._grid_aligned_gt(col=9, row_xyz=9)
        path = str(root / "zeros.mbtiles")
        write_mbtiles(path, values, gt)
        data = read_mbtiles(path)
        assert data.array.shape == (1, 256, 512)
        np.testing.assert_allclose(data.geo_transform, gt, rtol=1e-12)
        np.testing.assert_array_equal(data.array, values)


class TestNetcdfWindows:
    """Windowed netCDF reads: windowed == whole-read slice bit-exact."""

    def test_netcdf4_window_equals_whole(self, root):
        pytest.importorskip("h5py")
        from dask_geomodeling_tpu.io.netcdf import read_netcdf_window

        values = ((np.arange(48 * 64) * 3) % 251).astype("i4").reshape(48, 64)
        xs = np.arange(64) + 0.5
        path = str(root / "w.nc4")
        for south_up in (False, True):
            ys = (
                (np.arange(48) + 0.5) if south_up else (47.5 - np.arange(48))
            )
            TestNetcdf4()._write(
                path, values if not south_up else values[::-1], xs, ys,
                chunks=(16, 16), compression="gzip",
            )
            whole = read_netcdf(path)
            for r0, r1, c0, c1 in [(0, 48, 0, 64), (5, 30, 10, 50),
                                   (47, 48, 63, 64)]:
                window = read_netcdf_window(path, r0, r1, c0, c1)
                np.testing.assert_array_equal(
                    window.array, whole.array[:, r0:r1, c0:c1]
                )
                gt = whole.geo_transform
                np.testing.assert_allclose(
                    window.geo_transform,
                    (gt[0] + c0 * gt[1], gt[1], 0, gt[3] + r0 * gt[5], 0,
                     gt[5]),
                )

    def test_classic_window_equals_whole(self, root):
        from dask_geomodeling_tpu.io.netcdf import read_netcdf_window

        values = np.arange(200, dtype="f4").reshape(1, 10, 20)
        gt = (0.0, 2.0, 0.0, 20.0, 0.0, -2.0)
        path = str(root / "c.nc")
        write_netcdf(path, values, gt, no_data_value=-1.0)
        whole = read_netcdf(path)
        window = read_netcdf_window(path, 2, 8, 3, 17)
        np.testing.assert_array_equal(
            window.array, whole.array[:, 2:8, 3:17]
        )
        np.testing.assert_allclose(
            window.geo_transform, (6.0, 2.0, 0.0, 16.0, 0.0, -2.0)
        )

    def test_info_is_metadata_only(self, root, monkeypatch):
        pytest.importorskip("h5py")
        """For HDF5 files, info must not read the data variable."""
        from dask_geomodeling_tpu.io.netcdf import read_netcdf_info

        values = np.full((40, 40), 3, dtype="f8")
        xs = np.arange(40) + 0.5
        ys = 39.5 - np.arange(40)
        path = str(root / "i.nc4")
        from dask_geomodeling_tpu.geo.crs import get_sr

        TestNetcdf4()._write(
            path, values, xs, ys, wkt=get_sr("EPSG:28992").ExportToWkt(),
            fill=-1.0, scale=0.5, offset=2.0,
        )
        whole = read_netcdf(path)
        reads = []
        import h5py as h5

        original = h5.Dataset.__getitem__

        def spy(self, item):
            if self.name == "/data":
                reads.append(item)
            return original(self, item)

        monkeypatch.setattr(h5.Dataset, "__getitem__", spy)
        info = read_netcdf_info(path)
        assert reads == []  # no data access
        assert (info.width, info.height, info.bands) == (40, 40, 1)
        np.testing.assert_allclose(info.geo_transform, whole.geo_transform)
        assert info.no_data_value == whole.no_data_value
        assert np.dtype(info.dtype) == whole.array.dtype
        from dask_geomodeling_tpu.geo.crs import get_sr as _sr

        assert _sr(info.projection).code == 28992

    def test_file_source_windowed_equals_whole(self, root):
        pytest.importorskip("h5py")
        from dask_geomodeling_tpu.runtime.pipeline import clear_read_cache

        values = ((np.arange(30 * 40) * 3) % 251).astype("f4").reshape(30, 40)
        xs = np.arange(40) + 0.5
        ys = 29.5 - np.arange(30)
        path = str(root / "fs.nc4")
        TestNetcdf4()._write(path, values, xs, ys, chunks=(10, 10))
        request = dict(
            mode="vals", bbox=(5.0, 5.0, 35.0, 25.0),
            projection="EPSG:4326", width=30, height=20,
            start=datetime(2000, 1, 1),
        )
        source = RasterFileSource("fs.nc4", time_first=datetime(2000, 1, 1))
        whole = source.get_data(**request)
        clear_read_cache()
        with config.set({"geomodeling.windowed-read-limit": 100}):
            windowed = source.get_data(**request)
        np.testing.assert_array_equal(whole["values"], windowed["values"])

def test_webp_mbtiles_tiles_decode(root):
    """WebP tile blobs (format=webp) ride the PIL decode branch."""
    import sqlite3
    from io import BytesIO

    from PIL import Image

    from dask_geomodeling_tpu.io.mbtiles import read_mbtiles, write_mbtiles

    values = np.full((1, 256, 256), 123, dtype=np.uint8)
    gt = TestMbtiles()._grid_aligned_gt(col=7, row_xyz=7)
    path = str(root / "webp.mbtiles")
    write_mbtiles(path, values, gt)
    buf = BytesIO()
    Image.fromarray(values[0], mode="L").save(
        buf, format="WEBP", lossless=True
    )
    con = sqlite3.connect(path)
    con.execute("UPDATE tiles SET tile_data = ?", (buf.getvalue(),))
    con.execute("UPDATE metadata SET value='webp' WHERE name='format'")
    con.commit()
    con.close()
    data = read_mbtiles(path)
    # PIL promotes gray webp to RGB; all bands carry the gray value
    assert (data.array[:, :256, :256] == 123).all()


def test_netcdf_non_epsg_crs_roundtrip(root):
    """Parametric CRS written as structural spatial_ref WKT reads back
    transform-equivalent."""
    from dask_geomodeling_tpu.geo.crs import get_transform_func

    proj4 = "+proj=sinu +lon_0=10 +a=6371007.181 +b=6371007.181 +units=m"
    path = str(root / "sinu.nc")
    write_netcdf(path, np.zeros((1, 4, 4), "u1"), (0, 1, 0, 4, 0, -1),
                 projection=proj4)
    back = read_netcdf(path)
    a = get_transform_func("EPSG:4326", proj4)(
        np.array([12.0]), np.array([45.0])
    )
    b = get_transform_func("EPSG:4326", back.projection)(
        np.array([12.0]), np.array([45.0])
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_png_pam_overrides(root):
    """A GDAL PAM sidecar supplies nodata and SRS for world-file formats."""
    from dask_geomodeling_tpu.geo.crs import get_sr
    from dask_geomodeling_tpu.io.png import read_png, write_png

    path = str(root / "pam.png")
    write_png(path, np.arange(16, dtype=np.uint8).reshape(1, 4, 4),
              geo_transform=(0, 1, 0, 4, 0, -1))
    wkt = get_sr("EPSG:28992").ExportToWkt()
    with open(path + ".aux.xml", "w") as f:
        f.write(
            "<PAMDataset><SRS>%s</SRS>"
            '<PAMRasterBand band="1"><NoDataValue>3</NoDataValue>'
            "</PAMRasterBand></PAMDataset>" % wkt
        )
    back = read_png(path)
    assert back.no_data_value == 3.0
    assert back.projection == "EPSG:28992"


def test_jpeg_pam_nodata(root):
    from dask_geomodeling_tpu.io.jpeg import read_pillow_raster
    from PIL import Image

    path = str(root / "pam.bmp")
    Image.fromarray(np.zeros((4, 4), np.uint8)).save(path)
    assert read_pillow_raster(path).no_data_value is None
    with open(path + ".aux.xml", "w") as f:
        f.write(
            '<PAMDataset><PAMRasterBand band="1">'
            "<NoDataValue>7</NoDataValue></PAMRasterBand></PAMDataset>"
        )
    assert read_pillow_raster(path).no_data_value == 7.0
