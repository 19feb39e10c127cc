"""Zonal statistics: AggregateRaster and AggregateRasterAboveThreshold.

Semantics match the reference (dask_geomodeling/geometry/aggregate.py):
the source extent is pre-flighted to build the raster request; the pixel
budget is enforced (with optional automatic coarsening by integer factors);
the grid snaps to (0, 0); features are rasterized in disjoint buckets
(level+cells hashing) so overlapping features don't clobber each other's
labels; per-frame labeled statistics run over the label raster; features
covering no cell centers fall back to centroid point sampling; extensive
statistics are rescaled by the coarsening factor squared.

The per-frame labeled statistics are scipy.ndimage on host; on the TPU
executor the same segment reductions are planned as device kernels
(segment-sum over flattened labels), tracked in ops/.
"""
from collections import defaultdict
from functools import partial
from math import ceil, floor, log, sqrt

import numpy as np
from scipy import ndimage

from dask_geomodeling_tpu import utils
from dask_geomodeling_tpu.config import config
from dask_geomodeling_tpu.geo import measurements
from dask_geomodeling_tpu.geo.features import GeoDataFrame
from dask_geomodeling_tpu.geometry.base import GeometryBlock
from dask_geomodeling_tpu.raster import RasterBlock

__all__ = ["AggregateRaster", "AggregateRasterAboveThreshold", "bucketize"]


class Bucket:
    """Track features in a sparse grid spanning at most 4 cells each."""

    def __init__(self):
        self.cells = set()
        self.indices = []

    def __contains__(self, cells):
        return bool(self.cells & cells)

    def add(self, index, cells):
        self.indices.append(index)
        self.cells.update(cells)


def calculate_level_and_cells(bbox):
    """Return (level, cells): the power-of-two grid level sized to the bbox
    and the (at most 4) occupied cell indices at that level."""
    x1, y1, x2, y2 = bbox
    level = -ceil(log(max(x2 - x1, y2 - y1), 2))

    width = 0.5**level
    height = 0.5**level

    j1 = floor(x1 / width)
    j2 = floor(x2 / width)
    i1 = floor(y1 / height)
    i2 = floor(y2 / height)

    return level, {(i1, j1), (i1, j2), (i2, j1), (i2, j2)}


def bucketize(bboxes):
    """Partition bbox indices into lists of mutually disjoint bboxes.

    Favors speed over minimal bucket count: cell-set intersection instead
    of exact bbox intersection tests."""
    bucket_dict = defaultdict(list)

    for index, bbox in enumerate(bboxes):
        level, cells = calculate_level_and_cells(bbox)
        bucket_list = bucket_dict[level]
        for bucket in bucket_list:
            if cells in bucket:
                continue
            break
        else:
            bucket = Bucket()
            bucket_list.append(bucket)
        bucket.add(index=index, cells=cells)

    return [
        bucket.indices
        for bucket_list in bucket_dict.values()
        for bucket in bucket_list
    ]


def aggregate_polygons(
    geometries,
    values,
    no_data_value,
    agg_bbox,
    agg_srs,
    threshold_values,
    statistic,
    percentile,
):
    """Aggregate the raster inside each geometry (pixel-center coverage).

    Returns (agg array of shape (t, n_geometries), indices covering no cell).
    """
    agg_func = AggregateRaster.STATISTICS[statistic]["func"]
    if statistic == "percentile":
        agg_func = partial(agg_func, qval=percentile)

    if threshold_values is not None:
        threshold_values = np.concatenate(
            [threshold_values, np.array([np.nan], dtype=threshold_values.dtype)]
        )
    depth, height, width = values.shape
    geometries_no_cells = set()

    agg = np.full((depth, len(geometries)), np.nan, dtype="f4")
    for select in bucketize(geometries.bounds.values):
        rasterize_result = utils.rasterize_geoseries(
            geometries.iloc[select],
            agg_bbox,
            agg_srs,
            height,
            width,
            values=np.asarray(select, dtype=np.int32),
        )
        labels = rasterize_result["values"][0]
        unique_labels = set(
            np.unique(labels[labels != rasterize_result["no_data_value"]]).tolist()
        )
        geometries_no_cells |= set(select) - unique_labels
        if not unique_labels:
            continue

        if threshold_values is not None:
            # mode="clip" maps unlabeled cells onto the appended NaN
            thresholds = np.take(threshold_values, labels, mode="clip")
        else:
            thresholds = None

        use_device = config.get("geomodeling.aggregate-device", False) and (
            statistic in ("sum", "count", "mean", "min", "max", "median",
                          "percentile")
        )
        for frame_no, frame in enumerate(values):
            active = frame != no_data_value
            if threshold_values is not None:
                valid = ~np.isnan(thresholds)
                active[~valid] = False
                active[valid] &= frame[valid] >= thresholds[valid]
            # only labeled cells participate
            active &= labels != rasterize_result["no_data_value"]

            if not active.any():
                continue

            if use_device:
                from dask_geomodeling_tpu.ops.segment import (
                    labeled_percentile_jax,
                    labeled_statistic_jax,
                )

                if statistic in ("median", "percentile"):
                    q = 50.0 if statistic == "median" else percentile
                    per_label = np.asarray(
                        labeled_percentile_jax(
                            frame, labels, active, len(geometries), q
                        )
                    )
                else:
                    per_label = np.asarray(
                        labeled_statistic_jax(
                            frame,
                            np.where(active, labels, 0),
                            active,
                            len(geometries),
                            statistic,
                        )
                    )
                found = ~np.isnan(per_label)
                idx = [i for i in select if found[i]]
                agg[frame_no][idx] = per_label[idx]
                continue

            active_labels = labels[active]
            select_and_active = list(set(np.unique(active_labels)) & set(select))
            if not select_and_active:
                continue

            agg[frame_no][select_and_active] = agg_func(
                1 if statistic == "count" else frame[active],
                labels=active_labels,
                index=select_and_active,
            )
    return agg, list(geometries_no_cells)


def aggregate_points(points, values, no_data_value, agg_bbox, threshold_values, statistic):
    """Aggregate by sampling the raster at point coordinates."""
    _, height, width = values.shape
    gt = utils.GeoTransform.from_bbox(agg_bbox, height, width)
    i_y, i_x = gt.get_indices(np.array([points.x.values, points.y.values]).T)
    point_values = values[
        :, np.clip(i_y, 0, height - 1), np.clip(i_x, 0, width - 1)
    ]

    active = point_values != no_data_value
    if threshold_values is not None:
        threshold_values = threshold_values[np.newaxis, :]
        valid = ~np.isnan(threshold_values)
        active[~valid.repeat(len(active), axis=0)] = False
        active[valid.repeat(len(active), axis=0)] &= (
            point_values[valid.repeat(len(active), axis=0)]
            >= np.broadcast_to(threshold_values, point_values.shape)[
                valid.repeat(len(active), axis=0)
            ]
        )

    agg = point_values.astype("f4")
    agg[~active] = np.nan
    if statistic == "count":
        agg[active] = 1.0
    return agg


class AggregateRaster(GeometryBlock):
    """Compute a per-feature statistic of a raster (zonal statistics).

    Args:
      source (GeometryBlock): features to aggregate in
      raster (RasterBlock): raster to sample
      statistic (str): sum count min max mean median p<percentile>
      projection (str): aggregation projection (default: raster native)
      pixel_size (float): aggregation cell size (default: raster native)
      max_pixels (int): pixel budget (default geomodeling.raster-limit)
      column_name (str): output column (default "agg")
      auto_pixel_size (bool): coarsen automatically when over budget
    """

    STATISTICS = {
        "sum": {"func": ndimage.sum, "extensive": True},
        "count": {"func": ndimage.sum, "extensive": True},
        "min": {"func": ndimage.minimum, "extensive": False},
        "max": {"func": ndimage.maximum, "extensive": False},
        "mean": {"func": ndimage.mean, "extensive": False},
        "median": {"func": ndimage.median, "extensive": False},
        "percentile": {"func": measurements.percentile, "extensive": False},
    }

    def __init__(
        self,
        source,
        raster,
        statistic="sum",
        projection=None,
        pixel_size=None,
        max_pixels=None,
        column_name="agg",
        auto_pixel_size=False,
        *args
    ):
        if not isinstance(source, GeometryBlock):
            raise TypeError("'{}' object is not allowed".format(type(source)))
        if not isinstance(raster, RasterBlock):
            raise TypeError("'{}' object is not allowed".format(type(raster)))
        if not isinstance(statistic, str):
            raise TypeError("'{}' object is not allowed".format(type(statistic)))
        statistic, percentile = utils.parse_percentile_statistic(statistic.lower())
        if percentile:
            statistic = "p{0}".format(percentile)
        elif statistic not in self.STATISTICS or statistic == "percentile":
            raise ValueError("Unknown statistic '{}'".format(statistic))

        if projection is None:
            projection = raster.projection
        if not isinstance(projection, str):
            raise TypeError("'{}' object is not allowed".format(type(projection)))
        if pixel_size is None:
            geo_transform = raster.geo_transform
            if geo_transform is None:
                raise ValueError(
                    "Cannot get the pixel_size from the source "
                    "raster. Please provide a pixel_size."
                )
            pixel_size = min(
                abs(float(geo_transform[1])), abs(float(geo_transform[5]))
            )
        else:
            pixel_size = abs(float(pixel_size))
        if pixel_size == 0.0:
            raise ValueError("Pixel size cannot be 0")
        if max_pixels is not None:
            max_pixels = int(max_pixels)
        if not isinstance(auto_pixel_size, bool):
            raise TypeError("'{}' object is not allowed".format(type(auto_pixel_size)))

        super().__init__(
            source,
            raster,
            statistic,
            projection,
            pixel_size,
            max_pixels,
            column_name,
            auto_pixel_size,
            *args
        )

    source = property(lambda self: self.args[0])
    raster = property(lambda self: self.args[1])
    statistic = property(lambda self: self.args[2])
    projection = property(lambda self: self.args[3])
    pixel_size = property(lambda self: self.args[4])
    max_pixels = property(lambda self: self.args[5])
    column_name = property(lambda self: self.args[6])
    auto_pixel_size = property(lambda self: self.args[7])

    @property
    def columns(self):
        return self.source.columns | {self.column_name}

    def get_sources_and_requests(self, **request):
        if request.get("mode") == "extent":
            return [(self.source, request), (None, None), ({"mode": "extent"}, None)]

        req_srs = request["projection"]
        agg_srs = self.projection

        # pre-flight: the extent of the geometry data scopes the raster
        extent_request = {**request, "mode": "extent"}
        extent = self.source.get_data(**extent_request)["extent"]

        if extent is None:
            return [
                (None, None),
                (None, None),
                ({"empty": True, "projection": req_srs}, None),
            ]

        x1, y1, x2, y2 = utils.Extent(extent, req_srs).transformed(agg_srs).bbox

        required_pixels = int(((x2 - x1) * (y2 - y1)) / (self.pixel_size**2))

        max_pixels = self.max_pixels
        if max_pixels is None:
            max_pixels = config.get("geomodeling.raster-limit")
        pixel_size = self.pixel_size

        if required_pixels > max_pixels and self.auto_pixel_size:
            # coarsen by integer multiples of the pixel size
            pixel_size *= ceil(sqrt(required_pixels / max_pixels))
        elif required_pixels > max_pixels:
            raise RuntimeError(
                "The required raster size for the aggregation exceeded "
                "the maximum ({} > {})".format(required_pixels, max_pixels)
            )

        # snap the grid to (0, 0) to prevent subpixel shifts
        x1 = floor(x1 / pixel_size) * pixel_size
        y1 = floor(y1 / pixel_size) * pixel_size
        x2 = ceil(x2 / pixel_size) * pixel_size
        y2 = ceil(y2 / pixel_size) * pixel_size

        width = max(int((x2 - x1) / pixel_size), 1)
        height = max(int((y2 - y1) / pixel_size), 1)

        # single-cell requests become true point requests (no edge effects)
        if width == 1 and height == 1:
            raster_req_bbox = ((x1 + x2) / 2, (y1 + y2) / 2) * 2
        else:
            raster_req_bbox = (x1, y1, x2, y2)

        raster_request = {
            "mode": "vals",
            "projection": agg_srs,
            "start": request.get("start"),
            "stop": request.get("stop"),
            "bbox": raster_req_bbox,
            "width": width,
            "height": height,
        }
        if "time_resolution" in request:
            raster_request["time_resolution"] = request["time_resolution"]

        process_kwargs = {
            "mode": request.get("mode", "intersects"),
            "pixel_size": self.pixel_size,
            "agg_srs": agg_srs,
            "req_srs": req_srs,
            "actual_pixel_size": pixel_size,
            "statistic": self.statistic,
            "result_column": self.column_name,
            "agg_bbox": (x1, y1, x2, y2),
        }

        return [
            (self.source, request),
            (self.raster, raster_request),
            (process_kwargs, None),
        ]

    @staticmethod
    def process(geom_data, raster_data, process_kwargs):
        if process_kwargs.get("empty"):
            return {
                "features": GeoDataFrame([]),
                "projection": process_kwargs["projection"],
            }
        if process_kwargs["mode"] == "extent":
            return geom_data

        features = geom_data["features"]
        if len(features) == 0:
            return geom_data

        result = features.copy()

        req_srs = process_kwargs["req_srs"]
        agg_srs = process_kwargs["agg_srs"]

        geometry = features.geometry
        geometry.crs = req_srs
        agg_geometries = geometry.to_crs(agg_srs)

        statistic, percentile = utils.parse_percentile_statistic(
            process_kwargs["statistic"]
        )
        extensive = AggregateRaster.STATISTICS[statistic]["extensive"]
        result_column = process_kwargs["result_column"]

        threshold_name = process_kwargs.get("threshold_name")
        if threshold_name:
            threshold_values = features[threshold_name].values.astype("f4")
        else:
            threshold_values = None

        agg_bbox = process_kwargs["agg_bbox"]
        if raster_data is None:
            values = no_data_value = None
        else:
            values = raster_data["values"]
            no_data_value = raster_data["no_data_value"]
        if values is None or np.all(values == no_data_value):
            result[result_column] = 0 if extensive else np.nan
            return {"features": result, "projection": req_srs}

        pixel_size = process_kwargs["pixel_size"]
        actual_pixel_size = process_kwargs["actual_pixel_size"]

        agg, geometries_no_cells = aggregate_polygons(
            agg_geometries,
            values,
            no_data_value,
            agg_bbox,
            agg_srs,
            threshold_values,
            statistic,
            percentile,
        )

        if geometries_no_cells:
            # cell-less features: sample the raster at their centroid
            agg[:, geometries_no_cells] = aggregate_points(
                agg_geometries.iloc[geometries_no_cells].centroid,
                values,
                no_data_value,
                agg_bbox,
                None
                if threshold_values is None
                else threshold_values[geometries_no_cells],
                statistic,
            )

        if extensive:  # sum and count scale with the cell area
            agg[~np.isfinite(agg)] = 0
            if actual_pixel_size != pixel_size:
                agg *= (actual_pixel_size / pixel_size) ** 2
        else:
            agg[~np.isfinite(agg)] = np.nan

        if values.shape[0] == 1:
            result[result_column] = agg[0]
        else:
            # multiband: store the per-feature time series as a list cell
            result[result_column] = [[x] for x in agg.T]

        return {"features": result, "projection": req_srs}


class AggregateRasterAboveThreshold(AggregateRaster):
    """AggregateRaster with a per-feature threshold column: only raster
    values >= the feature's threshold are aggregated."""

    def __init__(
        self,
        source,
        raster,
        statistic="sum",
        projection=None,
        pixel_size=None,
        max_pixels=None,
        column_name="agg",
        auto_pixel_size=False,
        threshold_name=None,
    ):
        if not isinstance(threshold_name, str):
            raise TypeError("'{}' object is not allowed".format(type(threshold_name)))
        if threshold_name not in source.columns:
            raise KeyError("Column '{}' is not available".format(threshold_name))
        super().__init__(
            source,
            raster,
            statistic,
            projection,
            pixel_size,
            max_pixels,
            column_name,
            auto_pixel_size,
            threshold_name,
        )

    threshold_name = property(lambda self: self.args[8])

    def get_sources_and_requests(self, **request):
        src_and_req = super().get_sources_and_requests(**request)
        process_kwargs = src_and_req[2][0]
        process_kwargs["threshold_name"] = self.threshold_name
        return src_and_req
