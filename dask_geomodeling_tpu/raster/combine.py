"""Raster combination: Group.

Semantics match the reference (dask_geomodeling/raster/combine.py): greedy
attributes (period/extent are unions), relevant-source selection by period
overlap with a closest-store fallback, and two merge strategies — by_bands
when all sources share an aligned timedelta (slice assignment into the
result stack), by_time otherwise (extra mode='time' subrequests map source
frames onto the unified time axis).
"""
import itertools
from datetime import timedelta as Timedelta

import numpy as np

from dask_geomodeling_tpu.geo import (
    get_index_jax,
    Extent,
    GeoTransform,
    filter_none,
    get_dtype_max,
    get_index,
)
from dask_geomodeling_tpu.raster.base import RasterBlock

__all__ = ["Group"]


class BaseCombine(RasterBlock):
    """Base for blocks combining rasters into a larger one (greedy
    attributes; rasters without data are ignored)."""

    def __init__(self, *args):
        for arg in args:
            if not isinstance(arg, RasterBlock):
                raise TypeError("'{}' object is not allowed".format(type(arg)))
        super().__init__(*args)

    @staticmethod
    def get_aligned_timedelta(sources):
        """The common timedelta if all sources are aligned, else None."""
        timedeltas = []
        periods = []
        for arg in sources:
            timedelta, period = arg.timedelta, arg.period
            if period is not None and timedelta is not None:
                timedeltas.append(timedelta)
                periods.append(period)

        if len(timedeltas) == 0:
            return None
        if len(timedeltas) == 1:
            return timedeltas[0]

        if not timedeltas[1:] == timedeltas[:-1]:
            return None
        # periods must be an integer number of timedeltas apart
        timedelta_sec = timedeltas[0].total_seconds()
        first, _ = periods[0]
        for a, _ in periods[1:]:
            if (first - a).total_seconds() % timedelta_sec != 0:
                return None
        return timedeltas[0]

    @property
    def timedelta(self):
        return self.get_aligned_timedelta(self.args)

    @property
    def temporal(self):
        return any(x.temporal for x in self.args)

    @property
    def period(self):
        periods = filter_none([x.period for x in self.args])
        if len(periods) == 0:
            return None
        if len(periods) == 1:
            return periods[0]
        return min(p[0] for p in periods), max(p[1] for p in periods)

    @property
    def extent(self):
        extents = filter_none([x.extent for x in self.args])
        if len(extents) == 0:
            return None
        if len(extents) == 1:
            return extents[0]
        x1 = min(e[0] for e in extents)
        y1 = min(e[1] for e in extents)
        x2 = max(e[2] for e in extents)
        y2 = max(e[3] for e in extents)
        return x1, y1, x2, y2

    @property
    def dtype(self):
        return np.result_type(*self.args)

    @property
    def fillvalue(self):
        return get_dtype_max(self.dtype)

    @property
    def geometry(self):
        geometries = filter_none([x.geometry for x in self.args])
        if len(geometries) == 0:
            return None
        if len(geometries) == 1:
            return geometries[0]
        extent = Extent.from_geometry(geometries[0])
        for geometry in geometries[1:]:
            extent = extent.union(Extent.from_geometry(geometry))
        return extent.as_geometry()

    @property
    def projection(self):
        projection = self.args[0].projection
        if projection is None:
            return None
        for arg in self.args[1:]:
            if projection != arg.projection:
                return None
        return projection

    @property
    def geo_transform(self):
        geo_transform = self.args[0].geo_transform
        if geo_transform is None:
            return None
        geo_transform = GeoTransform(geo_transform)
        for arg in self.args[1:]:
            other = arg.geo_transform
            if other is None or not geo_transform.aligns_with(other):
                return None
        return geo_transform


def _snap_window_to_grid(start, stop, period, td_sec):
    """Clamp [start, stop] to ``period`` and snap both ends onto the
    equidistant frame grid anchored at the period origin (start rounds up
    to the next frame, stop rounds down to the previous one)."""
    origin, period_end = period
    if start is None:
        start = period_end
    elif start < origin:
        start = origin
    else:
        remainder = (origin - start).total_seconds() % td_sec
        start += Timedelta(seconds=remainder)
    if stop is None:
        stop = start
    elif stop > period_end:
        stop = period_end
    else:
        remainder = (stop - origin).total_seconds() % td_sec
        stop -= Timedelta(seconds=remainder)
    return start, stop


class Group(BaseCombine):
    """Combine rasters along x, y and time; rightmost raster wins where
    multiple have data at the same timestep."""

    def get_relevant_sources(self, start, stop):
        """Sources whose period is relevant for [start, stop]."""
        stores = [s for s in self.args if s.period is not None]
        if not stores:
            return []

        starts, stops = zip(*(s.period for s in stores))

        if start is None:
            last = max(stops)
            return [s for b, s in zip(stops, stores) if b == last]

        if stop is None:
            zipped = zip(starts, stops, stores)
            result = [s for a, b, s in zipped if a <= start <= b]
            if result:
                return result
            # no store contains start: take the closest one(s)
            closest = min(starts + stops, key=lambda d: abs(d - start))
            zipped = zip(stops + starts, stores + stores)
            return [s for d, s in zipped if d == closest]

        zipped = zip(starts, stops, stores)
        return [s for a, b, s in zipped if not (stop < a or start > b)]

    def get_sources_and_requests(self, **request):
        start = request.get("start", None)
        stop = request.get("stop", None)
        mode = request["mode"]

        if self.period is None:
            return [(dict(combine_mode="simple"), None)]

        if (
            start is not None
            and stop is not None
            and (start > self.period[1] or stop < self.period[0])
        ):
            return [(dict(combine_mode="simple"), None)]

        timedelta = self.timedelta
        if timedelta is None:  # merge by time
            sources = self.get_relevant_sources(start, stop)
            if not sources:
                return [(dict(combine_mode="simple"), None)]
            requests = []
            time_requests = []
            for source in sources:
                requests.append((source, request))
                if mode != "time":
                    time_request = dict(mode="time", start=start, stop=stop)
                    time_requests.append((source, time_request))

            process_kwargs = dict(
                combine_mode="by_time", mode=mode, start=start, stop=stop
            )
            requests = requests + time_requests
        else:  # merge by bands
            td_sec = timedelta.total_seconds()
            period = self.period
            start, stop = _snap_window_to_grid(start, stop, period, td_sec)

            if mode == "time":
                return [
                    (
                        dict(
                            combine_mode="by_bands",
                            mode=mode,
                            start=start,
                            stop=stop,
                            timedelta=timedelta,
                        ),
                        None,
                    )
                ]

            requests, bands = [], []
            for source in self.get_relevant_sources(start, stop):
                window = (
                    max(start, source.period[0]),
                    min(stop, source.period[1]),
                )
                lo, hi = (
                    int((edge - start).total_seconds() // td_sec)
                    for edge in window
                )
                bands.append((lo, hi + 1))
                requests.append(
                    (source, dict(request, start=window[0], stop=window[1]))
                )
            process_kwargs = dict(combine_mode="by_bands", mode=mode, bands=bands)
            nbands = int((stop - start).total_seconds() // td_sec) + 1
            if mode == "meta":
                process_kwargs["nbands"] = nbands
            if mode == "vals":
                process_kwargs["shape"] = (
                    nbands,
                    request["height"],
                    request["width"],
                )
        if mode == "vals":
            process_kwargs["dtype"] = self.dtype
        return [(process_kwargs, None)] + requests

    @staticmethod
    def _unique_times(multi):
        times = filter_none([data.get("time", None) for data in multi])
        return sorted(set(itertools.chain(*times)))

    @staticmethod
    def _nearest_index(time, start):
        if start is None:
            return len(time) - 1
        return min(enumerate(time), key=lambda d: abs(d[1] - start))[0]

    @staticmethod
    def _merge_vals_by_time(multi, times, kwargs):
        sorted_times = Group._unique_times(times)
        bands = {y: x for x, y in enumerate(sorted_times)}
        fillvalue = get_dtype_max(kwargs["dtype"])

        shape = (len(sorted_times),) + multi[0]["values"].shape[1:]
        values = np.full(shape, fillvalue, dtype=kwargs["dtype"])

        for data, time in zip(multi, times):
            for source_index, datetime in enumerate(time["time"]):
                source_band = data["values"][source_index]
                index = get_index(source_band, data["no_data_value"])
                target_band = values[bands[datetime]]
                target_band[index] = source_band[index]

        start, stop = kwargs["start"], kwargs["stop"]
        if stop is None and len(sorted_times) > 1:
            index = Group._nearest_index(sorted_times, start)
            values = values[index : index + 1]

        return {"values": values, "no_data_value": fillvalue}

    @staticmethod
    def _merge_meta_by_time(multi, times, kwargs):
        sorted_times = Group._unique_times(times)
        bands = {y: x for x, y in enumerate(sorted_times)}
        meta_result = [None] * len(sorted_times)

        for data, time in zip(multi, times):
            for source_index, datetime in enumerate(time["time"]):
                meta_result[bands[datetime]] = data["meta"][source_index]

        start, stop = kwargs["start"], kwargs["stop"]
        if stop is None and len(sorted_times) > 1:
            index = Group._nearest_index(sorted_times, start)
            meta_result = meta_result[index : index + 1]

        return {"meta": meta_result}

    @staticmethod
    def _merge_vals_by_bands(multi, bands, dtype, shape):
        fillvalue = get_dtype_max(dtype)
        values = np.full(shape, fillvalue, dtype=dtype)
        for data, (a, b) in zip(multi, bands):
            index = get_index(data["values"], data["no_data_value"])
            values[a:b][index] = data["values"][index]
        return {"values": values, "no_data_value": fillvalue}

    @staticmethod
    def _merge_meta_by_bands(multi, bands, nbands):
        meta_result = [""] * nbands
        for data, (a, b) in zip(multi, bands):
            for i, meta in zip(range(a, b), data["meta"]):
                if meta:
                    meta_result[i] = meta
        return {"meta": meta_result}

    @staticmethod
    def _merge_vals_by_bands_jax(multi, bands, dtype, shape):
        import jax.numpy as jnp

        dtype = np.dtype(dtype)
        fillvalue = get_dtype_max(dtype)
        values = jnp.full(shape, dtype.type(fillvalue), dtype=dtype)
        for data, (a, b) in zip(multi, bands):
            src = data["values"]
            has_data = get_index_jax(src, data["no_data_value"])
            values = values.at[a:b].set(
                jnp.where(has_data, src.astype(dtype), values[a:b])
            )
        return {"values": values, "no_data_value": fillvalue}

    @staticmethod
    def _merge_vals_by_time_jax(multi, times, kwargs):
        import jax.numpy as jnp

        sorted_times = Group._unique_times(times)
        band_of = {t: i for i, t in enumerate(sorted_times)}
        dtype = np.dtype(kwargs["dtype"])
        fillvalue = get_dtype_max(dtype)

        shape = (len(sorted_times),) + multi[0]["values"].shape[1:]
        values = jnp.full(shape, dtype.type(fillvalue), dtype=dtype)
        for data, time in zip(multi, times):
            src = data["values"]
            has_data = get_index_jax(src, data["no_data_value"])
            for source_index, datetime in enumerate(time["time"]):
                target = band_of[datetime]
                values = values.at[target].set(
                    jnp.where(
                        has_data[source_index],
                        src[source_index].astype(dtype),
                        values[target],
                    )
                )

        start, stop = kwargs["start"], kwargs["stop"]
        if stop is None and len(sorted_times) > 1:
            index = Group._nearest_index(sorted_times, start)
            values = values[index : index + 1]
        return {"values": values, "no_data_value": fillvalue}

    @staticmethod
    def _process_jax(process_kwargs, *args):
        combine_mode = process_kwargs["combine_mode"]
        mode = process_kwargs.get("mode", None)
        if combine_mode == "by_bands" and mode == "vals":
            multi = []
            bands = []
            for data, _bands in zip(args, process_kwargs["bands"]):
                if data is None:
                    continue
                multi.append(data)
                bands.append(_bands)
            return Group._merge_vals_by_bands_jax(
                multi, bands, process_kwargs["dtype"], process_kwargs["shape"]
            )
        if combine_mode == "by_time" and mode == "vals":
            n = int(len(args) // 2)
            multi, times = filter_none(args[:n]), filter_none(args[n:])
            if len(multi) == 0:
                return None
            return Group._merge_vals_by_time_jax(multi, times, process_kwargs)
        # time/meta/simple modes carry no arrays: identical host logic
        return Group.process(process_kwargs, *args)

    @staticmethod
    def process(process_kwargs, *args):
        combine_mode = process_kwargs["combine_mode"]
        mode = process_kwargs.get("mode", None)
        if combine_mode == "simple":
            return None
        if combine_mode == "by_time" and mode == "time":
            sorted_times = Group._unique_times(args)
            start, stop = process_kwargs["start"], process_kwargs["stop"]
            if stop is None and len(sorted_times) > 1:
                index = Group._nearest_index(sorted_times, start)
                sorted_times = sorted_times[index : index + 1]
            return {"time": sorted_times}
        if combine_mode == "by_time" and mode in ("meta", "vals"):
            n = int(len(args) // 2)
            multi, times = filter_none(args[:n]), filter_none(args[n:])
            if len(multi) == 0:
                return None
            if mode == "vals":
                return Group._merge_vals_by_time(multi, times, process_kwargs)
            return Group._merge_meta_by_time(multi, times, process_kwargs)
        if combine_mode == "by_bands" and mode == "time":
            start = process_kwargs["start"]
            stop = process_kwargs["stop"]
            delta = process_kwargs["timedelta"]
            length = (stop - start).total_seconds() // delta.total_seconds()
            length = int(length) + 1
            return {"time": [start + i * delta for i in range(length)]}
        if combine_mode == "by_bands" and mode in ("meta", "vals"):
            multi = []
            bands = []
            for data, _bands in zip(args, process_kwargs["bands"]):
                if data is None:
                    continue
                multi.append(data)
                bands.append(_bands)
            if mode == "vals":
                return Group._merge_vals_by_bands(
                    multi=multi,
                    bands=bands,
                    dtype=process_kwargs["dtype"],
                    shape=process_kwargs["shape"],
                )
            return Group._merge_meta_by_bands(
                multi=multi, bands=bands, nbands=process_kwargs["nbands"]
            )
        raise ValueError("Unknown combine_mode / mode combination")


# device twin: by_bands/by_time vals merges run as fused masked selects
Group.process.jax_impl = Group._process_jax
