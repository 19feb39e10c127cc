"""Temporal raster blocks: Snap, Shift, TemporalSum, TemporalAggregate,
Cumulative, Resample.

Semantics match the reference (dask_geomodeling/raster/temporal.py): the
label/bin arithmetic is pandas-resample-faithful, timezone-aware, and runs
host-side during request planning (it is metadata-sized).  The per-bin
pixel reductions carry ``jax_impl`` twins: bin→frame index maps are static
at trace time, so the reductions run as segment reductions over the band
axis inside the fused XLA program.

Timezone handling uses stdlib zoneinfo (the reference uses pytz, which is
not in this environment; pandas accepts the IANA key strings either way).
"""
import warnings
from datetime import timedelta as Timedelta
from functools import partial
from zoneinfo import ZoneInfo

import numpy as np
import pandas as pd
from pandas.tseries.frequencies import to_offset

from dask_geomodeling_tpu.core import arg
from dask_geomodeling_tpu.geo import (
    dtype_for_statistic,
    find_neigbours,
    get_dtype_max,
    normalize_offset,
    offset_to_timedelta,
    parse_percentile_statistic,
)
from dask_geomodeling_tpu.raster.base import BaseSingle, RasterBlock
from dask_geomodeling_tpu.core.validate import expect_instance

__all__ = [
    "Snap",
    "Shift",
    "TemporalSum",
    "TemporalAggregate",
    "Cumulative",
    "Resample",
]

# frequencies whose labels sit at the END of the bin (pandas TimeGrouper)
RESAMPLING_END_TYPES = {"ME", "YE", "QE", "BME", "BYE", "BQE", "W", "M", "A", "Q"}

MICROSECOND = Timedelta(microseconds=1)


def _validate_timezone(timezone):
    """Return the canonical IANA key, validating it exists."""
    return str(ZoneInfo(timezone).key)


def _snap_process(process_kwargs, data=None):
    """Re-index the store's frames onto the index raster's time axis;
    one shared body serves host and device (a band-axis gather traces
    fine under jnp).  Reference: dask_geomodeling/raster/temporal.py
    (Snap.process)."""
    if process_kwargs is None or data is None:
        return data
    picks = np.asarray(process_kwargs["nearest"])
    if "values" in data:
        return {
            "values": data["values"][picks],
            "no_data_value": data["no_data_value"],
        }
    if "meta" in data:
        meta = data["meta"]
        return {"meta": [meta[i] for i in picks]}
    return data


_snap_process.jax_impl = _snap_process


class Snap(BaseSingle):
    """Take cell values from 'store' with the time structure of 'index'.

    Spatial attributes delegate to the store (BaseSingle); the temporal
    ones — period, timedelta, temporal, length — come from the index.
    During planning this block queries the time structure of both inputs
    (nested host-side get_data, reference temporal.py:131)."""

    def __init__(self, store, index):
        expect_instance(index, RasterBlock, "index")
        super().__init__(store, index)

    index = arg(1)

    def __len__(self):
        return len(self.index)

    def out_value_set(self):
        # snapping re-labels frames in time; cell values pass through
        child = self.store.out_value_set()
        if child is None:
            return None
        return child | {self.fillvalue}

    @property
    def period(self):
        return self.index.period if self.store else None

    @property
    def timedelta(self):
        return self.index.timedelta

    @property
    def temporal(self):
        return self.index.temporal

    def get_sources_and_requests(self, **request):
        store_period = self.store.period
        index_period = self.index.period

        if store_period is None or index_period is None:
            return [(None, None)]

        if request["mode"] == "time":
            return [(None, None), (self.index, request)]

        start = request.get("start")
        stop = request.get("stop")
        index_result = self.index.get_data(mode="time", start=start, stop=stop)
        if index_result is None:
            return [(None, None)]
        index_time = index_result["time"]

        if stop is None:
            request["start"] = index_time[0]
            return [(None, None), (self.store, request)]

        if store_period[0] == store_period[1]:
            store_time = [store_period[0]]
        else:
            # time structure near start, inside the interval, and near stop:
            # result frames may snap to store frames outside [start, stop]
            store_time = _probe_time_union(
                self.store, (start, None), (start, stop), (stop, None)
            )

        request["start"] = store_time[0]
        request["stop"] = store_time[-1]
        nearest = find_neigbours(store_time, index_time)
        process_kwargs = {"nearest": nearest.tolist()}
        return [(process_kwargs, None), (self.store, request)]

    process = staticmethod(_snap_process)


def _shift_process(data, time):
    if data is None:
        return None
    if "time" in data:
        return {"time": [t + time for t in data["time"]]}
    return data


_shift_process.jax_impl = _shift_process


class Shift(BaseSingle):
    """Shift a temporal raster by a timedelta (positive = into the future).

    Args:
      store (RasterBlock): raster to shift
      time (int or timedelta): shift in milliseconds
    """

    def __init__(self, store, time):
        if isinstance(time, Timedelta):
            time = int(time.total_seconds() * 1000)
        expect_instance(time, int, "time")
        super().__init__(store, time)

    @property
    def time(self):
        return Timedelta(milliseconds=self.args[1])

    def out_value_set(self):
        # a pure time shift: cell values pass through untouched
        return self.store.out_value_set()

    @property
    def period(self):
        period = self.store.period
        if period is None:
            return None
        return period[0] + self.time, period[1] + self.time

    def get_sources_and_requests(self, **request):
        start = request.get("start", None)
        stop = request.get("stop", None)
        if start is not None:
            request["start"] = start - self.time
        if stop is not None:
            request["stop"] = stop - self.time
        return [(self.store, request), (self.time, None)]

    process = staticmethod(_shift_process)


def _temporal_sum_process(data):
    """Collapse the band axis with a plain sum, labelled by the LAST
    frame (time and meta keep only their final entry).  No nodata
    handling by design — TemporalAggregate is the nodata-aware variant.
    Reference: dask_geomodeling/raster/temporal.py (TemporalSum)."""
    if data is None:
        return None
    for key in ("time", "meta"):
        if key in data:
            return {key: data[key][-1:]}
    if "values" not in data:
        return data
    return {
        "values": data["values"].sum(axis=0, keepdims=True),
        "no_data_value": data["no_data_value"],
    }


_temporal_sum_process.jax_impl = _temporal_sum_process


class TemporalSum(BaseSingle):
    """Sum all frames into a single band (no nodata handling; see
    TemporalAggregate for the nodata-aware variant)."""

    process = staticmethod(_temporal_sum_process)


# --- pandas label/bin helpers (host-side metadata math) ---


def _dt_to_ts(dt, timezone):
    """Naive-UTC datetime -> tz-aware pandas Timestamp."""
    return pd.Timestamp(dt, tz="UTC").tz_convert(timezone)


def _ts_to_dt(timestamp, timezone):
    """Pandas timestamp -> naive-UTC python datetime."""
    try:
        timestamp = timestamp.tz_localize(timezone)
    except TypeError:
        pass
    return timestamp.tz_convert("UTC").tz_localize(None).to_pydatetime(warn=False)


def _get_bin_label(dt, frequency, closed, label, timezone):
    """The label of the resampling bin that ``dt`` falls in."""
    series = pd.Series([0], index=[_dt_to_ts(dt, timezone)])
    for label_ts, bin_ in series.resample(frequency, closed=closed, label=label):
        if len(bin_) != 0:
            break
    return _ts_to_dt(label_ts, timezone)


def _get_bin_start(dt, frequency, closed, label, timezone):
    """The (left) start of the bin ``dt`` falls in, as a Timestamp."""
    series = pd.Series([0], index=[_dt_to_ts(dt, timezone)])
    resampled = series.resample(frequency, closed=closed, label="left")
    return resampled.first().index[0]


def _shift_datetime(dt, frequency, timezone, n):
    """Shift a naive datetime ``n`` frequency steps; fractions interpolate."""
    if n == 0:
        return dt
    step = to_offset(frequency)
    anchor = _dt_to_ts(dt, timezone)
    if not isinstance(n, float):
        return _ts_to_dt(anchor + n * step, timezone)
    # Non-fixed offsets (e.g. months) have no scalar "0.4 of a step":
    # measure the actual span of the step the shift lands in and
    # linearly interpolate inside it.
    whole = int(n // 1.0)
    lo = anchor + whole * step
    span = (anchor + (whole + 1) * step) - lo
    frac = n % 1.0 if n > 0 else -(n % 1.0)
    return _ts_to_dt(lo + span * frac, timezone)


def _get_closest_label(dt, frequency, timezone, side="both"):
    """The resampling label nearest ``dt``; ``side`` restricts direction."""
    ts = _dt_to_ts(dt, timezone)
    step = to_offset(frequency)
    seed = _dt_to_ts(
        _get_bin_label(dt, frequency, "left", "left", timezone), timezone
    )
    zero = pd.Timedelta(0)
    best = None
    # the nearest label is the seed or one of its direct neighbours
    for labelled in (seed - step, seed, seed + step):
        offset = labelled - ts
        if (side == "right" and offset < zero) or (
            side == "left" and offset > zero
        ):
            continue
        if best is None or abs(offset) < abs(best - ts):
            best = labelled
    return _ts_to_dt(best, timezone)


def _validate_resampling(statistic, allowed, frequency, closed, label, timezone):
    """Shared constructor validation for the resampling blocks; returns
    the normalized (statistic, frequency, closed, label, timezone)."""
    if frequency is not None:
        expect_instance(frequency, str, "frequency")
        frequency = normalize_offset(frequency)
        if closed not in {None, "left", "right"}:
            raise ValueError("closed must be None, 'left', or 'right'.")
        if label not in {None, "left", "right"}:
            raise ValueError("label must be None, 'left', or 'right'.")
        expect_instance(timezone, str, "timezone")
        timezone = _validate_timezone(timezone)
    else:
        closed = label = timezone = None
    expect_instance(statistic, str, "statistic")
    statistic, percentile = parse_percentile_statistic(statistic.lower())
    if percentile is not None:
        statistic = "p{0}".format(percentile)
    elif statistic not in allowed:
        raise ValueError("Unknown statistic '{}'".format(statistic))
    return statistic, frequency, closed, label, timezone


def _bin_conventions(frequency, closed, label, timezone):
    """The keyword set every label/bin helper consumes."""
    closed, label = _default_closed_label(frequency, closed, label)
    return {
        "frequency": frequency,
        "closed": closed,
        "label": label,
        "timezone": timezone,
    }


def _default_closed_label(frequency, closed, label):
    """Fill in pandas' frequency-dependent defaults for closed/label:
    end-anchored rules (month/quarter/year ends, weekly — with or
    without an anchor suffix like ``W-SUN``) default to the right bin
    edge, every other rule to the left."""
    if frequency is None:
        return "right", "right"
    rule = to_offset(frequency).rule_code.split("-", 1)[0]
    edge = "right" if rule in RESAMPLING_END_TYPES else "left"
    return closed or edge, label or edge


def _bin_bounds(dt, frequency, closed, label, timezone, side):
    """One bound of the bin labeled ``dt``: the bin spans one frequency
    step anchored at its label (shifted when labels sit on the other
    edge), and the open edge is nudged by a microsecond per the pandas
    closed/label conventions."""
    ts = _dt_to_ts(dt, timezone)
    step, tick = to_offset(frequency), MICROSECOND
    # the far edge for each side, and which way the label shift points
    other, inward = ("right", False) if side == "start" else ("left", True)
    if label == other:
        ts = ts + step if inward else ts - step
    if closed == other:
        ts = ts - tick if inward else ts + tick
    return _ts_to_dt(ts, timezone)


def _label_to_bin_start(dt, frequency, closed, label, timezone):
    """First datetime belonging to the bin labeled ``dt``."""
    return _bin_bounds(dt, frequency, closed, label, timezone, "start")


def _label_to_bin_end(dt, frequency, closed, label, timezone):
    """Last datetime belonging to the bin labeled ``dt``."""
    return _bin_bounds(dt, frequency, closed, label, timezone, "end")


def _resampled_period(period, frequency, closed, label, timezone):
    """The (start, stop) label interval containing data after resampling."""
    if period is None:
        return None
    if frequency is None:
        return period[-1], period[-1]
    return tuple(
        _get_bin_label(x, frequency, closed, label, timezone) for x in period
    )


def _snap_to_resampled_labels(period, start, stop, frequency, timezone):
    """Clamp a requested [start, stop] window onto resampled bin labels.

    Returns ``(None, None)`` when the window misses the labelled period
    entirely; an instant request (``stop is None``) keeps ``stop`` None.
    """
    if period is None:
        return None, None
    first, last = period

    if stop is None:
        # instant request: the single nearest label (newest by default)
        at = last if start is None else min(max(start, first), last)
        if first < at < last:
            at = _get_closest_label(at, frequency, timezone, side="both")
        return at, None

    lo = last if start is None else start
    if lo > last or stop < first:
        return None, None
    if lo > first:
        lo = _get_closest_label(lo, frequency, timezone, side="right")
    else:
        lo = first
    hi = last
    if stop < last:
        hi = _get_closest_label(stop, frequency, timezone, side="left")
    if lo > hi:
        return None, None
    return lo, hi


def _labels_to_start_stop(start_label, stop_label, frequency, closed, label, timezone):
    """Source start/stop covering the bins of the given labels."""
    assert frequency is not None
    edges = ((start_label, "start"), (stop_label or start_label, "end"))
    return tuple(
        _bin_bounds(dt, frequency, closed, label, timezone, side)
        for dt, side in edges
    )


def _get_label_range(start_label, stop_label, frequency, timezone):
    """Every label from ``start_label`` through ``stop_label``, inclusive."""
    if stop_label is None:
        return [start_label]
    ticks = pd.date_range(_dt_to_ts(start_label, timezone),
                          _dt_to_ts(stop_label, timezone),
                          freq=to_offset(frequency))
    return [_ts_to_dt(tick, timezone) for tick in ticks]


def count_not_nan(x, *args, **kwargs):
    """Count of non-NaN values along an axis."""
    return np.sum(~np.isnan(x), *args, **kwargs)


def _probe_time_union(block, *windows):
    """Sorted union of a block's time structure over several windows."""
    instants = set()
    for start, stop in windows:
        result = block.get_data(mode="time", start=start, stop=stop)
        if result is not None:
            instants |= set(result["time"])
    return sorted(instants)


def _resolve_reducer(statistic_string, table):
    """(reducer, extensive) for a statistic name or p<percentile>."""
    statistic, percentile = parse_percentile_statistic(statistic_string)
    if percentile is not None:
        return partial(np.nanpercentile, q=percentile), False
    return table[statistic]["func"], table[statistic]["extensive"]


def _nan_masked_frames(data, expected_frames, dtype):
    """Float working copy of the pixel stack with NaN at nodata cells."""
    values = data["values"]
    if values.shape[0] != expected_frames:
        raise RuntimeError("Shape of raster does not match number of timestamps")
    out = values.astype(np.result_type(np.float32, dtype))
    out[values == data["no_data_value"]] = np.nan
    return out


class _StatisticDtypeMixin:
    """dtype/fillvalue derived from the source dtype and the statistic."""

    @property
    def dtype(self):
        return dtype_for_statistic(self.source.dtype, self.statistic)

    @property
    def fillvalue(self):
        return get_dtype_max(self.dtype)


def _aggregate_labels_and_indices(process_kwargs, time_data):
    """Shared host-side label/bin-index computation for TemporalAggregate."""
    start = process_kwargs["start"]
    stop = process_kwargs["stop"]
    frequency = process_kwargs["frequency"]
    if frequency is None:
        labels = pd.DatetimeIndex([start])
    else:
        labels = pd.date_range(start, stop or start, freq=frequency)
    if time_data is None:
        return labels, None

    timezone = process_kwargs["timezone"]
    times = time_data["time"]
    series = (
        pd.Series(index=times, dtype=float).tz_localize("UTC").tz_convert(timezone)
    )
    labels_tz = labels.tz_localize("UTC").tz_convert(timezone)
    if frequency is None:
        indices = {labels_tz[0]: range(len(times))}
    else:
        resampler = series.resample(
            frequency,
            closed=process_kwargs["closed"],
            label=process_kwargs["label"],
        )
        indices = resampler.indices
    return labels_tz, indices


def _aggregate_process(process_kwargs, time_data=None, data=None):
    mode = process_kwargs["mode"]
    if process_kwargs.get("empty"):
        return None if mode == "vals" else {mode: []}
    if mode == "time":
        labels, _ = _aggregate_labels_and_indices(process_kwargs, None)
        return {"time": labels.to_pydatetime().tolist()}

    if time_data is None or not time_data.get("time"):
        return None if mode == "vals" else {mode: []}

    labels, indices = _aggregate_labels_and_indices(process_kwargs, time_data)

    if mode == "meta":
        if data is None or "meta" not in data:
            return {"meta": []}
        meta = data["meta"]
        return {"meta": [[meta[i] for i in indices[ts]] for ts in labels]}

    if data is None or "values" not in data:
        return None

    agg_func, extensive = _resolve_reducer(
        process_kwargs["statistic"], TemporalAggregate.STATISTICS
    )
    dtype = process_kwargs["dtype"]
    fillvalue = 0 if extensive else get_dtype_max(dtype)
    values = _nan_masked_frames(data, len(time_data["time"]), dtype)

    result = np.full(
        shape=(len(labels), values.shape[1], values.shape[2]),
        fill_value=fillvalue,
        dtype=dtype,
    )

    for i, timestamp in enumerate(labels):
        inds = indices[timestamp]
        if len(inds) == 0:
            continue
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            aggregated = agg_func(values[inds], axis=0)
        no_data_mask = ~np.isfinite(aggregated)
        if dtype != aggregated.dtype:
            aggregated = aggregated.astype(dtype)
        aggregated[no_data_mask] = fillvalue
        result[i] = aggregated

    return {"values": result, "no_data_value": get_dtype_max(dtype)}


def _aggregate_jax(process_kwargs, time_data=None, data=None):
    """Device twin: the label/bin math is static (time_data is a static
    skeleton at trace time); per-bin reductions run on device."""
    import jax.numpy as jnp

    mode = process_kwargs["mode"]
    if process_kwargs.get("empty") or mode != "vals":
        return _aggregate_process(process_kwargs, time_data, data)
    if time_data is None or not time_data.get("time"):
        return None
    if data is None or "values" not in data:
        return None

    labels, indices = _aggregate_labels_and_indices(process_kwargs, time_data)

    statistic, percentile = parse_percentile_statistic(process_kwargs["statistic"])
    extensive = (
        False
        if percentile is not None
        else TemporalAggregate.STATISTICS[statistic]["extensive"]
    )
    dtype = np.dtype(process_kwargs["dtype"])
    fillvalue = 0 if extensive else get_dtype_max(dtype)

    float_dtype = np.result_type(np.float32, dtype)
    raw = data["values"]
    values = jnp.where(
        raw == data["no_data_value"], jnp.nan, raw.astype(float_dtype)
    )

    jnp_funcs = {
        "sum": jnp.nansum,
        "count": lambda x, axis: jnp.sum(~jnp.isnan(x), axis=axis),
        "min": jnp.nanmin,
        "max": jnp.nanmax,
        "mean": jnp.nanmean,
        "median": jnp.nanmedian,
        "std": jnp.nanstd,
        "var": jnp.nanvar,
    }
    if percentile is not None:
        agg_func = lambda x, axis: jnp.nanpercentile(x, percentile, axis=axis)
    else:
        agg_func = jnp_funcs[statistic]

    rows = []
    for timestamp in labels:
        inds = list(indices[timestamp])
        if len(inds) == 0:
            rows.append(
                jnp.full(values.shape[1:], dtype.type(fillvalue), dtype=dtype)
            )
            continue
        aggregated = agg_func(values[np.asarray(inds)], axis=0)
        no_data_mask = ~jnp.isfinite(aggregated)
        aggregated = aggregated.astype(dtype)
        rows.append(jnp.where(no_data_mask, dtype.type(fillvalue), aggregated))
    result = jnp.stack(rows)
    return {"values": result, "no_data_value": get_dtype_max(dtype)}


_aggregate_process.jax_impl = _aggregate_jax


class TemporalAggregate(_StatisticDtypeMixin, BaseSingle):
    """Aggregate a temporal raster into resampling bins.

    Args:
      source (RasterBlock): input raster
      frequency (str or None): pandas offset string; None aggregates the
        whole period into one frame
      statistic (str): sum count min max mean median std var p<percentile>
      closed, label (str or None): bin interval conventions (pandas)
      timezone (str): timezone the resampling is performed in
    """

    STATISTICS = {
        "sum": {"func": np.nansum, "extensive": True},
        "count": {"func": count_not_nan, "extensive": True},
        "min": {"func": np.nanmin, "extensive": False},
        "max": {"func": np.nanmax, "extensive": False},
        "mean": {"func": np.nanmean, "extensive": False},
        "median": {"func": np.nanmedian, "extensive": False},
        "std": {"func": np.nanstd, "extensive": False},
        "var": {"func": np.nanvar, "extensive": False},
    }

    def __init__(
        self,
        source,
        frequency,
        statistic="sum",
        closed=None,
        label=None,
        timezone="UTC",
    ):
        expect_instance(source, RasterBlock, "source")
        statistic, frequency, closed, label, timezone = _validate_resampling(
            statistic, self.STATISTICS, frequency, closed, label, timezone
        )
        super().__init__(source, frequency, statistic, closed, label, timezone)

    source = arg(0)
    statistic = arg(2)
    closed = arg(3)
    label = arg(4)
    timezone = arg(5)

    @property
    def frequency(self):
        return normalize_offset(self.args[1])

    @property
    def _snap_kwargs(self):
        return _bin_conventions(
            self.frequency, self.closed, self.label, self.timezone
        )

    @property
    def period(self):
        return _resampled_period(self.source.period, **self._snap_kwargs)

    @property
    def timedelta(self):
        if self.frequency is None:
            return None
        return offset_to_timedelta(self.frequency)

    @property
    def temporal(self):
        return self.frequency is not None

    def out_value_set(self):
        # min/max pick existing source values; they round-trip through
        # the float working dtype and the output cast, so emulate that
        # exact chain per member
        if self.statistic not in ("min", "max"):
            return None
        child = self.source.out_value_set()
        if child is None:
            return None
        dtype = np.dtype(self.dtype)
        float_dtype = np.result_type(np.float32, dtype)
        child_fill = self.source.fillvalue
        out = {get_dtype_max(dtype)}  # empty bins / all-nodata stacks
        for v in child:
            if child_fill is not None and v == child_fill:
                continue
            out.add(dtype.type(float_dtype.type(v)).item())
        return out

    def get_sources_and_requests(self, **request):
        mode = request["mode"]
        start_label, stop_label = _snap_to_resampled_labels(
            self.period,
            request.get("start"),
            request.get("stop"),
            frequency=self.frequency,
            timezone=self.timezone,
        )
        if start_label is None:
            return [({"empty": True, "mode": mode}, None)]

        conventions = self._snap_kwargs
        plan = dict(conventions, mode=mode, start=start_label, stop=stop_label)
        if mode == "time":
            return [(plan, None)]

        # the source window covering the labeled bins
        if self.frequency is None:
            window = self.source.period
        else:
            window = _labels_to_start_stop(start_label, stop_label, **conventions)
        request["start"], request["stop"] = window

        if mode == "vals":
            plan["dtype"] = np.dtype(self.dtype).str
            plan["statistic"] = self.statistic

        time_request = {"mode": "time", "start": window[0], "stop": window[1]}
        if "time_resolution" in request:
            time_request["time_resolution"] = request["time_resolution"]
        return [(plan, None), (self.source, time_request), (self.source, request)]

    process = staticmethod(_aggregate_process)


def accumulate_count_not_nan(x, *args, **kwargs):
    """Running count of non-NaN values along an axis."""
    return np.cumsum(~np.isnan(x), *args, **kwargs)


def _cumulative_process(process_kwargs, time_data=None, data=None):
    mode = process_kwargs["mode"]
    if process_kwargs.get("empty"):
        return None if mode == "vals" else {mode: []}
    if mode == "time":
        return time_data
    if time_data is None or not time_data.get("time"):
        return None if mode == "vals" else {mode: []}

    start = process_kwargs["start"]
    stop = process_kwargs["stop"]
    frequency = process_kwargs["frequency"]
    timezone = process_kwargs["timezone"]
    times = (
        pd.Series(index=time_data["time"], dtype=float)
        .tz_localize("UTC")
        .tz_convert(timezone)
    )

    if frequency is None:
        indices = {None: range(len(times))}
    else:
        resampler = times.resample(
            frequency,
            closed=process_kwargs["closed"],
            label=process_kwargs["label"],
        )
        indices = resampler.indices

    start_ts = _dt_to_ts(start, timezone)
    stop_ts = _dt_to_ts(stop, timezone)

    if mode == "meta":
        if data is None or "meta" not in data:
            return {"meta": []}
        meta = data["meta"]
        result = []
        for indices_in_bin in indices.values():
            for length in range(1, len(indices_in_bin) + 1):
                indices_for_cumulative = indices_in_bin[:length]
                ts = times.index[indices_for_cumulative[-1]]
                if ts < start_ts or (stop_ts is not None and ts > stop_ts):
                    continue
                result.append([meta[i] for i in indices_for_cumulative])
        return {"meta": result}

    if data is None or "values" not in data:
        return None

    agg_func, extensive = _resolve_reducer(
        process_kwargs["statistic"], Cumulative.STATISTICS
    )
    dtype = process_kwargs["dtype"]
    fillvalue = 0 if extensive else get_dtype_max(dtype)
    values = _nan_masked_frames(data, len(times), dtype)

    output_mask = (times.index >= start_ts) & (times.index <= stop_ts)
    output_offset = np.where(output_mask)[0][0]
    n_frames = output_mask.sum()
    result = np.full(
        shape=(n_frames, values.shape[1], values.shape[2]),
        fill_value=fillvalue,
        dtype=dtype,
    )

    for indices_in_bin in indices.values():
        mask = output_mask[np.asarray(indices_in_bin)]
        bin_data = values[np.asarray(indices_in_bin)]
        accumulated = agg_func(bin_data, axis=0)[mask]
        no_data_mask = ~np.isfinite(accumulated)
        if dtype != accumulated.dtype:
            accumulated = accumulated.astype(dtype)
        accumulated[no_data_mask] = fillvalue
        indices_in_result = np.asarray(indices_in_bin)[mask] - output_offset
        result[indices_in_result] = accumulated

    return {"values": result, "no_data_value": get_dtype_max(dtype)}


def _cumulative_jax_capable(process_kwargs, *args):
    if not isinstance(process_kwargs, dict):
        return False
    if process_kwargs.get("empty") or process_kwargs.get("mode") != "vals":
        return False
    statistic, percentile = parse_percentile_statistic(
        process_kwargs.get("statistic", "")
    )
    return percentile is None and statistic in ("sum", "count")


def _cumulative_jax(process_kwargs, time_data=None, data=None):
    """Device twin of :func:`_cumulative_process` for sum/count statistics.

    All bin/time logic runs host-side at trace time (``time_data`` is the
    result of a host time-mode node, so it is concrete); only the pixel
    accumulation traces into XLA as per-bin cumulative sums.
    """
    import jax.numpy as jnp

    if time_data is None or not time_data.get("time"):
        return None
    if data is None or "values" not in data:
        return None

    timezone = process_kwargs["timezone"]
    frequency = process_kwargs["frequency"]
    times = (
        pd.Series(index=time_data["time"], dtype=float)
        .tz_localize("UTC")
        .tz_convert(timezone)
    )
    if frequency is None:
        indices = {None: range(len(times))}
    else:
        indices = times.resample(
            frequency,
            closed=process_kwargs["closed"],
            label=process_kwargs["label"],
        ).indices

    start_ts = _dt_to_ts(process_kwargs["start"], timezone)
    stop_ts = _dt_to_ts(process_kwargs["stop"], timezone)

    values = data["values"]
    if values.shape[0] != len(times):
        raise RuntimeError("Shape of raster does not match number of timestamps")
    statistic = process_kwargs["statistic"]
    dtype = np.dtype(process_kwargs["dtype"])
    fillvalue = 0  # sum/count are extensive

    float_dtype = np.result_type(np.float32, dtype)
    fvals = values.astype(float_dtype)
    finite = fvals != float(data["no_data_value"])
    if np.dtype(values.dtype).kind == "f":
        finite = finite & ~jnp.isnan(fvals)

    output_mask = np.asarray((times.index >= start_ts) & (times.index <= stop_ts))
    output_offset = int(np.where(output_mask)[0][0])
    n_frames = int(output_mask.sum())
    result = jnp.full((n_frames,) + values.shape[1:], fillvalue, dtype)

    for indices_in_bin in indices.values():
        idx = np.asarray(indices_in_bin)
        mask = output_mask[idx]
        if not mask.any():
            continue
        if statistic == "count":
            acc = jnp.cumsum(finite[idx].astype(float_dtype), axis=0)
        else:
            acc = jnp.cumsum(
                jnp.where(finite[idx], fvals[idx], 0), axis=0
            )
        acc = acc[np.where(mask)[0]]
        acc = jnp.where(jnp.isfinite(acc), acc, fillvalue).astype(dtype)
        result = result.at[idx[mask] - output_offset].set(acc)

    return {"values": result, "no_data_value": get_dtype_max(dtype)}


_cumulative_process.jax_impl = _cumulative_jax
_cumulative_process.jax_capable = _cumulative_jax_capable


class Cumulative(_StatisticDtypeMixin, BaseSingle):
    """Accumulate cell values over time, resetting each frequency period.

    Args:
      source (RasterBlock): input raster
      statistic (str): "sum" or "count"
      frequency (str or None): reset period as pandas offset string
      timezone (str): timezone the period reset is computed in
    """

    STATISTICS = {
        "sum": {"func": np.nancumsum, "extensive": True},
        "count": {"func": accumulate_count_not_nan, "extensive": True},
    }

    def __init__(self, source, statistic="sum", frequency=None, timezone="UTC"):
        expect_instance(source, RasterBlock, "source")
        statistic, frequency, _, _, timezone = _validate_resampling(
            statistic, self.STATISTICS, frequency, "right", "right", timezone
        )
        super().__init__(source, statistic, frequency, timezone)

    source = arg(0)
    statistic = arg(1)
    timezone = arg(3)

    @property
    def frequency(self):
        return normalize_offset(self.args[2])

    @property
    def _snap_kwargs(self):
        return _bin_conventions(self.frequency, "right", "right", self.timezone)

    def get_sources_and_requests(self, **request):
        mode = request["mode"]
        if mode == "time":
            return [({"mode": "time"}, None), (self.source, request)]

        # nested host-side evaluation: the output times determine how far
        # back the accumulation must reach (reference temporal.py:875)
        time_data = self.source.get_data(
            mode="time", start=request.get("start"), stop=request.get("stop")
        )
        if time_data is None or not time_data.get("time"):
            return [({"empty": True, "mode": mode}, None)]
        first, last = time_data["time"][0], time_data["time"][-1]

        conventions = self._snap_kwargs
        if self.frequency is None:
            request["start"] = self.source.period[0]
            request["stop"] = last
        else:
            # reach back to the start of the bin containing the first frame
            request["start"] = _ts_to_dt(
                _get_bin_start(first, **conventions), self.timezone
            )
            request["stop"] = last
            if conventions["closed"] != "left":
                request["stop"] += MICROSECOND

        plan = dict(conventions, mode=mode, start=first, stop=last)
        if mode == "vals":
            plan["dtype"] = np.dtype(self.dtype).str
            plan["statistic"] = self.statistic

        time_request = {
            "mode": "time",
            "start": request["start"],
            "stop": request["stop"],
        }
        return [(plan, None), (self.source, time_request), (self.source, request)]

    process = staticmethod(_cumulative_process)


def _resample_process(process_kwargs, data=None):
    mode = process_kwargs["mode"]
    if process_kwargs.get("empty"):
        return None if mode == "vals" else {mode: []}
    if mode == "time":
        labels = _get_label_range(
            process_kwargs["start"],
            process_kwargs["stop"],
            frequency=process_kwargs["frequency"],
            timezone=process_kwargs["timezone"],
        )
        return {"time": labels}
    # vals/meta: re-index the source frames onto the labels
    return _snap_process({"nearest": process_kwargs["nearest"]}, data)


_resample_process.jax_impl = _resample_process


class Resample(BaseSingle):
    """Re-snap raster frames to a new time frequency.

    Args:
      source (RasterBlock): input raster
      frequency (str): pandas offset string to resample to
      direction (str): 'nearest', 'backward', or 'forward'
      timezone (str): timezone the label math is performed in
    """

    def __init__(self, source, frequency, direction="nearest", timezone="UTC"):
        expect_instance(source, RasterBlock, "source")
        expect_instance(frequency, str, "frequency")
        frequency = normalize_offset(frequency)
        expect_instance(timezone, str, "timezone")
        timezone = _validate_timezone(timezone)
        expect_instance(direction, str, "direction")
        if direction not in {"nearest", "backward", "forward"}:
            raise ValueError(
                "direction must be one of 'nearest', 'backward', or 'forward'."
            )
        super().__init__(source, frequency, direction, timezone)

    source = arg(0)
    direction = arg(2)
    timezone = arg(3)

    @property
    def frequency(self):
        return normalize_offset(self.args[1])

    def _label_kwargs(self):
        return {"frequency": self.frequency, "timezone": self.timezone}

    @property
    def period(self):
        """The (start, stop) label period of the resampled raster.

        Labels snap to source frames within one period of them; the edge
        labels are found by inverting that relation per direction (see the
        reference's derivation, temporal.py:1080-1125)."""
        source_period = self.source.period
        if source_period is None:
            return None
        kwargs = self._label_kwargs()
        if self.direction in {"forward", "backward"}:
            side = "left" if self.direction == "forward" else "right"
            return (
                _get_closest_label(source_period[0], side=side, **kwargs),
                _get_closest_label(source_period[1], side=side, **kwargs),
            )
        period_start = _get_closest_label(source_period[0], side="left", **kwargs)
        if source_period[0] >= _shift_datetime(period_start, n=0.5, **kwargs):
            period_start = _get_closest_label(
                source_period[0], side="right", **kwargs
            )
        period_end = _get_closest_label(source_period[1], side="right", **kwargs)
        if source_period[1] < _shift_datetime(period_end, n=-0.5, **kwargs):
            period_end = _get_closest_label(source_period[1], side="left", **kwargs)
        return (period_start, period_end)

    @property
    def timedelta(self):
        return offset_to_timedelta(self.frequency)

    def get_sources_and_requests(self, **request):
        process_kwargs = {
            "mode": request["mode"],
            "direction": self.direction,
            **self._label_kwargs(),
        }

        process_kwargs["start"], process_kwargs["stop"] = _snap_to_resampled_labels(
            self.period,
            request.get("start"),
            request.get("stop"),
            **self._label_kwargs(),
        )
        if process_kwargs["start"] is None:
            return [({"empty": True, "mode": process_kwargs["mode"]}, None)]

        if process_kwargs["mode"] == "time":
            return [(process_kwargs, None)]

        index_time = _get_label_range(
            process_kwargs["start"], process_kwargs["stop"], **self._label_kwargs()
        )
        if self.direction == "forward":
            shift = 0
        elif self.direction == "backward":
            shift = -1
        else:
            shift = -0.5
        index_start = _shift_datetime(
            process_kwargs["start"], n=shift, **self._label_kwargs()
        )
        index_stop = _shift_datetime(
            process_kwargs["stop"] or process_kwargs["start"],
            n=shift + 1,
            **self._label_kwargs(),
        )

        store_time = _probe_time_union(
            self.store,
            (index_start, None),
            (index_start, index_stop),
            (index_stop, None),
        )
        if not store_time:
            return [({"empty": True, "mode": process_kwargs["mode"]}, None)]
        nearest = find_neigbours(store_time, index_time, self.direction)
        request["start"] = store_time[nearest.min()]
        request["stop"] = store_time[nearest.max()]
        process_kwargs["nearest"] = (nearest - nearest.min()).tolist()
        return [(process_kwargs, None), (self.store, request)]

    process = staticmethod(_resample_process)
