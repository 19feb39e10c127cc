"""Packed device→host fetch for small-range integer outputs.

The tunneled TPU's device→host link (~7-45 MB/s) is the binding
constraint of the tile runtime: ~98% of a big classified-map request is
spent fetching result bytes.  Classified/boolean outputs carry only a
handful of distinct values, so shipping one byte per pixel wastes most
of the wire.

This codec packs G pixels into one byte on device (base-S positional
encoding, fused by XLA into the tile program's final elementwise pass)
and unpacks on host with vectorized numpy.  It is *lossless by
construction*: a block's ``process`` may declare

    process.jax_out_range = lambda *literal_args: (lo, hi)  # or None

guaranteeing every non-nodata output value lies in [lo, hi] (literal
args follow the ``jax_capable`` convention: graph-key args arrive as
None).  With S = range size (+1 for an out-of-range nodata code) and
G = floor(log_S 256):

    S <= 2  (boolean masks)   -> 8 px/byte
    S <= 4                    -> 4 px/byte
    S <= 6                    -> 3 px/byte
    S <= 16                   -> 2 px/byte

Wider alphabets stop grouping pixels but still shrink multi-byte
outputs to bare palette codes (``group=1``): S <= 256 ships one uint8
code per pixel (4x for float32/int32 outputs), S <= 65536 one uint16
code (2x for float32, 4x for float64).  That is the continuous-output
lever: a float raster that is secretly quantized (uint8/int16 data
stored as float after math, or any nearest-neighbour warp of it)
carries only its source's alphabet — see ``_packing`` and the
data-dependent source scans in raster/sources.py.

The reference has no analog — it ships raw float64 numpy arrays between
dask workers (reference core/graphs.py:42-49); this is TPU-tunnel
engineering, gated by ``geomodeling.fetch-pack`` (default on).
"""
import numpy as np

__all__ = ["FetchCodec", "derive_codec"]


class FetchCodec:
    """Base-S pixel packer: ``encode`` runs inside the traced tile
    program, ``decode`` reverses it on host, bit-exactly.

    ``palette`` (optional, sorted array) maps a sparse discrete output
    alphabet (e.g. Reclassify targets [1, 5, 9, 13, 17], or Mask's
    float {0.0, 7.0}) onto dense codes, so the symbol count is the
    number of distinct values rather than the value range — a
    range-based codec would need range-size symbols (often > 16 and
    unusable) where the palette needs len(palette).  Float palettes are
    stored in the output dtype so device-side equality is exact; a NaN
    fill is encoded via ``fill_code`` with an isnan test (NaN can never
    live inside a sorted palette).
    """

    def __init__(self, lo, fill, fill_code, symbols, group, dtype,
                 palette=None, code_dtype=np.uint8):
        self.lo = int(lo)
        self.fill = fill
        self.fill_code = fill_code  # None when fill is inside the alphabet
        self.symbols = int(symbols)
        self.group = int(group)
        self.dtype = np.dtype(dtype)
        self.code_dtype = np.dtype(code_dtype)
        if palette is None:
            self.palette = None
        elif np.issubdtype(self.dtype, np.floating):
            self.palette = np.asarray(palette, self.dtype)
        else:
            self.palette = np.asarray(palette, np.int64)

    def __repr__(self):
        return "FetchCodec(S=%d, %d px/%s, dtype=%s%s)" % (
            self.symbols,
            self.group,
            self.code_dtype,
            self.dtype,
            "" if self.palette is None else ", palette",
        )

    def _codes(self, values, jnp):
        """Traced value -> dense code mapping (pre-fill handling)."""
        bands = values.shape[0]
        flat = values.reshape(bands, -1)
        if self.palette is not None:
            return jnp.searchsorted(
                jnp.asarray(self.palette), flat.astype(self.palette.dtype)
            ).astype(jnp.int32)
        return flat.astype(jnp.int32) - self.lo

    def encode(self, values):
        """(bands, h, w) traced array -> (bands, ceil(h*w/G)) codes."""
        import jax.numpy as jnp

        bands = values.shape[0]
        flat = self._codes(values, jnp)
        if self.fill_code is not None:
            flat_vals = values.reshape(bands, -1)
            is_fill = (
                jnp.isnan(flat_vals)
                if isinstance(self.fill, float) and np.isnan(self.fill)
                else flat_vals == self.fill
            )
            flat = jnp.where(is_fill, self.fill_code, flat)
        if self.group == 1:
            # wide alphabet: the dense code IS the wire byte/short
            return flat.astype(self.code_dtype)
        pad = (-flat.shape[1]) % self.group
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, pad)))
        groups = flat.reshape(bands, -1, self.group)
        weights = np.array(
            [self.symbols ** (self.group - 1 - k) for k in range(self.group)],
            np.int32,
        )
        return jnp.sum(groups * weights, axis=-1).astype(self.code_dtype)

    def _decode_table(self):
        """(N_codes, group) lookup: code -> final output values (fill
        resolved), so decoding is ONE numpy gather per packed code."""
        table = getattr(self, "_lut", None)
        if table is None:
            n_codes = int(np.iinfo(self.code_dtype).max) + 1
            digits = np.empty((n_codes, self.group), np.int64)
            x = np.arange(n_codes, dtype=np.int64)
            for k in range(self.group - 1, -1, -1):
                digits[:, k] = x % self.symbols
                x //= self.symbols
            if self.palette is not None:
                clipped = np.clip(digits, 0, len(self.palette) - 1)
                values = self.palette[clipped].astype(self.dtype)
            else:
                values = (digits + self.lo).astype(self.dtype)
            if self.fill_code is not None:
                values[digits == self.fill_code] = self.fill
            self._lut = table = values
        return table

    def decode(self, packed, height, width):
        """(B, bands, m) codes -> (B, bands, height, width) self.dtype."""
        from dask_geomodeling_tpu import native

        packed = np.ascontiguousarray(packed, dtype=self.code_dtype)
        n_batch, bands, m = packed.shape
        table = self._decode_table()
        out = np.empty((n_batch, bands, m * self.group), self.dtype)
        # per-byte LUT gather: threaded C++ when available (uint8 codes
        # only), numpy fallback
        if self.code_dtype != np.uint8 or not native.fetch_decode_native(
            packed, table, out
        ):
            out[...] = table[packed].reshape(n_batch, bands, -1)
        return out[:, :, : height * width].reshape(
            n_batch, bands, height, width
        )


def _packing(symbols, dtype):
    """``(group, code_dtype)`` wire packing for an alphabet size, or None
    when packing would not beat shipping the raw output bytes.

    - symbols <= 16: >= 2 px per uint8 byte (base-S positional groups)
    - symbols <= 256, output wider than 1 byte: one uint8 code per px
    - symbols <= 65536, output wider than 2 bytes: one uint16 code per px
    """
    if symbols <= 16:
        group = 1
        while symbols ** (group + 1) <= 256:
            group += 1
        return group, np.uint8  # group >= 2 whenever symbols <= 16
    itemsize = np.dtype(dtype).itemsize
    if symbols <= 256 and itemsize > 1:
        return 1, np.uint8
    if symbols <= 65536 and itemsize > 2:
        return 1, np.uint16
    return None


def codec_from_values(values, fillvalue, dtype):
    """A FetchCodec from an explicit output alphabet (the block-level
    ``out_value_set`` protocol, raster/base.py), or None.

    Unlike the function-attribute path this handles FLOAT outputs: the
    palette is cast to the output dtype so device-side equality is
    exact, and a NaN fill gets the out-of-palette fill code (isnan test
    in ``encode``).  ``values`` must be the complete set of possible
    output array values; the fill is added if absent.
    """
    dtype = np.dtype(dtype)
    is_float = np.issubdtype(dtype, np.floating)
    if not (is_float or dtype == bool or np.issubdtype(dtype, np.integer)):
        return None
    nan_fill = (
        fillvalue is not None
        and isinstance(fillvalue, float)
        and np.isnan(fillvalue)
    )
    vals = set()
    for v in values:
        if v is None:
            return None
        try:
            cast = dtype.type(v)
        except (TypeError, ValueError, OverflowError):
            return None
        if is_float:
            if not np.isfinite(cast):
                # a declared NaN member that IS the fill encodes via the
                # isnan fill_code; any other non-finite member is fatal
                if nan_fill and np.isnan(cast):
                    continue
                return None
            vals.add(float(cast))
        else:
            if float(v) != float(cast):
                return None  # value does not survive the output dtype
            vals.add(int(cast))
    if not vals:
        return None
    if fillvalue is not None and not nan_fill:
        fv = dtype.type(fillvalue)
        if is_float and not np.isfinite(fv):
            if np.isnan(fv):
                nan_fill = True
            else:
                vals.add(float(fv))
        else:
            vals.add(float(fv) if is_float else int(fv))

    palette = np.array(sorted(vals), dtype if is_float else np.int64)
    if nan_fill:
        symbols = len(palette) + 1
        fill_code = symbols - 1
        fill = np.nan
    else:
        symbols = max(len(palette), 2)
        fill_code = None
        fill = fillvalue
    packing = _packing(symbols, dtype)
    if packing is None:
        return None
    group, code_dtype = packing
    lo = 0 if is_float else int(palette[0])
    if not is_float and len(palette) == int(palette[-1]) - lo + 1:
        palette = None  # contiguous ints: the plain positional codec
    return FetchCodec(
        lo, fill, fill_code, symbols, group, dtype, palette, code_dtype
    )


def derive_codec(dtype, fillvalue, root_func, root_literals, view=None):
    """A FetchCodec for a tile program's root node, or None.

    ``dtype``/``fillvalue`` describe the view's output; ``root_func`` is
    the root node's process function and ``root_literals`` its literal
    args (graph-key args as None), matching the ``jax_capable`` calling
    convention.  Resolution order:

    1. ``view.out_value_set()`` (block-level chain propagation,
       raster/base.py) — the only path that understands float alphabets
       and whole chains like ``Reclassify(Classify(...))``;
    2. a ``jax_out_values`` declaration on the root process (exact
       discrete output set, e.g. Reclassify's target list);
    3. ``jax_out_range`` — the symbol count is the value span.
    """
    dtype = np.dtype(dtype)
    if view is not None:
        try:
            declared = view.out_value_set()
        except Exception:
            declared = None
        if declared is not None:
            codec = codec_from_values(declared, fillvalue, dtype)
            if codec is not None:
                return codec
    palette = None
    if dtype == bool:
        lo, hi, fill = 0, 1, None
    elif np.issubdtype(dtype, np.integer):
        fill = fillvalue
        out_values = getattr(root_func, "jax_out_values", None)
        values = out_values(*root_literals) if out_values is not None else None
        if values is not None:
            palette = np.unique(np.asarray(list(values), np.int64))
            if len(palette) < 1:
                return None
            lo, hi = int(palette[0]), int(palette[-1])
            if len(palette) == hi - lo + 1:
                palette = None  # contiguous: the plain base-S codec
        else:
            out_range = getattr(root_func, "jax_out_range", None)
            if out_range is None:
                return None
            bounds = out_range(*root_literals)
            if bounds is None:
                return None
            lo, hi = int(bounds[0]), int(bounds[1])
    else:
        return None

    alphabet = len(palette) if palette is not None else hi - lo + 1
    if fill is None or (
        lo <= fill <= hi
        and (palette is None or int(fill) in palette)
    ):
        symbols = max(alphabet, 2)
        fill_code = None
    else:
        symbols = alphabet + 1
        fill_code = symbols - 1
    packing = _packing(symbols, dtype)
    if packing is None:
        return None
    group, code_dtype = packing
    return FetchCodec(
        lo, fill, fill_code, symbols, group, dtype, palette, code_dtype
    )
