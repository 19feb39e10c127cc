"""HDF4 raster sources (native Scientific Data Set decoder).

The reference opens HDF4 through GDAL's HDF4 driver (reference
raster/sources.py:66-71 reads any ``gdal.Open``-able file); the format
remains the container of long-lived NASA archives (MODIS, AIRS,
legacy DAAC products).  No HDF4 library exists in this image, so this
module parses the container directly and returns the same RasterData
payload as the GeoTIFF codec.

Supported envelope:

- the DD (data descriptor) block chain, including multi-block files
- Scientific Data Sets discovered through NDG numeric data groups (the
  SD API layout) or standalone DFTAG_SDD/DFTAG_SD pairs (the old DFSD
  API); rank-2 sets become one band, rank-3 sets one band per leading
  index
- number types DFNT 3-6/20-27 in both big-endian (default) and
  little-endian (DFNT_LITEND) flavours
- special elements: linked blocks, external (multi-file) elements,
  compressed elements (deflate, RLE, and szip through the system libsz
  — io/ccsds.py; the fall-through raises with the coder name), and
  chunked elements whose chunk table is the standard ``_HDF_CHK_TBL``
  Vdata — chunks resolve recursively, so chunked+deflate AND
  chunked+szip (the MODIS layouts) decode
- per-set fill values from DFTAG_FV or an ``_FillValue`` attribute,
  linear calibration from DFTAG_CAL or ``scale_factor``/``add_offset``
  attributes (attributes live in ``Attr0.0`` Vdatas inside the
  variable's Vgroup, as the SD API writes them)
- HDF-EOS2 grid georeferencing from the ``StructMetadata.0`` global
  attribute: GEO (packed-DMS corners), sinusoidal (the MODIS grid),
  UTM, polar stereographic and Lambert conformal GCTP projections

N-bit coded elements expand natively (packed bit fields with optional
sign extension / one-fill); skip-huffman elements decode through the
native splay-tree coder below.  All integers are big-endian unless a
number type says otherwise.
"""
import struct
import zlib

import numpy as np

__all__ = ["read_hdf4", "read_hdf4_window", "read_hdf4_info", "is_hdf4"]

_MAGIC = b"\x0e\x03\x13\x01"

# data descriptor tags
_DFTAG_NULL = 1
_DFTAG_LINKED = 20
_DFTAG_COMPRESSED = 40
_DFTAG_CHUNK = 61
_DFTAG_NT = 106
_DFTAG_SDD = 701
_DFTAG_SD = 702
_DFTAG_SDL = 704
_DFTAG_SDU = 705
_DFTAG_CAL = 731
_DFTAG_FV = 732
_DFTAG_NDG = 720
_DFTAG_VH = 1962
_DFTAG_VS = 1963
_DFTAG_VG = 1965

_SPECIAL_BIT = 0x4000

# special element kinds
_SPECIAL_LINKED = 1
_SPECIAL_EXT = 2
_SPECIAL_COMP = 3
_SPECIAL_CHUNKED = 6

# compression coders
_COMP_NONE = 0
_COMP_RLE = 1
_COMP_DEFLATE = 4
_COMP_SZIP = 5
_COMP_NBIT = 2
_COMP_SKPHUFF = 3
_COMP_NAMES = {6: "jpeg", 7: "imcomp"}

_DFNT_LITEND = 0x4000
_DFNT = {
    3: "u1",  # uchar8
    4: "i1",  # char8
    5: "f4",
    6: "f8",
    20: "i1",
    21: "u1",
    22: "i2",
    23: "u2",
    24: "i4",
    25: "u4",
    26: "i8",
    27: "u8",
}

_FILL = float(np.finfo("f4").max)


class _Hdf4Error(ValueError):
    pass


def is_hdf4(path):
    """True when the file starts with the HDF4 magic number."""
    try:
        with open(path, "rb") as f:
            return f.read(4) == _MAGIC
    except OSError:
        return False


def _dtype_from_nt(type_code, width=None):
    base = type_code & ~_DFNT_LITEND
    fmt = _DFNT.get(base)
    if fmt is None:
        raise _Hdf4Error("Unsupported HDF4 number type %d" % type_code)
    order = "<" if type_code & _DFNT_LITEND else ">"
    return np.dtype(order + fmt)


class _File:
    """Parsed DD chain + element readers over one in-memory HDF4 file."""

    def __init__(self, buf, path):
        self.buf = buf
        self.path = path
        self.dds = {}  # (tag, ref) -> (offset, length)
        pos = 4
        seen = set()
        while pos not in (0, -1) and pos < len(buf):
            if pos in seen:  # cyclic DD chain in a corrupt file
                raise _Hdf4Error("Cyclic HDF4 DD chain in '%s'" % path)
            seen.add(pos)
            ndd, nxt = struct.unpack_from(">hi", buf, pos)
            if ndd < 0:
                raise _Hdf4Error("Corrupt HDF4 DD block in '%s'" % path)
            entry = pos + 6
            for _ in range(ndd):
                tag, ref, offset, length = struct.unpack_from(
                    ">HHii", buf, entry
                )
                entry += 12
                if tag != _DFTAG_NULL:
                    self.dds[(tag, ref)] = (offset, length)
            pos = nxt

    def raw(self, tag, ref):
        """Element bytes as stored (no special-element resolution)."""
        try:
            offset, length = self.dds[(tag, ref)]
        except KeyError:
            raise _Hdf4Error(
                "HDF4 object (tag %d, ref %d) not found in '%s'"
                % (tag, ref, self.path)
            )
        return self.buf[offset : offset + length]

    def element(self, tag, ref):
        """Element bytes with linked/compressed/chunked resolution."""
        if (tag, ref) in self.dds:
            return self.raw(tag, ref)
        special = self.dds.get((tag | _SPECIAL_BIT, ref))
        if special is None:
            raise _Hdf4Error(
                "HDF4 object (tag %d, ref %d) not found in '%s'"
                % (tag, ref, self.path)
            )
        desc = self.raw(tag | _SPECIAL_BIT, ref)
        kind = struct.unpack_from(">H", desc, 0)[0]
        if kind == _SPECIAL_LINKED:
            return self._linked(desc)
        if kind == _SPECIAL_COMP:
            return self._compressed(desc)
        if kind == _SPECIAL_CHUNKED:
            raise _Hdf4Error("chunked element must be read via sds data path")
        if kind == _SPECIAL_EXT:
            return self._external(desc)
        raise _Hdf4Error("Unsupported HDF4 special element kind %d" % kind)

    def _external(self, desc):
        """External (multi-file) element: the payload lives at an offset
        in a companion file (hfile.h EXT_EXTERN: int32 length, int32
        offset, int32 name length, name).  The stored name resolves to
        its BASENAME next to the .hdf — the common granule layout — so a
        hostile path in a crafted file cannot escape the dataset's
        directory."""
        import os

        if len(desc) < 14:
            raise _Hdf4Error("HDF4 external element descriptor truncated")
        length, offset, name_len = struct.unpack_from(">iii", desc, 2)
        if length < 0 or offset < 0 or name_len < 0:
            raise _Hdf4Error("HDF4 external element has negative extents")
        name = (
            desc[14 : 14 + name_len]
            .split(b"\x00", 1)[0]
            .decode("latin-1", "replace")
        )
        base = os.path.basename(name.replace("\\", "/"))
        if not base:
            raise _Hdf4Error("HDF4 external element has an empty file name")
        path = os.path.join(
            os.path.dirname(os.path.abspath(self.path)), base
        )
        if not os.path.exists(path):
            raise _Hdf4Error(
                "HDF4 external element file '%s' not found next to '%s'"
                % (base, os.path.basename(self.path))
            )
        with open(path, "rb") as fh:
            fh.seek(offset)
            data = fh.read(length)
        if len(data) < length:
            raise _Hdf4Error("HDF4 external element is truncated")
        return data

    def _linked(self, desc):
        total, _first_len, _blk_len, link_ref = struct.unpack_from(
            ">iiiH", desc, 2
        )
        out = bytearray()
        seen = set()
        while link_ref != 0 and len(out) < total:
            if link_ref in seen:  # cyclic link table in a corrupt file
                raise _Hdf4Error("Cyclic HDF4 linked-block table")
            seen.add(link_ref)
            table = self.raw(_DFTAG_LINKED, link_ref)
            next_ref = struct.unpack_from(">H", table, 0)[0]
            n = (len(table) - 2) // 2
            refs = struct.unpack_from(">%dH" % n, table, 2)
            for blk_ref in refs:
                if blk_ref == 0 or len(out) >= total:
                    break
                out += self.raw(_DFTAG_LINKED, blk_ref)
            link_ref = next_ref
        if len(out) < total:
            raise _Hdf4Error("HDF4 linked-block element is truncated")
        return bytes(out[:total])

    def _compressed(self, desc):
        (_version, uncomp_len, data_ref, _model, coder) = struct.unpack_from(
            ">HiHHH", desc, 2
        )
        data = self.element(_DFTAG_COMPRESSED, data_ref)
        if coder == _COMP_NONE:
            return data[:uncomp_len]
        if coder == _COMP_DEFLATE:
            return zlib.decompress(data)[:uncomp_len]
        if coder == _COMP_RLE:
            return _rle_decode(data, uncomp_len)
        if coder == _COMP_NBIT:
            # coder info (hcomp.h comp_info.nbit, big-endian int32s):
            # number type, sign_ext, fill_one, start_bit, bit_len
            if len(desc) < 34:
                raise _Hdf4Error("HDF4 n-bit coder info truncated")
            (nt_code, sign_ext, fill_one, start_bit,
             bit_len) = struct.unpack_from(">iiiii", desc, 14)
            return _nbit_decode(
                data, uncomp_len, nt_code, sign_ext, fill_one, start_bit,
                bit_len,
            )
        if coder == _COMP_SKPHUFF:
            # coder info (hcomp.h comp_info.skphuff): skp_size int32
            if len(desc) < 18:
                raise _Hdf4Error("HDF4 skip-huffman coder info truncated")
            skip_size = struct.unpack_from(">i", desc, 14)[0]
            try:
                return _skphuff_decode(data, uncomp_len, skip_size)
            except ValueError as error:
                raise _Hdf4Error("HDF4 skip-huffman element: %s" % error)
        if coder == _COMP_SZIP:
            # coder info (hcomp.h comp_info.szip, big-endian int32s):
            # pixels, pixels_per_scanline, options_mask, bits_per_pixel,
            # pixels_per_block; decoded via the system libsz (io/ccsds.py)
            if len(desc) < 34:
                raise _Hdf4Error("HDF4 szip coder info truncated")
            (_pixels, per_scanline, options_mask, bits_per_pixel,
             per_block) = struct.unpack_from(">iiiii", desc, 14)
            from dask_geomodeling_tpu.io.ccsds import szip_decompress

            try:
                return szip_decompress(
                    data, uncomp_len, options_mask, bits_per_pixel,
                    per_block, per_scanline,
                )
            except ValueError as error:
                raise _Hdf4Error("HDF4 szip element: %s" % error)
        raise _Hdf4Error(
            "Unsupported HDF4 compression coder: %s"
            % _COMP_NAMES.get(coder, str(coder))
        )

    def chunk_descriptor(self, tag, ref):
        """The chunked-element description record, or None."""
        desc = self.dds.get((tag | _SPECIAL_BIT, ref))
        if desc is None:
            return None
        raw = self.raw(tag | _SPECIAL_BIT, ref)
        if struct.unpack_from(">H", raw, 0)[0] != _SPECIAL_CHUNKED:
            return None
        return raw


def _nbit_decode(data, expected, nt_code, sign_ext, fill_one, start_bit,
                 bit_len):
    """HDF4 n-bit coding: each element stores only the ``bit_len``-bit
    field whose most significant bit sits at ``start_bit`` (counted from
    the element's LSB = bit 0); expansion zero- or one-fills the other
    bits, with optional sign extension from the field's top bit."""
    dtype = _dtype_from_nt(nt_code)
    size = dtype.itemsize
    if not (0 < bit_len <= start_bit + 1 <= size * 8):
        raise _Hdf4Error("HDF4 n-bit coder has inconsistent bit layout")
    count = expected // size
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    if bits.size < count * bit_len:
        raise _Hdf4Error("HDF4 n-bit element is truncated")
    weights = 1 << np.arange(bit_len - 1, -1, -1, dtype=np.int64)
    fields = bits[: count * bit_len].reshape(count, bit_len).astype(
        np.int64
    ) @ weights

    shift = start_bit + 1 - bit_len
    values = fields << shift
    mask = ((1 << bit_len) - 1) << shift
    if fill_one:
        values |= ~mask & ((1 << (8 * size)) - 1)
    if sign_ext:
        negative = (fields >> (bit_len - 1)) & 1
        high = ((1 << (8 * size)) - 1) & ~((1 << (start_bit + 1)) - 1)
        values = np.where(negative == 1, values | high, values & ~high)
    # materialize as the element's big-endian raw bytes (the SDS reader
    # reinterprets with the set's own number type afterwards)
    out = values.astype(">u8").view(np.uint8).reshape(count, 8)[:, 8 - size:]
    return out.tobytes()[:expected]


def _rle_decode(data, expected):
    """HDF4 run-length coding: count byte n<128 = n+1 literal bytes,
    n>=128 = (n-127) repeats of the next byte."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        else:
            out += data[i : i + 1] * (n - 127)
            i += 1
    if len(out) < expected:
        raise _Hdf4Error("HDF4 RLE stream is truncated")
    return bytes(out[:expected])


def _skphuff_decode(data, expected, skip_size):
    """HDF4 skip-huffman coding: adaptive prefix codes over semi-splayed
    binary trees (Jones, "Application of Splay Trees to Data
    Compression", CACM 1988), one tree per byte position within an
    element — byte ``i`` of the stream uses tree ``i % skip_size``.

    Tree layout (recovered from the hskphuff coder in the system HDF4
    library and pinned against its output in tests/test_hdf4.py):
    nodes are heap-numbered with root 0 and children ``2j``/``2j+1``
    (so the root's left child starts as a self-loop), a node above 255
    is the leaf for byte ``node - 256``, and a 0/1 bit steps
    left/right with bits read MSB-first.  After every decoded byte the
    leaf is semi-splayed: each step swaps the node with its uncle and
    halves the path depth, walking grandparent pairs until the parent
    (or the node itself, once the root's self-loop has been splayed
    into the chain) is the root.
    """
    if skip_size < 1:
        raise _Hdf4Error("HDF4 skip-huffman skip size must be >= 1")
    if skip_size > 64:
        # bytes-per-element bound: largest HDF4 number type is 8 bytes,
        # so a huge declared size means a corrupt coder info record
        raise _Hdf4Error(
            "Implausible HDF4 skip-huffman skip size: %d" % skip_size
        )
    lefts = [list(range(0, 512, 2)) for _ in range(skip_size)]
    rights = [list(range(1, 512, 2)) for _ in range(skip_size)]
    ups = [[i >> 1 for i in range(512)] for _ in range(skip_size)]
    out = bytearray()
    bitpos = 0
    total = len(data) * 8
    tree = 0
    while len(out) < expected:
        left = lefts[tree]
        right = rights[tree]
        up = ups[tree]
        node = 0
        while node < 256:
            if bitpos >= total:
                raise _Hdf4Error("HDF4 skip-huffman stream is truncated")
            bit = (data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
            bitpos += 1
            node = right[node] if bit else left[node]
        out.append(node - 256)
        a = node
        while a != 0:
            c = up[a]
            if c == 0:
                break
            d = up[c]
            b = left[d]
            if b == c:
                b = right[d]
                right[d] = a
            else:
                left[d] = a
            if left[c] == a:
                left[c] = b
            else:
                right[c] = b
            up[a] = d
            up[b] = c
            a = d
        tree = (tree + 1) % skip_size
    return bytes(out)


# ------------------------------------------------------------ Vdata/Vgroup


class _Vdata:
    def __init__(self, file, ref):
        header = file.raw(_DFTAG_VH, ref)
        self.ref = ref
        (self.interlace, self.nrecords, self.recsize, nfields) = (
            struct.unpack_from(">hihh", header, 0)
        )
        pos = 10
        types = struct.unpack_from(">%dh" % nfields, header, pos)
        pos += 2 * nfields
        sizes = struct.unpack_from(">%dh" % nfields, header, pos)
        pos += 2 * nfields
        offsets = struct.unpack_from(">%dh" % nfields, header, pos)
        pos += 2 * nfields
        orders = struct.unpack_from(">%dh" % nfields, header, pos)
        pos += 2 * nfields
        names = []
        for _ in range(nfields):
            n = struct.unpack_from(">h", header, pos)[0]
            pos += 2
            names.append(header[pos : pos + n].decode("latin-1"))
            pos += n
        n = struct.unpack_from(">h", header, pos)[0]
        pos += 2
        self.name = header[pos : pos + n].decode("latin-1")
        pos += n
        n = struct.unpack_from(">h", header, pos)[0]
        pos += 2
        self.vclass = header[pos : pos + n].decode("latin-1")
        self.fields = list(zip(names, types, sizes, offsets, orders))
        self._file = file

    def records(self):
        """[{field: scalar-or-array}] for every record (full interlace)."""
        data = self._file.element(_DFTAG_VS, self.ref)
        out = []
        for i in range(self.nrecords):
            rec = {}
            base = i * self.recsize
            for name, type_code, _size, offset, order in self.fields:
                dtype = _dtype_from_nt(type_code)
                start = base + offset
                chunk = data[start : start + dtype.itemsize * order]
                if type_code & ~_DFNT_LITEND in (3, 4):
                    rec[name] = chunk.rstrip(b"\x00").decode(
                        "latin-1", "replace"
                    )
                else:
                    values = np.frombuffer(chunk, dtype, count=order)
                    rec[name] = values[0] if order == 1 else values
            out.append(rec)
        return out

    def value(self):
        """The whole Vdata as one scalar/string/array (attribute style)."""
        recs = self.records()
        if not recs:
            return None
        name = self.fields[0][0]
        if len(recs) == 1:
            return recs[0][name]
        return np.asarray([r[name] for r in recs])


class _Vgroup:
    def __init__(self, file, ref):
        body = file.raw(_DFTAG_VG, ref)
        nelt = struct.unpack_from(">h", body, 0)[0]
        pos = 2
        tags = struct.unpack_from(">%dH" % nelt, body, pos)
        pos += 2 * nelt
        refs = struct.unpack_from(">%dH" % nelt, body, pos)
        pos += 2 * nelt
        n = struct.unpack_from(">H", body, pos)[0]
        pos += 2
        self.name = body[pos : pos + n].decode("latin-1")
        pos += n
        n = struct.unpack_from(">H", body, pos)[0]
        pos += 2
        self.vclass = body[pos : pos + n].decode("latin-1")
        self.members = list(zip(tags, refs))


# ----------------------------------------------------------------- SDS


class _Sds:
    """One scientific data set: dims, number type, data ref, attributes."""

    def __init__(self, file, sdd_ref, data_ref):
        self.file = file
        self.data_ref = data_ref
        sdd = file.raw(_DFTAG_SDD, sdd_ref)
        rank = struct.unpack_from(">h", sdd, 0)[0]
        self.dims = struct.unpack_from(">%di" % rank, sdd, 2)
        pos = 2 + 4 * rank
        nt_tag, nt_ref = struct.unpack_from(">HH", sdd, pos)
        nt = file.raw(nt_tag, nt_ref)
        # NT record: version, type, width, class.  The class byte names
        # the byte order: DFNTI_IBO / DFNTF_PC (both 4, hntdefs.h) mean
        # little-endian (what DFNT_LITEND writes); DFNTI_MBO /
        # DFNTF_IEEE (both 1) and 0 mean big-endian.
        nt_class = nt[3] if len(nt) > 3 else 0
        self.type_code = nt[1] | (_DFNT_LITEND if nt_class == 4 else 0)
        self.dtype = _dtype_from_nt(self.type_code)
        self.name = None
        self.fill = None
        self.scale = None
        self.offset = None

    @property
    def npoints(self):
        n = 1
        for d in self.dims:
            n *= d
        return n

    def read(self):
        desc = self.file.chunk_descriptor(_DFTAG_SD, self.data_ref)
        if desc is not None:
            raw = self._read_chunked(desc)
        else:
            raw = self.file.element(_DFTAG_SD, self.data_ref)
        count = self.npoints
        values = np.frombuffer(raw, self.dtype, count=count)
        return values.reshape(self.dims)

    def read_window(self, row0, row1, col0, col1):
        """Only the [row0:row1, col0:col1) window of the LAST TWO axes,
        decoding only the chunks (or contiguous row range) it touches —
        the repo-wide windowed-read pattern (bit-exact with ``read``)."""
        dims = self.dims
        h, w = dims[-2], dims[-1]
        row0, row1 = max(0, row0), min(h, row1)
        col0, col1 = max(0, col0), min(w, col1)
        desc = self.file.chunk_descriptor(_DFTAG_SD, self.data_ref)
        if desc is not None:
            return self._read_chunked_window(desc, row0, row1, col0, col1)
        plain = self.file.dds.get((_DFTAG_SD, self.data_ref))
        if plain is not None and len(dims) == 2:
            # contiguous rank-2 storage: a row range is one byte range
            offset, length = plain
            itemsize = self.dtype.itemsize
            start = offset + row0 * w * itemsize
            nbytes = (row1 - row0) * w * itemsize
            if start + nbytes > offset + length:
                raise _Hdf4Error("HDF4 data element is truncated")
            rows = np.frombuffer(
                self.file.buf[start : start + nbytes], self.dtype
            ).reshape(row1 - row0, w)
            return rows[:, col0:col1]
        # linked/compressed contiguous or rank-3: decode whole, slice
        return self.read()[..., row0:row1, col0:col1]

    def _read_chunked_window(self, desc, row0, row1, col0, col1):
        """Chunked storage: decode only intersecting chunks."""
        chunk_dims, fill, tbl_ref = self._chunk_layout(desc)
        dims = self.dims
        window = [(0, n) for n in dims[:-2]] + [(row0, row1), (col0, col1)]
        out_shape = [b - a for a, b in window]
        if fill is not None:
            out = np.full(out_shape, fill, self.dtype)
        else:
            out = np.zeros(out_shape, self.dtype)

        table = _Vdata(self.file, tbl_ref)
        for rec in table.records():
            origin = np.atleast_1d(rec["origin"]).astype(int)
            starts = [o * c for o, c in zip(origin, chunk_dims)]
            stops = [
                min(s + c, n) for s, c, n in zip(starts, chunk_dims, dims)
            ]
            if any(
                stop <= lo or start >= hi
                for start, stop, (lo, hi) in zip(starts, stops, window)
            ):
                continue  # chunk does not touch the window: skip decode
            raw = self.file.element(int(rec["chk_tag"]), int(rec["chk_ref"]))
            chunk = np.frombuffer(
                raw, self.dtype, count=int(np.prod(chunk_dims))
            ).reshape(chunk_dims)
            src = []
            dst = []
            for axis, (start, stop) in enumerate(zip(starts, stops)):
                lo, hi = window[axis]
                a, b = max(start, lo), min(stop, hi)
                src.append(slice(a - start, b - start))
                dst.append(slice(a - lo, b - lo))
            out[tuple(dst)] = chunk[tuple(src)]
        return out

    def _chunk_layout(self, desc):
        """(chunk_dims, fill-or-None, chunk-table ref) from the chunked
        description record (shared by whole and windowed reads)."""
        (_version, _flag, _total, _chunk_size, _nt_size, _tbl_tag, tbl_ref,
         _sp_tag, _sp_ref, ndims) = struct.unpack_from(">BiiiiHHHHi", desc, 2)
        pos = 2 + 1 + 4 * 4 + 2 * 4 + 4
        chunk_dims = []
        for _ in range(ndims):
            _dflag, _dim_len, chunk_len = struct.unpack_from(">iii", desc, pos)
            pos += 12
            chunk_dims.append(chunk_len)
        fill_len = struct.unpack_from(">i", desc, pos)[0]
        pos += 4
        fill_bytes = desc[pos : pos + fill_len]
        fill = None
        if fill_bytes and len(fill_bytes) == self.dtype.itemsize:
            fill = np.frombuffer(fill_bytes, self.dtype)[0]
        return chunk_dims, fill, tbl_ref

    def _read_chunked(self, desc):
        """Assemble a whole chunked element: the full-extent window."""
        h, w = self.dims[-2], self.dims[-1]
        return self._read_chunked_window(desc, 0, h, 0, w).tobytes()


def _attr_value(vdata):
    try:
        return vdata.value()
    except _Hdf4Error:
        return None


def _collect_sds(file):
    """All SDSes: NDG groups first, standalone SDD/SD pairs otherwise."""
    sets = []
    seen_sdd = set()
    for (tag, ref) in sorted(file.dds):
        if tag != _DFTAG_NDG:
            continue
        body = file.raw(tag, ref)
        members = [
            struct.unpack_from(">HH", body, i) for i in range(0, len(body), 4)
        ]
        sdd_ref = data_ref = None
        fill = cal = None
        for mtag, mref in members:
            if mtag == _DFTAG_SDD:
                sdd_ref = mref
            elif mtag == _DFTAG_SD:
                data_ref = mref
            elif mtag == _DFTAG_FV:
                fill = mref
            elif mtag == _DFTAG_CAL:
                cal = mref
        if sdd_ref is None or data_ref is None:
            continue
        seen_sdd.add(sdd_ref)
        sds = _Sds(file, sdd_ref, data_ref)
        if fill is not None:
            raw = file.raw(_DFTAG_FV, fill)
            if len(raw) == sds.dtype.itemsize:
                sds.fill = np.frombuffer(raw, sds.dtype)[0]
        if cal is not None:
            raw = file.raw(_DFTAG_CAL, cal)
            if len(raw) >= 32:
                scale, _se, off, _oe = struct.unpack_from(">dddd", raw, 0)
                if scale != 1.0 or off != 0.0:
                    sds.scale, sds.offset = scale, off
        sets.append((ref, sds))

    for (tag, ref) in sorted(file.dds):
        # DFSD-era files: no NDG, SDD and SD share a ref
        if tag == _DFTAG_SDD and ref not in seen_sdd:
            if (_DFTAG_SD, ref) in file.dds or (
                _DFTAG_SD | _SPECIAL_BIT, ref
            ) in file.dds:
                sets.append((ref, _Sds(file, ref, ref)))

    # SD-API attributes: Vgroups of class Var0.0 tie Attr0.0 Vdatas
    # (name, _FillValue, scale_factor, add_offset) to their NDG
    ndg_to_sds = {ref: sds for ref, sds in sets}
    for (tag, ref) in sorted(file.dds):
        if tag != _DFTAG_VG:
            continue
        try:
            group = _Vgroup(file, ref)
        except (struct.error, _Hdf4Error):
            continue
        if group.vclass not in ("Var0.0", "RIG0.0"):
            continue
        target = None
        for mtag, mref in group.members:
            if mtag == _DFTAG_NDG and mref in ndg_to_sds:
                target = ndg_to_sds[mref]
        if target is None:
            continue
        target.name = group.name or target.name
        for mtag, mref in group.members:
            if mtag != _DFTAG_VH:
                continue
            try:
                vdata = _Vdata(file, mref)
            except (struct.error, _Hdf4Error):
                continue
            if vdata.vclass != "Attr0.0":
                continue
            value = _attr_value(vdata)
            if value is None:
                continue
            if vdata.name == "_FillValue":
                target.fill = np.asarray(value).astype(target.dtype).item()
            elif vdata.name == "scale_factor":
                target.scale = float(np.asarray(value).item())
            elif vdata.name == "add_offset":
                target.offset = float(np.asarray(value).item())
    return [sds for _, sds in sets]


# -------------------------------------------------------------- HDF-EOS


def _dms_to_degrees(value):
    """HDF-EOS packed DMS (DDDMMMSSS.ss) to decimal degrees."""
    sign = -1.0 if value < 0 else 1.0
    value = abs(value)
    degrees = int(value // 1000000)
    minutes = int((value - degrees * 1000000) // 1000)
    seconds = value - degrees * 1000000 - minutes * 1000
    return sign * (degrees + minutes / 60.0 + seconds / 3600.0)


def _parse_struct_metadata(text):
    """GRID geo-referencing out of HDF-EOS ODL StructMetadata text:
    (projection_string, geo_transform, (xdim, ydim)) or None."""
    import re

    def field(name):
        match = re.search(r"%s\s*=\s*([^\n]+)" % name, text)
        return match.group(1).strip() if match else None

    xdim, ydim = field("XDim"), field("YDim")
    upper = field("UpperLeftPointMtrs")
    lower = field("LowerRightMtrs")
    projection = field("Projection")
    if not (xdim and ydim and upper and lower and projection):
        return None
    xdim, ydim = int(xdim), int(ydim)
    ulx, uly = [float(v) for v in upper.strip("()").split(",")]
    lrx, lry = [float(v) for v in lower.strip("()").split(",")]

    params = [0.0] * 13
    params_text = field("ProjParams")
    if params_text:
        values = [float(v) for v in params_text.strip("()").split(",")]
        params[: len(values)] = values

    if projection == "GCTP_GEO":
        ulx, uly = _dms_to_degrees(ulx), _dms_to_degrees(uly)
        lrx, lry = _dms_to_degrees(lrx), _dms_to_degrees(lry)
        proj = "EPSG:4326"
    elif projection == "GCTP_SNSOID":
        radius = params[0] or 6371007.181
        proj = (
            "+proj=sinu +R=%.9g +lon_0=%.9g +x_0=0 +y_0=0 +units=m +no_defs"
            % (radius, _dms_to_degrees(params[4]))
        )
    elif projection == "GCTP_UTM":
        zone = field("ZoneCode")
        if zone is None:
            return None
        zone = int(zone)
        proj = "EPSG:%d" % ((32600 if zone > 0 else 32700) + abs(zone))
    elif projection == "GCTP_PS":
        lat0 = 90.0 if params[5] >= 0 else -90.0
        proj = (
            "+proj=stere +lat_0=%g +lat_ts=%.9g +lon_0=%.9g +x_0=%.9g "
            "+y_0=%.9g +a=%.9g +b=%.9g +units=m +no_defs"
            % (lat0, _dms_to_degrees(params[5]), _dms_to_degrees(params[4]),
               params[6], params[7],
               params[0] or 6378137.0, params[1] or params[0] or 6356752.314)
        )
    elif projection == "GCTP_LAMCC":
        proj = (
            "+proj=lcc +lat_1=%.9g +lat_2=%.9g +lat_0=%.9g +lon_0=%.9g "
            "+x_0=%.9g +y_0=%.9g +a=%.9g +b=%.9g +units=m +no_defs"
            % (_dms_to_degrees(params[2]), _dms_to_degrees(params[3]),
               _dms_to_degrees(params[5]), _dms_to_degrees(params[4]),
               params[6], params[7],
               params[0] or 6378137.0, params[1] or params[0] or 6356752.314)
        )
    else:
        return None

    dx = (lrx - ulx) / xdim
    dy = (lry - uly) / ydim
    return proj, (ulx, dx, 0.0, uly, 0.0, dy), (xdim, ydim)


def _global_attr(file, name):
    """A global attribute by Vdata name (e.g. StructMetadata.0)."""
    for (tag, ref) in sorted(file.dds):
        if tag != _DFTAG_VH:
            continue
        try:
            vdata = _Vdata(file, ref)
        except (struct.error, _Hdf4Error):
            continue
        if vdata.name == name:
            return _attr_value(vdata)
    return None


# ----------------------------------------------------------------- API


def _load(path):
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _MAGIC:
        raise IOError("Not an HDF4 file: '%s'" % path)
    return buf


def read_hdf4(path):
    """Read an HDF4 file into a RasterData payload (2-D SDSes are one
    band each; a rank-3 SDS contributes one band per leading index)."""
    from dask_geomodeling_tpu.raster.sources import RasterData

    buf = _load(path)
    try:
        return _read_hdf4_sets(buf, path, RasterData)
    except (struct.error, IndexError, KeyError, OverflowError,
            TypeError, zlib.error) as e:
        # low-level parse failures on corrupt/truncated containers
        # surface as the format error serving code already handles
        raise _Hdf4Error(
            "Corrupt or truncated HDF4 file '%s': %r" % (path, e)
        )


def read_hdf4_window(path, row0, row1, col0, col1):
    """Read one pixel window, decoding only the chunks (or contiguous
    row ranges) it touches; bit-exact with the matching slice of
    :func:`read_hdf4` (the repo-wide windowed-read invariant)."""
    from dask_geomodeling_tpu.raster.sources import RasterData

    buf = _load(path)
    try:
        file, raster_sets, shape = _raster_sets(buf, path)
        h, w = shape
        row0 = max(0, min(int(row0), h))
        row1 = max(row0 + 1, min(int(row1), h))
        col0 = max(0, min(int(col0), w))
        col1 = max(col0 + 1, min(int(col1), w))
        return _read_hdf4_sets(
            buf, path, RasterData, window=(row0, row1, col0, col1)
        )
    except (struct.error, IndexError, KeyError, OverflowError,
            TypeError, zlib.error) as e:
        raise _Hdf4Error(
            "Corrupt or truncated HDF4 file '%s': %r" % (path, e)
        )


def read_hdf4_info(path):
    """Header info (dims, bands, dtype, georeferencing) without decoding
    any pixel data — large granules answer attribute queries cheaply."""
    from dask_geomodeling_tpu.io.geotiff import GeoTIFFInfo

    buf = _load(path)
    try:
        file, raster_sets, shape = _raster_sets(buf, path)
        bands = sum(
            s.dims[0] if len(s.dims) == 3 else 1 for s in raster_sets
        )
        projection, geo_transform = _georeference(file, shape)
    except (struct.error, IndexError, KeyError, OverflowError,
            TypeError, zlib.error) as e:
        raise _Hdf4Error(
            "Corrupt or truncated HDF4 file '%s': %r" % (path, e)
        )
    return GeoTIFFInfo(
        width=shape[1],
        height=shape[0],
        bands=bands,
        dtype="float64",  # reads calibrate/fill into f8, like read_hdf4
        projection=projection,
        geo_transform=geo_transform,
        no_data_value=_FILL,
        metadata=[s.name or "" for s in raster_sets],
    )


def _raster_sets(buf, path):
    file = _File(buf, path)
    sets = _collect_sds(file)
    raster_sets = [s for s in sets if len(s.dims) in (2, 3)]
    if not raster_sets:
        raise _Hdf4Error("HDF4 file contains no 2-D/3-D data sets: '%s'"
                         % path)
    shape = raster_sets[0].dims[-2:]
    return file, [
        s for s in raster_sets if tuple(s.dims[-2:]) == tuple(shape)
    ], tuple(shape)


def _georeference(file, shape):
    projection = None
    geo_transform = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    struct_meta = _global_attr(file, "StructMetadata.0")
    if isinstance(struct_meta, str):
        parsed = _parse_struct_metadata(struct_meta)
        if parsed is not None and parsed[2] == (shape[1], shape[0]):
            projection, geo_transform, _ = parsed
    return projection, geo_transform


def _read_hdf4_sets(buf, path, RasterData, window=None):
    file, raster_sets, shape = _raster_sets(buf, path)

    bands = []
    metadata = []
    for sds in raster_sets:
        if window is None:
            values = sds.read().astype("f8", copy=False)
        else:
            values = sds.read_window(*window).astype("f8", copy=False)
        fill_mask = None
        if sds.fill is not None:
            fill_mask = values == float(sds.fill)
        if sds.scale is not None or sds.offset is not None:
            # the SD convention: value = scale * (stored - offset)
            values = (sds.scale or 1.0) * (values - (sds.offset or 0.0))
        values = np.ascontiguousarray(values)
        if fill_mask is not None:
            values[fill_mask] = _FILL
        if values.ndim == 2:
            values = values[None]
        meta = sds.name or ""
        for band in values:
            bands.append(band)
            metadata.append(meta)

    array = np.stack(bands)
    projection, geo_transform = _georeference(file, shape)
    if window is not None:
        # a windowed read IS a smaller file: shift the anchor
        row0, _, col0, _ = window
        x0, dx, rx, y0, ry, dy = geo_transform
        geo_transform = (
            x0 + col0 * dx + row0 * rx, dx, rx,
            y0 + col0 * ry + row0 * dy, ry, dy,
        )

    return RasterData(
        array=array,
        projection=projection,
        geo_transform=geo_transform,
        no_data_value=_FILL,
        metadata=metadata,
    )
