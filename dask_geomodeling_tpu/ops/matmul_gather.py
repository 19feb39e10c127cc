"""Exact nearest-neighbour warp gather as MXU matmuls.

XLA's general 2-D gather on TPU is memory-latency bound: ~0.26-0.34 s for
a 50-tile batch of 512^2 gathers from an 8192^2 float32 source, which
makes the cross-CRS warp the hottest op of the tile runtime (the same
batch's one-hot matmul probe runs in ~0.033 s — the MXU is an order of
magnitude faster at moving these bytes than the gather unit).

A warp's index field is smooth: within a 128x128 output block the source
row index varies along the output column only by a few pixels (CRS
rotation/shear), and vice versa.  That makes the gather *separable up to
a small residual*:

    rows[i, j] = Ri[i] + a(i, j),   |a| <= AMP
    cols[i, j] = Cj[j] + b(i, j),   |b| <= AMP

with per-block anchors Ri/Cj read from the index field itself.  The
candidate values v[Ri[i]+a, Cj[j]+b] for all (a, b) are computed with two
one-hot matrix products against a block-local source window, and the true
(a, b) per pixel picks the answer with VPU selects:

    U = OH_rows(stacked candidates) @ window          # rows stage, MXU
    G = U @ OH_cols(stacked candidates)^T             # cols stage, MXU
    out[i, j] = G[a(i,j), i, b(i,j), j]               # 49 selects, VPU

One-hot matmuls reproduce the gathered float32 values bit-exactly
(verified on hardware): each output sums exactly one product 1.0 * value.

The caller must guarantee the smoothness contract (residuals within AMP,
block source span within the window); `gather_domain` bounds the index
field's Jacobian for a CRS pair on the host so the tile runtime can check
each batch of requests cheaply and fall back to the plain gather outside
the domain (runtime/tiles.py).  Outside-source pixels are pinned to their
block anchors so they never violate the contract; the caller overwrites
them with the fill value via its `inside` mask, as with the plain gather.

Replaces the hot loop of the reference's ``gdal.ReprojectImage``
(reference raster/sources.py:133-144) — there is no reference analog of
the decomposition itself; it is how a gather becomes a systolic-array
workload.
"""
import numpy as np

__all__ = [
    "AMP",
    "BLOCK",
    "WINDOW",
    "gather_matmul_eligible",
    "gather_matmul_jax",
    "gather_domain",
    "requests_in_domain",
]

#: output block edge (one matmul tile row of work)
BLOCK = 128
#: block-local source window edge (static; must cover block span + 2*AMP)
WINDOW = 384
#: max |residual| between an index and its block anchor
AMP = 3

_AMP2 = 2 * AMP + 1

# dtypes whose values round-trip exactly through float32 products
_EXACT_DTYPES = ("float32", "uint8", "int8", "uint16", "int16", "bool")


def gather_matmul_eligible(values_dtype, src_shape, height, width):
    """Static eligibility: dtype exact in f32 and the source at least one
    window big (dynamic_slice needs it).  Non-block-aligned outputs (halo
    -expanded stencil tiles) are padded internally."""
    return (
        str(np.dtype(values_dtype)) in _EXACT_DTYPES
        and height > 0
        and width > 0
        and src_shape[-2] >= WINDOW
        and src_shape[-1] >= WINDOW
    )


def gather_matmul_jax(values, rows, cols, inside):
    """``values[:, rows, cols]`` for one tile, via blocked one-hot matmuls.

    values: (bands, src_h, src_w); rows/cols: (h, w) int32 (any values at
    ``~inside`` positions); inside: (h, w) bool.  Returns (bands, h, w) of
    values.dtype; ~inside cells carry unspecified values (caller fills).
    Requires :func:`gather_matmul_eligible` and the smoothness contract.
    """
    import jax
    import jax.numpy as jnp

    bands, src_h, src_w = values.shape
    height, width = rows.shape
    # pad halo-expanded (non-block-aligned) outputs to the block grid;
    # pad pixels are outside, so they pin to the anchors and cost nothing
    # but the extra matmul rows, and are cropped before returning
    pad_h = (-height) % BLOCK
    pad_w = (-width) % BLOCK
    if pad_h or pad_w:
        rows = jnp.pad(rows, ((0, pad_h), (0, pad_w)), mode="edge")
        cols = jnp.pad(cols, ((0, pad_h), (0, pad_w)), mode="edge")
        inside = jnp.pad(inside, ((0, pad_h), (0, pad_w)))
    full_h, full_w = height + pad_h, width + pad_w
    nb_i, nb_j = full_h // BLOCK, full_w // BLOCK
    out_dtype = values.dtype
    vals_f32 = values.astype(jnp.float32)
    # 0 * NaN = NaN would poison a whole block's matmul for one
    # non-finite source cell; sanitize the operand and carry a class
    # band (0 finite / 1 NaN / 2 +inf / 3 -inf) through the same
    # one-hot products so non-finite cells come back as canonical
    # NaN/inf values (exact small-int products; NaN payloads are
    # canonicalized, as XLA itself does)
    restore_nonfinite = np.dtype(out_dtype).kind == "f"
    if restore_nonfinite:
        finite = jnp.isfinite(vals_f32)
        nf_class = jnp.where(
            finite,
            jnp.float32(0),
            jnp.where(
                jnp.isnan(vals_f32),
                jnp.float32(1),
                jnp.where(vals_f32 > 0, jnp.float32(2), jnp.float32(3)),
            ),
        )
        vals_f32 = jnp.concatenate(
            [jnp.where(finite, vals_f32, 0.0), nf_class], axis=0
        )
    op_bands = vals_f32.shape[0]
    rows = rows.astype(jnp.int32)
    cols = cols.astype(jnp.int32)

    mid_pen_j = jnp.abs(jnp.arange(BLOCK, dtype=jnp.int32) - BLOCK // 2)
    offsets = jnp.arange(-AMP, AMP + 1, dtype=jnp.int32)

    def one_block(pq):
        p = pq // nb_j
        q = pq % nb_j
        i0 = p * BLOCK
        j0 = q * BLOCK
        r = jax.lax.dynamic_slice(rows, (i0, j0), (BLOCK, BLOCK))
        c = jax.lax.dynamic_slice(cols, (i0, j0), (BLOCK, BLOCK))
        ins = jax.lax.dynamic_slice(inside, (i0, j0), (BLOCK, BLOCK))

        # anchors: the index at the inside pixel nearest the block middle
        # of each row/column (inside cells are contiguous per line, so
        # every inside cell stays within BLOCK/2 of its anchor).  Lines
        # with no inside pixel take the block's overall nearest-inside
        # index as a benign reference — a wild value there would misplace
        # the window for the lines that do carry data.
        pen_row = jnp.where(ins, mid_pen_j[None, :], jnp.int32(2 * BLOCK))
        jstar = jnp.argmin(pen_row, axis=1)
        ri = r[jnp.arange(BLOCK), jstar]  # (BLOCK,) row anchor per out row
        pen_col = jnp.where(ins, mid_pen_j[:, None], jnp.int32(2 * BLOCK))
        istar = jnp.argmin(pen_col, axis=0)
        cj = c[istar, jnp.arange(BLOCK)]  # (BLOCK,) col anchor per out col
        flat_star = jnp.argmax(ins.reshape(-1))  # first inside pixel
        ref_r = r.reshape(-1)[flat_star]
        ref_c = c.reshape(-1)[flat_star]
        row_any = ins.any(axis=1)
        col_any = ins.any(axis=0)
        ri = jnp.where(row_any, ri, ref_r)
        cj = jnp.where(col_any, cj, ref_c)

        # pin outside pixels to the anchors: zero residual, never selects
        r_eff = jnp.where(ins, r, ri[:, None])
        c_eff = jnp.where(ins, c, cj[None, :])

        # block-local window (contract: anchor span + 2*AMP fits WINDOW)
        r0 = jnp.clip(jnp.min(ri) - AMP, 0, src_h - WINDOW)
        c0 = jnp.clip(jnp.min(cj) - AMP, 0, src_w - WINDOW)
        win = jax.lax.dynamic_slice(
            vals_f32, (jnp.int32(0), r0, c0), (op_bands, WINDOW, WINDOW)
        )

        # stacked candidate one-hots: rowsel[(a, i)] = ri[i] + a - r0.
        # Candidates clipped out of the window select nothing later
        # (r_eff is inside the window whenever it equals ri + a).
        rowsel = (ri[None, :] + offsets[:, None] - r0).reshape(-1)
        colsel = (cj[None, :] + offsets[:, None] - c0).reshape(-1)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (_AMP2 * BLOCK, WINDOW), 1
        )
        oh_rows = (rowsel[:, None] == iota).astype(jnp.float32)
        oh_cols = (colsel[:, None] == iota).astype(jnp.float32)

        # rows stage: U[band, (a, i), s] = win[band, ri[i]+a, s]
        u = jax.lax.dot_general(
            oh_rows,
            win,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # ((a i), bands, WINDOW)
        # cols stage: G[(a, i), band, (b, j)] = win[band, ri+a, cj+b]
        g = jax.lax.dot_general(
            u,
            oh_cols,
            (((2,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # ((a i), bands, (b j))
        g = g.reshape(_AMP2, BLOCK, op_bands, _AMP2, BLOCK).transpose(
            0, 3, 2, 1, 4
        )  # (a, b, bands, i, j)

        # VPU selection of the true (a, b) candidate per pixel
        da = r_eff - ri[:, None]  # (BLOCK, BLOCK) in [-AMP, AMP]
        db = c_eff - cj[None, :]
        out = jnp.zeros((op_bands, BLOCK, BLOCK), jnp.float32)
        for a in range(_AMP2):
            for b in range(_AMP2):
                mask = (da == (a - AMP)) & (db == (b - AMP))
                out = jnp.where(mask[None], g[a, b], out)
        return out

    blocks = jax.lax.map(one_block, jnp.arange(nb_i * nb_j, dtype=jnp.int32))
    out = (
        blocks.reshape(nb_i, nb_j, op_bands, BLOCK, BLOCK)
        .transpose(2, 0, 3, 1, 4)
        .reshape(op_bands, full_h, full_w)[:, :height, :width]
    )
    if restore_nonfinite:
        vals, nf = out[:bands], out[bands:]
        out = jnp.where(
            nf == 1,
            jnp.float32(np.nan),
            jnp.where(
                nf == 2,
                jnp.float32(np.inf),
                jnp.where(nf == 3, jnp.float32(-np.inf), vals),
            ),
        )
    if np.dtype(out_dtype) == np.bool_:
        return out != 0
    return out.astype(out_dtype)


def gather_domain(src_gt, src_srs, projection, src_shape):
    """Host-side smoothness bounds of the target->source index field.

    Samples the coordinate transform over the source footprint and
    returns ``(diag_max, offdiag_max)``: the largest absolute diagonal
    (scale) and off-diagonal (rotation/shear) Jacobian entries of the
    fractional source index per *target metre*, or None when the pair
    cannot be bounded (degenerate/failed transforms).

    :func:`requests_in_domain` turns these into per-request checks.
    """
    from dask_geomodeling_tpu.geo.crs import get_projection, transform_points

    try:
        same = get_projection(src_srs).upper() == get_projection(projection).upper()
    except Exception:
        return None
    sp, sa, sb, sq, sc, sd = src_gt
    src_h, src_w = src_shape[-2], src_shape[-1]
    if same:
        return (max(1.0 / abs(sa), 1.0 / abs(sd)), 0.0)

    # source footprint corners -> a padded target-space sampling grid
    xs = sp + sa * np.linspace(0, src_w, 9)
    ys = sq + sd * np.linspace(0, src_h, 9)
    gx, gy = np.meshgrid(xs, ys)
    try:
        with np.errstate(all="ignore"):
            tx, ty = transform_points(gx, gy, src_srs, projection)
            if not (np.isfinite(tx).any() and np.isfinite(ty).any()):
                return None
            x1, x2 = np.nanmin(tx), np.nanmax(tx)
            y1, y2 = np.nanmin(ty), np.nanmax(ty)
            # sample the inverse map's Jacobian by finite differences
            h = max(x2 - x1, y2 - y1) * 1e-4
            if not np.isfinite(h) or h <= 0:
                return None
            px = np.linspace(x1, x2, 17)
            py = np.linspace(y1, y2, 17)
            pgx, pgy = np.meshgrid(px, py)
            sx0, sy0 = transform_points(pgx, pgy, projection, src_srs)
            sxx, syx = transform_points(pgx + h, pgy, projection, src_srs)
            sxy, syy = transform_points(pgx, pgy + h, projection, src_srs)
    except Exception:
        return None
    # fractional index derivatives per target metre
    dcol_dx = (sxx - sx0) / (h * sa)
    dcol_dy = (sxy - sx0) / (h * sa)
    drow_dx = (syx - sy0) / (h * sd)
    drow_dy = (syy - sy0) / (h * sd)
    with np.errstate(invalid="ignore"):
        diag = np.fmax(np.abs(dcol_dx), np.abs(drow_dy))
        off = np.fmax(np.abs(dcol_dy), np.abs(drow_dx))
    if not (np.isfinite(diag).any() and np.isfinite(off).any()):
        return None
    # out-of-domain samples are NaN: they correspond to target cells that
    # can never hit the source (outside pixels; anchor-pinned) — bound
    # over the finite samples, with headroom for inter-sample variation
    return (float(np.nanmax(diag)) * 1.25, float(np.nanmax(off)) * 1.25 + 1e-12)


def requests_in_domain(domain, requests):
    """Whether every request's tile satisfies the smoothness contract.

    ``domain`` comes from :func:`gather_domain`; requests carry bbox and
    width/height.  Checks (conservatively, both axes):

    - block span: BLOCK output px at the diagonal rate + residuals + 2
      must fit WINDOW
    - residual: BLOCK/2 output px at the off-diagonal rate stays < AMP
    """
    if domain is None:
        return False
    diag, off = domain
    for request in requests:
        x1, y1, x2, y2 = request["bbox"]
        width = request["width"]
        height = request["height"]
        if width <= 0 or height <= 0:
            return False
        cell = max(abs(x2 - x1) / width, abs(y1 - y2) / height)
        if cell <= 0 or not np.isfinite(cell):
            return False
        span = BLOCK * cell * diag + 2 * AMP + 2
        residual = (BLOCK / 2 + 1) * cell * off
        if span > WINDOW or residual > AMP - 0.5:
            return False
    return True
