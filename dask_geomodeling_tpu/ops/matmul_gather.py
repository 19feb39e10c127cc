"""Exact nearest-neighbour warp gather via candidate axis-gather slices.

XLA's general 2-D gather on TPU is element-latency bound: ~0.3-0.5 s for
a 64-tile batch of 512^2 gathers from an 8192^2 float32 source, which
made the cross-CRS warp the hottest op of the tile runtime.  Axis
gathers — ``v[:, idx1d, :]`` with a traced 1-D index vector — lower to
fast slice copies instead (same batch: the whole same-CRS pipeline runs
in ~0.05 s), so the fast path expresses the warp entirely in axis
gathers plus elementwise selects.

A warp's index field is smooth: within a 128x128 output block the source
row index varies along the output column only by a few pixels (CRS
rotation/shear), and vice versa.  That makes the gather *separable up to
a small residual*:

    rows[i, j] = Ri[i] + a(i, j),   |a| <= AMP
    cols[i, j] = Cj[j] + b(i, j),   |b| <= AMP

with per-block anchors Ri/Cj read from the index field itself.  All
(2*AMP+1)^2 candidate values are materialized with two chained axis
gathers per candidate column offset —

    C_b   = win[:, :, Cj + b]          # (bands, W, B)  axis gather
    G_a_b = C_b[:, Ri + a, :]          # (bands, B, B)  axis gather
    out[i, j] = G_{a(i,j), b(i,j)}[i, j]   # 49 selects, VPU

— against a per-tile source window that is itself extracted with two
chained axis gathers (slice copies move only the selected bytes, so the
whole thing is bandwidth- not latency-bound; measured 0.107 s for the
64-tile batch above, ~4x the one-hot-matmul formulation this module
originally used and ~3-5x XLA's gather).  Slice copies preserve values
bit-exactly for EVERY dtype — NaN/Inf payloads included — so there is no
precision machinery and no dtype restriction.

The caller must guarantee the smoothness contract (residuals within AMP,
the tile's source span within WINDOW); `gather_domain` bounds the index
field's Jacobian for a CRS pair on the host so the tile runtime can check
each batch of requests cheaply and fall back to the plain gather outside
the domain (runtime/tiles.py).  Outside-source pixels are pinned to their
block anchors so they never violate the contract; the caller overwrites
them with the fill value via its `inside` mask, as with the plain gather.

Replaces the hot loop of the reference's ``gdal.ReprojectImage``
(reference raster/sources.py:133-144) — there is no reference analog of
the decomposition itself; it is how a gather becomes a bandwidth-bound
TPU workload.
"""
import numpy as np

__all__ = [
    "AMP",
    "BLOCK",
    "GATHER_MODES",
    "GATHER_MODE_ORDER",
    "WINDOW",
    "gather_matmul_eligible",
    "gather_matmul_jax",
    "gather_domain",
    "requests_in_domain",
]

#: output block edge (anchor granularity)
BLOCK = 128
#: per-TILE source window edge (static; must cover the tile's source
#: span + 2*AMP; extracted with fast axis gathers)
WINDOW = 1024
#: max |residual| between an index and its block anchor
AMP = 3

#: trace-time gather-mode strings -> (block, amp); the single source of
#: truth shared by the warp (trace side) and the tile runtime (host-side
#: domain checks).  Candidate select traffic scales with (2*amp+1)^2
#: over the whole tile regardless of block size, so the runtime prefers
#: the smallest amp whose residual bound holds — and the residual bound
#: itself scales with block/2, so a smaller block unlocks a smaller amp
#: (b64-a1: 9 candidates vs the 7x7 engine's 49)
GATHER_MODES = {
    "matmul-b64-a1": (64, 1),
    "matmul-a2": (BLOCK, 2),
    "matmul": (BLOCK, AMP),
}

#: preference order: cheapest candidate count first
GATHER_MODE_ORDER = sorted(
    GATHER_MODES, key=lambda mode: (GATHER_MODES[mode][1], -GATHER_MODES[mode][0])
)


def gather_matmul_eligible(values_dtype, src_shape, height, width):
    """Static eligibility: any dtype (slice copies are bit-exact); only
    degenerate shapes are rejected.  Sources smaller than the window work
    via index clipping; non-block-aligned outputs (halo-expanded stencil
    tiles) are padded internally."""
    return height > 0 and width > 0


def gather_matmul_jax(values, rows, cols, inside, amp=AMP, block=BLOCK):
    """``values[:, rows, cols]`` for one tile, via candidate axis gathers.

    values: (bands, src_h, src_w); rows/cols: (h, w) int32 (any values at
    ``~inside`` positions); inside: (h, w) bool.  Returns (bands, h, w) of
    values.dtype; ~inside cells carry unspecified values (caller fills).
    Requires :func:`gather_matmul_eligible` and the smoothness contract
    for the given ``amp``/``block`` (candidate traffic scales with
    (2*amp+1)^2, so the runtime prefers the smallest amp whose residual
    bound holds; a smaller anchor block tightens that bound).
    """
    amp2 = 2 * amp + 1
    import jax
    import jax.numpy as jnp

    BLOCK = block  # anchor-block edge for this call
    bands, src_h, src_w = values.shape
    height, width = rows.shape
    # pad halo-expanded (non-block-aligned) outputs to the block grid;
    # pad pixels are outside, so they pin to the anchors and cost nothing
    # but extra block area, and are cropped before returning
    pad_h = (-height) % BLOCK
    pad_w = (-width) % BLOCK
    if pad_h or pad_w:
        rows = jnp.pad(rows, ((0, pad_h), (0, pad_w)), mode="edge")
        cols = jnp.pad(cols, ((0, pad_h), (0, pad_w)), mode="edge")
        inside = jnp.pad(inside, ((0, pad_h), (0, pad_w)))
    full_h, full_w = height + pad_h, width + pad_w
    nb_i, nb_j = full_h // BLOCK, full_w // BLOCK
    values = jnp.asarray(values)
    rows = rows.astype(jnp.int32)
    cols = cols.astype(jnp.int32)

    # one per-TILE source window, extracted with two chained AXIS gathers
    # (traced 1-D index vectors -> fast slice copies); everything after
    # addresses the window, clipped into range (clipped/aliased values
    # are never selected: a candidate only wins when the true index
    # equals anchor+offset, which is in range by the contract)
    big = jnp.int32(2**30)
    r_in = jnp.where(inside, rows, big)
    c_in = jnp.where(inside, cols, big)
    r_base = jnp.clip(
        jnp.min(r_in) - amp, 0, max(src_h - WINDOW, 0)
    ).astype(jnp.int32)
    c_base = jnp.clip(
        jnp.min(c_in) - amp, 0, max(src_w - WINDOW, 0)
    ).astype(jnp.int32)
    row_idx = jnp.clip(
        r_base + jnp.arange(WINDOW, dtype=jnp.int32), 0, src_h - 1
    )
    col_idx = jnp.clip(
        c_base + jnp.arange(WINDOW, dtype=jnp.int32), 0, src_w - 1
    )
    win = values[:, row_idx, :][:, :, col_idx]  # (bands, WINDOW, WINDOW)
    lrows = rows - r_base
    lcols = cols - c_base

    mid_pen_j = jnp.abs(jnp.arange(BLOCK, dtype=jnp.int32) - BLOCK // 2)
    offsets = jnp.arange(-amp, amp + 1, dtype=jnp.int32)

    def one_block(p, q):
        # fully unrolled static blocks: just TWO axis gathers per block
        # (all candidate offsets stacked into the index vectors) plus
        # static-slice selects — lax.map over blocks serializes the
        # schedule and measured 5x slower than this
        i0 = p * BLOCK
        j0 = q * BLOCK
        r = lrows[i0 : i0 + BLOCK, j0 : j0 + BLOCK]
        c = lcols[i0 : i0 + BLOCK, j0 : j0 + BLOCK]
        ins = inside[i0 : i0 + BLOCK, j0 : j0 + BLOCK]

        # anchors: the index at the inside pixel nearest the block middle
        # of each row/column (inside cells are contiguous per line, so
        # every inside cell stays within BLOCK/2 of its anchor).  Lines
        # with no inside pixel take the block's overall nearest-inside
        # index as a benign reference.
        pen_row = jnp.where(ins, mid_pen_j[None, :], jnp.int32(2 * BLOCK))
        jstar = jnp.argmin(pen_row, axis=1)
        ri = r[jnp.arange(BLOCK), jstar]  # (BLOCK,) row anchor per out row
        pen_col = jnp.where(ins, mid_pen_j[:, None], jnp.int32(2 * BLOCK))
        istar = jnp.argmin(pen_col, axis=0)
        cj = c[istar, jnp.arange(BLOCK)]  # (BLOCK,) col anchor per out col
        flat_star = jnp.argmax(ins.reshape(-1))  # first inside pixel
        ri = jnp.where(ins.any(axis=1), ri, r.reshape(-1)[flat_star])
        cj = jnp.where(ins.any(axis=0), cj, c.reshape(-1)[flat_star])

        # pin outside pixels to the anchors: zero residual, never selects
        r_eff = jnp.where(ins, r, ri[:, None])
        c_eff = jnp.where(ins, c, cj[None, :])
        # clip residuals into the candidate range so a violated smoothness
        # contract (host-side domain check underestimating the residual)
        # degrades to an at-most-amp-px-off nearest neighbour instead of
        # leaving the zeros initializer in the output
        da = jnp.clip(r_eff - ri[:, None], -amp, amp)
        db = jnp.clip(c_eff - cj[None, :], -amp, amp)

        # stacked candidate index vectors: one gather per axis brings in
        # every (a, b) combination; G[a, b] is then a static slice
        rowsel = jnp.clip(
            (offsets[:, None] + ri[None, :]).reshape(-1), 0, WINDOW - 1
        )  # (AMP2 * BLOCK,)
        colsel = jnp.clip(
            (offsets[:, None] + cj[None, :]).reshape(-1), 0, WINDOW - 1
        )
        c_all = win[:, :, colsel]  # (bands, WINDOW, amp2*BLOCK)
        g_all = c_all[:, rowsel, :]  # (bands, amp2*BLOCK, amp2*BLOCK)

        out = jnp.zeros((bands, BLOCK, BLOCK), win.dtype)
        for a in range(amp2):
            ga = g_all[:, a * BLOCK : (a + 1) * BLOCK, :]
            mask_a = da == (a - amp)
            for b in range(amp2):
                g_ab = ga[:, :, b * BLOCK : (b + 1) * BLOCK]
                mask = mask_a & (db == (b - amp))
                out = jnp.where(mask[None], g_ab, out)
        return out

    return jnp.concatenate(
        [
            jnp.concatenate(
                [one_block(p, q) for q in range(nb_j)], axis=2
            )
            for p in range(nb_i)
        ],
        axis=1,
    )[:, :height, :width]


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


def requests_in_domain(domain, requests, amp=AMP, block=BLOCK):
    """Whether every request's tile satisfies the smoothness contract.

    ``domain`` comes from :func:`gather_domain`; requests carry bbox and
    width/height.  Checks (conservatively, both axes):

    - tile span: the request's output extent at the diagonal rate +
      residuals + 2 must fit the per-tile WINDOW
    - residual: block/2 output px at the off-diagonal rate stays < amp
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
        # a rotated tile's source span picks up the off-diagonal term
        # too: rows drift by width*cell*off across the columns
        span = max(width, height) * cell * (diag + off) + 2 * amp + 2
        residual = (block / 2 + 1) * cell * off
        if span > WINDOW or residual > amp - 0.5:
            return False
    return True
