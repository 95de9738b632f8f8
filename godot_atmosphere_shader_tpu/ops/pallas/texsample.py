"""In-kernel texture sampling for the Pallas megakernel (texture mode).

The reference's cloud pass samples a user-supplied 3D shape texture and a
coverage cubemap every march step (``cloud_funcs.gdshaderinc:10,15,45-50``).
GPUs do this with texture-unit hardware; TPUs have no per-lane gather from
arbitrary memory — XLA lowers such gathers to a ~0.1 G lookups/s scalar
path, which is why round 1 shipped texture mode as an XLA-only
compatibility path.

This module makes textures first-class in the megakernel with the gather
the hardware *does* have: ``tpu.dynamic_gather`` along lanes
(``jnp.take_along_axis(x, idx, axis=1)``), a per-element pick within each
128-lane row.  Measured ~6 G lookups/s at (32, 128) tiles — 60× the XLA
gather path.  The sampling scheme built on it:

* **Flat mip pyramid in VMEM.**  Each texture is repacked host-side into a
  ``(rows, 128)`` f32 array: every mip level stored flat
  (``lin = (z·S + y)·S + x`` for 3D, ``lin = v·W + u`` for the lat-long
  coverage map), levels concatenated.  A 64³ shape pyramid is ~1.2 MiB —
  it stays resident in VMEM for the whole kernel.
* **Per-batch windowed lookup.**  For one batch of sample positions (a
  pixel-plane at one ray knot) the kernel computes the footprint, picks the
  finest mip level whose footprint fits a ``window_rows``-row VMEM window
  (plus trilinear corner margins), loads the window with one dynamic-start
  slice, and resolves per-pixel values with a select-chain of
  (broadcast row → lane-gather → mask-accumulate) over the window rows.
* **Whole-level floor.**  A footprint that straddles the texture's wrap
  boundary is not contiguous in flat space at *any* level, so such batches
  fall back to the finest level that fits the window *entirely*
  (16³ / 64×32 by default) where scattered indices are harmless.  This is
  the documented quality floor of the in-kernel path; the XLA path remains
  the exact-sampling reference.

The mip chain also closes a round-1 parity gap: the engine mip-filters
these textures for free (VERDICT r1 "missing" #4) while our XLA sampler is
base-level only — minified views through this path are *better* filtered
than round 1's, at the cost of tile-granular (not pixel-granular) level
selection.

Coverage cubemaps are resampled to a lat-long (equirect) map at build time:
a single 2D texture needs no per-pixel face logic (face IDs diverge within
a tile, which would force 6× the sampling work) and its seams land on the
u-wrap handled by the floor mode.  Direction→(u, v) uses a polynomial
atan2/asin (Mosaic has no inverse-trig primitives); max error ~1e-5 rad ≈
1e-3 texel at 512 width.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ...utils.vecmath import Vec3

LANES = 128
#: extra zero rows appended to every pyramid so a window anchored at the last
#: level never needs clamping (a clamp would silently shift the window and
#: corrupt floor-mode lookups); must cover the largest supported window
PAD_ROWS = 64


# -- host-side pyramid packing ------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TexMeta:
    """Static (hashable) pyramid description — rides the VariantConfig so the
    kernel specializes on it while the pyramid data stays a traced input."""

    kind: str  # "tex3d" | "latlong"
    #: per level, finest first: tex3d → (S, base_row); latlong → (H, W, base_row)
    levels: Tuple[Tuple[int, ...], ...]
    rows: int

    def floor_level(self, window_rows: int) -> int:
        """Finest level whose whole data can be scanned as the wrap-safe
        fallback.  Decoupled from the windowed-mode budget (floor scans are
        1-lookup nearest, so a 32-row floor scan costs about as much as a
        16-row 8-lookup trilinear window): the floor never drops below the
        32-row level even when ``window_rows`` is smaller."""
        budget = max(window_rows, 32) * LANES
        for i, lv in enumerate(self.levels):
            if self.kind == "tex3d":
                n = lv[0] ** 3
            else:
                n = lv[0] * lv[1]
            if n <= budget:
                return i
        return len(self.levels) - 1


def _pack_flat(levels_flat) -> np.ndarray:
    total = sum(f.size for f in levels_flat)
    rows = (total + LANES - 1) // LANES + PAD_ROWS
    data = np.zeros(rows * LANES, np.float32)
    data[:total] = np.concatenate([f.ravel() for f in levels_flat])
    return data.reshape(rows, LANES)


def build_tex3d_pyramid(tex) -> Tuple[np.ndarray, TexMeta]:
    """(S, S, S) f32, S a power of two in [8, 128] → flat mip pyramid.

    Levels S, S/2, …, 8; 2× wrap-preserving box filter between levels (box
    downsampling commutes with the repeat wrap, so every level tiles).
    """
    tex = np.asarray(tex, np.float32)
    if tex.ndim != 3 or len(set(tex.shape)) != 1:
        raise ValueError(f"shape texture must be cubic, got {tex.shape}")
    s = tex.shape[0]
    if s < 8 or s > 128 or (s & (s - 1)):
        raise ValueError(f"shape texture size must be a power of two in "
                         f"[8, 128], got {s}")
    levels, metas, base = [], [], 0
    cur = tex
    while True:
        levels.append(cur)
        metas.append((cur.shape[0], base))
        base += (cur.size + LANES - 1) // LANES
        if cur.shape[0] <= 8:
            break
        h = cur.shape[0] // 2
        cur = cur.reshape(h, 2, h, 2, h, 2).mean(axis=(1, 3, 5))
    flat = []
    for lv in levels:  # pad each level to a row boundary so base_rows align
        f = lv.ravel()
        pad = (-f.size) % LANES
        flat.append(np.pad(f, (0, pad)))
    data = _pack_flat(flat)
    return data, TexMeta(kind="tex3d", levels=tuple(metas), rows=data.shape[0])


def latlong_dirs(height: int, width: int) -> Vec3:
    """Directions of lat-long texel centers (u: azimuth around y, v: north
    pole at v=0).  Matches the in-kernel polynomial mapping below."""
    u = (np.arange(width) + 0.5) / width
    v = (np.arange(height) + 0.5) / height
    theta = (u - 0.5) * (2.0 * np.pi)  # atan2(z, x)
    phi = (0.5 - v) * np.pi  # asin(y)
    ct = np.cos(theta)[None, :]
    st = np.sin(theta)[None, :]
    cp = np.cos(phi)[:, None]
    sp = np.sin(phi)[:, None] * np.ones((1, width))
    return Vec3(jnp.asarray(cp * ct, jnp.float32),
                jnp.asarray(sp, jnp.float32),
                jnp.asarray(cp * st, jnp.float32))


def build_latlong_pyramid(faces, width: int = 512) -> Tuple[np.ndarray, TexMeta]:
    """Cubemap ``(6, R, R)`` → lat-long mip pyramid ``(width, width/2)``.

    The resample goes through the seamless cubemap sampler
    (:func:`..sampling.sample_cubemap_seamless`, PARITY #10 — since r4 the
    XLA path's default too), so both paths read the same cubemap content
    and no per-face clamp error is frozen into the regrid texels; the
    lat-long re-gridding error is part of the measured texture-mode delta.
    """
    from ..sampling import extend_cubemap_borders, sample_cubemap_seamless

    if width & (width - 1) or width < 64 or width > 2048:
        raise ValueError(f"latlong width must be a power of two in "
                         f"[64, 2048], got {width}")
    height = width // 2
    faces = jnp.asarray(np.asarray(faces, np.float32))
    base_img = np.asarray(
        sample_cubemap_seamless(extend_cubemap_borders(faces),
                                latlong_dirs(height, width)),
        np.float32)
    return _pack_latlong_mips(base_img)


def _pack_latlong_mips(base_img: np.ndarray):
    """(H, W) lat-long base level → flat 2x-box-filtered mip pyramid."""
    metas, base, flat = [], 0, []
    cur = base_img
    while True:
        metas.append((cur.shape[0], cur.shape[1], base))
        f = cur.ravel()
        pad = (-f.size) % LANES
        flat.append(np.pad(f, (0, pad)))
        base += (f.size + pad) // LANES
        if cur.shape[1] <= 32:
            break
        h, w = cur.shape[0] // 2, cur.shape[1] // 2
        cur = cur.reshape(h, 2, w, 2).mean(axis=(1, 3))
    data = _pack_flat(flat)
    return data, TexMeta(kind="latlong", levels=tuple(metas),
                         rows=data.shape[0])


def build_equirect_pyramid(img, width: int = 512):
    """Equirect RGB panorama ``(H, W, 3)`` → per-channel lat-long pyramids.

    The panorama-sky path (``OpaqueScene.panorama``,
    ``demo/planet_atmosphere_test.tscn`` PanoramaSkyMaterial): the image is
    resampled host-side to the power-of-two lat-long grid the in-kernel
    sampler expects (bilinear, u wraps / v clamps, texel centers at
    ``(i+0.5)/N``), then packed like the coverage pyramid — one pyramid per
    channel sharing a single :class:`TexMeta`.

    Returns ``((data_r, data_g, data_b), meta)``.
    """
    img = np.asarray(img, np.float32)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"panorama must be (H, W, 3), got {img.shape}")
    if width & (width - 1) or width < 64 or width > 2048:
        raise ValueError(f"latlong width must be a power of two in "
                         f"[64, 2048], got {width}")
    height = width // 2
    h_in, w_in, _ = img.shape

    # host bilinear resample onto the target grid (u wrap, v clamp)
    u = (np.arange(width) + 0.5) / width
    v = (np.arange(height) + 0.5) / height
    pu = u * w_in - 0.5
    pv = np.clip(v * h_in - 0.5, 0.0, h_in - 1.0)
    x0 = np.floor(pu).astype(np.int64)
    y0 = np.floor(pv).astype(np.int64)
    fx = (pu - x0)[None, :, None]
    fy = (pv - y0)[:, None, None]
    x0w = np.mod(x0, w_in)
    x1w = np.mod(x0 + 1, w_in)
    y0c = y0
    y1c = np.minimum(y0 + 1, h_in - 1)
    top = img[y0c][:, x0w] * (1 - fx) + img[y0c][:, x1w] * fx
    bot = img[y1c][:, x0w] * (1 - fx) + img[y1c][:, x1w] * fx
    resampled = top * (1 - fy) + bot * fy

    datas, meta = [], None
    for c in range(3):
        d, meta = _pack_latlong_mips(np.ascontiguousarray(resampled[..., c]))
        datas.append(d)
    return tuple(datas), meta


# -- polynomial inverse trig (Mosaic has no atan/asin) ------------------------


def _atan_unit(t):
    """atan on [0, 1], minimax polynomial, max err ~1e-5 rad."""
    t2 = t * t
    p = -0.0851330 + 0.0208351 * t2
    p = 0.1801410 + t2 * p
    p = -0.3302995 + t2 * p
    p = 0.9998660 + t2 * p
    return t * p


def atan2_poly(y, x):
    """Branch-free polynomial atan2; range (-π, π]."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    a = _atan_unit(t)
    a = jnp.where(ay > ax, (np.pi / 2) - a, a)  # octant fold
    a = jnp.where(x < 0.0, np.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def asin_poly(y):
    """asin via atan2(y, √(1−y²)); y clipped to [-1, 1]."""
    y = jnp.clip(y, -1.0, 1.0)
    return atan2_poly(y, jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)))


# -- in-kernel samplers -------------------------------------------------------


def _window_lookup(tab_ref, start_row, rel_lin_weights, window_rows: int,
                   rows: int):
    """Resolve per-pixel lookups via the windowed select-chain.

    ``rel_lin_weights``: list of ``(rel_lin, weight)`` — flat indices
    relative to ``start_row·128`` plus their blend weights.  Returns
    Σ weightᵢ·tab[start_row·128 + rel_linᵢ].  Per window row: one
    dynamic-start single-row load, broadcast, then one lane-gather per
    lookup whose row matches (``tpu.dynamic_gather``), mask-accumulated —
    the measured ~6 G lookups/s primitive.  The row loop is a
    ``lax.fori_loop``, NOT unrolled: a frame's worth of batches at
    window_rows=48 unrolled to a Mosaic program too large to compile
    (>30 min through the remote service); rolled it compiles in normal time
    at the same runtime cost (the body is load-bound either way).
    """
    if window_rows > PAD_ROWS:
        raise ValueError(f"window_rows {window_rows} exceeds the pyramid "
                         f"padding ({PAD_ROWS})")
    if window_rows % 8:
        raise ValueError("window_rows must be a multiple of 8 (vreg chunks)")
    start_row = jnp.clip(start_row, 0, rows - window_rows)
    shape = rel_lin_weights[0][0].shape
    rcs = [(lin >> 7, lin & 127, w) for lin, w in rel_lin_weights]

    # rows actually addressed: spans are usually far below the static window
    # budget (the budget is sized for corner margins at the worst level), so
    # the chunk loop trip count is dynamic
    r_hi = rcs[0][0]
    for r, _, _ in rcs[1:]:
        r_hi = jnp.maximum(r_hi, r)
    n_chunks = (jnp.clip(jnp.max(r_hi), 0, window_rows - 1) >> 3) + 1

    def body(j, acc):
        # one (8,128) vreg load per 8 rows — per-row loads dominated the
        # first cut (measured ~5x whole-batch overhead); static sublane
        # broadcasts off one loaded vreg are near-free
        chunk = tab_ref[pl.dslice(start_row + (j << 3), 8), :]
        for kk in range(8):
            rowk = jnp.broadcast_to(chunk[kk:kk + 1, :], shape)
            k = (j << 3) + kk
            for r, c, w in rcs:
                g = jnp.take_along_axis(rowk, c, axis=len(shape) - 1)
                acc = acc + jnp.where(r == k, g * w, 0.0)
        return acc

    return jax.lax.fori_loop(0, n_chunks, body,
                             jnp.zeros(shape, jnp.float32))


def _level_scalars(meta: TexMeta, fits, floor_idx: int):
    """Fold the per-level fit flags into the selected level's scalars.

    ``fits[i]`` — traced bool, whether level i works in windowed mode.
    Returns (sel_idx, windowed) where sel_idx is a traced int32 index into
    ``meta.levels`` and windowed is a traced bool (False ⇒ the static floor
    level in whole-level mode).
    """
    sel = jnp.int32(floor_idx)
    windowed = jnp.asarray(False)
    for i in range(len(meta.levels) - 1, -1, -1):  # coarse→fine: finest wins
        sel = jnp.where(fits[i], jnp.int32(i), sel)
        windowed = jnp.logical_or(windowed, fits[i])
    return sel, windowed


def _select_by_level(sel_idx, values):
    """where-chain a static per-level constant list down to one scalar."""
    out = jnp.float32(values[-1])
    for i in range(len(values) - 2, -1, -1):
        out = jnp.where(sel_idx == i, jnp.float32(values[i]), out)
    return out


def sample_tex3d(tab_ref, meta: TexMeta, x, y, z, window_rows: int = 48,
                 band_rows: int = 16, band_max_slices: int = 32):
    """Trilinear 3D sample with repeat wrap at a tile-adaptive mip level.

    ``x, y, z``: planes in period units (1.0 = one texture repeat), matching
    :func:`...ops.sampling.sample_trilinear_repeat` semantics at level 0.

    Three modes, finest applicable level wins (ROADMAP #9):

    * **windowed** — the whole footprint's flat span fits one contiguous
      ``window_rows`` window: one dynamic-start window, 8 lane-gather
      lookups.  The common case.
    * **banded** — the (y, x) footprint is compact but the z span's ``S²``
      flat pitch blows the contiguous window (the 1:1 close-up case, where
      windowed mode used to mip down 2+ levels): loop the z-slices the batch
      touches, each with its own ``band_rows`` window anchored at that
      slice's (y, x) origin; trilinear corners accumulate into the slice
      their z-index matches.  Costs ``n_slices`` dynamic-start band scans —
      engaged only where windowed mode would lose resolution, i.e. exactly
      where the reference's per-pixel hardware LOD would stay at a finer
      level (``cloud_funcs.gdshaderinc:49`` samples at native LOD).
      ``band_max_slices`` caps the cost (a footprint spanning more slices
      than that is genuinely minified, so mip-down is correct).
      ``band_rows=0`` disables the mode.
    * **floor** — wrap-straddling batches: nearest sample from the static
      whole-level floor (unchanged).
    """
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    fz = z - jnp.floor(z)

    # footprint scalars (period units)
    mins = [jnp.min(f) for f in (fx, fy, fz)]
    maxs = [jnp.max(f) for f in (fx, fy, fz)]

    fits = []
    fits_band = []
    for (S, base) in meta.levels:
        # windowed mode needs: no wrap (i0 ≥ 0 and i1 ≤ S-1 per axis) and
        # the flat span + corner margin within the window
        ok = jnp.asarray(True)
        span = jnp.float32(0.0)
        spans_ax = []
        for ax, (mn, mx) in enumerate(zip(mins, maxs)):
            i_lo = jnp.floor(mn * S - 0.5)
            i_hi = jnp.floor(mx * S - 0.5) + 1.0
            ok = jnp.logical_and(ok, i_lo >= 0.0)
            ok = jnp.logical_and(ok, i_hi <= S - 1.0)
            pitch = float(S ** ax)  # x·1, y·S, z·S² (lin = (z·S + y)·S + x)
            span = span + (i_hi - i_lo) * pitch
            spans_ax.append(i_hi - i_lo)
        # The window start is aligned DOWN to a 128 boundary (off =
        # (lin_min >> 7) << 7), so the max relative index is
        # span + (lin_min mod 128) — reserve LANES-1 slack or near-budget
        # footprints on unaligned bases silently drop their last corner
        # weights past the window (ADVICE r2 high).
        fits.append(jnp.logical_and(
            ok, span + (LANES - 1) <= window_rows * LANES - 1))
        # banded mode: per-slice (y, x) span within the band budget (same
        # alignment slack) and a bounded slice count
        yx_span = spans_ax[1] * float(S) + spans_ax[0]
        fits_band.append(jnp.logical_and(
            jnp.logical_and(
                ok, yx_span + (LANES - 1) <= band_rows * LANES - 1),
            spans_ax[2] + 1.0 <= band_max_slices)
            if band_rows else jnp.asarray(False))
    floor_idx = meta.floor_level(window_rows)
    sel, windowed = _level_scalars(meta, fits, floor_idx)
    sel_b, banded = _level_scalars(meta, fits_band, floor_idx)
    # banding engages only when it reaches a strictly finer level than the
    # contiguous window can (equal level → windowed is cheaper)
    use_band = jnp.logical_and(
        banded, jnp.logical_or(jnp.logical_not(windowed), sel_b < sel))

    def windowed_branch():
        # finest fitting level, full trilinear within one contiguous window
        S = _select_by_level(sel, [lv[0] for lv in meta.levels])
        base_row = _select_by_level(sel, [lv[1] for lv in meta.levels])
        Si = S.astype(jnp.int32)

        def prep(f):
            t = f * S - 0.5
            i0 = jnp.floor(t)
            frac = t - i0
            return i0.astype(jnp.int32), frac

        x0, wx = prep(fx)
        y0, wy = prep(fy)
        z0, wz = prep(fz)
        x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1  # no wrap by construction

        lin00 = (z0 * Si + y0) * Si  # x added per corner
        lin01 = (z0 * Si + y1) * Si
        lin10 = (z1 * Si + y0) * Si
        lin11 = (z1 * Si + y1) * Si

        lin_min = jnp.min(jnp.minimum(jnp.minimum(lin00, lin01),
                                      jnp.minimum(lin10, lin11)) + x0)
        start_in_level = lin_min >> 7
        start_row = base_row.astype(jnp.int32) + start_in_level
        off = start_in_level << 7

        lookups = [
            (lin00 + x0 - off, (1 - wz) * (1 - wy) * (1 - wx)),
            (lin00 + x1 - off, (1 - wz) * (1 - wy) * wx),
            (lin01 + x0 - off, (1 - wz) * wy * (1 - wx)),
            (lin01 + x1 - off, (1 - wz) * wy * wx),
            (lin10 + x0 - off, wz * (1 - wy) * (1 - wx)),
            (lin10 + x1 - off, wz * (1 - wy) * wx),
            (lin11 + x0 - off, wz * wy * (1 - wx)),
            (lin11 + x1 - off, wz * wy * wx),
        ]
        return _window_lookup(tab_ref, start_row, lookups, window_rows,
                              meta.rows)

    def banded_branch():
        S = _select_by_level(sel_b, [lv[0] for lv in meta.levels])
        base_row = _select_by_level(sel_b, [lv[1] for lv in meta.levels])
        Si = S.astype(jnp.int32)

        def prep(f):
            t = f * S - 0.5
            i0 = jnp.floor(t)
            frac = t - i0
            return i0.astype(jnp.int32), frac

        x0, wx = prep(fx)
        y0, wy = prep(fy)
        z0, wz = prep(fz)
        x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1  # no wrap by construction

        iy_lo = jnp.min(y0)
        ix_lo = jnp.min(x0)
        iz_lo = jnp.min(z0)
        n_slices = jnp.max(z1) - iz_lo + 1

        # corner (z-index, in-slice lin, weight); in-slice lin is relative to
        # the slice origin (iy_lo, ix_lo), identical across slices
        yx00 = (y0 - iy_lo) * Si + (x0 - ix_lo)
        yx01 = (y1 - iy_lo) * Si + (x0 - ix_lo)
        corners = [
            (z0, yx00, (1 - wz) * (1 - wy) * (1 - wx)),
            (z0, yx00 + 1, (1 - wz) * (1 - wy) * wx),
            (z0, yx01, (1 - wz) * wy * (1 - wx)),
            (z0, yx01 + 1, (1 - wz) * wy * wx),
            (z1, yx00, wz * (1 - wy) * (1 - wx)),
            (z1, yx00 + 1, wz * (1 - wy) * wx),
            (z1, yx01, wz * wy * (1 - wx)),
            (z1, yx01 + 1, wz * wy * wx),
        ]

        def slice_body(k, acc):
            zk = iz_lo + k
            lin_org = (zk * Si + iy_lo) * Si + ix_lo
            start_in_level = lin_org >> 7
            align = lin_org - (start_in_level << 7)  # ≤ LANES-1 slack
            lookups = []
            for zc, yx, w in corners:
                match = zc == zk
                lookups.append((jnp.where(match, yx + align, 0),
                                jnp.where(match, w, 0.0)))
            return acc + _window_lookup(
                tab_ref, base_row.astype(jnp.int32) + start_in_level,
                lookups, band_rows, meta.rows)

        return jax.lax.fori_loop(0, n_slices, slice_body,
                                 jnp.zeros(fx.shape, jnp.float32))

    def floor_branch():
        # wrap-straddling batch: scattered flat indices, so scan the whole
        # (static) floor level — and sample NEAREST, not trilinear: one
        # lookup instead of eight.  Floor batches are exactly the ones where
        # the sampling rate is ≥1 texel/sample (a straddle means the batch
        # spans a whole period), so point sampling matches the information
        # content; the 8× cheaper scan is what keeps texture mode within
        # its perf envelope (measured: floor scans dominate far views).
        S_f, base_f = meta.levels[floor_idx]

        def near(f):
            return jnp.bitwise_and(jnp.floor(f * S_f).astype(jnp.int32),
                                   S_f - 1)

        lin = (near(fz) * S_f + near(fy)) * S_f + near(fx)
        level_rows = max((S_f ** 3 + LANES - 1) // LANES, 8)
        one = jnp.ones(lin.shape, jnp.float32)
        return _window_lookup(tab_ref, jnp.int32(base_f), [(lin, one)],
                              level_rows, meta.rows)

    def not_banded():
        return jax.lax.cond(windowed, windowed_branch, floor_branch)

    if not band_rows:
        return not_banded()
    return jax.lax.cond(use_band, banded_branch, not_banded)


def sample_latlong(tab_ref, meta: TexMeta, d: Vec3, window_rows: int = 32):
    """Bilinear lat-long sample of a direction (the cubemap replacement).

    u wraps (azimuth seam → whole-level floor mode), v clamps at the poles.
    """
    u = atan2_poly(d.z, d.x) * (1.0 / (2.0 * np.pi)) + 0.5
    v = 0.5 - asin_poly(d.y) * (1.0 / np.pi)

    fu = u - jnp.floor(u)
    umin, umax = jnp.min(fu), jnp.max(fu)
    vmin, vmax = jnp.min(v), jnp.max(v)

    fits = []
    for (Hl, Wl, base) in meta.levels:
        iu_lo = jnp.floor(umin * Wl - 0.5)
        iu_hi = jnp.floor(umax * Wl - 0.5) + 1.0
        iv_lo = jnp.maximum(jnp.floor(vmin * Hl - 0.5), 0.0)
        iv_hi = jnp.minimum(jnp.floor(vmax * Hl - 0.5) + 1.0, Hl - 1.0)
        ok = jnp.logical_and(iu_lo >= 0.0, iu_hi <= Wl - 1.0)
        span = (iv_hi - iv_lo) * float(Wl) + (iu_hi - iu_lo)
        # same LANES-1 alignment slack as sample_tex3d (window start is
        # 128-aligned down from lin_min)
        fits.append(jnp.logical_and(
            ok, span + (LANES - 1) <= window_rows * LANES - 1))
    floor_idx = meta.floor_level(window_rows)
    sel, windowed = _level_scalars(meta, fits, floor_idx)

    def windowed_branch():
        Hs = _select_by_level(sel, [lv[0] for lv in meta.levels])
        Ws = _select_by_level(sel, [lv[1] for lv in meta.levels])
        base_row = _select_by_level(sel, [lv[2] for lv in meta.levels])
        Wi = Ws.astype(jnp.int32)
        Hi = Hs.astype(jnp.int32)

        tu = fu * Ws - 0.5
        u0f = jnp.floor(tu)
        wu = tu - u0f
        u0 = u0f.astype(jnp.int32)
        u1 = u0 + 1  # no wrap by construction

        tv = v * Hs - 0.5
        v0f = jnp.clip(jnp.floor(tv), 0.0, Hs - 1.0)
        wv = jnp.clip(tv - v0f, 0.0, 1.0)
        v0 = v0f.astype(jnp.int32)
        v1 = jnp.minimum(v0 + 1, Hi - 1)

        lin0 = v0 * Wi
        lin1 = v1 * Wi
        lin_min = jnp.min(jnp.minimum(lin0, lin1) + u0)
        start_in_level = lin_min >> 7
        start_row = base_row.astype(jnp.int32) + start_in_level
        off = start_in_level << 7

        lookups = [
            (lin0 + u0 - off, (1 - wv) * (1 - wu)),
            (lin0 + u1 - off, (1 - wv) * wu),
            (lin1 + u0 - off, wv * (1 - wu)),
            (lin1 + u1 - off, wv * wu),
        ]
        return _window_lookup(tab_ref, start_row, lookups, window_rows,
                              meta.rows)

    def floor_branch():
        # azimuth-seam straddle: nearest sample from the static floor level
        # (same 8x-cheaper scan rationale as the 3D sampler)
        H_f, W_f, base_f = meta.levels[floor_idx]
        un = jnp.bitwise_and(jnp.floor(fu * W_f).astype(jnp.int32), W_f - 1)
        vn = jnp.clip(jnp.floor(v * H_f).astype(jnp.int32), 0, H_f - 1)
        lin = vn * W_f + un
        level_rows = max((H_f * W_f + LANES - 1) // LANES, 8)
        one = jnp.ones(lin.shape, jnp.float32)
        return _window_lookup(tab_ref, jnp.int32(base_f), [(lin, one)],
                              level_rows, meta.rows)

    return jax.lax.cond(windowed, windowed_branch, floor_branch)
