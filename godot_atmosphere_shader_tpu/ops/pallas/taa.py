"""Temporal accumulation (TAA) resolve kernel — a capability the reference
explicitly lacks.

The reference can't reproject between frames (engine limitation,
``planet_atmosphere_main.gdshaderinc:39-48``), which is WHY it runs low
step counts with blue-noise jitter and recommends FXAA.  A TPU renderer
controls its whole frame loop, so it can do what the reference wished for:
re-use last frame's shading.  Each output frame blends the current jittered
render with the previous *resolved* frame reprojected through the camera
motion; with per-frame jitter decorrelation (``VariantConfig.
temporal_jitter``) the accumulated sequence converges toward the
jitter-expectation and frame-to-frame shimmer drops ~4× (measured in
``tests/test_taa.py``).  Note what it does NOT buy: the march is a
nonlinear estimator, so averaging jittered low-step frames does not
reproduce a high-step render — TAA here is temporal stability, the thing
the reference papers over with FXAA.

Kernel structure (per 32×128 tile):

1. Reconstruct per-pixel world positions from the current linear depth and
   camera (the megakernel's ray math), project them through the PREVIOUS
   frame's camera to history pixel coordinates.
2. One dynamic-offset async DMA per channel pulls a history window
   (tile + motion margin) from HBM into VMEM scratch — the history image
   is far too large for VMEM, but a tile's reprojected footprint is just
   its own area plus camera motion.
3. Per-pixel bilinear resolve from the window via the same chunked
   lane-gather scan as the texture samplers (``texsample._window_lookup``
   pattern; the window is 256 lanes wide, so each gather selects between
   two 128-lane blocks).
4. Neighborhood clamp (3×3 min/max of the current tile) suppresses
   ghosting from disocclusions — the standard TAA validity heuristic,
   branch-free.  Out-of-frame / behind-camera reprojections fall back to
   the current sample.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.camera import Camera
from ...utils.vecmath import Vec3, normalize

#: history window fetched per tile: tile (32 rows / 128 cols) + DMA
#: alignment waste (rows %8, cols %128) + motion margin
WIN_ROWS = 64
WIN_COLS = 384


def _taa_kernel(scal_ref, cr_ref, cg_ref, cb_ref, ld_ref,
                hr_ref, hg_ref, hb_ref, hd_ref,
                or_ref, og_ref, ob_ref,
                wr, wg, wb, wd, sems, *, height, width, bh, bw,
                win_rows, win_cols, clamp_mode, hist_rows, h_local):
    aspect = width / height

    # ---- current-frame ray math (megakernel conventions) ----
    # row0 (scalar 33): global row of this call's first row — nonzero when
    # resolving one shard's band of a row-sharded frame; hist_row0 (scalar
    # 34): global row of the history array's first row (band start − halo).
    # Both are exactly 0.0 single-chip, where every added/subtracted term
    # below is a bitwise no-op — the sharded and unsharded kernels share
    # this one code path.
    row0f = scal_ref[0, 33]
    hist_row0f = scal_ref[0, 34]
    by = pl.program_id(0)
    bx = pl.program_id(1)
    iy = (by * bh + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
          ).astype(jnp.float32) + row0f
    ix = (bx * bw + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
          ).astype(jnp.float32)
    ndc_x = 2.0 * (ix + 0.5) / width - 1.0
    ndc_y = 1.0 - 2.0 * (iy + 0.5) / height
    inv_fy = scal_ref[0, 28]
    dv = normalize(Vec3(ndc_x * (aspect * inv_fy), ndc_y * inv_fy,
                        jnp.full((bh, bw), -1.0, jnp.float32)))
    r = [scal_ref[0, 16 + i] for i in range(9)]  # cur cam rotation
    dirx = r[0] * dv.x + r[1] * dv.y + r[2] * dv.z
    diry = r[3] * dv.x + r[4] * dv.y + r[5] * dv.z
    dirz = r[6] * dv.x + r[7] * dv.y + r[8] * dv.z
    cam = [scal_ref[0, 25 + i] for i in range(3)]
    # partial edge tiles: rows/cols beyond the image are uninitialized —
    # they must not poison the window-base reductions or the clamp rolls.
    # The row bound is the LOCAL band extent (iy − row0 < h_local), not the
    # global frame height: an interior shard's pad rows sit below its band
    # but still inside the frame, so a global check would admit them
    # (ADVICE r4).  Single-chip, row0 == 0 and h_local == height — identical.
    pad_ok = jnp.logical_and(iy - row0f < h_local, ix < width)
    # sky pixels carry the opaque pass's 3e38 sentinel; at 1e7 the
    # reprojection is already rotation-only to f32 precision, and anything
    # bigger overflows the world->view multiply-adds into NaN
    ld = jnp.minimum(jnp.where(pad_ok, ld_ref[:], 1.0), 1.0e7)
    wx = cam[0] + dirx * ld
    wy = cam[1] + diry * ld
    wz = cam[2] + dirz * ld

    # ---- project into the previous camera ----
    w2v = [scal_ref[0, i] for i in range(16)]  # row-major 4x4
    vx = w2v[0] * wx + w2v[1] * wy + w2v[2] * wz + w2v[3]
    vy = w2v[4] * wx + w2v[5] * wy + w2v[6] * wz + w2v[7]
    vz = w2v[8] * wx + w2v[9] * wy + w2v[10] * wz + w2v[11]
    inv_fy_prev = scal_ref[0, 29]
    blend = scal_ref[0, 30]
    neg_z = jnp.maximum(-vz, 1e-6)
    pndc_x = (vx / neg_z) / (aspect * inv_fy_prev)
    pndc_y = (vy / neg_z) / inv_fy_prev
    px = (pndc_x + 1.0) * 0.5 * width - 0.5
    py = (1.0 - pndc_y) * 0.5 * height - 0.5

    valid = (vz < -1e-3)
    valid = jnp.logical_and(valid, px >= 0.0)
    valid = jnp.logical_and(valid, px <= width - 1.0)
    valid = jnp.logical_and(valid, py >= 0.0)
    valid = jnp.logical_and(valid, py <= height - 1.0)

    # ---- fetch the history window (dynamic-offset DMA per channel) ----
    # DMA offsets must be tile-aligned (sublane 8, lane 128); the window
    # margins absorb the alignment waste.  The base reduction only sees
    # VALID reprojections — one behind-camera pixel (neg_z clamped to 1e-6
    # → huge coordinates) must not drag the window away from the pixels
    # that do have history (ADVICE r2); invalid pixels fall back to their
    # own on-screen position so an all-invalid tile windows itself.
    # history-local row coordinates (global − hist_row0; bitwise identity
    # when hist_row0 == 0): the window DMA and bilinear address the history
    # ARRAY, which in sharded mode is just the halo'd local band
    pyl = py - hist_row0f
    iyl = iy - hist_row0f
    py_base = jnp.where(valid, pyl, iyl)
    px_base = jnp.where(valid, px, ix)
    ry0 = jnp.clip(jnp.floor(jnp.min(py_base)).astype(jnp.int32) - 2,
                   0, hist_rows - win_rows)
    ry0 = pl.multiple_of((ry0 >> 3) << 3, 8)
    rx0 = jnp.clip(jnp.floor(jnp.min(px_base)).astype(jnp.int32) - 8,
                   0, width - win_cols)
    rx0 = pl.multiple_of((rx0 >> 7) << 7, 128)
    copies = []
    for i, (h_ref, w_ref) in enumerate(((hr_ref, wr), (hg_ref, wg),
                                        (hb_ref, wb), (hd_ref, wd))):
        dma = pltpu.make_async_copy(
            h_ref.at[pl.dslice(ry0, win_rows), pl.dslice(rx0, win_cols)],
            w_ref, sems.at[i])
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()

    # window-relative coordinates; out-of-window → invalid (extreme motion)
    ryf = pyl - ry0.astype(jnp.float32)
    rxf = px - rx0.astype(jnp.float32)
    valid = jnp.logical_and(valid, ryf >= 0.0)
    valid = jnp.logical_and(valid, ryf <= win_rows - 1.001)
    valid = jnp.logical_and(valid, rxf >= 0.0)
    valid = jnp.logical_and(valid, rxf <= win_cols - 1.001)
    ryf = jnp.clip(ryf, 0.0, win_rows - 1.001)
    rxf = jnp.clip(rxf, 0.0, win_cols - 1.001)
    r0 = jnp.floor(ryf).astype(jnp.int32)
    wy_f = ryf - r0.astype(jnp.float32)
    c0 = jnp.floor(rxf).astype(jnp.int32)
    wx_f = rxf - c0.astype(jnp.float32)
    c1 = c0 + 1

    def bilinear(w_ref):
        """Chunked row scan over the window; per row k the pixels whose
        r0==k (weight 1−wy) or r0==k−1 (weight wy) gather their column —
        two 128-lane blocks, selected by c."""
        acc = jnp.zeros((bh, bw), jnp.float32)

        def lane_pick(row_w, c):
            cl = jnp.bitwise_and(c, 127)
            out = None
            for blk in range(win_cols // 128):
                b = jnp.broadcast_to(row_w[0:1, blk * 128:(blk + 1) * 128],
                                     (bh, bw))
                g = jnp.take_along_axis(b, cl, axis=1)
                out = g if out is None else jnp.where(c >> 7 == blk, g, out)
            return out

        n_chunks = (jnp.clip(jnp.max(r0) + 1, 0, win_rows - 1) >> 3) + 1

        def body(j, acc):
            # Mosaic needs the sublane alignment stated explicitly for
            # dynamic scratch loads
            chunk = w_ref[pl.dslice(pl.multiple_of(j << 3, 8), 8), :]
            for kk in range(8):
                k = (j << 3) + kk
                row = chunk[kk:kk + 1, :]
                v0 = lane_pick(row, c0)
                v1 = lane_pick(row, c1)
                h = v0 * (1.0 - wx_f) + v1 * wx_f
                acc = acc + jnp.where(r0 == k, h * (1.0 - wy_f), 0.0)
                acc = acc + jnp.where(r0 + 1 == k, h * wy_f, 0.0)
            return acc

        return jax.lax.fori_loop(0, n_chunks, body, acc)

    hist = [bilinear(w) for w in (wr, wg, wb)]

    # depth validity (disocclusion rejection): the reprojected history depth
    # must agree with the surface we see now — a big relative mismatch means
    # this pixel shows something that was hidden (or absent) last frame, so
    # its history is a ghost.  The neighborhood clamp bounds the residual
    # cases (sub-threshold parallax).
    hist_ld = bilinear(wd)
    depth_eps = scal_ref[0, 31]
    depth_ok = jnp.abs(hist_ld - ld) <= depth_eps * jnp.maximum(ld, 1e-3)
    valid = jnp.logical_and(valid, depth_ok)

    # ---- neighborhood clamp (3x3 of the current tile) ----
    # clamp_mode "minmax": the classic 3×3 min/max box — cheapest, but a
    # single bright neighbor widens the box and admits ghosts in that
    # direction.  "variance": clamp to μ ± γ·σ of the 3×3 (variance
    # clipping, Salvi/Karis-style) — the measured envelope is in
    # tests/test_taa.py::test_clamp_mode_envelope: it admits more valid
    # history on smooth content (less clamp bias) while bounding outliers
    # tighter where the neighborhood is flat.  γ is packed (scalar 32) so
    # it can be tuned per-scene without recompiling.
    clamp_gamma = scal_ref[0, 32]
    outs = (or_ref, og_ref, ob_ref)
    for cur_ref, h, out_ref in zip((cr_ref, cg_ref, cb_ref), hist, outs):
        cur = cur_ref[:]
        nmin = cur
        nmax = cur
        m1 = cur
        m2 = cur * cur
        pad_f = pad_ok.astype(jnp.float32)  # Mosaic rotate needs 32-bit data
        row_i = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        for dy in (bh - 1, 0, 1):  # roll is modular: bh-1 ≡ -1
            for dx in (bw - 1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                n = pltpu.roll(pltpu.roll(cur, dy, 0), dx, 1)
                n_ok = pltpu.roll(pltpu.roll(pad_f, dy, 0), dx, 1) > 0.5
                # modular roll wraps tile edges: a tap that came from the
                # opposite tile edge is not this pixel's neighbor — treat
                # it like a padded tap (→ center) rather than clamping
                # against the far side of the tile (ADVICE r2)
                wrap = jnp.zeros((bh, bw), jnp.bool_)
                if dy == 1:
                    wrap = jnp.logical_or(wrap, row_i == 0)
                elif dy == bh - 1:
                    wrap = jnp.logical_or(wrap, row_i == bh - 1)
                if dx == 1:
                    wrap = jnp.logical_or(wrap, col_i == 0)
                elif dx == bw - 1:
                    wrap = jnp.logical_or(wrap, col_i == bw - 1)
                n_ok = jnp.logical_and(n_ok, jnp.logical_not(wrap))
                n = jnp.where(n_ok, n, cur)  # padded/wrapped taps → center
                if clamp_mode == "minmax":
                    nmin = jnp.minimum(nmin, n)
                    nmax = jnp.maximum(nmax, n)
                else:
                    m1 = m1 + n
                    m2 = m2 + n * n
        if clamp_mode == "variance":
            mu = m1 * (1.0 / 9.0)
            sigma = jnp.sqrt(jnp.maximum(m2 * (1.0 / 9.0) - mu * mu, 0.0))
            nmin = mu - clamp_gamma * sigma
            nmax = mu + clamp_gamma * sigma
        h = jnp.clip(h, nmin, nmax)
        a = jnp.where(valid, blend, 1.0)
        out_ref[:] = cur * a + h * (1.0 - a)


def _pack_taa_scalars(cam_prev: Camera, cam_cur: Camera, blend, depth_eps,
                      clamp_gamma, row0, hist_row0) -> jnp.ndarray:
    w2v_prev = cam_prev.world_to_view.reshape(-1)  # 0..15
    rot = cam_cur.view_to_world[:3, :3].reshape(-1)  # 16..24
    pos = cam_cur.view_to_world[:3, 3]  # 25..27
    vals = jnp.concatenate([
        jnp.asarray(w2v_prev, jnp.float32),
        jnp.asarray(rot, jnp.float32),
        jnp.asarray(pos, jnp.float32),
        jnp.stack([jnp.tan(cam_cur.fov_y_rad * 0.5),
                   jnp.tan(cam_prev.fov_y_rad * 0.5),
                   jnp.asarray(blend, jnp.float32),
                   jnp.asarray(depth_eps, jnp.float32),
                   jnp.asarray(clamp_gamma, jnp.float32),
                   jnp.asarray(row0, jnp.float32),        # 33
                   jnp.asarray(hist_row0, jnp.float32)]),  # 34
    ])
    return vals.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret",
                                             "clamp_mode"))
def taa_resolve(cur_color, linear_depth, history, cam_prev: Camera,
                cam_cur: Camera, blend, height: int, width: int,
                interpret: bool = False, history_depth=None,
                depth_eps=0.2, clamp_mode: str = "minmax",
                clamp_gamma=1.25, row0=0.0, hist_row0=0.0):
    """Blend ``cur_color`` (H, W, 3) with ``history`` reprojected from
    ``cam_prev`` to ``cam_cur``.  Returns ``(resolved, depth)`` — the
    resolved (H, W, 3) frame and the (clamped) linear depth to carry as the
    next frame's ``history_depth``.  ``history_depth=None`` (first frame)
    disables the disocclusion check by comparing depth against itself.

    ``depth_eps`` — relative depth-mismatch tolerance of the disocclusion
    check (traced; default 0.2 — the measured envelope in
    ``tests/test_taa.py::test_depth_eps_envelope``: rejects synthetic
    disocclusions completely while false-rejecting none of a moving
    camera's valid history at demo-scene depth gradients).
    ``clamp_mode`` — "minmax" (3×3 box, default) or "variance"
    (μ ± ``clamp_gamma``·σ variance clipping; γ is traced).

    Band mode (multi-chip row sharding, ``parallel/sharding.py``):
    ``cur_color``/``linear_depth`` may be one shard's rows of a
    ``height``-row frame starting at global row ``row0`` (traced), with
    ``history``/``history_depth`` that shard's halo-extended history band
    whose first row is global row ``hist_row0`` (traced; band start −
    halo).  ``height``/``width`` stay the FULL frame dims (they drive the
    NDC projection).  Single-chip callers leave both offsets at 0.0, which
    is bitwise inert in the kernel."""
    if clamp_mode not in ("minmax", "variance"):
        raise ValueError(f"unknown clamp_mode {clamp_mode!r}")
    bh, bw = 32, 128
    h_local = int(cur_color.shape[0])
    hist_rows = int(history.shape[0])
    win_rows = min(WIN_ROWS, (hist_rows // 8) * 8)
    win_cols = min(WIN_COLS, (width // 128) * 128)
    if h_local % 8 or width % 128 or hist_rows % 8:
        raise ValueError("taa_resolve needs rows %% 8 == 0 (both current "
                         "and history) and width %% 128 == 0 (DMA tile "
                         f"alignment); got {h_local}/{hist_rows} x {width}")
    scalars = _pack_taa_scalars(cam_prev, cam_cur, blend, depth_eps,
                                clamp_gamma, row0, hist_row0)
    grid = (pl.cdiv(h_local, bh), pl.cdiv(width, bw))
    tile = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pl.ANY)
    kern = functools.partial(_taa_kernel, height=height, width=width,
                             bh=bh, bw=bw, win_rows=win_rows,
                             win_cols=win_cols, clamp_mode=clamp_mode,
                             hist_rows=hist_rows, h_local=h_local)
    ld_clamped = jnp.minimum(linear_depth, 1.0e7)
    if history_depth is None:
        history_depth = ld_clamped
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((1, scalars.shape[1]), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  tile, tile, tile, tile, full, full, full, full],
        out_specs=[tile] * 3,
        out_shape=[jax.ShapeDtypeStruct((h_local, width), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((win_rows, win_cols), jnp.float32)] * 4
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(scalars, cur_color[..., 0], cur_color[..., 1], cur_color[..., 2],
      linear_depth, history[..., 0], history[..., 1], history[..., 2],
      jnp.minimum(history_depth, 1.0e7))
    return jnp.stack(outs, axis=-1), ld_clamped
