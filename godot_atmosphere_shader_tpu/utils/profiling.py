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


def frame_cost(atmospheres, configs, camera, opaque, height: int,
               width: int) -> dict:
    """Per-pixel FLOP/transcendental counts from XLA's cost analysis.

    The megakernel and the XLA path share one shading trace
    (``render/atmosphere_pass.shade_atmosphere``), so the compiled XLA
    path's cost model is a faithful arithmetic inventory of the work the
    kernel performs per shaded pixel.  Counts scale linearly with pixels
    (every march is a fixed-count loop), so analyze at a small resolution
    and scale by the pixel ratio — ``flops_per_pixel`` is
    resolution-independent.

    Caveats (documented, not hidden): tile culling in the Pallas path
    skips shell-missing tiles, and the in-kernel texture mode replaces
    procedural noise with pyramid sampling — both make the *achieved*
    kernel flops differ from this full-frame shading model.  The MFU the
    bench reports is therefore "full-frame shading-model FLOP throughput",
    the roofline-comparable quantity.

    Returns ``{"flops_per_pixel", "transcendentals_per_pixel",
    "bytes_per_pixel", "analyzed_at"}``.
    """
    from ..render.renderer import _render_jit

    if not isinstance(atmospheres, tuple):
        atmospheres = tuple(atmospheres)
    if not isinstance(configs, tuple):
        configs = tuple(configs)
    lowered = _render_jit.lower(atmospheres, configs, camera, opaque,
                                height, width)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    n = float(height * width)
    return {
        "flops_per_pixel": float(cost.get("flops", 0.0)) / n,
        "transcendentals_per_pixel": float(cost.get("transcendentals", 0.0)) / n,
        "bytes_per_pixel": float(cost.get("bytes accessed", 0.0)) / n,
        "analyzed_at": (height, width),
    }
