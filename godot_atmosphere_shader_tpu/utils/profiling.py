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
