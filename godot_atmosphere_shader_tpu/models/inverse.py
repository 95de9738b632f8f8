"""Inverse rendering: fit atmosphere parameters to a target image.

The renderer is pure JAX end-to-end, so frame gradients w.r.t. physical
parameters come for free — something the reference's GPU pipeline cannot do
at all.  This module exposes a small gradient-descent fitter used by the CLI
``fit`` command and the multi-chip training-step dryrun.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.params import AtmosphereParams, VariantConfig
from ..render.renderer import render_frame_impl
from ..utils.camera import Camera

#: parameters the fitter optimizes by default — the scalar knobs an artist
#: would tune by hand in the reference's inspector
DEFAULT_TRAINABLE = ("density", "scattering_strength", "atmosphere_modulate",
                     "atmosphere_ambient_color", "cloud_density_scale",
                     "cloud_coverage_bias", "cloud_shape_factor")


@functools.partial(jax.jit,
                   static_argnames=("config", "height", "width", "lr"))
def fit_step(train: Dict[str, jnp.ndarray], params: AtmosphereParams,
             config: VariantConfig, camera: Camera, opaque,
             target: jnp.ndarray, height: int, width: int,
             lr: float = 0.05) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One SGD step on ``mean((render − target)²)``.  Returns (loss, train)."""

    def loss_fn(train):
        p = dataclasses.replace(params, **train)
        out = render_frame_impl((p,), (config,), camera, opaque, height, width)
        return jnp.mean((out["color"] - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(train)

    # normalized (sign-like) steps: the physical knobs span wildly different
    # scales, so raw-gradient SGD crawls; a per-parameter unit step of size
    # ``lr`` converges in tens of iterations for artist-tuned scalars
    def step(v, g):
        norm = jnp.sqrt(jnp.mean(g * g)) + 1e-12
        return jnp.maximum(v - lr * g / norm, 0.0)

    new_train = jax.tree_util.tree_map(step, train, grads)
    return loss, new_train


def fit(params: AtmosphereParams, config: VariantConfig, camera: Camera,
        opaque, target: jnp.ndarray, height: int, width: int,
        steps: int = 50, lr: float = 0.05,
        trainable=DEFAULT_TRAINABLE):
    """Gradient-descent fit.  Returns ``(fitted_params, losses)``."""
    params = params.resolve_frame_state()
    train = {k: getattr(params, k) for k in trainable}
    losses = []
    for _ in range(steps):
        loss, train = fit_step(train, params, config, camera, opaque,
                               target, height, width, lr=lr)
        losses.append(loss)
    losses = [float(l) for l in losses]
    return dataclasses.replace(params, **train), losses
