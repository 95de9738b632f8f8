"""Inverse rendering: gradients through the full frame recover parameters."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from godot_atmosphere_shader_tpu.models.demo import build_demo_scene, demo_camera
from godot_atmosphere_shader_tpu.models.inverse import fit
from godot_atmosphere_shader_tpu.render.renderer import render_frame


def test_fit_recovers_density():
    scene = build_demo_scene(variant="no_clouds", procedural=True)
    cam = demo_camera("exterior")
    scene.update(0.0, cam)
    atmo = scene.atmospheres[0]
    true_params = atmo.build_params().resolve_frame_state()
    h = w = 48
    target = render_frame((true_params,), (atmo.config,), cam, scene.opaque,
                          h, w)["color"]

    start = dataclasses.replace(true_params, density=jnp.float32(0.25),
                                scattering_strength=jnp.float32(0.6))
    fitted, losses = fit(start, atmo.config, cam, scene.opaque, target,
                         h, w, steps=40, lr=0.1,
                         trainable=("density", "scattering_strength"))
    assert losses[-1] < losses[0] * 0.2, losses[::10]
    # true density is 0.5 (demo scene); the fit should move toward it
    assert abs(float(fitted.density) - 0.5) < abs(0.25 - 0.5)
    assert np.isfinite(losses).all()
