"""Top-level public API: the quick-start from the package docstring works."""

import numpy as np


def test_quickstart_flow():
    from godot_atmosphere_shader_tpu import (Camera, Node3D, PlanetAtmosphere,
                                             Scene, look_at)

    sun = Node3D(position=(0.0, 0.0, 600.0))
    planet = PlanetAtmosphere(planet_radius=100.0, atmosphere_height=8.0,
                              sun=sun, custom_shader="no_clouds")
    planet.set_shader_parameter("u_density", 0.5)
    scene = Scene(atmospheres=[planet])
    cam = Camera.create(look_at((0.0, 150.0, 420.0), (0.0, 0.0, 0.0)))
    scene.update(0.0, cam)
    frame = scene.render(cam, 32, 32)
    img = np.asarray(frame["color"])
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


def test_all_exports_importable():
    import godot_atmosphere_shader_tpu as pkg

    for name in pkg.__all__:
        assert getattr(pkg, name) is not None, name
