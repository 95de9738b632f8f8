"""Far-mode LOD banding: the TPU-native equivalent of the reference's far
cube mesh (``planet_atmosphere.gd:261-321``), which exists to shrink the
shaded pixel set for distant atmospheres.

``render/lod.py`` computes the conservative screen-row band of a projected
atmosphere shell on the host; ``Scene._layer_bands`` turns the per-node
near/far mode switch into a banding plan; ``megakernel._chain_layers``
launches banded layers over only their rows and passes the background
through elsewhere.

Geometry tests are pure numpy (default tier); the banded-vs-fullscreen
kernel equivalence runs the megakernel in interpret mode (slow tier has the
larger frame)."""

import math

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.render.lod import (
    BAND_QUANTUM, EMPTY, layer_band, projected_row_band)

FOV = math.radians(70.0)


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, true_up, -fwd, eye
    return m


def sphere_rows(v2w, center, radius, height, n=4096):
    """Brute-force projected rows of in-front sphere-surface points."""
    rng = np.random.default_rng(7)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = np.asarray(center, np.float64) + radius * d
    m = np.asarray(v2w, np.float64)
    view = (pts - m[:3, 3]) @ m[:3, :3]  # R^T (p - t), row-vector form
    z = view[:, 2]
    front = z < -1e-9
    if not front.any():
        return None
    ndc_y = view[front, 1] / (-z[front]) / math.tan(0.5 * FOV)
    return (1.0 - ndc_y) * 0.5 * height


def test_band_contains_projection():
    """The quantized band must contain every projected surface point (the
    kernel relies on rays outside the band missing the shell)."""
    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(200):
        eye = rng.uniform(-300, 300, 3)
        target = rng.uniform(-50, 50, 3)
        if np.linalg.norm(target - eye) < 1.0:
            continue
        v2w = look_at(eye, target)
        center = rng.uniform(-120, 120, 3)
        radius = rng.uniform(1.0, 80.0)
        height = int(rng.choice([256, 512, 1080]))
        band = projected_row_band(v2w, FOV, height, center, radius)
        rows = sphere_rows(v2w, center, radius, height)
        if band is None:
            continue  # fullscreen is always safe
        if band == EMPTY:
            # no surface point in front may land inside the frame
            if rows is not None:
                assert rows.max() < 0 or rows.min() >= height
            continue
        row0, band_h = band
        assert rows is not None
        vis = rows[(rows >= 0) & (rows < height)]
        if vis.size:
            assert vis.min() >= row0 - 1, (row0, band_h, vis.min())
            assert vis.max() <= row0 + band_h + 1, (row0, band_h, vis.max())
        checked += 1
    assert checked > 30  # the sweep actually exercised banded cases


def test_band_alignment_invariants():
    rng = np.random.default_rng(11)
    seen = 0
    for _ in range(300):
        v2w = look_at(rng.uniform(-200, 200, 3), rng.uniform(-20, 20, 3))
        band = projected_row_band(v2w, FOV, 1080, rng.uniform(-100, 100, 3),
                                  rng.uniform(0.5, 60.0))
        if isinstance(band, tuple):
            row0, band_h = band
            assert row0 % 8 == 0
            assert band_h % BAND_QUANTUM == 0
            assert 0 <= row0 and row0 + band_h <= 1080
            seen += 1
    assert seen > 50


def test_behind_camera_is_empty():
    v2w = look_at((0.0, 0.0, 0.0), (0.0, 0.0, -10.0))
    assert projected_row_band(v2w, FOV, 256, (0, 0, 50.0), 5.0) == EMPTY


def test_camera_inside_is_fullscreen():
    v2w = look_at((0.0, 0.0, 0.0), (0.0, 0.0, -10.0))
    assert projected_row_band(v2w, FOV, 256, (1.0, 0.0, -2.0), 5.0) is None


def test_straddling_camera_plane_is_fullscreen():
    v2w = look_at((0.0, 0.0, 0.0), (0.0, 0.0, -10.0))
    assert projected_row_band(v2w, FOV, 256, (0.0, 0.0, -4.0), 5.0) is None


def test_near_mode_stays_fullscreen():
    """Near-mode nodes keep the fullscreen pass — the reference's fullscreen
    quad (``planet_atmosphere.gd:261-282``)."""
    v2w = look_at((0.0, 0.0, 300.0), (0.0, 0.0, 0.0))
    assert layer_band(0, v2w, FOV, 1080, (0, 0, 0), 20.0, 2.0,
                      mode_far=1) is None
    far = layer_band(1, v2w, FOV, 1080, (0, 0, 0), 20.0, 2.0, mode_far=1)
    assert isinstance(far, tuple)


# ---------------------------------------------------------------------------
# scene plan + kernel equivalence
# ---------------------------------------------------------------------------


def _two_layer_scene():
    from godot_atmosphere_shader_tpu.models.demo import build_demo_scene
    from godot_atmosphere_shader_tpu.models.scene import PlanetAtmosphere

    scene = build_demo_scene(variant="no_clouds", procedural=True)
    # the bench config-5 moon atmosphere (far from the space pose)
    scene.atmospheres.append(PlanetAtmosphere(
        planet_radius=10.0, atmosphere_height=2.0,
        sun=scene.atmospheres[0].sun, custom_shader="no_clouds",
        position=(-188.991, 0.0, 192.584)))
    return scene


def test_scene_layer_bands_plan():
    """Far-mode layers get row bands sized to their projected shells; a
    behind-camera layer is dropped outright."""
    from godot_atmosphere_shader_tpu.models.demo import demo_camera
    from godot_atmosphere_shader_tpu.models.scene import (MODE_FAR,
                                                          PlanetAtmosphere)

    scene = _two_layer_scene()
    cam = demo_camera("space")
    # a third shell far behind the camera: must be culled from the chain
    cam_pos = np.asarray(cam.view_to_world)[:3, 3]
    fwd = -np.asarray(cam.view_to_world)[:3, 2]
    scene.atmospheres.append(PlanetAtmosphere(
        planet_radius=5.0, atmosphere_height=1.0,
        sun=scene.atmospheres[0].sun, custom_shader="no_clouds",
        position=tuple(cam_pos - 500.0 * fwd)))
    scene.update(0.0, cam)
    order, params, configs = scene._sorted_layers(cam)
    moon = scene.atmospheres[1]
    assert moon.mode == MODE_FAR
    res = scene._layer_bands(order, params, tuple(configs), None, cam, 1080)
    order2, params2, configs2, tex2, bands, band_rows = res
    assert len(order2) == 2  # behind-camera layer dropped
    by_node = dict(zip(order2, bands))
    assert isinstance(by_node[moon], int)  # moon banded (small on screen)
    # the planet is also far-mode from the space pose: either banded (it
    # fills ~40% of the 1080-row frame) or fullscreen, never dropped
    planet_band = by_node[scene.atmospheres[0]]
    assert planet_band is None or planet_band >= by_node[moon]
    assert band_rows is not None and len(band_rows) == 2


def _render_pair(height, width, bands, band_rows):
    from godot_atmosphere_shader_tpu.models.demo import demo_camera
    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
        render_scene_pallas)

    scene = _two_layer_scene()
    cam = demo_camera("space")
    scene.update(0.0, cam)
    order, params, configs = scene._sorted_layers(cam)
    full = render_scene_pallas(params, configs, cam, scene.opaque,
                               height, width, interpret=True)
    banded = render_scene_pallas(params, configs, cam, scene.opaque,
                                 height, width, interpret=True,
                                 bands=bands, band_rows=band_rows)
    return full, banded, (order, cam)


def test_banded_chain_matches_fullscreen_small():
    """Banding is an optimization, not a look change: a hand-placed band on
    the far moon layer reproduces the fullscreen chain bit-for-bit (the
    band jitter slice aligns with the fullscreen blue-noise tiling)."""
    h, w = 64, 128
    # order is far→near: [planet (dist 446), moon (dist 331)].  The moon
    # shell projects to rows 37-59 at this height (+4-row margin → 33-63);
    # band rows [32, 64) contain it.  BAND_QUANTUM is a driver policy, not
    # a kernel requirement — the kernel only needs block-height multiples.
    full, banded, (order, cam) = _render_pair(
        h, w, bands=(None, 32), band_rows=np.asarray([0, 32], np.int32))
    np.testing.assert_allclose(np.asarray(banded["color"]),
                               np.asarray(full["color"]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(banded["alpha"]),
                               np.asarray(full["alpha"]), atol=2e-6)


@pytest.mark.slow
def test_banded_chain_matches_fullscreen_geometric():
    """Same contract at a resolution where the real band geometry engages:
    the band comes from projected_row_band on the moon shell."""
    from godot_atmosphere_shader_tpu.models.demo import demo_camera
    from godot_atmosphere_shader_tpu.render.lod import projected_row_band

    h, w = 192, 256
    scene = _two_layer_scene()
    cam = demo_camera("space")
    scene.update(0.0, cam)
    order, params, configs = scene._sorted_layers(cam)
    res = scene._layer_bands(order, params, tuple(configs), None, cam, h)
    order2, params2, configs2, _, bands, band_rows = res
    assert bands is not None and any(isinstance(b, int) for b in bands)

    from godot_atmosphere_shader_tpu.ops.pallas.megakernel import (
        render_scene_pallas)

    full = render_scene_pallas(params2, configs2, cam, scene.opaque,
                               h, w, interpret=True)
    banded = render_scene_pallas(params2, configs2, cam, scene.opaque,
                                 h, w, interpret=True,
                                 bands=bands, band_rows=band_rows)
    np.testing.assert_allclose(np.asarray(banded["color"]),
                               np.asarray(full["color"]), atol=2e-6)
    np.testing.assert_allclose(np.asarray(banded["alpha"]),
                               np.asarray(full["alpha"]), atol=2e-6)
