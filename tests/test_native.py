"""Native C++ blue-noise generator (csrc/blue_noise.cpp via ctypes)."""

import numpy as np
import pytest

from godot_atmosphere_shader_tpu.utils.native import generate_blue_noise_native


@pytest.fixture(scope="module")
def mask():
    m = generate_blue_noise_native(64, sigma=1.9, seed=7)
    if m is None:
        pytest.skip("native toolchain unavailable")
    return m


def test_valid_rank_permutation(mask):
    assert mask.shape == (64, 64)
    assert len(np.unique(mask)) == 64 * 64  # every rank exactly once
    assert 0.0 <= mask.min() and mask.max() < 1.0


def test_blue_spectrum(mask):
    f = np.abs(np.fft.fft2(mask - mask.mean()))
    low = f[:4, :4].mean()
    high = f[24:40, 24:40].mean()
    assert low / high < 0.1  # strong low-frequency deficit


def test_deterministic():
    a = generate_blue_noise_native(16, seed=5)
    b = generate_blue_noise_native(16, seed=5)
    c = generate_blue_noise_native(16, seed=6)
    if a is None:
        pytest.skip("native toolchain unavailable")
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.0
