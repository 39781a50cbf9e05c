"""Upgraded render3D: blending, brightness enhancement, density colors."""

import numpy as np
import pytest

from concept_tpu.graphics.render import (
    blend_images, enhance_brightness, render3D, _perceived_brightness,
)


def test_blend_screen_symmetric():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (6, 6, 4))
    b = rng.uniform(0, 1, (6, 6, 4))
    r1 = blend_images(a.copy(), b.copy(), "screen")
    r2 = blend_images(b.copy(), a.copy(), "screen")
    np.testing.assert_allclose(r1, r2)


def test_blend_overunder_mean_of_over_under():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (4, 4, 4))
    b = rng.uniform(0, 1, (4, 4, 4))
    over = blend_images(a.copy(), b.copy(), "over")
    under = blend_images(a.copy(), b.copy(), "under")
    ou = blend_images(a.copy(), b.copy(), "overunder")
    np.testing.assert_allclose(
        ou[..., :3] * ou[..., 3:],
        0.5 * (over[..., :3] + under[..., :3]) * ou[..., 3:],
        atol=1e-12,
    )


def test_blend_alpha_composition():
    a = np.zeros((2, 2, 4)); a[..., 3] = 0.5
    b = np.zeros((2, 2, 4)); b[..., 3] = 0.5
    out = blend_images(a.copy(), b, "over")
    np.testing.assert_allclose(out[..., 3], 0.75)


def test_enhance_brightness_hits_target():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 0.05, (16, 16, 4))
    img[..., 3] = 1.0
    out = enhance_brightness(img.copy(), target=0.3)
    assert _perceived_brightness(out) == pytest.approx(0.3, rel=0.05)


def test_render3d_files(tmp_path):
    rng = np.random.default_rng(3)
    box = 32.0
    pos = rng.uniform(0, box, (2000, 3)).astype(np.float32)
    fn = render3D(pos, box, str(tmp_path / "r.png"), resolution=160)
    assert (tmp_path / "r.png").stat().st_size > 1000
    pos2 = np.mod(pos + 5, box)
    fn = render3D(
        None, box, str(tmp_path / "m.png"), resolution=160,
        components={"a": (pos, "inferno"), "b": (pos2, "viridis")},
    )
    assert (tmp_path / "m.png").stat().st_size > 1000
