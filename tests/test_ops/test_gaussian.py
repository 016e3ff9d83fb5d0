import jax.numpy as jnp
import numpy as np

from mm_training_tpu.ops import draw_heatmap, gaussian_radius


def _ref_gaussian_radius(det_size, min_overlap):
    """mmdet3d.core.utils.gaussian_radius verbatim math (scalar)."""
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def _ref_draw(heatmap, center, radius):
    """mmdet3d draw_heatmap_gaussian: windowed patch, max combine."""
    diameter = 2 * radius + 1
    sigma = diameter / 6
    m = radius
    y, x = np.ogrid[-m:m + 1, -m:m + 1]
    gaussian = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    x0, y0 = center
    h, w = heatmap.shape
    left, right = min(x0, radius), min(w - x0, radius + 1)
    top, bottom = min(y0, radius), min(h - y0, radius + 1)
    patch = gaussian[radius - top:radius + bottom, radius - left:radius + right]
    region = heatmap[y0 - top:y0 + bottom, x0 - left:x0 + right]
    np.maximum(region, patch, out=region)
    return heatmap


def test_gaussian_radius_matches_mmdet3d():
    for hw in [(3.0, 5.0), (10.0, 4.0), (1.0, 1.0), (25.0, 6.0)]:
        got = float(gaussian_radius(hw, 0.1))
        want = _ref_gaussian_radius(hw, 0.1)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_draw_heatmap_matches_mmdet3d_loop():
    rng = np.random.default_rng(0)
    h, w, k = 24, 40, 50
    centers = np.stack([rng.integers(0, w, k), rng.integers(0, h, k)], -1).astype(np.int32)
    radii = rng.integers(1, 6, k).astype(np.int32)
    valid = rng.random(k) > 0.3

    want = np.zeros((h, w), np.float32)
    for c, r, v in zip(centers, radii, valid):
        if v:
            _ref_draw(want, (int(c[0]), int(c[1])), int(r))

    got = np.asarray(draw_heatmap(jnp.asarray(centers), jnp.asarray(radii),
                                  jnp.asarray(valid), (h, w)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
