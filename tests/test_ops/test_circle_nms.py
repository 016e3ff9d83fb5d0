import jax.numpy as jnp
import numpy as np

from mm_training_tpu.ops import circle_nms_mask


def _reference_circle_nms(centers, scores, valid, thresh):
    """CenterPoint's numba circle_nms: visit by descending score, suppress if
    squared distance to any kept box <= thresh."""
    order = np.argsort(-np.where(valid, scores, -np.inf))
    keep = np.zeros(len(scores), bool)
    kept = []
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in kept:
            d2 = np.sum((centers[i] - centers[j]) ** 2)
            if d2 <= thresh:
                ok = False
                break
        if ok:
            keep[i] = True
            kept.append(i)
    return keep


def test_circle_nms_matches_reference():
    rng = np.random.default_rng(0)
    k = 64
    centers = rng.uniform(-10, 10, size=(k, 2)).astype(np.float32)
    scores = rng.random(k).astype(np.float32)
    valid = rng.random(k) > 0.2
    for thresh in [0.25, 4.0, 10.0]:
        got = np.asarray(circle_nms_mask(jnp.asarray(centers),
                                         jnp.asarray(scores),
                                         jnp.asarray(valid), thresh))
        want = _reference_circle_nms(centers, scores, valid, thresh)
        np.testing.assert_array_equal(got, want)


def test_identical_centers_keep_highest_score():
    centers = jnp.zeros((3, 2))
    scores = jnp.array([0.5, 0.9, 0.1])
    valid = jnp.array([True, True, True])
    keep = np.asarray(circle_nms_mask(centers, scores, valid, 1.0))
    np.testing.assert_array_equal(keep, [False, True, False])
