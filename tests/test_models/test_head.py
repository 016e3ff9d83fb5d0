"""Head tests: forward shapes, target-generation parity against a pure-python
re-implementation of the reference algorithm (bev_depth_head.py:113-254),
loss finiteness, and fixed-shape decode."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mm_training_tpu.configs import Config, tiny_test_config
from mm_training_tpu.models import BEVDepthHead, decode_boxes, detection_loss
from mm_training_tpu.models.centerpoint_head import get_targets, get_targets_batch


def _ref_gaussian_radius(det_size, min_overlap):
    """mmdet3d.core.utils.gaussian_radius — the ORIGINAL CornerNet form with
    (b + sqrt)/2 in all three cases (mmdet3d keeps CenterPoint's copy; the
    corrected /(2a) variant lives in mmdet, which the reference head does not
    use)."""
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * a1 * c1)) / 2
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(b2 ** 2 - 4 * a2 * c2)) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def _ref_draw(heatmap, center, radius):
    diameter = 2 * radius + 1
    sigma = diameter / 6
    m = radius
    y, x = np.ogrid[-m:m + 1, -m:m + 1]
    g = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    x0, y0 = center
    h, w = heatmap.shape
    left, right = min(x0, radius), min(w - x0, radius + 1)
    top, bottom = min(y0, radius), min(h - y0, radius + 1)
    patch = g[radius - top:radius + bottom, radius - left:radius + right]
    region = heatmap[y0 - top:y0 + bottom, x0 - left:x0 + right]
    np.maximum(region, patch, out=region)


def _ref_get_targets(conf, boxes, labels):
    """Reference get_targets_single, python-looped (single class per task)."""
    tc = conf.train_cfg
    osf = tc.out_size_factor
    w, h = tc.grid_size[0] // osf, tc.grid_size[1] // osf
    max_objs = tc.max_objs
    n_tasks = len(conf.tasks)
    heatmaps = [np.zeros((1, h, w), np.float32) for _ in range(n_tasks)]
    annos = [np.zeros((max_objs, 10), np.float32) for _ in range(n_tasks)]
    inds = [np.zeros((max_objs,), np.int64) for _ in range(n_tasks)]
    masks = [np.zeros((max_objs,), np.float32) for _ in range(n_tasks)]

    for t in range(n_tasks):
        task_boxes = boxes[labels == t]
        for k in range(min(len(task_boxes), max_objs)):
            bx = task_boxes[k]
            width = bx[3] / tc.voxel_size[0] / osf
            length = bx[4] / tc.voxel_size[1] / osf
            if width <= 0 or length <= 0:
                continue
            radius = max(tc.min_radius,
                         int(_ref_gaussian_radius((length, width),
                                                  tc.gaussian_overlap)))
            cx = (bx[0] - tc.point_cloud_range[0]) / tc.voxel_size[0] / osf
            cy = (bx[1] - tc.point_cloud_range[1]) / tc.voxel_size[1] / osf
            xi, yi = int(cx), int(cy)
            if not (0 <= xi < w and 0 <= yi < h):
                continue
            _ref_draw(heatmaps[t][0], (xi, yi), radius)
            inds[t][k] = yi * w + xi
            masks[t][k] = 1.0
            annos[t][k] = [cx - xi, cy - yi, bx[2],
                           np.log(bx[3]), np.log(bx[4]), np.log(bx[5]),
                           np.sin(bx[6]), np.cos(bx[6]), bx[7], bx[8]]
    return heatmaps, annos, inds, masks


def _random_boxes(rng, cfg, k_valid, k_cap):
    pc = cfg.point_cloud_range
    boxes = np.zeros((k_cap, 9), np.float32)
    boxes[:, 0] = rng.uniform(pc[0] * 1.1, pc[3] * 1.1, k_cap)  # some out of map
    boxes[:, 1] = rng.uniform(pc[1] * 1.1, pc[4] * 1.1, k_cap)
    boxes[:, 2] = rng.uniform(-1, 1, k_cap)
    boxes[:, 3:6] = rng.uniform(0.5, 8.0, (k_cap, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, k_cap)
    boxes[:, 7:9] = rng.normal(0, 5, (k_cap, 2))
    labels = rng.integers(0, 5, k_cap).astype(np.int32)  # incl class 4 (no task)
    mask = np.zeros(k_cap, bool)
    mask[:k_valid] = True
    return boxes, labels, mask


def test_get_targets_matches_reference_loop():
    cfg = tiny_test_config()
    conf = cfg.get_head_conf()
    rng = np.random.default_rng(0)
    boxes, labels, mask = _random_boxes(rng, cfg, k_valid=20, k_cap=32)

    hm, anno, ind, msk = get_targets(conf, jnp.asarray(boxes),
                                     jnp.asarray(labels), jnp.asarray(mask))
    r_hm, r_anno, r_ind, r_msk = _ref_get_targets(conf, boxes[mask],
                                                  labels[mask])
    for t in range(len(conf.tasks)):
        np.testing.assert_allclose(np.asarray(hm[t]), r_hm[t], atol=1e-5)
        np.testing.assert_allclose(np.asarray(msk[t]), r_msk[t])
        np.testing.assert_array_equal(np.asarray(ind[t]), r_ind[t])
        np.testing.assert_allclose(np.asarray(anno[t]), r_anno[t],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_head_forward_output_is_2x_input():
    cfg = tiny_test_config()
    conf = cfg.get_head_conf()
    head = BEVDepthHead(conf)
    bh, bw = cfg.bev_input_hw
    x = jnp.zeros((2, bh, bw, cfg.fuse_layer_in_channels))
    var = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(var, x)
    fh, fw = cfg.feature_map_hw
    assert len(preds) == 4
    for p in preds:
        assert p['reg'].shape == (2, fh, fw, 2)
        assert p['height'].shape == (2, fh, fw, 1)
        assert p['dim'].shape == (2, fh, fw, 3)
        assert p['rot'].shape == (2, fh, fw, 2)
        assert p['vel'].shape == (2, fh, fw, 2)
        assert p['heatmap'].shape == (2, fh, fw, 1)
    # heatmap bias init: sigmoid(-2.19) ~ 0.1006
    np.testing.assert_allclose(
        float(jax.nn.sigmoid(preds[0]['heatmap'][0, 0, 0, 0])), 0.1006, atol=0.02)


@pytest.mark.slow
def test_loss_and_decode():
    cfg = tiny_test_config()
    conf = cfg.get_head_conf()
    rng = np.random.default_rng(1)
    b = 2
    boxes = np.stack([_random_boxes(rng, cfg, 10, 32)[0] for _ in range(b)])
    labels = rng.integers(0, 4, (b, 32)).astype(np.int32)
    mask = np.ones((b, 32), bool)

    targets = get_targets_batch(conf, jnp.asarray(boxes), jnp.asarray(labels),
                                jnp.asarray(mask))
    fh, fw = cfg.feature_map_hw
    key = jax.random.PRNGKey(0)
    preds = []
    for _ in conf.tasks:
        key, *ks = jax.random.split(key, 7)
        preds.append({
            'reg': jax.random.normal(ks[0], (b, fh, fw, 2)),
            'height': jax.random.normal(ks[1], (b, fh, fw, 1)),
            'dim': jax.random.normal(ks[2], (b, fh, fw, 3)) * 0.1,
            'rot': jax.random.normal(ks[3], (b, fh, fw, 2)),
            'vel': jax.random.normal(ks[4], (b, fh, fw, 2)),
            'heatmap': jax.random.normal(ks[5], (b, fh, fw, 1)) - 2.0,
        })
    loss = detection_loss(conf, targets, preds)
    assert np.isfinite(float(loss)) and float(loss) > 0

    out_boxes, scores, labels_out, valid = decode_boxes(conf, preds)
    t = len(conf.tasks)
    cap = conf.test_cfg.post_max_size * t
    assert out_boxes.shape == (b, cap, 9)
    assert scores.shape == labels_out.shape == valid.shape == (b, cap)
    s = np.asarray(scores)
    assert np.all((s >= 0) & (s <= 1))
    lv = np.asarray(labels_out)[np.asarray(valid)]
    assert lv.min() >= 0 and lv.max() < 4


def test_decode_recovers_planted_object():
    """Plant one strong peak in task 0 and check decode returns its box."""
    cfg = tiny_test_config()
    conf = cfg.get_head_conf()
    fh, fw = cfg.feature_map_hw
    b = 1
    yi, xi = 5, 20
    z, dims, yaw = -0.5, (4.0, 2.0, 1.5), 0.4
    preds = []
    for t in range(4):
        hm = jnp.full((b, fh, fw, 1), -10.0)
        if t == 0:
            hm = hm.at[0, yi, xi, 0].set(8.0)
        preds.append({
            'heatmap': hm,
            'reg': jnp.full((b, fh, fw, 2), 0.3),
            'height': jnp.full((b, fh, fw, 1), z),
            'dim': jnp.broadcast_to(jnp.log(jnp.asarray(dims)), (b, fh, fw, 3)),
            'rot': jnp.broadcast_to(jnp.asarray([np.sin(yaw), np.cos(yaw)]),
                                    (b, fh, fw, 2)),
            'vel': jnp.zeros((b, fh, fw, 2)),
        })
    boxes, scores, labels, valid = decode_boxes(conf, preds)
    best = int(np.argmax(np.asarray(scores[0])))
    bx = np.asarray(boxes[0, best])
    tc = conf.bbox_coder
    exp_x = (xi + 0.3) * tc.out_size_factor * tc.voxel_size[0] + tc.pc_range[0]
    exp_y = (yi + 0.3) * tc.out_size_factor * tc.voxel_size[1] + tc.pc_range[1]
    np.testing.assert_allclose(bx[0], exp_x, atol=1e-4)
    np.testing.assert_allclose(bx[1], exp_y, atol=1e-4)
    np.testing.assert_allclose(bx[2], z - dims[2] / 2, atol=1e-4)  # bottom z
    np.testing.assert_allclose(bx[3:6], dims, rtol=1e-4)
    np.testing.assert_allclose(bx[6], yaw, atol=1e-4)
    assert int(labels[0, best]) == 0
