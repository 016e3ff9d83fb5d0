"""PR-curve / per-class-AP export (the reference saves curve plots per eval,
utils/eval.py:483-499) and device-array ingestion through utils.universal."""
import json
import os

import jax.numpy as jnp
import numpy as np

from mm_training_tpu.evaluation import MAPCalculator


def _frames():
    rng = np.random.default_rng(0)
    gts, preds = [], []
    for _ in range(4):
        k = 6
        boxes = np.zeros((k, 9), np.float32)
        boxes[:, 0] = rng.uniform(-40, 40, k)
        boxes[:, 1] = rng.uniform(-10, 10, k)
        boxes[:, 3:6] = [4.0, 2.0, 1.5]
        labels = rng.integers(0, 2, k)
        gts.append([boxes, labels])
        # predictions: GT + jitter, plus one false positive
        pb = boxes.copy()
        pb[:, :2] += rng.normal(0, 0.2, (k, 2))
        fp = np.zeros((1, 9), np.float32)
        fp[:, :2] = [100.0, 0.0]
        fp[:, 3:6] = [4.0, 2.0, 1.5]
        preds.append([np.concatenate([pb, fp]),
                      np.concatenate([rng.uniform(0.5, 1.0, k), [0.4]]),
                      np.concatenate([labels, [0]])])
    return gts, preds


def test_export_pr_curves(tmp_path):
    calc = MAPCalculator()
    gts, preds = _frames()
    calc.update(gts, preds)
    written = calc.export_pr_curves(str(tmp_path), x_range=200.0,
                                    class_names=['car', 'truck'])
    jpath = os.path.join(str(tmp_path), 'pr_curves.json')
    assert jpath in written and os.path.getsize(jpath) > 0
    with open(jpath) as f:
        payload = json.load(f)
    assert 'all' in payload and 'car' in payload
    for name, d in payload.items():
        assert len(d['recall']) == len(d['precision']) == len(d['score'])
        assert 0.0 <= d['ap_auc'] <= 1.0
    # near-perfect detector: overall AP high, curves non-trivial
    assert payload['all']['ap_auc'] > 0.8
    assert len(payload['all']['recall']) == 28  # 4 frames x 7 preds
    pngs = [w for w in written if w.endswith('.png')]
    assert pngs and all(os.path.getsize(p) > 0 for p in pngs)


def test_curves_consistent_with_compute_bev():
    calc = MAPCalculator()
    gts, preds = _frames()
    calc.update(gts, preds)
    bev = calc.compute_bev(x_range=200.0)
    curves = calc.compute_bev_curves(x_range=200.0)
    assert abs(curves['all']['ap_auc'] - bev['ap_auc']) < 1e-9


def test_update_accepts_device_arrays():
    """utils.universal normalizes jax arrays to host numpy inside update —
    the evaluator is backend-agnostic like the reference's (eval.py:11)."""
    calc = MAPCalculator()
    gts, preds = _frames()
    jgts = [[jnp.asarray(b), jnp.asarray(l)] for b, l in gts]
    jpreds = [[jnp.asarray(b), jnp.asarray(s), jnp.asarray(l)]
              for b, s, l in preds]
    calc.update(jgts, jpreds)
    assert isinstance(calc.gts[0][0], np.ndarray)
    res = calc.compute_bev(x_range=200.0)
    calc2 = MAPCalculator()
    calc2.update(gts, preds)
    ref = calc2.compute_bev(x_range=200.0)
    assert res == ref
