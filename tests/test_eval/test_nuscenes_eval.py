"""NuScenesEvaluator protocol tests on constructed scenes."""
import numpy as np
import pytest

from mm_training_tpu.evaluation.nuscenes_eval import (NuScenesEvaluator,
                                                      format_results)


def _frame(n, cls='car', jitter=0.0, seed=0):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((n, 9), np.float64)
    boxes[:, 0] = rng.uniform(-40, 40, n)
    boxes[:, 1] = rng.uniform(-40, 40, n)
    boxes[:, 3:6] = [4.5, 1.9, 1.6]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.normal(0, 3, (n, 2))
    pred = boxes.copy()
    pred[:, :2] += rng.normal(0, jitter, (n, 2))
    names = np.asarray([cls] * n, object)
    return boxes, pred, names


def test_perfect_predictions():
    ev = NuScenesEvaluator(classes=('car',))
    gt, pred, names = _frame(8)
    ev.update(gt, names, pred, np.linspace(0.9, 0.5, 8), names)
    m = ev.compute()
    assert m['mAP'] == pytest.approx(1.0, abs=1e-6)
    assert m['mATE'] == pytest.approx(0.0, abs=1e-9)
    assert m['mASE'] == pytest.approx(0.0, abs=1e-9)
    assert m['mAOE'] == pytest.approx(0.0, abs=1e-9)
    assert m['NDS'] == pytest.approx(1.0, abs=1e-6)


def test_translation_error_reported():
    ev = NuScenesEvaluator(classes=('car',))
    gt, pred, names = _frame(50, jitter=0.3, seed=1)
    ev.update(gt, names, pred, np.full(50, 0.9), names)
    m = ev.compute()
    # ATE ~ mean |N(0, 0.3 I)| = 0.3 * sqrt(pi/2) ~ 0.376
    assert 0.2 < m['mATE'] < 0.55
    assert m['mAP'] > 0.5   # 0.5 m threshold still mostly matches


def test_misses_lower_map():
    ev = NuScenesEvaluator(classes=('car',))
    gt, pred, names = _frame(10)
    ev.update(gt, names, pred[:5], np.full(5, 0.9), names[:5])
    m = ev.compute()
    assert m['mAP'] < 0.6
    assert m['mAP'] > 0.2


def test_class_confusion_not_matched():
    ev = NuScenesEvaluator(classes=('car', 'truck'))
    gt, pred, _ = _frame(6)
    ev.update(gt, np.asarray(['car'] * 6, object),
              pred, np.full(6, 0.9), np.asarray(['truck'] * 6, object))
    m = ev.compute()
    assert m['per_class']['car']['ap'] == 0.0


def test_format_results_schema(tmp_path):
    gt, pred, names = _frame(2)
    sub = format_results(['tok1'], [pred], [np.asarray([0.9, 0.8])], [names],
                         out_path=str(tmp_path / 'sub.json'))
    assert (tmp_path / 'sub.json').exists()
    ann = sub['results']['tok1'][0]
    assert set(ann) >= {'translation', 'size', 'rotation', 'velocity',
                        'detection_name', 'detection_score', 'attribute_name'}
    # size is wlh
    assert ann['size'] == [pred[0, 4], pred[0, 3], pred[0, 5]]
