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


def test_cone_barrier_tp_exclusions():
    """devkit parity: traffic cones carry no AOE/AVE/AAE and barriers no
    AVE/AAE — those per-class entries are NaN and nanmean-excluded, so a
    cone's (meaningless) 0.0 velocity error can't drag mAVE toward 0."""
    ev = NuScenesEvaluator(classes=('car', 'traffic_cone'))
    gt_c, pred_c, names_c = _frame(6, cls='car', seed=2)
    gt_t, pred_t, names_t = _frame(6, cls='traffic_cone', seed=3)
    # give the cars a real velocity error; cones would report 0.0
    pred_c[:, 7] += 1.0
    ev.update(np.concatenate([gt_c, gt_t]),
              np.concatenate([names_c, names_t]),
              np.concatenate([pred_c, pred_t]),
              np.full(12, 0.9),
              np.concatenate([names_c, names_t]))
    m = ev.compute()
    pc = m['per_class']['traffic_cone']
    assert np.isnan(pc['aoe']) and np.isnan(pc['ave']) and np.isnan(pc['aae'])
    # mAVE is the cars' error alone (cone 0.0 excluded, not averaged in)
    assert m['mAVE'] == pytest.approx(1.0, abs=1e-6)


def test_low_recall_gets_worst_case_tp_errors():
    """devkit calc_tp: a class whose max recall never exceeds MIN_RECALL
    (0.1) reports worst-case 1.0 for every TP error, not the (tiny) mean
    over its few confident TPs."""
    ev = NuScenesEvaluator(classes=('car',))
    gt, pred, names = _frame(20, seed=4)
    ev.update(gt, names, pred[:1], np.asarray([0.9]), names[:1])  # recall 0.05
    m = ev.compute()
    assert m['mATE'] == 1.0 and m['mASE'] == 1.0
    assert m['mAOE'] == 1.0 and m['mAVE'] == 1.0


def test_clipped_ap_excludes_min_recall_bin():
    """devkit calc_ap averages 90 bins (recall 0.11..1.00): with 10 GT and
    exactly 5 perfect predictions (recall 0.5, precision 1.0) AP must be
    mean over the 90-bin tail = 40/90 bins at (1-0.1)/(1-0.1)."""
    ev = NuScenesEvaluator(classes=('car',))
    gt, pred, names = _frame(10, seed=5)
    ev.update(gt, names, pred[:5], np.full(5, 0.9), names[:5])
    m = ev.compute()
    assert m['mAP'] == pytest.approx(40 / 90, abs=1e-6)
