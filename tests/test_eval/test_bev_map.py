"""Evaluation tests: MAPCalculator/evaluate_ap behavior on constructed
scenarios (perfect predictions, misses, class errors, yaw AOS), matcher
equivalences. The reference ships zero tests for utils/eval.py (SURVEY §4)."""
import numpy as np
import pytest

from mm_training_tpu.evaluation import MAPCalculator
from mm_training_tpu.evaluation.bev_map import (assign_hunscore,
                                                assign_scoresort,
                                                box_iou_aabb,
                                                cosine_similarity)


def _box(x, y, dx=4.0, dy=2.0, z=0.0, dz=1.5, yaw=0.0, vx=0.0, vy=0.0):
    return [x, y, z, dx, dy, dz, yaw, vx, vy]


def test_box_iou_aabb():
    a = np.asarray([[0, 0, 2, 2]], np.float32)
    b = np.asarray([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], np.float32)
    iou = box_iou_aabb(a, b)
    np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-6)


def test_perfect_predictions_give_ap_1():
    calc = MAPCalculator()
    boxes = np.asarray([_box(10, 2), _box(-30, -5), _box(100, 10)], np.float32)
    labels = np.asarray([0, 1, 3])
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    calc.update([[boxes, labels]], [[boxes, scores, labels]])
    res = calc.compute_bev(iou_thr=0.3, x_range=204.8)
    assert res['ap_auc'] == pytest.approx(1.0, abs=1e-6)
    assert res['recall_2d'] == pytest.approx(1.0)
    assert res['precision_2d'] == pytest.approx(1.0)
    assert res['cls_accuracy_bev'] == pytest.approx(1.0)
    assert res['aos'] == pytest.approx(1.0)
    assert res['num_preds'] == 3


def test_false_positives_lower_precision():
    calc = MAPCalculator()
    gt = np.asarray([_box(10, 2)], np.float32)
    pred = np.asarray([_box(10, 2), _box(50, 5)], np.float32)
    calc.update([[gt, np.asarray([0])]],
                [[pred, np.asarray([0.9, 0.8], np.float32), np.asarray([0, 0])]])
    res = calc.compute_bev(iou_thr=0.3, x_range=204.8)
    assert res['recall_2d'] == pytest.approx(1.0)
    assert res['precision_2d'] == pytest.approx(0.5)
    # AP unharmed: the FP scores below the TP
    assert res['ap_auc'] == pytest.approx(1.0, abs=1e-6)


def test_x_range_filters_far_objects():
    calc = MAPCalculator()
    gt = np.asarray([_box(10, 2), _box(300, 2)], np.float32)  # 300 m: out
    pred = np.asarray([_box(10, 2)], np.float32)
    calc.update([[gt, np.asarray([0, 0])]],
                [[pred, np.asarray([0.9], np.float32), np.asarray([0])]])
    res = calc.compute_bev(iou_thr=0.3, x_range=204.8)
    assert res['recall_2d'] == pytest.approx(1.0)  # far GT excluded


def test_wrong_class_still_matches_bev_but_cls_accuracy_drops():
    """The BEV matching is class-agnostic (eval.py merges all classes when
    eval_class=None); class errors show up in cls_accuracy_bev."""
    calc = MAPCalculator()
    gt = np.asarray([_box(10, 2)], np.float32)
    pred = np.asarray([_box(10, 2)], np.float32)
    calc.update([[gt, np.asarray([0])]],
                [[pred, np.asarray([0.9], np.float32), np.asarray([2])]])
    res = calc.compute_bev(iou_thr=0.3, x_range=204.8)
    assert res['recall_2d'] == pytest.approx(1.0)
    assert res['cls_accuracy_bev'] == pytest.approx(0.0)


def test_aos_yaw_similarity():
    assert cosine_similarity(np.asarray([0.0]), np.asarray([0.0]))[0] == 1.0
    assert cosine_similarity(np.asarray([0.0]), np.asarray([180.0]))[0] == pytest.approx(0.0)
    assert cosine_similarity(np.asarray([0.0]), np.asarray([90.0]))[0] == pytest.approx(0.5)
    # wrap-around
    assert cosine_similarity(np.asarray([350.0]), np.asarray([-10.0]))[0] == pytest.approx(1.0)


def test_matchers_agree_on_unambiguous_case():
    ious = np.asarray([[0.9, 0.0], [0.0, 0.8]], np.float32)
    scores = np.asarray([0.9, 0.8], np.float32)
    for assign in (assign_scoresort, assign_hunscore):
        gt_a, pred_a = assign(ious, scores, 0.3)
        assert {k: v if isinstance(v, list) else [v] for k, v in gt_a.items()} \
            == {0: [0], 1: [1]}


def test_hungarian_resolves_contention_by_score():
    # one GT, two overlapping preds: Hungarian-on-score keeps the higher score
    ious = np.asarray([[0.9, 0.85]], np.float32)
    scores = np.asarray([0.2, 0.95], np.float32)
    gt_a, pred_a = assign_hunscore(ious, scores, 0.3)
    assert list(pred_a.keys()) == [1]


def test_evaluate_ap_accepts_jax_arrays():
    """The evaluator routes its array math through utils/universal (the
    reference's eval.py:11 pattern): device (jax) arrays must produce the
    same metrics as numpy, with no host pre-conversion by the caller."""
    import jax.numpy as jnp

    from mm_training_tpu.evaluation.bev_map import evaluate_ap, obj2arrays_bev

    rng = np.random.default_rng(0)
    boxes = rng.uniform(-50, 50, (6, 9)).astype(np.float32)
    boxes[:, 3:6] = rng.uniform(2, 5, (6, 3))
    classes = rng.integers(0, 3, 6)
    scores = rng.uniform(0.1, 1.0, 6).astype(np.float32)

    gt_np = obj2arrays_bev(boxes[:4], classes[:4], name='f0')
    pr_np = obj2arrays_bev(boxes, classes, scores, name='f0',
                           needs_score=True)
    ref = evaluate_ap([gt_np], [pr_np], val_field='class',
                      sim_func=lambda a, b: a == b,
                      val_metric_name='cls_accuracy_bev')

    def jaxify(d):
        return {k: (jnp.asarray(v) if v.dtype != object else v)
                for k, v in d.items()}

    got = evaluate_ap([jaxify(gt_np)], [jaxify(pr_np)], val_field='class',
                      sim_func=lambda a, b: a == b,
                      val_metric_name='cls_accuracy_bev')
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-6), k

    # per-class filtering exercises the masked_select path
    ref_c = evaluate_ap([gt_np], [pr_np], eval_class=int(classes[0]))
    got_c = evaluate_ap([jaxify(gt_np)], [jaxify(pr_np)],
                        eval_class=int(classes[0]))
    assert got_c['ap_auc'] == pytest.approx(ref_c['ap_auc'], abs=1e-6)


def test_distance_assignment_matches_by_center_distance():
    """assign_method='distance' matches on gated center distance (the
    reference pairs assign_gt_det_distance with cost_matrix_by_dist,
    eval.py:743-784): overlapping predictions match, far ones don't."""
    boxes = np.asarray([_box(10, 2), _box(-30, -5)], np.float32)
    labels = np.asarray([0, 1])
    scores = np.asarray([0.9, 0.8], np.float32)

    calc = MAPCalculator()
    calc.update([[boxes, labels]], [[boxes, scores, labels]])
    m = calc.compute_bev(assign_method='distance', iou_thr=2.0)
    assert m['ap_auc'] == pytest.approx(1.0)

    off = boxes.copy()
    off[:, 0] += 30.0  # 30 m away: must NOT match at a 2 m threshold
    calc2 = MAPCalculator()
    calc2.update([[boxes, labels]], [[off, scores, labels]])
    m2 = calc2.compute_bev(assign_method='distance', iou_thr=2.0)
    assert m2['ap_auc'] == 0.0


def test_ignore_classes_filters_after_association():
    """MAPCalculator.ignore_classes = the reference's unlabeled_classes
    (eval.py:451-460): ignored GT, predictions matched to it, and
    predictions of ignored classes all drop out of the PR statistics."""
    calc = MAPCalculator()
    calc.ignore_classes = [7]
    gt = np.asarray([_box(10, 2), _box(50, 5)], np.float32)
    gl = np.asarray([0, 7])
    # a correct class-0 pred, a pred matched to the ignored GT, and a
    # class-7 false positive — only the first should count
    pred = np.asarray([_box(10, 2), _box(50, 5), _box(90, -5)], np.float32)
    ps = np.asarray([0.9, 0.8, 0.7], np.float32)
    pl = np.asarray([0, 7, 7])
    calc.update([[gt, gl]], [[pred, ps, pl]])
    m = calc.compute_bev()
    assert m['ap_auc'] == pytest.approx(1.0)
    assert m['recall_2d'] == pytest.approx(1.0)
    assert m['precision_2d'] == pytest.approx(1.0)


def test_update_reconciles_img_names_with_frame_count():
    """A padded eval batch passes the full-length path list with a
    truncated (n_valid) frame list; names must stay frame-aligned."""
    boxes = np.asarray([_box(10, 2)], np.float32)
    labels = np.asarray([0])
    scores = np.asarray([0.9], np.float32)
    calc = MAPCalculator()
    calc.update([[boxes, labels]], [[boxes, scores, labels]],
                img_names=['a', 'b'])   # 1 frame, 2 paths (padded batch)
    calc.update([[boxes, labels]], [[boxes, scores, labels]],
                img_names=['c'])
    assert calc.img_names == ['a', 'c']
    assert len(calc.img_names) == len(calc.gts)


def test_ignore_classes_empty_gt_frame():
    """Regression: with ignore_classes set, a frame with ZERO GT boxes but
    at least one prediction must not crash (the matched-to-ignored-GT gather
    used to index an empty ignore_gt array) — every prediction is simply a
    false positive unless its own class is ignored."""
    calc = MAPCalculator()
    calc.ignore_classes = [7]
    empty = np.zeros((0, 7), np.float32)
    no_labels = np.zeros((0,), np.int64)
    pred = np.asarray([_box(10, 2), _box(50, 5)], np.float32)
    ps = np.asarray([0.9, 0.8], np.float32)
    pl = np.asarray([0, 7])
    # frame 1: empty GT, two preds (one of an ignored class)
    # frame 2: one real GT matched by a pred, to give AP a positive anchor
    gt = np.asarray([_box(20, -3)], np.float32)
    gl = np.asarray([0])
    calc.update([[empty, no_labels], [gt, gl]],
                [[pred, ps, pl], [gt[:, :], np.asarray([0.95], np.float32),
                                  np.asarray([0])]])
    m = calc.compute_bev()
    # the class-7 FP is ignored; the class-0 FP on the empty frame counts
    assert m['recall_2d'] == pytest.approx(1.0)
    assert m['precision_2d'] == pytest.approx(0.5)
