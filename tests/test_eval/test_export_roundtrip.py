"""Export-format parity: boxes written by the trainer's aiMotive-JSON
exporter must parse back through the dataset's own Annotation reader into
the same boxes (z bottom->origin conversion, quaternion yaw round trip)."""
import json

import numpy as np

from mm_training_tpu.configs import CLASSES
from mm_training_tpu.data.formats import object_to_array
from mm_training_tpu.training.trainer import boxes_to_aimotive_dict


def test_export_parses_back_to_same_boxes(tmp_path):
    rng = np.random.default_rng(0)
    n = 5
    boxes = np.zeros((n, 9), np.float32)
    boxes[:, 0] = rng.uniform(-100, 100, n)
    boxes[:, 1] = rng.uniform(-20, 20, n)
    boxes[:, 2] = rng.uniform(-2, 0, n)            # bottom z (decode output)
    boxes[:, 3:6] = rng.uniform(0.5, 8, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.normal(0, 5, (n, 2))
    scores = rng.uniform(0.1, 1, n).astype(np.float32)
    labels = rng.integers(0, 4, n)

    d = boxes_to_aimotive_dict(boxes, scores, labels)
    path = tmp_path / 'frame_0000001.json'
    path.write_text(json.dumps(d))

    objs = json.loads(path.read_text())['CapturedObjects']
    assert len(objs) == n
    for i, o in enumerate(objs):
        arr, tname = object_to_array(o)
        arr = np.asarray(arr)
        np.testing.assert_allclose(arr[0:2], boxes[i, 0:2], atol=1e-5)
        # exporter writes origin z = bottom + dz/2 (gravity center)
        np.testing.assert_allclose(arr[2], boxes[i, 2] + boxes[i, 5] / 2,
                                   atol=1e-5)
        np.testing.assert_allclose(arr[3:6], boxes[i, 3:6], atol=1e-5)
        # yaw survives the quaternion round trip (mod 2pi)
        dyaw = (arr[6] - boxes[i, 6] + np.pi) % (2 * np.pi) - np.pi
        assert abs(dyaw) < 1e-5
        np.testing.assert_allclose(arr[7:9], boxes[i, 7:9], atol=1e-5)
        assert tname == CLASSES[labels[i]]
        assert 0 <= o['Score'] <= 1
