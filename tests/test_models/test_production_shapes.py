"""Production-geometry shape guard (CPU, abstract evaluation only).

Every other CI test runs the tiny geometry; the real config (704x1280 images,
409 depth bins, 2048x256 BEV grid — conf_aim.py:1-40) is otherwise exercised
only by the TPU bench. ``jax.eval_shape`` traces the full train / eval /
predict / multi-step programs at production shapes without executing them, so
any drift in the derived-shape math (depth binning, grid sizes, decode caps,
target maps) fails here in seconds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_training_tpu.configs import lidar_cam_radar
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR
from mm_training_tpu.training.optim import make_optimizer
from mm_training_tpu.training.train_step import (TrainState, make_eval_step,
                                                 make_predict_step,
                                                 make_train_step,
                                                 make_train_step_multi)

B = 2


@pytest.fixture(scope='module')
def prod():
    cfg = lidar_cam_radar(batch_size=B, max_points_per_frame=100_000)
    model = BEVDepthLiDAR(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)

    batch = make_fake_batch(cfg, batch_size=B, seed=0)
    abstract_batch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                      for k, v in batch.items()}
    model_batch = dict(abstract_batch)
    b, s, n = abstract_batch['imgs'].shape[:3]
    model_batch['flipped'] = jax.ShapeDtypeStruct((b * s * n,), np.bool_)

    variables = jax.eval_shape(
        lambda r, mb: model.init(r, mb, None, False),
        jax.ShapeDtypeStruct((2,), np.uint32), model_batch)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    opt_state = jax.eval_shape(tx.init, params)
    state = TrainState(step=jax.ShapeDtypeStruct((), np.int32),
                       params=params, batch_stats=batch_stats,
                       opt_state=opt_state)
    return cfg, model, tx, state, abstract_batch


def test_derived_config_matches_conf_aim(prod):
    """The derived numbers of exps/conf_aim.py:1-40."""
    cfg = prod[0]
    bb = cfg.get_backbone_conf()
    assert cfg.final_dim == (704, 1280)
    assert bb.depth_channels == 409          # d_bound (2.0, 206.4, 0.5)
    assert bb.d_bound == (2.0, 206.4, 0.5)
    assert cfg.out_shape == (256, 2048)      # (ny, nx) full voxel grid
    assert cfg.feature_map_hw == (64, 512)  # grid / out_size_factor
    assert bb.feat_hw == (44, 80)            # 704/16, 1280/16
    assert cfg.fuse_layer_in_channels == 336  # 80 cam + 256 lidar
    hc = cfg.get_head_conf()
    assert len(hc.tasks) == 4
    assert hc.test_cfg.post_max_size == 83
    assert hc.test_cfg.max_per_img == 500


@pytest.mark.slow
def test_train_step_shapes(prod):
    cfg, model, tx, state, batch = prod
    step = make_train_step(cfg, model, tx)
    rng = jax.ShapeDtypeStruct((2,), np.uint32)
    new_state, metrics = jax.eval_shape(step, state, batch, rng)
    for k in ('train_loss', 'train_detection_loss', 'train_depth_loss',
              'grad_norm'):
        assert metrics[k].shape == ()
        assert metrics[k].dtype == np.float32
    jax.tree_util.tree_map(
        lambda a, b: (a.shape, a.dtype) == (b.shape, b.dtype) or
        (_ for _ in ()).throw(AssertionError((a, b))),
        state.params, new_state.params)


@pytest.mark.slow
def test_multi_step_shapes(prod):
    cfg, model, tx, state, batch = prod
    k = 4
    step = make_train_step_multi(cfg, model, tx, k)
    stacked = {key: jax.ShapeDtypeStruct((k,) + v.shape, v.dtype)
               for key, v in batch.items()}
    rng = jax.ShapeDtypeStruct((2,), np.uint32)
    new_state, metrics = jax.eval_shape(step, state, stacked, rng)
    assert metrics['train_loss'].shape == ()
    assert new_state.step.shape == ()


def test_eval_step_shapes(prod):
    cfg, model, tx, state, batch = prod
    step = make_eval_step(cfg, model)
    metrics, (boxes, scores, labels, valid), _ = jax.eval_shape(step, state,
                                                                batch)
    hc = cfg.get_head_conf()
    cap = hc.test_cfg.post_max_size * len(hc.tasks)   # 83 * 4 = 332
    assert boxes.shape == (B, cap, 9)
    assert scores.shape == labels.shape == valid.shape == (B, cap)
    assert metrics['detection_loss'].shape == ()


def test_predict_step_shapes(prod):
    cfg, model, tx, state, batch = prod
    step = make_predict_step(cfg, model)
    boxes, scores, labels, valid = jax.eval_shape(step, state, batch)
    hc = cfg.get_head_conf()
    assert boxes.shape == (B, hc.test_cfg.post_max_size * len(hc.tasks), 9)


def test_forward_internal_shapes(prod):
    """Head maps at grid/4 with the reference channel layout; depth_pred at
    the /16 feature map with 409 bins."""
    cfg, model, _, state, batch = prod
    model_batch = dict(batch)
    b, s, n = batch['imgs'].shape[:3]
    model_batch['flipped'] = jax.ShapeDtypeStruct((b * s * n,), np.bool_)

    def fwd(params, stats, mb):
        return model.apply({'params': params, 'batch_stats': stats},
                           mb, None, False)

    preds, depth_pred, lidar_bev, cam_bev = jax.eval_shape(
        fwd, state.params, state.batch_stats, model_batch)
    ty, tx_ = cfg.feature_map_hw
    for task in preds:
        assert task['heatmap'].shape[:3] == (B, ty, tx_)
        assert task['reg'].shape == (B, ty, tx_, 2)
        assert task['dim'].shape == (B, ty, tx_, 3)
    bb = cfg.get_backbone_conf()
    fh, fw = bb.feat_hw
    assert depth_pred.shape == (B * cfg.num_cameras, fh, fw, 409)
