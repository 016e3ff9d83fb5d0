"""The driver-facing dryrun geometry (parallel.dryrun.dryrun_config) must
stay SLIM: on the driver's virtual-CPU mesh every sync-BN pmean and
per-parameter gradient all-reduce is a thread rendezvous across n device
threads (~0.13 s each on a 1-core host — the round-3 MULTICHIP timeout was
897 such collectives per step). These tests pin the structure without
compiling anything (eval_shape only)."""
import jax
import jax.numpy as jnp

from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.models import BEVDepthLiDAR
from mm_training_tpu.parallel.dryrun import dryrun_config


def _shapes(cfg):
    model = BEVDepthLiDAR(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_fake_batch(cfg, batch_size=1, seed=0).items()}
    b, s, n = batch['imgs'].shape[:3]
    batch['flipped'] = jnp.zeros((b * s * n,), bool)
    return jax.eval_shape(lambda r: model.init(r, batch, None, False),
                          jax.random.PRNGKey(0))


def test_dryrun_config_is_slim_but_structurally_complete():
    cfg = dryrun_config()
    # full production structure present
    assert cfg.use_cam and cfg.use_lidar and cfg.use_radar
    assert cfg.get_head_conf().tasks and len(cfg.get_head_conf().tasks) >= 2
    assert cfg.backbone_conf.depth_net_conf.use_dcn

    v = _shapes(cfg)
    params = jax.tree_util.tree_leaves(v['params'])
    stats = jax.tree_util.tree_leaves(v.get('batch_stats', {}))
    # collective-count budget: ~1 gradient all-reduce per param tensor plus
    # ~2 pmeans per BN layer per step. The pre-slim geometry had 360 + 184
    # (=897 all-reduces compiled); keep a hard lid well below that.
    assert len(params) <= 220, (
        f'{len(params)} param tensors — dryrun model grew; this directly '
        'scales the MULTICHIP dryrun wall time (rendezvous per collective)')
    assert len(stats) <= 120, f'{len(stats)} batch-stat tensors'


def test_dryrun_config_grid_is_head_legal():
    cfg = dryrun_config()
    ny, nx = cfg.out_shape
    # head trunk: /8 input then /4 stem + two stride-2 stages
    assert ny % 128 == 0 and nx % 128 == 0, (ny, nx)
