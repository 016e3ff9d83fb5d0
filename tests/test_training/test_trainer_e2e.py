"""Trainer end-to-end on the synthetic aiMotive tree (CPU mesh).

Covers the runtime wiring the unit tests can't: fit() with K-step dispatch
(Config.steps_per_dispatch), per-epoch validation with BEV mAP, per-ODD eval
(test_all_odds — the reference's eval_*.py config matrix), TTA eval
(use_tta), checkpoint latest/restore, and the eval artifacts (aiMotive-JSON
export + PR curves + image panels)."""
import json
import os

import jax
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.synthetic import generate_synthetic_dataset
from mm_training_tpu.parallel import make_mesh
from mm_training_tpu.training.trainer import Trainer


def _trainer(cfg, root):
    # 1-device mesh: the synthetic fixture is tiny; multi-device numerics
    # are pinned by tests/test_parallel/test_dp_equivalence.py
    return Trainer(cfg, data_root=root, mesh=make_mesh(jax.devices()[:1]))


@pytest.fixture(scope='module')
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('aim_e2e'))
    generate_synthetic_dataset(root, splits=('train', 'val'),
                               odds=('highway', 'urban'),
                               sequences_per_odd=1, frames_per_sequence=2,
                               img_hw=(64, 128))
    return root


def _cfg(tmp_path, **kw):
    base = dict(use_cam=False, use_lidar=True, use_radar=True, batch_size=1,
                num_sanity_val_steps=0, out_path=str(tmp_path / 'out'),
                num_workers=2, latest_every_n_steps=2)
    base.update(kw)
    return tiny_test_config(**base)


@pytest.mark.slow
def test_fit_multi_dispatch_validate_and_artifacts(synth_root, tmp_path):
    cfg = _cfg(tmp_path, steps_per_dispatch=2, viz_every_n_steps=2)
    tr = _trainer(cfg, synth_root)
    tr.setup()
    # 2 epochs: catches state leaking between epochs (e.g. the loop variable
    # shadowing that /verify caught on the TPU drive)
    tr.fit(max_epochs=2)
    # 2 odds x 1 seq x 2 frames = 4 batches/epoch -> 2 dispatches, 4 steps
    assert tr.global_step == 8
    # periodic 'latest' checkpoint fired across the K-step boundary
    assert (tr.out_path / 'saved_models' / 'latest').is_dir()
    # per-epoch validation ran and produced losses + BEV mAP metrics
    val = tr.validate(max_batches=4)
    assert 'val_detection_loss' in val and np.isfinite(val['val_detection_loss'])
    assert 'val_ap_auc' in val

    # test(): aiMotive-JSON export + PR curves under out_path
    tr.test(max_batches=2)
    out_jsons = list((tr.out_path / 'outputs').rglob('*.json'))
    assert out_jsons, 'aiMotive-format result JSONs must be exported'
    with open(out_jsons[0]) as f:
        assert 'CapturedObjects' in json.load(f)
    pr = tr.out_path / 'metrics' / 'test' / 'pr_curves.json'
    assert pr.is_file() and pr.stat().st_size > 0

    # config snapshot (create_trainer parity, mm_training_aim.py:582-583)
    assert (tr.out_path / 'config.json').is_file()
    # in-training viz cadence (reference: wandb artifacts every 200 steps)
    # + per-eval panels, both also dumped as PNGs
    panels = list((tr.out_path / 'panels').glob('*.png'))
    assert any(p.name.startswith('train_bev') for p in panels), panels
    assert any(p.name.startswith('test_bev') for p in panels), panels

    # resume from 'latest': a fresh trainer continues at the same step
    tr2 = _trainer(_cfg(tmp_path, steps_per_dispatch=2), synth_root)
    tr2.setup()
    tr2.init_state(next(iter(tr2.loader('train'))))
    tr2.restore(str(tr.out_path / 'saved_models' / 'latest'))
    assert tr2.global_step in (2, 4, 6, 8)  # whichever latest save ran last


@pytest.mark.slow
def test_partial_dispatch_group_falls_back_to_single_steps(synth_root,
                                                           tmp_path):
    """4 batches/epoch with steps_per_dispatch=3: one scanned 3-group plus
    ONE single-step batch — nothing dropped, all 4 steps run (the round-2
    behavior dropped the trailing K-1 batches and raised on tiny epochs)."""
    cfg = _cfg(tmp_path, steps_per_dispatch=3)
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.fit(max_epochs=1)
    assert tr.global_step == 4
    # K larger than the whole epoch: every batch runs via the single path
    cfg = _cfg(tmp_path, steps_per_dispatch=8, out_path=str(tmp_path / 'o8'))
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.fit(max_epochs=1)
    assert tr.global_step == 4
    # max_steps not a multiple of K: the final group is truncated to land
    # EXACTLY on max_steps (no K-1 overshoot)
    cfg = _cfg(tmp_path, steps_per_dispatch=3, out_path=str(tmp_path / 'om'))
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.fit(max_epochs=1, max_steps=2)
    assert tr.global_step == 2


@pytest.mark.slow
def test_per_odd_eval_matrix(synth_root, tmp_path):
    cfg = _cfg(tmp_path)
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.init_state(next(iter(tr.loader('val'))))
    res = tr.test_all_odds(odds=('highway', 'urban', 'night'), max_batches=1)
    # night does not exist in the fixture -> skipped; the two real ODDs ran
    assert set(res.keys()) == {'highway', 'urban'}
    for odd, metrics in res.items():
        assert f'test_{odd}_detection_loss' in metrics


@pytest.mark.slow
def test_tta_eval_runs(synth_root, tmp_path):
    cfg = _cfg(tmp_path, use_tta=True)
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.init_state(next(iter(tr.loader('val'))))
    out = tr.validate(max_batches=1)
    assert np.isfinite(out['val_detection_loss'])


def test_restore_raises_on_missing_path(synth_root, tmp_path):
    cfg = _cfg(tmp_path)
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.init_state(next(iter(tr.loader('val'))))
    with pytest.raises(FileNotFoundError):
        tr.restore(str(tmp_path / 'no_such_ckpt'))


@pytest.mark.slow
def test_pitched_rig_auto_falls_back_to_general_splat(synth_root, tmp_path):
    """A rig with roll/pitch (non-virtualized) must auto-switch the trainer
    to the general splat and still train."""
    import warnings

    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from mm_training_tpu.data.fake_batch import make_fake_batch

    cfg = tiny_test_config(use_cam=True, use_lidar=True, use_radar=True,
                           batch_size=1, out_path=str(tmp_path / 'o'))
    assert cfg.get_backbone_conf().factorized_splat
    tr = _trainer(cfg, synth_root)
    tr.setup()
    batch = make_fake_batch(cfg, batch_size=1, seed=0)
    # pitch every camera by 3 degrees (about the optical x axis)
    pitch = np.eye(4)
    pitch[:3, :3] = Rotation.from_euler('x', 3.0, degrees=True).as_matrix()
    batch['sensor2ego'] = (batch['sensor2ego'] @ pitch).astype(np.float32)
    batch['extrinsics'] = np.linalg.inv(batch['sensor2ego']).astype(np.float32)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        tr.init_state(batch)
    assert any('general (non-factorized) splat' in str(x.message) for x in w)
    assert not tr.cfg.get_backbone_conf().factorized_splat

    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    with tr.mesh:
        tr.state, metrics = tr._train_step(tr.state, device_batch,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['train_loss']))


def test_pick_restore_step_warns_on_metadata_fallback(tmp_path, monkeypatch):
    """If the orbax best-step query fails on a root whose steps DO carry
    per-step metrics, the fallback to the newest kept step must warn (it may
    restore a worse-than-best checkpoint); metric-less roots stay silent."""
    import warnings
    from mm_training_tpu.training import trainer as trainer_mod

    class _Boom:
        def __init__(self, *a, **kw):
            raise RuntimeError('synthetic metadata corruption')

    monkeypatch.setattr(trainer_mod.ocp, 'CheckpointManager', _Boom)

    best = tmp_path / 'best'
    for step in ('10', '20', '30'):
        (best / step / 'metrics').mkdir(parents=True)
    with pytest.warns(UserWarning, match='NEWEST kept step 30'):
        assert trainer_mod._pick_restore_step(str(best), ['10', '20', '30']) == 30

    latest = tmp_path / 'latest'  # metric-less root: silent fallback
    for step in ('7', '9'):
        (latest / step).mkdir(parents=True)
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        assert trainer_mod._pick_restore_step(str(latest), ['7', '9']) == 9


@pytest.mark.slow
def test_restore_best_picks_best_metric_step(synth_root, tmp_path):
    """restore('saved_models/best') must load the BEST-metric step, not the
    newest of the kept top-k (a top-k manager retains later, worse steps)."""
    import jax.numpy as jnp
    cfg = _cfg(tmp_path, save_top_k=5)
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.init_state(next(iter(tr.loader('train'))))
    for step, loss in ((10, 1.0), (20, 0.1), (30, 0.5)):
        tr.state = tr.state.replace(step=jnp.asarray(step, jnp.int32))
        tr.save_checkpoint('best', metrics={'val_detection_loss': loss})
    tr.restore(str(tr.out_path / 'saved_models' / 'best'))
    assert int(tr.state.step) == 20  # best val loss, not max step (30)
    # metric-less roots (the 'latest' manager) still restore the newest
    tr.state = tr.state.replace(step=jnp.asarray(7, jnp.int32))
    tr.save_checkpoint('latest')
    tr.state = tr.state.replace(step=jnp.asarray(9, jnp.int32))
    tr.save_checkpoint('latest')
    tr.restore(str(tr.out_path / 'saved_models' / 'latest'))
    assert int(tr.state.step) == 9


@pytest.mark.slow
def test_async_checkpoint_barrier_and_snapshot(synth_root, tmp_path):
    """Async saves must (a) barrier before a restore reads them and (b)
    snapshot the state at save() time — mutating tr.state right after an
    async save must not corrupt the write (orbax copies device->host before
    save returns; the disk write happens in the background)."""
    import jax.numpy as jnp
    cfg = _cfg(tmp_path)
    assert cfg.async_checkpointing  # the default — this IS the prod path
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.init_state(next(iter(tr.loader('train'))))

    tr.state = tr.state.replace(step=jnp.asarray(10, jnp.int32))
    saved_leaf = np.asarray(
        jax.tree_util.tree_leaves(tr.state.params)[0]).copy()
    tr.save_checkpoint('latest')            # returns with write in flight
    # clobber the live state while the write may still be in the background
    tr.state = tr.state.replace(
        step=jnp.asarray(99, jnp.int32),
        params=jax.tree_util.tree_map(lambda x: x * 0 - 1.0, tr.state.params))
    tr.restore(str(tr.out_path / 'saved_models' / 'latest'))  # barriers
    assert int(tr.state.step) == 10
    leaf = np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0])
    np.testing.assert_array_equal(leaf, saved_leaf)
    tr.wait_for_checkpoints()               # idempotent no-op when drained


@pytest.mark.slow
def test_resume_at_max_steps_is_a_noop(synth_root, tmp_path):
    """Resuming a run whose checkpoint already sits at max_steps must not
    crash (the K-group path would run zero micro-steps) and must not train
    extra steps; resume also restarts inside the restored epoch, not at 0."""
    cfg = _cfg(tmp_path, steps_per_dispatch=2)
    tr = _trainer(cfg, synth_root)
    tr.setup()
    tr.fit(max_epochs=1)                      # 4 steps; saves 'latest'
    steps = tr.global_step
    assert steps == 4
    tr2 = _trainer(cfg, synth_root)
    tr2.setup()
    tr2.fit(max_epochs=2, max_steps=steps)    # restores latest at step 4
    assert tr2.global_step == steps           # nothing retrained
