"""Multi-slice data parallelism: mesh layout + numerical equality.

Config.num_slices > 1 lays the data axis out slice-outermost so XLA can
decompose the gradient all-reduce into an intra-slice ICI reduce-scatter +
a small cross-slice DCN exchange (the jax multislice recipe). The global
program is the same SPMD train step, so the reference's DDP equality
contract (bev_depth_head.py:274,300 — N-way training == large-batch 1-way)
must keep holding across slices; these tests pin both the device layout and
the numerics on virtual slices (contiguous CPU-device groups).
"""
import jax
import numpy as np
import pytest

from mm_training_tpu.configs import tiny_test_config
from mm_training_tpu.data.fake_batch import make_fake_batch
from mm_training_tpu.parallel.dryrun import max_param_diff, run_one_train_step
from mm_training_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh

GLOBAL_BATCH = 8


class _FakeDev:
    """Stand-in with the TPU device attrs make_mesh reads."""

    def __init__(self, id, slice_index):
        self.id = id
        self.slice_index = slice_index

    def __repr__(self):
        return f'dev(id={self.id}, slice={self.slice_index})'


def test_layout_real_slice_indices_group_slice_outermost():
    # 8 devices across 2 hardware slices, presented interleaved and
    # shuffled: the mesh must still group each slice contiguously along the
    # data axis (slice-major), sorted by id within a slice.
    devs = [_FakeDev(id=i, slice_index=i % 2) for i in range(8)]
    rng = np.random.RandomState(0)
    rng.shuffle(devs)
    mesh = make_mesh(devs, model_parallel=2, num_slices=2)
    assert mesh.shape == {MODEL_AXIS: 2, DATA_AXIS: 4}
    arr = np.asarray(mesh.devices)
    # data axis = [slice0's 2 dp ranks, slice1's 2 dp ranks]
    for row in arr:
        assert [d.slice_index for d in row] == [0, 0, 1, 1]
    # within a slice, ids ascend (deterministic layout)
    ids0 = [d.id for d in arr.flatten() if d.slice_index == 0]
    assert ids0 == sorted(ids0)


def test_layout_virtual_slices_are_contiguous_groups():
    devs = jax.devices()
    assert len(devs) >= 8, 'conftest must provide the 8-device CPU mesh'
    mesh = make_mesh(devs[:8], model_parallel=1, num_slices=2)
    assert mesh.shape == {MODEL_AXIS: 1, DATA_AXIS: 8}
    row = list(np.asarray(mesh.devices)[0])
    assert row == devs[:8]  # contiguous halves, original order


def test_num_slices_must_divide():
    with pytest.raises(AssertionError):
        make_mesh(jax.devices()[:8], model_parallel=1, num_slices=3)


def test_trainer_builds_sliced_mesh_from_config():
    """Config.num_slices must reach make_mesh through the Trainer (the
    production entry — exps/train builds Trainer(cfg) with no explicit
    mesh)."""
    from mm_training_tpu.training.trainer import Trainer

    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           batch_size=1, num_slices=2)
    tr = Trainer(cfg, data_root='/nonexistent-not-touched-before-setup')
    assert tr.mesh.shape == {MODEL_AXIS: 1, DATA_AXIS: len(jax.devices())}
    half = len(jax.devices()) // 2
    row = list(np.asarray(tr.mesh.devices)[0])
    assert row[:half] == jax.devices()[:half]  # slice-contiguous layout


@pytest.mark.slow
def test_two_virtual_slices_match_dp1():
    """Slice-major device layout changes XLA's collective routing, never the
    math: 2-slice x 4-dp training equals 1-device training on the same
    global batch (same contract as test_dp_equivalence)."""
    modalities = dict(use_cam=False, use_lidar=True, use_radar=True)
    cfg = tiny_test_config(batch_size=GLOBAL_BATCH, **modalities)
    batch_np = make_fake_batch(cfg, batch_size=GLOBAL_BATCH, seed=0)

    devices = jax.devices()
    p1, m1 = run_one_train_step(devices[:1], 1, GLOBAL_BATCH,
                                modalities=modalities, batch_np=batch_np)
    ps, ms = run_one_train_step(devices[:8], 1, GLOBAL_BATCH,
                                modalities=modalities, batch_np=batch_np,
                                num_slices=2)
    assert abs(m1['train_loss'] - ms['train_loss']) < 1e-4 * max(
        1.0, abs(m1['train_loss'])), (m1, ms)
    d = max_param_diff(p1, ps)
    assert d < 5e-4, f'2-slice vs dp=1 param max-diff {d}'
