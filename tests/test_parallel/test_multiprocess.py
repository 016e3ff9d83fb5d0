"""Multi-process (multi-host) training: 2 real processes, gloo collectives.

Proves the jax-native DDP-equivalent end to end (VERDICT r2 item 3): each
process loads only its slice of every global batch (PrefetchLoader
process_rows), shard_batch assembles global arrays via
jax.make_array_from_process_local_data, gradients ride the global-view jit,
eval-metric pooling goes through multihost all_gather_object
(trainer._run_eval), and orbax checkpointing runs collectively.

Pass criterion: the 2-process run reproduces the single-process run (same
4-device global mesh, same seed) — pooled BEV mAP equal, losses equal to
float tolerance. Reference equivalent: Lightning DDP + DistributedSampler
(SURVEY §2.4; utils/torch_dist.py:24-43).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = str(Path(__file__).with_name('mp_worker.py'))


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_world(world, data_root, tmp_path, tag):
    res = str(tmp_path / f'result_{tag}.json')
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    env['JAX_PLATFORMS'] = 'cpu'
    env['MP_TEST_CACHE_DIR'] = str(tmp_path / 'jax_cache')
    # ONE shared out_path for all ranks — orbax checkpointing coordinates
    # through the (shared) filesystem, like on a real pod
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(rank), str(world), str(port),
         data_root, str(tmp_path / f'out_{tag}'), res],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in range(world)]
    outs = [p.communicate(timeout=1500)[0].decode() for p in procs]
    if any(p.returncode != 0 for p in procs):
        # one rank's crash surfaces on the OTHER rank as a shutdown-barrier
        # timeout — always show every rank's tail
        report = '\n'.join(f'--- rank {i} (rc={p.returncode}) ---\n{o[-3000:]}'
                           for i, (p, o) in enumerate(zip(procs, outs)))
        raise AssertionError(f'worker failed (world={world}):\n{report}')
    with open(res) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    # val frame count NOT divisible by the global batch (4): the trailing
    # batch is padded AND process-sliced — the hardest feeding case
    root = generate_synthetic_dataset(
        str(tmp_path / 'ds'), splits=('train', 'val'), frames_per_sequence=5,
        n_objects=4, img_hw=(64, 128))

    m1 = _run_world(1, root, tmp_path, 'sp')
    m2 = _run_world(2, root, tmp_path, 'mp')

    assert 'val_ap_auc' in m1 and 'val_ap_auc' in m2
    # mAP pools host-side object lists -> must agree exactly
    for k in ('val_ap_auc', 'val_ap_interp', 'val_recall_2d'):
        assert m2[k] == pytest.approx(m1[k], abs=1e-9), k
    for k in ('val_detection_loss', 'val_loss'):
        assert m2[k] == pytest.approx(m1[k], rel=2e-4), k


@pytest.mark.slow
def test_four_process_training_matches_single(tmp_path):
    """4 ranks, 1 device each (VERDICT r4 #7): exercises >2-rank rendezvous
    and 1-row process_batch_bounds slices — on the padded trailing val batch
    three of the four ranks load ONLY padding rows, the hardest slicing
    case a 2-process run can never reach."""
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    root = generate_synthetic_dataset(
        str(tmp_path / 'ds'), splits=('train', 'val'), frames_per_sequence=5,
        n_objects=4, img_hw=(64, 128))

    m1 = _run_world(1, root, tmp_path, 'sp4')
    m4 = _run_world(4, root, tmp_path, 'mp4')

    assert 'val_ap_auc' in m1 and 'val_ap_auc' in m4
    for k in ('val_ap_auc', 'val_ap_interp', 'val_recall_2d'):
        assert m4[k] == pytest.approx(m1[k], abs=1e-9), k
    for k in ('val_detection_loss', 'val_loss'):
        assert m4[k] == pytest.approx(m1[k], rel=2e-4), k
