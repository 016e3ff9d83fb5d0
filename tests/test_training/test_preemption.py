"""Preemption recovery: SIGKILL a training process mid-run, relaunch, and
the run must auto-resume from the last committed 'latest' checkpoint and
finish exactly where an unkilled run would.

This is the failure-recovery contract behind Config.latest_every_n_steps +
Trainer.fit(resume=True) (reference: Lightning's every-500-steps 'latest'
ModelCheckpoint + ckpt_path resume, exps/mm_training_aim.py:599-604,638).
The kill is a real SIGKILL — no atexit, no finally blocks — so it also
proves orbax's atomic commit under async checkpointing: a write in flight
at kill time must never be restorable half-finished.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

_WORKER = str(Path(__file__).with_name('preempt_worker.py'))


def _committed_steps(latest_dir: Path):
    """Orbax commits a step by atomically renaming its tmp dir to the bare
    step number — a plain-integer child dir IS the commit marker."""
    if not latest_dir.is_dir():
        return []
    return sorted(int(p.name) for p in latest_dir.iterdir()
                  if p.name.isdigit())


def _launch(root, out, max_steps, res, cache):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    env['JAX_PLATFORMS'] = 'cpu'
    env['MP_TEST_CACHE_DIR'] = cache
    return subprocess.Popen(
        [sys.executable, _WORKER, root, out, str(max_steps), res],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


@pytest.mark.slow
def test_sigkill_mid_run_then_auto_resume(tmp_path):
    from mm_training_tpu.data.synthetic import generate_synthetic_dataset
    root = generate_synthetic_dataset(
        str(tmp_path / 'ds'), splits=('train', 'val'),
        frames_per_sequence=5, n_objects=4, img_hw=(64, 128))
    out = str(tmp_path / 'out')
    res = str(tmp_path / 'result.json')
    cache = str(tmp_path / 'jax_cache')
    latest = Path(out) / 'saved_models' / 'latest'

    # unkilled CONTROL run in its own out dir (concurrent with run 1):
    # the killed+resumed run must reach the same early-stop/best decisions
    ctl_out = str(tmp_path / 'ctl_out')
    ctl_res = str(tmp_path / 'ctl_result.json')
    ctl = _launch(root, ctl_out, 8, ctl_res, cache)

    # run 1: kill as soon as a checkpoint for step >= 2 is committed
    p = _launch(root, out, 8, res, cache)
    deadline = time.time() + 900
    try:
        while time.time() < deadline:
            steps = _committed_steps(latest)
            if steps and steps[-1] >= 2:
                break
            if p.poll() is not None:
                break
            time.sleep(0.2)
        else:
            pytest.fail('no committed checkpoint for step >= 2 within 900 s')
        assert p.poll() is None, (
            'worker finished before the kill — raise max_steps:\n'
            + p.communicate()[0].decode()[-3000:])
    finally:
        p.kill()  # SIGKILL by pid — mid-step, possibly mid-async-write
        p.communicate()
    killed_at = _committed_steps(latest)[-1]
    assert not os.path.exists(res)

    # run 2: same out_path — must resume from a committed step and complete
    p2 = _launch(root, out, 8, res, cache)
    out2 = p2.communicate(timeout=900)[0].decode()
    assert p2.returncode == 0, out2[-3000:]
    with open(res) as f:
        r = json.load(f)
    # resumed from a checkpoint that was committed when the kill landed
    # (run 1 may have committed one more step between the poll and the kill)
    assert r['resumed_from'] >= killed_at, (r, killed_at)
    assert f"RESUMED_FROM {r['resumed_from']}" in out2
    assert r['final_step'] == 8, r
    # metrics.jsonl shows run 2 continuing, not replaying from step 1
    logged = [json.loads(l)['step']
              for l in (Path(out) / 'metrics.jsonl').read_text().splitlines()
              if 'train_loss' in l]
    assert logged[-1] == 8
    assert max(logged) == 8 and logged.count(1) == 1

    # the killed+resumed run's training-loop state (epoch, loader position,
    # early-stop counters) and best-checkpoint decisions must equal the
    # unkilled control's — the loop state is part of the orbax tree
    # (Lightning restores Trainer+callback state on resume,
    # exps/mm_training_aim.py:597,638)
    ctl_log = ctl.communicate(timeout=900)[0].decode()
    assert ctl.returncode == 0, ctl_log[-3000:]
    with open(ctl_res) as f:
        c = json.load(f)
    assert c['final_step'] == 8
    assert r['loop_state'] == c['loop_state'], (r, c)
    assert r['best_steps'] == c['best_steps'], (r, c)
