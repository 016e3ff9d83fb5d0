"""Worker for the preemption-recovery integration test.

Run as: python preempt_worker.py DATA_ROOT OUT_PATH MAX_STEPS RESULT_JSON

Trains on CPU with a 'latest' checkpoint every step. The parent test
SIGKILLs the first invocation mid-run (possibly mid-async-write); a second
invocation against the same OUT_PATH must restore the last *committed*
'latest' checkpoint and finish at exactly MAX_STEPS. This is the
preemption story the reference delegates to Lightning's
ModelCheckpoint+ckpt_path (exps/mm_training_aim.py:599-604,638); here it is
orbax atomic-commit + Trainer.fit auto-resume.
"""
import json
import os
import sys

# script-mode sys.path[0] is tests/test_training — add the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    data_root, out, max_steps, res = sys.argv[1:5]

    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    cache = os.environ.get('MP_TEST_CACHE_DIR')
    if cache:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 1)

    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.training.trainer import Trainer

    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           batch_size=1, num_workers=1, out_path=out,
                           num_sanity_val_steps=0, latest_every_n_steps=1,
                           log_every_n_steps=1, max_epochs=50)
    assert cfg.async_checkpointing  # the kill must cover the async path
    tr = Trainer(cfg, data_root=data_root)
    tr.setup()
    # replicate fit()'s internal auto-resume, but observably: record which
    # step the 'latest' checkpoint restored so the parent can assert the
    # second run truly resumed rather than restarting from scratch
    tr.init_state(next(iter(tr.loader('train'))))
    resumed_from = 0
    latest = tr.out_path / 'saved_models' / 'latest'
    if latest.is_dir():
        tr.restore(str(latest))
        resumed_from = int(tr.state.step)
    print(f'RESUMED_FROM {resumed_from}', flush=True)
    tr.fit(max_steps=int(max_steps))
    # early-stop/best-checkpoint decisions for the parent to compare
    # against an unkilled control run (Lightning parity: callback state is
    # part of the checkpoint, so resume must not change any decision)
    best_dir = tr.out_path / 'saved_models' / 'best'
    best_steps = (sorted(int(p.name) for p in best_dir.iterdir()
                         if p.name.isdigit()) if best_dir.is_dir() else [])
    with open(res, 'w') as f:
        json.dump({'resumed_from': resumed_from,
                   'final_step': int(tr.state.step),
                   'loop_state': tr.loop_state,  # json handles inf natively
                   'best_steps': best_steps}, f)
    print('WORKER DONE', flush=True)


if __name__ == '__main__':
    main()
