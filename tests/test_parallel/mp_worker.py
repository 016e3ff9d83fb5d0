"""Worker for the 2-process training integration test.

Run as: python mp_worker.py RANK WORLD PORT DATA_ROOT OUT_PATH RESULT_JSON

WORLD=1 runs the single-process baseline on a 4-device CPU mesh; WORLD=2
runs two processes with 2 local CPU devices each (same 4-device global
mesh, gloo collectives) — same global program, different host feeding.
"""
import json
import os
import sys

# script-mode sys.path[0] is tests/test_parallel — add the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    port, data_root, out, res = sys.argv[3:7]

    os.environ['JAX_PLATFORMS'] = 'cpu'
    # gloo creates one context per executable, with a short rendezvous: on
    # this 1-CPU host the two ranks' compiles can skew by minutes — raise
    # the collective timeout AND share a persistent compilation cache (the
    # single-process baseline pre-warms it; ranks then reach each collective
    # in near-lockstep)
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_cpu_collective_timeout_seconds=900')
    import jax
    cache = os.environ.get('MP_TEST_CACHE_DIR')
    if cache:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 4 // world)
    jax.config.update('jax_default_matmul_precision', 'highest')
    if world > 1:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
        from mm_training_tpu.parallel import initialize
        initialize(f'127.0.0.1:{port}', num_processes=world,
                   process_id=rank)

    from mm_training_tpu.configs import tiny_test_config
    from mm_training_tpu.training.trainer import Trainer

    cfg = tiny_test_config(use_cam=False, use_lidar=True, use_radar=True,
                           batch_size=1,  # per-device -> global batch 4
                           num_workers=2, out_path=out,
                           num_sanity_val_steps=0, latest_every_n_steps=0)
    tr = Trainer(cfg, data_root=data_root)
    tr.setup()
    tr.fit(max_epochs=1)
    metrics = tr._run_eval('val', log=False)
    if rank == 0:
        with open(res, 'w') as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)
    print(f'worker rank={rank}/{world} done', flush=True)


if __name__ == '__main__':
    main()
