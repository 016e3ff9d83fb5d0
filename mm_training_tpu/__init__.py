"""mm_training_tpu — a TPU-native multimodal BEV 3D-detection training framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
aimotive/mm_training (BEVDepth-derived camera+LiDAR+radar BEV detector on the
aiMotive Multimodal Dataset). The compute path is pure JAX (jit/pjit over a
`jax.sharding.Mesh`); host IO produces fixed-shape padded batches so the whole
train step is a single compiled XLA program with no host round-trips.

Layout:
    configs/     dataclass config surface mirroring exps/conf_aim.py knob names
    core/        boxes, rotations, camera/frustum geometry (numpy + jax)
    ops/         device kernels: lift-splat voxel pooling, voxelization,
                 circle NMS, gaussian heatmap targets, depth labels, warps
    models/      flax.linen modules: ResNet, SECONDFPN, DepthNet, LSSFPN,
                 lidar pillar/BEV encoder, fusion, CenterPoint head
    data/        aiMotive dataset walker, sensor loaders, camera models,
                 fixed-shape collate, synthetic fixtures
    parallel/    mesh construction + sharding rules (dp over ICI; room for a
                 model axis)
    training/    optax/orbax train loop, EMA, LR schedules, checkpoints
    evaluation/  BEV mAP calculator (host-side numpy, parity with utils/eval.py)
    exps/        train / eval / inference entry points
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the production train step takes minutes
# to compile; caching makes every process after the first start instantly.
# Opt out with MM_TRAINING_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get('MM_TRAINING_TPU_NO_COMPILE_CACHE'):
    import jax as _jax

    def _machine_key():
        # XLA:CPU cache entries embed AOT-compiled kernels keyed to the
        # build machine's CPU features; loading them on a different machine
        # fails (cpu_aot_loader "machine feature mismatch") after burning
        # seconds per entry. A /proc/cpuinfo fingerprint is NOT enough: on
        # VM hosts cpuinfo is virtualized to a stable generic string
        # ("Xeon @ 2.10GHz", microcode 0x1) while LLVM detects the real
        # underlying uarch via CPUID — tuning features like
        # prefer-no-gather differ across boots that land on different
        # metal, with identical cpuinfo (observed: entries written one day
        # were feature-mismatched the next boot). Key by boot id instead:
        # every process of one boot shares compiles (the expensive case —
        # test suites, repeated CLI runs), and cross-boot reuse — the case
        # that can't be validated — never happens.
        import hashlib
        import platform
        sig = platform.machine()
        try:
            with open('/proc/sys/kernel/random/boot_id') as f:
                sig += f.read()
        except OSError:  # non-Linux: fall back to per-process (no reuse)
            import uuid
            sig += uuid.uuid4().hex
        return hashlib.sha1(sig.encode()).hexdigest()[:10]

    _cache_root = _os.path.expanduser('~/.cache/mm_training_tpu_xla')
    _cache_dir = _os.environ.get('JAX_COMPILATION_CACHE_DIR') or _os.path.join(
        _cache_root, _machine_key())

    def _gc_stale_boot_dirs():
        # Boot-keyed subdirs from previous boots are unreadable garbage
        # (see _machine_key); reclaim them. Only prune inside our own
        # root, never an operator-provided JAX_COMPILATION_CACHE_DIR.
        import shutil
        keep = _os.path.basename(_cache_dir)
        try:
            entries = _os.listdir(_cache_root)
        except OSError:
            return
        for name in entries:
            path = _os.path.join(_cache_root, name)
            if name != keep:
                shutil.rmtree(path, ignore_errors=True)
                if _os.path.isfile(path):  # pre-keying legacy flat entries
                    try:
                        _os.remove(path)
                    except OSError:
                        pass

    if not _os.environ.get('JAX_COMPILATION_CACHE_DIR'):
        _gc_stale_boot_dirs()
    try:
        # measured on the remote-attached ('axon') backend: reading a large
        # cached executable takes 3x longer than a fresh compile —
        # deserialization + upload dominates. Cache only where the executable
        # stays local. Read the *configured* platform rather than calling
        # jax.default_backend(), which would initialize the backend and lock
        # out later platform overrides (tests, multichip dryrun).
        _platforms = (getattr(_jax.config, 'jax_platforms', None)
                      or _os.environ.get('JAX_PLATFORMS') or '')
        if 'axon' not in _platforms:
            _jax.config.update('jax_compilation_cache_dir', _cache_dir)
            _jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    except Exception:  # older jax without the knob — fine, just slower
        pass
