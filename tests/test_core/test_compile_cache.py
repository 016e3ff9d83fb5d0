"""Import-time persistent-compilation-cache bootstrap (mm_training_tpu/__init__.py).

XLA:CPU cache entries embed AOT-compiled kernels validated against LLVM's
*CPUID-detected* host features. On virtualized hosts /proc/cpuinfo is a
stable synthetic string while the underlying metal (and thus the detected
tuning features, e.g. prefer-no-gather) changes across boots — so the cache
directory is keyed by boot id, and subdirectories from previous boots are
garbage-collected at import. These tests run the bootstrap in a subprocess
with HOME pointed at a temp dir so the real user cache is never touched.
"""
import hashlib
import platform
import subprocess
import sys

import pytest


def _run(code, home):
    return subprocess.run(
        [sys.executable, '-c', code], capture_output=True, text=True,
        timeout=120, cwd='/root/repo',
        env={'PATH': '/usr/bin:/bin', 'HOME': str(home),
             'JAX_PLATFORMS': 'cpu'})


@pytest.mark.skipif(sys.platform != 'linux', reason='boot_id is Linux-only')
def test_cache_dir_is_boot_keyed_and_stale_boots_collected(tmp_path):
    root = tmp_path / '.cache' / 'mm_training_tpu_xla'
    stale = root / 'deadbeef00'          # a previous boot's keyed subdir
    stale.mkdir(parents=True)
    (stale / 'jit_f-123-cache').write_bytes(b'stale aot entry')
    legacy = root / 'jit_train_step-456-cache'  # pre-keying flat layout
    legacy.write_bytes(b'legacy flat entry')

    with open('/proc/sys/kernel/random/boot_id') as f:
        sig = platform.machine() + f.read()
    expect_key = hashlib.sha1(sig.encode()).hexdigest()[:10]

    proc = _run(
        "import mm_training_tpu, jax;"
        "print(jax.config.jax_compilation_cache_dir)", tmp_path)
    assert proc.returncode == 0, proc.stderr
    configured = proc.stdout.strip().splitlines()[-1]
    assert configured.endswith(expect_key), (configured, expect_key)
    assert not stale.exists(), 'previous-boot subdir must be removed'
    assert not legacy.exists(), 'legacy flat entry must be removed'


@pytest.mark.skipif(sys.platform != 'linux', reason='boot_id is Linux-only')
def test_operator_cache_dir_is_respected_and_never_pruned(tmp_path):
    root = tmp_path / '.cache' / 'mm_training_tpu_xla'
    stale = root / 'deadbeef00'
    stale.mkdir(parents=True)
    override = tmp_path / 'my_cache'
    override.mkdir()

    code = ("import os; os.environ['JAX_COMPILATION_CACHE_DIR']=%r;"
            "import mm_training_tpu, jax;"
            "print(jax.config.jax_compilation_cache_dir)" % str(override))
    proc = _run(code, tmp_path)
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip().splitlines()[-1] == str(override)
    # with an operator-provided dir the bootstrap must not touch our root
    assert stale.exists()
