"""Single-process behavior of the multihost helpers (the multi-process paths
ride jax.experimental.multihost_utils and need real multi-host runtimes)."""
from mm_training_tpu.parallel import (all_gather_object, barrier,
                                      is_main_process, process_count,
                                      process_index)


def test_single_process_identities():
    assert process_index() == 0
    assert process_count() == 1
    assert is_main_process()
    barrier()  # no-op


def test_all_gather_object_single():
    obj = {'a': [1, 2, 3], 'b': 'x'}
    out = all_gather_object(obj)
    assert out == [obj]
