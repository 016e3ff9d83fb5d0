"""Multi-host runtime helpers — the TPU-native torch_dist equivalent.

Re-design of utils/torch_dist.py (get_rank / get_world_size / synchronize /
all_gather_object over NCCL) for the JAX multi-process runtime: process
identity comes from ``jax.process_index``, barriers and object gathers ride
the JAX runtime over ICI/DCN (jax.experimental.multihost_utils), and
initialization is ``jax.distributed.initialize`` (coordinator discovery is
automatic on TPU pods).

Gradient all-reduce needs NO helper here: the jitted global-view train step
makes XLA insert the cross-device psums (SURVEY §2.4).
"""
from __future__ import annotations

import pickle
from typing import Any, List, Optional

import jax
import numpy as np

__all__ = ['initialize', 'process_index', 'process_count', 'is_main_process',
           'barrier', 'all_gather_object']


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Start the multi-process JAX runtime (no-op when single-process).

    On TPU pods all arguments are discovered from the environment; on other
    platforms pass them explicitly (jax.distributed.initialize semantics).
    """
    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # idempotent like torch_dist's guards (:8-14) — but ONLY for the
        # already-initialized case. Any other RuntimeError (XlaRuntimeError
        # subclasses it: bad coordinator address, rendezvous timeout) must
        # propagate, or every host silently degrades to an independent
        # single-process run that believes it is rank 0.
        msg = str(e).lower()
        if ('only be called once' not in msg
                and 'already initialized' not in msg):
            raise
    # Warm the global collective clique NOW, while every process is still in
    # lockstep: clique contexts are created lazily at the first collective,
    # whose rendezvous has a short timeout — a process stuck in a long trace/
    # compile would otherwise miss it (observed as "Gloo context
    # initialization failed: DEADLINE_EXCEEDED" on CPU; the TPU ICI path has
    # the same lazy-first-use shape). The context is cached afterwards.
    if jax.process_count() > 1:
        barrier('startup')


def process_index() -> int:
    """Rank of this host process (torch_dist.get_rank, :17-21)."""
    return jax.process_index()


def process_count() -> int:
    """Number of host processes (torch_dist.get_world_size, :24-28)."""
    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def barrier(name: str = 'barrier') -> None:
    """Cross-host sync point (torch_dist.synchronize, :31-37)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (torch_dist.all_gather_object, :40-47). Used to pool per-host
    MAPCalculator accumulations before compute_bev on rank 0.
    """
    n = process_count()
    if n == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across hosts (fixed shapes for the gather)
    local_len = np.asarray([payload.size], np.int32)
    all_lens = multihost_utils.process_allgather(local_len).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # [n, max_len]
    return [pickle.loads(gathered[i, :int(all_lens[i])].tobytes())
            for i in range(n)]
