"""Device mesh + sharding rules.

The reference's parallelism surface is data-parallel only (Lightning DDP over
NCCL; SURVEY §2.4). The TPU-native equivalent: a ``jax.sharding.Mesh`` with a
``data`` axis over ICI, batch arrays sharded on it, parameters replicated, and
XLA inserting the gradient all-reduces (the `reduce_mean`/`sync_dist` plumbing
of the reference becomes implicit in the global-view jit). A ``model`` axis is
reserved for spatial/tensor sharding of the large BEV grids (2048x256 cells) —
mesh plumbing is in place even though parity needs only ``data``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'batch_sharding', 'replicated', 'shard_batch',
           'process_batch_bounds', 'local_batch_numpy',
           'local_batches_numpy', 'DATA_AXIS',
           'MODEL_AXIS']

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(devices=None, model_parallel: int = 1,
              num_slices: int = 1) -> Mesh:
    """(model, data) mesh over all (or given) devices.

    Data parallelism rides the fastest-varying axis so gradient all-reduces
    stay on ICI neighbors; the model axis is outermost.

    ``num_slices > 1`` requests multi-slice data parallelism (several pod
    slices joined over DCN): the data axis then spans all slices, laid out
    slice-outermost so XLA's all-reduce decomposes into an intra-slice ICI
    reduce-scatter + a small cross-slice DCN exchange (the jax multislice
    recipe; scaling-book "pure data parallelism across slices"). On real
    TPU the slice assignment comes from the devices' ``slice_index``; on
    backends without slices (CPU tests) contiguous groups of n/num_slices
    devices act as virtual slices — the global program and its numerics are
    identical either way, only the physical collective routing differs.
    The mesh axes stay (model, data), so every downstream sharding rule is
    unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % (model_parallel * num_slices) == 0, (
        n, model_parallel, num_slices)
    if num_slices > 1:
        slice_ids = {getattr(d, 'slice_index', None) for d in devices}
        if None not in slice_ids and len(slice_ids) == num_slices:
            # real multi-slice topology: group by the hardware slice, DCN
            # (slice) dimension outermost within the data axis
            order = sorted(devices, key=lambda d: (d.slice_index, d.id))
        else:
            if None not in slice_ids:
                # hardware DOES report slices but not the requested count:
                # contiguous grouping may straddle DCN and silently demote
                # intra-slice ICI reduce-scatters to cross-slice traffic
                import warnings
                warnings.warn(
                    f'num_slices={num_slices} but devices report '
                    f'{len(slice_ids)} hardware slices; falling back to '
                    'contiguous virtual slices whose collectives may cross '
                    'DCN — set num_slices to the hardware slice count')
            order = devices  # virtual slices: contiguous groups
        per = n // num_slices
        groups = [order[i * per:(i + 1) * per] for i in range(num_slices)]
        # each slice contributes its model_parallel x local-dp block; the
        # data axis is the slice-major concatenation of the local-dp axes
        arr = np.concatenate(
            [np.asarray(g).reshape(model_parallel, per // model_parallel)
             for g in groups], axis=1)
        return Mesh(arr, (MODEL_AXIS, DATA_AXIS))
    arr = np.asarray(devices).reshape(model_parallel, n // model_parallel)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_batch_bounds(mesh: Mesh, global_batch: int):
    """Rows [lo, hi) of a data-axis-sharded global batch that THIS process's
    addressable devices hold — the slice its host loader must produce in a
    multi-process run. Asserts the process's shards are contiguous (true for
    standard TPU process/device layouts)."""
    sh = batch_sharding(mesh)
    imap = sh.devices_indices_map((global_batch,))
    local = {(s.start or 0, global_batch if s.stop is None else s.stop)
             for s in (imap[d][0] for d in sh.addressable_devices)}
    lo = min(s[0] for s in local)
    hi = max(s[1] for s in local)
    per = global_batch // mesh.shape[DATA_AXIS]
    assert (hi - lo) == per * len(local), (
        'non-contiguous process shards — custom device order not supported '
        f'by the host loader sharding: {sorted(local)}')
    return lo, hi


def local_batches_numpy(*arrs):
    """Fetch several arrays at once: one bundled device_get instead of
    serial per-array fetches. On the remote-attached backend each separate
    fetch is a full tunnel round-trip (~30 ms) — fetching the predict
    outputs one by one measured 170 ms vs 81 ms bundled.

    Multi-process: gathers THIS process's shards of every array in the one
    bundled device_get (local_batch_numpy semantics — global row order,
    model-axis replicas deduped), then assembles on host."""
    import jax as _jax
    if _jax.process_count() == 1:
        return tuple(_jax.device_get(arrs))
    plans, shard_data = [], []
    for a in arrs:
        if not isinstance(a, _jax.Array):
            plans.append(('np', a))
            continue
        if a.ndim == 0:
            # replicated scalar (e.g. eval loss metrics riding the same
            # bundled fetch): any one local shard is the value
            plans.append(('scalar', len(shard_data)))
            shard_data.append(a.addressable_shards[0].data)
            continue
        seen = {}
        for s in a.addressable_shards:
            start = s.index[0].start or 0
            if start not in seen:
                seen[start] = len(shard_data)
                shard_data.append(s.data)
        plans.append(('shards', [seen[k] for k in sorted(seen)]))
    fetched = _jax.device_get(shard_data)
    out = []
    for kind, plan in plans:
        if kind == 'np':
            out.append(np.asarray(plan))
        elif kind == 'scalar':
            out.append(np.asarray(fetched[plan]))
        else:
            out.append(np.concatenate([fetched[i] for i in plan], axis=0))
    return tuple(out)


def local_batch_numpy(arr):
    """Batch-sharded global jax.Array -> numpy array of THIS process's rows
    (global row order). Multi-process hosts cannot fetch rows living on
    other processes' devices; per-row consumers (mAP accumulation, JSON
    export, viz) operate on the local slice and pool host-side
    (multihost.all_gather_object). Model-axis replicas are deduped."""
    import jax as _jax
    if not isinstance(arr, _jax.Array) or _jax.process_count() == 1:
        return np.asarray(arr)
    seen = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=0)


def shard_batch(mesh: Mesh, batch, stacked: bool = False):
    """Build the global on-device batch with batch-dim sharding (non-arrays
    pass through untouched). With ``stacked`` the arrays carry a leading K
    (steps-per-dispatch) axis and the batch dim is axis 1.

    Single-process: a plain sharded device_put of the full host batch.
    Multi-process: each host holds only its slice (PrefetchLoader
    process-sharding, training/loader.py) and the global jax.Array is
    assembled from the process-local rows — the jax-native equivalent of
    Lightning's per-rank DistributedSampler feeding (SURVEY §2.4).
    """
    multiproc = jax.process_count() > 1
    sh = (NamedSharding(mesh, P(None, DATA_AXIS)) if stacked
          else batch_sharding(mesh))
    if multiproc:
        # global/local batch ratio = data columns total / data columns this
        # process touches (model-axis rows replicate the same batch rows)
        me = jax.process_index()
        local_cols = sum(
            any(d.process_index == me for d in mesh.devices[:, j])
            for j in range(mesh.devices.shape[1]))
        scale = mesh.shape[DATA_AXIS] // max(1, local_cols)

    def put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x
        if not multiproc:
            return jax.device_put(x, sh)
        x = np.asarray(x)
        axis = 1 if stacked else 0
        gshape = list(x.shape)
        gshape[axis] = gshape[axis] * scale
        return jax.make_array_from_process_local_data(sh, x, tuple(gshape))

    return jax.tree_util.tree_map(put, batch)
