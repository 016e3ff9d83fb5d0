"""PrefetchLoader: batching, epoch shuffling, and producer-exception
propagation (a dead producer must not hang the training loop)."""
import numpy as np
import pytest

from mm_training_tpu.training.loader import PrefetchLoader


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {'x': np.full((3,), float(i), np.float32), 'path': f'p{i}'}


class _ExplodingDataset(_ArrayDataset):
    def __getitem__(self, i):
        if i >= 2:
            raise ValueError('boom')
        return super().__getitem__(i)


def test_batching_and_drop_last():
    ld = PrefetchLoader(_ArrayDataset(7), batch_size=2, shuffle=False,
                        num_workers=2)
    batches = list(ld)
    assert len(batches) == len(ld) == 3
    assert batches[0]['x'].shape == (2, 3)
    np.testing.assert_allclose(batches[0]['x'][:, 0], [0, 1])
    assert batches[0]['path'] == ['p0', 'p1']


def test_shuffle_changes_per_epoch_deterministically():
    ld = PrefetchLoader(_ArrayDataset(8), batch_size=2, shuffle=True,
                        num_workers=1, seed=3)
    ld.set_epoch(0)
    e0 = np.concatenate([b['x'][:, 0] for b in ld])
    ld.set_epoch(0)
    e0b = np.concatenate([b['x'][:, 0] for b in ld])
    np.testing.assert_array_equal(e0, e0b)
    ld.set_epoch(1)
    e1 = np.concatenate([b['x'][:, 0] for b in ld])
    assert not np.array_equal(e0, e1)
    assert sorted(e0.tolist()) == sorted(e1.tolist())


def test_producer_exception_propagates():
    ld = PrefetchLoader(_ExplodingDataset(8), batch_size=2, shuffle=False,
                        num_workers=1)
    with pytest.raises(ValueError, match='boom'):
        list(ld)


def test_pad_last_marks_n_valid():
    ds = _ArrayDataset(10)
    loader = PrefetchLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                            drop_last=False, pad_last=True)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b['x'].shape[0] == 4 for b in batches)
    assert batches[0].get('n_valid') == 4
    assert batches[2].get('n_valid') == 2      # padded by repeating the last
    np.testing.assert_array_equal(batches[2]['x'][2], batches[2]['x'][3])


def test_abandoned_iteration_releases_producer_thread():
    """Abandoning an iteration (next(iter(loader)) init fetches,
    max_batches-capped evals) must let the producer exit: a producer parked
    forever in q.put() leaks the thread plus prefetch+1 full batches per
    abandonment."""
    import threading
    import time

    ld = PrefetchLoader(_ArrayDataset(64), batch_size=1, shuffle=False,
                        num_workers=1, prefetch=1)
    g0 = iter(ld)
    next(g0)          # spawn the persistent pool worker before baselining
    g0.close()
    time.sleep(1.0)
    base = threading.active_count()
    for _ in range(8):
        g = iter(ld)
        next(g)
        g.close()     # generator finally -> stop.set()
    deadline = time.time() + 15.0
    while time.time() < deadline and threading.active_count() > base:
        time.sleep(0.2)
    assert threading.active_count() <= base, \
        f'{threading.active_count() - base} producer threads still alive'


class _EpochDataset(_ArrayDataset):
    """Sample value depends on (index, epoch) — catches stale forked-worker
    epoch state in process mode."""

    def __init__(self, n):
        super().__init__(n)
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __getitem__(self, i):
        return {'x': np.full((3,), float(i) + 100.0 * self.epoch,
                             np.float32), 'path': f'p{i}'}


def test_process_worker_mode_matches_thread_mode():
    """worker_mode='process' (forked workers, the torch-DataLoader
    equivalent for many-chip hosts) must yield byte-identical batches to
    the thread pool, including epoch-dependent sample state (the parent's
    set_epoch cannot reach a forked child; the task tuple carries it)."""
    def run(mode):
        ds = _EpochDataset(8)
        ld = PrefetchLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                            seed=3, worker_mode=mode)
        try:
            out = []
            for epoch in (0, 1):
                ld.set_epoch(epoch)
                out.extend(b['x'] for b in ld)
            return out
        finally:
            ld.close()

    ref, got = run('thread'), run('process')
    assert len(ref) == len(got) == 8
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
