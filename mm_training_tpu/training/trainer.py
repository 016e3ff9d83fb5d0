"""Training runtime: epoch loop, checkpoints, early stopping, eval, export.

Re-design of the reference's Lightning wiring (exps/mm_training_aim.py:
BEVDepthLightningModel + create_trainer):
  * fit: epoch loop with jitted train step over the data mesh, per-epoch
    validation, top-k checkpointing by val_detection_loss + a 'latest'
    checkpoint every N steps (mm_training_aim.py:590-604), early stopping
    (patience 8 on val_detection_loss, :597), config snapshot (:582-583).
  * validate/test: decode on device, BEV mAP on host via MAPCalculator
    (:291-342,416-422), aiMotive-format JSON export mirroring the dataset
    tree (:514-519).
  * checkpoints are orbax pytrees {params, batch_stats, opt_state, step,
    ema_*}; resume via Config.ckpt_path (:638).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CLASSES, Config
from ..core.transforms import yaw_to_quat
from ..data.aimotive_dataset import AiMotiveDataset
from ..evaluation import MAPCalculator
from ..models import BEVDepthLiDAR
from ..parallel import (all_gather_object, barrier, is_main_process,
                        local_batches_numpy, make_mesh,
                        process_count, shard_batch)
from ..utils.logging import MetricsLogger, NullLogger
from ..utils.profiling import StepTimer, profile_trace
from .loader import PrefetchLoader, stack_batches
from .optim import make_optimizer
from .train_step import (TrainState, _strip_host_fields, create_train_state,
                         make_eval_step, make_predict_step, make_train_step,
                         make_train_step_multi)

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None

__all__ = ['Trainer', 'boxes_to_aimotive_dict']


def boxes_to_aimotive_dict(boxes: np.ndarray, scores: np.ndarray,
                           labels: np.ndarray, class_names=CLASSES) -> dict:
    """Decoded boxes (bottom-z) -> aiMotive CapturedObjects JSON
    (pred_dict_to_aimotive_dict, mm_training_aim.py:218-250: origin z =
    bottom z + dz/2)."""
    out = {'CapturedObjects': []}
    for box, score, label in zip(boxes, scores, labels):
        quat = yaw_to_quat(float(box[6]))
        out['CapturedObjects'].append({
            'BoundingBox3D Origin X': float(box[0]),
            'BoundingBox3D Origin Y': float(box[1]),
            'BoundingBox3D Origin Z': float(box[2]) + float(box[5]) / 2,
            'BoundingBox3D Extent X': float(box[3]),
            'BoundingBox3D Extent Y': float(box[4]),
            'BoundingBox3D Extent Z': float(box[5]),
            # dataset schema keys (annotation.py) — the reference's exporter
            # writes 'BoundingBox3D Relative Velocity *' instead, which its
            # own loader cannot parse back; deviation makes exports
            # round-trip as annotations
            'Relative Velocity X': float(box[7]),
            'Relative Velocity Y': float(box[8]),
            'Relative Velocity Z': 0,
            'BoundingBox3D Orientation Quat X': float(quat[0]),
            'BoundingBox3D Orientation Quat Y': float(quat[1]),
            'BoundingBox3D Orientation Quat Z': float(quat[2]),
            'BoundingBox3D Orientation Quat W': float(quat[3]),
            'ObjectType': class_names[int(label)],
            'Score': float(score),
        })
    return out


class Trainer:
    def __init__(self, cfg: Config, data_root: Optional[str] = None,
                 mesh=None, datasets: Optional[Dict[str, object]] = None):
        self.cfg = cfg
        self.data_root = data_root or cfg.data_root
        self.mesh = (mesh if mesh is not None
                     else make_mesh(model_parallel=cfg.model_parallel,
                                    num_slices=cfg.num_slices))
        from ..parallel import MODEL_AXIS
        self.model = BEVDepthLiDAR(
            cfg, spatial_axis=MODEL_AXIS if cfg.model_parallel > 1 else None)
        self.map_calculator = MAPCalculator()
        self.state: Optional[TrainState] = None
        self._datasets = datasets or {}
        self._loaders: Dict[str, PrefetchLoader] = {}
        self.out_path = Path(cfg.output_path)
        self.logger = (MetricsLogger(self.out_path, cfg.experiment_name,
                                     log_every=cfg.log_every_n_steps)
                       if is_main_process() else NullLogger())
        self._ckpt_managers = {}
        self.global_step = 0
        # training-loop state (checkpointed alongside params — Lightning
        # restores Trainer + callback state on ckpt_path resume,
        # mm_training_aim.py:597,638: EarlyStopping counters, epoch, loader
        # position). _loop_restored flips when a checkpoint carried it.
        self.loop_state = {'epoch': 0, 'batch_in_epoch': 0,
                           'best_val': float('inf'), 'patience': 0}
        self._loop_restored = False

    # ----------------------------------------------------------------- data
    def dataset(self, split: str) -> AiMotiveDataset:
        if split not in self._datasets:
            self._datasets[split] = AiMotiveDataset(self.data_root, self.cfg,
                                                    split=split)
        return self._datasets[split]

    @property
    def data_parallel_size(self) -> int:
        from ..parallel import DATA_AXIS
        return self.mesh.shape[DATA_AXIS]

    def loader(self, split: str) -> PrefetchLoader:
        """Host loader yielding GLOBAL batches: cfg.batch_size is per-device
        (conf_aim.py per-GPU semantics); the global-view jit shards them over
        the data axis. Eval loaders pad the trailing batch (n_valid marker)
        so no frame is dropped from the metric at any mesh size."""
        if split not in self._loaders:
            train = split == 'train'
            global_bs = self.cfg.batch_size * self.data_parallel_size
            rows = None
            if process_count() > 1:
                # each process loads only its slice of every global batch
                # (Lightning DistributedSampler equivalent; shard_batch
                # assembles the global arrays from the local rows)
                from ..parallel import process_batch_bounds
                rows = process_batch_bounds(self.mesh, global_bs)
            self._loaders[split] = PrefetchLoader(
                self.dataset(split), global_bs,
                shuffle=train, num_workers=self.cfg.num_workers,
                seed=self.cfg.seed, drop_last=train, pad_last=not train,
                process_rows=rows,
                worker_mode=getattr(self.cfg, 'loader_worker_mode', 'thread'))
        return self._loaders[split]

    # ---------------------------------------------------------------- setup
    def setup(self, steps_per_epoch: Optional[int] = None):
        cfg = self.cfg
        if steps_per_epoch is None:
            try:
                steps_per_epoch = max(1, len(self.loader('train')))
            except TypeError:
                # a custom injected dataset without __len__ — the ONLY case
                # where a default is meaningful. Loud: the LR milestones
                # ([19, 23] epochs) are scheduled in steps, so a wrong
                # steps_per_epoch silently corrupts the schedule.
                import warnings
                steps_per_epoch = 1000
                warnings.warn(
                    'train dataset has no __len__; defaulting '
                    f'steps_per_epoch={steps_per_epoch} — LR epoch '
                    'milestones will be scheduled against this value. Pass '
                    'Trainer.setup(steps_per_epoch=...) explicitly.',
                    stacklevel=2)
            # any other loader failure propagates: training cannot proceed
            # without data, and a silent fallback would mis-schedule the LR
        # linear LR scaling over the GLOBAL batch (conf_aim.py:14's
        # lr = base/64*batch with per-GPU batch_size x world_size semantics):
        # cfg.learning_rate covers the per-device factor, the mesh's data
        # extent supplies the rest — same rule the dryrun harness uses
        # (parallel/dryrun.py), so the validated multichip program and the
        # production Trainer train with the SAME optimizer
        self.tx = make_optimizer(cfg, steps_per_epoch,
                                 global_batch_scale=self.data_parallel_size)
        self._build_steps()
        self.steps_per_epoch = steps_per_epoch

        self.out_path.mkdir(parents=True, exist_ok=True)
        # config snapshot (create_trainer copies conf_aim.py; we dump the
        # dataclass, mm_training_aim.py:582-583) — rank 0 only: processes
        # share out_path in a multi-process run
        if is_main_process():
            with open(self.out_path / 'config.json', 'w') as f:
                json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)

    def init_state(self, sample_batch: Dict[str, np.ndarray], rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        if self.cfg.use_cam and self.cfg.get_backbone_conf().factorized_splat:
            # the factorized splat is exact only for zero-roll/pitch rigs
            # (virtualized cameras); verify against this run's calibration
            # and fall back to the general scatter automatically
            from ..core.geometry import rig_is_row_independent
            if not rig_is_row_independent(sample_batch['sensor2ego'],
                                          sample_batch['intrin']):
                import warnings
                warnings.warn(
                    'camera rig has roll/pitch or intrinsic skew — '
                    'switching to the general (non-factorized) splat for '
                    'exact geometry', stacklevel=2)
                self._disable_factorized_splat()
        device_batch = shard_batch(self.mesh, _strip(sample_batch))
        model_batch = dict(device_batch)
        b, s, n = model_batch['imgs'].shape[:3]
        model_batch['flipped'] = jnp.zeros((b * s * n,), bool)
        self.state = create_train_state(self.cfg, self.model, self.tx, rng,
                                        model_batch)
        pretrained = (self.cfg.use_cam and
                      self.cfg.get_backbone_conf().img_backbone_conf.pretrained)
        if pretrained:
            # torchvision-format ImageNet init (conf_aim.py:60 parity)
            from ..models.torch_import import (convert_torchvision_resnet,
                                               load_torch_state_dict,
                                               merge_pretrained_backbone)
            sd = load_torch_state_dict(pretrained)
            bb = self.cfg.get_backbone_conf().img_backbone_conf
            conv = convert_torchvision_resnet(
                sd, bb.depth, stem_s2d=bb.stem_s2d)
            tree = merge_pretrained_backbone(
                {'params': self.state.params,
                 'batch_stats': self.state.batch_stats}, conv)
            self.state = self.state.replace(params=tree['params'],
                                            batch_stats=tree['batch_stats'])
        if self.cfg.ckpt_path:
            self.restore(self.cfg.ckpt_path)
        return self.state

    def _disable_factorized_splat(self):
        """Rebuild the model + step programs with the general splat (same
        parameter tree — the splat is parameter-free, so an existing
        TrainState stays valid)."""
        import dataclasses

        from ..parallel import MODEL_AXIS
        bb = dataclasses.replace(self.cfg.get_backbone_conf(),
                                 factorized_splat=False)
        self.cfg = dataclasses.replace(self.cfg, backbone_conf=bb)
        cfg = self.cfg
        self.model = BEVDepthLiDAR(
            cfg, spatial_axis=MODEL_AXIS if cfg.model_parallel > 1 else None)
        if hasattr(self, 'tx'):
            self._build_steps()

    def _build_steps(self):
        """(Re)build the jitted step programs from the current cfg/model/tx —
        the single site shared by setup() and the factorized-splat fallback."""
        cfg = self.cfg
        self._train_step = make_train_step(cfg, self.model, self.tx)
        self._train_step_multi = (
            make_train_step_multi(cfg, self.model, self.tx,
                                  cfg.steps_per_dispatch)
            if cfg.steps_per_dispatch > 1 else None)
        self._eval_step = make_eval_step(cfg, self.model)
        self._predict_step = make_predict_step(cfg, self.model)

    def fold_bn_for_inference(self):
        """Apply deploy-time conv-BN fusion (models/bn_fold.py) to this
        trainer's weights, in place. Folded-ness travels with the params
        (a folded BN scope holds only {'bias'}; batch_norm emits a
        bias-only FoldedBN when applied to such a tree), so other
        models/Trainers in the process are unaffected and the jitted
        steps retrace automatically on the new tree shape. Inference-only
        — training on folded weights raises at trace time. Call after
        init_state/restore."""
        from ..models.bn_fold import fold_state
        if self.state is None:
            raise RuntimeError('fold_bn_for_inference requires an '
                               'initialized state (call init_state first)')
        self.state = fold_state(self.state)
        # drop jit caches still holding the unfolded-tree traces
        self._build_steps()

    # ----------------------------------------------------------- checkpoint
    def _manager(self, name: str, best: bool):
        if ocp is None:
            return None
        if name not in self._ckpt_managers:
            path = (self.out_path / 'saved_models' / name).absolute()
            if best:
                opts = ocp.CheckpointManagerOptions(
                    max_to_keep=self.cfg.save_top_k,
                    best_fn=lambda m: m['val_detection_loss'],
                    best_mode='min')
            else:
                opts = ocp.CheckpointManagerOptions(max_to_keep=1)
            self._ckpt_managers[name] = ocp.CheckpointManager(path, options=opts)
        return self._ckpt_managers[name]

    def save_checkpoint(self, name='best', metrics: Optional[dict] = None):
        mgr = self._manager(name, best=(name == 'best'))
        if mgr is None or self.state is None:
            return
        # serialize with any in-flight async write to this manager (no-op
        # when idle); orbax requires one save at a time per manager
        mgr.wait_until_finished()
        mgr.save(int(self.state.step),
                 args=ocp.args.StandardSave(
                     _state_to_pytree(self.state, self.loop_state)),
                 metrics=metrics)
        if not self.cfg.async_checkpointing:
            mgr.wait_until_finished()

    def wait_for_checkpoints(self):
        """Barrier on all in-flight async checkpoint writes (no-op when
        sync or idle). Called on fit() exit and before restore() so a
        background write can never be read half-finished or lost to
        process exit."""
        for mgr in self._ckpt_managers.values():
            mgr.wait_until_finished()

    def restore(self, path: str):
        """Restore params/opt state from an orbax directory (a manager root
        or a single step dir). Raises on a missing/invalid path — silently
        training from scratch is the exact failure checkpointing exists to
        prevent."""
        assert self.state is not None, 'call init_state first'
        self.wait_for_checkpoints()  # never read our own write mid-flight
        path = os.path.abspath(path)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f'checkpoint path {path!r} is not a directory')
        step_dirs = [d for d in os.listdir(path) if d.isdigit()]
        if step_dirs:
            path = os.path.join(path,
                                str(_pick_restore_step(path, step_dirs)))
        # CheckpointManager saves the pytree under the 'default' item
        if os.path.isdir(os.path.join(path, 'default')):
            path = os.path.join(path, 'default')
        ckptr = ocp.StandardCheckpointer()
        template = _state_to_pytree(self.state, self.loop_state)
        try:  # pre-loop-state checkpoints have no 'loop' subtree
            has_loop = 'loop' in ckptr.metadata(path).item_metadata.tree
        except Exception:
            has_loop = True  # assume current format; restore raises if not
        if not has_loop:
            template.pop('loop')
        restored = ckptr.restore(path, template)
        self.state = _pytree_to_state(self.state, restored)
        self.global_step = int(self.state.step)
        if 'loop' in restored:
            self.loop_state = {
                'epoch': int(restored['loop']['epoch']),
                'batch_in_epoch': int(restored['loop']['batch_in_epoch']),
                'best_val': float(restored['loop']['best_val']),
                'patience': int(restored['loop']['patience'])}
            self._loop_restored = True
        return self.state

    # ------------------------------------------------------------------ fit
    def fit(self, max_epochs: Optional[int] = None,
            max_steps: Optional[int] = None, resume: bool = True):
        """Train. With ``resume`` (default), a 'latest' checkpoint already in
        out_path is restored first — preemption recovery: the periodic
        latest-checkpoint (latest_every_n_steps) plus this makes a killed run
        continue where it stopped."""
        try:
            return self._fit(max_epochs, max_steps, resume)
        finally:
            # async checkpointing: the last 'latest'/'best' write may still
            # be in flight — never exit fit (or unwind an exception) with a
            # half-written checkpoint on disk
            self.wait_for_checkpoints()

    def _fit(self, max_epochs, max_steps, resume):
        cfg = self.cfg
        max_epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        train_loader = self.loader('train')
        if self.state is None:
            self.setup() if not hasattr(self, '_train_step') else None
            try:
                first = next(iter(train_loader))
            except StopIteration:
                try:  # injected datasets may lack __len__
                    n = str(len(self.dataset('train')))
                except TypeError:
                    n = 'an unknown number of'
                raise ValueError(
                    f'train split has {n} frames — '
                    f'fewer than one global batch '
                    f'({self.cfg.batch_size} per device x '
                    f'{self.data_parallel_size} data-parallel = '
                    f'{self.cfg.batch_size * self.data_parallel_size}); '
                    'drop_last leaves the loader empty') from None
            self.init_state(first)
            latest = self.out_path / 'saved_models' / 'latest'
            if resume and not cfg.ckpt_path and latest.is_dir():
                self.restore(str(latest))

        rng = jax.random.PRNGKey(cfg.seed + 1)

        # sanity val steps (num_sanity_val_steps=2, mm_training_aim.py:624)
        if cfg.num_sanity_val_steps:
            self._run_eval('val', max_batches=cfg.num_sanity_val_steps,
                           log=False)

        kdisp = max(1, cfg.steps_per_dispatch)
        timer = StepTimer()
        # resume: the checkpointed loop state carries the exact epoch,
        # loader position and early-stop counters (Lightning parity —
        # callbacks + loaders restore on ckpt_path resume,
        # mm_training_aim.py:597,638). Pre-loop-state checkpoints fall back
        # to inferring the epoch from the step count.
        if self._loop_restored:
            start_epoch = self.loop_state['epoch']
            resume_batch = self.loop_state['batch_in_epoch']
        else:
            start_epoch = self.global_step // max(1, self.steps_per_epoch)
            resume_batch = 0
        for epoch in range(start_epoch, max_epochs):
            train_loader.set_epoch(epoch)
            if resume_batch:
                # mid-epoch resume: fast-forward the deterministic batch
                # plan (saves at step boundaries keep this a multiple of
                # the K-dispatch group size, so grouping stays aligned
                # with the unkilled run's)
                train_loader.skip_batches(resume_batch)
            self.loop_state['epoch'] = epoch
            self.loop_state['batch_in_epoch'] = resume_batch
            resume_batch = 0
            for batch, device_batch, stacked in self._device_batches(
                    train_loader, stack=kdisp):
                if max_steps and self.global_step >= max_steps:
                    # covers resuming a run already at/past max_steps: the
                    # K-group path below would run zero micro-steps and
                    # reference undefined metrics
                    break
                timer.start()
                prev_step = self.global_step
                remaining = (max_steps - self.global_step if max_steps
                             else None)
                if stacked and remaining is not None and remaining < kdisp:
                    # final group would overshoot max_steps: run only the
                    # remaining micro-batches through the single-step path
                    # so training lands EXACTLY on max_steps
                    with self.mesh:
                        for k in range(remaining):
                            single = jax.tree_util.tree_map(
                                lambda x: x[k], device_batch)
                            step_fn = self._synced_compile(
                                '_train_step', self.state, single, rng)
                            self.state, metrics = step_fn(self.state, single,
                                                          rng)
                    n = remaining * batch['points'].shape[1]
                else:
                    # trailing batches that don't fill a K-group run through
                    # the single-step path (no sample is dropped)
                    step_attr = ('_train_step_multi' if stacked
                                 else '_train_step')
                    # mesh context resolves sharding-constraint axis names
                    with self.mesh:
                        step_fn = self._synced_compile(step_attr, self.state,
                                                       device_batch, rng)
                        self.state, metrics = step_fn(self.state,
                                                      device_batch, rng)
                    n = batch['points'].shape[0] * (
                        batch['points'].shape[1] if stacked else 1)
                self.global_step = int(self.state.step)  # fetch = step barrier
                self.loop_state['batch_in_epoch'] += kdisp if stacked else 1
                timer.stop(n_samples=n)
                self.logger.log_step(self.global_step, metrics)
                if cfg.viz_every_n_steps and (
                        self.global_step // cfg.viz_every_n_steps
                        > prev_step // cfg.viz_every_n_steps):
                    self._log_train_viz(batch, device_batch,
                                        kdisp if stacked else 1)
                if cfg.latest_every_n_steps and (
                        self.global_step // cfg.latest_every_n_steps
                        > prev_step // cfg.latest_every_n_steps):
                    self.save_checkpoint('latest')
                if max_steps and self.global_step >= max_steps:
                    break
            for k, v in timer.summary().items():
                self.logger.log_scalar(self.global_step, k, v)

            val_metrics = self._run_eval('val')
            vloss = val_metrics.get('val_detection_loss', float('inf'))
            # update the early-stop counters BEFORE the epoch-end save so a
            # resume from this checkpoint makes the same stop/best decisions
            # as the unkilled run
            if vloss < self.loop_state['best_val']:
                self.loop_state['best_val'] = vloss
                self.loop_state['patience'] = 0
            else:
                self.loop_state['patience'] += 1
            self.loop_state['epoch'] = epoch + 1
            self.loop_state['batch_in_epoch'] = 0
            self.save_checkpoint('best', metrics={'val_detection_loss': vloss})
            if self.loop_state['patience'] >= cfg.early_stop_patience:
                break
            if max_steps and self.global_step >= max_steps:
                break
        return self.state

    # ----------------------------------------------------------------- eval
    def _run_eval(self, split: str, prefix: Optional[str] = None,
                  max_batches: Optional[int] = None, log: bool = True,
                  export: bool = False) -> Dict[str, float]:
        cfg = self.cfg
        prefix = prefix or split
        loader = self.loader(split)
        self.map_calculator.reset()
        agg: Dict[str, float] = {}
        count = 0

        def consume(bi, batch, mkeys, dev_out, viz):
            # per-row consumers get THIS process's rows only (global rows
            # are not host-fetchable across processes); all_gather_object
            # pools the accumulations below. The loss scalars ride the same
            # bundled fetch — separate float(v) calls would each pay a
            # tunnel round-trip (~30 ms) on remote-attached backends
            nonlocal count
            fetched = local_batches_numpy(*dev_out)
            boxes, scores, labels, valid = fetched[:4]
            metrics = dict(zip(mkeys, fetched[4:]))
            self._accumulate_map(batch, boxes, scores, labels, valid)
            if log and bi == 0:
                self._log_scene_panel(batch, boxes, scores, labels, valid,
                                      prefix, viz)
            if export:
                self._export_results(batch, boxes, scores, labels, valid)
            # weight by valid samples so a padded trailing batch (pad_last)
            # contributes proportionally, not as a full batch (global count:
            # the jitted losses already pool over every process's rows)
            w = int(batch.get('n_valid_global',
                              batch.get('n_valid', boxes.shape[0])))
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v) * w
            count += w

        # Software-pipelined dispatch/fetch: batch i+1's eval program is
        # dispatched BEFORE batch i's outputs are fetched, so the host-side
        # fetch round-trip + mAP accumulation of batch i overlap the device
        # compute of batch i+1 (dispatch is async). _device_batches already
        # overlaps the H2D transfer one batch ahead of that.
        pending = None
        for bi, (batch, device_batch, _) in enumerate(
                self._device_batches(loader, max_batches)):
            with self.mesh:
                eval_fn = self._synced_compile('_eval_step', self.state,
                                               device_batch)
                metrics, (boxes, scores, labels, valid), viz = \
                    eval_fn(self.state, device_batch)
            mkeys = list(metrics)
            dev_out = (boxes, scores, labels, valid,
                       *(metrics[k] for k in mkeys))
            if pending is not None:
                consume(*pending)
            pending = (bi, batch, mkeys, dev_out, viz)
        if pending is not None:
            consume(*pending)
        out = {f'{prefix}_{k}': v / max(count, 1) for k, v in agg.items()}
        # pool per-host accumulations before computing the metric
        # (replaces torch_dist.all_gather_object, mm_training_aim.py-era DDP)
        if process_count() > 1:
            pooled = all_gather_object((self.map_calculator.gts,
                                        self.map_calculator.preds,
                                        self.map_calculator.img_names))
            if is_main_process():
                self.map_calculator.reset()
                for gts, preds, names in pooled:
                    self.map_calculator.update(gts, preds, names)
        if count and len(self.map_calculator) and is_main_process():
            bev = self.map_calculator.compute_bev(
                iou_thr=0.3, x_range=cfg.point_cloud_range[3])
            out.update({f'{prefix}_{k}': float(v) for k, v in bev.items()})
            if export:
                # PR curves + per-class AP per eval (utils/eval.py:483-499)
                self.map_calculator.export_pr_curves(
                    str(self.out_path / 'metrics' / prefix),
                    iou_thr=0.3, x_range=cfg.point_cloud_range[3],
                    class_names=CLASSES)
        self.map_calculator.reset()
        if log:
            self.logger.log_eval(self.global_step, out)
        return out

    def profile(self, n_steps: int = 5):
        """Capture a device trace of n train steps under out_path/profile
        (view in Perfetto / TensorBoard). Tracing subsystem — SURVEY §5."""
        loader = self.loader('train')
        if not hasattr(self, '_train_step'):
            self.setup()  # same guard as fit(): a fresh Trainer can profile
        if self.state is None:
            self.init_state(next(iter(loader)))
        rng = jax.random.PRNGKey(self.cfg.seed + 2)
        it = iter(loader)
        with profile_trace(str(self.out_path / 'profile')):
            for _ in range(n_steps):
                try:
                    batch = next(it)
                except StopIteration:  # n_steps > one epoch: wrap around
                    it = iter(loader)
                    batch = next(it)
                device_batch = shard_batch(self.mesh, _strip(batch))
                # mesh context + synced compile like every other step call
                # site: sharding-constraint axis names need the mesh, and a
                # multi-process profile must not skip the compile barrier
                with self.mesh:
                    step_fn = self._synced_compile('_train_step', self.state,
                                                   device_batch, rng)
                    self.state, metrics = step_fn(self.state,
                                                  device_batch, rng)
                # forced fetch, not block_until_ready: the latter does not
                # synchronize on remote-attached backends, which would end
                # the trace before the steps finish
                float(metrics['train_loss'])
        return str(self.out_path / 'profile')

    def validate(self, max_batches=None):
        return self._run_eval('val', max_batches=max_batches)

    def test(self, max_batches=None):
        return self._run_eval('val', prefix='test', max_batches=max_batches,
                              export=True)

    def test_all_odds(self, odds=('highway', 'urban', 'night', 'rain'),
                      max_batches=None) -> Dict[str, Dict[str, float]]:
        """Per-ODD evaluation (the reference runs one config file per ODD,
        exps/configs/eval_*.py; here it is one call)."""
        out = {}
        for odd in odds:
            try:
                ds = AiMotiveDataset(self.data_root, self.cfg, split='val',
                                     eval_odd=odd)
            except FileNotFoundError:
                continue
            if not len(ds):
                continue
            key = f'val_{odd}'
            self._datasets[key] = ds
            self._loaders.pop(key, None)
            out[odd] = self._run_eval(key, prefix=f'test_{odd}',
                                      max_batches=max_batches)
        return out

    def _log_train_viz(self, batch, device_batch, kdisp: int):
        """Decode the current train batch and log the scene panels
        (reference: wandb Object3D/log_images every 200 train steps,
        mm_training_aim.py:270-284)."""
        if process_count() > 1:
            # train-batch signatures differ from the synced-compiled eval
            # executable; panels still come from the eval batches
            return
        try:
            if kdisp > 1:  # stacked [K, B, ...]: take the last micro-batch
                batch = {k: (v[-1] if isinstance(v, np.ndarray) else v)
                         for k, v in batch.items()}
                device_batch = jax.tree_util.tree_map(lambda x: x[-1],
                                                      device_batch)
            with self.mesh:
                _, (boxes, scores, labels, valid), viz = self._eval_step(
                    self.state, device_batch)
            self._log_scene_panel(batch, *local_batches_numpy(
                boxes, scores, labels, valid), 'train', viz)
        except Exception as e:  # viz must never break training
            self._warn_viz_failure(e)

    def _log_scene_panel(self, batch, boxes, scores, labels, valid, prefix,
                         viz=None):
        """First-batch panels: BEV raster (GT white, predictions
        class-colored), per-task heatmaps, expected-depth map, and camera
        images with projected points + box wireframes — parity with the
        reference's wandb Object3D / log_images artifacts
        (mm_training_aim.py:379-404,491-499)."""
        try:
            from ..utils.renderer import (draw_boxes_camera,
                                          draw_points_camera,
                                          render_bev, render_depth_panel,
                                          render_heatmap_panel)
            v = np.asarray(valid[0]) & (np.asarray(scores[0]) > 0.3)
            pts0 = np.asarray(batch['points'][0])[np.asarray(batch['point_mask'][0])]
            gt0 = np.asarray(batch['gt_boxes'][0])[np.asarray(batch['gt_mask'][0])]
            pred_b = np.asarray(boxes[0])[v]
            pred_l = np.asarray(labels[0])[v]
            if len(pred_b):
                # decode returns bottom-center z (mmdet3d parity); every viz
                # helper (box_corners_3d, log_scene_3d) and the GT use
                # gravity-center z — shift once here
                pred_b = pred_b.copy()
                pred_b[:, 2] += pred_b[:, 5] / 2.0
            img = render_bev(pts0, gt_boxes=gt0, pred_boxes=pred_b,
                             pred_labels=pred_l,
                             pc_range=self.cfg.point_cloud_range, px_per_m=2.0)
            self.logger.log_image(self.global_step, f'{prefix}_bev', img)
            # interactive 3D scene (wandb Object3D / offline .ply+boxes —
            # reference mm_training_aim.py:379-404)
            self.logger.log_scene_3d(self.global_step, f'{prefix}_scene',
                                     pts0, gt_boxes=gt0, pred_boxes=pred_b,
                                     pred_labels=pred_l)

            if viz is not None and 'heatmaps' in viz:
                hm = np.asarray(viz['heatmaps'], np.float32)
                self.logger.log_image(self.global_step, f'{prefix}_heatmaps',
                                      render_heatmap_panel(list(hm)))
            if viz is not None and 'depth' in viz:
                bb = self.cfg.get_backbone_conf()
                self.logger.log_image(
                    self.global_step, f'{prefix}_depth',
                    render_depth_panel(np.asarray(viz['depth'], np.float32),
                                       bb.d_bound))
            if self.cfg.use_cam and 'imgs' in batch:
                cam_img = np.asarray(batch['imgs'][0, 0, 0])[..., :3]
                cam_img = np.ascontiguousarray(cam_img, np.uint8)
                extr = np.asarray(batch['extrinsics'][0]).reshape(-1, 4, 4)[0]
                intr = np.asarray(batch['intrin'][0]).reshape(-1, 4, 4)[0]
                cam_img = draw_points_camera(cam_img, pts0, extr, intr)
                cam_img = draw_boxes_camera(cam_img, gt0, extr, intr,
                                            color=(255, 255, 255))
                cam_img = draw_boxes_camera(cam_img, pred_b, extr, intr,
                                            labels=pred_l)
                self.logger.log_image(self.global_step, f'{prefix}_cam0',
                                      cam_img)
        except Exception as e:  # viz must never break eval
            self._warn_viz_failure(e)

    def _warn_viz_failure(self, exc: Exception):
        """Viz panels are best-effort, but a renderer regression should not
        ship as silently-missing images: surface the first failure."""
        if not getattr(self, '_viz_warned', False):
            self._viz_warned = True
            import traceback
            import warnings
            warnings.warn('visualization panel failed (suppressed for the '
                          'rest of the run): '
                          + ''.join(traceback.format_exception_only(exc)).strip())

    def predict(self, split='val', max_batches=None):
        loader = self.loader(split)
        # same dispatch/fetch pipeline as _run_eval: batch i's export
        # (fetch + JSON write) overlaps batch i+1's device compute
        pending = None
        for batch, device_batch, _ in self._device_batches(loader,
                                                           max_batches):
            with self.mesh:
                predict_fn = self._synced_compile('_predict_step', self.state,
                                                  device_batch)
                out = predict_fn(self.state, device_batch)
            if pending is not None:
                pbatch, pout = pending
                self._export_results(pbatch, *local_batches_numpy(*pout))
            pending = (batch, out)
        if pending is not None:
            pbatch, pout = pending
            self._export_results(pbatch, *local_batches_numpy(*pout))

    # -------------------------------------------------------------- helpers
    def _synced_compile(self, attr: str, *args):
        """Multi-process only: explicitly compile a jitted step on its first
        use, then barrier, then return the Compiled executable (cached on
        the attribute). The CPU-collectives context is created lazily at a
        program's FIRST execution with a short rendezvous window; a process
        still stuck compiling would miss it. Compiling first and syncing
        at the coordination service keeps every rank inside the window.
        Single-process: returns the jit function untouched."""
        fn = getattr(self, attr)
        if process_count() == 1 or not hasattr(fn, 'lower'):
            return fn
        compiled = fn.lower(*args).compile()
        barrier(f'compile:{attr}')
        setattr(self, attr, compiled)
        return compiled

    def _device_batches(self, loader, max_batches: Optional[int] = None,
                        stack: int = 1):
        """Yield (host_batch, device_batch, stacked) with the NEXT transfer
        already enqueued — device_put is async, so H2D of batch i+1 overlaps
        step i (the tunnel transfer would otherwise serialize with compute).

        With ``stack`` > 1, groups that many loader batches on a leading K
        axis for K-step dispatch. An incomplete trailing group is NOT
        dropped: its batches are yielded individually with stacked=False and
        the caller runs them through the single-step path (so tiny datasets
        and non-multiple epoch lengths lose no samples)."""
        it = iter(loader)
        if stack > 1:
            def grouped(src):
                group = []
                for b in src:
                    group.append(b)
                    if len(group) == stack:
                        yield True, stack_batches(group)
                        group = []
                for b in group:  # trailing partial group: single-step
                    yield False, b
            it = grouped(it)
        else:
            it = ((False, b) for b in it)
        cur = None
        count = 0
        for stacked, nxt in it:
            nxt_tup = (nxt, shard_batch(self.mesh, _strip(nxt),
                                        stacked=stacked), stacked)
            if cur is not None:
                yield cur
                count += 1
                if max_batches is not None and count >= max_batches:
                    return
            cur = nxt_tup
        if cur is not None and (max_batches is None or count < max_batches):
            yield cur

    def _accumulate_map(self, batch, boxes, scores, labels, valid):
        boxes, scores = np.asarray(boxes), np.asarray(scores)
        labels, valid = np.asarray(labels), np.asarray(valid)
        gts, preds = [], []
        for i in range(batch.get('n_valid', boxes.shape[0])):
            v = valid[i]
            pb = boxes[i][v].copy()
            # decode emits bottom z; GT carries center z. BEV metrics ignore
            # z, keep as-is (parity with result_list, mm_training_aim.py:315)
            preds.append([pb, scores[i][v], labels[i][v]])
            gm = batch['gt_mask'][i]
            gts.append([batch['gt_boxes'][i][gm], batch['gt_labels'][i][gm]])
        self.map_calculator.update(gts, preds, batch.get('path'))

    def _export_results(self, batch, boxes, scores, labels, valid):
        boxes, scores = np.asarray(boxes), np.asarray(scores)
        labels, valid = np.asarray(labels), np.asarray(valid)
        save_dir = self.out_path / 'outputs'
        paths = batch.get('path', [])
        paths = paths[:batch.get('n_valid', len(paths))]
        for i, path in enumerate(paths):
            v = valid[i]
            d = boxes_to_aimotive_dict(boxes[i][v], scores[i][v], labels[i][v])
            # relpath, not str.replace: replace() fires on EVERY occurrence
            # of data_root in the path and silently leaves the path
            # unchanged on a normalization mismatch — which would overwrite
            # the dataset's ground-truth annotation JSON in place
            rel = os.path.relpath(os.path.abspath(path),
                                  os.path.abspath(str(self.data_root)))
            if rel.startswith('..'):
                rel = os.path.basename(path)  # outside data_root: flat name
            out_file = Path(save_dir) / rel
            out_file.parent.mkdir(parents=True, exist_ok=True)
            with open(out_file, 'w') as f:
                json.dump(d, f)


def _strip(batch):
    # single source of truth for host-only keys: train_step strips the
    # same set before tracing
    return _strip_host_fields(batch)


def _pick_restore_step(root: str, step_dirs) -> int:
    """Pick the step to restore from a directory of step checkpoints.

    A best-k CheckpointManager root ('saved_models/best') keeps the top
    save_top_k steps — the newest kept step is NOT the best one, so ask
    orbax for the best-metric step (the metrics are stored per step);
    fall back to the latest step for metric-less roots ('latest', external
    dirs)."""
    query_failed = False
    if ocp is not None and len(step_dirs) > 1:
        try:
            opts = ocp.CheckpointManagerOptions(
                best_fn=lambda m: m['val_detection_loss'], best_mode='min')
            mgr = ocp.CheckpointManager(root, options=opts)
            try:
                best = mgr.best_step()
            finally:
                mgr.close()
            if best is not None and str(best) in step_dirs:
                return int(best)
        except Exception:
            query_failed = True
    fallback = max(int(d) for d in step_dirs)
    # a best-k root whose steps carry per-step metrics (orbax stores them
    # as a 'metrics' item inside each step dir) should have answered the
    # best-step query — a silent fallback here restores the LATEST KEPT
    # step, not the BEST one, which is the exact wrong-checkpoint class
    # this function exists to prevent. Warn loudly.
    if query_failed and any(
            os.path.isdir(os.path.join(root, d, 'metrics'))
            for d in step_dirs):
        import warnings
        warnings.warn(
            f'best-step metadata query failed on {root!r} even though its '
            f'step checkpoints carry per-step metrics; falling back to the '
            f'NEWEST kept step {fallback} which may not be the best one',
            stacklevel=2)
    return fallback


def _state_to_pytree(state: TrainState, loop_state: Optional[dict] = None):
    tree = {'step': state.step, 'params': state.params,
            'batch_stats': state.batch_stats, 'opt_state': state.opt_state}
    if state.ema_params is not None:
        tree['ema_params'] = state.ema_params
        tree['ema_batch_stats'] = state.ema_batch_stats
    if loop_state is not None:
        # full loop state (Lightning parity: EarlyStopping counters + epoch
        # + loader position survive a resume). Arrays, not python scalars —
        # orbax StandardSave wants a uniform array tree.
        tree['loop'] = {  # 0-d arrays: orbax rejects bare numpy scalars
            'epoch': np.asarray(loop_state['epoch'], np.int64),
            'batch_in_epoch': np.asarray(loop_state['batch_in_epoch'],
                                         np.int64),
            'best_val': np.asarray(loop_state['best_val'], np.float64),
            'patience': np.asarray(loop_state['patience'], np.int64)}
    return tree


def _pytree_to_state(old: TrainState, tree) -> TrainState:
    return old.replace(step=jnp.asarray(tree['step']), params=tree['params'],
                       batch_stats=tree['batch_stats'],
                       opt_state=tree['opt_state'],
                       ema_params=tree.get('ema_params', old.ema_params),
                       ema_batch_stats=tree.get('ema_batch_stats',
                                                old.ema_batch_stats))
