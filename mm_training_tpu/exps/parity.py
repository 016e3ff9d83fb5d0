"""One-command real-data accuracy-parity runbook.

The reference ships four released checkpoints (README.md:65-72: LiDAR,
LiDAR+cam, LiDAR+radar, LiDAR+radar+cam) whose per-ODD BEV mAP — computed by
MAPCalculator.compute_bev(iou_thr=0.3, x_range=204.8) at
exps/mm_training_aim.py:416-422 / utils/eval.py:666-723 — is the accuracy
north star (the aiMotive paper, arXiv:2211.09445). This entry point turns
"prove parity" into a single command the day the data and checkpoints are on
disk:

    python -m mm_training_tpu.exps.parity \
        --data-root /path/to/aimotive_dataset \
        --ckpt-dir  /path/to/released_checkpoints \
        [--out parity_out] [--paper-json paper_numbers.json] \
        [--variants lidar_only lidar_cam ...] [--max-batches N]

For every modality variant it:
  1. locates the reference .ckpt/.pth in --ckpt-dir (by variant name),
  2. converts it (scripts/import_checkpoint: exact SparseEncoder import via
     LidarEncoderConf.variant='sparse_import', zero skipped weights),
  3. runs per-ODD eval (highway/urban/night/rain — the reference's
     exps/configs/eval_*.py matrix) on the converted weights,
  4. emits a markdown table of ours-vs-paper mAP per (variant, ODD) plus a
     machine-readable parity_report.json.

Paper numbers: pass --paper-json with {"<variant>": {"<odd>": mAP}} (the
tables of arXiv:2211.09445 — not redistributed here). Cells without a
supplied number render as '—' and the delta column stays empty.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from pathlib import Path

__all__ = ['run_parity', 'main']

VARIANTS = ('lidar_only', 'lidar_radar', 'lidar_cam', 'lidar_cam_radar')
ODDS = ('highway', 'urban', 'night', 'rain')

# filename stems accepted per variant (released files are hand-downloaded;
# match generously but unambiguously)
_CKPT_STEMS = {
    'lidar_only': ('lidar_only', 'lidar'),
    'lidar_radar': ('lidar_radar', 'lidar+radar'),
    'lidar_cam': ('lidar_cam', 'lidar_camera', 'lidar+cam'),
    'lidar_cam_radar': ('lidar_cam_radar', 'lidar_camera_radar',
                        'lidar+radar+cam', 'lidar_radar_cam'),
}


def _classify_stem(stem: str):
    """Assign a checkpoint filename stem to a variant: the LONGEST matching
    variant stem wins, so 'lidar_cam_radar-v3' never lands on lidar_only."""
    stem = stem.lower()
    best, best_len = None, 0
    for v, stems in _CKPT_STEMS.items():
        for s in stems:
            if (stem == s or stem.startswith((s + '_', s + '-', s + '.'))) \
                    and len(s) > best_len:
                best, best_len = v, len(s)
    return best


def find_checkpoint(ckpt_dir: str, variant: str):
    """Match a released checkpoint file in ckpt_dir to a variant by name."""
    files = sorted(p for p in Path(ckpt_dir).iterdir()
                   if p.suffix in ('.ckpt', '.pth', '.pt'))
    mine = [p for p in files if _classify_stem(p.stem) == variant]
    return str(mine[0]) if mine else None


def _eval_variant(variant: str, ckpt: str, data_root: str, out_dir: Path,
                  odds, max_batches=None, eval_split: str = 'val',
                  cfg_factory=None):
    """Convert one released checkpoint and run per-ODD eval on it."""
    import jax

    from ..configs import variants as variant_factories
    from ..parallel import make_mesh
    from ..scripts.import_checkpoint import import_checkpoint
    from ..training.trainer import Trainer

    factory = cfg_factory or (
        lambda v, **kw: getattr(variant_factories, v)(**kw))
    cfg = factory(variant, data_root=data_root,
                  out_path=str(out_dir / variant),
                  num_sanity_val_steps=0)
    if cfg.use_lidar:  # exact spconv import — zero skipped weights
        cfg = dataclasses.replace(
            cfg, lidar_conf=dataclasses.replace(cfg.get_lidar_conf(),
                                                variant='sparse_import'))

    converted = out_dir / 'converted' / variant
    report = import_checkpoint(ckpt, cfg, out=str(converted), smoke=False)
    cfg = dataclasses.replace(cfg, ckpt_path=str(converted))

    trainer = Trainer(cfg, mesh=make_mesh(jax.devices()[:1]))
    trainer.setup(steps_per_epoch=1)
    first = next(iter(trainer.loader(eval_split)))
    trainer.init_state(first)  # restores ckpt_path
    per_odd = trainer.test_all_odds(odds=odds, max_batches=max_batches)
    overall = trainer.validate(max_batches=max_batches)
    return {'import_report': report,
            'overall': {k: float(v) for k, v in overall.items()},
            'per_odd': {o: {k: float(v) for k, v in m.items()}
                        for o, m in per_odd.items()}}


def _fmt_table(results: dict, paper: dict, odds) -> str:
    """Markdown: one row per (variant, odd), ours vs paper, delta."""
    lines = ['| model | ODD | mAP (ours) | mAP (paper 2211.09445) | delta |',
             '|---|---|---|---|---|']
    for variant, res in results.items():
        if 'error' in res:
            lines.append(f'| {variant} | — | FAILED: {res["error"]} | | |')
            continue
        for odd in odds:
            m = res['per_odd'].get(odd)
            ours = m.get(f'test_{odd}_ap_auc') if m else None
            ref = (paper.get(variant) or {}).get(odd)
            delta = (f'{ours - ref:+.3f}'
                     if ours is not None and ref is not None else '')
            ours_s = f'{ours:.3f}' if ours is not None else '—'
            ref_s = f'{ref:.3f}' if ref is not None else '—'
            lines.append(f'| {variant} | {odd} | {ours_s} | {ref_s} '
                         f'| {delta} |')
        ov = res['overall'].get('val_ap_auc')
        lines.append(f'| {variant} | all ({len(res["per_odd"])} ODDs) | '
                     + (f'{ov:.3f}' if ov is not None else '—') + ' | — | |')
    return '\n'.join(lines)


def run_parity(data_root: str, ckpt_dir: str, out: str = 'parity_out',
               variants=VARIANTS, odds=ODDS, paper_json=None,
               max_batches=None, cfg_factory=None) -> dict:
    """cfg_factory(variant, **kw) -> Config overrides the production variant
    factories (tests run the identical pipeline on tiny geometry)."""
    out_dir = Path(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    paper = {}
    if paper_json:
        with open(paper_json) as f:
            paper = json.load(f)

    results = {}
    for variant in variants:
        ckpt = find_checkpoint(ckpt_dir, variant)
        if ckpt is None:
            results[variant] = {'error': f'no checkpoint for {variant} '
                                         f'found in {ckpt_dir}'}
            print(f'[parity] {variant}: SKIPPED — {results[variant]["error"]}')
            continue
        print(f'[parity] {variant}: converting {os.path.basename(ckpt)} '
              'and evaluating per ODD...')
        try:
            results[variant] = _eval_variant(variant, ckpt, data_root,
                                             out_dir, odds, max_batches,
                                             cfg_factory=cfg_factory)
        except Exception as e:  # one broken ckpt must not kill the sweep
            import traceback
            traceback.print_exc()
            results[variant] = {'error': f'{type(e).__name__}: {e}'}

    table = _fmt_table(results, paper, odds)
    report = {'data_root': data_root, 'ckpt_dir': ckpt_dir,
              'results': results}
    with open(out_dir / 'parity_report.json', 'w') as f:
        json.dump(report, f, indent=2, default=str)
    (out_dir / 'parity_report.md').write_text(
        '# Accuracy parity vs the released reference checkpoints\n\n'
        'Metric: BEV mAP (AP@IoU 0.3 AUC, axis-aligned BEV, x <= 204.8 m) — '
        'MAPCalculator.compute_bev, the reference\'s '
        'exps/mm_training_aim.py:416-422 protocol.\n\n' + table + '\n')
    print(table)
    print(f'[parity] full report: {out_dir / "parity_report.json"}')
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--data-root', required=True)
    p.add_argument('--ckpt-dir', required=True,
                   help='directory with the 4 released reference checkpoints')
    p.add_argument('--out', default='parity_out')
    p.add_argument('--variants', nargs='+', default=list(VARIANTS),
                   choices=list(VARIANTS))
    p.add_argument('--odds', nargs='+', default=list(ODDS))
    p.add_argument('--paper-json', default=None,
                   help='JSON {"variant": {"odd": mAP}} with the paper table')
    p.add_argument('--max-batches', type=int, default=None,
                   help='cap eval batches (smoke runs)')
    args = p.parse_args(argv)
    return run_parity(args.data_root, args.ckpt_dir, out=args.out,
                      variants=tuple(args.variants), odds=tuple(args.odds),
                      paper_json=args.paper_json,
                      max_batches=args.max_batches)


if __name__ == '__main__':
    main()
