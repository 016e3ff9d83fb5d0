"""Test-time augmentation — jittable 4-way flip ensemble.

Re-design of the reference's ``test_time_augment`` (exps/mm_training_aim.py:
424-489): forward the model on the 4 (x_flip, y_flip) sign combinations of
the point cloud, un-flip each prediction map back to the canonical frame,
and average — heatmaps in sigmoid space, dims in exp space, velocities
sign-corrected, rotations angle-corrected (x flip: pi - rot; y flip: -rot),
then invert back to logit/log so the standard decode applies.

Fixes vs the reference (documented deviations):
  * the reference's x-flip yaw correction is ``rot - pi`` (:475) — a pure
    ROTATION, but negating x is a REFLECTION, which maps yaw to pi - yaw.
    With ``rot - pi`` the four corrected members carry sin components
    +s, -s, +s, -s for an equivariant model, so averaging cancels the sine
    of every yaw (ensembled boxes collapse to 0 or pi orientation). Here
    the reflection formula ``pi - rot`` is used; the equivariant-model
    fixed-point test pins it.
  * the reference hardcodes a stale 256x256 map reshape (:467) — here the
    un-flip is a shape-agnostic jnp.flip (exact for the symmetric BEV grid,
    where warp-by-diag(+-1) IS an axis flip).
  * camera inputs are left unflipped exactly like the reference (it clones
    but never flips the images — the TTA only ensembles the lidar branch).
  * the reference never corrects the sub-cell 'reg' offsets after flipping;
    reproduced faithfully (quirk) so decode parity holds.
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..configs import Config
from ..models import BEVDepthLiDAR
from .train_step import cast_floating

__all__ = ['tta_forward']

_EPS = 1e-5


def _flip_points(batch: Dict[str, jnp.ndarray], x_flip: float, y_flip: float):
    out = dict(batch)
    pts = batch['points']
    out['points'] = pts.at[..., 0].multiply(x_flip).at[..., 1].multiply(y_flip)
    return out


def _unflip_map(m: jnp.ndarray, x_flip: float, y_flip: float) -> jnp.ndarray:
    """NHWC map: H is the y axis, W is the x axis."""
    if x_flip < 0:
        m = jnp.flip(m, axis=2)
    if y_flip < 0:
        m = jnp.flip(m, axis=1)
    return m


def _correct_pred(pred: Dict[str, jnp.ndarray], x_flip: float, y_flip: float):
    out = {}
    for key, v in pred.items():
        v = _unflip_map(v, x_flip, y_flip)
        if key == 'heatmap':
            v = jax.nn.sigmoid(v)
        elif key == 'dim':
            v = jnp.exp(v)
        elif key == 'vel':
            v = v * jnp.asarray([x_flip, y_flip], v.dtype)
        elif key == 'rot':
            rot = jnp.arctan2(v[..., 0], v[..., 1])
            if x_flip < 0:
                rot = jnp.pi - rot   # reflection, NOT rotation (see module doc)
            if y_flip < 0:
                rot = -rot
            v = jnp.stack([jnp.sin(rot), jnp.cos(rot)], axis=-1)
        out[key] = v
    return out


def tta_forward(cfg: Config, model: BEVDepthLiDAR, variables,
                model_batch: Dict[str, jnp.ndarray], oracle=None
                ) -> tuple:
    """4-way flip-ensembled forward; returns (head preds in the canonical
    logit/log parameterization — drop-in for decode_boxes / loss, depth_pred
    from the identity branch — so callers need no 5th forward)."""
    acc = None
    depth_pred = None
    for x_flip in (1.0, -1.0):
        for y_flip in (1.0, -1.0):
            b = _flip_points(model_batch, x_flip, y_flip)
            preds, dp, _, _ = model.apply(variables, b, oracle, False)
            preds = cast_floating(preds, jnp.float32)
            corrected = [_correct_pred(p, x_flip, y_flip) for p in preds]
            if acc is None:
                acc = corrected
                depth_pred = dp  # identity (1, 1) branch
            else:
                acc = [
                    {k: a[k] + c[k] for k in a}
                    for a, c in zip(acc, corrected)
                ]

    out = []
    for task in acc:
        t = {k: v / 4.0 for k, v in task.items()}
        hm = jnp.clip(t['heatmap'], _EPS, 1.0 - _EPS)
        t['heatmap'] = jnp.log(hm) - jnp.log1p(-hm)   # inverse sigmoid
        t['dim'] = jnp.log(jnp.maximum(t['dim'], 1e-12))
        out.append(t)
    return out, depth_pred
