"""Deploy-time conv-BN folding (the mmcv ``fuse_conv_bn`` equivalent).

At inference, BatchNorm with frozen running stats is a per-channel affine
``y = (x - mean) * scale / sqrt(var + eps) + bias``. The multiply can be
rewritten into the preceding conv's kernel (``W' = W * s`` over the output
channel axis), leaving only a bias add — which XLA fuses into the conv
epilogue for free, while the per-channel multiply is NOT free (measured:
+9% on bandwidth-bound early-stage convs, +4% on MXU-bound deep convs;
``scripts/bnfold_probe.py``, BASELINE.md round 4).

Because the scale vector is a runtime parameter, a params-only rewrite
would not change the compiled program (XLA cannot see that the scales are
ones). Folding therefore has two halves that must be used together:

- :func:`fold_conv_bn` / :func:`fold_state` — a pure tree transform that
  rewrites each (conv kernel, BN params+stats) pair into (scaled kernel,
  single bias vector);
- :func:`batch_norm` (the shared BN constructor used by ConvBN, the
  ResNet stems, the CenterPoint head and SECONDFPN), which detects
  folded-ness FROM THE WEIGHTS it is applied to: a folded BN scope holds
  only ``{'bias'}`` (no ``'scale'``), so the constructor emits a bias-only
  :class:`FoldedBN` there and a real ``nn.BatchNorm`` everywhere else.

Folded-ness is therefore a property of the parameter tree, never of
process state: folded and unfolded models coexist in one process, and a
jitted step retraces automatically when handed the other tree shape
(the pytree structures differ, so jit cache keys differ). Training on
folded weights raises at trace time.

Conv↔BN pairing is by the repo's naming conventions within one module
scope: ``BatchNorm_0``↔``Conv_0`` (ConvBN / stems), ``{h}_bn{i}``↔
``{h}_conv{i}`` (CenterPoint head), ``deblock{i}_bn``↔``deblock{i}_conv``
(SECONDFPN; the Upsample partner holds its kernel directly). The lidar
``ImportSparseEncoder`` intentionally does not fold: its names (``bn``,
``bn1``…) match no rule, its eps differs (1e-3), and its post-BN
mask-multiply semantics must stay intact (sparse_encoder.py:67-90).

Reference: the torch stack leaves BN unfolded at eval (mmdet3d ResNet);
fuse_conv_bn is a deploy-time tool there too. Entry: ``exps/inference.py
--fold-bn``.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ['batch_norm', 'FoldedBN', 'fold_conv_bn', 'fold_state']


class FoldedBN(nn.Module):
    """Bias-only stand-in for an inference BatchNorm after conv folding."""

    @nn.compact
    def __call__(self, x):
        b = self.param('bias', nn.initializers.zeros, (x.shape[-1],),
                       jnp.float32)
        return x + b.astype(x.dtype)


def batch_norm(mdl: nn.Module, x, train: bool, *,
               axis_name: Optional[str] = None,
               name: str = 'BatchNorm_0', momentum: float = 0.9,
               epsilon: float = 1e-5):
    """The shared BN constructor for every foldable conv+BN site.

    ``mdl`` is the calling (compact) module; its bound params decide the
    trace: a BN scope :func:`fold_conv_bn` rewrote holds only ``{'bias'}``,
    so a missing ``'scale'`` leaf means "apply the folded program". init
    always creates a real BatchNorm (folding is a post-init transform).

    dtype=x.dtype: without it flax promotes to the fp32 of the running
    stats, silently turning every downstream conv fp32 by promotion
    chaining (statistics are still computed in fp32 internally)."""
    if not mdl.is_initializing():
        # absent scope -> pretend unfolded; flax raises its usual
        # missing-param error inside nn.BatchNorm, which names the scope
        bn_params = mdl.variables.get('params', {}).get(name, None)
        if bn_params is not None and 'scale' not in bn_params:
            if train:
                raise ValueError(
                    'BN folding is an inference-only transform; these '
                    'params were folded by fold_conv_bn/fold_state and '
                    'cannot be trained (restore unfolded weights instead)')
            return FoldedBN(name=name)(x)
    return nn.BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=epsilon, axis_name=axis_name, dtype=x.dtype,
                        name=name)(x)


# BN scope name -> partner conv scope name, per repo naming conventions.
_PARTNER_RULES = (
    (re.compile(r'^BatchNorm_0$'), lambda m: 'Conv_0'),
    (re.compile(r'^(.+)_bn(\d+)$'), lambda m: f'{m.group(1)}_conv{m.group(2)}'),
    (re.compile(r'^(.+)_bn$'), lambda m: f'{m.group(1)}_conv'),
)


def _partner_name(bn_name: str) -> Optional[str]:
    for pat, fn in _PARTNER_RULES:
        m = pat.match(bn_name)
        if m:
            return fn(m)
    return None


def _kernel_holder(node: Any) -> Optional[Dict[str, Any]]:
    """The dict owning the partner's 'kernel' leaf: the conv scope itself
    (Conv / Upsample hold 'kernel' directly) or its single conv child."""
    if not isinstance(node, dict):
        return None
    if 'kernel' in node:
        return node
    subs = [v for v in node.values() if isinstance(v, dict) and 'kernel' in v]
    return subs[0] if len(subs) == 1 else None


def fold_conv_bn(params: Dict[str, Any], batch_stats: Dict[str, Any],
                 eps: float = 1e-5) -> Tuple[Dict, Dict, int]:
    """Pure transform: (params, batch_stats) -> (params', batch_stats', n).

    Each matched pair becomes: kernel' = kernel * s over the output-channel
    (last) axis with s = scale/sqrt(var+eps); the BN scope becomes
    FoldedBN's {'bias': beta + (conv_bias - mean) * s} and its stats are
    dropped; a conv bias, if present, is zeroed (its effect moved into the
    folded bias). All math in fp32 (master params); unmatched BNs (sparse
    encoder) pass through untouched."""
    n_folded = 0

    def walk(p: Dict[str, Any], s: Any):
        nonlocal n_folded
        s = s if isinstance(s, dict) else {}
        p = dict(p)  # local copy: folding may rewrite a not-yet-visited conv
        new_p: Dict[str, Any] = {}
        new_s: Dict[str, Any] = {}
        for k in list(p.keys()):
            pv = p[k]  # read through p: a folded partner must not be stale
            sv = s.get(k)
            if not isinstance(pv, dict):
                new_p[k] = pv
                if sv is not None:
                    new_s[k] = sv
                continue
            is_bn = (isinstance(sv, dict) and 'mean' in sv and 'var' in sv
                     and 'scale' in pv and 'bias' in pv)
            partner = _partner_name(k) if is_bn else None
            # read the partner through new_p when already visited so any
            # folds applied inside it (nested-conv-child shape) are kept
            src = (new_p.get(partner, p.get(partner))
                   if partner is not None else None)
            holder = _kernel_holder(src)
            if holder is None:
                np_, ns_ = walk(pv, sv)
                new_p[k] = np_
                if ns_:
                    new_s[k] = ns_
                continue
            scale = jnp.asarray(pv['scale'], jnp.float32)
            beta = jnp.asarray(pv['bias'], jnp.float32)
            mean = jnp.asarray(sv['mean'], jnp.float32)
            var = jnp.asarray(sv['var'], jnp.float32)
            svec = scale / jnp.sqrt(var + eps)
            conv_bias = holder.get('bias')
            if conv_bias is None:
                conv_bias = jnp.zeros_like(mean)
            new_p[k] = {'bias': beta
                        + (jnp.asarray(conv_bias, jnp.float32) - mean) * svec}
            n_folded += 1
            # rewrite the partner conv — it may sit before OR after the BN
            # in dict order, so update both the working copy and any
            # already-emitted entry
            kern = jnp.asarray(holder['kernel'], jnp.float32) * svec
            folded_conv = dict(src)
            tgt = folded_conv if 'kernel' in folded_conv else None
            if tgt is None:
                (child,) = [ck for ck, cv in folded_conv.items()
                            if isinstance(cv, dict) and 'kernel' in cv]
                folded_conv[child] = dict(folded_conv[child])
                tgt = folded_conv[child]
            tgt['kernel'] = kern
            if 'bias' in tgt:
                tgt['bias'] = jnp.zeros_like(tgt['bias'])
            p[partner] = folded_conv
            if partner in new_p:          # partner was visited before the BN
                new_p[partner] = folded_conv
        for k, sv in s.items():
            # stats-only keys (an unfolded BN's mean/var leaves live in the
            # stats tree with no params sibling) must pass through
            if k not in p:
                new_s[k] = sv
        return new_p, new_s

    new_params, new_stats = walk(params, batch_stats)
    return new_params, new_stats, n_folded


def fold_state(state):
    """Fold a TrainState's params/batch_stats (and the EMA shadow when
    present) for inference. The folded tree shape is self-describing:
    :func:`batch_norm` applies the folded program wherever it sees it."""
    p, bs, n = fold_conv_bn(state.params, state.batch_stats)
    kw = dict(params=p, batch_stats=bs)
    if getattr(state, 'ema_params', None) is not None:
        ep, ebs, _ = fold_conv_bn(state.ema_params,
                                  state.ema_batch_stats or {})
        kw.update(ema_params=ep, ema_batch_stats=ebs)
    if n == 0:
        raise ValueError('fold_state found no conv+BN pairs to fold — '
                         'wrong tree or already folded?')
    return state.replace(**kw)
