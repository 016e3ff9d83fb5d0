"""Probe: can a Pallas pure-elementwise kernel beat XLA's BN/elementwise
loop fusions? (VERDICT r4 #5 — the last unprobed train-step slice.)

The round-3 trace attributes ~43.5 ms/step of the full-fusion train step to
"loop fusions" — train-mode BN (stats + normalize) and neighboring
elementwise ops (ReLU, residual adds), all bandwidth-bound over
activations. The recorded Mosaic limitation (BASELINE.md round 3) was about
GATHERS; a pure-elementwise Pallas kernel was never attempted. This probe
measures, at the two trace-dominant shapes and in the train dtype (bf16):

  1. affine+ReLU apply        — XLA loop fusion vs a Pallas kernel
  2. train-mode BN+ReLU       — XLA end-to-end vs XLA-stats + Pallas-apply
  3. BN-apply+residual+ReLU   — XLA vs Pallas (the BasicBlock tail shape)

and reports achieved HBM GB/s against the v5e roofline (~819 GB/s). If XLA
already runs these at roofline, the 43.5 ms is bandwidth-inherent and the
"no lever" claim becomes a measured fact; if Pallas wins, the kernel
graduates into ops/.

Run on the real chip: cd /root/repo && python scripts/bn_elementwise_probe.py
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_SHORT, K_LONG = 50, 250
EPS = 1e-5


def _fetch(out):
    # device-side slice, then a tiny host fetch: np.asarray(full_array)
    # would drag the whole activation over the tunnel (~57 MB, seconds)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def _time_scan(make_fn, args):
    """Per-iteration time via two scan lengths: (t_long - t_short) /
    (K_LONG - K_SHORT) cancels the fixed dispatch + fetch overhead of the
    remote-attached backend exactly (BASELINE.md round-3 pitfall: that
    overhead is tens of ms — larger than the op under test)."""
    times = []
    for k in (K_SHORT, K_LONG):
        jfn = jax.jit(make_fn(k))
        _fetch(jfn(*args))               # compile + warm
        t0 = time.perf_counter()
        _fetch(jfn(*args))
        times.append(time.perf_counter() - t0)
    return (times[1] - times[0]) / (K_LONG - K_SHORT)


def _scan(body):
    def make(iters):
        def fn(c, *cs):
            def step(c, _):
                return body(c, *cs), None
            y, _ = lax.scan(step, c, None, length=iters)
            return y
        return fn
    return make


# ------------------------------------------------------------ pallas kernels

def _affine_relu_kernel(x_ref, s_ref, t_ref, o_ref):
    o_ref[:] = jnp.maximum(x_ref[:] * s_ref[:] + t_ref[:], 0.0)


def _affine_res_relu_kernel(x_ref, r_ref, s_ref, t_ref, o_ref):
    o_ref[:] = jnp.maximum(x_ref[:] * s_ref[:] + t_ref[:] + r_ref[:], 0.0)


def _as_rows(x, c):
    """[..., C] -> [R, L] with the lane dim L a multiple of 128 (TPU lane
    tiling); channels < 128 are row-packed (the per-channel vector repeats
    L//C times along the lanes)."""
    lanes = int(np.lcm(c, 128))  # smallest multiple of both c and 128
    return x.reshape(-1, lanes), lanes


def _pallas_affine(x, s, t, residual=None, tile_rows=1024):
    c = x.shape[-1]
    rows, lanes = _as_rows(x, c)
    reps = lanes // c
    sv = jnp.tile(s, reps)[None]
    tv = jnp.tile(t, reps)[None]
    r, l = rows.shape
    grid = (pl.cdiv(r, tile_rows),)
    vec_spec = pl.BlockSpec((1, l), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((tile_rows, l), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if residual is None:
        out = pl.pallas_call(
            _affine_relu_kernel,
            out_shape=jax.ShapeDtypeStruct((r, l), x.dtype),
            grid=grid,
            in_specs=[row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
        )(rows, sv.astype(x.dtype), tv.astype(x.dtype))
    else:
        res_rows, _ = _as_rows(residual, c)
        out = pl.pallas_call(
            _affine_res_relu_kernel,
            out_shape=jax.ShapeDtypeStruct((r, l), x.dtype),
            grid=grid,
            in_specs=[row_spec, row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
        )(rows, res_rows, sv.astype(x.dtype), tv.astype(x.dtype))
    return out.reshape(x.shape)


# ---------------------------------------------------------------- operations

def _stats(x):
    """Train-mode batch stats in fp32 (flax semantics)."""
    xf = x.astype(jnp.float32)
    m = xf.mean((0, 1, 2))
    v = (xf * xf).mean((0, 1, 2)) - m * m
    return m, v


def _bn_train_xla(x, g, b):
    m, v = _stats(x)
    s = (g * lax.rsqrt(v + EPS)).astype(x.dtype)
    t = (b - m * g * lax.rsqrt(v + EPS)).astype(x.dtype)
    return jnp.maximum(x * s + t, 0.0)


def _bn_train_hybrid(x, g, b):
    m, v = _stats(x)
    s = g * lax.rsqrt(v + EPS)
    t = b - m * s
    return _pallas_affine(x, s.astype(x.dtype), t.astype(x.dtype))


def probe(name, shape):
    b, h, w, c = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.bfloat16)
    r = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    s = jax.random.normal(jax.random.PRNGKey(2), (c,), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(3), (c,), jnp.float32)
    sb, tb = s.astype(jnp.bfloat16), t.astype(jnp.bfloat16)

    n_bytes = x.size * x.dtype.itemsize
    cases = {
        # 1 read + 1 write
        'affine_relu_xla': (_scan(
            lambda cr, sv, tv: jnp.maximum(cr * sv + tv, 0.0)),
            (x, sb, tb), 2 * n_bytes),
        'affine_relu_pallas': (_scan(
            lambda cr, sv, tv: _pallas_affine(cr, sv, tv)),
            (x, sb, tb), 2 * n_bytes),
        # 2 reads + 1 write (stats pass + apply pass)
        'train_bn_relu_xla': (_scan(_bn_train_xla), (x, s, t), 3 * n_bytes),
        'train_bn_relu_hybrid': (_scan(_bn_train_hybrid),
                                 (x, s, t), 3 * n_bytes),
        # 2 reads + 1 write (x, residual -> y)
        'affine_res_relu_xla': (_scan(
            lambda cr, rv, sv, tv: jnp.maximum(cr * sv + tv + rv, 0.0)),
            (x, r, sb, tb), 3 * n_bytes),
        'affine_res_relu_pallas': (_scan(
            lambda cr, rv, sv, tv: _pallas_affine(cr, sv, tv, residual=rv)),
            (x, r, sb, tb), 3 * n_bytes),
    }
    for cname, (make_fn, args, traffic) in cases.items():
        try:
            dt = _time_scan(make_fn, args)
            print(json.dumps({
                'case': f'{name}/{cname}', 'shape': list(shape),
                'ms': round(dt * 1e3, 4),
                'GBps': round(traffic / dt / 1e9, 1),
                'roofline_frac': round(traffic / dt / 1e9 / 819.0, 3)}))
        except Exception as e:  # Mosaic rejections are data, not failures
            print(json.dumps({'case': f'{name}/{cname}',
                              'error': f'{type(e).__name__}: {e}'[:300]}))


if __name__ == '__main__':
    print(f'# devices: {jax.devices()}')
    # the TRAIN-STEP shapes (batch 8 images = B2 x 4 cams): first measured
    # at their real size — which revealed that XLA keeps a <=57 MB scan
    # carry entirely IN VMEM (measured 2.9 TB/s, 3.5x the HBM roofline;
    # the deep 6.9 MB shape times as pure noise). That is itself the
    # finding: where activations fit VMEM, the "loop fusion" bytes never
    # touch HBM and no kernel can beat them. The HBM-streaming regime —
    # what the 43.5 ms trace slice actually is, activations arriving from
    # HBM between convs — needs a carry LARGER than VMEM, so the batch
    # axis is scaled up (~230 MB working set); per-byte cost is what
    # transfers back to the real step.
    probe('early_64ch_hbm', (32, 176, 320, 64))
    probe('deep_512ch_hbm', (256, 22, 40, 512))
