"""Probe: does inference-mode BatchNorm cost anything after a conv on TPU?

At eval, BN with frozen running stats is a per-channel affine y*s + b. Folding
it into the conv weights (W' = W*s, b' = beta - mean*s) removes the affine —
but only pays off if XLA does NOT already fuse the affine into the convolution
epilogue. This probe times conv vs conv+affine vs pre-folded conv at the two
shapes that dominate the serving path (the 64-ch early stages and the 512-ch
deep stages of the image backbone, BASELINE.md round-3 trace), and prints one
JSON line per case. Run on the real chip:

    cd /root/repo && python scripts/bnfold_probe.py

Reference: the torch stack leaves BN unfolded at eval too (mmdet3d ResNet,
models/backbones/resnet.py); folding is a deploy-time optimization there
(e.g. fuse_conv_bn in mmcv). Here we measure whether the TPU compiler makes
it moot.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _time(fn, args, iters=50):
    jfn = jax.jit(fn)
    out = jfn(*args)                  # compile + warm
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])  # forced fetch
    # (block_until_ready does not synchronize on the axon backend)
    t0 = time.perf_counter()
    out = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def probe(name, b, h, w, cin, cout, iters=50):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
    s = jax.random.normal(key, (cout,), jnp.bfloat16)
    t = jax.random.normal(key, (cout,), jnp.bfloat16)

    def conv(x, k):
        return lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                        dimension_numbers=('NHWC', 'HWIO',
                                                           'NHWC'))

    def loop(body):
        def fn(x, k, s, t):
            def step(c, _):
                return body(c, k, s, t), None
            y, _ = lax.scan(step, x, None, length=iters)
            return y
        return fn

    # identity-preserving chains (cout == cin) so scan carries a fixed shape
    base = loop(lambda c, k, s, t: conv(c, k))
    affine = loop(lambda c, k, s, t: conv(c, k) * s + t)
    folded = loop(lambda c, k, s, t: conv(c, k * s) + t)  # fold at trace time

    t_base = _time(base, (x, k, s, t), iters)
    t_affine = _time(affine, (x, k, s, t), iters)
    t_folded = _time(folded, (x, k, s, t), iters)
    print(json.dumps({'case': name, 'shape': [b, h, w, cin, cout],
                      'conv_ms': round(t_base * 1e3, 3),
                      'conv_affine_ms': round(t_affine * 1e3, 3),
                      'conv_folded_ms': round(t_folded * 1e3, 3),
                      'affine_overhead_ms': round((t_affine - t_base) * 1e3,
                                                  3)}))


if __name__ == '__main__':
    print(f'# devices: {jax.devices()}')
    # early-stage: large spatial, 64 ch (bandwidth-bound, 4-25% MFU)
    probe('early_64ch', 8, 176, 320, 64, 64)
    # deep-stage: small spatial, 512 ch (MXU-bound, 92-96% MFU)
    probe('deep_512ch', 8, 22, 40, 512, 512)
