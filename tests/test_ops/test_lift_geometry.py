"""Semantic test of the lift-splat geometry chain: a one-hot depth at the
bin of a known 3D point must deposit its mass in that point's BEV cell
(create_frustum -> get_geometry -> quantize -> flat index -> lift_splat)."""
import jax.numpy as jnp
import numpy as np

from mm_training_tpu.core.geometry import (create_frustum, flat_bev_index,
                                           get_geometry, quantize_geometry)
from mm_training_tpu.ops.voxel_pooling import lift_splat


def test_one_hot_depth_lands_in_expected_bev_cell():
    # camera at origin looking along +x (body frame), standard optical axes
    h, w, ds = 64, 128, 16
    f = 100.0
    intr = np.eye(4)
    intr[0, 0] = intr[1, 1] = f
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    body_to_optical = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    extr = np.eye(4)
    extr[:3, :3] = body_to_optical           # body -> camera
    s2e = np.linalg.inv(extr)                # sensor2ego

    d_bound = (2.0, 27.2, 0.5)
    frustum = np.asarray(create_frustum(d_bound, (h, w), ds))
    geom = get_geometry(jnp.asarray(frustum),
                        jnp.asarray(s2e)[None, None],
                        jnp.asarray(intr)[None, None])   # [1,1,D,fh,fw,3]

    # target point: 10 m ahead, 2 m left (body x=10, y=2, z=0)
    # its pixel: optical coords (x_opt, y_opt, z_opt) = (-y, -z, x)
    target = np.array([10.0, 2.0, 0.0])
    opt = body_to_optical @ target
    u = f * opt[0] / opt[2] + w / 2
    v = f * opt[1] / opt[2] + h / 2
    pu, pv = int(u) // ds, int(v) // ds
    depth = opt[2]
    dbin = int(round((depth - d_bound[0]) / d_bound[2]))

    # geometry at that frustum cell must be near the target point
    cell_xyz = np.asarray(geom[0, 0, dbin, pv, pu])
    assert np.linalg.norm(cell_xyz[:2] - target[:2]) < 1.5  # within a cell

    # splat one-hot depth -> mass lands in the target's BEV cell
    vc = (-25.6 + 0.4, -12.8 + 0.4, -5.0 + 4.0)
    vs = (0.8, 0.8, 8.0)
    vn = (64, 32, 1)
    gidx = quantize_geometry(geom, vc, vs)
    flat = flat_bev_index(gidx, vn)                       # [1,1,D,fh,fw]

    d_ch = frustum.shape[0]
    fh, fw = h // ds, w // ds
    p = fh * fw
    dep = jnp.zeros((1, d_ch, p)).at[0, dbin, pv * fw + pu].set(1.0)
    ctx = jnp.ones((1, p, 4))
    bev = lift_splat(dep, ctx, jnp.asarray(flat).reshape(1, d_ch, p),
                     vn[0] * vn[1])                       # [1, G, 4]
    g = int(jnp.argmax(bev[0, :, 0]))
    gy, gx = g // vn[0], g % vn[0]
    exp_gx = int((target[0] - (-25.6)) / 0.8)
    exp_gy = int((target[1] - (-12.8)) / 0.8)
    assert abs(gx - exp_gx) <= 1 and abs(gy - exp_gy) <= 1, (
        (gx, gy), (exp_gx, exp_gy))
    # total mass = 1 (one ray point, weight 1)
    np.testing.assert_allclose(float(bev[0].sum()) / 4.0, 1.0, atol=1e-5)
