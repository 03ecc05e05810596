"""Volume-sharded scatter divergence probe on pipeline-shaped inputs.

Isolates vs_fast_scatter2 vs the replicated fast_scatter2 on the grid
shape where the pipeline equality test failed (z=20, y=13, x=15, 4-dev
mesh), and decomposes: raw corner scatter (pre-conv) vs adjoint conv."""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from phantom import make_ground_truth, simulate_stacks
from fetalreconstruction_tpu.core.image import Image
from fetalreconstruction_tpu.ops import psf as psf_ops
from fetalreconstruction_tpu.ops import psf_fast as pf
from fetalreconstruction_tpu.parallel import volume_sharded as vs
from fetalreconstruction_tpu.pipeline import svr_core
from fetalreconstruction_tpu.pipeline.state import create_slices

rng = np.random.default_rng(0)
zs, ys, xs = 20, 13, 15
n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 4

gt = make_ground_truth(n=20, spacing=2.4)
stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.5, dz=4.0,
                            noise=1.0)
batch = create_slices(stacks, [8.0, 8.0])
from fetalreconstruction_tpu.core.geometry import ImageAttributes
ra = ImageAttributes(x=xs, y=ys, z=zs, dx=2.4, dy=2.4, dz=2.4)
support = psf_ops.reference_support(batch.dims, ra.dx, 1.0, 8)
fast = pf.FastPSF.from_batch(batch, ra.w2i(), support)
n = batch.n_slices
transforms = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
valid = jnp.asarray(batch.data != -1.0)
i2w = jnp.asarray(batch.i2w, jnp.float32)
sid = jnp.asarray(batch.stack_index, jnp.int32)
mask = jnp.asarray((rng.uniform(0, 1, (zs, ys, xs)) > 0.2)
                   .astype(np.float32))
ctx = svr_core.SVRContext(vol_shape=(zs, ys, xs),
                          vol_spacing=(2.4, 2.4, 2.4),
                          offsets=psf_ops.make_offsets(support),
                          slice_spacing_xy=(2.5, 2.5),
                          disable_bias=True, fast=fast)

fwd = svr_core.slice_forward_matrices(jnp.asarray(ra.w2i(), jnp.float32),
                                      transforms, i2w)
geom_r = pf.make_fast_geom(fast, fwd, valid, (zs, ys, xs),
                           mask.reshape(-1), stack_id=sid)
gate = np.asarray(valid & (geom_r.sume > 0))
pay_a = jnp.asarray(rng.uniform(0, 50,
                                batch.data.shape).astype(np.float32)
                    * gate)
pay_b = jnp.asarray(gate.astype(np.float32))
a_r, b_r = pf.fast_scatter2(fast, geom_r, pay_a, pay_b, mask,
                            (zs, ys, xs))

mesh = vs.make_vol_mesh(jax.devices()[:n_dev])
g_fn = vs.vs_build_geometry_fn(ctx, mesh)
geom_v = g_fn(jnp.asarray(ra.w2i(), jnp.float32), transforms, i2w, valid,
              mask, sid)
print("sume diff", float(jnp.abs(geom_v.sume - geom_r.sume).max()))


def body(geom, a, b, mask_slab):
    return vs.vs_fast_scatter2(ctx.fast, geom, a, b, mask_slab,
                               (zs, ys, xs), vs.AXIS_V)


f = jax.jit(vs._smap(body, mesh,
                     in_specs=(vs.GEOM_SPEC, P(), P(), vs.SLAB),
                     out_specs=(vs.SLAB, vs.SLAB)))
a_v, b_v = f(geom_v, pay_a, pay_b, mask)
d = np.abs(np.asarray(a_v) - np.asarray(a_r))
print(f"[n_dev={n_dev}] scatter A max diff {d.max():.4f} "
      f"(scale {float(jnp.abs(a_r).max()):.1f})")
print("per-z:", np.round(d.max(axis=(1, 2)), 2).tolist())

# pre-conv comparison: raw corner accumulation only
inv = jnp.where(geom_r.sume > 0, 1.0 / jnp.where(geom_r.sume > 0,
                                                 geom_r.sume, 1.0), 0.0)
pa0, pb0 = pay_a * inv, pay_b * inv
blocked = pf._splat2_blocked(geom_r.xp, pa0, pb0, (zs, ys, xs), sid=sid,
                             n_stacks=len(fast.terms))
raw_r = sum(pf._unblock2(blocked[s], (zs, ys, xs))[0]
            for s in range(len(fast.terms)))


def raw_body(geom, a, b, mask_slab):
    lz = mask_slab.shape[0]
    s_ = len(fast.terms)
    z0 = jax.lax.axis_index(vs.AXIS_V).astype(jnp.int32) * lz
    inv = jnp.where(geom.sume > 0,
                    1.0 / jnp.where(geom.sume > 0, geom.sume, 1.0), 0.0)
    a_ = (a * inv).reshape(-1)
    b_ = (b * inv).reshape(-1)
    ui, vi, wi, wts = pf._corner_weights(geom.xp)
    nd = wi.ndim - geom.sid.ndim
    sid_b = geom.sid.astype(jnp.int32).reshape(geom.sid.shape + (1,) * nd)
    rows_all, upd_all = [], []
    for c in range(8):
        cw, cv, cu = (c >> 2) & 1, (c >> 1) & 1, c & 1
        zc, yc, xc = wi + cw, vi + cv, ui + cu
        own = ((zc >= z0) & (zc < z0 + lz) & (zc >= 0) & (zc < zs)
               & (yc >= 0) & (yc < ys) & (xc >= 0) & (xc < xs))
        lin = ((sid_b * lz + (zc - z0)) * ys + yc) * xs + xc
        rows_all.append(jnp.where(own, lin, -1).reshape(-1))
        w = wts[..., c].reshape(-1)
        upd_all.append(jnp.stack([w * a_, w * b_], axis=-1))
    rows = jnp.concatenate(rows_all)
    upd = jnp.concatenate(upd_all)
    acc = jnp.zeros((s_ * lz * ys * xs, 2), jnp.float32)
    acc = acc.at[rows].add(upd, mode="drop")
    return jnp.sum(acc.reshape(s_, lz, ys, xs, 2)[..., 0], axis=0)


rf = jax.jit(vs._smap(raw_body, mesh,
                      in_specs=(vs.GEOM_SPEC, P(), P(), vs.SLAB),
                      out_specs=vs.SLAB))
raw_v = rf(geom_v, pay_a, pay_b, mask)
dr = np.abs(np.asarray(raw_v) - np.asarray(raw_r))
print(f"RAW corner scatter max diff {dr.max():.4f} "
      f"(scale {float(jnp.abs(raw_r).max()):.2f})")
print("raw per-z:", np.round(dr.max(axis=(1, 2)), 3).tolist())
