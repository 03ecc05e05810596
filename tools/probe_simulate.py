"""Probe: where does fast_simulate's 0.18 s go, and can the MXU beat it?

Round-3 left simulate as the largest single step cost (BASELINE.md):
the per-call work is (a) conv_separable(vol*mask) per stack (shift-add
VPU passes), (b) make_shingle of the 4 conv volumes (8 pads + concat
-> the (16, S*R) table), (c) the corner-major axis-1 gather.  This
probe times each piece on the real chip at the canonical bench shape,
plus two candidate replacements:

- banded-matmul conv: each 1-D tap pass as a dot_general against an
  (n, n) banded matrix -> MXU instead of the VPU shift-add chain;
- padded-flat gather: skip the 8x-replicated shingle (one (S*R,) flat
  halo-padded volume per payload; 8 takes at idx + corner offset).

Run: python tools/probe_simulate.py  (real chip through the tunnel)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from fetalreconstruction_tpu.ops import psf_fast as pf


def sync(x):
    return float(jnp.sum(x)) if hasattr(x, "dtype") else [sync(v) for v in x]


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {dt * 1e3:8.1f} ms")
    return dt


def banded(taps, n, flip=False):
    """(n, n) matrix B with out = B-contract(in): B[k, i] = taps[k-i+r]
    (forward) — adjoint uses the transposed contraction."""
    k = len(taps)
    r = (k - 1) // 2
    b = np.zeros((n, n), np.float32)
    for t in range(k):
        d = t - r  # out[i] reads in[i + d]
        w = float(taps[t])
        if w == 0.0:
            continue
        idx = np.arange(max(0, -d), min(n, n - d))
        b[idx + d, idx] += w
    return jnp.asarray(b if not flip else b.T)


def conv_mxu(vol, mats):
    """Apply triads via dot_general: mats = [(Bz, By, Bx, c), ...]."""
    out = jnp.zeros_like(vol)
    hi = jax.lax.Precision.HIGHEST
    for bz, by, bx, c in mats:
        t = jnp.einsum("zyx,xw->zyw", vol, bx, precision=hi)
        t = jnp.einsum("zyx,yw->zwx", t, by, precision=hi)
        t = jnp.einsum("zyx,zw->wyx", t, bz, precision=hi)
        out = out + c * t
    return out


def main():
    print(f"backend: {jax.default_backend()}")
    ctx, p = bench.build_problem()
    fast = ctx.fast
    geom = p["geom"]
    vol_shape = tuple(ctx.vol_shape)
    zs, ys, xs = vol_shape
    mask = p["mask_flat"].reshape(vol_shape)
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.uniform(0, 700, vol_shape).astype(np.float32))
    S = len(fast.terms)
    print(f"stacks: {S}, triads per stack: {[len(t) for t in fast.terms]}")

    # --- full simulate (baseline) — geometry passed as ARGUMENTS
    # (closure constants serialize into the HLO -> HTTP 413 on the
    # remote-compile tunnel; round-1 lesson)
    sim_fn = jax.jit(lambda g, v, m: pf.fast_simulate(fast, g, v, m,
                                                      vol_shape))
    timeit("fast_simulate (production)", sim_fn, geom, vol, mask)

    # --- piece: convs only
    conv_fn = jax.jit(lambda v, m: [pf.conv_separable(v * m, t)
                                    for t in fast.terms])
    timeit("conv_separable x S (shift-add)", conv_fn, vol, mask)

    # --- piece: shingle build from conv outputs
    convs_j = list(conv_fn(vol, mask))

    def shingle_build(cs):
        return jnp.concatenate([pf.make_shingle([c]) for c in cs], axis=1)

    sh_fn = jax.jit(shingle_build)
    timeit("make_shingle x S + concat", sh_fn, convs_j)

    # --- piece: the fused (16, S*R) gather (round-4: FastGeom no longer
    # carries the cmask table — rebuild it here for the probe)
    cmask_tab = jax.jit(shingle_build)(
        [pf.conv_separable(mask, t) for t in fast.terms])
    table = jnp.concatenate([sh_fn(convs_j), cmask_tab], axis=0)

    g_fn = jax.jit(lambda t, xp, sid: pf.shingle_gather(
        t, xp, vol_shape, 2, sid=sid))
    timeit("shingle_gather (16, S*R)", g_fn, table, geom.xp, geom.sid)

    # --- candidate: banded-matmul conv
    mats = []
    for terms in fast.terms:
        mats.append([(banded(kz, zs), banded(ky, ys), banded(kx, xs), c)
                     for kz, ky, kx, c in terms])
    mxu_fn = jax.jit(lambda v, m, ms: [conv_mxu(v * m, mm) for mm in ms])
    timeit("conv via MXU banded matmul x S", mxu_fn, vol, mask, mats)
    # numeric check
    ref = conv_fn(vol, mask)
    got = mxu_fn(vol, mask, mats)
    for a, b in zip(ref, got):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(f"  mxu vs shift-add rel err: {err:.2e}")

    # --- candidate: padded-flat gather (no 8x shingle)
    R = pf.shingle_rows(vol_shape)

    def flat_pad(cs):
        # (S*R,) halo-padded flat volume (front halo of 1 per axis)
        return jnp.concatenate(
            [jnp.pad(c, ((1, 0), (1, 0), (1, 0))).reshape(-1) for c in cs])

    num_flat = jax.jit(flat_pad)(convs_j)

    def gather_flat(nf, xp, sid):
        ui, vi, wi, wts = pf._corner_weights(xp)
        inb = ((ui >= -1) & (ui < xs) & (vi >= -1) & (vi < ys)
               & (wi >= -1) & (wi < zs))
        lin0 = ((wi + 1) * (ys + 1) + (vi + 1)) * (xs + 1) + (ui + 1)
        lin0 = jnp.clip(lin0, 0, R - 1)
        nd = lin0.ndim - 1
        base = lin0 + sid.astype(jnp.int32).reshape(
            sid.shape + (1,) * nd) * R
        acc = jnp.zeros(base.shape, jnp.float32)
        for c in range(8):
            cw, cv, cu = (c >> 2) & 1, (c >> 1) & 1, c & 1
            d = (cw * (ys + 1) + cv) * (xs + 1) + cu
            acc = acc + wts[..., c] * jnp.take(
                nf, (base + d).reshape(-1), axis=0).reshape(base.shape)
        return jnp.where(inb, acc, 0.0)

    gf_fn = jax.jit(gather_flat)
    timeit("flat 8-take gather (1 payload)", gf_fn, num_flat, geom.xp,
           geom.sid)
    # check vs shingle gather of num only
    num_tab = sh_fn(convs_j)
    (ref_num,) = jax.jit(lambda t, xp, sid: pf.shingle_gather(
        t, xp, vol_shape, 1, sid=sid))(num_tab, geom.xp, geom.sid)
    got_num = gf_fn(num_flat, geom.xp, geom.sid)
    err = float(jnp.max(jnp.abs(ref_num - got_num))
                / (jnp.max(jnp.abs(ref_num)) + 1e-9))
    print(f"  flat gather vs shingle rel err: {err:.2e}")

    # --- candidate: idx8-style single take with (8, Npix) indices into
    # the stacked (2, S*R) num/den pair
    nd_flat = jnp.stack([num_flat, num_flat])  # stand-in for (num, den)

    def gather_pair(nf2, xp, sid):
        ui, vi, wi, wts = pf._corner_weights(xp)
        inb = ((ui >= -1) & (ui < xs) & (vi >= -1) & (vi < ys)
               & (wi >= -1) & (wi < zs))
        lin0 = ((wi + 1) * (ys + 1) + (vi + 1)) * (xs + 1) + (ui + 1)
        lin0 = jnp.clip(lin0, 0, R - 1)
        nd = lin0.ndim - 1
        base = lin0 + sid.astype(jnp.int32).reshape(
            sid.shape + (1,) * nd) * R
        deltas = jnp.asarray([(cw * (ys + 1) + cv) * (xs + 1) + cu
                              for cw in (0, 1) for cv in (0, 1)
                              for cu in (0, 1)], jnp.int32)
        idx8 = base.reshape(-1)[None, :] + deltas[:, None]   # (8, Npix)
        vals = jnp.take(nf2, idx8.reshape(-1), axis=1).reshape(
            2, 8, -1)                                        # (2, 8, Npix)
        w8 = jnp.moveaxis(wts.reshape(-1, 8), -1, 0)         # (8, Npix)
        out = jnp.sum(vals * w8[None], axis=1)
        return jnp.where(inb.reshape(-1)[None], out, 0.0)

    gp_fn = jax.jit(gather_pair)
    timeit("pair (2,S*R) idx8 gather (2 payloads)", gp_fn, nd_flat,
           geom.xp, geom.sid)


if __name__ == "__main__":
    main()
