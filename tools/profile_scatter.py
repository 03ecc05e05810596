"""Decompose fast_scatter2 cost on the TPU and test cheaper formulations.

Pieces: (a) the width-16 row scatter, (b) the parity un-blocking,
(c) the per-stack separable convolutions; plus candidate variants:
sorted-indices scatter, segment_sum with cached sort, conv layouts.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_problem
from fetalreconstruction_tpu.ops import psf_fast as pf


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.1f} ms")
    return out


def main():
    ctx, p = build_problem()
    geom = p["geom"]
    fast = ctx.fast
    vol_shape = tuple(ctx.vol_shape)
    S = len(fast.terms)
    rng = np.random.default_rng(1)
    pay_a = jnp.asarray(rng.uniform(0, 1, p["slices"].shape), jnp.float32)
    pay_b = jnp.ones_like(pay_a)

    splat = jax.jit(lambda xp, a, b, sid: pf._splat2_blocked(
        xp, a, b, vol_shape, sid=sid, n_stacks=S))
    blocked = timeit("(a) splat2_blocked scatter", splat, geom.xp, pay_a,
                     pay_b, geom.sid)

    unb = jax.jit(lambda bl: [pf._unblock2(bl[s], vol_shape)
                              for s in range(S)])
    dense = timeit("(b) unblock x S", unb, blocked)

    def convs(dense):
        out_a = jnp.zeros(vol_shape, jnp.float32)
        out_b = jnp.zeros(vol_shape, jnp.float32)
        for s, terms in enumerate(fast.terms):
            out_a = out_a + pf.conv_separable(dense[s][0], terms, flip=True)
            out_b = out_b + pf.conv_separable(dense[s][1], terms, flip=True)
        return out_a, out_b

    timeit("(c) per-stack adjoint convs", jax.jit(convs), dense)

    # --- variant: scatter with sorted cached permutation -----------------
    zs, ys, xs = vol_shape
    Bz, By, Bx = (zs + 3) // 2, (ys + 3) // 2, (xs + 3) // 2
    nrows = S * 8 * Bz * By * Bx

    # host-side: row ids (as _splat2_blocked computes them)
    def row_ids(xp, sid):
        ui, vi, wi, wts = pf._corner_weights(xp)
        inb = ((ui >= -1) & (ui < xs) & (vi >= -1) & (vi < ys)
               & (wi >= -1) & (wi < zs))
        sx, sy, sz = ui & 1, vi & 1, wi & 1
        bx, by, bz = (ui + sx) >> 1, (vi + sy) >> 1, (wi + sz) >> 1
        par = (sz << 2) | (sy << 1) | sx
        row = ((par * Bz + bz) * By + by) * Bx + bx
        nd = row.ndim - 1
        row = row + sid.astype(jnp.int32).reshape(
            sid.shape + (1,) * nd) * (8 * Bz * By * Bx)
        return jnp.where(inb, row, nrows).reshape(-1), wts

    rows, wts = jax.jit(row_ids)(geom.xp, geom.sid)
    perm = jnp.argsort(rows)
    rows_sorted = rows[perm]

    def scatter_sorted(pay_a, pay_b, wts, perm, rows_sorted):
        upd = jnp.stack([wts * pay_a[..., None], wts * pay_b[..., None]],
                        axis=-1).reshape(-1, 16)
        upd = jnp.take(upd, perm, axis=0)
        acc = jnp.zeros((nrows + 1, 16), jnp.float32)
        acc = acc.at[rows_sorted].add(
            upd, mode="drop", indices_are_sorted=True, unique_indices=False)
        return acc[:-1]

    timeit("(d) scatter w/ cached sort (sorted idx)",
           jax.jit(scatter_sorted), pay_a, pay_b, wts, perm, rows_sorted)

    def scatter_segsum(pay_a, pay_b, wts, perm, rows_sorted):
        upd = jnp.stack([wts * pay_a[..., None], wts * pay_b[..., None]],
                        axis=-1).reshape(-1, 16)
        upd = jnp.take(upd, perm, axis=0)
        return jax.ops.segment_sum(upd, rows_sorted,
                                   num_segments=nrows + 1,
                                   indices_are_sorted=True)

    timeit("(e) segment_sum w/ cached sort",
           jax.jit(scatter_segsum), pay_a, pay_b, wts, perm, rows_sorted)

    # timing of the permutation gather alone
    def permute_only(pay_a, pay_b, wts, perm):
        upd = jnp.stack([wts * pay_a[..., None], wts * pay_b[..., None]],
                        axis=-1).reshape(-1, 16)
        return jnp.take(upd, perm, axis=0)

    timeit("(f) permutation gather only", jax.jit(permute_only),
           pay_a, pay_b, wts, perm)

    # argsort cost (geometry-build time, amortized)
    timeit("(g) argsort rows (build-time)",
           jax.jit(lambda r: jnp.argsort(r)), rows, reps=1)


if __name__ == "__main__":
    main()
