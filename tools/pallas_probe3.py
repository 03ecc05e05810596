"""Probe acc layouts + unblock interleave for the scatter kernel:
(a) (16,1) column write at dynamic (row, lane),
(b) (1,16) row write at dynamic lane offset (multiple_of hint),
(c) sublane/lane interleave (By,2,Bx,2) -> (2By,2Bx) in-kernel,
(d) timing honesty: vary input per rep (axon result caching suspected).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPIX = 1 << 20
CHUNK = 2048
ROWS = 1024     # row-groups
LANES = 128


def timeit_varied(name, fn, make_args, reps=3):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        out = fn(*make_args(r))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.2f} ms  ({dt / NPIX * 1e9:.1f} ns/row)")
    return out


def probe_colwrite():
    """(16,1) column adds at dynamic (16-row base, lane)."""
    rng = np.random.default_rng(0)
    upd0 = rng.uniform(0, 1, (NPIX, 16)).astype(np.float32)
    base = (rng.integers(0, ROWS // 16, (NPIX,)) * 16).astype(np.int32)
    lane = rng.integers(0, LANES, (NPIX,)).astype(np.int32)
    grid = NPIX // CHUNK

    def kernel(base_ref, lane_ref, upd_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            b = base_ref[k]
            l = lane_ref[k]
            col = upd_ref[pl.ds(k, 1), :].reshape(16, 1)
            out_ref[pl.ds(b, 16), pl.ds(l, 1)] += col
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, 16), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    ))

    def make_args(r):
        return (jnp.asarray(base), jnp.asarray(lane),
                jnp.asarray(upd0) * (1.0 + 0.1 * r))

    res = timeit_varied("(a) col16 write dyn (row,lane)", f, make_args)
    ref = np.zeros((ROWS, LANES), np.float32)
    u = np.asarray(upd0) * 1.3
    for i in range(0, NPIX, 97):   # spot check on a subsample is too weak;
        pass
    # full check at rep scale: recompute with last args
    ref = np.zeros((ROWS, LANES), np.float32)
    np.add.at(ref, (base[:, None] + np.arange(16)[None, :], lane[:, None]),
              u)
    err = np.abs(np.asarray(res) - ref).max() / ref.max()
    print(f"  correctness rel err: {err:.2e}")


def probe_rowwrite_lane():
    """(1,16) row adds at dynamic (row, lane-offset mult of 16)."""
    rng = np.random.default_rng(0)
    upd0 = rng.uniform(0, 1, (NPIX, 16)).astype(np.float32)
    row = rng.integers(0, ROWS, (NPIX,)).astype(np.int32)
    lo = (rng.integers(0, LANES // 16, (NPIX,)) * 16).astype(np.int32)
    grid = NPIX // CHUNK

    def kernel(row_ref, lo_ref, upd_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            r = row_ref[k]
            l = pl.multiple_of(lo_ref[k], 16)
            out_ref[pl.ds(r, 1), pl.ds(l, 16)] += upd_ref[pl.ds(k, 1), :]
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, 16), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    ))

    def make_args(r):
        return (jnp.asarray(row), jnp.asarray(lo),
                jnp.asarray(upd0) * (1.0 + 0.1 * r))

    res = timeit_varied("(b) row16 write dyn lane-offset", f, make_args)
    ref = np.zeros((ROWS, LANES), np.float32)
    u = np.asarray(upd0) * 1.3
    np.add.at(ref, (row[:, None], lo[:, None] + np.arange(16)[None, :]), u)
    err = np.abs(np.asarray(res) - ref).max() / ref.max()
    print(f"  correctness rel err: {err:.2e}")


def probe_interleave():
    """(By,2,Bx,2) -> (2By, 2Bx) interleave via jnp inside a kernel."""
    By = Bx = 96

    def kernel(in_ref, out_ref):
        a = in_ref[:]  # (By, 2, Bx, 2)
        out_ref[:] = a.transpose(0, 1, 2, 3).reshape(2 * By, 2 * Bx)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (By, 2, Bx, 2)).astype(np.float32)
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * By, 2 * Bx), jnp.float32),
    ))
    res = f(jnp.asarray(x))
    ref = x.reshape(2 * By, 2 * Bx)
    err = np.abs(np.asarray(res) - ref).max()
    print(f"(c) interleave reshape in kernel: err {err:.2e}")
    t0 = time.perf_counter()
    for r in range(20):
        jax.block_until_ready(f(jnp.asarray(x) * (1 + r)))
    print(f"    {(time.perf_counter() - t0) / 20 * 1e6:.0f} us/call")


if __name__ == "__main__":
    for name, fn in [("col", probe_colwrite),
                     ("rowlane", probe_rowwrite_lane),
                     ("interleave", probe_interleave)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} failed:", type(e).__name__, str(e)[:300])
