"""Probe the window-accumulate pattern for the scatter kernel:
- PrefetchScalarGridSpec with out index_map driven by a prefetched window
  id per chunk;
- VMEM scratch mini-acc reset at window start, flushed at window end;
- 8-copy ILP variant of the row-accumulate loop.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.2f} ms  "
          f"({dt / NPIX * 1e9:.1f} ns/row)")
    return out


CHUNK = 2048
W = 16
ACC = 2048        # mini-acc rows per window
NWIN = 64         # number of output windows
CPW = 8           # chunks per window
NCHUNKS = NWIN * CPW
NPIX = NCHUNKS * CHUNK


def probe_windowed():
    rng = np.random.default_rng(0)
    upd = rng.uniform(0, 1, (NPIX, W)).astype(np.float32)
    # rows local to each chunk's window
    loc = rng.integers(0, ACC, (NPIX,)).astype(np.int32)
    win = np.repeat(np.arange(NWIN, dtype=np.int32), CPW)  # per chunk
    first = (np.arange(NCHUNKS) % CPW == 0).astype(np.int32)
    last = (np.arange(NCHUNKS) % CPW == CPW - 1).astype(np.int32)

    def kernel(win_ref, first_ref, last_ref, loc_ref, upd_ref, out_ref,
               acc_ref):
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(k, _):
            r = loc_ref[k]
            acc_ref[pl.ds(r, 1), :] += upd_ref[pl.ds(k, 1), :]
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

        @pl.when(last_ref[c] == 1)
        def _():
            # "unblock": here just a dense transform of the mini-acc
            out_ref[0] = acc_ref[:] * 2.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NCHUNKS,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, w, f, l: (c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, W), lambda c, w, f, l: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ACC, W), lambda c, w, f, l: (w[c], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ACC, W), jnp.float32)],
    )
    f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NWIN, ACC, W), jnp.float32),
    )
    fj = jax.jit(f)
    res = timeit(f"windowed rowadd {NPIX >> 20}M rows", fj,
                 jnp.asarray(win), jnp.asarray(first), jnp.asarray(last),
                 jnp.asarray(loc), jnp.asarray(upd))
    ref = np.zeros((NWIN, ACC, W), np.float32)
    for c in range(NCHUNKS):
        np.add.at(ref[win[c]], loc[c * CHUNK:(c + 1) * CHUNK],
                  upd[c * CHUNK:(c + 1) * CHUNK])
    ref *= 2.0
    err = np.abs(np.asarray(res) - ref).max() / ref.max()
    print(f"  correctness rel err: {err:.2e}")


def probe_ilp8():
    """Row-accumulate with 8 independent accumulator copies to break the
    RMW dependency chain."""
    rng = np.random.default_rng(0)
    upd = rng.uniform(0, 1, (NPIX, W)).astype(np.float32)
    loc = rng.integers(0, ACC, (NPIX,)).astype(np.int32)

    def kernel(loc_ref, upd_ref, out_ref, acc_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        def body(k, _):
            for j in range(8):
                r = loc_ref[k * 8 + j]
                acc_ref[pl.ds(r, 1), pl.ds(j * W, W)] += \
                    upd_ref[pl.ds(k * 8 + j, 1), :]
            return 0

        jax.lax.fori_loop(0, CHUNK // 8, body, 0)

        @pl.when(c == pl.num_programs(0) - 1)
        def _():
            s = acc_ref[:, 0:W]
            for j in range(1, 8):
                s = s + acc_ref[:, j * W:(j + 1) * W]
            out_ref[:] = s

    f = pl.pallas_call(
        kernel,
        grid=(NCHUNKS,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c: (c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, W), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ACC, W), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ACC, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ACC, 8 * W), jnp.float32)],
    )
    fj = jax.jit(f)
    res = timeit(f"ilp8 rowadd {NPIX >> 20}M rows", fj, jnp.asarray(loc),
                 jnp.asarray(upd))
    ref = np.zeros((ACC, W), np.float32)
    np.add.at(ref, loc, upd)
    err = np.abs(np.asarray(res) - ref).max() / ref.max()
    print(f"  correctness rel err: {err:.2e}")


if __name__ == "__main__":
    for name, fn in [("windowed", probe_windowed), ("ilp8", probe_ilp8)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} failed:", type(e).__name__, str(e)[:400])
