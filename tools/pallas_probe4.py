"""Probe: 128-lane acc rows with pltpu.roll lane placement.

acc row-group = row id >> 3; slot = row id & 7; update (16,) lane-placed
at slot*16 inside a 128-lane vector via roll, then one dynamic-sublane
add.  Also probe the MXU-based interleave (expansion matmul).
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
GROUPS = 1024     # acc row-groups (8 logical rows each)


def timeit_varied(name, fn, make_args, reps=3, n=NPIX):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(1, reps + 1):
        out = fn(*make_args(r))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.2f} ms  ({dt / n * 1e9:.1f} ns/row)")
    return out


def probe_roll_acc():
    rng = np.random.default_rng(0)
    upd0 = rng.uniform(0, 1, (NPIX, 16)).astype(np.float32)
    rid = rng.integers(0, GROUPS * 8, (NPIX,)).astype(np.int32)
    grid = NPIX // CHUNK

    def kernel(rid_ref, upd_ref, out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            r = rid_ref[k]
            grp = r >> 3
            slot = r & 7
            row = upd_ref[pl.ds(k, 1), :]          # (1, 128), upd in 0:16
            placed = pltpu.roll(row, slot * 16, 1)
            out_ref[pl.ds(grp, 1), :] += placed
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUPS, 128), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GROUPS, 128), jnp.float32),
    ))

    upd_pad = np.zeros((NPIX, 128), np.float32)
    upd_pad[:, :16] = upd0

    def make_args(r):
        return (jnp.asarray(rid), jnp.asarray(upd_pad) * (1.0 + 0.1 * r))

    res = timeit_varied("(roll) 128-lane acc", f, make_args)
    ref = np.zeros((GROUPS * 8, 16), np.float32)
    np.add.at(ref, rid, upd0 * 1.3)
    ref = ref.reshape(GROUPS, 128)
    err = np.abs(np.asarray(res) - ref).max() / ref.max()
    print(f"  correctness rel err: {err:.2e}")


def probe_mxu_interleave():
    """(By, Bx) even/odd parts -> (2By, 2Bx) via expansion matmuls."""
    By = Bx = 81
    rng = np.random.default_rng(0)
    E = rng.uniform(0, 1, (By, Bx)).astype(np.float32)
    O = rng.uniform(0, 1, (By, Bx)).astype(np.float32)
    Pe = np.zeros((2 * By, By), np.float32)
    Po = np.zeros((2 * By, By), np.float32)
    Pe[0::2, :] = np.eye(By)
    Po[1::2, :] = np.eye(By)

    def kernel(e_ref, o_ref, pe_ref, po_ref, out_ref):
        out_ref[:] = (
            jnp.dot(pe_ref[:], e_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(po_ref[:], o_ref[:],
                      preferred_element_type=jnp.float32))

    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * By, Bx), jnp.float32),
    ))
    res = f(jnp.asarray(E), jnp.asarray(O), jnp.asarray(Pe),
            jnp.asarray(Po))
    ref = np.zeros((2 * By, Bx), np.float32)
    ref[0::2] = E
    ref[1::2] = O
    err = np.abs(np.asarray(res) - ref).max()
    print(f"(mxu interleave y) err: {err:.2e}")
    t0 = time.perf_counter()
    for r in range(20):
        jax.block_until_ready(f(jnp.asarray(E) * (1 + r), jnp.asarray(O),
                                jnp.asarray(Pe), jnp.asarray(Po)))
    print(f"    {(time.perf_counter() - t0) / 20 * 1e6:.0f} us/call")


if __name__ == "__main__":
    for name, fn in [("roll", probe_roll_acc),
                     ("mxu_interleave", probe_mxu_interleave)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} failed:", type(e).__name__, str(e)[:300])
