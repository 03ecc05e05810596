"""PROTOTYPE: Pallas un-block kernel (tools/README.md worked design).

The parity un-block is the dominant inner-iteration cost (~295 ms of a
~0.71 s step) and XLA cannot do better (transpose chain, conv_transpose
and strided-add formulations all measured >= 295 ms).

Design (validated here standalone; producer integration is round-4):
- the scatter kernel's flush emits a VAL-MAJOR accumulator
  acc_T (16, NROWS): one in-VMEM transpose per flushed block (the same
  supported op as the scatter's update transpose), with PLANE-PADDED
  plain row order rows = ((s*8+par)*Bz + bz)*PLANE + by*BXP + bx,
  BXP = ceil(Bx/8)*8 — every (s,par,bz) bz-plane is then a contiguous
  (By, BXP) chunk of the minor dim, free to reinterpret as
  (16, NPLANES, By, BXP) without data movement;
- THIS kernel runs one grid step per (s,par,bz) plane: reads the 16
  value-planes as direct blocks (no in-kernel deinterleave — Mosaic
  rejects minor-dim shape casts / strided lane slices / >2-D gathers,
  all hit in earlier iterations of this file), x-interleaves
  (bx, 2cu) -> 2bx on the MXU with one-hot interleave matrices,
  y-interleaves (by, 2cv) -> 2by as a LEADING-dims reshape, applies the
  static per-parity (syp, sxp) shift under pl.when, and writes a
  (2 z, 2 pay, ys, xs) tile of the per-parity partial volume — for a
  fixed parity each output z belongs to exactly one bz: NO revisits;
- XLA sums the 8 per-parity partials with shifted slices.

Run:  python tools/pallas_unblock_proto.py       (chip: check + timing)
      under jax_platforms=cpu: interpret-mode correctness only.
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from fetalreconstruction_tpu.ops import psf_fast as pf


def sizes(vol_shape):
    zs, ys, xs = vol_shape
    Bz, By, Bx = (zs + 3) // 2, (ys + 3) // 2, (xs + 3) // 2
    BXP = -(-Bx // 8) * 8
    return Bz, By, Bx, BXP


def pack_val_major(acc, vol_shape):
    """Host-side constructor of the val-major plane-padded layout from
    the logical (S,8,Bz,By,Bx,2,2,2,2) accumulator (prototype only; in
    production the scatter flush emits this layout directly).

    Returns (16, NPLANES, By, BXP); val i = ((cw*2+cv)*2+cu)*2+pay."""
    S = acc.shape[0]
    Bz, By, Bx, BXP = sizes(vol_shape)
    a = np.asarray(acc).reshape(S, 8, Bz, By, Bx, 16)
    out = np.zeros((16, S * 8 * Bz, By, BXP), np.float32)
    out[:, :, :, :Bx] = np.moveaxis(a, -1, 0).reshape(
        16, S * 8 * Bz, By, Bx)
    return jnp.asarray(out)


def interleave_mats(BXP):
    """One-hot (BXP, 2*BXP) matrices: E routes lane k -> 2k, O -> 2k+1."""
    e = np.zeros((BXP, 2 * BXP), np.float32)
    o = np.zeros((BXP, 2 * BXP), np.float32)
    for k in range(BXP):
        e[k, 2 * k] = 1.0
        o[k, 2 * k + 1] = 1.0
    return jnp.asarray(e), jnp.asarray(o)


def _kernel(vol_shape):
    from jax.experimental import pallas as pl

    zs, ys, xs = vol_shape
    Bz, By, Bx, BXP = sizes(vol_shape)

    def kernel(par_ref, in_ref, e_ref, o_ref, out_ref):
        g = pl.program_id(0)
        par = par_ref[g]
        e, o = e_ref[...], o_ref[...]
        for cw in range(2):
            for pay in range(2):
                rows = []
                for cv in range(2):
                    a0 = in_ref[((cw * 2 + cv) * 2 + 0) * 2 + pay, 0]
                    a1 = in_ref[((cw * 2 + cv) * 2 + 1) * 2 + pay, 0]
                    # (By, BXP) x-interleave on the MXU: lanes 2bx + cu
                    rows.append(
                        jax.lax.dot(a0, e,
                                    precision=jax.lax.Precision.HIGHEST)
                        + jax.lax.dot(a1, o,
                                      precision=jax.lax.Precision.HIGHEST))
                # y-interleave (By, 2cv, 2BXP) -> (2By, 2BXP): LEADING
                # dims merge (minor-dim shape casts are unsupported)
                p = jnp.stack(rows, axis=1).reshape(2 * By, 2 * BXP)
                for sy in range(2):
                    for sx in range(2):
                        @pl.when((((par >> 1) & 1) == sy)
                                 & ((par & 1) == sx))
                        def _(p=p, cw=cw, pay=pay, sy=sy, sx=sx):
                            out_ref[0, cw, pay, :, :] = \
                                p[sy:sy + ys, sx:sx + xs]

    return kernel


@partial(jax.jit, static_argnames=("vol_shape", "n_stacks"))
def unblock_pallas(acc_vm, vol_shape, n_stacks):
    """(16, NPLANES, By, BXP) val-major acc -> (S, 2, zs, ys, xs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    zs, ys, xs = vol_shape
    Bz, By, Bx, BXP = sizes(vol_shape)
    nplanes = n_stacks * 8 * Bz
    par_of = (jnp.arange(nplanes, dtype=jnp.int32) // Bz) % 8
    e, o = interleave_mats(BXP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nplanes,),
        in_specs=[
            pl.BlockSpec((16, 1, By, BXP), lambda g, p: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BXP, 2 * BXP), lambda g, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BXP, 2 * BXP), lambda g, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2, ys, xs),
                               lambda g, p: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    interpret = jax.default_backend() == "cpu"
    partials = pl.pallas_call(
        _kernel(vol_shape),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nplanes, 2, 2, ys, xs),
                                       jnp.float32),
        interpret=interpret,
    )(par_of, acc_vm, e, o)
    # partials[(s,par,bz), cw, pay] covers out z = 2bz + cw - szp;
    # per (s,par): sum the szp-shifted z-slices
    partials = partials.reshape(n_stacks, 8, Bz, 2, 2, ys, xs)
    partials = partials.transpose(0, 1, 4, 2, 3, 5, 6).reshape(
        n_stacks, 8, 2, 2 * Bz, ys, xs)
    out = jnp.zeros((n_stacks, 2, zs, ys, xs), jnp.float32)
    for par in range(8):
        szp = (par >> 2) & 1
        out = out + jax.lax.dynamic_slice(
            partials[:, par], (0, 0, szp, 0, 0),
            (n_stacks, 2, zs, ys, xs))
    return out


def unblock_ref(acc, vol_shape):
    outs = []
    for s in range(acc.shape[0]):
        a, b = pf._unblock2(acc[s], vol_shape)
        outs.append(jnp.stack([a, b]))
    return jnp.stack(outs)


def t(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best * 1e3:9.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    vol_shape = (10, 9, 11)
    S = 2
    Bz, By, Bx, BXP = sizes(vol_shape)
    acc = jnp.asarray(rng.normal(0, 1, (S, 8, Bz, By, Bx, 2, 2, 2, 2))
                      .astype(np.float32))
    ref = unblock_ref(acc, vol_shape)
    got = unblock_pallas(pack_val_major(acc, vol_shape), vol_shape, S)
    d = float(jnp.abs(got - ref).max())
    print(f"correctness max diff {d:.2e} "
          f"(scale {float(jnp.abs(ref).max()):.2f})", flush=True)
    assert d < 1e-5, d

    if jax.default_backend() == "cpu":
        print("cpu: skipping canonical timing")
        return
    vol_shape = (160, 160, 160)
    S = 4
    Bz, By, Bx, BXP = sizes(vol_shape)
    acc = jnp.asarray(rng.normal(
        0, 1, (S, 8, Bz, By, Bx, 2, 2, 2, 2)).astype(np.float32))
    acc_vm = pack_val_major(acc, vol_shape)
    t("unblock REF (XLA transposes)",
      jax.jit(lambda a: unblock_ref(a, vol_shape)), acc)
    t("unblock PALLAS (val-major planes)",
      lambda a: unblock_pallas(a, vol_shape, S), acc_vm)
    ref = unblock_ref(acc, vol_shape)
    got = unblock_pallas(acc_vm, vol_shape, S)
    d = float(jnp.abs(got - ref).max())
    print(f"canonical equality max diff {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
