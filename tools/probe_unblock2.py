"""Probe: replace the parity un-block (8 x 7-D transposes + shifted
sums, ~0.29 s at canonical size — the dominant inner-iteration cost
after the 4x scatter) with ONE stride-2 conv_transpose whose one-hot
(3,3,3,128,2) kernel performs the block->dense interleave, the parity
shifts and the parity sum on the MXU.

Usage: python tools/probe_unblock2.py          (correctness on small,
                                                then canonical timing)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from fetalreconstruction_tpu.ops import psf_fast as pf


def onehot_kernel():
    """(3,3,3, 128, 2) one-hot conv_transpose kernel.

    feature = ((((par*2 + cw)*2 + cv)*2 + cu)*2 + pay); the logical tap
    position along each axis is corner - parity + 1, SPATIALLY FLIPPED
    (lax.conv_transpose with transpose_kernel=False correlates with the
    unflipped kernel — verified empirically: the flipped build is exact,
    the unflipped one is not)."""
    w = np.zeros((3, 3, 3, 128, 2), np.float32)
    for par in range(8):
        szp, syp, sxp = (par >> 2) & 1, (par >> 1) & 1, par & 1
        for cw in range(2):
            for cv in range(2):
                for cu in range(2):
                    for pay in range(2):
                        f = ((((par * 2 + cw) * 2 + cv) * 2 + cu) * 2
                             + pay)
                        w[szp - cw + 1, syp - cv + 1, sxp - cu + 1,
                          f, pay] = 1.0
    return jnp.asarray(w)


def unblock_convt(acc, vol_shape):
    """acc: (S, 8, Bz, By, Bx, 2,2,2,2) -> (S, 2, zs, ys, xs)."""
    zs, ys, xs = vol_shape
    s_ = acc.shape[0]
    bz, by, bx = acc.shape[2:5]
    x = acc.transpose(0, 2, 3, 4, 1, 5, 6, 7, 8).reshape(
        s_, bz, by, bx, 128)
    out = jax.lax.conv_transpose(
        x, onehot_kernel(), strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)
    out = out[:, 1:zs + 1, 1:ys + 1, 1:xs + 1, :]
    return out.transpose(0, 4, 1, 2, 3)


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
    # correctness on a small odd-shaped volume
    vol_shape = (9, 7, 10)
    bz, by, bx = [(d + 3) // 2 for d in vol_shape]
    acc = jnp.asarray(rng.normal(0, 1, (2, 8, bz, by, bx, 2, 2, 2, 2))
                      .astype(np.float32))
    ref = unblock_ref(acc, vol_shape)
    got = unblock_convt(acc, vol_shape)
    d = float(jnp.abs(got - ref).max())
    print(f"correctness max diff {d:.2e} "
          f"(scale {float(jnp.abs(ref).max()):.2f})")
    assert d < 1e-4, "one-hot convT must be an exact copy"

    if jax.default_backend() == "cpu":
        print("cpu backend: skipping canonical timing")
        return
    # canonical-size timing
    vol_shape = (160, 160, 160)
    bz = by = bx = 81
    acc = jnp.asarray(rng.normal(0, 1, (4, 8, bz, by, bx, 2, 2, 2, 2))
                      .astype(np.float32))
    t("unblock REF (transposes+sums)", jax.jit(
        lambda a: unblock_ref(a, vol_shape)), acc)
    t("unblock convT (MXU)", jax.jit(
        lambda a: unblock_convt(a, vol_shape)), acc)


if __name__ == "__main__":
    main()
