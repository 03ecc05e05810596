"""XLA variants of the parity un-block (288 ms in the shipped engine)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax import lax


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        s = float(jnp.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best * 1e3:9.1f} ms")
    return out


S = 4
vol = 160
zs = ys = xs = vol
Bz = By = Bx = (vol + 3) // 2


def unblock_current(acc, p_first=True):
    out_a = jnp.zeros((zs, ys, xs), jnp.float32)
    out_b = jnp.zeros((zs, ys, xs), jnp.float32)
    for p in range(8):
        szp, syp, sxp = (p >> 2) & 1, (p >> 1) & 1, p & 1
        dense = acc[p].transpose(0, 3, 1, 4, 2, 5, 6).reshape(
            2 * Bz, 2 * By, 2 * Bx, 2)
        sl = dense[szp:szp + zs, syp:syp + ys, sxp:sxp + xs]
        out_a = out_a + sl[..., 0]
        out_b = out_b + sl[..., 1]
    return out_a, out_b


def _ipad(x, axis, odd=False):
    """Zero interior-pad along axis: (..., n, ...) -> (..., 2n, ...) with
    x at even (odd=False) or odd positions."""
    cfg = [(0, 0, 0)] * x.ndim
    cfg[axis] = (1, 0, 1) if odd else (0, 1, 1)
    return lax.pad(x, jnp.float32(0), cfg)


def unblock_ipad(acc):
    """Interleave via lax.pad interior padding, axis by axis."""
    out_a = jnp.zeros((zs, ys, xs), jnp.float32)
    out_b = jnp.zeros((zs, ys, xs), jnp.float32)
    for p in range(8):
        szp, syp, sxp = (p >> 2) & 1, (p >> 1) & 1, p & 1
        a = acc[p]  # (Bz,By,Bx,2,2,2,2) [cw,cv,cu,pay]
        # x (cu): slice cu then interleave axis 2
        d = _ipad(a[..., 0, :], 2) + _ipad(a[..., 1, :], 2, odd=True)
        # y (cv)
        d = _ipad(d[..., 0, :], 1) + _ipad(d[..., 1, :], 1, odd=True)
        # z (cw)
        d = _ipad(d[..., 0, :], 0) + _ipad(d[..., 1, :], 0, odd=True)
        sl = d[szp:szp + zs, syp:syp + ys, sxp:sxp + xs]
        out_a = out_a + sl[..., 0]
        out_b = out_b + sl[..., 1]
    return out_a, out_b


def unblock_transpose_first(acc_flat):
    """acc as (R, 16): one transpose to (16, R) then pure dense math."""
    accT = acc_flat.T.reshape(2, 2, 2, 2, 8, Bz, By, Bx)  # cw,cv,cu,pay
    out_a = jnp.zeros((zs, ys, xs), jnp.float32)
    out_b = jnp.zeros((zs, ys, xs), jnp.float32)
    for p in range(8):
        szp, syp, sxp = (p >> 2) & 1, (p >> 1) & 1, p & 1
        for cw in range(2):
            for cv in range(2):
                for cu in range(2):
                    for pay in range(2):
                        blk = accT[cw, cv, cu, pay, p]
                        los = (cw - szp + 1, cv - syp + 1, cu - sxp + 1)
                        cfg = [(los[i], 3 - los[i], 1) for i in range(3)]
                        d = lax.pad(blk, jnp.float32(0), cfg)
                        sl = d[1:1 + zs, 1:1 + ys, 1:1 + xs]
                        if pay == 0:
                            out_a = out_a + sl
                        else:
                            out_b = out_b + sl
    return out_a, out_b


def main():
    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.uniform(0, 1, (8, Bz, By, Bx, 2, 2, 2, 2))
                      .astype(np.float32))
    a_ref, b_ref = jax.jit(unblock_current)(acc)
    timeit("unblock current (1 stack)", jax.jit(unblock_current), acc)
    try:
        a2, b2 = jax.jit(unblock_ipad)(acc)
        err = float(jnp.abs(a2 - a_ref).max())
        print(f"  ipad err vs current: {err:.2e}")
        if err < 1e-3:
            timeit("unblock interior-pad (1 stack)", jax.jit(unblock_ipad),
                   acc)
    except Exception as e:
        print("ipad failed:", type(e).__name__, str(e)[:200])

    acc_flat = acc.reshape(-1, 16)
    try:
        a3, b3 = jax.jit(unblock_transpose_first)(acc_flat)
        err = float(jnp.abs(a3 - a_ref).max())
        print(f"  transpose-first err vs current: {err:.2e}")
        timeit("unblock transpose-first (1 stack)",
               jax.jit(unblock_transpose_first), acc_flat)
    except Exception as e:
        print("transpose-first failed:", type(e).__name__, str(e)[:200])

    # pure transpose cost
    timeit("transpose (R,16)->(16,R) (1 stack)",
           jax.jit(lambda a: a.T.copy()), acc_flat)


if __name__ == "__main__":
    main()
