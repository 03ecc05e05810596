"""TPU benchmark + equality check: Pallas scatter vs XLA scatter at the
canonical bench shape."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_problem
from fetalreconstruction_tpu.ops import pallas_scatter as ps
from fetalreconstruction_tpu.ops import psf_fast as pf


def t(name, fn, *args, reps=3):
    s = float(jnp.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        s = float(jnp.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best * 1e3:9.1f} ms")


def main():
    ctx, p = build_problem()
    geom = p["geom"]
    fast = ctx.fast
    vol_shape = tuple(ctx.vol_shape)
    S = len(fast.terms)
    rng = np.random.default_rng(1)
    pay_a = jnp.asarray(rng.uniform(0, 1, p["slices"].shape), jnp.float32)
    pay_b = jnp.ones_like(pay_a)

    print("building plan...")
    t0 = time.perf_counter()
    plan = ps.build_scatter_plan(geom.xp, geom.sid, vol_shape, S)
    jax.block_until_ready(plan.blk)
    _ = int(np.asarray(plan.cnt8).sum())
    print(f"plan build: {(time.perf_counter() - t0) * 1e3:.0f} ms "
          f"(includes compile); chunks {plan.blk.shape[0]}")

    t("plan rebuild (compile cached)",
      lambda: ps.build_scatter_plan(geom.xp, geom.sid, vol_shape, S))

    def xla_fn(xp, sid, a, b):
        return pf._splat2_blocked(xp, a, b, vol_shape, sid=sid,
                                  n_stacks=S)

    # kernel CORE only: gather + update-stream build + pallas_call,
    # returning the PACKED accumulator (no unpack/reshape) — isolates the
    # scatter replacement cost from the hand-off layout question
    def core_fn(plan, a, b):
        return ps.pallas_splat2_packed(plan, a, b, vol_shape, S)

    cj0 = jax.jit(core_fn)
    cj = lambda a, b: cj0(plan, a, b)
    packed = cj(pay_a, pay_b)
    print("packed out:", packed.shape)
    t("Pallas CORE (packed out)", cj, pay_a, pay_b)

    xj0 = jax.jit(xla_fn)
    xj = lambda a, b: xj0(geom.xp, geom.sid, a, b)
    ref = xj(pay_a, pay_b)
    t("XLA _splat2_blocked", xj, pay_a, pay_b)

    def pls_fn(plan, a, b):
        return ps.pallas_splat2_blocked(plan, a, b, vol_shape, S)

    try:
        pj0 = jax.jit(pls_fn)
        pj = lambda a, b: pj0(plan, a, b)
        out = pj(pay_a, pay_b)
        d = float(jnp.abs(out - ref).max())
        sc = float(jnp.abs(ref).max())
        print(f"max diff vs XLA: {d:.3e} (scale {sc:.3e})")
        t("Pallas splat2_blocked (logical out)", pj, pay_a, pay_b)
    except Exception as e:
        print(f"logical-out path failed: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # full fast_scatter2 path with Pallas core
    def fs2_pallas(plan, a, b):
        blocked = ps.pallas_splat2_blocked(plan, a, b, vol_shape, S)
        out = jnp.zeros((2,) + vol_shape, jnp.float32)
        for s, terms in enumerate(fast.terms):
            sa, sb = pf._unblock2(blocked[s], vol_shape)
            out = out.at[0].add(pf.conv_separable(sa, terms, flip=True))
            out = out.at[1].add(pf.conv_separable(sb, terms, flip=True))
        return out

    t("fast_scatter2 w/ pallas core", jax.jit(fs2_pallas), plan, pay_a,
      pay_b)


if __name__ == "__main__" and "--stream" not in sys.argv:
    main()


def stream_only():
    """Time the per-call stream build (payload gathers + u16 stack)
    WITHOUT the kernel — isolates kernel cost from stream-build cost."""
    import jax
    import jax.numpy as jnp
    from bench import build_problem
    from fetalreconstruction_tpu.ops import pallas_scatter as ps

    ctx, p = build_problem()
    geom = p["geom"]
    S = len(ctx.fast.terms)
    rng = np.random.default_rng(1)
    pay_a = jnp.asarray(rng.uniform(0, 1, p["slices"].shape), jnp.float32)
    pay_b = jnp.ones_like(pay_a)
    plan = ps.build_scatter_plan(geom.xp, geom.sid,
                                 tuple(ctx.vol_shape), S)
    jax.block_until_ready(plan.blk)

    def build(plan, a, b):
        pa = jnp.take(a.reshape(-1), plan.pperm, axis=0)
        pb = jnp.take(b.reshape(-1), plan.pperm, axis=0)
        return jnp.stack([plan.wtsT[c] * (pb if pp else pa)
                          for c in range(8) for pp in (0, 1)])

    bj = jax.jit(build)
    t("stream build only (takes + u16)", lambda: bj(plan, pay_a, pay_b))

    def takes_only(plan, a, b):
        pa = jnp.take(a.reshape(-1), plan.pperm, axis=0)
        pb = jnp.take(b.reshape(-1), plan.pperm, axis=0)
        return pa + pb

    tj = jax.jit(takes_only)
    t("payload takes only", lambda: tj(plan, pay_a, pay_b))

    def u16_only(plan, pa, pb):
        return jnp.stack([plan.wtsT[c] * (pb if pp else pa)
                          for c in range(8) for pp in (0, 1)])

    pa0 = jnp.take(pay_a.reshape(-1), plan.pperm, axis=0)
    pb0 = jnp.take(pay_b.reshape(-1), plan.pperm, axis=0)
    uj = jax.jit(u16_only)
    t("u16 build only (given takes)", lambda: uj(plan, pa0, pb0))


if __name__ == "__main__" and "--stream" in sys.argv:
    stream_only()
    sys.exit(0)
