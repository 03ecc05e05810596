"""Compile-only HBM memory analysis of the packed Pallas scatter at the
canonical bench shape (no execution — catches layout-padding OOMs before
paying for a run through the remote-compile tunnel)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_problem
from fetalreconstruction_tpu.ops import pallas_scatter as ps


def report(label, compiled):
    try:
        m = compiled.memory_analysis()
        print(f"{label}: temp={m.temp_size_in_bytes/2**30:.2f}G "
              f"args={m.argument_size_in_bytes/2**30:.2f}G "
              f"out={m.output_size_in_bytes/2**30:.2f}G")
    except Exception as e:  # pragma: no cover
        print(f"{label}: memory_analysis unavailable ({e})")


def main():
    ctx, p = build_problem()
    geom = p["geom"]
    vol_shape = tuple(ctx.vol_shape)
    S = len(ctx.fast.terms)

    plan_fn = jax.jit(ps.build_scatter_plan.__wrapped__,
                      static_argnames=("vol_shape", "n_stacks"))
    lowered = plan_fn.lower(geom.xp, geom.sid, vol_shape, S)
    plan_c = lowered.compile()
    report("build_scatter_plan", plan_c)
    plan = plan_c(geom.xp, geom.sid)
    jax.block_until_ready(plan.loc)
    print("plan shapes:", jax.tree.map(lambda x: x.shape, plan))

    def pls(plan, a, b):
        return ps.pallas_splat2_blocked(plan, a, b, vol_shape, S)

    pay = jnp.ones(p["slices"].shape, jnp.float32)
    c2 = jax.jit(pls).lower(plan, pay, pay).compile()
    report("pallas_splat2_blocked", c2)

    import time
    out = c2(plan, pay, pay)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = c2(plan, pay, pay)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"pallas splat: {best*1e3:.1f} ms")
    s = float(jnp.sum(out))
    print("checksum", s, "finite", bool(np.isfinite(s)))


if __name__ == "__main__":
    main()
