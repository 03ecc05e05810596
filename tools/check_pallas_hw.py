"""HARDWARE equality check of the Pallas scatter vs the XLA oracle.

Run on the real chip after ANY change to the scatter plan or kernel:
interpret-mode CPU tests CANNOT catch hardware-only breakage — round-4
lesson: an int32-bitcast-to-f32 plan packing produced DENORMAL floats
that the TPU flushed to zero in data movement, so every plan row became
0 and the kernel silently wrote zeros ONLY on hardware (CPU interpret
preserved the bits and stayed green; bench.py timed garbage for several
commits).  Expected output: max rel diff ~0 and matching nonzero
fractions at both shapes.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_compile_cache")
from fetalreconstruction_tpu.ops import pallas_scatter as ps
from fetalreconstruction_tpu.ops import psf_fast as pf

for vol, n, hw, n_stacks in [((20, 18, 16), 12, 10, 2), ((48,)*3, 16, 64, 2)]:
    rng = np.random.default_rng(3)
    xp = jnp.asarray(rng.uniform(-2.0, max(vol) + 1.0, (n, hw, hw, 3)), jnp.float32)
    sid = jnp.asarray(rng.integers(0, n_stacks, (n,)), jnp.int32)
    pay_a = jnp.asarray(rng.uniform(-1, 1, (n, hw, hw)), jnp.float32)
    pay_b = jnp.asarray(rng.uniform(0, 1, (n, hw, hw)), jnp.float32)
    zs, ys, xs = vol
    u = np.floor(np.asarray(xp)).astype(np.int64)
    inb = ((u[..., 0] >= -1) & (u[..., 0] < xs) & (u[..., 1] >= -1)
           & (u[..., 1] < ys) & (u[..., 2] >= -1) & (u[..., 2] < zs))
    pay_a = jnp.where(inb, pay_a, 0.0); pay_b = jnp.where(inb, pay_b, 0.0)
    ref = np.asarray(pf._splat2_blocked(xp, pay_a, pay_b, vol, sid=sid, n_stacks=n_stacks))
    plan = ps.build_scatter_plan(xp, sid, vol, n_stacks)
    out = np.asarray(ps.pallas_splat2_blocked(plan, pay_a, pay_b, vol, n_stacks))
    sc = max(np.abs(ref).max(), 1e-6)
    print(f"vol={vol} n={n}: max rel diff {np.abs(out-ref).max()/sc:.2e} "
          f"nz pal {(np.abs(out)>0).mean():.3f} ref {(np.abs(ref)>0).mean():.3f}", flush=True)
