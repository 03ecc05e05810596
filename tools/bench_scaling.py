"""Scaling-efficiency measurement: sharded inner EM/SR iteration at
n = 1, 2, 4, 8 devices on the virtual CPU mesh (BASELINE.md target:
>= 70% slices/s efficiency).

Only one real TPU chip is reachable from this environment, so absolute
single-chip throughput comes from bench.py on the chip and THIS tool
measures the collective-overhead TREND on the 8-device CPU mesh: per-shard
work shrinks 1/n while the psum'd volume reduction + replicated
regularization stay constant — the same amortization the reference's
peer-memcpy reduce pays (reconstruction_cuda2.cu:2225-2239).

Usage:  python tools/bench_scaling.py  [--slices 128] [--vol 96]
Prints one line per mesh size: wall/iter, slices/s, efficiency vs n=1.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_compile_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slices", type=int, default=32)
    ap.add_argument("--vol", type=int, default=48)
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import build_problem
    from fetalreconstruction_tpu.parallel import sharded
    from fetalreconstruction_tpu.pipeline import svr_core

    n_stacks = 4
    ctx, p = build_problem(n_stacks=n_stacks,
                           stack_slices=args.slices // n_stacks,
                           hw=args.hw, vol=args.vol, recon_dx=1.5,
                           in_plane=1.9, thickness=6.0,
                           max_support=6)
    n = p["n"]
    em = svr_core.init_em_state(n, p["valid"])
    recon, wts, _ = svr_core.gaussian_reconstruction(
        ctx, p["geom"], p["sume"], p["slices"], p["valid"], em.bias,
        em.scale, p["mask_flat"])
    sim = svr_core.simulate(ctx, p["geom"], p["sume"], recon,
                            p["mask_flat"])
    excluded = jnp.zeros((n,), bool)
    em = svr_core.initialize_robust_statistics(
        ctx, p["slices"], p["valid"], sim, em, 700.0, 100.0, excluded)
    mask = p["mask_flat"].reshape(tuple(ctx.vol_shape))

    base = None
    print(f"# {n} slices {args.hw}x{args.hw}, vol {args.vol}^3, "
          f"fast engine, CPU mesh", flush=True)
    for nd in (1, 2, 4, 8):
        if nd > jax.device_count() or n % nd:
            continue
        mesh = sharded.make_mesh(jax.devices()[:nd])
        step = sharded.sharded_inner_iteration(ctx, mesh, donate=False)
        args_t = (p["geom"], p["sume"], p["slices"], p["valid"], em, sim,
                  recon, wts, mask, p["mask_flat"], excluded,
                  jnp.float32(1.0), jnp.float32(450.0), jnp.float32(100.0),
                  jnp.float32(700.0), jnp.int32(2))
        print(f"compiling n={nd}...", flush=True)
        out = step(*args_t)            # compile + warmup
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = step(*args_t)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        sl_s = n / best
        if base is None:
            base = sl_s
        eff = sl_s / (base * nd)
        print(f"n={nd}: {best * 1e3:8.1f} ms/iter  {sl_s:8.1f} slices/s  "
              f"efficiency {100 * eff:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
