"""Micro-profile of the fast-engine hot ops on the real TPU.

Times each stage of the SVR inner iteration separately plus isolated
primitive benchmarks (trilinear gather/splat, separable conv) to direct
kernel work.  Not part of the test suite.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, n=5, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    if os.environ.get("JAX_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bench import build_problem
    from fetalreconstruction_tpu.pipeline import svr_core
    from fetalreconstruction_tpu.ops import psf_fast

    ctx, p = build_problem()
    fast = ctx.fast
    geom = p["geom"]
    n = p["n"]
    vol_shape = ctx.vol_shape
    em = svr_core.init_em_state(n, p["valid"])
    recon, wts, _ = svr_core.gaussian_reconstruction(
        ctx, geom, p["sume"], p["slices"], p["valid"], em.bias, em.scale,
        p["mask_flat"])
    sim = svr_core.simulate(ctx, geom, p["sume"], recon, p["mask_flat"])
    excluded = jnp.zeros((n,), bool)
    em = svr_core.initialize_robust_statistics(
        ctx, p["slices"], p["valid"], sim, em, 700.0, 100.0, excluded)

    mask = p["mask_flat"].reshape(vol_shape)

    # every large array travels as a jit ARGUMENT — a closure constant
    # is serialized into the HLO and blows the remote-compile tunnel's
    # request limit (HTTP 413; same failure mode bench.py round 1 hit)
    sim_j = jax.jit(lambda g, su, r, mf: svr_core.simulate(
        ctx, g, su, r, mf))
    print("simulate           %.4f s" % timeit(
        sim_j, geom, p["sume"], recon, p["mask_flat"]), flush=True)

    sr_j = jax.jit(lambda g, su, sl, v, em_, sim_, r, mf:
                   svr_core.superresolution_step(
                       ctx, g, su, sl, v, em_, sim_, r, mf, 1.0, 450.0,
                       100.0, 700.0))
    print("superresolution    %.4f s" % timeit(
        sr_j, geom, p["sume"], p["slices"], p["valid"], em, sim, recon,
        p["mask_flat"]), flush=True)

    es_j = jax.jit(lambda sl, v, su, sim_, em_, ex: svr_core.estep(
        ctx, sl, v, su, sim_, em_, ex))
    print("estep              %.4f s" % timeit(
        es_j, p["slices"], p["valid"], p["sume"], sim, em, excluded),
        flush=True)

    ms_j = jax.jit(lambda sl, v, su, sim_, em_: svr_core.mstep(
        ctx, sl, v, su, sim_, em_, 2))
    print("mstep              %.4f s" % timeit(
        ms_j, p["slices"], p["valid"], p["sume"], sim, em), flush=True)

    sc_j = jax.jit(lambda sl, v, su, sim_, em_: svr_core.scale_step(
        ctx, sl, v, su, sim_, em_))
    print("scale              %.4f s" % timeit(
        sc_j, p["slices"], p["valid"], p["sume"], sim, em), flush=True)

    # ---- primitives -------------------------------------------------------
    xp = geom.xp
    terms0 = fast.terms[0]
    print("terms/stack:", [len(t) for t in fast.terms],
          "support:", fast.support)

    g_j = jax.jit(lambda v, x: psf_fast.trilinear_gather(v, x))
    print("gather (all px)    %.4f s" % timeit(g_j, recon, xp), flush=True)

    pay = jnp.ones_like(p["slices"])
    s_j = jax.jit(lambda x, a, b: psf_fast.trilinear_splat2(
        x, a, b, vol_shape))
    print("splat2 (all px)    %.4f s" % timeit(s_j, xp, pay, pay * 2),
          flush=True)

    c_j = jax.jit(lambda v: psf_fast.conv_separable(v, terms0))
    print("conv_sep (1 stack) %.4f s" % timeit(c_j, recon), flush=True)

    from fetalreconstruction_tpu.sr.superresolution import (
        adaptive_regularization)
    cmap = jnp.ones(vol_shape, jnp.float32)
    r_j = jax.jit(lambda r, o: adaptive_regularization(
        r, o, cmap, jnp.float32(1.0), jnp.float32(450.0), 150.0))
    print("adaptive_reg       %.4f s" % timeit(r_j, recon, recon))


if __name__ == "__main__":
    main()
