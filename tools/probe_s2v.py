"""Round-5 probe: where does the 139 s/round slice-to-volume
registration wall go, and which restructurings pay?

Measures, at the canonical registration shape (168 targets ~180x180,
168^3 volume), per pyramid level:
  - one `_cost_once` (12-eval sweep unit cost / 12)
  - one `_sweep_once` (the stepped driver's dispatch unit)
  - raw shingle gather / reg_blur / NCC component times
  - dispatch+sync overhead (sweep wall vs compute)
and probes the restructurings:
  - K-sweep fused programs (lax.scan over sweeps) at K=2,4,8 -- the
    round-4 monolithic-scan crash boundary
  - +-probe batching (6 evals of 2N vs 12 of N)

Run: python tools/probe_s2v.py [--level 0 1 2] [--scan 0]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def setup(n=168, hw=180, vol=168):
    import jax
    import jax.numpy as jnp
    from fetalreconstruction_tpu.core.geometry import (ImageAttributes,
                                                       rigid_matrix)
    from fetalreconstruction_tpu.register import slice2vol as s2v

    rng = np.random.default_rng(0)
    # textured ellipsoid recon
    lin = np.linspace(-1, 1, vol)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(xx ** 2 + 1.15 * yy ** 2 + 1.25 * zz ** 2)
    tex = (360.0 + 140.0 * np.cos(9 * np.pi * r)
           + 90.0 * np.sin(7 * xx + 11 * yy - 9 * zz))
    recon = jnp.asarray(np.where(r < 0.82, np.maximum(tex, 1.0), 0.0)
                        .astype(np.float32))
    ra = ImageAttributes(x=vol, y=vol, z=vol, dx=1.0, dy=1.0, dz=1.0)
    recon_w2i = jnp.asarray(ra.w2i(), jnp.float32)

    # 4 orientations x 42 slices; ofs_i2w = origin-zeroed slice grids
    rots = [[0, 0, 0], [90, 0, 0], [0, 90, 0], [45, 45, 0]]
    ofs = np.zeros((n, 4, 4), np.float32)
    mo = np.zeros((n, 4, 4), np.float32)
    k = 0
    for s in range(4):
        srot = rigid_matrix([0, 0, 0] + rots[s])
        for j in range(42):
            a = ImageAttributes(x=hw, y=hw, z=1, dx=1.0, dy=1.0, dz=1.0)
            z = a.copy()
            z.xorigin = z.yorigin = z.zorigin = 0.0
            ofs[k] = (srot @ z.i2w()).astype(np.float32)
            t = np.eye(4, dtype=np.float32)
            t[:3, 3] = np.asarray(srot[:3, :3]) @ np.asarray(
                [0.0, 0.0, (j - 21) * 2.5])
            mo[k] = t
            k += 1
    ofs_i2w = jnp.asarray(ofs)

    # targets: generate at true params (mo translation), add noise.
    # ONE jitted program — eager ops through the axon tunnel pay a
    # per-op compile (this setup ran eagerly in the first probe cut and
    # burned the whole 25-min budget before the first measurement).
    noise = jnp.asarray(rng.normal(0, 5, (n, hw, hw)).astype(np.float32))

    @jax.jit
    def build_targets(recon, recon_w2i, mo, ofs_i2w, noise):
        true_t = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
        t_opt = jnp.einsum("nij,njk->nik", true_t, mo)
        params_true = s2v.matrix_to_params_jax(t_opt)
        targets = s2v.generate_slices(recon, recon_w2i, params_true,
                                      ofs_i2w, (hw, hw), 0)
        return targets + noise, params_true

    targets, params_true = build_targets(recon, recon_w2i,
                                         jnp.asarray(mo), ofs_i2w, noise)
    # initial params: perturbed truth (mid-registration state)
    pert = rng.normal(0, 1.0, (n, 6)).astype(np.float32)
    params0 = params_true + jnp.asarray(pert)
    return dict(recon=recon, recon_w2i=recon_w2i, ofs_i2w=ofs_i2w,
                targets=targets, params=params0, params_true=params_true,
                mo=jnp.asarray(mo), n=n, rng=rng)


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(jnp.asarray(x)))


def timeit(fn, reps=3):
    out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--scan", type=int, default=1)
    ap.add_argument("--full", action="store_true",
                    help="time register_slices_to_volume end-to-end on "
                         "the canonical problem (mid-registration "
                         "perturbed init)")
    ap.add_argument("--no-compact", action="store_true")
    ap.add_argument("--pert", type=float, default=1.0,
                    help="init perturbation sigma (mm/deg); --half "
                         "perturbs only every other slice")
    ap.add_argument("--half", action="store_true")
    args = ap.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from fetalreconstruction_tpu.ops import psf_fast as pf
    from fetalreconstruction_tpu.register import slice2vol as s2v

    print(f"backend: {jax.default_backend()}")
    d = setup()
    cfg = s2v.SliceRegConfig()

    if args.full:
        if args.no_compact:
            s2v._bucket_size = lambda k, nn: nn
        if args.pert != 1.0 or args.half:
            rng = np.random.default_rng(9)
            pert = rng.normal(0, args.pert,
                              (d["n"], 6)).astype(np.float32)
            if args.half:
                pert[1::2] = 0.0
            d["params"] = d["params_true"] + jnp.asarray(pert)
        t_init = s2v.params_to_matrix(d["params"])
        mo_inv = jnp.linalg.inv(d["mo"])
        transforms = jnp.einsum("nij,njk->nik", t_init, mo_inv)
        for rep in range(3):
            t0 = time.perf_counter()
            out, sim = s2v.register_slices_to_volume(
                cfg, d["recon"], d["recon_w2i"], transforms, d["mo"],
                d["ofs_i2w"], d["targets"], 1.0)
            sync(sim)
            dt = time.perf_counter() - t0
            n = d["n"]
            print(f"full registration round (rep {rep}): {dt:.1f}s = "
                  f"{n / dt:.1f} slices/s "
                  f"{'(no compaction)' if args.no_compact else ''}")
        return
    sigmas = cfg.blur_sigmas(1.0)
    table = pf.make_shingle([d["recon"]])
    vol_shape = tuple(d["recon"].shape)
    n = d["n"]

    for level in args.levels:
        sigma_pix = sigmas[level] / 1.0
        tgt, ofs_l, gen_sigma, sub_level = s2v._level_data(
            cfg, d["targets"], d["ofs_i2w"], sigma_pix, level)
        tgt_mean, _ = s2v._masked_mean(tgt)
        statics = (cfg, sub_level, float(gen_sigma), vol_shape)
        cargs = (table, None, d["recon_w2i"], ofs_l, tgt, tgt_mean)
        params = d["params"]
        h, w = tgt.shape[1:]
        print(f"\n== level {level}: tgt {tgt.shape}, gen_sigma {gen_sigma}")

        t = timeit(lambda: s2v._cost_once(*statics, *cargs, params))
        print(f"  _cost_once (3 offsets): {t*1e3:8.1f} ms")

        # components
        gen1 = jax.jit(lambda p: s2v.generate_slices_psf(
            table, vol_shape, None, d["recon_w2i"], p, ofs_l, (h, w), 0))
        t = timeit(lambda: gen1(params))
        print(f"  generate (1 offset):    {t*1e3:8.1f} ms")
        # bf16 table: is the gather bandwidth-bound (2x) or
        # per-index-bound (no change)?
        table16 = table.astype(jnp.bfloat16)
        gen16 = jax.jit(lambda p: s2v.generate_slices_psf(
            table16, vol_shape, None, d["recon_w2i"], p, ofs_l, (h, w),
            0))
        t = timeit(lambda: gen16(params))
        print(f"  generate bf16 table:    {t*1e3:8.1f} ms")
        gen = gen1(params)
        blur1 = jax.jit(lambda g: s2v.reg_blur(g, float(gen_sigma)))
        t = timeit(lambda: blur1(gen))
        print(f"  reg_blur (1 slice set): {t*1e3:8.1f} ms")
        lin = (jnp.arange(h)[:, None] * w + jnp.arange(w)[None, :])
        sub_mask = (lin % (sub_level + 1)) == 0
        ncc1 = jax.jit(lambda g: s2v._ncc(tgt, tgt_mean, g, sub_mask))
        t = timeit(lambda: ncc1(gen))
        print(f"  ncc (1 slice set):      {t*1e3:8.1f} ms")

        best = s2v._cost_once(*statics, *cargs, params)
        active = jnp.ones((n,), bool)
        step = jnp.float32(2.0 * 2.0 ** level)
        t = timeit(lambda: s2v._sweep_once(*statics, *cargs, params,
                                           active, best, step)[:3], reps=2)
        print(f"  _sweep_once (12 evals): {t*1e3:8.1f} ms "
              f"(per eval {t*1e3/12:.1f})")

        if args.scan:
            from fetalreconstruction_tpu.register.optimizer import coord_sweep

            def k_sweeps(k):
                @jax.jit
                def run(params, active, best, step):
                    cost = s2v.make_cost_fn(
                        cfg, None, d["recon_w2i"], ofs_l, tgt, tgt_mean,
                        (h, w), sub_level, float(gen_sigma),
                        psf_table=table, vol_shape=vol_shape, sid=None)

                    def body(c, _):
                        p, a, b = c
                        p, a, b = coord_sweep(cost, p, a, b, step,
                                              cfg.epsilon)
                        return (p, a, b), None
                    (p, a, b), _ = jax.lax.scan(
                        body, (params, active, best), None, length=k)
                    return p, a, b
                return run

            for k in (2, 4):
                try:
                    f = k_sweeps(k)
                    t = timeit(lambda: f(params, active, best, step),
                               reps=2)
                    print(f"  scan {k} sweeps:         {t*1e3:8.1f} ms "
                          f"(per sweep {t*1e3/k:.1f})")
                except Exception as e:
                    print(f"  scan {k} sweeps: FAILED {type(e).__name__}: "
                          f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
