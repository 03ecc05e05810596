"""Volume-sharded (vol_z mesh axis) engine vs the replicated fast engine.

SURVEY §5's large-area mode: recon-grid z-slabs with psum gathers,
ownership-masked scatters and ppermute halo exchange must reproduce the
replicated fast engine exactly (same math, different partitioning).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fetalreconstruction_tpu.ops import psf as psf_ops
from fetalreconstruction_tpu.ops import psf_fast as pf
from fetalreconstruction_tpu.parallel import volume_sharded as vs
from fetalreconstruction_tpu.pipeline import svr_core
from fetalreconstruction_tpu.pipeline.state import create_slices
from fetalreconstruction_tpu.sr import superresolution as sr

from phantom import make_ground_truth, simulate_stacks, mask_slices, \
    recon_mask

N_DEV = 8


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= N_DEV
    gt = make_ground_truth(n=24, spacing=2.0)  # z=24 divides the 8 mesh
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.5, dz=4.0,
                                noise=1.0)
    batch = mask_slices(create_slices(stacks, [8.0, 8.0]))
    ra = gt.attr
    support = psf_ops.reference_support(batch.dims, ra.dx, 1.0, 8)
    fast = pf.FastPSF.from_batch(batch, ra.w2i(), support, )
    assert not fast.pallas  # CPU
    ctx = svr_core.SVRContext(
        vol_shape=ra.shape_zyx, vol_spacing=(ra.dx, ra.dy, ra.dz),
        offsets=psf_ops.make_offsets(support),
        slice_spacing_xy=(2.5, 2.5), disable_bias=True, fast=fast)
    n = batch.n_slices
    transforms = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
    valid = jnp.asarray(batch.data != -1.0)
    mask = jnp.asarray(recon_mask(gt))
    mesh = vs.make_vol_mesh(jax.devices()[:N_DEV])
    return dict(gt=gt, batch=batch, ctx=ctx, fast=fast, ra=ra, n=n,
                transforms=transforms, valid=valid, mask=mask, mesh=mesh,
                slices=jnp.asarray(batch.data),
                i2w=jnp.asarray(batch.i2w, jnp.float32),
                stack_id=jnp.asarray(batch.stack_index, jnp.int32))


def _replicated_geom(p):
    ctx = p["ctx"]
    fwd = svr_core.slice_forward_matrices(
        jnp.asarray(p["ra"].w2i(), jnp.float32), p["transforms"],
        p["i2w"])
    return pf.make_fast_geom(p["fast"], fwd, p["valid"], ctx.vol_shape,
                             p["mask"].reshape(-1),
                             stack_id=p["stack_id"])


def test_vs_geometry_and_simulate_match(setup):
    p = setup
    ctx = p["ctx"]
    geom_r = _replicated_geom(p)

    g_fn = vs.vs_build_geometry_fn(ctx, p["mesh"])
    geom_v = g_fn(jnp.asarray(p["ra"].w2i(), jnp.float32),
                  p["transforms"], p["i2w"], p["valid"], p["mask"],
                  p["stack_id"])
    np.testing.assert_allclose(np.asarray(geom_v.sume),
                               np.asarray(geom_r.sume), atol=1e-3)

    recon = jnp.asarray(np.maximum(p["gt"].data, 0.0))
    sim_r, simw_r, inside_r = pf.fast_simulate(
        p["fast"], geom_r, recon, p["mask"], ctx.vol_shape)
    s_fn = vs.vs_simulate_fn(ctx, p["mesh"])
    ss = s_fn(geom_v, recon, p["mask"])
    np.testing.assert_allclose(np.asarray(ss.sim), np.asarray(sim_r),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(ss.simw), np.asarray(simw_r),
                               atol=1e-3)
    assert np.array_equal(np.asarray(ss.inside), np.asarray(inside_r))


def test_vs_scatter_matches(setup):
    p = setup
    ctx = p["ctx"]
    geom_r = _replicated_geom(p)
    rng = np.random.default_rng(0)
    gate = np.asarray(p["valid"] & (geom_r.sume > 0))
    pay_a = jnp.asarray(
        rng.uniform(0, 50, p["slices"].shape).astype(np.float32) * gate)
    pay_b = jnp.asarray(gate.astype(np.float32))
    # RANDOM mask, nonzero up to the volume borders: the round-3 index-
    # wrap bug corrupted each slab's LAST voxel — an interior-only
    # (ellipsoid) mask zeroed exactly those voxels and hid it
    mask = jnp.asarray((np.random.default_rng(7)
                        .uniform(0, 1, ctx.vol_shape) > 0.2)
                       .astype(np.float32))
    p = dict(p, mask=mask)
    geom_r = _replicated_geom(p)
    a_r, b_r = pf.fast_scatter2(p["fast"], geom_r, pay_a, pay_b,
                                p["mask"], ctx.vol_shape)

    g_fn = vs.vs_build_geometry_fn(ctx, p["mesh"])
    geom_v = g_fn(jnp.asarray(p["ra"].w2i(), jnp.float32),
                  p["transforms"], p["i2w"], p["valid"], p["mask"],
                  p["stack_id"])

    def body(geom, a, b, mask_slab):
        return vs.vs_fast_scatter2(ctx.fast, geom, a, b, mask_slab,
                                   ctx.vol_shape, vs.AXIS_V)

    from jax.sharding import PartitionSpec as P
    f = jax.jit(vs._smap(body, p["mesh"],
                         in_specs=(vs.GEOM_SPEC, P(), P(), vs.SLAB),
                         out_specs=(vs.SLAB, vs.SLAB)))
    a_v, b_v = f(geom_v, pay_a, pay_b, p["mask"])
    scale = max(float(jnp.abs(a_r).max()), 1.0)
    np.testing.assert_allclose(np.asarray(a_v), np.asarray(a_r),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(b_v), np.asarray(b_r),
                               atol=2e-3 * max(float(jnp.abs(b_r).max()),
                                               1.0))


@pytest.mark.slow
def test_vs_inner_iteration_matches(setup):
    """Full fused inner EM/SR iteration: volume-sharded == replicated."""
    p = setup
    ctx = p["ctx"]
    geom_r = _replicated_geom(p)
    mask_flat = p["mask"].reshape(-1)
    em = svr_core.init_em_state(p["n"], p["valid"])
    recon, wts, _ = svr_core.gaussian_reconstruction(
        ctx, geom_r, geom_r.sume, p["slices"], p["valid"], em.bias,
        em.scale, mask_flat)
    sim = svr_core.simulate(ctx, geom_r, geom_r.sume, recon, mask_flat)
    excluded = jnp.zeros((p["n"],), bool)
    em = svr_core.initialize_robust_statistics(
        ctx, p["slices"], p["valid"], sim, em, 120.0, 1.0, excluded)
    args = (jnp.float32(1.0), jnp.float32(450.0), jnp.float32(1.0),
            jnp.float32(120.0), jnp.int32(2))

    g_fn = vs.vs_build_geometry_fn(ctx, p["mesh"])
    geom_v = g_fn(jnp.asarray(p["ra"].w2i(), jnp.float32),
                  p["transforms"], p["i2w"], p["valid"], p["mask"],
                  p["stack_id"])
    step = vs.vs_inner_iteration_fn(ctx, p["mesh"], do_bias=False,
                                    do_scale=True)
    em_v, sim_v, recon_v = step(geom_v, p["slices"], p["valid"], em, sim,
                                recon, wts, p["mask"], excluded, *args)

    # replicated step LAST: svr_core.inner_iteration donates em/sim/recon
    em_r, sim_r, recon_r = svr_core.inner_iteration(
        ctx, geom_r, geom_r.sume, p["slices"], p["valid"], em, sim,
        recon, wts, p["mask"], mask_flat, excluded, *args,
        do_bias=False, do_scale=True, do_normalise_bias=False)

    sc = max(float(jnp.abs(recon_r).max()), 1.0)
    np.testing.assert_allclose(np.asarray(recon_v), np.asarray(recon_r),
                               atol=2e-3 * sc)
    np.testing.assert_allclose(np.asarray(em_v.slice_weight),
                               np.asarray(em_r.slice_weight), atol=1e-3)
    np.testing.assert_allclose(float(em_v.sigma2), float(em_r.sigma2),
                               rtol=1e-3)


@pytest.mark.slow
def test_vs_pipeline_mode_matches_single_device():
    """run_svr(mesh_mode='volume') must reproduce the single-device
    pipeline result (z-slab sharded volume state end to end)."""
    from fetalreconstruction_tpu.pipeline.config import SVRConfig
    from fetalreconstruction_tpu.pipeline.svr import run_svr
    from fetalreconstruction_tpu.core.image import Image

    gt = make_ground_truth(n=20, spacing=2.4)
    stacks, _ = simulate_stacks(gt, n_stacks=2, in_plane=2.5, dz=4.0,
                                noise=1.0)
    mask_img = Image((gt.data > 1.0).astype(np.float32), gt.attr.copy())
    # full defaults including bias correction + NormaliseBias: the
    # volume-sharded NormaliseBias (multi-hop blur halos) must match too
    # reg_optimizer="coord-scan" pins both runs to the same scanned
    # registration program (see tests/test_mesh2d.py)
    cfg = SVRConfig(iterations=2, resolution=2.4, rec_iterations_first=2,
                    rec_iterations_last=2, smooth_mask=2.0,
                    multires_levels=1, reg_levels=1, reg_iterations=2,
                    max_psf_support=8, no_log=True,
                    reg_optimizer="coord-scan")
    r_single = run_svr(cfg, stacks=[Image(s.data.copy(), s.attr.copy())
                                    for s in stacks], mask=mask_img)
    mesh = vs.make_vol_mesh(jax.devices()[:4])
    r_vs = run_svr(cfg, stacks=[Image(s.data.copy(), s.attr.copy())
                                for s in stacks], mask=mask_img,
                   mesh=mesh, mesh_mode="volume")
    a, b = r_single.reconstructed, r_vs.reconstructed
    # the volume-sharded grid is z-padded to the mesh multiple; compare on
    # the overlapping region resampled to the single-device grid
    import jax.numpy as jnp
    from fetalreconstruction_tpu.ops.sampling import resample_to_grid
    b_on_a = np.asarray(resample_to_grid(
        jnp.asarray(b.data), jnp.asarray(b.attr.w2i(), jnp.float32),
        a.attr.shape_zyx, jnp.asarray(a.attr.i2w(), jnp.float32),
        interp="nn", padding=0.0))
    roi = (a.data > 0) & (b_on_a > 0)
    assert roi.mean() > 0.1
    sc = max(float(np.abs(a.data[roi]).max()), 1.0)
    err = np.abs(a.data[roi] - b_on_a[roi])
    assert err.max() < 5e-2 * sc, err.max()
