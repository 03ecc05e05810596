"""PSF engine vs NumPy oracle (the reference CUDA kernel math)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fetalreconstruction_tpu.core.geometry import ImageAttributes, rigid_matrix
from fetalreconstruction_tpu.ops import psf as P

from psf_oracle import oracle_all


def build_case(rot_deg=7.0, n_slices=3):
    """A small recon volume + a few slices with a rotated transform."""
    rng = np.random.default_rng(42)
    recon = ImageAttributes(x=20, y=18, z=16, dx=1.0, dy=1.0, dz=1.0)
    recon.xorigin, recon.yorigin, recon.zorigin = 1.0, -2.0, 0.5

    h, w = 12, 14
    slice_attrs = []
    fwd = []
    dims = []
    for k in range(n_slices):
        a = ImageAttributes(x=w, y=h, z=1, dx=1.25, dy=1.25, dz=2.5)
        # stack-like: slices offset along z
        a.xorigin, a.yorigin, a.zorigin = 0.5, -1.0, -2.5 + 2.5 * k
        slice_attrs.append(a)
        t = rigid_matrix([0.4 * k, -0.3, 0.2, rot_deg, -3.0, 2.0])
        fwd.append(recon.w2i() @ t @ a.i2w())
        dims.append([a.dx, a.dy, a.dz])
    fwd = np.stack(fwd)
    dims = np.asarray(dims)

    slices = rng.uniform(10, 100, size=(n_slices, h, w)).astype(np.float32)
    slices[0, :2, :] = -1.0  # padded region
    vol = rng.uniform(0, 50, size=recon.shape_zyx).astype(np.float32)
    mask = np.ones(recon.shape_zyx, np.float32)
    mask[:, :3, :] = 0.0  # part of the volume outside mask
    return recon, slices, fwd, dims, vol, mask


@pytest.fixture(scope="module")
def case():
    recon, slices, fwd, dims, vol, mask = build_case()
    support = P.reference_support(dims, recon.dx, quality_factor=1.0,
                                  max_support=10)
    offsets = P.make_offsets(support)
    sume_o, recon_o, wts_o, sim_o, simw_o, inside_o = oracle_all(
        slices.astype(np.float64), fwd, dims, vol.astype(np.float64),
        mask, offsets)
    geom = P.make_slice_geom(jnp.asarray(fwd, jnp.float32),
                             jnp.asarray(dims, jnp.float32),
                             jnp.asarray(slices != -1.0))
    return dict(recon=recon, slices=slices, fwd=fwd, dims=dims, vol=vol,
                mask=mask, offsets=offsets, geom=geom, sume_o=sume_o,
                recon_o=recon_o, wts_o=wts_o, sim_o=sim_o, simw_o=simw_o,
                inside_o=inside_o)


def test_psf_sums_match_oracle(case):
    sume = np.asarray(P.psf_sums(case["geom"], case["offsets"],
                                 case["recon"].shape_zyx))
    assert np.allclose(sume, case["sume_o"], atol=2e-3, rtol=1e-3)
    # gating: padded pixels have zero sume
    assert np.all(sume[0, :2, :] == 0.0)


def test_psf_scatter_matches_oracle(case):
    geom, offsets = case["geom"], case["offsets"]
    shape = case["recon"].shape_zyx
    sume = P.psf_sums(geom, offsets, shape)
    payload_vals = jnp.where(geom.valid, jnp.asarray(case["slices"]), 0.0)
    payload_ones = jnp.where(geom.valid & (sume > 0), 1.0, 0.0)
    rec, wts = P.psf_scatter(geom, offsets, sume,
                             [payload_vals, payload_ones],
                             jnp.asarray(case["mask"]).reshape(-1), shape)
    rec = np.asarray(rec).reshape(shape)
    wts = np.asarray(wts).reshape(shape)
    assert np.allclose(rec, case["recon_o"], atol=5e-2, rtol=1e-3)
    assert np.allclose(wts, case["wts_o"], atol=2e-3, rtol=1e-3)


def test_psf_gather_matches_oracle(case):
    geom, offsets = case["geom"], case["offsets"]
    shape = case["recon"].shape_zyx
    sume = P.psf_sums(geom, offsets, shape)
    sim, simw, inside = P.psf_gather(
        geom, offsets, sume, jnp.asarray(case["vol"]).reshape(-1),
        jnp.asarray(case["mask"]).reshape(-1), shape)
    assert np.allclose(np.asarray(sim), case["sim_o"], atol=5e-3, rtol=1e-3)
    assert np.allclose(np.asarray(simw), case["simw_o"], atol=2e-3)
    assert np.array_equal(np.asarray(inside), case["inside_o"])


def test_mass_conservation_identity_transform():
    """With mask=1 everywhere and slices fully inside, scatter of ones has
    total mass ~= number of contributing pixels (sum w/sume = 1 per pixel,
    minus out-of-bounds loss)."""
    recon = ImageAttributes(x=24, y=24, z=24, dx=1.0, dy=1.0, dz=1.0)
    a = ImageAttributes(x=10, y=10, z=1, dx=1.0, dy=1.0, dz=3.0)
    fwd = np.stack([recon.w2i() @ np.eye(4) @ a.i2w()])
    dims = np.array([[1.0, 1.0, 3.0]])
    valid = jnp.ones((1, 10, 10), bool)
    geom = P.make_slice_geom(jnp.asarray(fwd, jnp.float32),
                             jnp.asarray(dims, jnp.float32), valid)
    offsets = P.make_offsets(12)
    sume = P.psf_sums(geom, offsets, recon.shape_zyx)
    ones = jnp.ones((1, 10, 10), jnp.float32)
    (wts,) = P.psf_scatter(geom, offsets, sume, [ones],
                           jnp.ones(24 ** 3, jnp.float32), recon.shape_zyx)
    total = float(jnp.sum(wts))
    assert abs(total - 100.0) < 0.5


def test_prune_offsets_preserves_result(case):
    geom, offsets = case["geom"], case["offsets"]
    shape = case["recon"].shape_zyx
    offsets = P.make_offsets(16)  # full reference MAX_PSF_SUPPORT cube
    pruned = P.prune_offsets(offsets, np.asarray(geom.a3),
                             np.asarray(geom.slice_dim))
    assert len(pruned) < len(offsets)
    s_full = np.asarray(P.psf_sums(geom, offsets, shape))
    s_pruned = np.asarray(P.psf_sums(geom, pruned, shape))
    # dropped offsets each contribute < eps; bound total drift accordingly
    max_drift = (len(offsets) - len(pruned)) * 1e-5 + 1e-4
    assert np.max(np.abs(s_full - s_pruned)) < max_drift
    # normalized forward projection is much less sensitive
    sume_f = P.psf_sums(geom, offsets, shape)
    sume_p = P.psf_sums(geom, pruned, shape)
    vol_flat = jnp.asarray(case["vol"]).reshape(-1)
    mask_flat = jnp.asarray(case["mask"]).reshape(-1)
    sim_f, _, _ = P.psf_gather(geom, offsets, sume_f, vol_flat, mask_flat,
                               shape)
    sim_p, _, _ = P.psf_gather(geom, pruned, sume_p, vol_flat, mask_flat,
                               shape)
    assert np.allclose(np.asarray(sim_f), np.asarray(sim_p), atol=2e-2)
