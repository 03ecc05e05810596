"""Pallas scatter kernel vs the XLA parity-blocked scatter (oracle).

Runs in Pallas interpreter mode on CPU; the identical code path compiles
to the Mosaic TPU kernel on device (benchmarked by tools/bench_pallas.py,
driver-verified through bench.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fetalreconstruction_tpu.ops import pallas_scatter as ps
from fetalreconstruction_tpu.ops import psf_fast as pf


@pytest.mark.parametrize("vol,n,hw,n_stacks", [
    ((20, 18, 16), 12, 10, 2),
    ((33, 33, 33), 7, 17, 1),
])
def test_pallas_matches_xla_splat(vol, n, hw, n_stacks):
    rng = np.random.default_rng(3)
    # positions spanning in/out of bounds (incl. the -1 halo)
    xp = jnp.asarray(
        rng.uniform(-2.0, max(vol) + 1.0, (n, hw, hw, 3)), jnp.float32)
    sid = jnp.asarray(rng.integers(0, n_stacks, (n,)), jnp.int32)
    pay_a = jnp.asarray(rng.uniform(-1, 1, (n, hw, hw)), jnp.float32)
    pay_b = jnp.asarray(rng.uniform(0, 1, (n, hw, hw)), jnp.float32)
    # engine contract: payloads are zero at out-of-support pixels (the
    # XLA path maps them to row -1, which WRAPS to the last acc row and
    # relies on the zero payload; the Pallas path drops them outright)
    zs, ys, xs = vol
    u = np.floor(np.asarray(xp)).astype(np.int64)
    inb = ((u[..., 0] >= -1) & (u[..., 0] < xs)
           & (u[..., 1] >= -1) & (u[..., 1] < ys)
           & (u[..., 2] >= -1) & (u[..., 2] < zs))
    pay_a = jnp.where(inb, pay_a, 0.0)
    pay_b = jnp.where(inb, pay_b, 0.0)

    ref = pf._splat2_blocked(xp, pay_a, pay_b, vol, sid=sid,
                             n_stacks=n_stacks)

    plan = ps.build_scatter_plan(xp, sid, vol, n_stacks)
    out = ps.pallas_splat2_blocked(plan, pay_a, pay_b, vol, n_stacks)

    assert out.shape == ref.shape
    a, b = np.asarray(out), np.asarray(ref)
    scale = max(np.abs(b).max(), 1e-6)
    assert np.allclose(a, b, atol=1e-5 * scale), \
        np.abs(a - b).max() / scale


def test_fast_engine_pallas_path_matches_xla():
    """fast_scatter2 with the Pallas core (plan in geometry) equals the
    XLA core through the public engine API."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ctx, p = ge._tiny_problem(n_slices=8, vol=18, hw=12, fast=True,
                              n_stacks=2)
    fast = ctx.fast
    vol_shape = tuple(ctx.vol_shape)
    rng = np.random.default_rng(0)
    pay = jnp.asarray(rng.uniform(0, 1, p["slices"].shape), jnp.float32)
    gate = np.asarray(p["valid"]) & (np.asarray(p["sume"]) > 0)
    pay = jnp.where(jnp.asarray(gate), pay, 0.0)
    ones = jnp.where(jnp.asarray(gate), 1.0, 0.0)
    mask = p["mask_flat"].reshape(vol_shape)

    assert p["geom"].plan is None  # CPU default: XLA path
    ref = pf.fast_scatter2(fast, p["geom"], pay, ones, mask, vol_shape)

    fast.pallas = True
    from fetalreconstruction_tpu.pipeline import svr_core
    geom2, _ = svr_core.build_geometry.__wrapped__(
        ctx, jnp.asarray(p["recon_attr"].w2i(), jnp.float32),
        p["transforms"], jnp.asarray(p["i2w"], jnp.float32),
        jnp.asarray(p["dims"], jnp.float32), p["valid"], p["mask_flat"],
        stack_id=jnp.asarray(p["stack_id"]))
    assert geom2.plan is not None
    out = pf.fast_scatter2(fast, geom2, pay, ones, mask, vol_shape)
    for o, r in zip(out, ref):
        a, b = np.asarray(o), np.asarray(r)
        sc = max(np.abs(b).max(), 1e-6)
        assert np.allclose(a, b, atol=1e-5 * sc), np.abs(a - b).max() / sc


def test_plan_shapes_static():
    """Two geometries with the same pixel count produce identical plan
    shapes (no recompilation across outer iterations)."""
    rng = np.random.default_rng(0)
    vol = (16, 16, 16)
    shapes = []
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        xp = jnp.asarray(r.uniform(-1, 17, (6, 8, 8, 3)), jnp.float32)
        sid = jnp.zeros((6,), jnp.int32)
        plan = ps.build_scatter_plan(xp, sid, vol, 1)
        shapes.append(jax.tree.map(lambda x: x.shape, plan))
    assert shapes[0] == shapes[1]
