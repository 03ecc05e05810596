"""Multi-chip SPMD execution: slices sharded over a device mesh.

TPU-native replacement for the reference's multi-GPU runtime
(GPUWorker.{h,cpp} + the peer-memcpy/thrust reduce-broadcast layer,
reconstruction_cuda2.cu:1408-1460, 2225-2239, 2368-2373 / SURVEY.md §2.4):

- the reference assigns contiguous slice ranges to GPUs, replicates the
  volume per device, reduces addon/cmap/volume-weights to device 0 with
  peer cudaMemcpy + thrust::plus, regularizes on device 0 and broadcasts;
- here the slice batch is sharded over the `slices` mesh axis with
  shard_map, the volume is replicated, scatter outputs and EM scalar
  partials are combined with jax.lax.psum over ICI, and regularization
  runs replicated (identical on every chip — no broadcast needed).

All functions accept an already-padded slice count divisible by the mesh
size (pad with fully-invalid slices; they contribute nothing).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..em import robust, bias as bias_mod
from ..ops import psf as psf_ops
from ..pipeline import svr_core
from ..pipeline.state import EMState, SimState
from ..sr import superresolution as sr

AXIS = "slices"


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def pad_slices_for_mesh(n_slices: int, n_devices: int) -> int:
    """Slice count padded up to a multiple of the mesh size."""
    return ((n_slices + n_devices - 1) // n_devices) * n_devices


def slice_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place (N, ...) arrays with the leading axis sharded over `slices`."""
    s = slice_sharding(mesh)
    return tuple(jax.device_put(a, s) for a in arrays)


def sharded_em_sr_iteration(ctx: svr_core.SVRContext, mesh: Mesh):
    """Build the jitted multi-chip EM+SR iteration.

    Returns f(slices, valid, geom, sume, em, recon, vol_weights, mask,
    mask_flat, excluded, alpha, lam, min_i, max_i, sr_iteration)
    -> (recon, em, sim_state).

    One call = one inner SR iteration: [bias] scale -> SR scatter (psum)
    -> regularize (replicated) -> [normalise bias] -> simulate -> M-step
    (psum) -> E-step (psum).
    """
    from jax.experimental.shard_map import shard_map

    geom_spec = psf_ops.SliceGeom(centre=P(AXIS), frac=P(AXIS), a3=P(AXIS),
                                  slice_dim=P(AXIS), valid=P(AXIS))
    em_spec = EMState(weights=P(AXIS), bias=P(AXIS), scale=P(AXIS),
                      slice_weight=P(AXIS), sigma2=P(), m=P(), mix=P(),
                      mix_s=P())
    sim_spec = SimState(sim=P(AXIS), simw=P(AXIS), inside=P(AXIS),
                        slice_inside=P(AXIS))

    def step(slices, valid, geom, sume, em, sim_state, recon, vol_weights,
             mask, mask_flat, excluded, alpha, lam, min_i, max_i,
             sr_iteration):
        gated = valid & (sume > 0)
        if not ctx.disable_bias:
            b = bias_mod.bias_step(slices, gated, em.bias, em.scale,
                                   em.weights, sim_state.sim,
                                   sim_state.simw, ctx.sigma_bias,
                                   ctx.slice_spacing_xy,
                                   ctx.global_bias_correction)
            em = em._replace(bias=b)
        em = em._replace(scale=robust.scale_step(
            slices, gated, em.bias, em.weights, sim_state.sim,
            sim_state.simw))

        # SR scatter: local partial volumes + psum (the ICI all-reduce
        # replacing peer-memcpy reduce-to-root)
        addon, cmap = sr.sr_accumulate(
            geom, ctx.offsets, sume, slices, valid, em.bias, em.scale,
            em.weights, em.slice_weight, sim_state.sim, mask_flat,
            ctx.vol_shape, ctx.disable_bias)
        addon = jax.lax.psum(addon, AXIS)
        cmap = jax.lax.psum(cmap, AXIS)

        original = recon
        recon, cmap = sr.apply_addon(recon, addon, cmap, alpha, min_i,
                                     max_i, ctx.adaptive)
        recon = sr.adaptive_regularization(recon, original, cmap, alpha,
                                           lam, ctx.delta)

        # simulate (volume replicated -> purely local gather)
        sim, simw, inside = psf_ops.psf_gather(
            geom, ctx.offsets, sume, recon.reshape(-1), mask_flat,
            ctx.vol_shape)
        sim_state = SimState(sim=sim, simw=simw, inside=inside,
                             slice_inside=jnp.any(inside, axis=(1, 2)))

        # M-step + E-step with global psum reductions
        sigma2, mix, m = robust.mstep(
            slices, gated, em.bias, em.scale, em.weights, sim_state.sim,
            sim_state.simw, sr_iteration, em.mix, axis_name=AXIS)
        em = em._replace(sigma2=sigma2.astype(jnp.float32),
                         mix=mix.astype(jnp.float32),
                         m=m.astype(jnp.float32))
        weights, potential = robust.voxel_estep(
            slices, gated, em.bias, em.scale, sim_state.sim,
            sim_state.simw, em.sigma2, em.m, em.mix)
        bad_scale = (em.scale < 0.2) | (em.scale > 5.0)
        potential = jnp.where(excluded | bad_scale, -1.0, potential)
        slice_weight, stats = robust.slice_estep(
            potential, em.slice_weight, em.mix_s, axis_name=AXIS)
        em = em._replace(weights=weights, slice_weight=slice_weight,
                         mix_s=stats["mix_s"])
        return recon, em, sim_state

    sm = shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), geom_spec, P(AXIS), em_spec, sim_spec,
                  P(), P(), P(), P(), P(AXIS), P(), P(), P(), P(), P()),
        out_specs=(P(), em_spec, sim_spec),
        check_rep=False)
    return jax.jit(sm)


def sharded_gaussian_reconstruction(ctx: svr_core.SVRContext, mesh: Mesh):
    """Multi-chip initial reconstruction: local PSF scatter + psum."""
    from jax.experimental.shard_map import shard_map

    geom_spec = psf_ops.SliceGeom(centre=P(AXIS), frac=P(AXIS), a3=P(AXIS),
                                  slice_dim=P(AXIS), valid=P(AXIS))

    def step(slices, valid, geom, sume, bias, scale, mask_flat):
        s = slices * scale[:, None, None] if ctx.disable_bias else \
            robust.corrected_slice(slices, bias, scale)
        gate = valid & (sume > 0.0)
        p_val = jnp.where(gate, s, 0.0)
        p_one = jnp.where(gate, 1.0, 0.0)
        num, wts = psf_ops.psf_scatter(geom, ctx.offsets, sume,
                                       [p_val, p_one], mask_flat,
                                       ctx.vol_shape)
        num = jax.lax.psum(num.reshape(ctx.vol_shape), AXIS)
        wts = jax.lax.psum(wts.reshape(ctx.vol_shape), AXIS)
        recon = sr.equalize(num, wts)
        _, _, inside = psf_ops.psf_gather(geom, ctx.offsets, sume,
                                          num.reshape(-1), mask_flat,
                                          ctx.vol_shape)
        voxel_count = jnp.sum(inside, axis=(1, 2))
        return recon, wts, voxel_count

    sm = shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), geom_spec, P(AXIS), P(AXIS), P(AXIS),
                  P()),
        out_specs=(P(), P(), P(AXIS)),
        check_rep=False)
    return jax.jit(sm)
