"""Pallas TPU scatter kernel for the fast PSF engine.

Replaces the XLA width-16 row scatter of `psf_fast._splat2_blocked`
(measured 422 ms for 3.5 M rows on v5e — XLA scatter serializes ~120 ns
per update row) with a sorted-stream accumulate kernel:

- at GEOMETRY BUILD time (once per outer iteration) the pixel -> parity
  accumulator row ids are computed, argsorted, and chopped into fixed
  CHUNK-row pieces that never straddle a BR-row accumulator block
  (`build_scatter_plan`); the permutation, per-chunk block ids and
  row counts are cached in the plan;
- per SCATTER call the two payloads are gathered into the plan's padded
  order and the kernel streams chunks, accumulating each chunk's rows
  into its accumulator block held in VMEM (the TPU grid is sequential,
  so the Pallas revisit pattern keeps a block resident across its chunks
  and flushes to HBM when the prefetched block id advances — the
  deterministic, atomics-free TPU analog of the reference's atomicAdd
  scatter, reconstruction_cuda2.cu:262-295).

LAYOUT RULE (the round-2 OOM lesson): every large HBM buffer must have a
minor dimension of 128 (or be 1-D).  TPU HBM arrays are tiled (8, 128);
a (rows, 16) f32 array is lane-padded 8x — at canonical size the
accumulator alone ballooned to 8.1 GB and OOM'd the 16 GB chip.  Hence:

- per-slot updates travel UPDATE-MAJOR as (16, L): minor dim L, zero
  tiling padding (a (L, 16) stream would pad 8x, and interleaving to a
  packed (L/8, 128) form in XLA materializes a (L, 8, 2) intermediate
  padded to ~32 GB — the round-3 compile-OOM); each (16, CHUNK) block is
  transposed once in VMEM and consumed row-per-slot;
- the trilinear corner weights are cached TRANSPOSED (8, L);
- pad slots past a chunk's valid count carry ZERO weights, so the 8-wide
  unroll adds exact zeros — payloads must be pre-gated finite/zero at
  invalid pixels (fast_scatter2 guarantees this), else a pad slot could
  propagate NaN into the clipped row it aliases;
- the accumulator leaves the kernel VAL-MAJOR (16, NBLK*BR): the flush
  is one in-VMEM transpose per block, and with the PLANE-PADDED row
  order (row = (((s*8+par)*Bz + bz)*By + by)*BXP + bx) every (s,par,bz)
  bz-plane is a contiguous minor-dim span — the un-block kernel
  (pallas_unblock) reads the 16 value planes as direct blocks,
  x-interleaves on the MXU with one-hot matrices, y-interleaves as a
  leading-dims reshape, and emits per-parity partial dense volumes with
  no output revisits (measured 55 ms vs the 295 ms XLA transpose chain).

The kernel reproduces `_splat2_blocked`'s accumulator values (same adds,
sorted order) in the val-major layout; equality against the XLA path is
asserted in tests/test_pallas_scatter.py via the pallas_splat2_blocked
logical view, and the production consumer is pallas_unblock.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 2048        # pixel rows per grid step
BR = 16384          # accumulator rows per VMEM block (round-4: raised
                    # from 8192 — with ~2256 blocks most blocks held
                    # fewer rows than one CHUNK, so the chunk schedule
                    # padded the slot stream to 2.33x the pixel count;
                    # at 16384 the stream is ~1.66x with ~30% fewer
                    # half-empty chunks.  32768 was tried and the kernel
                    # exceeded the 16 MB scoped-vmem limit by 1 MB
                    # (Mosaic's buffering of the 2 MB out block + 2 MB
                    # acc scratch) — 16384 compiles with headroom)


class ScatterPlan(NamedTuple):
    """Geometry-cached scatter schedule (all shapes static given the
    padded pixel count and accumulator size).

    pperm: (L,) i32   pixel index feeding padded slot l (L = NCHUNK*CHUNK)
    loc:   (L,) i32   row offset within the slot's accumulator block
    wtsT:  (8, L) f32 trilinear corner weights, pre-permuted and
           TRANSPOSED (a (L, 8) array would be lane-padded 16x in HBM);
           zero at pad slots and out-of-support pixels
    blk:   (C,) i32   accumulator block id per chunk (non-decreasing)
    first: (C,) i32   1 = first chunk of its block (zero the block)
    last:  (C,) i32   1 = last chunk of its block (flush to HBM)
    cnt8:  (C,) i32   ceil(valid rows / 8) in the chunk — loop bound over
           packed update rows; slots past the valid count carry zero
           weights so the 8-wide unroll adds exact zeros

    (accumulator row/block counts are pure functions of vol_shape and
    n_stacks — recomputed statically where needed so the plan stays an
    all-array pytree)
    """
    pperm: jax.Array
    loc: jax.Array
    wtsT: jax.Array
    blk: jax.Array
    first: jax.Array
    last: jax.Array
    cnt8: jax.Array


def block_dims(vol_shape):
    """(Bz, By, Bx, BXP): parity-block extents + the x-extent padded to
    a multiple of 8 so every (s, par, bz) bz-plane is an exact, aligned
    span of the plain row order (the un-block kernel's plane unit)."""
    zs, ys, xs = vol_shape
    Bz, By, Bx = (zs + 3) // 2, (ys + 3) // 2, (xs + 3) // 2
    return Bz, By, Bx, -(-Bx // 8) * 8


def _row_ids(xp, sid, vol_shape, n_stacks):
    """PLANE-PADDED parity-blocked accumulator row per pixel:
    row = (((s*8 + par)*Bz + bz)*By + by)*BXP + bx — identical adds to
    psf_fast._splat2_blocked (the pad columns bx >= Bx are never
    targeted), laid out so bz-planes are contiguous."""
    from .psf_fast import _corner_weights

    zs, ys, xs = vol_shape
    Bz, By, Bx, BXP = block_dims(vol_shape)
    ui, vi, wi, wts = _corner_weights(xp)
    inb = ((ui >= -1) & (ui < xs) & (vi >= -1) & (vi < ys)
           & (wi >= -1) & (wi < zs))
    sx, sy, sz = ui & 1, vi & 1, wi & 1
    bx, by, bz = (ui + sx) >> 1, (vi + sy) >> 1, (wi + sz) >> 1
    par = (sz << 2) | (sy << 1) | sx
    row = ((par * Bz + bz) * By + by) * BXP + bx
    if sid is not None:
        nd = row.ndim - 1
        row = row + sid.astype(jnp.int32).reshape(
            sid.shape + (1,) * nd) * (8 * Bz * By * BXP)
    nrows = n_stacks * 8 * Bz * By * BXP
    # out-of-support pixels target the sacrificial row `nrows` (sorted
    # last, sliced off after the kernel — mirrors the XLA path's dropped
    # row -1)
    row = jnp.where(inb, row, nrows).reshape(-1)
    return row, wts.reshape(-1, 8), nrows


def acc_rows(vol_shape, n_stacks: int) -> int:
    Bz, By, Bx, BXP = block_dims(vol_shape)
    return n_stacks * 8 * Bz * By * BXP


def plan_sizes(n_pixels: int, nrows: int):
    """Static (NCHUNK, L, NBLK) for a pixel count / accumulator size."""
    nblk = -(-(nrows + 1) // BR)
    nchunk = -(-n_pixels // CHUNK) + nblk
    return nchunk, nchunk * CHUNK, nblk


@partial(jax.jit, static_argnames=("vol_shape", "n_stacks"))
def build_scatter_plan(xp, sid, vol_shape, n_stacks) -> ScatterPlan:
    """Sort pixels by accumulator row and build the chunk schedule.

    Runs under jit at geometry-build time; every output shape depends
    only on static inputs (pixel count, vol_shape, n_stacks).

    (Round-4 measurement: the 3.5 M argsort itself is 11 ms on v5e —
    the round-3 "506 ms plan rebuild" was NOT the sort but the
    downstream slot gathers; a block-partition counting sort was built,
    measured SLOWER (148 ms), and removed.  See BASELINE.md.)
    """
    row, wts, nrows = _row_ids(xp, sid, vol_shape, n_stacks)
    n = row.shape[0]
    np_ = n
    nchunk, L, nblk = plan_sizes(n, nrows)

    perm = jnp.argsort(row)
    rows_sorted = row[perm]

    # per-block ranges in the sorted stream
    blk_edges = jnp.arange(nblk + 1, dtype=jnp.int32) * BR
    s_blk = jnp.searchsorted(rows_sorted, blk_edges[:-1]).astype(jnp.int32)
    e_blk = jnp.searchsorted(rows_sorted, blk_edges[1:]).astype(jnp.int32)
    cnt_blk = e_blk - s_blk
    nc_blk = jnp.maximum((cnt_blk + CHUNK - 1) // CHUNK, 1)  # >=1: zeroing

    # chunk -> block map (pad chunks all target the LAST block, appended
    # after its real chunks, so the out index map stays non-decreasing)
    blk_of_chunk = jnp.repeat(jnp.arange(nblk, dtype=jnp.int32), nc_blk,
                              total_repeat_length=nchunk)
    n_real = jnp.sum(nc_blk)
    pad_chunk = jnp.arange(nchunk) >= n_real
    blk_of_chunk = jnp.where(pad_chunk, nblk - 1, blk_of_chunk)

    first_of_blk = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nc_blk)[:-1]])
    idx_in_blk = jnp.arange(nchunk, dtype=jnp.int32) \
        - first_of_blk[blk_of_chunk]
    first = jnp.where(pad_chunk, 0,
                      (idx_in_blk == 0).astype(jnp.int32))
    # flush when the NEXT chunk belongs to a different block (pad chunks
    # extend the last block, so only the very final chunk flushes it)
    blk_next = jnp.concatenate(
        [blk_of_chunk[1:], jnp.full((1,), -1, jnp.int32)])
    last = (blk_of_chunk != blk_next).astype(jnp.int32)
    start = s_blk[blk_of_chunk] + idx_in_blk * CHUNK
    cnt = jnp.where(pad_chunk, 0,
                    jnp.clip(e_blk[blk_of_chunk] - start, 0, CHUNK))
    cnt8 = (cnt + 7) // 8

    # ---- slot expansion: chunk-major, so per-CHUNK values broadcast
    # (reshape) instead of gathering with L indices, and the sorted
    # (row, pixel, weightsx8) stream is packed into ONE (n, 10) f32
    # table read by a single L-index gather.  Round-4 chip finding: TPU
    # gathers cost ~5-9 ns PER INDEX almost independently of row width
    # — the former three separate L-gathers (start/cnt via slot_chunk,
    # rows_sorted[sidx], perm[sidx]) plus the (L, 8) weight gather were
    # ~340 ms of the round-3 "506 ms plan rebuild"; packing makes the
    # whole expansion one gather (~45 ms at canonical shape).
    slot_off = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    slot_valid = (slot_off < cnt[:, None]).reshape(-1)
    # Each chunk's slots are CONTIGUOUS sorted indices [start, start +
    # CHUNK) — so the expansion is ~nchunk bulk slice-copies, not a
    # random gather.  vmap(dynamic_slice) lowers to an XLA gather with
    # slice_sizes (k, CHUNK): per-INDEX bulk DMA instead of the ~6-9 ns
    # per-element cost of element gathers (round-4 chip finding — three
    # element-wise L-gathers were ~340 ms of the round-3 "506 ms plan
    # rebuild"; this form measures in the tens of ms).  Stream-major
    # (k, n) layouts keep the tables padding-free.  The int rows/perm
    # live in their OWN int32 table: a bitcast-into-f32 packing was
    # tried and silently produced ZERO rows on hardware — small int32
    # values bitcast to DENORMAL floats, which the TPU flushes to zero
    # in data movement (interpret mode preserves bits, so only chip
    # runs broke).
    # zero-pad by CHUNK columns so end-of-stream slices stay in-bounds
    # (pad slots then decode to loc 0 / pperm 0 / weight 0 — inert)
    ints = jnp.pad(jnp.stack([rows_sorted.astype(jnp.int32),
                              perm.astype(jnp.int32)]),
                   ((0, 0), (0, CHUNK)))                     # (2, n+C)
    wtab = jnp.pad(wts[perm].T, ((0, 0), (0, CHUNK)))        # (8, n+C)
    vals_i = jax.vmap(
        lambda s: jax.lax.dynamic_slice(ints, (0, s), (2, CHUNK))
    )(start).transpose(1, 0, 2).reshape(2, L)
    vals_w = jax.vmap(
        lambda s: jax.lax.dynamic_slice(wtab, (0, s), (8, CHUNK))
    )(start).transpose(1, 0, 2).reshape(8, L)
    blk_slot = jnp.broadcast_to(blk_of_chunk[:, None],
                                (nchunk, CHUNK)).reshape(-1)
    loc = jnp.clip(vals_i[0] - blk_slot * BR, 0, BR - 1)
    pperm = vals_i[1]
    # pad slots zeroed so the kernel's 8-wide unroll is add-of-zero
    # past `cnt`
    wtsT = jnp.where(slot_valid[None, :], vals_w, 0.0)
    return ScatterPlan(pperm=pperm.astype(jnp.int32),
                       loc=loc.astype(jnp.int32), wtsT=wtsT,
                       blk=blk_of_chunk.astype(jnp.int32),
                       first=first.astype(jnp.int32),
                       last=last.astype(jnp.int32),
                       cnt8=cnt8.astype(jnp.int32))


N_ACC = 1           # round-robin accumulators (measured on v5e: 1 acc
                    # 285 ms, 2 accs 308 ms, 4 accs exceeds the 16 MB
                    # scoped-vmem limit -> the slot-add loop is not
                    # bound by the accumulator RMW chain; keep 1)


def _make_kernel():
    from jax.experimental import pallas as pl

    def kernel(blk_ref, first_ref, last_ref, cnt8_ref, loc_ref, upd_ref,
               out_ref, *accs):
        acc_refs, u_ref = accs[:N_ACC], accs[N_ACC]
        c = pl.program_id(0)

        @pl.when(first_ref[c] == 1)
        def _():
            for a in acc_refs:
                a[:] = jnp.zeros_like(a)

        # one sublane/lane transpose per chunk: the update stream arrives
        # UPDATE-MAJOR (16, CHUNK) — a padding-free HBM layout (a direct
        # (CHUNK, 16) stream would lane-pad 8x, and building the packed
        # (CHUNK/8, 128) interleave in XLA materializes a ~4x-padded
        # (L, 8, 2) intermediate that OOMs at canonical size: round-3
        # hardware finding) — and is flipped here to row-per-slot form
        u_ref[:] = upd_ref[:].T                     # (CHUNK, 16)

        def body(k8, _):
            for j in range(8):                       # static unroll
                s = 8 * k8 + j
                r = loc_ref[s]
                a = acc_refs[j % N_ACC]
                a[pl.ds(r, 1), :] += u_ref[pl.ds(s, 1), :]
            return 0

        jax.lax.fori_loop(0, cnt8_ref[c], body, 0)

        @pl.when(last_ref[c] == 1)
        def _():
            # flush VAL-MAJOR: out (16, BR) = acc.T — one supported
            # sublane/lane transpose; combined with the plane-padded row
            # order this makes every (s, par, bz) plane a contiguous
            # minor-dim span, so the un-block kernel reads value planes
            # as direct blocks (no unpack transposes at all)
            tot = acc_refs[0][:]
            for a in acc_refs[1:]:
                tot = tot + a[:]
            out_ref[:, :] = tot.T

    return kernel


def pallas_splat2_packed(plan: ScatterPlan, pay_a, pay_b, vol_shape,
                         n_stacks: int):
    """Kernel core: gather payloads into plan order, build the
    update-major stream and run the accumulate kernel.  Returns the
    VAL-MAJOR (16, NBLK*BR) accumulator: lane r of row i holds value
    i = ((cw*2+cv)*2+cu)*2+pay of plane-padded row r — consumed by
    pallas_unblock (production) or pallas_splat2_blocked (tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrows = acc_rows(vol_shape, n_stacks)
    nblk = plan_sizes(1, nrows)[2]
    nchunk = plan.blk.shape[0]
    L = nchunk * CHUNK

    # ONE axis-1 gather of the stacked payload pair: measured 60 ms on
    # v5e vs 262 ms for two flat axis-0 takes (the takes were the ENTIRE
    # former stream cost — the kernel itself is ~20 ms)
    g = jnp.take(jnp.stack([pay_a.reshape(-1), pay_b.reshape(-1)]),
                 plan.pperm, axis=1)                      # (2, L)
    pa, pb = g[0], g[1]
    # UPDATE-MAJOR stream (16, L): row 2c+p = corner-c weight * payload p.
    # Minor dim L keeps the HBM array padding-free (495 MB at canonical
    # size); the kernel transposes each (16, CHUNK) block in VMEM.  (The
    # former packed (L/8, 128) host-side interleave forced XLA to
    # materialize a (L, 8, 2) intermediate whose (8, 128) tiling padded it
    # to 31.7 GB -> compile-time OOM on the 16 GB chip.)
    upd = jnp.stack([plan.wtsT[c] * (pb if p else pa)
                     for c in range(8) for p in (0, 1)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, b, f, la, n: (c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((16, CHUNK), lambda c, b, f, la, n: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, BR),
                               lambda c, b, f, la, n: (0, b[c]),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BR, 16), jnp.float32)
                        for _ in range(N_ACC)]
                       + [pltpu.VMEM((CHUNK, 16), jnp.float32)],
    )
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _make_kernel(),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, nblk * BR), jnp.float32),
        interpret=interpret,
    )(plan.blk, plan.first, plan.last, plan.cnt8, plan.loc, upd)


def _interleave_mats(BXP: int):
    """One-hot (BXP, 2*BXP) matrices: E routes lane k -> 2k, O -> 2k+1
    (the MXU performs the x-interleave in the un-block kernel)."""
    e = np.zeros((BXP, 2 * BXP), np.float32)
    o = np.zeros((BXP, 2 * BXP), np.float32)
    for k in range(BXP):
        e[k, 2 * k] = 1.0
        o[k, 2 * k + 1] = 1.0
    return jnp.asarray(e), jnp.asarray(o)


def _make_unblock_kernel(vol_shape):
    from jax.experimental import pallas as pl

    zs, ys, xs = vol_shape
    Bz, By, Bx, BXP = block_dims(vol_shape)

    def kernel(par_ref, in_ref, e_ref, o_ref, out_ref):
        g = pl.program_id(0)
        par = par_ref[g]
        e, o = e_ref[...], o_ref[...]
        for cw in range(2):
            for pay in range(2):
                rows = []
                for cv in range(2):
                    a0 = in_ref[((cw * 2 + cv) * 2 + 0) * 2 + pay, 0]
                    a1 = in_ref[((cw * 2 + cv) * 2 + 1) * 2 + pay, 0]
                    # (By, BXP) -> (By, 2BXP) x-interleave on the MXU
                    rows.append(
                        jax.lax.dot(a0, e,
                                    precision=jax.lax.Precision.HIGHEST)
                        + jax.lax.dot(a1, o,
                                      precision=jax.lax.Precision.HIGHEST))
                # y-interleave (By, 2cv, 2BXP) -> (2By, 2BXP): LEADING
                # dims merge (minor-dim shape casts are unsupported)
                p = jnp.stack(rows, axis=1).reshape(2 * By, 2 * BXP)
                # static per-parity (syp, sxp) shift (in-kernel
                # dynamic_slice of a value is not implemented)
                for sy in range(2):
                    for sx in range(2):
                        @pl.when((((par >> 1) & 1) == sy)
                                 & ((par & 1) == sx))
                        def _(p=p, cw=cw, pay=pay, sy=sy, sx=sx):
                            out_ref[0, cw, pay, :, :] = \
                                p[sy:sy + ys, sx:sx + xs]

    return kernel


@partial(jax.jit, static_argnames=("vol_shape", "n_stacks"))
def pallas_unblock(acc_vm, vol_shape, n_stacks: int):
    """Un-block the VAL-MAJOR accumulator: (16, R) -> (S, 2, zs, ys, xs).

    One grid step per (s, par, bz) bz-plane; per-parity partial dense
    tiles are written without output revisits (for fixed parity each
    output z belongs to exactly one bz) and XLA sums the 8 shifted
    partials.  Measured 54.6 ms vs 297 ms for the XLA transpose chain at
    the canonical shape (bitwise exact)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    zs, ys, xs = vol_shape
    Bz, By, Bx, BXP = block_dims(vol_shape)
    nrows = acc_rows(vol_shape, n_stacks)
    nplanes = n_stacks * 8 * Bz
    planes = acc_vm[:, :nrows].reshape(16, nplanes, By, BXP)
    par_of = (jnp.arange(nplanes, dtype=jnp.int32) // Bz) % 8
    e, o = _interleave_mats(BXP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nplanes,),
        in_specs=[
            pl.BlockSpec((16, 1, By, BXP), lambda g, p: (0, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BXP, 2 * BXP), lambda g, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BXP, 2 * BXP), lambda g, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, 2, ys, xs),
                               lambda g, p: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    interpret = jax.default_backend() == "cpu"
    partials = pl.pallas_call(
        _make_unblock_kernel(vol_shape),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nplanes, 2, 2, ys, xs),
                                       jnp.float32),
        interpret=interpret,
    )(par_of, planes, e, o)
    # partials[(s,par,bz), cw, pay] covers out z = 2bz + cw - szp
    partials = partials.reshape(n_stacks, 8, Bz, 2, 2, ys, xs)
    partials = partials.transpose(0, 1, 4, 2, 3, 5, 6).reshape(
        n_stacks, 8, 2, 2 * Bz, ys, xs)
    out = jnp.zeros((n_stacks, 2, zs, ys, xs), jnp.float32)
    for par in range(8):
        szp = (par >> 2) & 1
        out = out + jax.lax.dynamic_slice(
            partials[:, par], (0, 0, szp, 0, 0),
            (n_stacks, 2, zs, ys, xs))
    return out


def pallas_splat2_blocked(plan: ScatterPlan, pay_a, pay_b, vol_shape,
                          n_stacks: int):
    """Logical-blocked view of the kernel result (TESTS ONLY — the
    production path consumes pallas_splat2_packed via pallas_unblock).

    Returns the (n_stacks, 8, Bz, By, Bx, 2, 2, 2, 2) blocked
    accumulator, numerically equal to the XLA path (same adds, sorted
    order)."""
    Bz, By, Bx, BXP = block_dims(vol_shape)
    nrows = acc_rows(vol_shape, n_stacks)
    vm = pallas_splat2_packed(plan, pay_a, pay_b, vol_shape, n_stacks)
    acc = vm[:, :nrows].reshape(16, n_stacks, 8, Bz, By, BXP)[..., :Bx]
    return jnp.moveaxis(acc, 0, -1).reshape(
        n_stacks, 8, Bz, By, Bx, 2, 2, 2, 2)
