"""Pallas TPU kernel for the greedy sync-peak selector.

Behavioral contract: reference ``src/decode.rs:236-254`` — the same
greedy bookkeeping as :func:`noaa_apt_tpu.ops.sync.find_sync_peaks`
(host) and ``_find_sync_peaks_device`` (XLA ``while_loop``), selected
peak-for-peak identically (cross-checked in tests/test_ops.py).

Why a kernel: the XLA jump-form selector pays ~7 us per window argmax
— every ``lax.dynamic_slice`` of the md-wide window walks out to HBM
and each loop iteration carries op-dispatch overhead — ~17 ms for a
10-minute pass, the largest single term in the fused decode graph.
Here the correlation streams through VMEM once (sequential grid,
double-buffered DMA) and each jump's window argmax is a handful of VPU
ops over data already on-chip: ~4 ms for the same pass, bounded below
by the ~2400 inherently sequential jumps.

Kernel shape:

- Grid = corr chunks of ``block`` samples (TPU grids run sequentially);
  the greedy state (current peak ``p``, value ``v``, count ``k``, done
  and deferred-load flags) carries across grid steps in SMEM scratch.
- Each step sees its chunk plus the next one (two aligned BlockSpec
  inputs, the pallas_stage.py halo pattern), so an md-window starting
  anywhere in the chunk reads entirely from VMEM.
- Positions at or past ``n_valid`` are masked with iota-vs-``n``
  compares inside the window math — the input needs no -inf rewrite,
  only a zero pad out to the last chunk's lookahead block, whose
  contents the same masks exclude.
- The jump loop body fuses one replacement-chain try (first argmax of
  ``corr[(p, p+md]]``) with the forced append that follows a failed
  try — first-occurrence argmax = masked max + min-index-of-max,
  matching ``jnp.argmax`` tie semantics.
- The peak list accumulates in the (VMEM-resident) output block via
  masked vector updates; only [max_peaks] int32 ever returns to HBM.

Mosaic constraints honored: window reads start on 8-row sublane
boundaries (masking covers the misalignment); scalar reads at dynamic
offsets become aligned [8, 128] tile loads + masked reductions (there
are no unaligned scalar VMEM loads).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_NEG = np.float32(-np.inf)
_MAX_BLOCK = 1 << 19  # 2 MB f32: ext scratch + double buffers fit VMEM
_kernels: dict = {}


def _superwindow_rows(md: int) -> int:
    """Rows of an 8-row-aligned read covering any md-window placement."""
    wr = -(-(1023 + md) // LANES)
    return -(-wr // 8) * 8


def _pick_block(L: int, md: int) -> int:
    """Power-of-two chunk: big enough for one superwindow, no bigger
    than needed for the signal, capped by the VMEM budget."""
    b = 8 * LANES
    while b < _superwindow_rows(md) * LANES or (b < L and b < _MAX_BLOCK):
        b <<= 1
    return b


def make_select_peaks(n_blocks: int, spr: int, md: int, max_peaks: int,
                      block: int, interpret: bool = False,
                      batch: int | None = None):
    """Build ``fn(corr2 [rows, 128], n_valid) -> (peaks[i32 pr*128], k)``
    for a ``n_blocks``-chunk grid.  ``corr2`` must cover
    ``(n_blocks + 1) * block`` samples (every chunk's lookahead block
    must exist — see :func:`select_peaks`); pad contents are arbitrary,
    the in-kernel ``n_valid`` masks exclude them.

    ``batch``: grid becomes ``(batch, n_blocks)`` — one independent
    greedy scan per batch element, the inner chunk walk re-seeding its
    SMEM state at chunk 0 of each element.  ``fn`` then takes
    ``(corr3 [B, rows, 128], n_valid [B])`` and returns
    ``(peaks [B, pr*128], k [B])``.  This is what lets the BATCHED
    fused decode graph keep the Pallas selector: ``jax.vmap`` of the
    unbatched kernel is unsupported (its auto-prepended grid axis
    would shift the program_id the state reset keys on)."""
    key = (n_blocks, spr, md, max_peaks, block, interpret, batch)
    if key in _kernels:
        return _kernels[key]
    br = block // LANES
    wr = _superwindow_rows(md)
    assert wr * LANES <= block, "superwindow must fit the lookahead block"
    pr = -(-max_peaks // LANES)

    def kernel(n_ref, body_ref, head_ref, peaks_out, k_out, ext_s, sti, stf):
        if batch is None:
            b, i = 0, pl.program_id(0)
        else:
            b, i = pl.program_id(0), pl.program_id(1)
        n = n_ref[b]
        chunk_start = i * block
        chunk_end = chunk_start + block

        @pl.when(i == 0)
        def _():
            peaks_out[...] = jnp.zeros((pr, LANES), jnp.int32)
            sti[0] = 0  # p: current peak position
            sti[1] = 1  # k: peak count (seed peak at 0, decode.rs:236)
            sti[2] = 0  # done
            sti[3] = 0  # pending: v must be loaded from corr[p]

        ext_s[:br, :] = body_ref[...]
        ext_s[br:, :] = head_ref[...]

        @pl.when(i == 0)
        def _():
            # The i=0 iteration replaces the seed (0, 0.0) when corr[0]
            # is positive (decode.rs:250-253): start value max(corr[0], 0)
            # — guarded against an empty correlation.
            stf[0] = jnp.where(
                n > 0, jnp.maximum(ext_s[0, 0], jnp.float32(0.0)), jnp.float32(0.0)
            )

        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (wr, LANES), 0)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (wr, LANES), 1)
        idx8 = (
            jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        )
        pidx = (
            jax.lax.broadcasted_iota(jnp.int32, (pr, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (pr, LANES), 1)
        )

        def read_at(rel):
            # Scalar f32 at flat VMEM offset: aligned [8,128] tile +
            # masked reduce.  Callers only pass offsets below n_valid.
            r8 = (rel // (8 * LANES)) * 8
            tile = ext_s[pl.ds(r8, 8), :]
            return jnp.sum(jnp.where(idx8 == rel - r8 * LANES, tile, 0.0))

        def cond(st):
            p, v, k, done, pending = st
            return jnp.logical_not(done) & (p < chunk_end)

        def body(st):
            p, v, k, done, pending = st
            rel = p - chunk_start  # in [0, block)
            # Deferred v load: an append from an earlier chunk landed
            # here before its value was readable.
            v = jnp.where(pending != 0, read_at(rel), v)
            pending = jnp.int32(0)

            # Replacement-chain try: first argmax of corr[(p, p+md]]
            # (the `elif corr > last` branch, decode.rs:250-253).
            # Positions at or past n_valid are masked out here.
            a = rel + 1
            r8 = (a // (8 * LANES)) * 8
            w = ext_s[pl.ds(r8, wr), :]
            idx = r8 * LANES + rows_iota * LANES + lane_iota
            valid = (idx >= a) & (idx < a + md) & (chunk_start + idx < n)
            wm = jnp.where(valid, w, _NEG)
            m = jnp.max(wm)
            q_rel = jnp.min(jnp.where(valid & (wm == m), idx, jnp.int32(2**30)))
            imp = m > v
            p1 = jnp.where(imp, chunk_start + q_rel, p)
            v1 = jnp.where(imp, m, v)

            # Forced append after a failed try (the `if i - last >
            # min_distance` branch, decode.rs:241-246) — possibly
            # several copies on long dropouts.
            doap = jnp.logical_not(imp)
            i0 = jnp.maximum(p1 + md + 1, spr * (k + 1))
            fin = doap & (i0 >= n)
            live = doap & jnp.logical_not(fin)
            appended = jnp.where(live, i0 // spr - k, 0)

            cur = peaks_out[...]
            cur = jnp.where(imp & (pidx == k - 1), p1, cur)
            cur = jnp.where((pidx >= k) & (pidx < k + appended), i0, cur)
            peaks_out[...] = cur

            k1 = k + appended
            p2 = jnp.where(live, i0, p1)
            # corr[i0] (i0 < n) is only readable when i0 falls in this
            # chunk's span; otherwise defer the load to its owner.
            local = live & (i0 < chunk_end)
            off = jnp.where(local, i0 - chunk_start, 0)
            v2 = jnp.where(local, read_at(off), v1)
            pend = (live & jnp.logical_not(local)).astype(jnp.int32)
            return p2, v2, k1, fin, pend

        st = (sti[0], stf[0], sti[1], sti[2] != 0, sti[3])
        p, v, k, done, pending = jax.lax.while_loop(cond, body, st)
        sti[0] = p
        sti[1] = k
        sti[2] = done.astype(jnp.int32)
        sti[3] = pending
        stf[0] = v
        k_out[b] = k

    scratch = [
        pltpu.VMEM((2 * br, LANES), jnp.float32),
        pltpu.SMEM((4,), jnp.int32),
        pltpu.SMEM((1,), jnp.float32),
    ]

    if batch is None:
        def fn(corr2: jnp.ndarray, n_valid):
            nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
            peaks, k = pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((br, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((br, LANES), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((pr, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((pr, LANES), jnp.int32),
                    jax.ShapeDtypeStruct((1,), jnp.int32),
                ),
                scratch_shapes=scratch,
                interpret=interpret,
            )(nv, corr2, corr2)
            return peaks.reshape(-1), k[0]
    else:
        def fn(corr3: jnp.ndarray, n_valid):
            nv = jnp.asarray(n_valid, jnp.int32).reshape(batch)
            peaks, k = pl.pallas_call(
                kernel,
                grid=(batch, n_blocks),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(
                        (None, br, LANES), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (None, br, LANES), lambda b, i: (b, i + 1, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=(
                    pl.BlockSpec(
                        (None, pr, LANES), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((batch, pr, LANES), jnp.int32),
                    jax.ShapeDtypeStruct((batch,), jnp.int32),
                ),
                scratch_shapes=scratch,
                interpret=interpret,
            )(nv, corr3, corr3)
            return peaks.reshape(batch, -1), k

    _kernels[key] = fn
    return fn


def select_peaks(corr, n_valid, spr: int, md: int, max_peaks: int,
                 interpret: bool = False, block: int | None = None):
    """Traceable greedy selection over ``corr[:n_valid]``.

    Drop-in for ``sync._find_sync_peaks_device`` (same result tuple:
    int32 peak positions padded to ``max_peaks``, and the live count
    ``k``); ``n_valid`` is a traced scalar so one compilation serves a
    whole length bucket.  The only data movement added is a pad to
    whole 128-lane rows — validity is masked in-kernel.
    """
    L = int(corr.shape[0])
    if block is None:
        block = _pick_block(L, md)
    n_blocks = max(1, -(-L // block))
    # Pad so the last chunk's lookahead block exists in full: a block
    # whose start lies past the array end is an out-of-bounds DMA (it
    # crashes the TPU runtime; index-map clamping only covers blocks
    # that at least begin in bounds).  Zero fill — validity is masked
    # against n_valid in-kernel.
    pad = (n_blocks + 1) * block - L
    corr2 = jnp.pad(corr, (0, pad)).reshape(-1, LANES)
    fn = make_select_peaks(n_blocks, spr, md, max_peaks, block, interpret)
    peaks, k = fn(corr2, n_valid)
    return peaks[:max_peaks], k


def select_peaks_batch(corr, n_valid, spr: int, md: int, max_peaks: int,
                       interpret: bool = False, block: int | None = None):
    """Batched greedy selection: ``corr [B, L]`` + ``n_valid [B]`` ->
    ``(peaks [B, max_peaks], k [B])``, each row selected exactly like
    :func:`select_peaks` on that row (asserted in tests/test_pallas.py).
    One kernel launch scans the whole batch — the sequential grid walks
    (b, chunk) in order, re-seeding the greedy state per element — so
    the BATCHED fused decode graph (decode_render_input_batch, the
    BASELINE config-5 shape) gets the same VMEM-resident selector as
    per-pass dispatches instead of falling back to the vmapped XLA
    while_loop (gathers + both cond branches, measured 1.5x slower
    per pass)."""
    B, L = int(corr.shape[0]), int(corr.shape[1])
    if block is None:
        block = _pick_block(L, md)
    n_blocks = max(1, -(-L // block))
    pad = (n_blocks + 1) * block - L
    corr3 = jnp.pad(corr, ((0, 0), (0, pad))).reshape(B, -1, LANES)
    fn = make_select_peaks(n_blocks, spr, md, max_peaks, block, interpret, batch=B)
    peaks, k = fn(corr3, n_valid)
    return peaks[:, :max_peaks], k


@partial(jax.jit, static_argnums=(2, 3, 4))
def select_peaks_jit(corr, n_valid, spr: int, md: int, max_peaks: int):
    """Jitted entry for host callers (sync.find_sync_peaks_device)."""
    return select_peaks(corr, n_valid, spr, md, max_peaks)
