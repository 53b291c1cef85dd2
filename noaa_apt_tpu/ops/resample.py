"""L/M polyphase resampling as TPU-friendly convolutions.

Behavioral contract: reference ``src/dsp.rs`` —
``resample_with_filter`` (``dsp.rs:62-126``), ``fast_resampling``
(``dsp.rs:186-289``), ``decimate`` (``dsp.rs:294-307``) and ``filter``
(``dsp.rs:386-410``).

The reference's ``fast_resampling`` is a scalar loop that, for each
output sample ``k`` (at interpolated-axis position ``t = offset + k*m``),
accumulates ``coeff[j] * x[(t - offset + j)/l]`` over the ``j`` that are
congruent to ``p_k = (-k*m) mod l``.  That is exactly a polyphase
filter bank:

    y[k] = sum_i coeff[p_k + i*l] * x[x0_k + i],   x0_k = (k*m + p_k)//l

and outputs with the same ``k mod l`` share a phase and advance their
input window by exactly ``m`` samples.  Two TPU mappings are provided,
both bit-equivalent to the reference up to f32 summation order:

- **block matmul** (``l > 1``, ``m`` not tiny): reshape the input into
  ``m``-sample blocks and accumulate ``ceil(w/m)`` matmuls
  ``blocks[b : b+n] @ K_b`` with ``K_b`` the ``[m, l]`` slice of the
  packed-kernel matrix.  The product is ``[n_per_class, l]`` whose
  row-major flatten IS the phase-interleaved output — no transpose.
  This rides the MXU and avoids the ``[l, n]→[n, l]`` relayout that
  dominates the packed-kernel conv (measured 240 ms → 32 ms for the
  composed device ingest stage on a 10-min 48 kHz pass).
- **packed-kernel conv** (``l == 1`` or tiny ``m``): one
  ``lax.conv_general_dilated`` with ``l`` output features and window
  stride ``m``; each feature row holds one phase's taps shifted to its
  input offset.
- **gather-dot** (large ``l``): gather ``[out_len, T]`` input windows
  and contract against per-output phase rows of the bank — pure VPU
  work, avoids materializing mostly-zero packed kernels.

Zero-padding the input is semantically identical to the reference's
out-of-range skip (``dsp.rs:256-263`` treats missing samples as 0).
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_log = logging.getLogger(__name__)


@dataclass(frozen=True)
class ResamplePlan:
    """Static host-side description of one L/M resample.

    Built once per (signal_len, l, m, coeff) and closed over by the
    jitted compute path; everything here is a Python int / numpy array.
    """

    n_in: int
    l: int
    m: int
    out_len: int
    coeff: tuple  # filter taps as a hashable tuple of float32
    mode: str  # "conv" | "matmul" | "matmul_packed" | "gather"
    j_pack: int = 1  # windows per LHS row in "matmul_packed"

    @property
    def coeff_array(self) -> np.ndarray:
        return np.asarray(self.coeff, dtype=np.float32)

    @property
    def chunk_bit_stable(self) -> bool:
        """True when chunked/sharded evaluation of this plan is
        bit-identical to the full-length evaluation on the current
        backend.

        False only for the degraded case ADVICE r4 flagged: a matmul
        mode whose blocked-dot operands exceed the Pallas VMEM budget
        on TPU, where :func:`_blocked_dot` falls back to a batch-shape-
        sensitive einsum.  No standard (rate, profile) combination
        reaches that size; chunked consumers (parallel/shard.py,
        stream.py) check this instead of relying on the warning log."""
        import jax

        if jax.default_backend() != "tpu" or self.mode in ("conv", "gather"):
            return True
        if self.mode == "matmul":
            return _dot_vmem_ok(BLOCK_ROWS, self.m, self.l)
        # matmul_packed: reproduce _fast_resample_matmul_packed's K/N.
        _, s_c, _, t_taps, _ = _phase_tables(self)
        w = int(s_c.max()) + t_taps
        S = self.j_pack * self.m
        ov = -(-max(0, w - self.m) // 128) * 128
        return _dot_vmem_ok(BLOCK_ROWS, S + ov, self.j_pack * self.l)


def _ceil_to_mult(x: int, q: int) -> int:
    return -(-x // q) * q


# Rows per fixed-shape dot call in the matmul modes.  XLA's matmul
# K-reduction tiling depends on the M (row-count) dimension — measured
# on CPU: a [246, K] @ [K, N] product and a [27, K] @ [K, N] product of
# the same data disagree in the last ulp — so evaluating a chunk-sized
# and a full-length resample as single big dots is NOT bit-stable.
# Instead both paths run the dot as a batch of fixed [BLOCK_ROWS, K]
# blocks (batch count varies, inner shape never does).  Sharded chunks
# must start at block boundaries: see :func:`out_alignment`.
#
# Backend split (the batch axis must not leak into the dot's codegen):
# - CPU: a batched einsum — verified batch-count-independent and equal
#   to the standalone [B, K] @ [K, N] dot.
# - TPU: a Pallas kernel, grid over the batch axis.  XLA's batched dot
#   (and even lax.map, whose trip-count-1 case gets unrolled and fused
#   differently) is NOT batch-count stable on TPU; Mosaic compiles the
#   kernel body once per BLOCK shape, so per-block results are
#   grid-size-independent by construction.
#
# Size tradeoff: 64 rows keeps the MXU M-tile respectable, but it also
# multiplies out_alignment — sharded/streamed chunks recompute up to
# one whole block of left context (e.g. ~53k work samples at
# 48 kHz/standard, ~8 image rows).  That is <1 ms of device work per
# chunk and ~5% of a fleet-scale per-device chunk, paid for exact
# bit-equality; a smaller block would shrink the context at the cost
# of thin dots in the ingest hot path.
BLOCK_ROWS = 64


def _dot_vmem_ok(B: int, K: int, N: int) -> bool:
    """Whether a [B, K] x [K, N] block (f32 operands + output) fits the
    Pallas VMEM budget — the bit-stability predicate shared by
    :func:`_blocked_dot` and :attr:`ResamplePlan.chunk_bit_stable`."""
    return 4 * (B * K + K * N + B * N) <= 12 << 20


def dot_precision():
    """MXU precision for the resample dots.  Default HIGHEST (6-pass
    bf16 = full f32); ``NOAA_APT_INGEST_DOT=high`` selects the 3-pass
    mode (~2x MXU throughput, ~1e-6 relative noise — an engine-tuning
    experiment flag; the byte-exactness contracts are all relative to
    whatever precision the process runs, since every path shares this
    function)."""
    import os

    if os.environ.get("NOAA_APT_INGEST_DOT", "").lower() == "high":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


def _blocked_dot(lhs3: jnp.ndarray, rhs) -> jnp.ndarray:
    """[nb, B, K] x [K, N] -> [nb, B, N] f32 with per-block results
    independent of nb (see BLOCK_ROWS).  ``rhs`` may be a host array."""
    nb, B, K = lhs3.shape
    rhs = jnp.asarray(rhs, jnp.float32)
    N = rhs.shape[1]
    hi = dot_precision()
    # The kernel keeps rhs + one lhs block + one out block in VMEM
    # (~16 MB/core); exotic rate pairs with oversized kernels fall back
    # to the einsum (never hit by the standard profile/rate matrix).
    if jax.default_backend() == "tpu" and not _dot_vmem_ok(B, K, N):
        # The einsum fallback below is NOT batch-count stable on TPU,
        # so chunked (sharded/streamed) evaluation of such a rate pair
        # is only ulp-close to single-chip, not bit-identical.  No
        # standard (rate, profile) combination reaches this size
        # (_pack_factor caps the packed kernel; the plain-matmul mode
        # has K = m); warn loudly rather than silently downgrade the
        # bit-equality contract.
        _log.warning(
            "resample kernel %dx%d exceeds the Pallas VMEM budget; "
            "falling back to a batch-shape-sensitive dot — sharded/"
            "streamed decode of this rate pair is not bit-identical "
            "to single-chip on TPU", K, N,
        )
    if jax.default_backend() == "tpu" and _dot_vmem_ok(B, K, N):
        from jax.experimental import pallas as pl

        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(
                a_ref[0], b_ref[:], precision=hi,
                preferred_element_type=jnp.float32,
            )[None]

        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, B, K), lambda i: (i, 0, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, B, N), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, B, N), jnp.float32),
        )(lhs3, rhs)
    return jnp.einsum("rbk,kc->rbc", lhs3, rhs, precision=hi)


def _pack_factor(l: int, m: int, n_taps: int) -> int:
    """Windows per dot row for the packed matmul, or 1 when it does not
    apply.

    ``J`` is the smallest count with ``J*m ≡ 0 (mod 128)``: the input
    then reshapes to ``[*, J*m]`` rows as a pure view (lane dimension a
    multiple of 128 — no relayout), and one ``[n/J, K] @ [K, J*l]`` dot
    replaces ``ceil(w/m)`` thin ``[n, m] @ [m, l]`` products whose row
    streaming dominated (measured ~4x on a v5e for 48 kHz -> 12.48 kHz).
    Falls back (J=1 -> "matmul") when the packed kernel matrix would be
    oversized: J*l columns beyond ~1024 stop paying for themselves and
    its VMEM/HBM footprint grows as K * J*l.
    """
    if l <= 1 or m < 16:
        return 1
    j = 128 // math.gcd(m, 128)
    if j == 1 or j * l > 1024:
        return 1
    t_max = (n_taps - 1) // l + 1
    w_bound = m + t_max + 2
    k_bound = j * m + 128 + w_bound
    if k_bound * j * l * 4 > (48 << 20):
        return 1
    return j


def _mode_for(l: int, m: int, n_taps: int) -> tuple[str, int]:
    """(mode, j_pack) for an (l, m, taps) resample — shared by
    :func:`resample_plan` and :func:`out_alignment` so the sharded
    path's alignment always matches the mode actually compiled.

    Backend-dependent for the large-L regime (44100/22050 Hz inputs,
    l = 208/416): per-output gather-dot is the right shape on CPU
    (exact MAC count), but TPU has no hardware gather — measured
    2,170 ms/pass there vs ~1 ms for the 3-dot blocked matmul, which
    wastes ~300x MACs on a mostly-zero kernel yet rides the MXU.
    Both backends stay internally consistent (chunk alignment,
    batched/unbatched and sharded contracts all derive from this one
    function); CPU-minted goldens are unaffected."""
    t_max = (n_taps - 1 - 0) // l + 1  # taps per phase (upper bound)
    packed_w = m + t_max + 2
    if packed_w <= 512 or l <= 64:
        # Matmul needs l > 1 (l == 1 conv output is already flat) and a
        # block size big enough that the per-dot overhead amortizes.
        mode = "matmul" if l > 1 and m >= 16 else "conv"
        j_pack = 1
        if mode == "matmul":
            j_pack = _pack_factor(l, m, n_taps)
            if j_pack > 1:
                mode = "matmul_packed"
        return mode, j_pack
    if (
        jax.default_backend() == "tpu"
        and l > 1
        and m >= 16
        and _dot_vmem_ok(BLOCK_ROWS, m, l)
    ):
        return "matmul", 1
    return "gather", 1


def out_alignment(l: int, m: int, n_taps: int) -> int:
    """Output-index granularity at which resample results are
    position-independent: chunked evaluation (parallel/shard.py) must
    start chunks at multiples of this so every f32 accumulation matches
    the single-chip graph bit-for-bit.  For the matmul modes this is a
    whole dot block (BLOCK_ROWS rows), so chunk-local blocking
    coincides with the single-chip blocking."""
    if l <= 1:
        return 1
    mode, j_pack = _mode_for(l, m, n_taps)
    if mode == "matmul_packed":
        return BLOCK_ROWS * j_pack * l
    if mode == "matmul":
        return BLOCK_ROWS * l
    return l


def resample_plan(n_in: int, l: int, m: int, coeff: np.ndarray, out_len: int | None = None) -> ResamplePlan:
    """Compute output length and mapping mode (reference ``dsp.rs:203-234``).

    ``out_len`` overrides the derived length (used by the sharded path,
    where each device computes a phase-aligned window of outputs).
    """
    interpolated_len = n_in * l
    offset = (len(coeff) - 1) // 2
    if out_len is None:
        # The reference iterates t = offset, offset+m, ... while t < interpolated_len.
        out_len = max(0, -(-(interpolated_len - offset) // m)) if interpolated_len > offset else 0
    mode, j_pack = _mode_for(l, m, len(coeff))
    return ResamplePlan(
        n_in, l, m, out_len, tuple(np.asarray(coeff, np.float32).tolist()), mode, j_pack
    )


def _phase_tables(plan: ResamplePlan):
    """Per-phase tap bank and input offsets (host, cached via plan)."""
    coeff = plan.coeff_array
    K = coeff.shape[0]
    l, m = plan.l, plan.m
    offset = (K - 1) // 2
    jmax = 2 * offset  # last usable tap index (dsp.rs:254 `n <= t + offset`)
    t_taps = jmax // l + 1
    # Phase of output class c (= k mod l) and its first-output input offset.
    c = np.arange(l, dtype=np.int64)
    p_c = (-(c * m)) % l
    s_c = (c * m + p_c) // l
    # bank[p, i] = coeff[p + i*l], zero past jmax
    bank = np.zeros((l, t_taps), dtype=np.float32)
    for p in range(l):
        js = np.arange(p, jmax + 1, l)
        bank[p, : js.size] = coeff[js]
    return p_c, s_c, bank, t_taps, offset


def _fast_resample_conv(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    p_c, s_c, bank, t_taps, _ = _phase_tables(plan)
    l, m, out_len = plan.l, plan.m, plan.out_len
    n_per_class = -(-out_len // l)  # ceil

    w = int(s_c.max()) + t_taps
    rhs = np.zeros((l, 1, w), dtype=np.float32)
    for cc in range(l):
        rhs[cc, 0, s_c[cc] : s_c[cc] + t_taps] = bank[p_c[cc]]

    # Right-pad x so every window exists; zeros match the reference's
    # out-of-range skip.
    need = (n_per_class - 1) * m + w
    x = jnp.pad(x, (0, max(0, need - plan.n_in)))
    out = jax.lax.conv_general_dilated(
        x[None, None, :],
        jnp.asarray(rhs),
        window_strides=(m,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[0]
    # out[c, i] = y[c + i*l]  ->  interleave classes
    y = out[:, :n_per_class].T.reshape(-1)[:out_len]
    return y


def _fast_resample_matmul(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    """Phase-interleaved output via block matmuls on the MXU.

    Window ``i`` of every output class starts at input ``i*m``; class
    ``c``'s taps sit at fixed column offsets ``s_c[c]..s_c[c]+t_taps``
    inside the ``w``-wide window.  Splitting the window into
    ``nblk = ceil(w/m)`` blocks of ``m`` gives

        Y[i, c] = sum_b blocks[i+b] . K[b*m:(b+1)*m, c]

    and ``Y.reshape(-1)[k] = y[k]`` directly (``k = i*l + c``).  The
    tap→block split is position-independent, so sharded chunks and the
    single-chip path accumulate in the same order (bit-identical).
    """
    p_c, s_c, bank, t_taps, _ = _phase_tables(plan)
    l, m, out_len = plan.l, plan.m, plan.out_len
    n_per_class = -(-out_len // l)

    w = int(s_c.max()) + t_taps
    nblk = -(-w // m)
    km = np.zeros((nblk * m, l), dtype=np.float32)
    for cc in range(l):
        km[s_c[cc] : s_c[cc] + t_taps, cc] = bank[p_c[cc]]

    # Right-pad so every window exists (zeros = the reference's
    # out-of-range skip) and the length is a multiple of m.  Rows are
    # processed in fixed [BLOCK_ROWS, m] blocks (batched dot): the
    # inner dot shape never depends on the output length, so sharded
    # chunks (whose chunk starts are BLOCK_ROWS*l-output aligned, see
    # out_alignment) accumulate bit-identically to single-chip.
    B = BLOCK_ROWS
    nb = -(-n_per_class // B)
    need = (nb * B - 1 + nblk) * m
    pad_to = max(need, -(-plan.n_in // m) * m)
    x = jnp.pad(x, (0, pad_to - plan.n_in))
    blocks = x.reshape(-1, m)
    acc = None
    for b in range(nblk):
        seg = jax.lax.slice(blocks, (b, 0), (b + nb * B, m)).reshape(nb, B, m)
        part = _blocked_dot(seg, km[b * m : (b + 1) * m])
        acc = part if acc is None else acc + part
    return acc.reshape(-1)[:out_len]


def _fast_resample_matmul_packed(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    """One wide MXU dot: ``J`` windows per LHS row.

    With ``S = J*m ≡ 0 (mod 128)``, ``x.reshape(-1, S)`` is a pure view
    (no lane relayout — the relayout of the ``[*, m]`` reshape is what
    dominated the 3-dot form), the row overlap is a 128-aligned lane
    concat, and

        Y[r, j*l + c] = sum_u x[r*S + u] * km[u - j*m, c]

    so ``Y.reshape(-1)`` is again exactly the phase-interleaved output.
    Accumulation per output is one dot over its ``K``-window (XLA's
    fixed K-tiling order) — position-independent across rows, so
    chunked/sharded evaluation stays bit-identical to single-chip when
    chunks start at multiples of ``J*l`` outputs (see
    :func:`out_alignment`; parallel/shard.py aligns to it).
    """
    p_c, s_c, bank, t_taps, _ = _phase_tables(plan)
    l, m, out_len, J = plan.l, plan.m, plan.out_len, plan.j_pack
    w = int(s_c.max()) + t_taps
    S = J * m
    n_per_class = -(-out_len // l)
    n_r = -(-n_per_class // J)

    nblk = -(-w // m)
    km = np.zeros((nblk * m, l), dtype=np.float32)
    for cc in range(l):
        km[s_c[cc] : s_c[cc] + t_taps, cc] = bank[p_c[cc]]

    ov = -(-max(0, w - m) // 128) * 128  # 128-aligned row overlap
    K = S + ov
    rhs = np.zeros((K, J * l), dtype=np.float32)
    for j in range(J):
        rows = min(nblk * m, K - j * m)
        rhs[j * m : j * m + rows, j * l : (j + 1) * l] = km[:rows]

    # Fixed-shape blocked dot (see BLOCK_ROWS): [nb, B, K] x [K, J*l]
    # as ONE batched einsum — batch count varies with length, the
    # per-block dot never does, keeping chunked evaluation bit-equal.
    B = BLOCK_ROWS
    nb = -(-n_r // B)
    pad_to = (nb * B + (1 if ov else 0)) * S
    pad_to = max(pad_to, _ceil_to_mult(plan.n_in, S))
    x = jnp.pad(x, (0, pad_to - plan.n_in))
    a = x.reshape(-1, S)
    n_rows = nb * B
    lhs = (
        jnp.concatenate([a[:n_rows], a[1 : n_rows + 1, :ov]], axis=1)
        if ov
        else a[:n_rows]
    )
    y = _blocked_dot(lhs.reshape(nb, B, S + ov), rhs)
    return y.reshape(-1)[:out_len]


def _fast_resample_gather(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    p_c, s_c, bank, t_taps, _ = _phase_tables(plan)
    l, m, out_len = plan.l, plan.m, plan.out_len
    n = plan.n_in

    # Decompose k = c + i*l to stay inside int32: the phase p and input
    # offset x0 of output k are  p = p_c[c],  x0 = s_c[c] + i*m  (i*m is
    # bounded by the input length, so no 64-bit products are needed).
    k = jnp.arange(out_len, dtype=jnp.int32)
    c = k % l
    i = k // l
    p_k = jnp.asarray(p_c.astype(np.int32))[c]
    x0 = jnp.asarray(s_c.astype(np.int32))[c] + i * m
    idx = x0[:, None] + jnp.arange(t_taps, dtype=jnp.int32)[None, :]
    valid = idx < n
    xw = jnp.where(valid, x[jnp.clip(idx, 0, n - 1)], 0.0)
    rows = jnp.asarray(bank)[p_k]
    return jnp.einsum("kt,kt->k", xw, rows, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnums=1)
def fast_resample(x: jnp.ndarray, plan: ResamplePlan) -> jnp.ndarray:
    """Resample ``x`` by ``plan.l / plan.m`` with the planned filter.

    Exact output-sample mapping of reference ``fast_resampling``
    (``dsp.rs:186-289``); f32 accumulation order differs (tree reduction
    on TPU vs sequential in the reference).
    """
    if plan.out_len == 0:
        return jnp.zeros((0,), dtype=x.dtype)
    if plan.mode == "matmul_packed":
        return _fast_resample_matmul_packed(x, plan)
    if plan.mode == "matmul":
        return _fast_resample_matmul(x, plan)
    if plan.mode == "conv":
        return _fast_resample_conv(x, plan)
    return _fast_resample_gather(x, plan)


@jax.jit
def causal_filter(x: jnp.ndarray, coeff) -> jnp.ndarray:
    """The reference's streaming FIR ``dsp::filter`` (``dsp.rs:386-410``).

    ``y[i] = sum_{j < i} coeff[j] * x[i-j]`` — note the strict ``i > j``
    guard: the ``x[0]`` sample never contributes, and ``y[0] = 0``.
    Implemented as a causal correlation with the ``x[0]`` contribution
    subtracted from the first ``K`` outputs.
    """
    coeff = jnp.asarray(coeff, jnp.float32)
    k = coeff.shape[0]
    # Explicit zero padding (not conv implicit padding): XLA may group
    # partially-overlapping edge windows differently from full windows,
    # and the sharded decoder recomputes these edge outputs from
    # explicit halo zeros — full-window dot products keep single-chip
    # and sharded bit-identical.
    xp = jnp.concatenate([jnp.zeros((k - 1,), x.dtype), x])
    y = jax.lax.conv_general_dilated(
        xp[None, None, :],
        coeff[::-1][None, None, :],
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    # Remove the j == i term: coeff[i] * x[0] for i < K.
    n = x.shape[0]
    kk = min(k, n)
    y = y.at[:kk].add(-coeff[:kk] * x[0])
    # y[0] is exactly 0 by the i > j guard; force it in case the conv's
    # fma ordering leaves cancellation residue.
    return y.at[0].set(0.0)


@partial(jax.jit, static_argnums=1)
def decimate(x: jnp.ndarray, m: int) -> jnp.ndarray:
    """Keep every m-th sample (reference ``dsp.rs:294-307``)."""
    n_out = x.shape[0] // m
    return x[: n_out * m : m]


@partial(jax.jit, static_argnums=1)
def expanded_filtered(x: jnp.ndarray, l: int, coeff: np.ndarray) -> jnp.ndarray:
    """Debug-only: the zero-stuffed, filtered signal at the interpolated
    rate (what ``--export-resample-filtered`` dumps, ``dsp.rs:265-273``).

    ``ef[t] = sum_j coeff[j] * up[t - offset + j]`` for
    ``t in [offset, n*l)`` — the same windows the resampler evaluates,
    at stride 1 instead of m, preceded by ``offset`` leading outputs the
    reference never emits (it starts at ``t = offset``).
    """
    coeff = jnp.asarray(coeff, jnp.float32)
    k = coeff.shape[0]
    offset = (k - 1) // 2
    n_interp = x.shape[0] * l
    out = jax.lax.conv_general_dilated(
        x[None, None, :],
        coeff[None, None, :],
        window_strides=(1,),
        padding=[(0, offset + (k - 1) + l)],
        lhs_dilation=(l,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    return out[: max(0, n_interp - offset)]
