"""On-hardware numeric-parity canaries (VERDICT r2 item 5).

The default suite runs on the CPU backend, where the bit-parity hacks
in the hot path (the anti-FMA opaque predicate in ``_seq_mul_add``,
the deterministic Newton sqrt) are exercised but the TPU compiler is
not.  A JAX/XLA upgrade could silently start contracting through the
opaque predicate or re-approximating sqrt per fusion context — these
tests fail loudly when that happens.  Run on the bench environment:

    NOAA_APT_TPU_TESTS=1 python -m pytest tests/ -m tpu_conformance -q

Each test self-skips off-TPU, so the default CPU suite stays green.
The full sweep (``tools/tpu_conformance.py``) remains the deep check;
``test_conformance_quick`` runs its first combo as part of this marker.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu_conformance

_ON_TPU = jax.default_backend() == "tpu"
_skip_off_tpu = pytest.mark.skipif(
    not _ON_TPU, reason="numeric-parity canary is meaningful only on the TPU backend"
)

# f32 triples where a*b+c differs between FMA (one rounding) and the
# reference's two-rounding order — found by exhaustive search; if the
# backend contracts the multiply-add, the two-rounding expectation fails.
_FMA_SENSITIVE = [
    (-0.96694475, 0.6265405, 0.82551116),
    (0.21327156, 0.4589931, 0.08724998),
    (-0.75143343, 0.34124884, 0.29437903),
]


@_skip_off_tpu
def test_seq_mul_add_two_rounding_survives_jit():
    """_seq_mul_add must round the product to f32 BEFORE the add on the
    real backend (misc.rs:170-173 percent-level parity contract).  The
    opaque runtime predicate is the only thing stopping XLA from FMA-
    contracting; this canary catches a compiler upgrade defeating it."""
    from noaa_apt_tpu.graph.decode import _seq_mul_add

    @jax.jit
    def f(a, b, c, opaque):
        return _seq_mul_add(a, b, c, opaque)

    for a, b, c in _FMA_SENSITIVE:
        a32, b32, c32 = np.float32(a), np.float32(b), np.float32(c)
        want = np.float32(np.float32(a32 * b32) + c32)  # two roundings
        fused = np.float32(float(a32) * float(b32) + float(c32))  # ~FMA
        assert want != fused, "canary triple lost its sensitivity"
        got = np.float32(f(a32, b32, c32, jnp.int32(1)))
        assert got == want, (
            f"_seq_mul_add was FMA-contracted on {jax.default_backend()}: "
            f"got {got!r}, want two-rounded {want!r} (fused would be {fused!r})"
        )


@_skip_off_tpu
def test_det_sqrt_context_independent():
    """The deterministic Newton sqrt must produce identical bits in
    every compilation context (direct jit, scan body, vmap lane) — the
    property that makes sharded vs single-chip decode bit-equal."""
    from noaa_apt_tpu.ops.demod import _det_sqrt

    x = np.abs(np.random.default_rng(3).random(4096, np.float32)) * 1e3 + 1e-5
    xj = jnp.asarray(x)

    direct = np.asarray(jax.jit(_det_sqrt)(xj))

    @jax.jit
    def via_scan(v):
        def body(c, row):
            return c, _det_sqrt(row)

        _, out = jax.lax.scan(body, jnp.float32(0.0), v.reshape(8, -1))
        return out.reshape(-1)

    @jax.jit
    def via_vmap(v):
        return jax.vmap(_det_sqrt)(v.reshape(8, -1)).reshape(-1)

    np.testing.assert_array_equal(direct, np.asarray(via_scan(xj)))
    np.testing.assert_array_equal(direct, np.asarray(via_vmap(xj)))
    # And the value is a real sqrt (within the documented ~2 ulp).
    np.testing.assert_allclose(direct, np.sqrt(x), rtol=3e-7)


@_skip_off_tpu
def test_demod_chain_matches_host_reference():
    """The full demod body (barriers + Newton sqrt + reciprocal) on the
    TPU must match the portable CPU-path expectation exactly — the
    cross-backend bit-equality the streaming/sharded tests rely on."""
    from noaa_apt_tpu.core.frequency import Freq, Rate
    from noaa_apt_tpu.ops.demod import demod_body, demod_constants

    rate = Rate(12480)
    carrier = Freq.hz(2400.0, rate)
    cosphi2, sinphi = demod_constants(carrier)
    rng = np.random.default_rng(11)
    sig = (rng.random(8192, np.float32) * 2 - 1).astype(np.float32)

    got = np.asarray(
        jax.jit(lambda p, c: demod_body(p, c, cosphi2, sinphi))(sig[:-1], sig[1:])
    )
    # Host reference: the same op sequence in NumPy f32 (one rounding
    # per op, Newton sqrt replicated).
    p2 = sig[:-1] * sig[:-1]
    c2 = sig[1:] * sig[1:]
    pc = sig[:-1] * sig[1:]
    body = np.maximum((p2 + c2) - pc * cosphi2, np.float32(0.0))
    i = body.view(np.int32)
    y = (np.int32(0x5F3759DF) - (i >> 1)).view(np.float32)
    hx = np.float32(0.5) * body
    for _ in range(3):
        v = hx * y * y
        y = y * (np.float32(1.5) - v)
    want = (body * y) * np.float32(np.float32(1.0) / sinphi)
    np.testing.assert_array_equal(got, want)


@_skip_off_tpu
def test_conformance_quick():
    """First combo of the full sweep: chain impls, selector backends,
    fused render, batched-vs-unbatched (tools/tpu_conformance.py)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tpu_conformance",
        Path(__file__).resolve().parent.parent / "tools" / "tpu_conformance.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from noaa_apt_tpu.core.profiles import STANDARD

    mod.check_combo(STANDARD, 11025, 208)


@_skip_off_tpu
def test_batched_selector_matches_unbatched_on_tpu():
    """The compiled (non-interpret) batched Pallas selector must pick
    the same peaks as the unbatched kernel and the host scan on real
    hardware — the Mosaic lowering of the (batch, chunk) grid and the
    per-element SMEM re-seed are exactly what interpreter mode cannot
    prove."""
    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.ops.pallas_select import select_peaks_batch, select_peaks_jit
    from noaa_apt_tpu.ops.sync import find_sync_peaks

    wr = Rate(4160)
    spr = 2080
    md = spr * 8 // 10
    rng = np.random.default_rng(7)
    B, n = 4, 120_000
    corr = rng.standard_normal((B, n)).astype(np.float32)
    corr[1, 20_000:70_000] = -100.0  # dropout: forced appends
    corr[2, 0] = 50.0  # i=0 replacement
    n_valids = np.array([n, n - 777, n - spr, 5 * spr + 3], np.int32)
    max_peaks = max(16, n // spr + 16)

    fn = jax.jit(
        lambda c, nv: select_peaks_batch(c, nv, spr, md, max_peaks),
    )
    pb, kb = jax.device_get(fn(jnp.asarray(corr), jnp.asarray(n_valids)))
    for b in range(B):
        want = find_sync_peaks(corr[b, : int(n_valids[b])], wr)
        assert pb[b, : int(kb[b])].tolist() == want, f"row {b}"
        pu, ku = jax.device_get(
            select_peaks_jit(jnp.asarray(corr[b]), int(n_valids[b]), spr, md, max_peaks)
        )
        assert pu[: int(ku)].tolist() == want, f"row {b} unbatched"


@_skip_off_tpu
def test_blocked_resample_matmul_batch_count_stable():
    """The matmul resample modes run as batches of fixed [BLOCK_ROWS, K]
    dot blocks; sharded chunks and the full-length graph differ only in
    the batch count.  On TPU that batch axis is a Pallas grid
    (ops/resample.py:_blocked_dot) because XLA's batched dot — and even
    lax.map, whose trip-count-1 case gets unrolled — is NOT batch-count
    stable (measured).  This canary asserts the property the
    sharded-equals-single-chip contract rests on, including the nb=1
    edge that broke the XLA forms."""
    from noaa_apt_tpu.ops.resample import BLOCK_ROWS, _blocked_dot

    rng = np.random.default_rng(0)
    K, N, B = 3328, 416, BLOCK_ROWS
    A = jnp.asarray(rng.standard_normal((12, B, K)).astype(np.float32))
    Bm = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    f = jax.jit(_blocked_dot)
    y_full = np.asarray(f(A, Bm))
    y_sub = np.asarray(f(A[:5], Bm))
    np.testing.assert_array_equal(y_full[:5], y_sub)
    y_one = np.asarray(f(A[7:8], Bm))
    np.testing.assert_array_equal(y_full[7:8], y_one)
