"""Per-stage engine timing on real hardware (VERDICT r4/r5 item 5).

Times each sub-graph of the fused decode engine inside a lax.scan over
8 resident recordings (the per-dispatch tunnel RPC would otherwise
floor every number at ~25 ms), so the per-pass cost attribution is
pure device time:

    ingest   : 48 kHz polyphase -> work f32 (packed MXU matmul)
    chain    : AM demod -> post-FIR -> sync correlation (banded MXU)
    selector : greedy sync peaks (Pallas VMEM/SMEM kernel)
    tail     : row gather -> percent levels -> u8 map

Run on TPU:  python tools/engine_profile.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from noaa_apt_tpu.io.jaxcache import enable_persistent_compile_cache, warm_link_async

    enable_persistent_compile_cache(Path(__file__).resolve().parent.parent / ".jax_cache")
    warm_link_async()
    import jax
    import jax.numpy as jnp

    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder, pad_bucket

    print("backend:", jax.default_backend(), flush=True)
    sig = np.load(Path(__file__).resolve().parent.parent / ".bench_input.npy")
    rate = Rate(48000)
    dec = Decoder(STANDARD, ingest="device")
    n_pad = pad_bucket(len(sig))
    xin = np.zeros(n_pad, np.int16)
    xin[: len(sig)] = sig
    K = 8
    xs = jax.device_put(jnp.stack([jnp.roll(jnp.asarray(xin), i * 1009) for i in range(K)]))

    # Build the pieces the fused graph composes.
    from noaa_apt_tpu.graph import decode as D
    from noaa_apt_tpu.ops import demod as dm
    from noaa_apt_tpu.ops import resample as rs
    from noaa_apt_tpu.ops import sync as sy

    filt = dec._ingest_filter(rate)
    res_fn, work_len_fn, _ = D._plan_resample_with_filter(n_pad, rate, dec.work_rate, filt)
    w_pad = work_len_fn(n_pad)
    carrier, demod_coeff, template = dec._chain_params()
    fused_chain = dec._make_chain_fused(w_pad)
    tail = dec._fused_tail(w_pad, "percent", 0.98, batch=False)
    work_true = np.int32(work_len_fn(len(sig)))

    def scan_time(label, body, xs_in, n=4):
        @jax.jit
        def run(xs_v):
            def step(c, x):
                return c + body(x), None
            tot, _ = jax.lax.scan(step, jnp.float32(0), xs_v)
            return tot

        float(run(xs_in))  # compile
        ts = []
        for _ in range(n):
            t0 = time.time()
            float(run(xs_in))
            ts.append(time.time() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"{label:28s}: {med / K * 1e3:6.2f} ms/pass  (runs {[round(t*1e3) for t in ts]} ms)",
              flush=True)
        return med / K

    # Full pipeline (reference point = bench compute_scan).
    step_full, _ = dec._get_fused_render_input(n_pad, rate, "percent", 0.98, np.int16)
    t_full = scan_time(
        "full fused graph",
        lambda x: jnp.sum(step_full(x, work_true)[0].astype(jnp.int32)).astype(jnp.float32),
        xs,
    )

    # Stage pieces.
    t_ing = scan_time(
        "ingest resample only",
        lambda x: jnp.sum(res_fn(x.astype(jnp.float32))[:8]).astype(jnp.float32),
        xs,
    )

    # Resident work signals for chain/tail isolation.
    @jax.jit
    def mk_work(x):
        return res_fn(x.astype(jnp.float32))

    ws = jax.device_put(jnp.stack([mk_work(xs[i]) for i in range(K)]))

    def chain_body(y):
        f, corr = fused_chain(y)
        return (jnp.sum(f[:8]) + jnp.sum(corr[:8])).astype(jnp.float32)

    t_chain = scan_time("chain (demod+FIR+corr)", chain_body, ws)

    @jax.jit
    def mk_fc(y):
        return fused_chain(y)

    fs = jax.device_put(jnp.stack([mk_fc(ws[i])[0] for i in range(K)]))
    cs = jax.device_put(jnp.stack([mk_fc(ws[i])[1] for i in range(K)]))

    def tail_body(fc):
        f, corr = fc
        u8, n_rows, peaks, k = tail(f, corr, work_true)
        return (jnp.sum(u8[:4, :4].astype(jnp.int32)) + k).astype(jnp.float32)

    t_tail = scan_time("tail (select+gather+u8)", tail_body, (fs, cs))

    print(f"\nsum of pieces: {(t_ing + t_chain + t_tail) * 1e3:.2f} ms/pass "
          f"vs full {t_full * 1e3:.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
