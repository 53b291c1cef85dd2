"""On-hardware conformance sweep for the TPU-specific fast paths.

The pytest suite runs on the CPU backend (conftest), where the Pallas
kernels execute in interpreter mode and the banded-MXU chain lowers to
ordinary dots — so TPU-only behavior (VMEM blocking, SMEM carries, MXU
tiling, the non-IEEE f32 divide) is exercised only here.  Run this on
a real chip after touching anything under ``ops/`` or
``graph/decode.py``:

    python tools/tpu_conformance.py          # full sweep (~10 min cold)
    python tools/tpu_conformance.py --quick   # one profile/rate

Checks, per (profile, input rate):
  1. Banded-MXU chain vs the portable op chain: identical greedy sync
     peaks, filtered signal within f32 reorder noise.
  2. Pallas chain kernel vs banded: identical peaks.
  3. Pallas greedy selector vs the XLA while_loop selector vs host
     NumPy, element-identical peak lists.
  4. Fused single-dispatch render vs decode()+render_u8(): byte-equal
     u8 image, identical peaks (percent and telemetry contrast).
  5. Batched fused render vs unbatched: byte-equal per element.

Exit code 0 = all conform; any mismatch raises with the failing
combination in the message.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(f"[conformance] {msg}", flush=True)


def check_combo(profile, rate_hz: int, n_rows: int) -> None:
    import jax.numpy as jnp

    from noaa_apt_tpu.core.frequency import Rate
    from noaa_apt_tpu.graph.decode import Decoder, pad_bucket
    from noaa_apt_tpu.ops import sync as sy
    from noaa_apt_tpu.synth import synth_recording

    rate = Rate(rate_hz)
    signal, _ = synth_recording(n_rows=n_rows, sample_rate=rate_hz, noise_db=14.0)
    tag = f"{profile.name}/{rate_hz}Hz"

    import jax

    on_tpu = jax.default_backend() == "tpu"

    # -- 1+2: three chain implementations agree on peaks --------------
    decs = {
        "banded": Decoder(profile),
        "opchain": Decoder(profile, use_pallas=False),
    }
    if on_tpu:  # the Pallas chain only compiles on TPU
        decs["pallas"] = Decoder(profile)
        decs["pallas"].chain_impl = "pallas"
    results, filt = {}, {}
    for name, dec in decs.items():
        res = dec.decode(signal, rate, sync=True)
        results[name] = res
        filt[name] = res.image_np()
    for name in [k for k in decs if k != "banded"]:
        assert results["banded"].sync_positions == results[name].sync_positions, (
            f"{tag}: sync peaks differ banded vs {name}"
        )
        a, b = filt["banded"], filt[name]
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9)
        assert rel < 2e-3, f"{tag}: filtered rows diverge vs {name}: rel={rel:.2e}"
    log(f"{tag}: chain implementations agree ({len(results['banded'].sync_positions)} peaks)")

    # -- 3: selector backends ------------------------------------------
    dec = decs["banded"]
    n_pad = pad_bucket(len(signal))
    x = np.zeros(n_pad, np.float32)
    x[: len(signal)] = signal
    stage1, work_len_fn, guard = dec._get_stage1(n_pad, rate, True)
    f_dev, corr_dev = stage1(jnp.asarray(x))
    n_valid = max(0, work_len_fn(len(signal)) - guard)

    host_peaks = sy.find_sync_peaks(np.asarray(corr_dev[:n_valid]), dec.work_rate)
    # All three device legs are invoked EXPLICITLY: on TPU,
    # find_sync_peaks_device dispatches to the Pallas kernel, so going
    # through it would compare the Pallas selector against itself and
    # never exercise the XLA while_loop on hardware.
    spr, md, max_peaks = sy.selector_params(int(corr_dev.shape[0]), dec.work_rate)
    peaks_w, k_w = sy._find_sync_peaks_device(corr_dev, np.int32(n_valid), spr, md, max_peaks)
    wl_peaks = np.asarray(peaks_w)[: int(k_w)].tolist()
    assert wl_peaks == host_peaks, f"{tag}: device while_loop selector != host scan"

    from noaa_apt_tpu.ops.pallas_select import select_peaks

    peaks_p, k_p = select_peaks(
        corr_dev, np.int32(n_valid), spr, md, max_peaks,
        interpret=not on_tpu,
    )
    pallas_peaks = np.asarray(peaks_p)[: int(k_p)].tolist()
    assert pallas_peaks == host_peaks, f"{tag}: Pallas selector != host scan"
    log(f"{tag}: 3 selector backends identical")

    # -- 4: fused render vs two-step ------------------------------------
    res = results["banded"]
    want = dec.render_u8(res, "percent", 0.98)
    gray, sync_pos = dec.decode_render_input(signal, len(signal), rate, "percent", 0.98)
    assert sync_pos == res.sync_positions, f"{tag}: fused peaks != two-step"
    np.testing.assert_array_equal(gray, want, err_msg=f"{tag}: fused u8 != two-step")
    if n_rows >= 208:
        from noaa_apt_tpu.post.telemetry import telemetry_from_stats

        ma, mb, var = dec.telemetry_stats(res)
        tel = telemetry_from_stats(ma, mb, var)
        want_t = dec.render_u8_levels(
            res, tel.get_wedge_value(9, None), tel.get_wedge_value(8, None)
        )
        gray_t, sync_t = dec.decode_render_input(
            signal, len(signal), rate, "telemetry"
        )
        assert sync_t == res.sync_positions
        np.testing.assert_array_equal(gray_t, want_t, err_msg=f"{tag}: fused telemetry != two-step")
        log(f"{tag}: fused render byte-equal (percent + telemetry)")
    else:
        log(f"{tag}: fused render byte-equal (percent)")

    # -- 5: batched fused vs unbatched ----------------------------------
    # Byte-equal on CPU; on TPU the batched MXU tiling accumulates f32
    # sums in a different order, so integer decisions must still be
    # identical but a u8 pixel on the floor(v+0.5) knife edge may move
    # 1 LSB (measured ~1 per 10^6 pixels).
    sigs = [signal, signal[: len(signal) * 3 // 4]]
    trues = [len(s) for s in sigs]
    outs = dec.decode_render_input_batch(sigs, trues, rate, "percent", 0.98)
    for s, nt, out in zip(sigs, trues, outs):
        w_gray, w_sync = dec.decode_render_input(s, nt, rate, "percent", 0.98)
        assert out[1] == w_sync, f"{tag}: batched peaks != unbatched"
        if on_tpu:
            d = np.abs(out[0].astype(np.int16) - w_gray.astype(np.int16))
            n_knife = int((d > 0).sum())
            assert d.max() <= 1 and n_knife <= max(4, w_gray.size // 100_000), (
                f"{tag}: batched u8 deviates beyond knife-edge tolerance: "
                f"{n_knife} pixels, max {d.max()}"
            )
        else:
            np.testing.assert_array_equal(
                out[0], w_gray, err_msg=f"{tag}: batched u8 != unbatched"
            )
    log(f"{tag}: batched fused matches per element"
        + (" (<=1 LSB knife-edge tolerance)" if on_tpu else " byte-exact"))

    # -- 6: packed-codec (host16c) fused render vs plain host16 --------
    # The in-graph codec decoder must reconstruct the bit-identical
    # i16 work signal ON THIS BACKEND (gather-free static unpack +
    # scan + escape scatter), making the u8 output byte-equal.
    from noaa_apt_tpu.graph.decode import PackedWorkPayload

    sig16 = np.clip(
        np.round(signal / np.abs(signal).max() * 32767), -32768, 32767
    ).astype(np.int16)
    dec16 = Decoder(profile, ingest="host16")
    decc = Decoder(profile, ingest="host16c")
    w16 = dec16.prepare_work(sig16, rate, to_device=True)
    wc = decc.prepare_work(sig16, rate, to_device=True)
    if isinstance(wc, PackedWorkPayload):
        g16, s16 = dec16.decode_render(w16, "percent", 0.98)
        gc, sc = decc.decode_render(wc, "percent", 0.98)
        assert sc == s16, f"{tag}: packed-codec sync peaks != host16"
        np.testing.assert_array_equal(
            gc, g16, err_msg=f"{tag}: packed-codec u8 != host16"
        )
        log(f"{tag}: host16c packed render byte-equal to host16")
    else:
        # The synth noise level can sit past the codec's decline
        # threshold for some (profile, rate) combos — that fallback is
        # itself contract behavior, but note it.
        log(f"{tag}: host16c declined (incompressible at this noise); "
            "plain-i16 fallback exercised")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="one profile/rate only")
    args = ap.parse_args()

    import jax

    cache = Path(__file__).resolve().parent.parent / ".jax_cache"
    try:
        cache.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log(f"backend: {jax.default_backend()} ({jax.devices()[0].device_kind})")
    if jax.default_backend() != "tpu":
        log("WARNING: not a TPU — this sweep only proves the portable paths")

    from noaa_apt_tpu.core.profiles import FAST, SLOW, STANDARD

    combos = [(STANDARD, 11025, 208)]
    if not args.quick:
        combos += [(STANDARD, 48000, 208), (FAST, 48000, 48), (SLOW, 11025, 48)]
    t0 = time.time()
    for profile, rate_hz, n_rows in combos:
        check_combo(profile, rate_hz, n_rows)
    log(f"ALL CONFORM ({len(combos)} combos, {time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
