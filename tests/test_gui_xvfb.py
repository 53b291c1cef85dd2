"""Real-display GUI smoke test.

Runs ``gui/app.py`` against an actual X server (CI provides one with
``xvfb-run``; skipped when no display is usable): build the real Tk
window, load a synthesized WAV through the real widgets, click
Decode -> Process -> Save via the real Tk buttons, and assert the PNG.
This exercises the widget wiring (``_bind_var``/``_combo``/button
commands) end-to-end — regressions there pass the fake-toolkit tests
in test_gui_app.py but fail here.  Reference anchor: gui/gui.rs:48-141.
"""

import os
import time

import numpy as np
import pytest


def _display_usable() -> bool:
    try:
        import tkinter as tk

        root = tk.Tk()
        root.destroy()
        return True
    except Exception:  # noqa: BLE001 — no display / no Tcl
        return False


_usable = _display_usable()
if not _usable and os.environ.get("NOAA_APT_REQUIRE_DISPLAY"):
    # CI sets this so a broken Xvfb/tkinter setup FAILS the job
    # instead of green-skipping the whole point of the job.
    raise RuntimeError(
        "NOAA_APT_REQUIRE_DISPLAY is set but tkinter cannot open a "
        "display — Xvfb or the interpreter's _tkinter is broken"
    )

requires_display = pytest.mark.skipif(
    not _usable,
    reason="no usable X display (run under xvfb-run)",
)


def _pump_until(app, cond, timeout=180.0, what=""):
    """Drive the Tk event loop (mainloop stand-in) until cond()."""
    t0 = time.time()
    while not cond():
        app.root.update()
        time.sleep(0.01)
        if time.time() - t0 > timeout:
            pytest.fail(f"timed out waiting for {what}")


@requires_display
def test_gui_decode_process_save(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    monkeypatch.setenv("NOAA_APT_RES_DIR", str(tmp_path / "res"))

    from noaa_apt_tpu.gui.app import App
    from noaa_apt_tpu.io import config as cfg
    from noaa_apt_tpu.io import wav
    from noaa_apt_tpu.synth import synth_recording

    sig, _ = synth_recording(n_rows=16, sample_rate=11025, noise_db=18.0)
    wav_path = tmp_path / "gui_in.wav"
    wav.write_wav(wav_path, sig, wav.WavSpec(1, 11025, 16, "int"))
    out_path = tmp_path / "gui_out.png"

    de = cfg.load_de_settings()
    settings = cfg.build_settings(de, None, False, False)
    app = App(check_updates=False, settings=settings)
    w = app.widgets
    try:
        # Type the input path into the real Entry (its StringVar trace
        # fires the Value change callbacks) and click the real button.
        w.dec_input_chooser.set(str(wav_path))
        assert w.dec_input_chooser.get() == str(wav_path)
        assert str(app.btn_decode["state"]) == "normal"
        app.btn_decode.invoke()
        _pump_until(
            app,
            lambda: str(app.btn_process["state"]) == "normal",
            what="decode to finish (Process button enabled)",
        )

        app.btn_process.invoke()
        _pump_until(
            app,
            lambda: str(app.btn_save["state"]) == "normal",
            what="process to finish (Save button enabled)",
        )
        # The preview label must now hold a real PhotoImage.
        _pump_until(app, lambda: app._photo is not None, what="preview render")
        assert app._photo.width() > 0

        w.sav_output_entry.set(str(out_path))
        app.btn_save.invoke()
        _pump_until(app, lambda: out_path.exists(), what="PNG save")
        # One more pump round so the save worker's idle callbacks land.
        for _ in range(10):
            app.root.update()
            time.sleep(0.01)
    finally:
        app.root.destroy()

    from PIL import Image

    img = np.asarray(Image.open(out_path))
    assert img.shape[1] == 2080
    assert img.shape[0] >= 10
