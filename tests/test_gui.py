"""GUI logic-layer tests, headless.

The GUI splits into a toolkit-free logic layer (state/work/misc) and a
Tk shell (app).  These tests drive the full decode -> process -> save
workflow, the resample and timestamp tools, auto-update triggering,
and the error surfaces through the in-memory Widgets — the same code
paths the Tk shell binds to (reference behavior: src/gui/work.rs,
src/gui/misc.rs)."""

import threading
from datetime import datetime, timezone
from pathlib import Path

import numpy as np
import pytest

from noaa_apt_tpu.gui import misc as gmisc
from noaa_apt_tpu.gui import work
from noaa_apt_tpu.gui.state import (
    AUTO_UPDATE_WIDGETS,
    GuiState,
    Widgets,
    set_state,
    set_widgets,
    wire_auto_update,
)
from noaa_apt_tpu.io import config as cfg
from noaa_apt_tpu.io import wav
from noaa_apt_tpu.io.wav import WavSpec
from noaa_apt_tpu.synth import synth_recording


def _join(t):
    assert t is not None
    t.join(timeout=300)
    assert not t.is_alive()


@pytest.fixture()
def gui(tmp_path, monkeypatch):
    """Headless GUI: in-memory widgets, inline idle_add, default
    settings, and a small synthesized recording on disk."""
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    monkeypatch.chdir(tmp_path)

    sig, _ = synth_recording(n_rows=20, sample_rate=11025, noise_db=20.0)
    wav.write_wav(tmp_path / "rec.wav", sig, WavSpec(1, 11025, 16, "int"))

    settings = cfg.build_settings(cfg.load_de_settings())
    widgets = Widgets()
    state = GuiState(settings=settings)
    set_widgets(widgets)
    set_state(state)
    widgets.dec_input_chooser.set(str(tmp_path / "rec.wav"))
    work._auto_update_pending = False
    return widgets, state, tmp_path


def test_decode_process_save_workflow(gui):
    widgets, state, tmp = gui
    # Default rotate is "auto" (orbit), which wants a TLE; pin the test
    # TLE so the workflow runs offline (reference errors identically
    # without network).
    from test_geo import TEST_TLE

    (tmp / "tle.txt").write_text(TEST_TLE)
    widgets.p_custom_tle_check.set(True)
    widgets.p_custom_tle_chooser.set(str(tmp / "tle.txt"))

    _join(work.decode())
    assert not isinstance(state.decoded_signal, Exception)
    assert state.decoded_signal is not None
    assert widgets.progress.description == "Decoded"
    assert widgets.dec_decode_button.sensitive
    assert widgets.p_process_button.sensitive
    # Filename has no timestamp -> fell back to mtime, satellite NOAA 19
    # (misc.rs:351-385), prefilled into the Process tab.
    assert widgets.p_satellite_combo.get() == "noaa_19"
    assert widgets.p_ref_time_combo.get() == "end"

    _join(work.process())
    assert state.processed_image is not None
    assert state.processed_image.shape[1:] == (2080, 4)
    assert state.processed_image.dtype == np.uint8
    assert widgets.sav_save_button.sensitive
    assert widgets.progress.description == "Processed"
    # Preview got an image (viewport 900x600 -> downscaled to fit width).
    assert widgets.image.preview is not None
    assert widgets.image.preview.shape[1] <= 900

    widgets.sav_output_entry.set(str(tmp / "out.png"))
    work.save()
    assert widgets.progress.description == "Saved"
    from PIL import Image

    img = np.asarray(Image.open(tmp / "out.png"))
    assert img.shape[1] == 2080


def test_decode_once_process_many(gui):
    """The decode result is cached; process() re-runs without DSP
    (state.rs:118-122 design) and respects knob changes."""
    widgets, state, _ = gui
    widgets.p_rotate_combo.set("no")
    _join(work.decode())
    cached = state.decoded_signal

    _join(work.process())
    first = state.processed_image
    assert state.decoded_signal is cached

    widgets.p_contrast_combo.set("minmax")
    _join(work.process())
    assert state.decoded_signal is cached
    assert state.processed_image is not None
    assert not np.array_equal(state.processed_image, first)


def test_decoder_cache_survives_redecodes(gui):
    """The live Decoder (compiled XLA graphs) is reused across decodes
    and kept through failed ones — recompiles cost minutes on a
    remote-compile link."""
    widgets, state, _ = gui
    _join(work.decode())
    dec1 = state.decoder
    assert dec1 is not None
    _join(work.decode())
    assert state.decoder is dec1
    widgets.dec_input_chooser.set("missing.wav")
    _join(work.decode())
    assert widgets.info.kind == "error"
    assert state.decoder is dec1


def test_decode_no_input_error(gui):
    widgets, state, _ = gui
    widgets.dec_input_chooser.set(None)
    assert work.decode() is None
    assert widgets.info.revealed and widgets.info.kind == "error"
    assert "Select input file" in widgets.info.text
    assert widgets.dec_decode_button.sensitive  # re-enabled by callback


def test_process_without_decode_error(gui):
    widgets, state, _ = gui
    assert work.process() is None
    assert widgets.info.kind == "error"
    assert "No decoded image?" in widgets.info.text


def test_process_marshalling_errors(gui):
    widgets, state, _ = gui
    state.decoded_signal = np.zeros(2080 * 12, np.float32)

    widgets.p_contrast_combo.set("bogus")
    assert work.process() is None
    assert 'Unknown contrast adjustment "bogus"' in widgets.info.text

    widgets.p_contrast_combo.set("98_percent")
    widgets.p_false_color_check.set(True)
    assert work.process() is None
    assert "Select palette file" in widgets.info.text
    widgets.p_false_color_check.set(False)

    widgets.p_custom_tle_check.set(True)
    assert work.process() is None
    assert "Select custom TLE input file" in widgets.info.text
    widgets.p_custom_tle_check.set(False)

    widgets.p_calendar.set((2021, 2, 31))
    assert work.process() is None
    assert "Invalid date or time" in widgets.info.text


def test_save_without_filename_or_image(gui):
    widgets, state, _ = gui
    work.save()
    assert "Select output filename" in widgets.info.text
    widgets.sav_output_entry.set("x.png")
    work.save()
    assert "No processed image to save?" in widgets.info.text


def test_auto_update_triggers_process(gui):
    """Every Process-tab knob re-runs process() when auto-update is on
    (gui.rs:360-410 + work.rs:205-213)."""
    widgets, state, _ = gui
    calls = []
    wire_auto_update(widgets, lambda: calls.append(1))
    assert len(AUTO_UPDATE_WIDGETS) == 23
    widgets.p_rotate_combo.set("yes")
    widgets.p_yaw_spinner.set(1.0)
    widgets.p_calendar.set((2020, 5, 5))
    assert len(calls) == 3
    # dec-tab widgets must NOT trigger
    widgets.dec_sync_check.set(False)
    assert len(calls) == 3

    # process_if_auto_update_enabled gates on the checkbox
    assert work.process_if_auto_update_enabled() is None
    widgets.p_auto_update_check.set(True)
    state.decoded_signal = None
    assert work.process_if_auto_update_enabled() is None  # errors via info bar
    assert "No decoded image?" in widgets.info.text


def test_auto_update_gates_on_inflight_process(gui):
    """Changes during an in-flight process don't spawn concurrent
    workers; the trailing change re-runs once on completion."""
    import time

    widgets, state, _ = gui
    state.decoded_signal = np.zeros(2080 * 12, np.float32)
    widgets.p_rotate_combo.set("no")
    widgets.p_auto_update_check.set(True)

    widgets.p_process_button.set_sensitive(False)  # in-flight
    assert work.process_if_auto_update_enabled() is None
    assert work._auto_update_pending

    # Completion re-enables the button and drains the pending flag.
    widgets.p_process_button.set_sensitive(True)
    work._rerun_if_auto_update_pending()
    assert not work._auto_update_pending
    for _ in range(600):
        if state.processed_image is not None:
            break
        time.sleep(0.05)
    assert state.processed_image is not None


def test_resample_guards(gui):
    widgets, state, tmp = gui
    widgets.res_input_chooser.set(str(tmp / "rec.wav"))
    widgets.res_output_entry.set("")
    assert work.resample() is None
    assert "Select output filename" in widgets.info.text
    assert widgets.res_resample_button.sensitive


def test_resample_tool(gui):
    widgets, state, tmp = gui
    widgets.res_input_chooser.set(str(tmp / "rec.wav"))
    widgets.res_output_entry.set(str(tmp / "res.wav"))
    widgets.res_rate_spinner.set(22050)
    _join(work.resample())
    assert widgets.progress.description == "Finished"
    sig, spec = wav.load_wav(tmp / "res.wav")
    assert spec.sample_rate == 22050

    widgets.res_input_chooser.set(None)
    assert work.resample() is None
    assert "Select input file" in widgets.info.text


def test_timestamp_tool_roundtrip(gui):
    widgets, state, tmp = gui
    f = tmp / "stamp.wav"
    f.write_bytes(b"RIFF")

    widgets.ts_write_chooser.set(str(f))
    widgets.ts_calendar.set((2020, 1, 26))
    widgets.ts_hs_spinner.set(1)
    widgets.ts_min_spinner.set(33)
    widgets.ts_sec_spinner.set(20)
    work.write_timestamp()
    assert "Timestamp written to file" in widgets.info.text

    # Read it back through the other chooser: same local wall time.
    widgets.ts_calendar.set((1999, 1, 1))
    widgets.ts_read_chooser.set(str(f))
    work.read_timestamp()
    assert "Loaded timestamp from file" in widgets.info.text
    assert widgets.ts_calendar.get() == (2020, 1, 26)
    assert (widgets.ts_hs_spinner.get(), widgets.ts_min_spinner.get(),
            widgets.ts_sec_spinner.get()) == (1, 33, 20)

    widgets.ts_read_chooser.set(str(tmp / "missing.wav"))
    work.read_timestamp()
    assert "Error reading timestamp" in widgets.info.text


def test_decode_prefills_time_from_filename(gui, tmp_path):
    """A gqrx-style filename infers start time + satellite
    (work.rs:46-126 prefill path)."""
    widgets, state, tmp = gui
    src = tmp / "rec.wav"
    named = tmp / "gqrx_20200126_013320_137100000.wav"
    named.write_bytes(src.read_bytes())
    widgets.dec_input_chooser.set(str(named))
    _join(work.decode())
    assert widgets.p_ref_time_combo.get() == "start"
    assert widgets.p_satellite_combo.get() == "noaa_19"  # 137.1 MHz
    y, m, d = widgets.p_calendar.get()
    got_local = datetime(y, m, d, int(widgets.p_hs_spinner.get()),
                         int(widgets.p_min_spinner.get()),
                         int(widgets.p_sec_spinner.get())).astimezone()
    want = datetime(2020, 1, 26, 1, 33, 20, tzinfo=timezone.utc)
    assert got_local == want


def test_idle_add_marshals_to_gui_thread(gui):
    """Worker-thread callbacks go through idle_add (the glib::idle_add
    analog) — nothing runs them inline on the worker."""
    widgets, state, _ = gui
    ran_on = []
    pending = []
    widgets.idle_add = pending.append  # queue, like the Tk pump

    t = work.decode()
    t.join(timeout=300)
    assert pending  # callback queued, not executed
    for fn in pending:
        ran_on.append(threading.current_thread().name)
        fn()
    assert state.decoded_signal is not None


def test_update_check_shows_info(gui, monkeypatch):
    widgets, state, _ = gui
    import noaa_apt_tpu.io.misc as io_misc

    monkeypatch.setattr(io_misc, "check_updates", lambda v: (True, "9.9.9"))
    gmisc.check_updates_and_show("0.1.0").join(timeout=10)
    assert 'Version "9.9.9" available for download!' in widgets.info.text

    monkeypatch.setattr(io_misc, "check_updates", lambda v: None)
    gmisc.check_updates_and_show("0.1.0").join(timeout=10)
    assert "internet connection" in widgets.info.text


def test_output_tips(tmp_path, monkeypatch):
    """Save-entry tips (gui.rs:258-319): relative-path folder hint,
    extension warning, overwrite warning."""
    monkeypatch.chdir(tmp_path)
    tips = gmisc.output_tips(None, ".png")
    assert tips == {"folder": None, "extension_warn": False, "overwrite_warn": False}

    tips = gmisc.output_tips("out.jpg", ".png")
    assert tips["folder"] == str(tmp_path)
    assert tips["extension_warn"]
    assert not tips["overwrite_warn"]

    (tmp_path / "out.png").write_bytes(b"x")
    tips = gmisc.output_tips(str(tmp_path / "out.png"), ".png")
    assert tips["folder"] is None
    assert not tips["extension_warn"]
    assert tips["overwrite_warn"]


def test_scale_preview():
    img = np.zeros((100, 2080, 4), np.uint8)
    # Fit: downscale to viewport width
    out = gmisc.scale_preview(img, (1040, 600), normal_size=False)
    assert out.shape[1] == 1040 and out.shape[0] == 50
    # Normal size: untouched
    assert gmisc.scale_preview(img, (10, 10), normal_size=True).shape == img.shape
    # Never upscale
    small = np.zeros((10, 20, 4), np.uint8)
    assert gmisc.scale_preview(small, (1000, 1000), normal_size=False).shape == small.shape


def test_app_module_importable_headless():
    """The Tk shell must import (syntax/deps) without a display; only
    App() needs one."""
    import noaa_apt_tpu.gui.app as app

    assert hasattr(app, "App")


def test_process_invalid_map_spinner_reenables_buttons(gui):
    """Transient junk in a map spinbox (e.g. '-' mid-edit) must surface
    as an error and re-enable the buttons, not strand them disabled."""
    widgets, state, _ = gui
    state.decoded_signal = np.zeros(2080 * 12, np.float32)

    widgets.p_overlay_check.set(True)
    widgets.p_yaw_spinner.set("-")
    assert work.process() is None
    assert "Invalid map overlay setting" in widgets.info.text
    assert widgets.p_process_button.sensitive
    assert widgets.dec_decode_button.sensitive
