"""Tk shell construction test, headless.

``gui/app.py`` needs a display for real Tk, so these tests inject a
minimal fake ``tkinter`` (variables with working traces, widgets that
accept any configuration) and build the full ``App``.  That executes
every line of widget construction and wiring — catching typos, bad
bindings, and broken hook plumbing that the logic-layer tests can't
see — and then drives the button/idle/progress/info machinery through
the fake toolkit."""

import importlib
import sys
import types

import pytest


# --- minimal fake tkinter -------------------------------------------------

class FakeVar:
    def __init__(self, master=None, value=None):
        self._value = value
        self._traces = []

    def get(self):
        return self._value

    def set(self, value):
        self._value = value
        for cb in self._traces:
            cb()

    def trace_add(self, mode, cb):
        self._traces.append(lambda: cb())


class FakeWidget:
    """Accepts any constructor kwargs, records configure() calls, and
    no-ops every layout/geometry method."""

    def __init__(self, *args, **kwargs):
        self.kwargs = kwargs
        self.config_history = []
        self.children = []
        if args and isinstance(args[0], FakeWidget):
            args[0].children.append(self)

    def configure(self, **kwargs):
        self.kwargs.update(kwargs)
        self.config_history.append(kwargs)

    config = configure

    def __setitem__(self, key, value):
        self.kwargs[key] = value

    def winfo_width(self):
        return 800

    def winfo_height(self):
        return 600

    def __getattr__(self, name):
        # pack/grid/place/add/tkraise/add_command/... -> no-op
        def method(*a, **k):
            return None

        return method


class FakeTk(FakeWidget):
    def __init__(self):
        super().__init__()
        self.after_calls = []

    def after(self, ms, fn):
        self.after_calls.append(fn)

    def mainloop(self):
        raise AssertionError("tests must not enter the mainloop")


def _fake_tkinter():
    tk = types.ModuleType("tkinter")
    tk.Tk = FakeTk
    tk.Menu = FakeWidget
    tk.Frame = FakeWidget
    tk.Label = FakeWidget
    tk.Button = FakeWidget
    tk.PhotoImage = lambda data=None: FakeWidget()
    tk.StringVar = FakeVar
    tk.BooleanVar = FakeVar
    tk.IntVar = FakeVar
    tk.DoubleVar = FakeVar
    tk.TclError = RuntimeError

    ttk = types.ModuleType("tkinter.ttk")
    for name in ("Frame", "Label", "Button", "Entry", "Checkbutton", "Combobox",
                 "Scale", "Spinbox", "Progressbar", "Notebook", "PanedWindow",
                 "LabelFrame"):
        setattr(ttk, name, FakeWidget)

    fd = types.ModuleType("tkinter.filedialog")
    fd.askopenfilename = lambda **k: ""
    fd.asksaveasfilename = lambda **k: ""
    cc = types.ModuleType("tkinter.colorchooser")
    cc.askcolor = lambda **k: (None, None)
    mb = types.ModuleType("tkinter.messagebox")
    mb.showinfo = lambda *a, **k: None

    tk.ttk, tk.filedialog, tk.colorchooser, tk.messagebox = ttk, fd, cc, mb
    return {"tkinter": tk, "tkinter.ttk": ttk, "tkinter.filedialog": fd,
            "tkinter.colorchooser": cc, "tkinter.messagebox": mb}


@pytest.fixture()
def app(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    for name, mod in _fake_tkinter().items():
        monkeypatch.setitem(sys.modules, name, mod)
    sys.modules.pop("noaa_apt_tpu.gui.app", None)
    app_mod = importlib.import_module("noaa_apt_tpu.gui.app")
    app_mod = importlib.reload(app_mod)

    from noaa_apt_tpu.io import config as cfg

    settings = cfg.build_settings(cfg.load_de_settings())
    instance = app_mod.App(check_updates=False, settings=settings)
    yield instance
    # Leave a clean slate for other test modules importing the real app.
    sys.modules.pop("noaa_apt_tpu.gui.app", None)


def test_app_constructs_and_registers_widgets(app):
    from noaa_apt_tpu.gui.state import borrow_state, borrow_widgets

    w = borrow_widgets()
    assert borrow_state().settings is not None
    # Values proxy through fake Tk variables: set via state, read back.
    w.p_contrast_combo.set("telemetry")
    assert w.p_contrast_combo.get() == "telemetry"
    w.p_calendar.set((2021, 7, 4))
    assert w.p_calendar.get() == (2021, 7, 4)
    w.p_countries_color.set((1, 2, 3, 77))
    assert w.p_countries_color.get() == (1, 2, 3, 77)
    # dec_ready initial state: decode enabled, process/save disabled.
    assert w.dec_decode_button.sensitive
    assert not w.p_process_button.sensitive
    assert not w.sav_save_button.sensitive
    assert w.progress.description == "Ready"


def test_app_button_and_info_wiring(app):
    from noaa_apt_tpu.gui.state import borrow_widgets

    w = borrow_widgets()
    # Decode click with no input file -> error routed through idle
    # queue -> pumped -> info bar revealed on the fake label.
    w.dec_input_chooser.set(None)
    w.dec_decode_button.click()
    app._pump()
    assert w.info.revealed and w.info.kind == "error"
    assert "Select input file" in w.info.text
    assert "Select input file" in app.info_label.kwargs.get("text", "")
    assert w.dec_decode_button.sensitive  # callback re-enabled it

    # Progress hook drives the fake progressbar.
    w.progress.set(0.5, "Halfway")
    assert app.progress_bar.kwargs["value"] == 0.5
    assert app.progress_text.kwargs["text"] == "Halfway"


def test_app_auto_update_wiring(app, monkeypatch):
    from noaa_apt_tpu.gui import work
    from noaa_apt_tpu.gui.state import borrow_widgets

    w = borrow_widgets()
    calls = []
    monkeypatch.setattr(work, "process", lambda: calls.append(1))
    w.p_auto_update_check.set(True)
    # Pre-decode the Process button is insensitive -> gated to pending.
    w.p_rotate_combo.set("yes")
    assert not calls and work._auto_update_pending
    # After a decode enables it, knob changes trigger process().
    work._auto_update_pending = False
    w.p_process_button.set_sensitive(True)
    w.p_rotate_combo.set("no")
    assert calls


def test_app_mode_switching_resets_state(app):
    from noaa_apt_tpu.gui.state import borrow_state

    state = borrow_state()
    state.decoded_signal = object()
    state.processed_image = object()
    state.decoder = object()
    app._res_ready()
    app._ts_ready()
    app._dec_ready()
    # gui.rs:417-421: Tools>Decode wipes signal+image; decoder cache stays.
    assert state.decoded_signal is None
    assert state.processed_image is None
    assert state.decoder is not None


def test_app_output_tips_render(app, tmp_path, monkeypatch):
    from noaa_apt_tpu.gui.state import borrow_widgets

    monkeypatch.chdir(tmp_path)
    w = borrow_widgets()
    w.sav_output_entry.set("picture.jpg")
    # The tip label under the Save tab received both warnings.
    texts = [c.get("text", "") for c in _all_config_texts(app.root)]
    assert any("Missing .png extension" in t for t in texts)
    assert any(str(tmp_path) in t for t in texts)


def _all_config_texts(widget, acc=None):
    acc = [] if acc is None else acc
    acc.append(widget.kwargs)
    for ch in widget.children:
        _all_config_texts(ch, acc)
    return acc


def test_app_preview_renders_valid_ppm(app, monkeypatch):
    """The preview path hands Tk a raw PPM (no PNG/base64 on the
    mainloop thread); the bytes must decode back to the preview
    pixels."""
    import io as _io

    import numpy as np
    import tkinter as tk
    from PIL import Image

    from noaa_apt_tpu.gui import misc as gmisc
    from noaa_apt_tpu.gui.state import borrow_state, borrow_widgets

    captured = {}

    class CapturingPhoto:
        def __init__(self, data=None):
            captured["data"] = data

    monkeypatch.setattr(tk, "PhotoImage", CapturingPhoto)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 2080, 4), dtype=np.uint8)
    img[..., 3] = 255
    borrow_state().processed_image = img
    gmisc.update_image()

    data = captured["data"]
    assert isinstance(data, bytes) and data.startswith(b"P6")
    decoded = np.asarray(Image.open(_io.BytesIO(data)))
    preview = borrow_widgets().image.preview
    np.testing.assert_array_equal(decoded, preview[..., :3])
