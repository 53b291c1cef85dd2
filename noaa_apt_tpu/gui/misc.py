"""GUI helper functions.

Behavioral contract: reference ``src/gui/misc.rs`` — progress setter,
info bar, threaded update check, browser opener, preview scaling.
"""

from __future__ import annotations

import logging
import threading

import numpy as np

from .. import err
from .state import borrow_state, borrow_widgets

log = logging.getLogger(__name__)


def set_progress(fraction: float, description: str) -> None:
    """Set the main progress bar (gui/misc.rs:13-18)."""
    borrow_widgets().progress.set(fraction, description)


def show_info(kind: str, text: str) -> None:
    """Reveal the info bar with a message (gui/misc.rs:21-37)."""
    borrow_widgets().info.show(kind, text)


def check_updates_and_show(version: str) -> threading.Thread:
    """Check for updates on another thread and show the result
    (gui/misc.rs:42-67)."""
    from ..io.misc import check_updates

    widgets = borrow_widgets()

    def callback(result):
        def apply():
            if result is None:
                show_info(
                    "info",
                    "Error checking for updates, do you have an internet connection?",
                )
            elif result[0]:
                show_info("info", f'Version "{result[1]}" available for download!')
            # else: already on latest version, do nothing

        widgets.idle_add(apply)

    t = threading.Thread(target=lambda: callback(check_updates(version)), daemon=True)
    t.start()
    return t


def open_in_browser(url: str) -> None:
    """Open a webpage (gui/misc.rs:82-117; webbrowser handles the
    platform differences the reference needed WinAPI for)."""
    import webbrowser

    if not webbrowser.open(url):
        raise err.InternalError("Could not open browser")


def scale_preview(image: np.ndarray, viewport: tuple, normal_size: bool) -> np.ndarray:
    """Fit the processed image into the viewport (gui/misc.rs:122-169):
    full size when the toggle is on, otherwise downscale-only to fit
    (never upscale)."""
    if normal_size:
        return image
    h, w = image.shape[:2]
    max_w, max_h = max(int(viewport[0]), 1), max(int(viewport[1]), 1)
    scale = min(max_w / w, max_h / h)
    if scale >= 1.0:
        return image
    from PIL import Image

    out_w, out_h = max(int(w * scale), 1), max(int(h * scale), 1)
    return np.asarray(Image.fromarray(image).resize((out_w, out_h), Image.BILINEAR))


def output_tips(output_filename: str | None, extension: str) -> dict:
    """Tips for a save-path entry (gui.rs:258-319 ``configure_tips``):
    where a relative path will land, a missing-extension warning, and
    an overwrite warning."""
    import os
    from pathlib import Path

    tips = {"folder": None, "extension_warn": False, "overwrite_warn": False}
    if not output_filename:
        return tips
    if not os.path.isabs(output_filename):
        tips["folder"] = str(Path.cwd())
    if not output_filename.endswith(extension):
        tips["extension_warn"] = True
    if Path(output_filename).exists():
        tips["overwrite_warn"] = True
    return tips


def update_image() -> None:
    """Update the right-pane preview from the processed image, or show
    the placeholder (gui/misc.rs:122-169)."""
    widgets = borrow_widgets()
    image = borrow_state().processed_image
    if image is None:
        widgets.image.set_preview(None)
        return
    preview = scale_preview(
        image, widgets.image.viewport_size(), bool(widgets.img_size_toggle.get())
    )
    widgets.image.set_preview(preview)
