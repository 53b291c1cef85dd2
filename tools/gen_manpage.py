"""Generate the noaa-apt-tpu(1) manpage from the argparse surface.

The reference ships a Debian manpage (``/root/reference/debian/``
packaging); this is its counterpart, generated so the CLI surface
(cli.py build_parser, a superset of the reference's 23 options,
``config.rs:285-477``) and the manpage can never drift apart.

    python tools/gen_manpage.py [out.1]

Writes ``docs/noaa-apt-tpu.1`` by default (groff man format, section 1).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _esc(s: str) -> str:
    """Escape roff specials (leading dots/quotes, backslashes, dashes
    in option names must be literal)."""
    s = s.replace("\\", "\\\\").replace("-", "\\-")
    if s.startswith(".") or s.startswith("'"):
        s = "\\&" + s
    return s


def _fmt_action(a: argparse.Action) -> tuple[str, str]:
    """(option header, help body) for one argparse action."""
    if a.option_strings:
        parts = []
        for opt in a.option_strings:
            if a.metavar and a.nargs != 0:
                parts.append(f"\\fB{_esc(opt)}\\fR \\fI{_esc(str(a.metavar))}\\fR")
            elif a.type is not None or isinstance(
                a, (argparse._StoreAction, argparse._AppendAction)
            ) and a.nargs != 0:
                mv = a.metavar or (a.dest.upper() if a.dest else "ARG")
                parts.append(f"\\fB{_esc(opt)}\\fR \\fI{_esc(str(mv))}\\fR")
            else:
                parts.append(f"\\fB{_esc(opt)}\\fR")
        head = ", ".join(parts)
    else:
        head = f"\\fI{_esc(a.metavar or a.dest)}\\fR"
    return head, _esc(a.help or "")


def generate(parser: argparse.ArgumentParser) -> str:
    date = time.strftime("%Y-%m-%d")
    lines = [
        f'.TH NOAA\\-APT\\-TPU 1 "{date}" "noaa-apt-tpu" "User Commands"',
        ".SH NAME",
        "noaa\\-apt\\-tpu \\- TPU\\-native NOAA APT weather\\-satellite image decoder",
        ".SH SYNOPSIS",
        ".B noaa\\-apt\\-tpu",
        "[\\fIOPTIONS\\fR] [\\fIINPUT.wav\\fR]",
        ".SH DESCRIPTION",
        "Decodes APT (Automatic Picture Transmission) images from WAV "
        "recordings of NOAA 15/18/19 weather\\-satellite downlinks into PNG "
        "images, with optional telemetry\\-calibrated contrast, false color, "
        "histogram equalization, orbit\\-aware rotation and coastline/state/"
        "lake map overlays projected from TLE orbit data.  The DSP pipeline "
        "runs as fused XLA graphs on TPU (or any JAX backend); a fleet "
        "serving mode decodes many recordings through a pipelined "
        "host/accelerator schedule.",
        "",
        "With no arguments a Tk GUI opens (decode/process/save tabs, "
        "resample and timestamp tools), mirroring the reference "
        "application's workflow.",
        ".SH OPTIONS",
    ]
    seen: set = set()
    for a in parser._actions:
        if isinstance(a, argparse._HelpAction):
            head, body = "\\fB\\-h\\fR, \\fB\\-\\-help\\fR", "Show the help message and exit."
        else:
            head, body = _fmt_action(a)
        if head in seen:
            continue
        seen.add(head)
        lines += [".TP", head, body]
    lines += [
        ".SH EXIT STATUS",
        "0 on success (including handled input errors reported to stderr, "
        "matching the reference binary's convention); 1 on internal errors.",
        ".SH FILES",
        ".TP",
        "\\fB~/.config/noaa\\-apt/settings.toml\\fR",
        "Settings file (TOML, schema v4, compatible with the reference's); "
        "auto\\-created on first run, corrupt files are moved aside to "
        "\\fIsettings.toml.OLD\\fR and regenerated.",
        ".TP",
        "\\fB~/.cache/noaa\\-apt\\-tpu/\\fR",
        "Persistent XLA compile cache and downloaded TLE/shapefile caches.",
        ".SH EXAMPLES",
        ".TP",
        "Decode a recording with telemetry contrast:",
        ".B noaa\\-apt\\-tpu input.wav \\-o out.png \\-c telemetry",
        ".TP",
        "Resample a recording to 11025 Hz:",
        ".B noaa\\-apt\\-tpu input.wav \\-o out.wav \\-r 11025",
        ".TP",
        "Decode a fleet of recordings through the serving pipeline:",
        ".B noaa\\-apt\\-tpu \\-\\-fleet 'passes/*.wav' \\-\\-out\\-dir decoded/",
        ".SH SEE ALSO",
        "The reference implementation: martinber/noaa\\-apt (Rust).  "
        "Project documentation under docs/ in the source distribution.",
    ]
    return "\n".join(lines) + "\n"


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent.parent / "docs" / "noaa-apt-tpu.1"
    )
    from noaa_apt_tpu.cli import build_parser

    text = generate(build_parser())
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(text)
    print(f"wrote {out} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
