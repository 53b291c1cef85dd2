"""Conformance pins on the REAL reference fixture.

Every other golden test decodes synthesized WAVs; this module decodes
the one recording that survives in the reference checkout —
``/root/reference/test/noise_48000hz.wav`` (named 48 kHz but actually
carrying an 11025 Hz / ~30 s header, see SURVEY.md §4) — through the
same CLI command set as the reference's ``test/test.sh:44-56``, and
pins the outputs byte-exactly:

- decode: u8 image bytes + greedy sync positions (golden PNG + .txt),
- resample up (80 kHz) and down (11025 passthrough-rate pair from
  test.sh): SHA-256 of the produced WAV file bytes.

If any future optimization shifts a pixel or a sample on real (not
synthesized) data, these fail.  Intended numeric changes: regenerate
with ``python -m tests.test_real_fixture`` and justify in the commit.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path("/root/reference/test/noise_48000hz.wav")
GOLDEN_DIR = Path(__file__).parent / "golden"
GOLDEN_PNG = GOLDEN_DIR / "real_fixture_decode.png"
GOLDEN_SYNC = GOLDEN_DIR / "real_fixture_decode.sync.txt"
GOLDEN_SHA = GOLDEN_DIR / "real_fixture_resample.sha256"

needs_fixture = pytest.mark.skipif(
    not FIXTURE.exists(), reason="reference fixture not present on this machine"
)


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CONFIG_HOME", str(tmp_path / "cfg"))
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _decode_fixture(tmp_path: Path) -> tuple[np.ndarray, list[int]]:
    """CLI decode (test.sh:48's command shape) + engine sync positions."""
    from PIL import Image

    from noaa_apt_tpu.cli import inner_main
    from noaa_apt_tpu.core.profiles import STANDARD
    from noaa_apt_tpu.graph.decode import Decoder
    from noaa_apt_tpu.io import wav

    out = tmp_path / "decoded_noise.png"
    assert inner_main(["-q", str(FIXTURE), "-o", str(out)]) == 0
    img = np.asarray(Image.open(out))

    signal, rate = wav.load(FIXTURE)
    res = Decoder(STANDARD).decode(signal, rate, sync=True)
    return img, res.sync_positions


RESAMPLE_RATES = (80000, 11025)  # test.sh:53-54's pair for this file


def _resample_fixture(tmp_path: Path) -> dict[str, str]:
    """test.sh's resample commands on the fixture -> file SHA-256s."""
    from noaa_apt_tpu.cli import inner_main

    shas = {}
    for r in RESAMPLE_RATES:
        out = tmp_path / f"resampled_{r}.wav"
        assert inner_main(["-q", str(FIXTURE), "-r", str(r), "-o", str(out)]) == 0
        shas[str(r)] = hashlib.sha256(out.read_bytes()).hexdigest()
    return shas


@needs_fixture
def test_real_fixture_decode_golden(env):
    from PIL import Image

    assert GOLDEN_PNG.exists(), "golden missing; run python -m tests.test_real_fixture"
    img, sync_pos = _decode_fixture(env)
    want = np.asarray(Image.open(GOLDEN_PNG))
    np.testing.assert_array_equal(img, want)
    assert sync_pos == [int(x) for x in GOLDEN_SYNC.read_text().split()]


@needs_fixture
def test_real_fixture_resample_golden(env):
    assert GOLDEN_SHA.exists(), "golden missing; run python -m tests.test_real_fixture"
    want = dict(
        line.split() for line in GOLDEN_SHA.read_text().splitlines() if line
    )
    got = _resample_fixture(env)
    assert got == want


if __name__ == "__main__":
    # Regenerate the golden artifacts (run from repo root on the CPU
    # backend: tests/conftest.py's platform forcing does not apply here,
    # so force it the same way for reproducible f32 arithmetic).
    import os
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    GOLDEN_DIR.mkdir(exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        tdp = Path(td)
        os.environ["XDG_CONFIG_HOME"] = str(tdp / "cfg")
        img, sync_pos = _decode_fixture(tdp)
        Image.fromarray(img).save(GOLDEN_PNG)
        GOLDEN_SYNC.write_text(" ".join(str(p) for p in sync_pos) + "\n")
        shas = _resample_fixture(tdp)
        GOLDEN_SHA.write_text(
            "".join(f"{r} {s}\n" for r, s in sorted(shas.items()))
        )
        print(f"wrote golden {img.shape}, {len(sync_pos)} sync positions, {shas}")
