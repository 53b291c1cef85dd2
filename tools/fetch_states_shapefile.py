#!/usr/bin/env python3
"""Fetch the optional ``states.shp`` overlay layer from Natural Earth.

The reference draws three map layers — states first, then countries,
then lakes (``/root/reference/src/map.rs:135-141``) — but its own
checkout ships without ``states.shp``, so this repo vendors only
countries/lakes and skips the states layer with a warning when the
file is absent (``noaa_apt_tpu/geo/map_overlay.py``).  Run this script
(needs network access) to download the public-domain Natural Earth
admin-1 boundary-lines layer and install it as ``states.shp``:

    python tools/fetch_states_shapefile.py

The overlay reader (``noaa_apt_tpu/geo/shapefile.py``) consumes the
plain ``.shp`` geometry only; no ``.dbf``/``.shx`` sidecars needed.
Natural Earth data is public domain (https://www.naturalearthdata.com/
about/terms-of-use/).
"""

from __future__ import annotations

import io
import sys
import zipfile
from pathlib import Path
from urllib.request import urlopen

# The 10m admin-1 lines layer, same scale as the vendored countries/
# lakes layers (the reference's map.rs reads the same NE products).
URL = (
    "https://naciscdn.org/naturalearth/10m/cultural/"
    "ne_10m_admin_1_states_provinces_lines.zip"
)
DEST = (
    Path(__file__).resolve().parent.parent
    / "noaa_apt_tpu" / "res" / "shapefiles" / "states.shp"
)


def main() -> int:
    if DEST.exists():
        print(f"{DEST} already exists ({DEST.stat().st_size} bytes); nothing to do")
        return 0
    print(f"downloading {URL} ...")
    try:
        blob = urlopen(URL, timeout=120).read()
    except OSError as e:
        print(f"download failed: {e}", file=sys.stderr)
        print(
            "Fetch the zip manually from naturalearthdata.com and place the "
            f".shp member at {DEST}",
            file=sys.stderr,
        )
        return 1
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        shp = [n for n in z.namelist() if n.endswith(".shp")]
        if not shp:
            print("no .shp member in the archive", file=sys.stderr)
            return 1
        data = z.read(shp[0])
    DEST.write_bytes(data)
    print(f"wrote {DEST} ({len(data)} bytes)")
    print("the --map yes overlay will now draw the admin-1 (states) layer")
    return 0


if __name__ == "__main__":
    sys.exit(main())
