#!/usr/bin/env python3
"""Fetch the optional ``states.shp`` overlay layer from Natural Earth.

The reference draws three map layers — states first, then countries,
then lakes (``/root/reference/src/map.rs:135-141``) — but its own
checkout ships without ``states.shp``.  The decoder now auto-fetches
and caches this layer on first use (``noaa_apt_tpu/geo/states.py``);
this tool remains for air-gapped installs: run it on a networked host
to vendor the file directly into the package resources:

    python tools/fetch_states_shapefile.py

Natural Earth data is public domain (https://www.naturalearthdata.com/
about/terms-of-use/).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from noaa_apt_tpu.geo.states import download_states_shp  # noqa: E402

DEST = (
    Path(__file__).resolve().parent.parent
    / "noaa_apt_tpu" / "res" / "shapefiles" / "states.shp"
)


def main() -> int:
    if DEST.exists():
        print(f"{DEST} already exists ({DEST.stat().st_size} bytes); nothing to do")
        return 0
    try:
        download_states_shp(DEST)
    except Exception as e:  # noqa: BLE001
        print(f"download failed: {e}", file=sys.stderr)
        print(
            "Fetch the zip manually from naturalearthdata.com and place the "
            f".shp member at {DEST}",
            file=sys.stderr,
        )
        return 1
    print(f"wrote {DEST}")
    print("the --map yes overlay will now draw the admin-1 (states) layer")
    return 0


if __name__ == "__main__":
    sys.exit(main())
