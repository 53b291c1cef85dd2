"""Module execution entry point: ``python -m noaa_apt_tpu ...``.

The reference ships a bare invocable binary (``src/main.rs:147``); the
Python analog must be runnable without the console script being on
PATH (e.g. a plain checkout).  Delegates to :func:`noaa_apt_tpu.cli.main`.
"""

from .cli import main

if __name__ == "__main__":
    main()
