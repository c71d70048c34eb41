"""File-drop simulator — the soak-test harness
(``picoprobe/simulator.py:1-41``): replay existing files into a watched
directory on a cadence with unique ``simulator-{i}-{name}`` names, so
the streaming ingest pipeline can be exercised end-to-end without an
instrument.

Driver-side utility (it feeds the stream; it is not on the data path).
"""

from __future__ import annotations

import glob as globlib
import itertools
import os
import shutil
import time
from collections.abc import Iterator


def iter_replay_files(input_glob: str, count: int) -> Iterator[tuple[int, str]]:
    """Cycle the matched files ``count`` times with sequence numbers —
    ``enumerate(itertools.cycle(files))`` (simulator.py:30)."""
    files = sorted(globlib.glob(input_glob))
    if not files:
        raise FileNotFoundError(f"no files match {input_glob!r}")
    return itertools.islice(enumerate(itertools.cycle(files)), count)


def replay(input_glob: str, dest_dir: str, count: int,
           interval_sec: float = 0.0) -> list[str]:
    """Copy files into ``dest_dir`` every ``interval_sec`` seconds with
    unique names (simulator.py:32 naming). Returns the dropped paths.
    Production cadences from the reference: 30 s (hyperspectral) /
    180 s (spatiotemporal); tests use 0."""
    os.makedirs(dest_dir, exist_ok=True)
    dropped = []
    for i, src in iter_replay_files(input_glob, count):
        dest = os.path.join(dest_dir, f"simulator-{i}-{os.path.basename(src)}")
        shutil.copy(src, dest)
        dropped.append(dest)
        if interval_sec:
            time.sleep(interval_sec)
    return dropped
