"""EMD (HDF5-based Velox) extraction — the reference's scientific scan
(S4/S5: ``hs.load`` + 3-D signal selection,
``picoprobe/tools/hyperspectral.py:51-66``) as an Arrow-batched
``mapInPandas`` kernel over ``binaryFile`` rows.

Spark has no native HDF5 source, so this is the one place the engine
drops to Python — per SURVEY §2.10 the per-file dict-in/dict-out
Gladier tool maps exactly onto a grouped/map-batch kernel. The h5py
dependency is import-gated: absent (as in this container), a
deterministic FAKE-EMD binary format stands in so the Spark plumbing
(schema, batching, long-form explosion) is real and tested; the h5py
branch is the identical code path with a different byte parser.

FAKE-EMD layout (little-endian):
  magic b'FEMD' | uint16 n_signals | per signal:
    uint8 title_len | title utf-8 | uint8 ndim | uint32 dims[ndim] |
    float32 data[prod(dims)] | uint16 meta_len | metadata-json utf-8
"""

from __future__ import annotations

import io
import json
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - not present in this container
    import h5py  # type: ignore

    HAS_H5PY = True
except Exception:  # pragma: no cover
    h5py = None
    HAS_H5PY = False

#: Output schema of signal extraction (one row per signal in the file).
SIGNALS_SCHEMA = ("path string, signal_index int, title string, "
                  "ndim int, dims array<int>, metadata string")

#: Long-form hyperspectral cube schema (SURVEY §1.1: the idiomatic
#: Spark shape for the (X, Y, S) cube).
CUBE_SCHEMA = "path string, x int, y int, channel int, counts double"


def write_fake_emd(signals: list[tuple[str, np.ndarray, dict]]) -> bytes:
    """Serialize signals into the FAKE-EMD layout (test fixture
    generator — the simulator.py analog)."""
    out = io.BytesIO()
    out.write(b"FEMD")
    out.write(struct.pack("<H", len(signals)))
    for title, arr, meta in signals:
        t = title.encode()
        out.write(struct.pack("<B", len(t)))
        out.write(t)
        out.write(struct.pack("<B", arr.ndim))
        out.write(struct.pack(f"<{arr.ndim}I", *arr.shape))
        out.write(arr.astype("<f4").tobytes())
        m = json.dumps(meta, sort_keys=True).encode()
        out.write(struct.pack("<H", len(m)))
        out.write(m)
    return out.getvalue()


def _parse_fake_emd(content: bytes) -> list[tuple[str, np.ndarray, str]]:
    buf = io.BytesIO(content)
    if buf.read(4) != b"FEMD":
        raise ValueError("not a FAKE-EMD payload")
    (n,) = struct.unpack("<H", buf.read(2))
    out = []
    for _ in range(n):
        (tl,) = struct.unpack("<B", buf.read(1))
        title = buf.read(tl).decode()
        (ndim,) = struct.unpack("<B", buf.read(1))
        dims = struct.unpack(f"<{ndim}I", buf.read(4 * ndim))
        # np.prod(()) == 1, which is exactly right for a 0-d signal
        # (one scalar element); the old `if dims else 0` guard read 0
        # data bytes for 0-d and corrupted every following signal.
        count = int(np.prod(dims, dtype=np.int64))
        data = np.frombuffer(buf.read(4 * count), dtype="<f4").reshape(dims)
        (ml,) = struct.unpack("<H", buf.read(2))
        meta = buf.read(ml).decode()
        out.append((title, data, meta))
    return out


def _parse_hdf5(content: bytes) -> list[tuple[str, np.ndarray, str]]:
    """Real-EMD branch: open HDF5 from bytes (h5py BytesIO driver) and
    emit (title, array, metadata-json) per dataset — mirrors
    ``hs.load`` + ``metadata.as_dictionary()`` (hyperspectral.py:51-61,
    JSON-laundering included)."""
    if not HAS_H5PY:  # pragma: no cover
        raise NotImplementedError(
            "h5py is not installed in this environment; real .emd files "
            "need the HDF5 branch. The FAKE-EMD branch exercises the "
            "identical Spark plumbing.")
    signals = []  # pragma: no cover
    with h5py.File(io.BytesIO(content), "r") as f:  # pragma: no cover
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                meta = json.loads(json.dumps(dict(obj.attrs))) if obj.attrs else {}
                signals.append((name, obj[()], json.dumps(meta, sort_keys=True)))

        f.visititems(visit)
    return signals  # pragma: no cover


def _parse(content: bytes) -> list[tuple[str, np.ndarray, str]]:
    if content[:4] == b"FEMD":
        return _parse_fake_emd(content)
    return _parse_hdf5(content)


def extract_signals(files: DataFrame) -> DataFrame:
    """S4: binaryFile rows → one row per contained signal. Arrow-
    batched; executes where the bytes were read (no shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, (title, arr, meta) in enumerate(_parse(bytes(content))):
                    rows.append((path, i, title, arr.ndim,
                                 list(arr.shape), meta))
            yield pd.DataFrame(rows, columns=[
                "path", "signal_index", "title", "ndim", "dims", "metadata"])

    return files.select("path", "content").mapInPandas(gen, SIGNALS_SCHEMA)


def _register_for_shipping() -> None:
    """Ship this module's code inside the serialized task instead of
    requiring ``picoprobedataflow_spark`` on every executor's
    PYTHONPATH — the Spark analog of the reference shipping its tool
    functions by serialization to funcX workers (hence the reference's
    body-level imports, temporal.py:12-19). Without this, a driver
    launched outside the repo dies in the Python worker with
    ModuleNotFoundError."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_for_shipping()


def extract_cube_longform(files: DataFrame) -> DataFrame:
    """S5 + cube explosion: select the first 3-D signal per file (the
    reference's signal-of-interest scan, hyperspectral.py:54-66) and
    emit the cube in long form (x, y, channel, counts) — after this,
    every reduction (A12/A13) is a plain groupBy that Catalyst owns."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                cube = None
                for title, arr, meta in _parse(bytes(content)):
                    if arr.ndim == 3:
                        cube = arr
                        break
                if cube is None:
                    continue  # reference raises; relationally: no rows
                nx, ny, ns = cube.shape
                xs, ys, cs = np.meshgrid(np.arange(nx), np.arange(ny),
                                         np.arange(ns), indexing="ij")
                yield pd.DataFrame({
                    "path": path,
                    "x": xs.ravel().astype("int32"),
                    "y": ys.ravel().astype("int32"),
                    "channel": cs.ravel().astype("int32"),
                    "counts": cube.ravel().astype("float64"),
                })

    return files.select("path", "content").mapInPandas(gen, CUBE_SCHEMA)
