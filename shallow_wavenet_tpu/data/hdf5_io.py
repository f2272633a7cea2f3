"""HDF5 feature-file helpers (component C10; the reference family stores
per-utterance features under named datasets in .h5 files)."""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np


def write_hdf5(path: str | Path, name: str, data: np.ndarray) -> None:
    """Write/overwrite dataset `name` in HDF5 file `path`."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "a") as f:
        if name in f:
            del f[name]
        f.create_dataset(name, data=np.asarray(data))


def read_hdf5(path: str | Path, name: str) -> np.ndarray:
    with h5py.File(path, "r") as f:
        if name not in f:
            raise KeyError(f"dataset {name!r} not in {path}")
        return f[name][()]


def list_hdf5(path: str | Path) -> list[str]:
    with h5py.File(path, "r") as f:
        out: list[str] = []
        f.visit(lambda k: out.append(k))
        return out
