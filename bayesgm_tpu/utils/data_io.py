"""Data IO: writers and loaders with the reference file contracts
(src/bayesgm/utils/data_io.py)."""

from __future__ import annotations

import os

import numpy as np


def _standardize(a: np.ndarray) -> np.ndarray:
    mean = a.mean(axis=0)
    std = a.std(axis=0)
    std = np.where(std == 0.0, 1.0, std)
    return ((a - mean) / std).astype("float32")


def save_data(fname: str, data, delimiter: str = "\t"):
    """Save an array as .npy, .txt or .csv (txt/csv via %.6f) —
    reference data_io.py:8-31."""
    data = np.asarray(data)
    if fname.endswith(".npy"):
        np.save(fname, data)
    elif fname.endswith(".txt") or fname.endswith(".csv"):
        np.savetxt(fname, data, fmt="%.6f", delimiter=delimiter)
    else:
        raise ValueError(
            f"Cannot infer an output format from '{fname}': supported "
            "extensions are .npy, .txt and .csv.")


def parse_file(path: str, sep: str = "\t", header=0, normalize: bool = True):
    """Load a single data matrix from .npz (keys data/x/X or first), .csv, or
    .txt; float32; optional standardisation (reference data_io.py:33-84)."""
    assert os.path.exists(path), f"File not found: {path}"
    if path.endswith("npz"):
        loaded = np.load(path)
        for key in ("data", "x", "X"):
            if key in loaded:
                data = loaded[key]
                break
        else:
            data = loaded[list(loaded.keys())[0]]
    elif path.endswith("csv"):
        import pandas as pd

        data = pd.read_csv(path, header=header, sep=sep).values
    elif path.endswith("txt"):
        data = np.loadtxt(path, delimiter=sep)
    else:
        raise SystemExit(
            f"Unsupported input file '{path}': expected a .npz, .csv or .txt extension.")
    data = data.astype("float32")
    if normalize:
        data = _standardize(data)
    return data


def parse_file_triplet(path: str, sep: str = "\t", header=0, normalize: bool = True):
    """Load an (x, y, v) triplet: .npz with keys x/y/v, or tabular files with
    col0 = treatment, col1 = outcome, rest = covariates
    (reference data_io.py:87-151)."""
    assert os.path.exists(path)
    if path.endswith("npz"):
        data = np.load(path)
        data_x, data_y, data_v = data["x"], data["y"], data["v"]
    elif path.endswith("csv"):
        import pandas as pd

        data = pd.read_csv(path, header=header, sep=sep).values
        data_x = data[:, 0].reshape(-1, 1).astype("float32")
        data_y = data[:, 1].reshape(-1, 1).astype("float32")
        data_v = data[:, 2:].astype("float32")
    elif path.endswith("txt"):
        data = np.loadtxt(path, delimiter=sep)
        data_x = data[:, 0].reshape(-1, 1).astype("float32")
        data_y = data[:, 1].reshape(-1, 1).astype("float32")
        data_v = data[:, 2:].astype("float32")
    else:
        raise SystemExit(
            f"Unsupported input file '{path}': expected a .npz, .csv or .txt extension.")
    if normalize:
        data_v = _standardize(data_v)
    return data_x, data_y, data_v
