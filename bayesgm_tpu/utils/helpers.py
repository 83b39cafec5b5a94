"""Statistical helpers: ADRF oracles, SIR dimension estimation, MNIST masks
(reference src/bayesgm/utils/helpers.py)."""

from __future__ import annotations

import warnings

import numpy as np


def get_ADRF(x_values=None, x_min=None, x_max=None, nb_intervals=None, dataset: str = "Imbens"):
    """Closed-form ground-truth dose-response curves (reference helpers.py:8-66).

    Imbens: x + 2/(1+x)^3;  Sun: x - 1/2 + e^{-0.5} + 1;  Lee: 1.2x + x^3.
    """
    known_curves = {"Imbens", "Sun", "Lee"}
    if dataset not in known_curves:
        raise ValueError(
            f"No closed-form ADRF oracle for dataset '{dataset}' "
            f"(available: {sorted(known_curves)}).")
    if x_values is not None:
        if not isinstance(x_values, (list, np.ndarray)):
            raise ValueError(
                "Pass the treatment grid `x_values` as a list or numpy array.")
        x_values = np.array(x_values, dtype="float32")
    elif None not in (x_min, x_max, nb_intervals):
        if x_min >= x_max:
            raise ValueError(
                f"Empty treatment range: x_min={x_min} is not below x_max={x_max}.")
        if nb_intervals <= 0:
            raise ValueError(
                f"Grid size nb_intervals={nb_intervals} should be >= 1.")
        x_values = np.linspace(x_min, x_max, nb_intervals, dtype="float32")
    else:
        raise ValueError(
            "Specify the treatment grid explicitly via `x_values`, or as a "
            "linspace via all three of `x_min`, `x_max`, `nb_intervals`.")

    if dataset == "Imbens":
        return x_values + 2.0 / (1.0 + x_values) ** 3
    if dataset == "Sun":
        return x_values - 0.5 + np.exp(-0.5) + 1.0
    return 1.2 * x_values + x_values**3


def slice_y(y, n_slices: int = 10):
    """Assign each sample (in sorted-y order) to one of up to ``n_slices``
    contiguous response slices, never splitting tied y values across slices.

    This is the slicing step of Sliced Inverse Regression.  Semantics match
    the reference (helpers.py:69-142, itself following the ``sliced``
    package) so that ``estimate_latent_dims`` produces identical splits; the
    implementation here works on tie-group boundaries directly.

    Returns ``(slice_ids (n,), counts_per_slice)``.
    """
    n = np.asarray(y).shape[0]
    _, tie_sizes = np.unique(y, return_counts=True)
    if tie_sizes.size == 1:
        raise ValueError(
            "slice_y requires at least two distinct response values; a "
            "constant target cannot be sliced for dimension reduction.")
    # End offset (into the sorted order) of each tie group.
    group_ends = np.cumsum(tie_sizes)

    if n_slices >= tie_sizes.size:
        if n_slices > tie_sizes.size:
            warnings.warn(
                f"Requested {n_slices} slices but only {tie_sizes.size} "
                "distinct response values exist; using one slice per value.")
        cuts = np.concatenate(([0], group_ends))
    else:
        # Greedy fill: each slice takes at least floor(n / n_slices) samples,
        # then extends to the end of the tie group it landed in.
        per_slice = np.floor(n / n_slices)
        cuts = [0]
        filled = 0
        while filled < n - 2:
            g = np.searchsorted(group_ends, filled + per_slice, side="left")
            g = min(g, group_ends.size - 1)
            filled = group_ends[g]
            cuts.append(filled)
        cuts = np.asarray(cuts)

    slice_ids = np.zeros(n, dtype="int64")
    last = len(cuts) - 2
    for j in range(last + 1):
        hi = n if j == last else cuts[j + 1]
        slice_ids[cuts[j]:hi] = j
    return slice_ids, np.bincount(slice_ids)


def get_SDR_dim(X, y, n_slices: int = 10, ratio: float = 0.8):
    """Sufficient-dimension-reduction rank of the X -> y relation via SIR.

    Whiten X with an economy QR, average the whitened rows within each
    y-slice, and count how many eigenvalues of the between-slice covariance
    are needed to reach ``ratio`` of its trace (reference helpers.py:145-179;
    numerics pinned by the estimate_latent_dims golden test).
    """
    import scipy.linalg as linalg

    if y.ndim == 2:
        assert y.shape[1] == 1, "The shape of y should be (n_samples, 1)."
        y = np.squeeze(y)
    n_samples = X.shape[0]
    Q, _ = linalg.qr(X - X.mean(axis=0), mode="economic")
    Z = np.sqrt(n_samples) * Q[np.argsort(y), :]

    slice_ids, counts = slice_y(y, n_slices)
    # Per-slice sums via a one-hot contraction (rows of Z are already in
    # sorted-y order, matching slice_ids).
    onehot = (slice_ids[:, None] == np.arange(counts.size)[None, :])
    slice_means = (onehot.astype(Z.dtype).T @ Z) / np.sqrt(counts[:, None])
    M = slice_means.T @ slice_means / n_samples

    evals = linalg.eigh(M, eigvals_only=True)[::-1]
    reached = np.cumsum(evals) >= ratio * evals.sum()
    return int(np.argmax(reached) + 1)


def estimate_latent_dims(x, y, v, v_ratio: float = 0.7, z0_dim: int = 3,
                         max_total_dim: int = 64, min_z3_dim: int = 3):
    """Auto [z0, z1, z2, z3] selection via SIR (V→y, V→x) + PCA total dim
    (reference helpers.py:181-222)."""
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    v = StandardScaler().fit_transform(v)
    y = StandardScaler().fit_transform(y)
    z1_dim = get_SDR_dim(v, y, n_slices=10, ratio=0.8)
    z2_dim = get_SDR_dim(v, x, n_slices=10, ratio=0.8)
    pca = PCA().fit(v)
    cumulative = np.cumsum(pca.explained_variance_ratio_)
    total_z_dim = int(np.argmax(cumulative >= v_ratio) + 1)
    total_z_dim = min(max_total_dim, total_z_dim)
    z3_dim = total_z_dim - z0_dim - z1_dim - z2_dim
    if z3_dim <= min_z3_dim:
        z3_dim = min_z3_dim
    return [z0_dim, z1_dim, z2_dim, z3_dim]


def mnist_mask_indices(shape=(28, 28), mode="hole", center=(14, 14), num_holes=1,
                       hole_size=3, orientation="horizontal", stripe_width=4,
                       stripe_pos=14, seed=None):
    """Pixel mask builders returning (observed, missing) flat index arrays
    (reference helpers.py:224-313).

    Modes: 'holes' (square hole at ``center``), 'edge_stripe' (stripe of
    ``stripe_width`` at ``stripe_pos``), and the four half-image masks.
    """
    H, W = shape
    mask = np.zeros((H, W), dtype=bool)  # True = masked out (missing)

    if mode in ("hole", "holes"):
        rng = np.random.default_rng(seed)
        r = hole_size
        r2 = r // 2
        if center is None:
            valid_rows = np.arange(r2, H - (r - r2 - 1))
            valid_cols = np.arange(r2, W - (r - r2 - 1))
            center = (rng.choice(valid_rows), rng.choice(valid_cols))
        cy, cx = center
        mask[cy - r2 : cy - r2 + r, cx - r2 : cx - r2 + r] = True
    elif mode == "edge_stripe":
        w = int(stripe_width)
        start = stripe_pos - w // 2
        end = start + w
        if orientation == "horizontal":
            mask[start:end, :] = True
        elif orientation == "vertical":
            mask[:, start:end] = True
        else:
            raise ValueError(f"Unknown orientation: {orientation}")
    elif mode == "upper_half":
        mask[: H // 2, :] = True
    elif mode == "lower_half":
        mask[H // 2 :, :] = True
    elif mode == "left_half":
        mask[:, : W // 2] = True
    elif mode == "right_half":
        mask[:, W // 2 :] = True
    else:
        raise ValueError(f"Unknown mode: {mode}")

    ind_x1 = np.flatnonzero(~mask)  # observed
    ind_x2 = np.flatnonzero(mask)  # missing
    return ind_x1, ind_x2
