"""Traced-in-kernel helpers shared by EVERY Pallas kernel family.

FROZEN MODULE — the bodies here are inlined into the traced HLO of every
kernel in ops/_pk_plain.py, _pk_bnn_inkernel.py, _pk_bnn_hosteps.py (and any
future family).  Editing ANYTHING in this file (even whitespace that shifts a
line number) changes the MLIR source locations embedded in every Pallas
program and cold-invalidates the entire persistent compile cache
(~/.cache/bayesgm_tpu_xla) at once — budget multi-minute remote recompiles
per workload before touching it.  Family-specific traced helpers belong in
the family module, NOT here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bayesgm_tpu.ops.nn import LEAKY_SLOPE


def _leaky(h):
    return jnp.where(h > 0, h, LEAKY_SLOPE * h)


def _kernel_uniform(shape):
    """(0,1) uniforms from the on-core PRNG (24 mantissa bits).

    Mosaic has no uint32->f32 cast; the high 24 bits fit int32, which does.
    """
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    hi24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return hi24.astype(jnp.float32) * jnp.float32(2.0**-24)


def _kernel_normal(shape):
    """Box-Muller standard normals using BOTH outputs of each pair.

    One (u1, u2) uniform pair yields two independent normals
    ``r·cos(2πu2)`` and ``r·sin(2πu2)`` with ``r = sqrt(-2 log u1)``; drawing
    half-width uniforms and concatenating the cos/sin halves therefore halves
    the PRNG volume AND the log/sqrt transcendental count while remaining
    exactly N(0, 1) iid per element."""
    rows, cols = shape
    ch = (cols + 1) // 2
    u1 = jnp.maximum(_kernel_uniform((rows, ch)), jnp.float32(1e-7))
    u2 = _kernel_uniform((rows, ch))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = jnp.float32(2.0 * 3.14159265) * u2
    pair = jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)], axis=1)
    return pair if 2 * ch == cols else pair[:, :cols]


def _kernel_signs(shape):
    """Rademacher +-1 from the low random bit."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    low = pltpu.bitcast(bits & jnp.uint32(1), jnp.int32)
    return 1.0 - 2.0 * low.astype(jnp.float32)


def _sign_source(rows, max_w, n_mats):
    """Shared bit-sliced Rademacher source (see _make_sign_source): one
    random-bits draw serves up to 32 sign matrices."""
    from jax.experimental.pallas import tpu as pltpu

    if n_mats > 32:
        return lambda k, cols: _kernel_signs((rows, cols))
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, max_w)), jnp.uint32)

    def signs(k, cols):
        sl = bits if cols == max_w else bits[:, :cols]
        word = sl if k == 0 else sl >> jnp.uint32(k)
        low = pltpu.bitcast(word & jnp.uint32(1), jnp.int32)
        return 1.0 - 2.0 * low.astype(jnp.float32)

    return signs


def _flipout_backprop_input(cot, tape, gamma_eff):
    """d(loss)/d(chain input) through the stochastic flipout forward (same
    noise as the tape), including the input affine gamma_eff."""
    for i in range(len(tape) - 1, -1, -1):
        loc, P, r_in, r_out, pre = tape[i]
        g = (jnp.dot(cot, loc.T, preferred_element_type=jnp.float32)
             + jnp.dot(cot * r_out, P.T, preferred_element_type=jnp.float32) * r_in)
        if i > 0:
            prev_pre = tape[i - 1][4]
            g = g * jnp.where(prev_pre > 0, 1.0, LEAKY_SLOPE)
        cot = g
    return cot * gamma_eff
