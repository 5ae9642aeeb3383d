"""Triple-modular-redundancy checker — fault-tolerance capability parity.

The reference triplicates output channels and votes 2-of-3 with a 2-bit error
flag (``tmrcheck.hpp:76-161``, integrated as ``ConvLayer_Batch_TMR``,
``convlayer.h:185-220``).  TPU analog: run a layer with channel-triplicated
weights, vote elementwise across the 3 replicas, and classify disagreements.

Error flag semantics (tmrcheck.hpp): 0 = all replicas agree; 1 (LSB) = one
replica disagreed somewhere (corrected by majority); 2 (MSB) = some element
had all three replicas distinct (uncorrectable).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def triplicate_weights(w: jax.Array, b: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """[O,kx,ky,I] -> [3O,kx,ky,I] with each output channel repeated 3x
    (channel-interleaved, matching REDF=3 folding in convlayer.h:208)."""
    wt = jnp.repeat(w, 3, axis=0)
    bt = jnp.repeat(b, 3, axis=0)
    return wt, bt


def tmr_check(y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """De-triplicate + vote.  y: (..., 3*C) -> (voted (..., C), errflag ()).

    Majority vote per element; error flag as in tmrcheck.hpp:76-161.
    """
    shape = y.shape
    c3 = shape[-1]
    assert c3 % 3 == 0
    r = y.reshape(shape[:-1] + (c3 // 3, 3))
    a, b, c = r[..., 0], r[..., 1], r[..., 2]
    ab, ac, bc = a == b, a == c, b == c
    # majority: any pair that agrees wins; if none agree, fall back to a
    voted = jnp.where(ab | ac, a, jnp.where(bc, b, a))
    all_agree = ab & ac
    none_agree = ~(ab | ac | bc)
    one_bad = jnp.any(~all_agree & ~none_agree)
    all_bad = jnp.any(none_agree)
    errflag = one_bad.astype(jnp.int32) | (all_bad.astype(jnp.int32) << 1)
    return voted, errflag


def conv2d_int8_tmr(params_w: jax.Array, params_b: jax.Array, x: jax.Array,
                    *, stride: int = 2, padding: int = 2,
                    fault_mask: jax.Array | None = None
                    ) -> Tuple[jax.Array, jax.Array]:
    """ConvLayer_Batch_TMR equivalent: triplicated conv + vote.

    `fault_mask` (same shape as the triplicated conv output) lets tests
    inject bit flips between compute and vote (fault-injection capability).
    """
    from . import conv_int
    wt, bt = triplicate_weights(params_w, params_b)
    y = conv_int.conv2d_int8(x, wt, bt, stride=stride, padding=padding)
    if fault_mask is not None:
        y = (y.astype(jnp.int32) ^ fault_mask.astype(jnp.int32)).astype(y.dtype)
    return tmr_check(y)
