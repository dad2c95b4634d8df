"""Fused Pallas kernel for the ciphertext tensor-product multiply.

(a0,a1) x (b0,b1) -> (a0b0, a0b1 + a1b0, a1b1) computed in ONE pass:
each operand tile is read from HBM once and all three outputs written
once (~175 MB of traffic per batch-32 call at N=16384x12 instead of the
~300 MB the unfused XLA op sequence moves), putting the op near the
bandwidth roofline. Modular arithmetic is the same 32-bit Montgomery as
modmath.py with the Karatsuba + one-time-conversion form (5 mont_muls,
bit-identical to DeviceLevelOps.tensor_product). Still measured slower
than XLA's fusion of the composed form (44k vs 64k ct-mul/s at
N=16384x12, v5e); a whole-limb-block variant was slower yet (36k), so
the (batch x limb) grid stays and the kernel stays opt-in."""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmath import add_mod, mont_constants, mont_mul, sub_mod


def _kernel(a0_ref, a1_ref, b0_ref, b1_ref, qs_ref, c0_ref, c1_ref, c2_ref):
    limb = pl.program_id(1)
    q = qs_ref[limb, 0]
    nqinv = qs_ref[limb, 1]
    r2 = qs_ref[limb, 2]

    a0 = a0_ref[...]
    a1 = a1_ref[...]
    b0 = b0_ref[...]
    b1 = b1_ref[...]
    a0m = mont_mul(a0, r2, q, nqinv)
    a1m = mont_mul(a1, r2, q, nqinv)
    am_sum = add_mod(a0m, a1m, q)
    b_sum = add_mod(b0, b1, q)
    p0 = mont_mul(b0, a0m, q, nqinv)
    p2 = mont_mul(b1, a1m, q, nqinv)
    pm = mont_mul(b_sum, am_sum, q, nqinv)
    c0_ref[...] = p0
    c1_ref[...] = sub_mod(sub_mod(pm, p0, q), p2, q)
    c2_ref[...] = p2


class PallasDyadic:
    """Batched fused tensor product over [..., n_sub, N] uint32 planes."""

    def __init__(self, primes: List[int], n: int):
        self.primes = list(primes)
        self.n = n
        qs = np.empty((len(primes), 3), dtype=np.uint32)
        for i, q in enumerate(primes):
            nqinv, _, r2 = mont_constants(q)
            qs[i] = (q, nqinv, r2)
        self.qs = qs

    def ct_mul(self, a0, a1, b0, b1):
        n_sub = len(self.primes)
        n = self.n
        lead = a0.shape[:-2]
        batch = int(np.prod(lead)) if lead else 1
        # Mosaic needs (8,128)-compliant trailing block dims: view each
        # polynomial as [n/128, 128] rows.
        rows = max(n // 128, 1)
        cols = n // rows
        args = [x.reshape(batch, n_sub, rows, cols)
                for x in (a0, a1, b0, b1)]
        grid = (batch, n_sub)
        spec = pl.BlockSpec((1, 1, rows, cols), lambda b, l: (b, l, 0, 0),
                            memory_space=pltpu.VMEM)
        interpret = jax.default_backend() != "tpu"
        out_shape = jax.ShapeDtypeStruct((batch, n_sub, rows, cols),
                                         jnp.uint32)
        c0, c1, c2 = pl.pallas_call(
            _kernel,
            grid=grid,
            interpret=interpret,
            in_specs=[spec, spec, spec, spec,
                      pl.BlockSpec((n_sub, 3), lambda b, l: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=(spec, spec, spec),
            out_shape=(out_shape, out_shape, out_shape),
        )(*args, self.qs)
        shape = lead + (n_sub, n)
        return c0.reshape(shape), c1.reshape(shape), c2.reshape(shape)


@lru_cache(maxsize=None)
def get_pallas_dyadic(primes: Tuple[int, ...], n: int) -> PallasDyadic:
    return PallasDyadic(list(primes), n)
