"""Core HE data containers (JAX pytrees) and host<->device RNS conversion.

Unlike the reference's opaque handle-wrapped SEAL objects
(/root/reference src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:203-205),
ciphertexts here are plain functional pytrees over uint32 device arrays, so
they flow through ``jit`` / ``vmap`` / ``pjit`` and shard over meshes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["level", "scale", "is_ntt"],
)
@dataclass(frozen=True)
class Ciphertext:
    """RLWE ciphertext: ``data[size, level, N]`` uint32 residues.

    ``size`` is the number of polynomial components (2 fresh, 3 after an
    unrelinearized multiply).  Both CKKS and BFV ciphertexts are stored
    NTT-domain Montgomery form at rest (is_ntt=True); only the BFV BEHZ
    multiply drops to coefficient domain internally (evaluator/behz.py).
    Leading batch axes may precede ``size``.
    """

    data: jnp.ndarray
    level: int = 0
    scale: float = 1.0
    is_ntt: bool = True

    @property
    def size(self) -> int:
        return self.data.shape[-3]

    def with_data(self, data) -> "Ciphertext":
        return replace(self, data=data)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["level", "scale", "is_ntt"],
)
@dataclass(frozen=True)
class Plaintext:
    """Encoded plaintext: ``data[level, N]`` uint32 residues (same domain
    conventions as Ciphertext for the owning scheme)."""

    data: jnp.ndarray
    level: int = 0
    scale: float = 1.0
    is_ntt: bool = True


def int_poly_to_rns(coeffs: np.ndarray, primes: Tuple[int, ...]) -> np.ndarray:
    """Signed integer coefficients -> uint32 residue rows [L, N] (host)."""
    if coeffs.dtype == object:
        out = np.stack(
            [(coeffs % p).astype(np.uint64).astype(np.uint32) for p in primes]
        )
    else:
        c = coeffs.astype(np.int64)
        out = np.stack(
            [(c % np.int64(p)).astype(np.uint32) for p in primes]
        )
    return out


def rns_to_mont(res: np.ndarray, primes: Tuple[int, ...]) -> np.ndarray:
    """uint32 residues [L, N] -> Montgomery form (host)."""
    return np.stack(
        [
            ((res[i].astype(np.uint64) << 32) % np.uint64(p)).astype(
                np.uint32
            )
            for i, p in enumerate(primes)
        ]
    )


def mont_to_rns(res: np.ndarray, primes: Tuple[int, ...]) -> np.ndarray:
    """Montgomery-form residues ``[..., L, N]`` -> standard residues; the
    limb axis is second-to-last, leading batch axes broadcast (so one
    call converts a whole decrypted Offline batch)."""
    out = []
    for i, p in enumerate(primes):
        rinv = pow(1 << 32, -1, p)
        out.append(
            (
                res[..., i, :].astype(np.uint64)
                * np.uint64(rinv)
                % np.uint64(p)
            ).astype(np.uint32)
        )
    return np.stack(out, axis=-2)


def crt_compose_centered(res: np.ndarray, primes: Tuple[int, ...]) -> np.ndarray:
    """CRT-compose residue rows ``[..., L, N]`` into centered bigints
    (object array, shape ``[..., N]``).

    Host-side exact reconstruction used by decrypt/decode; q = prod(primes).
    Leading batch axes broadcast — the decryptors decrypt whole batches in
    one vectorized pass instead of a per-sample Python loop.
    """
    q = 1
    for p in primes:
        q *= p
    acc = np.zeros(res.shape[:-2] + res.shape[-1:], dtype=object)
    for i, p in enumerate(primes):
        qi = q // p
        ei = qi * pow(qi % p, -1, p)  # CRT idempotent
        acc += res[..., i, :].astype(object) * ei
    acc %= q
    return np.where(acc > q // 2, acc - q, acc)
