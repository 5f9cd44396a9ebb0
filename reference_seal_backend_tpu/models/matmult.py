"""Matrix-multiply workloads: the three packing strategies × two schemes.

TPU-native counterparts of the reference's MatrixMultiply benchmarks
(M0[r0×c0]·M1[c0×c1], Latency category), disambiguated by the descriptor's
algorithm-variant id exactly like the reference's ``descriptor.other``:

* **MatMultVal** (0x00) — one matrix *row* per ciphertext, M1 transposed at
  encode; each output element is a row·row dot product: multiply → relin →
  (CKKS rescale) → log-tree accumulate; result in slot 0 of each of r0·c1
  ciphertexts (/root/reference
  src/benchmarks/ckks/seal_ckks_matmultval_benchmark.cpp:213-270).
  The reference's OMP ``collapse(2)`` over the r0×c1 output grid becomes
  two broadcast batch axes of one jitted graph.

* **MatMultCipherBatchAxis** (0x01) — one scalar matrix *element* per
  ciphertext, column-major; textbook triple loop with ciphertext-space
  accumulation over the inner dimension, then relinearize (+ CKKS rescale)
  per output (…seal_ckks_matmult_cipherbatchaxis_benchmark.cpp:349-448).
  Here: broadcast elementwise multiply [r0,c0,1]×[1,c0,c1] then a modular
  tree-sum over the inner batch axis — no rotations, no Galois keys.

* **MatMultRow** (0x02) — spacer row packing: M0 row i is replicated
  across c0 blocks of stride ``spacers``, all of M1 packed into ONE
  ciphertext; per row one ct-ct multiply + relin, then rotations by
  multiples of ``spacers`` accumulate the inner dimension
  (…seal_ckks_matmult_row_benchmark.cpp:222-289, 472-523).  The reference
  rotates c0−1 times, paying a full Galois key-switch per rotation; here
  the same c0−1 rotations share ONE hoisted digit decomposition and ONE
  mod-down (Evaluator.rotate_sum), so the dominant O(l²) digit-lift NTT
  cost is paid once instead of per-rotation.  BFV packs two
  M0 rows per ciphertext using the two batching rows and rotates within
  rows (…seal_bfv_matmult_row_benchmark.cpp:226-283), duplicating M1 into
  both halves.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from reference_seal_backend_tpu.engine.descriptor import (
    BenchmarkDescriptor,
    Scheme,
)
from reference_seal_backend_tpu.evaluator import composite
from reference_seal_backend_tpu.evaluator.eval import _mod_sum
from reference_seal_backend_tpu.models.base import Handle, HEBenchmark


class _MatMultBase(HEBenchmark):
    def __init__(self, descriptor: BenchmarkDescriptor, params=None):
        p = dict(descriptor.default_params)
        if params:
            p.update(params)
        self.r0 = p["rows_m0"]
        self.c0 = p["cols_m0"]
        self.c1 = p["cols_m1"]
        super().__init__(descriptor, params)
        self._op_jit = self.jit_with_keys(self._operate_impl)

    @property
    def is_ckks(self) -> bool:
        return self.descriptor.scheme is Scheme.CKKS

    def operate(self, loaded: Handle) -> Handle:
        self.check_handle(loaded, "ct")
        m0, m1 = loaded.payload
        out = self._op_jit(m0, m1)
        return self.handle("result", out, meta=loaded.meta)

    def decode(self, decrypted: Handle) -> List[np.ndarray]:
        self.check_handle(decrypted, "clear")
        out = np.asarray(decrypted.payload)
        if self.is_ckks:
            out = self.clamp_ckks(out)
        return [out]


class MatMultValBenchmark(_MatMultBase):
    """One matrix row per ciphertext; M1 transposed at encode."""

    tag_family = "matmultval"

    def __init__(self, descriptor, params=None):
        super().__init__(descriptor, params)
        slots = self.ctx.slots if self.is_ckks else self.ctx.n
        if self.c0 > slots:
            raise ValueError(f"inner dim {self.c0} exceeds {slots} slots")

    def rotation_steps(self) -> List[int]:
        slots = self.ctx.slots if self.is_ckks else self.ctx.n // 2
        return composite.rotations_for_accumulate(self.c0, slots)

    def needs_conjugation_key(self) -> bool:
        return not self.is_ckks and self.c0 > self.ctx.n // 2

    def encode(self, inputs: Sequence[np.ndarray]) -> Handle:
        m0 = np.asarray(inputs[0]).reshape(self.r0, self.c0)
        m1 = np.asarray(inputs[1]).reshape(self.c0, self.c1)
        pt0 = self.encode_batch(m0)            # r0 cts: rows of M0
        pt1 = self.encode_batch(m1.T)          # c1 cts: columns of M1
        return Handle(tag="matmultval_pt", payload=(pt0, pt1))

    def encrypt(self, encoded: Handle) -> Handle:
        self.check_handle(encoded, "pt")
        cts = tuple(self.encrypt_batch(pt) for pt in encoded.payload)
        return Handle(tag="matmultval_ct", payload=cts)

    def _operate_impl(self, m0, m1):
        a = replace(m0, data=m0.data[:, None])   # [r0, 1, …]
        b = replace(m1, data=m1.data[None, :])   # [1, c1, …]
        prod = self.ev.relinearize(self.ev.multiply(a, b))
        if self.is_ckks:
            prod = self.ev.rescale_to_next(prod)
        return composite.accumulate(self.ev, prod, self.c0)

    def decrypt(self, stored: Handle) -> Handle:
        self.check_handle(stored, "result")
        vals = [
            v[0]
            for v in self.decrypt_each(stored.payload, (self.r0, self.c1))
        ]
        mat = np.asarray(vals).reshape(self.r0, self.c1)
        return self.handle("clear", mat)


class MatMultCipherBatchAxisBenchmark(_MatMultBase):
    """One scalar element per ciphertext (column-major), no rotations."""

    tag_family = "matmultcba"

    def encode(self, inputs: Sequence[np.ndarray]) -> Handle:
        m0 = np.asarray(inputs[0]).reshape(self.r0, self.c0)
        m1 = np.asarray(inputs[1]).reshape(self.c0, self.c1)
        # one slot-0 scalar per plaintext: [r0*c0, 1] and [c0*c1, 1]
        pt0 = self.encode_batch(m0.reshape(-1, 1))
        pt1 = self.encode_batch(m1.reshape(-1, 1))
        return Handle(tag="matmultcba_pt", payload=(pt0, pt1))

    def encrypt(self, encoded: Handle) -> Handle:
        self.check_handle(encoded, "pt")
        cts = tuple(self.encrypt_batch(pt) for pt in encoded.payload)
        return Handle(tag="matmultcba_ct", payload=cts)

    def _operate_impl(self, m0, m1):
        a = replace(
            m0, data=m0.data.reshape((self.r0, self.c0) + m0.data.shape[1:])
        )
        b = replace(
            m1, data=m1.data.reshape((self.c0, self.c1) + m1.data.shape[1:])
        )
        a = replace(a, data=a.data[:, :, None])     # [r0, c0, 1, …]
        b = replace(b, data=b.data[None, :, :])     # [1,  c0, c1, …]
        prod = self.ev.multiply(a, b)               # size-3, [r0, c0, c1, …]
        # ciphertext-space accumulation over the inner dimension, then one
        # batched relinearize (+ rescale) per output — same op order as the
        # reference's second OMP pass.
        summed = replace(
            prod, data=_mod_sum(prod.data, self.ctx.p[: prod.level], axis=1)
        )
        out = self.ev.relinearize(summed)
        if self.is_ckks:
            out = self.ev.rescale_to_next(out)
        return out

    def decrypt(self, stored: Handle) -> Handle:
        self.check_handle(stored, "result")
        vals = [
            v[0]
            for v in self.decrypt_each(stored.payload, (self.r0, self.c1))
        ]
        mat = np.asarray(vals).reshape(self.r0, self.c1)
        return self.handle("clear", mat)


class MatMultRowBenchmark(_MatMultBase):
    """Spacer row packing; M1 in one ciphertext; rotation accumulation."""

    tag_family = "matmultrow"

    def __init__(self, descriptor, params=None):
        p = dict(descriptor.default_params)
        if params:
            p.update(params)
        n = p["poly_modulus_degree"]
        row = n // 2  # CKKS slot count == BFV batching row size
        self.blocks = 1 << math.ceil(math.log2(max(p["cols_m0"], 1)))
        self.spacers = row // self.blocks
        super().__init__(descriptor, params)
        if self.c1 > self.spacers:
            raise ValueError(
                f"cols_m1 {self.c1} exceeds spacer width {self.spacers}"
            )

    def rotation_steps(self) -> List[int]:
        # Linear steps j·spacers, j ∈ [1, c0): with hoisted key switching
        # (Evaluator.rotate_sum) all of them share one digit decomposition
        # and one mod-down, so the linear form beats the earlier log2
        # rotate-add tree, whose every level paid the full O(l²) digit-lift
        # NTT cost.  Blocks >= c0 hold zeros and are skipped outright.
        return [self.spacers * j for j in range(1, self.c0)]

    def _pack_m0_row(self, row_vals: np.ndarray) -> np.ndarray:
        """Row of M0 -> slot vector: block j holds row_vals[j] in its
        first c1 slots (reference encodeM0,
        …seal_ckks_matmult_row_benchmark.cpp:222-247)."""
        vec = np.zeros(self.spacers * self.blocks)
        for j in range(self.c0):
            vec[self.spacers * j : self.spacers * j + self.c1] = row_vals[j]
        return vec

    def _pack_m1(self, m1: np.ndarray) -> np.ndarray:
        vec = np.zeros(self.spacers * self.blocks)
        for j in range(self.c0):
            vec[self.spacers * j : self.spacers * j + self.c1] = m1[j]
        return vec

    def encode(self, inputs: Sequence[np.ndarray]) -> Handle:
        m0 = np.asarray(inputs[0]).reshape(self.r0, self.c0)
        m1 = np.asarray(inputs[1]).reshape(self.c0, self.c1)
        rows = np.stack([self._pack_m0_row(m0[i]) for i in range(self.r0)])
        m1_vec = self._pack_m1(m1)
        if self.is_ckks:
            pt0 = self.encode_batch(rows)
            pt1 = self.encode_batch(m1_vec[None])
        else:
            # two M0 rows per ciphertext via BFV's two batching rows; M1
            # duplicated into both halves (reference
            # …seal_bfv_matmult_row_benchmark.cpp:226-283).
            pairs = []
            for i in range(0, self.r0, 2):
                hi = (
                    rows[i + 1]
                    if i + 1 < self.r0
                    else np.zeros_like(rows[i])
                )
                pairs.append(np.concatenate([rows[i], hi]))
            pt0 = self.encode_batch(np.stack(pairs))
            pt1 = self.encode_batch(np.concatenate([m1_vec, m1_vec])[None])
        return Handle(tag="matmultrow_pt", payload=(pt0, pt1))

    def encrypt(self, encoded: Handle) -> Handle:
        self.check_handle(encoded, "pt")
        cts = tuple(self.encrypt_batch(pt) for pt in encoded.payload)
        return Handle(tag="matmultrow_ct", payload=cts)

    def _operate_impl(self, m0, m1):
        out = self.ev.relinearize(self.ev.multiply(m0, m1))
        # Block 0 of the result needs Σ_j rot(out, j·spacers) over the c0
        # live blocks; one hoisted key-switch covers every rotation.
        return self.ev.rotate_sum(out, [0] + self.rotation_steps())

    def decrypt(self, stored: Handle) -> Handle:
        self.check_handle(stored, "result")
        ct_rows = stored.payload.data.shape[0]
        mat = np.zeros((self.r0, self.c1))
        for i, v in enumerate(
            self.decrypt_each(stored.payload, (ct_rows,))
        ):
            if self.is_ckks:
                mat[i] = np.real(v[: self.c1])
            else:
                mat[2 * i] = v[: self.c1]
                if 2 * i + 1 < self.r0:
                    mat[2 * i + 1] = v[
                        self.ctx.n // 2 : self.ctx.n // 2 + self.c1
                    ]
        return self.handle("clear", mat)
