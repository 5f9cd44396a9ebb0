"""Element-wise add/multiply workloads (CKKS Float64 / BFV Int64).

TPU-native counterparts of the reference's
``sbe::{ckks,bfv}::ElementWiseBenchmark``
(/root/reference src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp,
src/benchmarks/bfv/seal_bfv_element_wise_benchmark.cpp): one whole vector
packed per ciphertext ("Vector" algorithm), Latency and Offline categories
for both add and multiply.

Where the reference's Offline operate is an OpenMP ``collapse(2)`` loop
over the batch0 × batch1 sample cross product
(…ckks…element_wise_benchmark.cpp:306-366), here the cross product is two
broadcast batch axes of a single jitted XLA computation: ``[B0, 1, …] op
[1, B1, …]`` — XLA tiles the vectorized modular arithmetic over the VPU
and the batch axes can be sharded over a device mesh.

Multiply is the *bare* ct-ct product (no relinearization), exactly like
the reference's ``evaluator->multiply`` call (…:343): the decryptor
handles 3-component ciphertexts.
"""

from __future__ import annotations

from dataclasses import replace
from typing import List, Sequence

import numpy as np
import jax

from reference_seal_backend_tpu.engine.descriptor import (
    BenchmarkDescriptor,
    Scheme,
    Workload,
)
from reference_seal_backend_tpu.models.base import Handle, HEBenchmark


class ElementWiseBenchmark(HEBenchmark):
    """EltwiseAdd / EltwiseMult, both schemes, both categories."""

    tag_family = "eltwise"
    n_operands = 2

    def __init__(self, descriptor: BenchmarkDescriptor, params=None):
        super().__init__(descriptor, params)
        self.n = self.params["n"]
        if self.n > self.ctx.slots:
            raise ValueError(
                f"vector size {self.n} exceeds slot count {self.ctx.slots}"
            )
        self.is_add = descriptor.workload is Workload.ELTWISE_ADD
        self._op_jit = self.jit_with_keys(self._operate_impl)

    # -- pipeline --------------------------------------------------------- #

    def encode(self, inputs: Sequence[np.ndarray]) -> Handle:
        """inputs = [samples0 [B0, n], samples1 [B1, n]]."""
        pts = [self.encode_batch(x) for x in inputs]
        return Handle(tag="eltwise_pt", payload=tuple(pts))

    def encrypt(self, encoded: Handle) -> Handle:
        self.check_handle(encoded, "pt")
        cts = tuple(self.encrypt_batch(pt) for pt in encoded.payload)
        return Handle(tag="eltwise_ct", payload=cts)

    def _operate_impl(self, a, b):
        a2 = replace(a, data=a.data[:, None])
        b2 = replace(b, data=b.data[None, :])
        if self.is_add:
            return self.ev.add(a2, b2)
        return self.ev.multiply(a2, b2)

    def operate(self, loaded: Handle) -> Handle:
        self.check_handle(loaded, "ct")
        a, b = loaded.payload
        out = self._op_jit(a, b)
        return Handle(
            tag="eltwise_result",
            payload=out,
            meta={"batch_shape": (a.data.shape[0], b.data.shape[0])},
        )

    def decrypt(self, stored: Handle) -> Handle:
        self.check_handle(stored, "result")
        shape = stored.meta["batch_shape"]
        vals = list(self.decrypt_each(stored.payload, shape))
        return Handle(tag="eltwise_clear", payload=vals, meta=stored.meta)

    def decode(self, decrypted: Handle) -> List[np.ndarray]:
        self.check_handle(decrypted, "clear")
        out = []
        for v in decrypted.payload:
            v = v[: self.n]
            if self.descriptor.scheme is Scheme.CKKS:
                v = self.clamp_ckks(v)
            out.append(np.asarray(v))
        return out
