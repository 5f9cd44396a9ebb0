"""Dot product workloads (CKKS Float64 / BFV Int64).

TPU-native counterparts of the reference's
``sbe::{ckks,bfv}::DotProductBenchmark``
(/root/reference src/benchmarks/ckks/seal_ckks_dot_product_benchmark.cpp:293-347,
src/benchmarks/bfv/seal_bfv_dot_product_benchmark.cpp:280-332): per sample
pair multiply → relinearize → sum-across-slots, result read from slot 0.
The slot reduction is the log2 rotate-add tree of
``accumulateCKKS``/``accumulateBFV`` (src/engine/seal_context.cpp:289-347),
implemented here by :func:`evaluator.composite.accumulate`.

Offline batches become broadcast batch axes of one jitted graph, so the
entire batch0 × batch1 cross product shares each rotation's key-switch
as one large batched NTT sweep.
"""

from __future__ import annotations

from dataclasses import replace
from typing import List, Sequence

import numpy as np
import jax

from reference_seal_backend_tpu.engine.descriptor import (
    BenchmarkDescriptor,
    Scheme,
)
from reference_seal_backend_tpu.evaluator import composite
from reference_seal_backend_tpu.models.base import Handle, HEBenchmark


class DotProductBenchmark(HEBenchmark):
    tag_family = "dot"
    n_operands = 2

    def __init__(self, descriptor: BenchmarkDescriptor, params=None):
        self.n = (params or {}).get("n", descriptor.default_params["n"])
        super().__init__(descriptor, params)
        if self.n > self.ctx.slots:
            raise ValueError(
                f"vector size {self.n} exceeds slot count {self.ctx.slots}"
            )
        self._op_jit = self.jit_with_keys(self._operate_impl)

    def rotation_steps(self) -> List[int]:
        slots = (
            self.ctx.slots
            if self.descriptor.scheme is Scheme.CKKS
            else self.ctx.n // 2
        )
        return composite.rotations_for_accumulate(self.n, slots)

    def needs_conjugation_key(self) -> bool:
        # BFV accumulate folds the second batching row via rotate_columns
        # when the vector spills past one row (reference accumulateBFV,
        # src/engine/seal_context.cpp:289-319).
        return (
            self.descriptor.scheme is Scheme.BFV and self.n > self.ctx.n // 2
        )

    # -- pipeline --------------------------------------------------------- #

    def encode(self, inputs: Sequence[np.ndarray]) -> Handle:
        pts = [self.encode_batch(x) for x in inputs]
        return Handle(tag="dot_pt", payload=tuple(pts))

    def encrypt(self, encoded: Handle) -> Handle:
        self.check_handle(encoded, "pt")
        cts = tuple(self.encrypt_batch(pt) for pt in encoded.payload)
        return Handle(tag="dot_ct", payload=cts)

    def _operate_impl(self, a, b):
        a2 = replace(a, data=a.data[:, None])
        b2 = replace(b, data=b.data[None, :])
        prod = self.ev.relinearize(self.ev.multiply(a2, b2))
        if self.descriptor.scheme is Scheme.CKKS:
            prod = self.ev.rescale_to_next(prod)
        return composite.accumulate(self.ev, prod, self.n)

    def operate(self, loaded: Handle) -> Handle:
        self.check_handle(loaded, "ct")
        a, b = loaded.payload
        out = self._op_jit(a, b)
        return Handle(
            tag="dot_result",
            payload=out,
            meta={"batch_shape": (a.data.shape[0], b.data.shape[0])},
        )

    def decrypt(self, stored: Handle) -> Handle:
        self.check_handle(stored, "result")
        shape = stored.meta["batch_shape"]
        vals = list(self.decrypt_each(stored.payload, shape))
        return Handle(tag="dot_clear", payload=vals, meta=stored.meta)

    def decode(self, decrypted: Handle) -> List[np.ndarray]:
        self.check_handle(decrypted, "clear")
        out = []
        for v in decrypted.payload:
            v = v[:1]  # result lives in slot 0
            if self.descriptor.scheme is Scheme.CKKS:
                v = self.clamp_ckks(v)
            out.append(np.asarray(v))
        return out
