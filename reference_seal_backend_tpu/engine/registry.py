"""Engine: benchmark registry + factory.

TPU-native counterpart of ``SEALEngine`` (/root/reference
src/engine/seal_engine.cpp:93-152): advertises the same 20 benchmark
descriptors (scheme names CKKS/BFV, security "128 bits") and creates
benchmark instances on demand.  There is no C ABI to cross — the harness
(engine/runner.py) calls the pipeline directly — but the registry surface
and the descriptor → implementation dispatch mirror the reference's
``Description::createBenchmark`` hooks.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from reference_seal_backend_tpu.engine.descriptor import (
    MATMULT_CIPHERBATCHAXIS,
    MATMULT_ROW,
    MATMULT_VAL,
    BenchmarkDescriptor,
    Workload,
    default_descriptors,
)
from reference_seal_backend_tpu.models.base import HEBenchmark
from reference_seal_backend_tpu.models.dot_product import DotProductBenchmark
from reference_seal_backend_tpu.models.eltwise import ElementWiseBenchmark
from reference_seal_backend_tpu.models.logreg import LogRegBenchmark
from reference_seal_backend_tpu.models.matmult import (
    MatMultCipherBatchAxisBenchmark,
    MatMultRowBenchmark,
    MatMultValBenchmark,
)

SCHEME_NAMES = ("CKKS", "BFV")
SECURITY_NAME = "128 bits"


class Engine:
    """Registry of the 20 reference benchmark descriptors."""

    def __init__(self):
        self.descriptors: Tuple[BenchmarkDescriptor, ...] = (
            default_descriptors()
        )
        self._by_name: Dict[str, BenchmarkDescriptor] = {
            d.name: d for d in self.descriptors
        }
        # createEngine(p_buffer, size) parity: opaque init bytes recorded
        # but never interpreted (the reference ignores them,
        # /root/reference src/engine/seal_engine.cpp:38-40)
        self.init_data: bytes = b""

    def find(self, name: str) -> BenchmarkDescriptor:
        return self._by_name[name]

    def names(self) -> Sequence[str]:
        return tuple(self._by_name)

    def create_benchmark(
        self,
        descriptor: BenchmarkDescriptor,
        params: Optional[Dict[str, int]] = None,
    ) -> HEBenchmark:
        wl = descriptor.workload
        if wl in (Workload.ELTWISE_ADD, Workload.ELTWISE_MULT):
            return ElementWiseBenchmark(descriptor, params)
        if wl is Workload.DOT_PRODUCT:
            return DotProductBenchmark(descriptor, params)
        if wl is Workload.MATRIX_MULTIPLY:
            impl = {
                MATMULT_VAL: MatMultValBenchmark,
                MATMULT_CIPHERBATCHAXIS: MatMultCipherBatchAxisBenchmark,
                MATMULT_ROW: MatMultRowBenchmark,
            }[descriptor.other]
            return impl(descriptor, params)
        if wl is Workload.LOGREG_POLY_D3:
            return LogRegBenchmark(descriptor, params)
        raise KeyError(f"unknown workload {wl}")
