"""Logistic-regression inference workload (CKKS, PolyD3 sigmoid).

TPU-native counterpart of ``sbe::ckks::LogRegHornerBenchmark``
(/root/reference src/benchmarks/ckks/seal_ckks_logreg_horner.cpp:388-481):
``sigmoid(W·x + b)`` per input, sigmoid approximated by the degree-3
polynomial with coefficients {0.5, 0.15012, 0.0, -0.0015930078125}
(include/benchmarks/ckks/seal_ckks_logreg_horner.h:117).

Pipeline per offline batch (one jitted graph):
  1. dot products: W × X_i multiply → relinearize → accumulate → rescale,
     the whole batch as one broadcast axis (reference: OMP loop :421-447);
  2. collapse the batch of slot-0 dots into one ciphertext, value i in
     slot i (reference collapseCKKS; here the log2 doubling merge of
     evaluator/composite.py);
  3. bias add with level matching (:459-465);
  4. Horner evaluation of the sigmoid polynomial (:475-476).

Operands arrive as the 3-tuple (W, b, X) matching the reference's
EncodedOpParams handle (…logreg_horner.h:112-115); Offline data counts are
{1, 1, batch} (…logreg_horner.cpp:38-45).
"""

from __future__ import annotations

from dataclasses import replace
from typing import List, Sequence

import numpy as np
import jax

from reference_seal_backend_tpu.engine.descriptor import BenchmarkDescriptor
from reference_seal_backend_tpu.evaluator import composite
from reference_seal_backend_tpu.models.base import Handle, HEBenchmark

SIGMOID_D3 = (0.5, 0.15012, 0.0, -0.0015930078125)
# The reference's default batch constant behind the FLEXIBLE (0)
# registration (include/benchmarks/ckks/seal_ckks_logreg_horner.h:24).
DEFAULT_BATCH = 100


class LogRegBenchmark(HEBenchmark):
    tag_family = "logreg"
    n_operands = 3  # (W, b, X) — the reference's EncodedOpParams triple

    def __init__(self, descriptor: BenchmarkDescriptor, params=None):
        p = dict(descriptor.default_params)
        if params:
            p.update(params)
        self.n = p["n"]
        self.batch = (
            (p.get("batch_size", 0) or DEFAULT_BATCH)
            if descriptor.category.value == "offline"
            else 1
        )
        super().__init__(descriptor, params)
        if self.n > self.ctx.slots:
            raise ValueError("feature count exceeds slot count")
        if self.batch > self.ctx.slots:
            raise ValueError("batch exceeds slot count")
        # The pipeline compiles as three stage graphs instead of one
        # monolith: at N=32768/depth-6 a single operate graph is too large
        # for practical compile times, and the stage split costs nothing
        # at runtime (each stage is still one fused XLA graph; the timed
        # operate blocks once at the end).  jax.jit of the full
        # _operate_impl remains available for the driver's compile check.
        self._stage_dots = self.jit_with_keys(self._dots_impl)
        self._stage_collapse = self.jit_with_keys(self._collapse_impl)
        self._stage_sigmoid = self.jit_with_keys(self._sigmoid_impl)
        # Offline batches lift key-switch digits for every sample at once
        # inside the dots stage — [batch, 2, n_dig, l+ns, N] uint32 HLO
        # temporaries.  At batch=100, N=16384 that is >1 GB per buffer and
        # the stage OOMs a 16 GB v5e HBM (measured: 19.24G program).  The
        # dots are embarrassingly parallel across samples, so operate()
        # runs the stage in equal chunks sized to ~512 MB of digit
        # temporaries (one extra graph shape at most), then concatenates
        # for the collapse stage.  Override with the ``dots_chunk`` param
        # (0 = never chunk).
        ctx = self.ctx
        nd = ctx.dig_count(ctx.L)
        digit_row_bytes = 2 * nd * (ctx.L + ctx.n_special) * ctx.n * 4
        auto = max(1, (512 << 20) // digit_row_bytes)
        self.dots_chunk = int(p.get("dots_chunk", auto))

    def rotation_steps(self) -> List[int]:
        steps = composite.rotations_for_accumulate(self.n, self.ctx.slots)
        steps += composite.collapse_rotation_steps(self.batch)
        return steps

    # -- pipeline --------------------------------------------------------- #

    def encode(self, inputs: Sequence[np.ndarray]) -> Handle:
        """inputs = [W [n], b scalar, X [batch, n]]."""
        w = np.asarray(inputs[0]).reshape(self.n)
        b = float(np.asarray(inputs[1]).reshape(()))
        x = np.atleast_2d(np.asarray(inputs[2]))
        pt_w = self.encode_batch(w[None])
        # bias replicated across slots so it lands on every collapsed dot
        pt_b = self.encode_batch(np.full((1, self.ctx.slots), b))
        pt_x = self.encode_batch(x)
        return Handle(tag="logreg_pt", payload=(pt_w, pt_b, pt_x))

    def encrypt(self, encoded: Handle) -> Handle:
        self.check_handle(encoded, "pt")
        cts = tuple(self.encrypt_batch(pt) for pt in encoded.payload)
        return Handle(tag="logreg_ct", payload=cts)

    def _dots_impl(self, w, x):
        ev = self.ev
        # 1) batched dot products W·X_i  (w broadcasts over x's batch axis)
        w1 = replace(w, data=w.data[0])
        prod = ev.relinearize(ev.multiply(w1, x))
        prod = ev.rescale_to_next(prod)
        return composite.accumulate(ev, prod, self.n)

    def _collapse_impl(self, dots):
        # 2) collapse batch into slots of one ciphertext
        return composite.collapse(self.ev, dots, self.batch)

    def _sigmoid_impl(self, collapsed, b):
        ev = self.ev
        # 3) bias add at matched level and scale
        b1 = replace(b, data=b.data[0])
        b1 = ev.mod_switch_to(b1, collapsed.level)
        b1 = replace(b1, scale=collapsed.scale)  # |Δscale| < 2^-40 relative
        z = ev.add(collapsed, b1)
        # 4) sigmoid ≈ degree-3 Horner
        return composite.evaluate_polynomial(ev, z, SIGMOID_D3)

    def _operate_impl(self, w, b, x):
        """Whole pipeline as one traceable function (driver compile check
        and small-N tests jit this directly)."""
        return self._sigmoid_impl(self._collapse_impl(self._dots_impl(w, x)), b)

    def operate(self, loaded: Handle) -> Handle:
        import jax.numpy as jnp

        self.check_handle(loaded, "ct")
        w, b, x = loaded.payload
        batch = x.data.shape[0]
        if self.dots_chunk and batch > self.dots_chunk:
            n_chunks = -(-batch // self.dots_chunk)
            chunk = -(-batch // n_chunks)  # equalized chunk size
            # pad to n_chunks*chunk so every chunk shares ONE graph shape
            # (zero rows are trivial encryptions of 0, sliced away below)
            pad = n_chunks * chunk - batch
            xd = x.data
            if pad:
                xd = jnp.concatenate(
                    [xd, jnp.zeros_like(xd[:pad])], axis=0
                )
            parts = [
                self._stage_dots(w, replace(x, data=xd[i : i + chunk]))
                for i in range(0, n_chunks * chunk, chunk)
            ]
            dots = replace(
                parts[0],
                data=jnp.concatenate([pt.data for pt in parts], axis=0)[
                    :batch
                ],
            )
        else:
            dots = self._stage_dots(w, x)
        out = self._stage_sigmoid(self._stage_collapse(dots), b)
        return Handle(tag="logreg_result", payload=out)

    def decrypt(self, stored: Handle) -> Handle:
        self.check_handle(stored, "result")
        vals = next(self.decrypt_each(stored.payload, ()))
        return Handle(tag="logreg_clear", payload=vals)

    def decode(self, decrypted: Handle) -> List[np.ndarray]:
        self.check_handle(decrypted, "clear")
        return [self.clamp_ckks(decrypted.payload[: self.batch])]
