"""Batched encryption: one jitted dispatch for a whole [B, L, N] batch,
bit-identical to per-sample encryption with the same ChaCha stream.

The Offline categories encrypt 100+ samples per run; the per-sample loop
paid 3 host->device uploads + 1 dispatch per sample over the tunneled
chip (the reference encrypts per-sample under OpenMP,
/root/reference src/benchmarks/ckks/seal_ckks_element_wise_benchmark.cpp:277-304).
Draw-order parity (u, e0, e1 per sample, batch order) keeps seeded runs
reproducible across both paths.
"""

from dataclasses import replace

import numpy as np
import jax.numpy as jnp
import pytest

from reference_seal_backend_tpu.schemes import bfv, ckks, keys as keys_mod
from reference_seal_backend_tpu.schemes.params import (
    make_bfv_context,
    make_ckks_context,
)

N = 2048
B = 3


@pytest.fixture(scope="module")
def ckks_ctx():
    ctx = make_ckks_context(poly_modulus_degree=N, mult_depth=2, sec_level=0)
    return ctx, keys_mod.keygen(ctx, seed=7)


@pytest.fixture(scope="module")
def bfv_ctx():
    ctx = make_bfv_context(poly_modulus_degree=N, sec_level=0)
    return ctx, keys_mod.keygen(ctx, seed=7, need_relin=False)


def test_ckks_batched_encrypt_bit_exact(ckks_ctx):
    ctx, ks = ckks_ctx
    enc = ckks.CkksEncoder(ctx)
    rng = np.random.default_rng(0)
    vals = [rng.uniform(-1, 1, ctx.slots) for _ in range(B)]
    pts = [enc.encode(v) for v in vals]
    batched = replace(pts[0], data=jnp.stack([p.data for p in pts]))
    ct_b = ckks.CkksEncryptor(ctx, ks, seed=42).encrypt_pt(batched)
    er = ckks.CkksEncryptor(ctx, ks, seed=42)
    ref = jnp.stack([er.encrypt_pt(p).data for p in pts])
    assert ct_b.data.shape == (B, 2, ctx.L, ctx.n)
    assert jnp.array_equal(ct_b.data, ref)
    got = np.real(ckks.CkksDecryptor(ctx, ks).decrypt(ct_b))
    assert float(np.max(np.abs(got - np.stack(vals)))) < 5e-5


def test_bfv_batched_encrypt_bit_exact(bfv_ctx):
    ctx, ks = bfv_ctx
    enc = bfv.BfvBatchEncoder(ctx)
    rng = np.random.default_rng(0)
    vals = [rng.integers(-50, 50, ctx.slots) for _ in range(B)]
    pts = [enc.encode(v) for v in vals]
    batched = replace(pts[0], data=jnp.stack([p.data for p in pts]))
    ct_b = bfv.BfvEncryptor(ctx, ks, seed=42).encrypt_pt(batched)
    er = bfv.BfvEncryptor(ctx, ks, seed=42)
    ref = jnp.stack([er.encrypt_pt(p).data for p in pts])
    assert jnp.array_equal(ct_b.data, ref)
    got = bfv.BfvDecryptor(ctx, ks).decrypt(ct_b)
    assert np.array_equal(got, np.stack(vals))


def test_unbatched_shape_unchanged(ckks_ctx):
    ctx, ks = ckks_ctx
    enc = ckks.CkksEncoder(ctx)
    pt = enc.encode(np.zeros(ctx.slots))
    ct = ckks.CkksEncryptor(ctx, ks, seed=1).encrypt_pt(pt)
    assert ct.data.shape == (2, ctx.L, ctx.n)
