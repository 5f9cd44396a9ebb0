"""ChaCha20 CSPRNG (schemes/csprng.py): RFC 8439 conformance, stream
determinism, unbiased bounded sampling — the sampling layer behind keygen
and the encryptors (role parity with SEAL's Blake2 stream,
/root/reference src/engine/seal_context.cpp:46-70)."""

import numpy as np
import pytest

from reference_seal_backend_tpu.schemes.csprng import (
    ChaChaRng,
    _quarter,
    chacha_blocks,
)


def test_rfc8439_quarter_round():
    s = np.zeros((1, 16), dtype=np.uint32)
    s[0, 0] = 0x11111111
    s[0, 4] = 0x01020304
    s[0, 8] = 0x9B8D6F43
    s[0, 12] = 0x01234567
    with np.errstate(over="ignore"):
        _quarter(s, 0, 4, 8, 12)
    assert [int(x) for x in s[0, [0, 4, 8, 12]]] == [
        0xEA2A92F4,
        0xCB1CF8CE,
        0x4581472E,
        0x5881C4BB,
    ]


def test_rfc8439_block_function():
    key = np.frombuffer(bytes(range(32)), dtype="<u4").astype(np.uint32)
    nonce = np.frombuffer(
        bytes.fromhex("000000090000004a00000000"), dtype="<u4"
    ).astype(np.uint32)
    out = chacha_blocks(key, nonce, 1, 1)[0]
    want = [
        0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
        0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
        0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
        0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2,
    ]
    assert [int(x) for x in out] == want


def test_vectorized_blocks_match_sequential():
    key = np.arange(8, dtype=np.uint32) * 0x9E3779B9
    nonce = np.array([7, 8, 9], dtype=np.uint32)
    batch = chacha_blocks(key, nonce, 0, 5)
    singles = np.concatenate(
        [chacha_blocks(key, nonce, i, 1) for i in range(5)]
    )
    np.testing.assert_array_equal(batch, singles)


def test_determinism_and_stream_separation():
    a = ChaChaRng(1234, stream=1).u32(64)
    b = ChaChaRng(1234, stream=1).u32(64)
    c = ChaChaRng(1234, stream=2).u32(64)
    d = ChaChaRng(1235, stream=1).u32(64)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)


def test_seed_domain_separation():
    """Int, single-element-sequence and bytes seeds are domain-separated
    (ChaChaRng(5) != ChaChaRng([5])); arbitrary-magnitude int seeds work
    (the old fixed 32-byte field overflowed at |seed| >= 2^255)."""
    a = ChaChaRng(5).u32(32)
    b = ChaChaRng([5]).u32(32)
    c = ChaChaRng((5).to_bytes(1, "little")).u32(32)
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(b, c)
    big = ChaChaRng(1 << 300).u32(8)          # would raise before
    neg = ChaChaRng(-(1 << 300)).u32(8)
    assert not np.array_equal(big, neg)
    # widths are canonical: equal ints hash equal regardless of origin
    np.testing.assert_array_equal(
        ChaChaRng(np.int64(7)).u32(8), ChaChaRng(7).u32(8)
    )


def test_counter_carries_into_nonce():
    """The block counter is effectively 64-bit: bits >= 2^32 carry into
    nonce word 0, so the keystream never repeats at the 2^32-block wrap
    (ADVICE r4) and batched generation across the boundary matches
    sequential."""
    key = np.arange(8, dtype=np.uint32)
    nonce = np.array([0, 3, 4], dtype=np.uint32)
    lo = (1 << 32) - 1
    batch = chacha_blocks(key, nonce, lo, 3)
    singles = np.concatenate(
        [chacha_blocks(key, nonce, lo + i, 1) for i in range(3)]
    )
    np.testing.assert_array_equal(batch, singles)
    # block 2^32 == (nonce word0 + 1, counter 0): no collision with the
    # counter-0 block of the same stream
    wrapped = chacha_blocks(key, nonce, 1 << 32, 1)
    carried = chacha_blocks(
        key, np.array([1, 3, 4], dtype=np.uint32), 0, 1
    )
    np.testing.assert_array_equal(wrapped, carried)
    assert not np.array_equal(wrapped, chacha_blocks(key, nonce, 0, 1))


def test_buffered_reads_equal_one_shot():
    r1 = ChaChaRng(9)
    parts = np.concatenate([r1.u32(7), r1.u32(33), r1.u32(100)])
    np.testing.assert_array_equal(parts, ChaChaRng(9).u32(140))


def test_integers_bounds_and_uniformity():
    rng = ChaChaRng(42)
    p = 1_000_003
    draws = rng.integers(0, p, size=200_000, dtype=np.uint32)
    assert draws.min() >= 0 and draws.max() < p
    # coarse uniformity: 10 equal bins, each within 5 sigma of expectation
    hist, _ = np.histogram(draws, bins=10, range=(0, p))
    expect = draws.size / 10
    assert np.all(np.abs(hist - expect) < 5 * np.sqrt(expect))


def test_integers_signed_ternary():
    rng = ChaChaRng(7)
    t = rng.integers(-1, 2, size=300_000)
    assert set(np.unique(t)) == {-1, 0, 1}
    frac = np.bincount(t + 1) / t.size
    assert np.all(np.abs(frac - 1 / 3) < 0.01)


def test_normal_moments():
    rng = ChaChaRng(11)
    z = rng.normal(0.0, 3.2, size=400_000)
    assert abs(np.mean(z)) < 0.03
    assert abs(np.std(z) - 3.2) < 0.03
    # rounded + clamped as keys.sample_error does: stays within ±6 sigma
    e = np.clip(np.rint(z), -19, 19)
    assert e.min() >= -19 and e.max() <= 19


def test_keygen_deterministic_and_encrypt_roundtrip():
    """Same seed -> identical KeySet; encryption with the CSPRNG stream
    still decrypts (tiny N, CPU)."""
    from reference_seal_backend_tpu.schemes import ckks, keys as keys_mod
    from reference_seal_backend_tpu.schemes.params import make_ckks_context

    ctx = make_ckks_context(poly_modulus_degree=1024, mult_depth=1,
                            sec_level=0)
    k1 = keys_mod.keygen(ctx, seed=77)
    k2 = keys_mod.keygen(ctx, seed=77)
    np.testing.assert_array_equal(
        np.asarray(k1.secret_ntt), np.asarray(k2.secret_ntt)
    )
    np.testing.assert_array_equal(
        np.asarray(k1.public.b), np.asarray(k2.public.b)
    )
    k3 = keys_mod.keygen(ctx, seed=78)
    assert not np.array_equal(
        np.asarray(k1.secret_ntt), np.asarray(k3.secret_ntt)
    )
    enc = ckks.CkksEncoder(ctx)
    er = ckks.CkksEncryptor(ctx, k1, seed=5)
    dec = ckks.CkksDecryptor(ctx, k1)
    v = np.random.default_rng(0).uniform(-1, 1, ctx.slots)
    got = np.real(dec.decrypt(er.encrypt_pt(enc.encode(v))))
    assert np.max(np.abs(got - v)) < 5e-5
    # unseeded encryptors draw distinct OS-entropy streams
    e1 = ckks.CkksEncryptor(ctx, k1)
    e2 = ckks.CkksEncryptor(ctx, k1)
    c1 = e1.encrypt_pt(enc.encode(v))
    c2 = e2.encrypt_pt(enc.encode(v))
    assert not np.array_equal(np.asarray(c1.data), np.asarray(c2.data))
