"""HE-standard 128-bit security enforcement.

The reference constructs every SEAL context with security enforcement on
(``std::make_shared<seal::SEALContext>(parameters, true, sec_level)`` with
tc128, /root/reference src/engine/seal_context.cpp:89-90, 118-119): SEAL
refuses parameter sets whose total coeff modulus exceeds the HE-standard
bound for the polynomial degree.  This framework mirrors that contract in
``Context.__init__`` (schemes/params.py): sec_level=128 (the default)
raises ``InsecureParametersError`` on violating chains; sec_level=0 is the
explicit test-config opt-out, and ``describe()['security']`` is computed
from the actual chain, never asserted.
"""

import pytest

from reference_seal_backend_tpu.schemes.params import (
    HE_STD_128_CLASSICAL,
    InsecureParametersError,
    make_bfv_context,
    make_ckks_context,
    max_coeff_bits_128,
)


def test_he_std_table():
    # HE Security Standard v1.1 Table 1, ternary secret, classical 128-bit
    # (the table behind seal::CoeffModulus::MaxBitCount(n, tc128)).
    assert HE_STD_128_CLASSICAL[2048] == 54
    assert HE_STD_128_CLASSICAL[8192] == 218
    assert HE_STD_128_CLASSICAL[16384] == 438
    assert max_coeff_bits_128(512) == 0  # below the table: never secure


def test_small_n_rejected_by_default():
    """N=2048 with the default ~150-bit chain must be refused under the
    128-bit default, exactly like SEALContext under tc128."""
    with pytest.raises(InsecureParametersError):
        make_ckks_context(poly_modulus_degree=2048, mult_depth=2)
    with pytest.raises(InsecureParametersError):
        make_bfv_context(poly_modulus_degree=2048, n_data_primes=3)


def test_small_n_allowed_with_optout():
    ctx = make_ckks_context(poly_modulus_degree=2048, mult_depth=2, sec_level=0)
    assert not ctx.secure_128
    assert ctx.total_coeff_bits > ctx.max_secure_bits == 54


def test_depth3_n8192_rejected():
    """The composite depth-3 chain at N=8192 is 251 bits against the
    218-bit cap — the reason the matmult descriptors register depth 2."""
    with pytest.raises(InsecureParametersError):
        make_ckks_context(poly_modulus_degree=8192, mult_depth=3)


def test_all_default_descriptors_secure():
    """Every (scheme, N, depth) combination registered by the 20 default
    descriptors builds under full 128-bit enforcement."""
    from reference_seal_backend_tpu.engine.descriptor import (
        Scheme,
        default_descriptors,
    )

    combos = set()
    for d in default_descriptors():
        p = d.default_params
        combos.add((d.scheme, p["poly_modulus_degree"], p["mult_depth"]))
    assert len(combos) >= 3
    for scheme, n, depth in sorted(combos, key=str):
        if scheme is Scheme.CKKS:
            ctx = make_ckks_context(poly_modulus_degree=n, mult_depth=depth)
        else:
            ctx = make_bfv_context(poly_modulus_degree=n, mult_depth=depth)
        assert ctx.secure_128, (scheme, n, depth, ctx.total_coeff_bits)
