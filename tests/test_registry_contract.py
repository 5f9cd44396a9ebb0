"""Registry contract: the exact 20 benchmark registrations of the
reference engine (/root/reference src/engine/seal_engine.cpp:108-151 —
4 EltwiseAdd + 4 EltwiseMultiply + 4 DotProduct + 6 MatMult + 2 LogReg),
pinned by name so an accidental descriptor change is a test failure."""

from reference_seal_backend_tpu.engine.descriptor import Category, Scheme
from reference_seal_backend_tpu.engine.registry import (
    Engine,
    SCHEME_NAMES,
    SECURITY_NAME,
)

EXPECTED = {
    "ckks_eltwise_add_latency",
    "bfv_eltwise_add_latency",
    "ckks_eltwise_mult_latency",
    "bfv_eltwise_mult_latency",
    "ckks_dot_product_latency",
    "bfv_dot_product_latency",
    "ckks_eltwise_add_offline",
    "bfv_eltwise_add_offline",
    "ckks_eltwise_mult_offline",
    "bfv_eltwise_mult_offline",
    "ckks_dot_product_offline",
    "bfv_dot_product_offline",
    "ckks_matrix_multiply_latency",
    "bfv_matrix_multiply_latency",
    "ckks_matrix_multiply_cipherbatchaxis_latency",
    "bfv_matrix_multiply_cipherbatchaxis_latency",
    "ckks_matrix_multiply_row_latency",
    "bfv_matrix_multiply_row_latency",
    "ckks_logistic_regression_poly_d3_latency",
    "ckks_logistic_regression_poly_d3_offline",
}


def test_exact_20_registrations():
    engine = Engine()
    assert set(engine.names()) == EXPECTED
    assert len(engine.descriptors) == 20


def test_descriptor_fields():
    engine = Engine()
    assert SCHEME_NAMES == ("CKKS", "BFV")
    assert SECURITY_NAME == "128 bits"
    for d in engine.descriptors:
        assert d.security == "128 bits"
        assert d.data_type == (
            "float64" if d.scheme is Scheme.CKKS else "int64"
        )
        assert "poly_modulus_degree" in d.default_params
        assert "mult_depth" in d.default_params
    # LogReg registers at N=16384 depth 6 like the reference
    lr = engine.find("ckks_logistic_regression_poly_d3_latency")
    assert lr.default_params["poly_modulus_degree"] == 16384
    assert lr.default_params["mult_depth"] == 6
    # Offline logreg batch registers FLEXIBLE (0), like the reference
    # (src/engine/seal_engine.cpp:151); the 100-sample default constant
    # lives in the workload (models/logreg.py DEFAULT_BATCH).
    lro = engine.find("ckks_logistic_regression_poly_d3_offline")
    assert lro.category is Category.OFFLINE
    assert lro.default_params["batch_size"] == 0
    assert lro.default_data_count == (1, 1, 0)
    from reference_seal_backend_tpu.models.logreg import DEFAULT_BATCH

    assert DEFAULT_BATCH == 100
