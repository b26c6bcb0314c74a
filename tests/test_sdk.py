"""SDK façade: build_provable returns (prove, verify) closures sharing one
preprocessing — the jolt-sdk macro contract (jolt-sdk/macros/src/lib.rs:
89-128: build_f() -> (prove_closure, verify_closure))."""
from jolt_tpu.sdk import build_provable
from jolt_tpu.vm.host import fibonacci_program


def test_sdk_prove_verify_fib_mock():
    prove, verify = build_provable(fibonacci_program(8), pcs="mock")
    outputs, artifacts = prove()
    assert artifacts.trace_length > 8
    assert verify(artifacts)


def test_sdk_preprocessing_reused_across_calls():
    prove, verify = build_provable(fibonacci_program(8), pcs="mock")
    _, a1 = prove()
    _, a2 = prove()  # second call reuses the cached preprocessing
    assert verify(a1) and verify(a2)
