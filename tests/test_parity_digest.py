"""Reference-parity vk_digest mode (JOLT_REFERENCE_PARITY=1).

The parity digest follows key.rs:397-428 byte-for-byte: ark
CanonicalSerialize-compressed UniformR1CS + NonUniformR1CS + num_steps u64
BE, SHA3-256, low 250 bits LE.  Without a Rust toolchain in this
environment the ground-truth bytes cannot be produced here, so these tests
(a) freeze the digest for a fixed constraint system to catch drift, and
(b) check structural properties of the serialization.
"""
import os

from jolt_tpu.field import fr_spec
from jolt_tpu.utils.math import log2_strict
from jolt_tpu.vm import r1cs as r1cs_mod
from jolt_tpu.vm.rv32i_vm import rv32i_vm
from jolt_tpu.vm.rv_trace import RAM_START_ADDRESS


def _key(num_steps=1024):
    spec = fr_spec()
    vm = rv32i_vm(spec)
    builder, non_uniform = r1cs_mod.build_jolt_constraints(
        vm.layout, vm.C, RAM_START_ADDRESS - 0x1000, vm.name_to_index,
        log2_strict(vm.M))
    return r1cs_mod.UniformSpartanKey(vm.layout, builder.constraints,
                                      non_uniform, num_steps, spec), spec


def test_parity_digest_frozen_and_distinct():
    key, spec = _key()
    default = key.vk_digest.v
    parity = key._digest_ark_parity().v
    assert parity != default
    assert parity < (1 << 250)
    # drift guard: the RV32I constraint system's parity digest is a pure
    # function of the (frozen) circuit + this serialization recipe
    key2, _ = _key()
    assert key2._digest_ark_parity().v == parity
    # num_steps is part of the digest preimage (key.rs:405)
    key3, _ = _key(num_steps=2048)
    assert key3._digest_ark_parity().v != parity


def test_parity_env_switches_digest():
    old = os.environ.get("JOLT_REFERENCE_PARITY")
    try:
        os.environ["JOLT_REFERENCE_PARITY"] = "1"
        key, _ = _key()
        assert key.vk_digest.v == key._digest_ark_parity().v
    finally:
        if old is None:
            os.environ.pop("JOLT_REFERENCE_PARITY", None)
        else:
            os.environ["JOLT_REFERENCE_PARITY"] = old
