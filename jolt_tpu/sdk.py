"""High-level one-call proving façade — the Python analog of the
reference SDK's ``#[jolt::provable]`` macro output.

The reference macro (jolt-sdk/macros/src/lib.rs:89-128) expands each guest
function into ``build_f() -> (prove_closure, verify_closure)`` where the two
closures share one preprocessing and the prove closure returns
``(output, proof)``.  Here the guest is an assembled RV32IM program (a list
of ``ELFInstruction`` or raw ELF bytes) instead of a Rust fn, and the same
shape is kept: :func:`build_provable` returns ``(prove, verify)`` closures
over a lazily-built, cached preprocessing.

    prove, verify = build_provable(sha2_chain_program(1))
    outputs, artifacts = prove(b"\x05" * 32)
    assert verify(artifacts)

Preprocessing (SRS + bytecode commitment) is constructed on the first
``prove`` call — the SRS must cover the traced length, which is only known
once inputs exist (mirrors rv32i_vm.rs:193-235 where preprocess() takes
max_trace_length) — and is reused across subsequent calls whenever the new
trace still fits.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


@dataclass
class ProveArtifacts:
    """Everything ``verify`` needs; mirrors the reference prove output
    tuple (jolt-sdk/macros/src/lib.rs:115-127: output + RV32IHyraxProof)."""
    proof: object
    commitments: object
    outputs: bytes
    trace_length: int


def build_provable(program, *, pcs: str = "hyperkzg", spec=None,
                   min_srs_log2: int = 0):
    """Return ``(prove, verify)`` closures sharing one cached preprocessing.

    ``program``: ``list[ELFInstruction]`` (mini-assembler output) or raw
    ELF bytes (decoded via tracer/elf.py, the host/mod.rs:168-175 path).
    ``pcs``: "hyperkzg" (reference production default, rv32i_vm.rs:228) or
    "mock" (transcript-only, fast tests).
    """
    from .vm.rv32i_vm import rv32i_vm
    from .field import fr_spec

    spec = spec or fr_spec()
    vm = rv32i_vm(spec)
    if isinstance(program, (bytes, bytearray)):
        from .tracer.elf import decode_elf
        program = decode_elf(bytes(program))

    state = {"pre": None, "srs_len": 0}

    def _preprocess(n: int, bytecode_rows):
        if state["pre"] is not None and state["srs_len"] >= n:
            return state["pre"]
        if pcs == "hyperkzg":
            from .commitment.hyperkzg import HyperKZG
            scheme = HyperKZG.setup(max(n, 1 << min_srs_log2))
        elif pcs == "mock":
            from .commitment.mock import MockCommitmentScheme
            scheme = MockCommitmentScheme(spec)
        else:
            raise ValueError(f"unknown pcs {pcs!r}")
        state["pre"] = vm.preprocess(bytecode_rows, scheme)
        state["srs_len"] = max(n, 1 << min_srs_log2)
        return state["pre"]

    def prove(inputs: bytes = b"") -> tuple[bytes, ProveArtifacts]:
        from .vm.host import trace_program
        steps, device, bytecode_rows = trace_program(program, vm,
                                                     inputs=inputs)
        pre = _preprocess(vm.required_srs_len(device, steps, bytecode_rows),
                          bytecode_rows)
        proof, commitments, _, _ = vm.prove(device, steps, pre)
        outputs = bytes(device.outputs)
        return outputs, ProveArtifacts(proof, commitments, outputs,
                                       len(steps))

    def verify(artifacts: ProveArtifacts) -> bool:
        assert state["pre"] is not None, "prove() must run first (builds " \
            "the shared preprocessing, jolt-sdk lib.rs build_* contract)"
        vm.verify(state["pre"], artifacts.proof, artifacts.commitments)
        return True

    return prove, verify
