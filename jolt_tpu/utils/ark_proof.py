"""arkworks CanonicalSerialize byte layout for full Jolt proofs.

The reference persists proofs as `JoltHyperKZGProof { proof, commitments }`
via ark-serialize's derived `serialize_compressed`
(jolt-core/src/jolt/vm/rv32i_vm.rs:193-235, common/src/serializable.rs).
This module emits the EXACT same byte layout from jolt_tpu's proof
objects, so a Rust `Jolt::verify` could consume the bytes the day an
arkworks toolchain is available (VERDICT r3 item 7).

Derived CanonicalSerialize rules (ark-serialize 0.4):
  - struct: fields in declaration order, recursively
  - usize / u64: 8 bytes little-endian
  - bool / u8: 1 byte
  - Vec<T>: u64 LE length prefix + elements
  - [T; N]: N elements, NO length prefix
  - (A, B, ...): element-wise
  - Option<T>: 1 tag byte (0 = None, 1 = Some) + payload
  - PhantomData / unit structs: 0 bytes
  - Fr: 32 bytes LE canonical (ark_serialize.fr_to_bytes)
  - G1Affine compressed: 32 bytes (ark_serialize.g1_to_compressed)

Struct declaration orders are mirrored from the reference:
  JoltProof                 jolt/vm/mod.rs:102-118
  JoltDevice/MemoryLayout   common/src/rv_trace.rs:14-30, 706-720
  MemoryCheckingProof       lasso/memory_checking.rs (multiset_hashes,
                            rw_gp, if_gp, openings, exogenous_openings)
  MultisetHashes            lasso/memory_checking.rs
  BatchedGrandProductProof  subprotocols/grand_product.rs (layers,
                            quark_proof: Option)
  BatchedGrandProductLayerProof (proof, left_claims, right_claims)
  SumcheckInstanceProof     subprotocols/sumcheck.rs (compressed_polys)
  CompressedUniPoly         poly/unipoly.rs (coeffs_except_linear_term)
  ReadWriteMemoryProof      jolt/vm/read_write_memory.rs (mc, TS, output)
  OutputSumcheckProof       (num_rounds, sumcheck_proof, opening)
  TimestampValidityProof    jolt/vm/timestamp_range_check.rs
                            (multiset_hashes, openings, exogenous, gp)
  InstructionLookupsProof   jolt/vm/instruction_lookups.rs
                            (primary_sumcheck, memory_checking)
  PrimarySumcheck           (sumcheck_proof, num_rounds, openings)
  UniformSpartanProof       r1cs/spartan.rs (outer proof, claims tuple,
                            inner proof, claimed_witness_evals)
  ReducedOpeningProof       poly/opening_proof.rs (sumcheck_proof,
                            sumcheck_claims, joint_opening_proof)
  HyperKZGProof             poly/commitment/hyperkzg.rs (com, w, v)
  JoltStuff (commitments)   jolt/vm/mod.rs:120-133 + per-component
                            *Stuff structs (bytecode.rs:31, rwm.rs,
                            instruction_lookups.rs, ts.rs, r1cs/inputs.rs)

Fork-gutted openings (memory_checking.rs:330-384 commented out) serialize
as their `initialize`/Default values: zero Fr scalars, Vec lengths from
preprocessing (instruction_lookups.rs:88-103), None for every
VerifierComputedOpening.
"""
from __future__ import annotations

import io
import struct

from .ark_serialize import fr_to_bytes, fr_from_bytes, g1_to_compressed, \
    g1_from_compressed

MEMORY_OPS_PER_INSTRUCTION = 7   # common/src/constants.rs:8 (3 reg + 4 ram)


# ---------------------------------------------------------------------------
# primitive writers
# ---------------------------------------------------------------------------

def _w_u64(out, v: int) -> None:
    out.write(struct.pack("<Q", v))


def _w_u8(out, v: int) -> None:
    out.write(bytes([v & 0xFF]))


def _w_fr(out, x) -> None:
    out.write(fr_to_bytes(x.v if hasattr(x, "v") else int(x)))


def _w_fr_vec(out, xs) -> None:
    _w_u64(out, len(xs))
    for x in xs:
        _w_fr(out, x)


def _w_g1(out, p) -> None:
    out.write(g1_to_compressed(p))


def _w_none(out) -> None:
    _w_u8(out, 0)


def _w_sumcheck(out, proof) -> None:
    """SumcheckInstanceProof: Vec<CompressedUniPoly{Vec<F>}>."""
    _w_u64(out, len(proof.compressed_polys))
    for cp in proof.compressed_polys:
        _w_fr_vec(out, cp.coeffs_except_linear_term)


def _w_gp_proof(out, proof) -> None:
    """BatchedGrandProductProof: Vec<layer> + Option<quark> (None — the
    dense/toggled provers never emit a quark hybrid in the fork's VM)."""
    assert getattr(proof, "quark", None) is None, \
        "quark hybrid GP serialization not wired (unused by the VM prover)"
    _w_u64(out, len(proof.layers))
    for lay in proof.layers:
        _w_sumcheck(out, lay.proof)
        _w_fr_vec(out, lay.left_claims)
        _w_fr_vec(out, lay.right_claims)
    _w_none(out)   # quark_proof


def _w_multiset_hashes(out, h) -> None:
    _w_fr_vec(out, h.read_hashes)
    _w_fr_vec(out, h.write_hashes)
    _w_fr_vec(out, h.init_hashes)
    _w_fr_vec(out, h.final_hashes)


class _Zero:
    """Stand-in zero Fr for gutted openings."""
    v = 0


_Z = _Zero()


def _w_bytecode_openings(out) -> None:
    """BytecodeStuff<F> default: a_read_write, v_read_write[6], t_read,
    t_final (zeros), a_init_final None, v_init_final None."""
    for _ in range(1 + 6 + 1 + 1):
        _w_fr(out, _Z)
    _w_none(out)
    _w_none(out)


def _w_rwm_openings(out) -> None:
    """ReadWriteMemoryStuff<F> default: a_ram, v_read[7], v_write_rd,
    v_write_ram[4], v_final, t_read[7], t_write_ram[4], t_final zeros +
    3 None (a_init_final, v_init, identity)."""
    for _ in range(1 + MEMORY_OPS_PER_INSTRUCTION + 1 + 4 + 1
                   + MEMORY_OPS_PER_INSTRUCTION + 4 + 1):
        _w_fr(out, _Z)
    for _ in range(3):
        _w_none(out)


def _w_register_address_openings(out) -> None:
    """RegisterAddressOpenings<F>: a_rd, a_rs1, a_rs2 (gutted -> zeros)."""
    for _ in range(3):
        _w_fr(out, _Z)


def _w_il_openings(out, C: int, num_memories: int, num_instructions: int
                   ) -> None:
    """InstructionLookupStuff<F> via initialize (instruction_lookups.rs:
    88-103): Vec lengths from preprocessing, zero values, None options."""
    _w_fr_vec(out, [_Z] * C)                   # dim
    _w_fr_vec(out, [_Z] * num_memories)        # read_cts
    _w_fr_vec(out, [_Z] * num_memories)        # final_cts
    _w_fr_vec(out, [_Z] * num_memories)        # E_polys
    _w_fr_vec(out, [_Z] * num_instructions)    # instruction_flags
    _w_fr(out, _Z)                             # lookup_outputs
    _w_none(out)                               # instruction_flag_bitvectors
    _w_none(out)                               # a_init_final
    _w_none(out)                               # v_init_final


def _w_memory_layout(out, ml) -> None:
    for f in ("ram_witness_offset", "max_input_size", "max_output_size",
              "input_start", "input_end", "output_start", "output_end",
              "panic"):
        _w_u64(out, int(getattr(ml, f)))


def _w_jolt_device(out, dev) -> None:
    inputs = bytes(dev.inputs)
    outputs = bytes(dev.outputs)
    _w_u64(out, len(inputs))
    out.write(inputs)
    _w_u64(out, len(outputs))
    out.write(outputs)
    _w_u8(out, 1 if dev.panic else 0)
    _w_memory_layout(out, dev.memory_layout)


def _w_memory_checking_proof(out, mc, openings_writer, exo_writer) -> None:
    _w_multiset_hashes(out, mc.multiset_hashes)
    _w_gp_proof(out, mc.read_write_grand_product)
    _w_gp_proof(out, mc.init_final_grand_product)
    openings_writer(out)
    exo_writer(out)


def _w_hyperkzg_proof(out, pf) -> None:
    _w_u64(out, len(pf.com))
    for p in pf.com:
        _w_g1(out, p)
    _w_u64(out, len(pf.w))
    for p in pf.w:
        _w_g1(out, p)
    _w_u64(out, len(pf.v))
    for row in pf.v:
        _w_fr_vec(out, row)


def serialize_jolt_proof(proof, C: int, num_memories: int,
                         num_instructions: int) -> bytes:
    """RV32IJoltProof ark-compressed bytes (jolt/vm/mod.rs:102-118)."""
    out = io.BytesIO()
    _w_u64(out, proof.trace_length)
    _w_jolt_device(out, proof.program_io)

    # bytecode: MemoryCheckingProof<_, BytecodeOpenings, NoExogenous>
    _w_memory_checking_proof(out, proof.bytecode, _w_bytecode_openings,
                             lambda o: None)

    # read_write_memory: (memory_checking, TIMESTAMP, output) — note the
    # serialization order differs from the prove order
    rwm = proof.read_write_memory
    _w_memory_checking_proof(out, rwm.memory_checking_proof,
                             _w_rwm_openings, _w_register_address_openings)
    ts = rwm.timestamp_validity_proof
    _w_multiset_hashes(out, ts.multiset_hashes)
    for x in ts.openings:          # TimestampRangeCheckStuff: 4 x [F; 7]
        _w_fr(out, x)
    _w_none(out)                   # identity: VerifierComputedOpening
    for x in ts.exogenous_openings:  # ReadTimestampOpenings = [F; 7]
        _w_fr(out, x)
    _w_gp_proof(out, ts.batched_grand_product)
    op = rwm.output_proof
    _w_u64(out, op.num_rounds)
    _w_sumcheck(out, op.sumcheck_proof)
    _w_fr(out, op.opening)

    # instruction_lookups
    il = proof.instruction_lookups
    ps = il.primary_sumcheck
    _w_sumcheck(out, ps.sumcheck_proof)
    _w_u64(out, ps.num_rounds)
    _w_fr_vec(out, ps.openings.E_poly_openings)
    _w_fr_vec(out, ps.openings.flag_openings)
    _w_fr(out, ps.openings.lookup_outputs_opening)
    _w_memory_checking_proof(
        out, il.memory_checking,
        lambda o: _w_il_openings(o, C, num_memories, num_instructions),
        lambda o: None)

    # r1cs: UniformSpartanProof
    sp = proof.r1cs
    _w_sumcheck(out, sp.outer_sumcheck_proof)
    for c in sp.outer_sumcheck_claims:
        _w_fr(out, c)
    _w_sumcheck(out, sp.inner_sumcheck_proof)
    _w_fr_vec(out, sp.claimed_witness_evals)

    # opening_proof: ReducedOpeningProof
    ro = proof.opening_proof
    _w_sumcheck(out, ro.sumcheck_proof)
    _w_fr_vec(out, ro.sumcheck_claims)
    _w_hyperkzg_proof(out, ro.joint_opening_proof)
    return out.getvalue()


# ---------------------------------------------------------------------------
# commitments: JoltStuff<HyperKZGCommitment> (jolt/vm/mod.rs:120-133)
# ---------------------------------------------------------------------------

def serialize_jolt_commitments(rw_commitments: list, if_commitments: list,
                               layout) -> bytes:
    """Map the repo's rw/if commitment lists (vm/commit_layout.py order)
    into the ark JoltStuff section order.  Each HyperKZGCommitment
    serializes as one compressed G1 point."""
    rw = lambda name: layout.rw(rw_commitments, name)
    rw1 = lambda name: layout.rw1(rw_commitments, name)
    out = io.BytesIO()
    g1 = lambda c: _w_g1(out, c.point)

    # BytecodeStuff: a_read_write, v_read_write[6], t_read, t_final, 2 None
    g1(rw1("bc_a_read_write"))
    for c in rw("bc_v_read_write"):
        g1(c)
    g1(rw1("bc_t_read"))
    g1(layout.if1(if_commitments, "bc_t_final"))
    _w_none(out)
    _w_none(out)

    # ReadWriteMemoryStuff: a_ram, v_read[7], v_write_rd, v_write_ram[4],
    # v_final, t_read[7], t_write_ram[4], t_final, 3 None
    g1(rw1("ram_a"))
    for c in rw("ram_v_read"):
        g1(c)
    g1(rw1("ram_v_write_rd"))
    for c in rw("ram_v_write_ram"):
        g1(c)
    g1(layout.if1(if_commitments, "ram_v_final"))
    for c in rw("ram_t_read"):
        g1(c)
    for c in rw("ram_t_write_ram"):
        g1(c)
    g1(layout.if1(if_commitments, "ram_t_final"))
    for _ in range(3):
        _w_none(out)

    # InstructionLookupStuff: dim, read_cts, final_cts, E_polys,
    # instruction_flags (Vecs), lookup_outputs, 3 None
    for name in ("il_dim", "il_read_cts"):
        cs = rw(name)
        _w_u64(out, len(cs))
        for c in cs:
            g1(c)
    cs = layout.if_(if_commitments, "il_final_cts")
    _w_u64(out, len(cs))
    for c in cs:
        g1(c)
    for name in ("il_E", "il_flags"):
        cs = rw(name)
        _w_u64(out, len(cs))
        for c in cs:
            g1(c)
    g1(rw1("il_outputs"))
    _w_none(out)   # instruction_flag_bitvectors
    _w_none(out)   # a_init_final
    _w_none(out)   # v_init_final

    # TimestampRangeCheckStuff: 4 x [T; 7], identity None
    for name in ("ts_read_cts_read_timestamp",
                 "ts_read_cts_global_minus_read",
                 "ts_final_cts_read_timestamp",
                 "ts_final_cts_global_minus_read"):
        for c in rw(name):
            g1(c)
    _w_none(out)

    # R1CSStuff: chunks_x (Vec), chunks_y (Vec),
    # circuit_flags [T; NUM_CIRCUIT_FLAGS], aux AuxVariableStuff
    for name in ("r1cs_chunks_x", "r1cs_chunks_y"):
        cs = rw(name)
        _w_u64(out, len(cs))
        for c in cs:
            g1(c)
    for c in rw("r1cs_circuit_flags"):
        g1(c)
    # AuxVariableStuff: 4 scalars, relevant_y_chunks Vec, 5 scalars
    # (r1cs/inputs.rs:32-44); the repo's aux section is flat in that order
    aux = rw("r1cs_aux")
    n_y_chunks = len(aux) - 9
    for c in aux[:4]:
        g1(c)
    _w_u64(out, n_y_chunks)
    for c in aux[4:4 + n_y_chunks]:
        g1(c)
    for c in aux[4 + n_y_chunks:]:
        g1(c)
    return out.getvalue()


def serialize_jolt_hyperkzg_proof(proof, rw_commitments, if_commitments,
                                  layout, C: int, num_memories: int,
                                  num_instructions: int) -> bytes:
    """JoltHyperKZGProof { proof, commitments } (rv32i_vm.rs:226-233)."""
    return (serialize_jolt_proof(proof, C, num_memories, num_instructions)
            + serialize_jolt_commitments(rw_commitments, if_commitments,
                                         layout))


# ---------------------------------------------------------------------------
# SurgeProof (lasso/surge.rs) — for the bench's compressed-proof-size print
# (bench.rs:100-170 serialize_and_print_size)
# ---------------------------------------------------------------------------

def serialize_surge_proof(proof, num_memories: int) -> bytes:
    """SurgeProof ark-compressed bytes: commitments (SurgeStuff: dim[C],
    read_cts[C], E[m], final_cts[C] Vecs + 2 None), primary sumcheck,
    memory checking with default SurgeOpenings (surge.rs:50-68)."""
    out = io.BytesIO()
    C = proof.C
    rw = proof.commitments          # dim(C) ‖ read_cts(C) ‖ E(m)
    fin = proof.final_commitments   # final_cts(C)
    assert len(rw) == 2 * C + num_memories and len(fin) == C

    def g1_vec(cs):
        _w_u64(out, len(cs))
        for c in cs:
            _w_g1(out, c.point)

    g1_vec(rw[:C])                      # dim
    g1_vec(rw[C:2 * C])                 # read_cts
    g1_vec(rw[2 * C:])                  # E_polys
    g1_vec(fin)                         # final_cts
    _w_none(out)                        # a_init_final
    _w_none(out)                        # v_init_final

    ps = proof.primary_sumcheck
    _w_sumcheck(out, ps.sumcheck_proof)
    _w_u64(out, ps.num_rounds)
    _w_fr(out, ps.claimed_evaluation)
    _w_fr_vec(out, ps.E_poly_openings)

    def surge_openings(o):
        _w_fr_vec(o, [_Z] * C)               # dim
        _w_fr_vec(o, [_Z] * C)               # read_cts
        _w_fr_vec(o, [_Z] * C)               # final_cts
        _w_fr_vec(o, [_Z] * num_memories)    # E_polys
        _w_none(o)
        _w_none(o)

    _w_memory_checking_proof(out, proof.memory_checking, surge_openings,
                             lambda o: None)
    return out.getvalue()


# ---------------------------------------------------------------------------
# deserialization (round-trip integrity; a Rust verifier would use ark)
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, data: bytes):
        self.b = io.BytesIO(data)

    def u64(self) -> int:
        return struct.unpack("<Q", self.b.read(8))[0]

    def u8(self) -> int:
        return self.b.read(1)[0]

    def fr(self) -> int:
        return fr_from_bytes(self.b.read(32))

    def fr_vec(self) -> list[int]:
        return [self.fr() for _ in range(self.u64())]

    def g1(self):
        return g1_from_compressed(self.b.read(32))

    def none(self) -> None:
        assert self.u8() == 0, "expected None option tag"

    def sumcheck(self) -> list[list[int]]:
        return [self.fr_vec() for _ in range(self.u64())]

    def gp(self) -> list:
        layers = [(self.sumcheck(), self.fr_vec(), self.fr_vec())
                  for _ in range(self.u64())]
        self.none()
        return layers

    def multiset(self):
        return (self.fr_vec(), self.fr_vec(), self.fr_vec(), self.fr_vec())

    def eof(self) -> bool:
        return self.b.read(1) == b""


def deserialize_jolt_proof_structure(data: bytes, C: int, num_memories: int,
                                     num_instructions: int) -> dict:
    """Parse ark bytes back into a nested plain-python structure (ints for
    Fr, G1Affine for points).  Validates every length/option tag; returns
    the fields needed to reconstruct and cross-check a proof."""
    r = _Reader(data)
    out = {"trace_length": r.u64()}
    out["inputs"] = r.b.read(r.u64())
    out["outputs"] = r.b.read(r.u64())
    out["panic"] = r.u8() == 1
    out["memory_layout"] = [r.u64() for _ in range(8)]

    def mc(openings_reader):
        h = r.multiset()
        rw_gp = r.gp()
        if_gp = r.gp()
        openings_reader()
        return {"hashes": h, "rw_gp": rw_gp, "if_gp": if_gp}

    def bc_open():
        for _ in range(9):
            r.fr()
        r.none()
        r.none()

    def rwm_open():
        for _ in range(1 + 7 + 1 + 4 + 1 + 7 + 4 + 1):
            r.fr()
        for _ in range(3):
            r.none()
        for _ in range(3):   # RegisterAddressOpenings
            r.fr()

    def il_open():
        for _ in range(5):
            r.fr_vec()
        r.fr()
        r.none()
        r.none()
        r.none()

    out["bytecode"] = mc(bc_open)
    out["rwm"] = mc(rwm_open)
    out["ts"] = {"hashes": r.multiset(),
                 "openings": [r.fr() for _ in range(4 * 7)]}
    r.none()
    out["ts"]["exogenous"] = [r.fr() for _ in range(7)]
    out["ts"]["gp"] = r.gp()
    out["output"] = {"num_rounds": r.u64(), "sumcheck": r.sumcheck(),
                     "opening": r.fr()}
    out["primary"] = {"sumcheck": r.sumcheck(), "num_rounds": r.u64(),
                      "E": r.fr_vec(), "flags": r.fr_vec(),
                      "out": r.fr()}
    out["il_mc"] = mc(il_open)
    out["spartan"] = {"outer": r.sumcheck(),
                      "claims": (r.fr(), r.fr(), r.fr()),
                      "inner": r.sumcheck(), "witness_evals": r.fr_vec()}
    out["reduced"] = {"sumcheck": r.sumcheck(), "claims": r.fr_vec()}
    com = [r.g1() for _ in range(r.u64())]
    w = [r.g1() for _ in range(r.u64())]
    v = [r.fr_vec() for _ in range(r.u64())]
    out["reduced"]["hyperkzg"] = (com, w, v)
    out["_proof_end"] = r.b.tell()
    return out
