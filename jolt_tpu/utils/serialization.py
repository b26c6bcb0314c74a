"""Canonical proof (de)serialization.

Reference: the `Serializable` trait (common/src/serializable.rs +
rv32i_vm.rs:193-235) persists proofs/preprocessing with ark-compressed
encodings.  Our canonical encoding: little-endian u64 lengths, 32-byte LE
field elements, affine points as x ‖ y (64 bytes, infinity = 64 zero bytes)
— structurally equivalent, byte-layout documented here rather than borrowed
from arkworks.
"""
from __future__ import annotations

import io
import struct

from ..field import FElt, fr_spec
from ..curve.bn254 import G1Affine


class Writer:
    def __init__(self):
        self.buf = io.BytesIO()

    def u64(self, x: int):
        self.buf.write(struct.pack("<Q", x))

    def felt(self, x: FElt):
        self.buf.write(x.v.to_bytes(32, "little"))

    def felts(self, xs):
        self.u64(len(xs))
        for x in xs:
            self.felt(x)

    def point(self, p: G1Affine):
        if p.is_infinity:
            self.buf.write(b"\x00" * 64)
        else:
            self.buf.write(p.x.to_bytes(32, "little"))
            self.buf.write(p.y.to_bytes(32, "little"))

    def points(self, ps):
        self.u64(len(ps))
        for p in ps:
            self.point(p)

    def getvalue(self) -> bytes:
        return self.buf.getvalue()


class Reader:
    def __init__(self, data: bytes):
        self.buf = io.BytesIO(data)

    def u64(self) -> int:
        return struct.unpack("<Q", self.buf.read(8))[0]

    def felt(self) -> FElt:
        return FElt(int.from_bytes(self.buf.read(32), "little"), fr_spec())

    def felts(self) -> list[FElt]:
        return [self.felt() for _ in range(self.u64())]

    def point(self) -> G1Affine:
        raw = self.buf.read(64)
        if raw == b"\x00" * 64:
            return G1Affine.identity()
        return G1Affine(int.from_bytes(raw[:32], "little"),
                        int.from_bytes(raw[32:], "little"))

    def points(self) -> list[G1Affine]:
        return [self.point() for _ in range(self.u64())]


def serialize_sumcheck(w: Writer, proof) -> None:
    w.u64(len(proof.compressed_polys))
    for p in proof.compressed_polys:
        w.felts(p.coeffs_except_linear_term)


def deserialize_sumcheck(r: Reader):
    from ..poly.unipoly import CompressedUniPoly
    from ..subprotocols.sumcheck import SumcheckInstanceProof
    n = r.u64()
    return SumcheckInstanceProof([CompressedUniPoly(r.felts())
                                  for _ in range(n)])


def serialize_grand_product(w: Writer, proof) -> None:
    w.u64(len(proof.layers))
    for layer in proof.layers:
        serialize_sumcheck(w, layer.proof)
        w.felts(layer.left_claims)
        w.felts(layer.right_claims)
    # quark option (None in the production VM path, grand_product.rs:37-41)
    w.u64(1 if getattr(proof, "quark", None) is not None else 0)
    if getattr(proof, "quark", None) is not None:
        q = proof.quark
        serialize_sumcheck(w, q.sumcheck_proof)
        w.points([c.point for c in q.g_commitment])
        w.felts(q.claimed_eval_g_r)
        w.felts(q.claimed_eval_g_r_x[0])
        w.felts(q.claimed_eval_g_r_x[1])
        w.felts(q.helper_values[0])
        w.felts(q.helper_values[1])
        w.u64(q.num_vars)


def deserialize_grand_product(r: Reader):
    from ..subprotocols.grand_product import (BatchedGrandProductLayerProof,
                                              BatchedGrandProductProof)
    n = r.u64()
    layers = []
    for _ in range(n):
        sp = deserialize_sumcheck(r)
        left = r.felts()
        right = r.felts()
        layers.append(BatchedGrandProductLayerProof(sp, left, right))
    quark = None
    if r.u64():
        from ..commitment.hyperkzg import HyperKZGCommitment
        from ..subprotocols.grand_product_quarks import QuarkGrandProductProof
        sp = deserialize_sumcheck(r)
        g_com = [HyperKZGCommitment(p) for p in r.points()]
        g_r = r.felts()
        g_r_x = (r.felts(), r.felts())
        helper = (r.felts(), r.felts())
        quark = QuarkGrandProductProof(sp, g_com, g_r, g_r_x, helper, r.u64())
    return BatchedGrandProductProof(layers, quark)


def proof_size_bytes(obj) -> int:
    """Rough serialized size of any proof object tree (bench reporting)."""
    w = Writer()
    _serialize_any(w, obj)
    return len(w.getvalue())


def _serialize_any(w: Writer, obj) -> None:
    from dataclasses import fields, is_dataclass
    if obj is None:
        return
    if isinstance(obj, FElt):
        w.felt(obj)
    elif isinstance(obj, G1Affine):
        w.point(obj)
    elif isinstance(obj, int):
        w.u64(obj & 0xFFFFFFFFFFFFFFFF)
    elif isinstance(obj, (list, tuple)):
        for x in obj:
            _serialize_any(w, x)
    elif is_dataclass(obj):
        for f in fields(obj):
            _serialize_any(w, getattr(obj, f.name))
    elif hasattr(obj, "__dict__"):
        for v in vars(obj).values():
            _serialize_any(w, v)


# ---------------------------------------------------------------------------
# Full JoltProof (de)serialization — the `JoltHyperKZGProof` Serializable
# analog (rv32i_vm.rs:193-235).  Explicit schema per struct, field order
# documented by the write order below.
# ---------------------------------------------------------------------------

def _write_option(w: Writer, val, write_fn) -> None:
    if val is None:
        w.u64(0)
    else:
        w.u64(1)
        write_fn(val)


def serialize_multiset_hashes(w: Writer, mh) -> None:
    w.felts(mh.read_hashes)
    w.felts(mh.write_hashes)
    w.felts(mh.init_hashes)
    w.felts(mh.final_hashes)


def deserialize_multiset_hashes(r: Reader):
    from ..lasso.memory_checking import MultisetHashes
    return MultisetHashes(r.felts(), r.felts(), r.felts(), r.felts())


def serialize_memory_checking(w: Writer, proof) -> None:
    serialize_multiset_hashes(w, proof.multiset_hashes)
    serialize_grand_product(w, proof.read_write_grand_product)
    serialize_grand_product(w, proof.init_final_grand_product)
    # openings/exogenous_openings are default-initialized in the fork
    # (memory_checking.rs:46-64 + gutted compute_openings) — presence flag 0.
    w.u64(0)


def deserialize_memory_checking(r: Reader):
    from ..lasso.memory_checking import MemoryCheckingProof
    mh = deserialize_multiset_hashes(r)
    rw = deserialize_grand_product(r)
    inf = deserialize_grand_product(r)
    r.u64()
    return MemoryCheckingProof(mh, rw, inf)


def serialize_hyperkzg_proof(w: Writer, proof) -> None:
    w.points(proof.com)
    w.points(proof.w)
    w.u64(len(proof.v))
    for row in proof.v:
        w.felts(row)


def deserialize_hyperkzg_proof(r: Reader):
    from ..commitment.hyperkzg import HyperKZGProof
    com = r.points()
    wit = r.points()
    v = [r.felts() for _ in range(r.u64())]
    return HyperKZGProof(com, wit, v)


def serialize_reduced_opening(w: Writer, proof) -> None:
    serialize_sumcheck(w, proof.sumcheck_proof)
    w.felts(proof.sumcheck_claims)
    serialize_hyperkzg_proof(w, proof.joint_opening_proof)


def deserialize_reduced_opening(r: Reader):
    from ..poly.opening_proof import ReducedOpeningProof
    sp = deserialize_sumcheck(r)
    claims = r.felts()
    joint = deserialize_hyperkzg_proof(r)
    return ReducedOpeningProof(sp, claims, joint)


def serialize_jolt_proof(w: Writer, proof) -> None:
    """JoltProof {trace_length, program_io, bytecode, read_write_memory,
    instruction_lookups, r1cs, opening_proof} (vm/mod.rs:101-117)."""
    w.u64(proof.trace_length)
    io = proof.program_io
    w.u64(io.memory_layout.max_input_size)
    w.u64(io.memory_layout.max_output_size)
    w.u64(len(io.inputs))
    w.buf.write(bytes(io.inputs))
    w.u64(len(io.outputs))
    w.buf.write(bytes(io.outputs))
    w.u64(int(io.panic))

    serialize_memory_checking(w, proof.bytecode)

    rwm = proof.read_write_memory
    serialize_memory_checking(w, rwm.memory_checking_proof)
    w.u64(rwm.output_proof.num_rounds)
    serialize_sumcheck(w, rwm.output_proof.sumcheck_proof)
    w.felt(rwm.output_proof.opening)
    ts = rwm.timestamp_validity_proof
    serialize_multiset_hashes(w, ts.multiset_hashes)
    w.felts(ts.openings)
    w.felts(ts.exogenous_openings)
    serialize_grand_product(w, ts.batched_grand_product)
    _write_option(w, ts.identity_opening, w.felt)

    il = proof.instruction_lookups
    serialize_sumcheck(w, il.primary_sumcheck.sumcheck_proof)
    w.u64(il.primary_sumcheck.num_rounds)
    w.felts(il.primary_sumcheck.openings.E_poly_openings)
    w.felts(il.primary_sumcheck.openings.flag_openings)
    w.felt(il.primary_sumcheck.openings.lookup_outputs_opening)
    serialize_memory_checking(w, il.memory_checking)

    sp = proof.r1cs
    serialize_sumcheck(w, sp.outer_sumcheck_proof)
    w.felts(list(sp.outer_sumcheck_claims))
    serialize_sumcheck(w, sp.inner_sumcheck_proof)
    w.felts(sp.claimed_witness_evals)

    serialize_reduced_opening(w, proof.opening_proof)


def deserialize_jolt_proof(r: Reader):
    from ..vm.jolt import JoltProof
    from ..vm.read_write_memory import (OutputSumcheckProof,
                                        ReadWriteMemoryProof)
    from ..vm.timestamp_range_check import TimestampValidityProof
    from ..vm.instruction_lookups import (InstructionLookupsProof,
                                          PrimarySumcheck,
                                          PrimarySumcheckOpenings)
    from ..vm.r1cs import UniformSpartanProof
    from ..vm.rv_trace import JoltDevice

    trace_length = r.u64()
    max_in, max_out = r.u64(), r.u64()
    io = JoltDevice.new(max_in, max_out)
    io.inputs.extend(r.buf.read(r.u64()))
    io.outputs.extend(r.buf.read(r.u64()))
    io.panic = bool(r.u64())

    bytecode = deserialize_memory_checking(r)

    mc = deserialize_memory_checking(r)
    out_rounds = r.u64()
    out_sc = deserialize_sumcheck(r)
    out_open = r.felt()
    mh = deserialize_multiset_hashes(r)
    openings = r.felts()
    exo = r.felts()
    gp = deserialize_grand_product(r)
    ident = r.felt() if r.u64() else None
    ts = TimestampValidityProof(mh, openings, exo, gp, ident)
    rwm = ReadWriteMemoryProof(mc, OutputSumcheckProof(out_rounds, out_sc,
                                                       out_open), ts)

    ps_sc = deserialize_sumcheck(r)
    ps_rounds = r.u64()
    e_open = r.felts()
    f_open = r.felts()
    o_open = r.felt()
    il_mc = deserialize_memory_checking(r)
    il = InstructionLookupsProof(
        PrimarySumcheck(ps_sc, ps_rounds,
                        PrimarySumcheckOpenings(e_open, f_open, o_open)),
        il_mc)

    outer = deserialize_sumcheck(r)
    claims = r.felts()
    inner = deserialize_sumcheck(r)
    wit = r.felts()
    sp = UniformSpartanProof(outer, tuple(claims), inner, wit)

    opening = deserialize_reduced_opening(r)
    return JoltProof(trace_length, io, bytecode, rwm, il, sp, opening)


def serialize_jolt_proof_with_commitments(proof, commitments) -> bytes:
    """Proof + HyperKZG commitments -> bytes (file/bytes persistence,
    rv32i_vm.rs:193-235)."""
    w = Writer()
    serialize_jolt_proof(w, proof)
    w.points([c.point for c in commitments["read_write"]])
    w.points([c.point for c in commitments["init_final"]])
    return w.getvalue()


def deserialize_jolt_proof_with_commitments(data: bytes):
    from ..commitment.hyperkzg import HyperKZGCommitment
    r = Reader(data)
    proof = deserialize_jolt_proof(r)
    rw = [HyperKZGCommitment(p) for p in r.points()]
    inf = [HyperKZGCommitment(p) for p in r.points()]
    assert r.buf.read() == b"", "trailing bytes"
    return proof, {"read_write": rw, "init_final": inf}


# -- preprocessing persistence (rv32i_vm.rs:193-235 analog) ------------------
#
# The reference serializes the fully-expanded JoltPreprocessing.  Here the
# preprocessing tensors are DERIVED deterministically on device from small
# seed data (bytecode rows + memory image + VM params), so persistence
# stores the seed data and rebuilds on load — smaller files, same
# semantics, and the rebuild path is the already-tested preprocess().
# The SRS persists separately in ark-compatible bytes
# (commitment/hyperkzg.save_srs / utils/ark_serialize.py).

def serialize_preprocessing_seed(bytecode_rows, memory_init: bytes,
                                 min_bytecode_address: int,
                                 max_input_size: int,
                                 max_output_size: int) -> bytes:
    w = Writer()
    w.u64(min_bytecode_address)
    w.u64(max_input_size)
    w.u64(max_output_size)
    w.u64(len(memory_init))
    w.buf.write(memory_init)
    w.u64(len(bytecode_rows))
    for row in bytecode_rows:
        w.u64(row.address)
        w.u64(row.bitflags)
        w.u64(row.rd)
        w.u64(row.rs1)
        w.u64(row.rs2)
        w.u64(row.imm & 0xFFFFFFFFFFFFFFFF)
        has_vsr = row.virtual_sequence_remaining is not None
        w.u64(1 + row.virtual_sequence_remaining if has_vsr else 0)
    return w.getvalue()


def deserialize_preprocessing_seed(data: bytes):
    """-> (bytecode_rows, memory_init, min_bytecode_address,
           max_input_size, max_output_size)"""
    from ..vm.bytecode import BytecodeRow
    r = Reader(data)
    min_addr = r.u64()
    max_in = r.u64()
    max_out = r.u64()
    mem_len = r.u64()
    memory_init = r.buf.read(mem_len)
    n = r.u64()
    rows = []
    for _ in range(n):
        address = r.u64()
        bitflags = r.u64()
        rd, rs1, rs2 = r.u64(), r.u64(), r.u64()
        imm = r.u64()
        if imm >= 1 << 63:
            imm -= 1 << 64
        vsr = r.u64()
        rows.append(BytecodeRow(address, bitflags, rd, rs1, rs2, imm,
                                vsr - 1 if vsr else None))
    assert r.buf.read() == b"", "trailing bytes in preprocessing seed"
    return rows, memory_init, min_addr, max_in, max_out
