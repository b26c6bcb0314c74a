"""Registers/RAM offline memory checking (Spice-style), + output sumcheck.

Reference: jolt-core/src/jolt/vm/read_write_memory.rs.  One unified address
space: 64 registers ‖ program inputs ‖ outputs ‖ panic ‖ padding ‖ RAM.
Each step performs 7 memory ops (rs1/rs2 reads, rd write, 4 RAM bytes);
read/write multisets are checked per channel against one init/final pair.

Note (fork parity): the reference's OutputSumcheck io_witness_range compares
witness indices against an ADDRESS-space bound, making the range polynomial
identically zero (read_write_memory.rs:1189-1198); we replicate the exact
same transcript behavior.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FElt, FieldSpec, fr_spec
from ..field import device as fd
from ..lasso.memory_checking import MemoryCheckingProof, MultisetHashes
from ..poly import mle
from ..subprotocols.grand_product import (BatchedDenseGrandProduct,
                                          verify_grand_product)
from ..subprotocols.sumcheck import SumcheckInstanceProof, prove_arbitrary
from ..transcript import Transcript
from ..utils.math import log2_strict, next_power_of_two
from .rv_trace import (MEMORY_OPS_PER_INSTRUCTION, REGISTER_COUNT,
                       JoltDevice, MemoryLayout,
                       memory_address_to_witness_index)

RS1, RS2, RD, RAM_1, RAM_2, RAM_3, RAM_4 = range(7)

MEMCHECK_PROTOCOL = b"Registers/RAM memory checking"


def remap_address(a: int, layout: MemoryLayout) -> int:
    if a >= layout.input_start:
        return memory_address_to_witness_index(a, layout.ram_witness_offset)
    if a < REGISTER_COUNT:
        return a
    raise ValueError(f"unexpected address {a}")


@dataclass
class ReadWriteMemoryPreprocessing:
    min_bytecode_address: int = 0
    bytecode_bytes: bytes = b""
    program_io: JoltDevice | None = None


@dataclass
class ReadWriteMemoryPolynomials:
    a_ram: jnp.ndarray         # [L, T]
    v_read: jnp.ndarray        # [L, 7, T]
    v_write_rd: jnp.ndarray    # [L, T]
    v_write_ram: jnp.ndarray   # [L, 4, T]
    v_final: jnp.ndarray       # [L, K]
    t_read: jnp.ndarray        # [L, 7, T]
    t_write_ram: jnp.ndarray   # [L, 4, T]
    t_final: jnp.ndarray       # [L, K]
    v_init_dev: jnp.ndarray    # [L, K]
    t_read_host: np.ndarray    # [7, T] u64 (for the timestamp range check)
    memory_size: int = 0

    def read_write_values(self):
        out = [self.a_ram]
        out += [fd.col(self.v_read, i) for i in range(7)]
        out.append(self.v_write_rd)
        out += [fd.col(self.v_write_ram, i) for i in range(4)]
        out += [fd.col(self.t_read, i) for i in range(7)]
        out += [fd.col(self.t_write_ram, i) for i in range(4)]
        return out

    def init_final_values(self):
        return [self.v_final, self.t_final]


def generate_witness(pre: ReadWriteMemoryPreprocessing, program_io: JoltDevice,
                     load_store_flags: np.ndarray, ops_is_write: np.ndarray,
                     ops_addr: np.ndarray, ops_val: np.ndarray,
                     spec: FieldSpec | None = None) -> ReadWriteMemoryPolynomials:
    """Witness generation (read_write_memory.rs:243-850).

    load_store_flags: [5, T] u8 (LB, LH, SB, SH, SW lookup flags);
    ops_is_write/addr/val: [7, T] per-channel memory ops (addresses in the
    VM address space; 0 = no-op).  The per-address timestamp/value state
    updates are inherently sequential — a host scan, off the critical path.
    """
    spec = spec or fr_spec()
    layout = program_io.memory_layout
    T = ops_addr.shape[1]
    assert T == next_power_of_two(T)

    max_trace_address = 0
    for i in range(3, 7):
        nz = ops_addr[i][ops_addr[i] != 0]
        if nz.size:
            max_trace_address = max(
                max_trace_address,
                max(remap_address(int(a), layout) for a in nz))
    memory_size = next_power_of_two(layout.ram_witness_offset
                                    + max_trace_address)

    v_init = np.zeros(memory_size, dtype=np.uint64)
    idx = memory_address_to_witness_index(pre.min_bytecode_address,
                                          layout.ram_witness_offset) \
        if pre.bytecode_bytes else 0
    for b in pre.bytecode_bytes:
        v_init[idx] = b
        idx += 1
    idx = memory_address_to_witness_index(layout.input_start,
                                          layout.ram_witness_offset)
    for b in program_io.inputs:
        v_init[idx] = b
        idx += 1

    v_final = v_init.copy()
    t_final = np.zeros(memory_size, dtype=np.uint64)
    a_ram = np.zeros(T, dtype=np.uint64)
    v_read = np.zeros((7, T), dtype=np.uint64)
    t_read = np.zeros((7, T), dtype=np.uint64)
    v_write_rd = np.zeros(T, dtype=np.uint64)
    v_write_ram = np.zeros((4, T), dtype=np.uint64)
    t_write_ram = np.zeros((4, T), dtype=np.uint64)

    lb_f, lh_f, sb_f, sh_f, sw_f = (load_store_flags[i] for i in range(5))

    for j in range(T):
        ts = j
        # registers
        for ch in (RS1, RS2):
            a = int(ops_addr[ch, j])
            assert not ops_is_write[ch, j]
            v_read[ch, j] = v_final[a]
            t_read[ch, j] = t_final[a]
            t_final[a] = ts
        a = int(ops_addr[RD, j])
        assert ops_is_write[RD, j]
        v_read[RD, j] = v_final[a]
        t_read[RD, j] = t_final[a]
        v_write_rd[j] = ops_val[RD, j]
        v_final[a] = ops_val[RD, j]
        t_final[a] = ts + 1

        # RAM bytes
        active1 = lb_f[j] or lh_f[j] or sb_f[j] or sh_f[j] or sw_f[j]
        if not active1:
            continue  # all RAM arrays stay 0 for this step
        is_store = bool(ops_is_write[RAM_1, j])
        a0 = int(ops_addr[RAM_1, j])
        ra = remap_address(a0, layout)
        a_ram[j] = ra

        def ram_op(channel, ram_index):
            aa = int(ops_addr[channel, j])
            raa = remap_address(aa, layout)
            v_old = v_final[raa]
            v_read[channel, j] = v_old
            t_read[channel, j] = t_final[raa]
            if ops_is_write[channel, j]:
                v_new = int(ops_val[channel, j])
                v_write_ram[ram_index, j] = v_new
                t_write_ram[ram_index, j] = ts + 1
                v_final[raa] = v_new
                t_final[raa] = ts + 1
            else:
                v_write_ram[ram_index, j] = v_old
                t_write_ram[ram_index, j] = ts
                t_final[raa] = ts

        ram_op(RAM_1, 0)
        if lh_f[j] or sh_f[j] or sw_f[j]:
            ram_op(RAM_2, 1)
        if sw_f[j]:
            ram_op(RAM_3, 2)
            ram_op(RAM_4, 3)

    to_dev = lambda arr: fd.u64_to_mont_device(spec, arr)
    return ReadWriteMemoryPolynomials(
        a_ram=to_dev(a_ram), v_read=to_dev(v_read),
        v_write_rd=to_dev(v_write_rd), v_write_ram=to_dev(v_write_ram),
        v_final=to_dev(v_final), t_read=to_dev(t_read),
        t_write_ram=to_dev(t_write_ram), t_final=to_dev(t_final),
        v_init_dev=to_dev(v_init), t_read_host=t_read,
        memory_size=memory_size)


# ---------------------------------------------------------------------------
# leaves kernels
# ---------------------------------------------------------------------------

def _b3(s, like):
    return jnp.broadcast_to(s.reshape((fd.L,) + (1,) * (like.ndim - 1)),
                            like.shape)


@partial(jax.jit, static_argnums=0)
def _rwm_rw_leaves(spec: FieldSpec, a_ram, v_read, v_write_rd, v_write_ram,
                   t_read, t_write_ram, a_rd, a_rs1, a_rs2, identity,
                   gamma, tau):
    """14 interleaved read/write fingerprint layers [L, 14, T]
    (read_write_memory.rs:903-960)."""
    g2 = fd.fmul(spec, gamma, gamma)
    T = a_ram.shape[-1]
    layers = []
    for i in range(MEMORY_OPS_PER_INSTRUCTION):
        if i == RS1:
            a = a_rs1
        elif i == RS2:
            a = a_rs2
        elif i == RD:
            a = a_rd
        else:
            off = fd.scalar_to_device(spec, i - RAM_1)
            a = fd.fadd(spec, a_ram, _b3(off, a_ram))
        read = fd.fadd(spec,
                       fd.fadd(spec,
                               fd.fmul(spec, t_read[:, i], _b3(g2, a)),
                               fd.fmul(spec, v_read[:, i], _b3(gamma, a))),
                       fd.fsub(spec, a, _b3(tau, a)))
        if i == RS1 or i == RS2:
            v_w = v_read[:, i]  # rs1/rs2 writes restore the read value
            t_w = identity
        elif i == RD:
            v_w = v_write_rd
            one = fd.ones(spec, identity.shape[1:])
            t_w = fd.fadd(spec, identity, one)
        else:
            v_w = v_write_ram[:, i - RAM_1]
            t_w = t_write_ram[:, i - RAM_1]
        write = fd.fadd(spec,
                        fd.fadd(spec,
                                fd.fmul(spec, t_w, _b3(g2, a)),
                                fd.fmul(spec, v_w, _b3(gamma, a))),
                        fd.fsub(spec, a, _b3(tau, a)))
        layers.append(read)
        layers.append(write)
    return jnp.stack(layers, axis=1)


@partial(jax.jit, static_argnums=0)
def _rwm_if_leaves(spec: FieldSpec, v_init, v_final, t_final, identity,
                   gamma, tau):
    g2 = fd.fmul(spec, gamma, gamma)
    init = fd.fadd(spec, fd.fmul(spec, v_init, _b3(gamma, v_init)),
                   fd.fsub(spec, identity, _b3(tau, identity)))
    final = fd.fadd(spec,
                    fd.fadd(spec, fd.fmul(spec, t_final, _b3(g2, t_final)),
                            fd.fmul(spec, v_final, _b3(gamma, v_final))),
                    fd.fsub(spec, identity, _b3(tau, identity)))
    return jnp.stack([init, final], axis=1)


@dataclass
class OutputSumcheckProof:
    num_rounds: int
    sumcheck_proof: SumcheckInstanceProof
    opening: FElt


def _output_comb(spec, params):
    eq, io_range, v_final, v_io = params
    return fd.fmul(spec, fd.fmul(spec, eq, io_range),
                   fd.fsub(spec, v_final, v_io))


@dataclass
class ReadWriteMemoryProof:
    memory_checking_proof: MemoryCheckingProof
    output_proof: OutputSumcheckProof
    timestamp_validity_proof: object


def _identity_dev(spec, n):
    return fd.u64_to_mont_device(spec, np.arange(n, dtype=np.uint64))


def prove_memory_checking(polys: ReadWriteMemoryPolynomials,
                          bytecode_polys, transcript: Transcript,
                          spec: FieldSpec, mesh=None) -> MemoryCheckingProof:
    gamma = transcript.challenge_scalar()
    tau = transcript.challenge_scalar()
    transcript.append_protocol_name(MEMCHECK_PROTOCOL)

    g = fd.scalar_to_device(spec, gamma.v)
    t = fd.scalar_to_device(spec, tau.v)
    T = polys.a_ram.shape[-1]
    identity_T = _identity_dev(spec, T)
    # exogenous register addresses from bytecode v_read_write (rd=2, rs1=3, rs2=4)
    a_rd = bytecode_polys.v_read_write[:, 2]
    a_rs1 = bytecode_polys.v_read_write[:, 3]
    a_rs2 = bytecode_polys.v_read_write[:, 4]
    rw = _rwm_rw_leaves(spec, polys.a_ram, polys.v_read, polys.v_write_rd,
                        polys.v_write_ram, polys.t_read, polys.t_write_ram,
                        a_rd, a_rs1, a_rs2, identity_T, g, t)
    identity_K = _identity_dev(spec, polys.v_final.shape[-1])
    inf = _rwm_if_leaves(spec, polys.v_init_dev, polys.v_final, polys.t_final,
                         identity_K, g, t)

    rw_circuit = BatchedDenseGrandProduct.construct(rw, spec, mesh=mesh)
    if_circuit = BatchedDenseGrandProduct.construct(inf, spec, mesh=mesh)
    del rw, inf                # the pair trees hold their own copies
    rw_hashes = rw_circuit.claims()
    if_hashes = if_circuit.claims()

    hashes = MultisetHashes(rw_hashes[0::2], rw_hashes[1::2],
                            [if_hashes[0]], [if_hashes[1]])
    _check_multiset(hashes)
    hashes.append_to_transcript(transcript)

    rw_proof, _ = rw_circuit.prove(transcript)
    if_proof, _ = if_circuit.prove(transcript)
    return MemoryCheckingProof(hashes, rw_proof, if_proof)


def _check_multiset(h: MultisetHashes):
    spec = h.read_hashes[0].spec
    read = FElt(1, spec)
    write = FElt(1, spec)
    for r in h.read_hashes:
        read = read * r
    for w in h.write_hashes:
        write = write * w
    assert h.init_hashes[0] * write == h.final_hashes[0] * read, \
        "Registers/RAM multiset hashes don't match"


def verify_memory_checking(proof: MemoryCheckingProof, transcript: Transcript,
                           spec: FieldSpec) -> None:
    gamma = transcript.challenge_scalar()
    tau = transcript.challenge_scalar()
    transcript.append_protocol_name(MEMCHECK_PROTOCOL)
    h = proof.multiset_hashes
    _check_multiset(h)
    h.append_to_transcript(transcript)
    rw = [x for pair in zip(h.read_hashes, h.write_hashes) for x in pair]
    inf = [h.init_hashes[0], h.final_hashes[0]]
    verify_grand_product(proof.read_write_grand_product, rw, transcript)
    verify_grand_product(proof.init_final_grand_product, inf, transcript)
    del gamma, tau


# ---------------------------------------------------------------------------
# output sumcheck (read_write_memory.rs:1157-1343)
# ---------------------------------------------------------------------------

def prove_outputs(polys: ReadWriteMemoryPolynomials, program_io: JoltDevice,
                  opening_accumulator, transcript: Transcript,
                  spec: FieldSpec, mesh=None) -> OutputSumcheckProof:
    layout = program_io.memory_layout
    memory_size = polys.v_final.shape[-1]
    num_rounds = log2_strict(memory_size)
    r_eq = transcript.challenge_vector(num_rounds)
    eq = mle.eq_evals_device(spec, r_eq)
    # fork parity: the witness-index vs address comparison makes this range
    # polynomial identically zero (see module docstring)
    io_witness_range = np.array(
        [1 if (i >= layout.input_start and i < layout.ram_witness_offset)
         else 0 for i in range(memory_size)], dtype=np.uint64)
    v_io = np.zeros(memory_size, dtype=np.uint64)
    idx = memory_address_to_witness_index(layout.input_start,
                                          layout.ram_witness_offset)
    for b in program_io.inputs:
        v_io[idx] = b
        idx += 1
    idx = memory_address_to_witness_index(layout.output_start,
                                          layout.ram_witness_offset)
    for b in program_io.outputs:
        v_io[idx] = b
        idx += 1
    v_io[memory_address_to_witness_index(layout.panic,
                                         layout.ram_witness_offset)] = \
        int(program_io.panic)

    to_dev = lambda arr: fd.u64_to_mont_device(spec, arr)
    sc_polys = (eq, to_dev(io_witness_range), polys.v_final, to_dev(v_io))
    if mesh is not None:
        from ..parallel.sharding import shard_sumcheck_polys
        sc_polys = shard_sumcheck_polys(mesh, sc_polys)
    proof, r_sumcheck, openings = prove_arbitrary(
        num_rounds, sc_polys, _output_comb, 3, transcript, spec)

    eq_r = mle.eq_evals_device(spec, r_sumcheck)
    opening_accumulator.append([polys.v_final], eq_r, r_sumcheck,
                               [openings[2]], transcript)
    return OutputSumcheckProof(num_rounds, proof, openings[2])


def verify_outputs(proof: OutputSumcheckProof, program_io: JoltDevice,
                   v_final_commitment, opening_accumulator,
                   transcript: Transcript, spec: FieldSpec) -> None:
    layout = program_io.memory_layout
    r_eq = transcript.challenge_vector(proof.num_rounds)
    sumcheck_claim, r_sumcheck = proof.sumcheck_proof.verify(
        FElt(0, spec), proof.num_rounds, 3, transcript)
    eq_eval = mle.eq_evaluate_host(r_eq, r_sumcheck)

    nonzero_memory_size = layout.ram_witness_offset
    log_nz = log2_strict(nonzero_memory_size)
    io_witness_range = [FElt(1 if i >= layout.input_start else 0, spec)
                        for i in range(nonzero_memory_size)]
    io_range_eval = mle.evaluate_host(io_witness_range, r_sumcheck[:log_nz])
    r_prod = FElt(1, spec)
    for rv in r_sumcheck[log_nz:]:
        r_prod = r_prod * rv
    io_range_eval = io_range_eval * r_prod

    v_io = [0] * nonzero_memory_size
    idx = memory_address_to_witness_index(layout.input_start,
                                          layout.ram_witness_offset)
    for b in program_io.inputs:
        v_io[idx] = b
        idx += 1
    idx = memory_address_to_witness_index(layout.output_start,
                                          layout.ram_witness_offset)
    for b in program_io.outputs:
        v_io[idx] = b
        idx += 1
    v_io[memory_address_to_witness_index(layout.panic,
                                         layout.ram_witness_offset)] = \
        int(program_io.panic)
    v_io_eval = mle.evaluate_host([FElt(v, spec) for v in v_io],
                                  r_sumcheck[:log_nz]) * r_prod

    assert eq_eval * io_range_eval * (proof.opening - v_io_eval) == \
        sumcheck_claim, "Output sumcheck check failed"

    if v_final_commitment is not None:
        opening_accumulator.append([v_final_commitment], r_sumcheck,
                                   [proof.opening], transcript)
