"""Bytecode memory checking: read-only "decode" stage.

Reference: jolt-core/src/jolt/vm/bytecode.rs.  Each trace step reads one row
of the (preprocessed) bytecode; offline memory checking proves every read
matches the committed program.  Fingerprints are 8-tuples
[virtual_address, elf_address, bitflags, rd, rs1, rs2, imm, t] combined with
gamma powers (bytecode.rs:472-492).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FElt, FieldSpec, fr_spec
from ..field import device as fd
from ..lasso.memory_checking import MemoryCheckingProver
from ..lasso.surge import cumcount
from ..utils.math import next_power_of_two
from .rv_trace import (BYTES_PER_INSTRUCTION, RAM_START_ADDRESS, ELFInstruction,
                       NUM_CIRCUIT_FLAGS)


@dataclass
class BytecodeRow:
    address: int
    bitflags: int
    rd: int
    rs1: int
    rs2: int
    imm: int
    virtual_sequence_remaining: int | None = None

    @staticmethod
    def no_op(address: int) -> "BytecodeRow":
        return BytecodeRow(address, 0, 0, 0, 0, 0)

    @staticmethod
    def pack_bitflags(instruction: ELFInstruction, instruction_index,
                      num_instructions: int) -> int:
        """circuit flags || one-hot instruction flag (bytecode.rs:162-184)."""
        bits = 0
        for flag in instruction.to_circuit_flags():
            bits |= int(flag)
            bits <<= 1
        if instruction_index is not None:
            bits <<= instruction_index
            bits |= 1
            bits <<= num_instructions - instruction_index - 1
        else:
            bits <<= num_instructions - 1
        return bits

    @staticmethod
    def from_instruction(instruction: ELFInstruction, instruction_index,
                         num_instructions: int) -> "BytecodeRow":
        imm = instruction.imm if instruction.imm is not None else 0
        return BytecodeRow(
            address=instruction.address,
            bitflags=BytecodeRow.pack_bitflags(instruction, instruction_index,
                                               num_instructions),
            rd=instruction.rd or 0,
            rs1=instruction.rs1 or 0,
            rs2=instruction.rs2 or 0,
            imm=imm & 0xFFFFFFFF,
            virtual_sequence_remaining=instruction.virtual_sequence_remaining,
        )


class BytecodePreprocessing:
    """Address compression + committed init/final values (bytecode.rs:230-291)."""

    def __init__(self, bytecode: list[BytecodeRow],
                 spec: FieldSpec | None = None):
        self.spec = spec or fr_spec()
        bytecode = [BytecodeRow(**vars(r)) for r in bytecode]  # copy
        self.virtual_address_map: dict[tuple[int, int], int] = {}
        virtual_address = 1  # no-op prepended at 0
        for row in bytecode:
            assert row.address >= RAM_START_ADDRESS
            assert row.address % BYTES_PER_INSTRUCTION == 0
            row.address = 1 + (row.address - RAM_START_ADDRESS) \
                // BYTES_PER_INSTRUCTION
            key = (row.address, row.virtual_sequence_remaining or 0)
            assert key not in self.virtual_address_map
            self.virtual_address_map[key] = virtual_address
            virtual_address += 1

        bytecode.insert(0, BytecodeRow.no_op(0))
        self.virtual_address_map[(0, 0)] = 0
        self.code_size = next_power_of_two(len(bytecode))
        while len(bytecode) < self.code_size:
            bytecode.append(BytecodeRow.no_op(0))
        self.bytecode = bytecode

        vals = np.array(
            [[r.address for r in bytecode], [r.bitflags for r in bytecode],
             [r.rd for r in bytecode], [r.rs1 for r in bytecode],
             [r.rs2 for r in bytecode], [r.imm for r in bytecode]],
            dtype=np.uint64)
        self.v_init_final_host = vals  # [6, K]
        self.v_init_final = fd.u64_to_mont_device(self.spec, vals)


@dataclass
class BytecodePolynomials:
    a_read_write: jnp.ndarray  # [L, T]
    v_read_write: jnp.ndarray  # [L, 6, T]
    t_read: jnp.ndarray        # [L, T]
    t_final: jnp.ndarray       # [L, K]

    def read_write_values(self):
        return ([self.a_read_write]
                + [fd.col(self.v_read_write, i) for i in range(6)]
                + [self.t_read])

    def init_final_values(self):
        return [self.t_final]


def generate_witness(pre: BytecodePreprocessing,
                     trace_rows: list[BytecodeRow], T: int
                     ) -> BytecodePolynomials:
    """Vectorized bytecode witness (bytecode.rs:295-440).

    trace_rows: the per-step bytecode rows with UNcompressed ELF addresses
    (address 0 = padding no-op); T = padded power-of-two trace length.
    """
    spec = pre.spec
    a = np.zeros(T, dtype=np.int64)
    v = np.zeros((6, T), dtype=np.uint64)
    for j, row in enumerate(trace_rows):
        addr = row.address
        if addr != 0:
            assert addr >= RAM_START_ADDRESS and addr % BYTES_PER_INSTRUCTION == 0
            addr = 1 + (addr - RAM_START_ADDRESS) // BYTES_PER_INSTRUCTION
        va = pre.virtual_address_map[(addr, row.virtual_sequence_remaining or 0)]
        a[j] = va
        v[0, j] = addr
        v[1, j] = row.bitflags
        v[2, j] = row.rd
        v[3, j] = row.rs1
        v[4, j] = row.rs2
        v[5, j] = row.imm
    # padding steps read virtual address 0 (whose row is the no-op)

    t_read, t_final = cumcount(a, pre.code_size)

    to_dev = lambda arr: fd.u64_to_mont_device(spec, arr)
    return BytecodePolynomials(
        a_read_write=to_dev(a.astype(np.uint64)),
        v_read_write=to_dev(v),
        t_read=to_dev(t_read),
        t_final=to_dev(t_final),
    )


@partial(jax.jit, static_argnums=0)
def _bytecode_rw_leaves(spec: FieldSpec, a, v, t, gamma_powers, tau):
    """read/write fingerprint leaves [L, 2, T]; tuple order
    [a, v0..v5, t] with gamma powers (bytecode.rs:496-592)."""
    def b3(s, like):
        return jnp.broadcast_to(s.reshape((fd.L,) + (1,) * (like.ndim - 1)),
                                like.shape)

    acc = fd.fsub(spec, a, b3(tau, a))
    for i in range(6):
        acc = fd.fadd(spec, acc, fd.fmul(spec, v[:, i],
                                         b3(gamma_powers[:, i + 1], v[:, i])))
    read = fd.fadd(spec, acc, fd.fmul(spec, t, b3(gamma_powers[:, 7], t)))
    write = fd.fadd(spec, read, b3(gamma_powers[:, 7], read))
    return jnp.stack([read, write], axis=1)


@partial(jax.jit, static_argnums=0)
def _bytecode_if_leaves(spec: FieldSpec, v_init_final, t_final, identity,
                        gamma_powers, tau):
    """init/final leaves [L, 2, K]."""
    def b3(s, like):
        return jnp.broadcast_to(s.reshape((fd.L,) + (1,) * (like.ndim - 1)),
                                like.shape)

    acc = fd.fsub(spec, identity, b3(tau, identity))
    for i in range(6):
        vi = v_init_final[:, i]
        acc = fd.fadd(spec, acc, fd.fmul(spec, vi,
                                         b3(gamma_powers[:, i + 1], vi)))
    final = fd.fadd(spec, acc, fd.fmul(spec, t_final,
                                       b3(gamma_powers[:, 7], t_final)))
    return jnp.stack([acc, final], axis=1)


class BytecodeMemoryChecking(MemoryCheckingProver):
    def __init__(self, pre: BytecodePreprocessing):
        self.pre = pre
        self.spec = pre.spec

    def protocol_name(self) -> bytes:
        return b"Bytecode memory checking"

    def compute_leaves(self, polynomials: BytecodePolynomials, gamma: FElt,
                       tau: FElt):
        spec = self.spec
        powers = [FElt(1, spec)]
        for _ in range(7):
            powers.append(powers[-1] * gamma)
        gp = jnp.stack([fd.scalar_to_device(spec, p.v) for p in powers], axis=1)
        tau_dev = fd.scalar_to_device(spec, tau.v)
        rw = _bytecode_rw_leaves(spec, polynomials.a_read_write,
                                 polynomials.v_read_write, polynomials.t_read,
                                 gp, tau_dev)
        identity = fd.u64_to_mont_device(
            spec, np.arange(self.pre.code_size, dtype=np.uint64))
        inf = _bytecode_if_leaves(spec, self.pre.v_init_final,
                                  polynomials.t_final, identity, gp, tau_dev)
        return rw, inf

    # verifier-computed openings (fork-disabled; kept for completeness)
    def compute_verifier_openings(self, openings, r_read_write, r_init_final):
        from ..poly import mle
        openings["a_init_final"] = None  # identity MLE, verifier-evaluated
        openings["v_init_final"] = [
            mle.evaluate_host([FElt(int(x), self.spec) for x in row],
                              r_init_final)
            for row in self.pre.v_init_final_host
        ]
