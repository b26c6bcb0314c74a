"""The Jolt zkVM orchestrator: preprocess / prove / verify.

Reference: jolt-core/src/jolt/vm/mod.rs:244-663.  Transcript event order
(which determines every challenge) is:
  preamble -> vk_digest -> all commitments (read/write then init/final)
  -> bytecode memory checking -> instruction lookups (primary sumcheck +
  memory checking) -> registers/RAM memory checking -> output sumcheck ->
  timestamp validity -> Spartan (outer + inner) -> batched opening reduction.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..field import FElt, FieldSpec, fr_spec
from ..field import device as fd
from ..poly.opening_proof import (ProverOpeningAccumulator, ReducedOpeningProof,
                                  VerifierOpeningAccumulator)
from ..transcript import Transcript
from ..utils.math import log2_strict, next_power_of_two
from ..utils.profiling import span
from . import bytecode as bc
from . import instruction_lookups as il
from . import r1cs as r1cs_mod
from . import read_write_memory as rwm
from . import timestamp_range_check as ts
from .rv_trace import (NUM_CIRCUIT_FLAGS, RAM_START_ADDRESS, JoltDevice)
from .trace import JoltTraceStep, pad_trace


@dataclass
class JoltPreprocessing:
    instruction_lookups: il.InstructionLookupsPreprocessing
    bytecode: bc.BytecodePreprocessing
    read_write_memory: rwm.ReadWriteMemoryPreprocessing
    pcs: object


@dataclass
class JoltProof:
    trace_length: int
    program_io: JoltDevice
    bytecode: object
    read_write_memory: rwm.ReadWriteMemoryProof
    instruction_lookups: il.InstructionLookupsProof
    r1cs: r1cs_mod.UniformSpartanProof
    opening_proof: ReducedOpeningProof


class JoltVM:
    """A Jolt VM instance parametrized by its instruction set + subtables
    (rv32i_vm.rs instruction_set!/subtable_enum! analog)."""

    def __init__(self, instruction_classes, subtable_order, C: int, M: int,
                 load_store_lookup_names=("lb", "lh", "sb", "sh", "sw"),
                 spec: FieldSpec | None = None):
        self.spec = spec or fr_spec()
        self.C, self.M = C, M
        self.instruction_classes = list(instruction_classes)
        self.subtable_order = list(subtable_order)
        self.name_to_index = {cls.name: k
                              for k, cls in enumerate(self.instruction_classes)}
        self.load_store_indices = [self.name_to_index[n]
                                   for n in load_store_lookup_names
                                   if n in self.name_to_index]
        self.layout = r1cs_mod.build_input_layout(C,
                                                  len(self.instruction_classes))

    # -- preprocessing --------------------------------------------------------
    def preprocess(self, bytecode_rows: list[bc.BytecodeRow], pcs,
                   memory_init: bytes = b"",
                   min_bytecode_address: int = RAM_START_ADDRESS
                   ) -> JoltPreprocessing:
        return JoltPreprocessing(
            instruction_lookups=il.InstructionLookupsPreprocessing(
                self.instruction_classes, self.subtable_order, self.C, self.M,
                self.spec),
            bytecode=bc.BytecodePreprocessing(bytecode_rows, self.spec),
            read_write_memory=rwm.ReadWriteMemoryPreprocessing(
                min_bytecode_address, memory_init),
            pcs=pcs)

    def _preamble(self, transcript: Transcript, program_io: JoltDevice,
                  trace_length: int) -> None:
        transcript.append_u64(trace_length)
        transcript.append_u64(self.C)
        transcript.append_u64(self.M)
        transcript.append_u64(len(self.instruction_classes))
        transcript.append_u64(len(self.subtable_order))
        transcript.append_u64(program_io.memory_layout.max_input_size)
        transcript.append_u64(program_io.memory_layout.max_output_size)
        transcript.append_bytes(bytes(program_io.inputs))
        transcript.append_bytes(bytes(program_io.outputs))
        transcript.append_u64(int(program_io.panic))

    # -- witness assembly -----------------------------------------------------
    def _flattened_polys(self, bc_polys, rwm_polys, il_polys, r1cs_polys
                         ) -> list:
        C = self.C
        out = [bc_polys.a_read_write]
        out += [bc_polys.v_read_write[:, i] for i in range(6)]
        out += [rwm_polys.a_ram]
        out += [rwm_polys.v_read[:, i] for i in range(3)]
        out += [rwm_polys.v_read[:, 3 + i] for i in range(4)]
        out += [rwm_polys.v_write_rd]
        out += [rwm_polys.v_write_ram[:, i] for i in range(4)]
        out += [il_polys.dim[:, i] for i in range(C)]
        out += [il_polys.lookup_outputs]
        out += [r1cs_polys["chunks_x"][:, i] for i in range(C)]
        out += [r1cs_polys["chunks_y"][:, i] for i in range(C)]
        out += [r1cs_polys["circuit_flags"][:, i]
                for i in range(NUM_CIRCUIT_FLAGS)]
        out += [il_polys.instruction_flags[:, i]
                for i in range(len(self.instruction_classes))]
        out += [None] * (len(self.layout) - len(out))  # aux, filled later
        return out

    # -- prove ----------------------------------------------------------------
    def prove(self, program_io: JoltDevice, trace: list[JoltTraceStep],
              pre: JoltPreprocessing):
        spec = self.spec
        trace_length = len(trace)
        trace = pad_trace(trace)
        T = len(trace)

        transcript = Transcript(b"Jolt transcript")
        self._preamble(transcript, program_io, trace_length)

        # --- witness generation ---------------------------------------------
        witness_span = span("witness_generation")
        witness_span.__enter__()
        instr_idx = np.array([s.instruction_index for s in trace],
                             dtype=np.int64)
        xs = np.array([s.lookup_x for s in trace], dtype=np.uint64)
        ys = np.array([s.lookup_y for s in trace], dtype=np.uint64)
        il_polys = il.generate_witness(pre.instruction_lookups, instr_idx,
                                       xs, ys)

        load_store_flags = np.stack(
            [il_polys.instruction_flag_bits[k] for k in self.load_store_indices]) \
            if len(self.load_store_indices) == 5 else np.zeros((5, T), np.uint8)
        ops_is_write = np.array([s.memory_ops_is_write for s in trace]).T
        ops_addr = np.array([s.memory_ops_addr for s in trace],
                            dtype=np.uint64).T
        ops_val = np.array([s.memory_ops_val for s in trace],
                           dtype=np.uint64).T
        rwm_polys = rwm.generate_witness(pre.read_write_memory, program_io,
                                         load_store_flags, ops_is_write,
                                         ops_addr, ops_val, spec)

        bc_polys = bc.generate_witness(pre.bytecode,
                                       [s.bytecode_row for s in trace], T)
        ts_polys = ts.generate_witness(rwm_polys.t_read_host, spec)

        # r1cs witness: chunks + circuit flags (inputs.rs:163-214)
        log_M = log2_strict(self.M)
        chunks_x = np.zeros((self.C, T), dtype=np.uint64)
        chunks_y = np.zeros((self.C, T), dtype=np.uint64)
        cflags = np.zeros((NUM_CIRCUIT_FLAGS, T), dtype=np.uint64)
        from ..instructions.utils import chunk_operand_vec
        for j, step in enumerate(trace):
            for k in range(NUM_CIRCUIT_FLAGS):
                cflags[k, j] = int(step.circuit_flags[k])
        active = instr_idx >= 0
        if active.any():
            chunks_x[:, active] = chunk_operand_vec(xs[active], self.C,
                                                    log_M // 2)
            chunks_y[:, active] = chunk_operand_vec(ys[active], self.C,
                                                    log_M // 2)
        to_dev = lambda arr: fd.to_mont_device(
            spec, jnp.asarray(fd.pack_u64(arr)))
        r1cs_polys = {"chunks_x": to_dev(chunks_x),
                      "chunks_y": to_dev(chunks_y),
                      "circuit_flags": to_dev(cflags)}

        builder, non_uniform = r1cs_mod.build_jolt_constraints(
            self.layout, self.C,
            RAM_START_ADDRESS - program_io.memory_layout.ram_witness_offset,
            self.name_to_index)
        key = r1cs_mod.UniformSpartanKey(self.layout, builder.constraints,
                                         non_uniform, T, spec)

        flattened = self._flattened_polys(bc_polys, rwm_polys, il_polys,
                                          r1cs_polys)
        r1cs_mod.compute_aux(builder, flattened, T, spec)
        witness_span.__exit__(None, None, None)

        # --- commitments ------------------------------------------------------
        pcs = pre.pcs
        rw_polys = (bc_polys.read_write_values()
                    + rwm_polys.read_write_values()
                    + il_polys.read_write_values()
                    + ts_polys.read_write_values()
                    + [r1cs_polys["chunks_x"][:, i] for i in range(self.C)]
                    + [r1cs_polys["chunks_y"][:, i] for i in range(self.C)]
                    + [r1cs_polys["circuit_flags"][:, i]
                       for i in range(NUM_CIRCUIT_FLAGS)]
                    + [flattened[i] for i in range(len(self.layout))
                       if self.layout[i].startswith("aux_")])
        if_polys = (bc_polys.init_final_values()
                    + rwm_polys.init_final_values()
                    + il_polys.init_final_values())
        with span("JoltPolynomials::commit"):
            rw_commitments = pcs.batch_commit(rw_polys)
            if_commitments = pcs.batch_commit(if_polys)

        transcript.append_scalar(key.vk_digest)
        for com in rw_commitments + if_commitments:
            com.append_to_transcript(transcript)

        acc = ProverOpeningAccumulator(spec)

        # --- component proofs -------------------------------------------------
        with span("BytecodeProof::prove_memory_checking"):
            bc_mc = bc.BytecodeMemoryChecking(pre.bytecode)
            bytecode_proof = bc_mc.prove_memory_checking(bc_polys, acc,
                                                         transcript)

        with span("InstructionLookupsProof::prove"):
            instruction_proof = il.prove_instruction_lookups(
                pre.instruction_lookups, il_polys, acc, transcript)

        with span("ReadWriteMemoryProof::prove"):
            mc_proof = rwm.prove_memory_checking(rwm_polys, bc_polys,
                                                 transcript, spec)
            output_proof = rwm.prove_outputs(rwm_polys, program_io, acc,
                                             transcript, spec)
            ts_proof = ts.prove_timestamp_validity(ts_polys, rwm_polys, acc,
                                                   transcript, spec)
            memory_proof = rwm.ReadWriteMemoryProof(mc_proof, output_proof,
                                                    ts_proof)

        with span("UniformSpartanProof::prove"):
            spartan_proof = r1cs_mod.spartan_prove(builder, non_uniform, key,
                                                   flattened, T, acc,
                                                   transcript, spec)

        with span("reduce_and_prove"):
            opening_proof = acc.reduce_and_prove(pcs, transcript)

        proof = JoltProof(trace_length, program_io, bytecode_proof,
                          memory_proof, instruction_proof, spartan_proof,
                          opening_proof)
        commitments = {"read_write": rw_commitments,
                       "init_final": if_commitments}
        return proof, commitments, transcript, acc

    # -- verify -----------------------------------------------------------------
    def verify(self, pre: JoltPreprocessing, proof: JoltProof, commitments,
               debug_transcript: Transcript | None = None,
               debug_accumulator=None) -> None:
        spec = self.spec
        program_io = proof.program_io
        T = next_power_of_two(proof.trace_length)

        transcript = Transcript(b"Jolt transcript")
        if debug_transcript is not None:
            transcript.compare_to(debug_transcript)
        self._preamble(transcript, program_io, proof.trace_length)

        builder, non_uniform = r1cs_mod.build_jolt_constraints(
            self.layout, self.C,
            RAM_START_ADDRESS - program_io.memory_layout.ram_witness_offset,
            self.name_to_index)
        key = r1cs_mod.UniformSpartanKey(self.layout, builder.constraints,
                                         non_uniform, T, spec)

        transcript.append_scalar(key.vk_digest)
        rw_commitments = commitments["read_write"]
        if_commitments = commitments["init_final"]
        for com in rw_commitments + if_commitments:
            com.append_to_transcript(transcript)

        acc = VerifierOpeningAccumulator(pre.pcs, spec)
        if debug_accumulator is not None:
            acc.compare_to(debug_accumulator)

        # bytecode
        bc_mc = bc.BytecodeMemoryChecking(pre.bytecode)
        bc_mc.verify_memory_checking(proof.bytecode, None, acc, transcript)

        # instruction lookups — route its commitments for opening appends
        C = self.C
        n_bc = 8
        n_rwm_rw = 1 + 7 + 1 + 4 + 7 + 4
        il_base = n_bc + n_rwm_rw
        m = pre.instruction_lookups.num_memories
        ni = len(self.instruction_classes)
        il_rw = rw_commitments[il_base: il_base + 2 * C + 2 * m + ni + 1]
        il_commit_map = {
            "E": il_rw[C + m: C + 2 * m],
            "flags": il_rw[C + 2 * m: C + 2 * m + ni],
            "outputs": il_rw[C + 2 * m + ni],
        }
        il.verify_instruction_lookups(pre.instruction_lookups,
                                      proof.instruction_lookups,
                                      il_commit_map, acc, transcript)

        # registers/RAM + output sumcheck + timestamp validity
        rwm.verify_memory_checking(proof.read_write_memory.memory_checking_proof,
                                   transcript, spec)
        v_final_commitment = if_commitments[1]  # [bc.t_final, v_final, t_final, ...]
        rwm.verify_outputs(proof.read_write_memory.output_proof, program_io,
                           v_final_commitment, acc, transcript, spec)
        ts_base = il_base + 2 * C + 2 * m + ni + 1
        ts_commits = rw_commitments[ts_base: ts_base + 28]
        rwm_t_read_commits = rw_commitments[n_bc + 13: n_bc + 20]
        ts.verify_timestamp_validity(
            proof.read_write_memory.timestamp_validity_proof,
            ts_commits + rwm_t_read_commits, acc, transcript, spec)

        # Spartan — witness commitments in flatten order
        witness_commitments = self._flattened_commitments(rw_commitments, m)
        r1cs_mod.spartan_verify(proof.r1cs, key, witness_commitments, acc,
                                transcript, spec)

        acc.reduce_and_verify(pre.pcs, proof.opening_proof, transcript)

    def _flattened_commitments(self, rw: list, m: int) -> list:
        """Map committed polys (JoltStuff order) to r1cs flatten order.

        rw layout: bytecode (a, v0..v5, t_read = 8) ‖ rwm (a_ram, 7 reads,
        rd_write, 4 ram writes, 7 t_read, 4 t_write = 24) ‖ il (dim*C,
        read_cts*m, E*m, flags*ni, outputs) ‖ ts (28) ‖ r1cs (chunks_x*C,
        chunks_y*C, op_flags*12, aux*(9+C)).
        """
        C = self.C
        ni = len(self.instruction_classes)
        bc_base, rwm_base, il_base = 0, 8, 32
        ts_base = il_base + C + 2 * m + ni + 1
        r1cs_base = ts_base + 28
        num_aux = 9 + C
        out = [rw[bc_base]]
        out += [rw[bc_base + 1 + i] for i in range(6)]
        out.append(rw[rwm_base])
        out += [rw[rwm_base + 1 + i] for i in range(7)]
        out.append(rw[rwm_base + 8])
        out += [rw[rwm_base + 9 + i] for i in range(4)]
        out += [rw[il_base + i] for i in range(C)]            # chunks_query
        out.append(rw[il_base + C + 2 * m + ni])              # lookup_output
        out += [rw[r1cs_base + i] for i in range(2 * C + NUM_CIRCUIT_FLAGS)]
        out += [rw[il_base + C + 2 * m + k] for k in range(ni)]  # instr flags
        out += [rw[r1cs_base + 2 * C + NUM_CIRCUIT_FLAGS + i]
                for i in range(num_aux)]
        assert len(out) == len(self.layout)
        return out
