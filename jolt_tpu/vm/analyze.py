"""Program analysis: trace summaries + per-opcode histograms.

Reference: jolt-core/src/host/analyze.rs — `ProgramSummary` {raw_trace,
bytecode, memory_init, io_device, processed_trace} with `analyze()`
returning instruction-frequency counts (analyze.rs:27-44), persisted with
bincode (write_to_file, analyze.rs:45-50).
"""
from __future__ import annotations

import pickle
from collections import Counter
from dataclasses import dataclass, field

from .rv_trace import JoltDevice, RV32IM


@dataclass
class ProgramSummary:
    raw_trace: list            # RVTraceRow list
    bytecode: list             # BytecodeRow list
    io_device: JoltDevice
    processed_trace: list = field(default_factory=list)  # JoltTraceStep list

    def trace_len(self) -> int:
        return len(self.raw_trace)

    def analyze(self) -> list[tuple[RV32IM, int]]:
        """Per-opcode counts, descending (analyze.rs:27-44)."""
        counts = Counter(r.instruction.opcode for r in self.raw_trace)
        return counts.most_common()

    def write_to_file(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def read_from_file(path: str) -> "ProgramSummary":
        with open(path, "rb") as f:
            return pickle.load(f)


def trace_analyze(program, vm, inputs: bytes = b"", **kw) -> ProgramSummary:
    """host/mod.rs:216-232 — trace and summarize a guest program."""
    from ..tracer.emulator import Emulator
    from .host import trace_program
    from .rv_trace import (DEFAULT_MAX_INPUT_SIZE, DEFAULT_MAX_OUTPUT_SIZE)
    device = JoltDevice.new(kw.get("max_input_size", DEFAULT_MAX_INPUT_SIZE),
                            kw.get("max_output_size", DEFAULT_MAX_OUTPUT_SIZE))
    device.inputs.extend(inputs)
    try:
        from ..native import trace_native
        raw = trace_native(program, device)
    except Exception:
        raw = Emulator(program, device).run()
    steps, _, bytecode_rows = trace_program(program, vm, inputs=inputs, **kw)
    return ProgramSummary(raw, bytecode_rows, device, steps)
