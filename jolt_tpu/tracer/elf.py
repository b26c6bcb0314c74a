"""ELF decoding: RV32IM disassembler (reference: tracer/src/lib.rs:73-118 +
decode.rs — linear sweep of Text sections at/above RAM_START_ADDRESS,
unrecognized words become UNIMPL).

Uses pyelftools when reading .elf files; `decode_word` implements the RV32IM
instruction-word decoder directly.
"""
from __future__ import annotations

from ..vm.rv_trace import RAM_START_ADDRESS, ELFInstruction, RV32IM


def _sign(v: int, bits: int) -> int:
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _u32_imm(v: int) -> int:
    return v & 0xFFFFFFFF


def decode_word(word: int, address: int) -> ELFInstruction:
    opcode = word & 0x7F
    rd = (word >> 7) & 0x1F
    funct3 = (word >> 12) & 0x7
    rs1 = (word >> 15) & 0x1F
    rs2 = (word >> 20) & 0x1F
    funct7 = (word >> 25) & 0x7F

    def instr(op, **kw):
        return ELFInstruction(address=address, opcode=op, **kw)

    if opcode == 0x33:  # R-type
        table = {
            (0x0, 0x00): RV32IM.ADD, (0x0, 0x20): RV32IM.SUB,
            (0x4, 0x00): RV32IM.XOR, (0x6, 0x00): RV32IM.OR,
            (0x7, 0x00): RV32IM.AND, (0x1, 0x00): RV32IM.SLL,
            (0x5, 0x00): RV32IM.SRL, (0x5, 0x20): RV32IM.SRA,
            (0x2, 0x00): RV32IM.SLT, (0x3, 0x00): RV32IM.SLTU,
            (0x0, 0x01): RV32IM.MUL, (0x1, 0x01): RV32IM.MULH,
            (0x2, 0x01): RV32IM.MULHSU, (0x3, 0x01): RV32IM.MULHU,
            (0x4, 0x01): RV32IM.DIV, (0x5, 0x01): RV32IM.DIVU,
            (0x6, 0x01): RV32IM.REM, (0x7, 0x01): RV32IM.REMU,
        }
        op = table.get((funct3, funct7))
        if op is None:
            return instr(RV32IM.UNIMPL)
        return instr(op, rd=rd, rs1=rs1, rs2=rs2)

    if opcode == 0x13:  # I-type ALU
        imm = _sign(word >> 20, 12)
        shamt = (word >> 20) & 0x1F
        if funct3 == 0x0:
            return instr(RV32IM.ADDI, rd=rd, rs1=rs1, imm=_u32_imm(imm))
        if funct3 == 0x4:
            return instr(RV32IM.XORI, rd=rd, rs1=rs1, imm=_u32_imm(imm))
        if funct3 == 0x6:
            return instr(RV32IM.ORI, rd=rd, rs1=rs1, imm=_u32_imm(imm))
        if funct3 == 0x7:
            return instr(RV32IM.ANDI, rd=rd, rs1=rs1, imm=_u32_imm(imm))
        if funct3 == 0x2:
            return instr(RV32IM.SLTI, rd=rd, rs1=rs1, imm=_u32_imm(imm))
        if funct3 == 0x3:
            return instr(RV32IM.SLTIU, rd=rd, rs1=rs1, imm=_u32_imm(imm))
        if funct3 == 0x1:
            return instr(RV32IM.SLLI, rd=rd, rs1=rs1, imm=shamt)
        if funct3 == 0x5:
            op = RV32IM.SRAI if funct7 == 0x20 else RV32IM.SRLI
            return instr(op, rd=rd, rs1=rs1, imm=shamt)
        return instr(RV32IM.UNIMPL)

    if opcode == 0x03:  # loads
        imm = _sign(word >> 20, 12)
        op = {0x0: RV32IM.LB, 0x1: RV32IM.LH, 0x2: RV32IM.LW,
              0x4: RV32IM.LBU, 0x5: RV32IM.LHU}.get(funct3)
        if op is None:
            return instr(RV32IM.UNIMPL)
        return instr(op, rd=rd, rs1=rs1, imm=_u32_imm(imm))

    if opcode == 0x23:  # stores
        imm = _sign(((word >> 25) << 5) | rd, 12)
        op = {0x0: RV32IM.SB, 0x1: RV32IM.SH, 0x2: RV32IM.SW}.get(funct3)
        if op is None:
            return instr(RV32IM.UNIMPL)
        return instr(op, rs1=rs1, rs2=rs2, imm=_u32_imm(imm))

    if opcode == 0x63:  # branches
        imm = _sign((((word >> 31) & 1) << 12) | (((word >> 7) & 1) << 11)
                    | (((word >> 25) & 0x3F) << 5) | (((word >> 8) & 0xF) << 1),
                    13)
        op = {0x0: RV32IM.BEQ, 0x1: RV32IM.BNE, 0x4: RV32IM.BLT,
              0x5: RV32IM.BGE, 0x6: RV32IM.BLTU, 0x7: RV32IM.BGEU}.get(funct3)
        if op is None:
            return instr(RV32IM.UNIMPL)
        return instr(op, rs1=rs1, rs2=rs2, imm=_u32_imm(imm))

    if opcode == 0x6F:  # JAL
        imm = _sign((((word >> 31) & 1) << 20) | (((word >> 12) & 0xFF) << 12)
                    | (((word >> 20) & 1) << 11) | (((word >> 21) & 0x3FF) << 1),
                    21)
        return instr(RV32IM.JAL, rd=rd, imm=_u32_imm(imm))

    if opcode == 0x67 and funct3 == 0x0:  # JALR
        imm = _sign(word >> 20, 12)
        return instr(RV32IM.JALR, rd=rd, rs1=rs1, imm=_u32_imm(imm))

    if opcode == 0x37:  # LUI
        return instr(RV32IM.LUI, rd=rd, imm=word & 0xFFFFF000)
    if opcode == 0x17:  # AUIPC
        return instr(RV32IM.AUIPC, rd=rd, imm=word & 0xFFFFF000)
    if opcode == 0x0F:
        return instr(RV32IM.FENCE)
    if opcode == 0x73:
        if word == 0x73:
            return instr(RV32IM.ECALL)
        if word == 0x00100073:
            return instr(RV32IM.EBREAK)

    return instr(RV32IM.UNIMPL)


def decode_elf(path: str) -> tuple[list[ELFInstruction], list[tuple[int, int]],
                                   int]:
    """Decode an ELF file: (instructions, memory init (addr, byte), entry).

    Mirrors tracer::decode (lib.rs:73-118): executable sections at/above
    RAM_START_ADDRESS are linearly swept; data sections become memory init.
    """
    from elftools.elf.elffile import ELFFile

    instructions = []
    memory_init: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        elf = ELFFile(f)
        entry = elf.header.e_entry
        for section in elf.iter_sections():
            addr = section["sh_addr"]
            if addr < RAM_START_ADDRESS or section["sh_type"] == "SHT_NOBITS":
                continue
            data = section.data()
            if section["sh_flags"] & 0x4:  # SHF_EXECINSTR
                for off in range(0, len(data) - 3, 4):
                    word = int.from_bytes(data[off:off + 4], "little")
                    instructions.append(decode_word(word, addr + off))
            else:
                for off, b in enumerate(data):
                    memory_init.append((addr + off, b))
    return instructions, memory_init, entry
