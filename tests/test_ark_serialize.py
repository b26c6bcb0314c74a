"""ark-serialize compatible encodings: literal byte vectors + round-trips.

The generator/infinity vectors below are frozen so a Rust-enabled round
can diff `ark_bn254` bytes immediately (kzg.rs:22-84, serializable.rs).
"""
import pytest

from jolt_tpu.curve.bn254 import Q, G1Affine, G2Affine
from jolt_tpu.field.spec import FR_MODULUS
from jolt_tpu.utils import ark_serialize as a


def test_fr_roundtrip_and_vector():
    assert a.fr_to_bytes(1) == b"\x01" + b"\x00" * 31
    for v in (0, 1, FR_MODULUS - 1, 12345678901234567890):
        assert a.fr_from_bytes(a.fr_to_bytes(v)) == v % FR_MODULUS
    with pytest.raises(AssertionError):
        a.fr_from_bytes(FR_MODULUS.to_bytes(32, "little"))


def test_g1_generator_vector():
    """ark_bn254 G1 generator (1, 2): y = 2 is 'positive' (2 <= q-2), so the
    compressed encoding is x = 1 LE with no flag bits."""
    g = G1Affine.generator()
    assert a.g1_to_compressed(g) == b"\x01" + b"\x00" * 31
    assert a.g1_to_compressed(g.neg()) == \
        b"\x01" + b"\x00" * 30 + b"\x80"
    inf = bytearray(32)
    inf[31] = 0x40
    assert a.g1_to_compressed(G1Affine.identity()) == bytes(inf)


def test_g1_compressed_roundtrip():
    g = G1Affine.generator().to_jacobian()
    p = g
    for _ in range(12):
        aff = p.to_affine()
        assert a.g1_from_compressed(a.g1_to_compressed(aff)) == aff
        assert a.g1_from_compressed(a.g1_to_compressed(aff.neg())) == \
            aff.neg()
        p = p.add(g).double()
    assert a.g1_from_compressed(
        a.g1_to_compressed(G1Affine.identity())).is_infinity


def test_g1_uncompressed_roundtrip():
    aff = G1Affine.generator().to_jacobian().double().to_affine()
    assert a.g1_from_uncompressed(a.g1_to_uncompressed(aff)) == aff
    assert a.g1_from_uncompressed(
        a.g1_to_uncompressed(G1Affine.identity())).is_infinity


def test_g2_compressed_roundtrip():
    g = G2Affine.generator()
    p = g
    for _ in range(6):
        assert a.g2_from_compressed(a.g2_to_compressed(p)) == p
        assert a.g2_from_compressed(a.g2_to_compressed(p.neg())) == p.neg()
        p = p.add(g)
    assert a.g2_from_compressed(
        a.g2_to_compressed(G2Affine.identity())).is_infinity


def test_fq2_sqrt_edge_cases():
    """c1 == 0 branches: c0 a QR (sqrt in Fq) and c0 a non-QR (sqrt = t·u)."""
    r = a._fq2_sqrt((4, 0))
    assert (r[0] * r[0] + (Q - 1) * r[1] * r[1]) % Q in (4, 4 % Q) \
        or r == (2, 0) or r == (Q - 2, 0)
    nonqr = Q - 1                        # -1 is a non-QR when q ≡ 3 mod 4
    r = a._fq2_sqrt((nonqr, 0))
    # (t·u)² = -t² = c0  ⇒  t² = -c0 = 1
    assert r[0] == 0 and (Q - r[1] * r[1]) % Q == nonqr


def test_srs_save_load(tmp_path):
    g = G1Affine.generator().to_jacobian()
    pts, p = [], g
    for _ in range(8):
        pts.append(p.to_affine())
        p = p.add(g).double()
    g2 = G2Affine.generator()
    beta_g2 = g2.add(g2)
    path = str(tmp_path / "srs.bin")
    a.save_srs(path, pts, g2, beta_g2)
    g1_back, g2_back, beta_back = a.load_srs(path)
    assert g1_back == pts and g2_back == g2 and beta_back == beta_g2


def test_hyperkzg_srs_persistence_roundtrip(tmp_path):
    """from_srs -> save_srs (ark bytes) -> load_srs -> identical SRS."""
    from jolt_tpu.commitment.hyperkzg import HyperKZG
    from jolt_tpu.commitment.kzg import srs_g1_host

    g = G1Affine.generator().to_jacobian()
    pts, p = [], g
    for _ in range(8):
        pts.append(p.to_affine())
        p = p.add(g).double()
    g2 = G2Affine.generator()
    beta_g2 = g2.add(g2).add(g2)
    pcs = HyperKZG.from_srs(pts, g2, beta_g2)
    path = str(tmp_path / "srs.ark")
    pcs.save_srs(path)
    back = HyperKZG.load_srs(path)
    assert srs_g1_host(back.pk) == pts
    assert back.vk.g2 == g2 and back.vk.beta_g2 == beta_g2
    assert back.pk.n == 8


def test_preprocessing_seed_roundtrip():
    """Preprocessing persistence (rv32i_vm.rs:193-235 analog): the seed
    data (bytecode rows + memory image + layout params) round-trips and
    rebuilds an identical preprocessing."""
    from jolt_tpu.field import fr_spec
    from jolt_tpu.utils.serialization import (
        deserialize_preprocessing_seed, serialize_preprocessing_seed)
    from jolt_tpu.vm.bytecode import BytecodeRow
    from jolt_tpu.vm.guests import collatz_program
    from jolt_tpu.vm.host import _lookup_name
    from jolt_tpu.vm.rv32i_vm import rv32i_vm
    from jolt_tpu.vm.virtual_sequences import expand_bytecode

    program = collatz_program(7)
    vm = rv32i_vm(fr_spec())
    ni = len(vm.instruction_classes)
    bytecode_rows = [
        BytecodeRow.from_instruction(i, vm.name_to_index.get(_lookup_name(i)),
                                     ni)
        for i in expand_bytecode(program)]
    blob = serialize_preprocessing_seed(
        bytecode_rows, b"\x01\x02", 0x80000000, 64, 32)
    rows2, mem2, min_addr, max_in, max_out = \
        deserialize_preprocessing_seed(blob)
    assert (mem2, min_addr, max_in, max_out) == (b"\x01\x02", 0x80000000,
                                                 64, 32)
    assert len(rows2) == len(bytecode_rows)
    for a, b in zip(bytecode_rows, rows2):
        assert (a.address, a.bitflags, a.rd, a.rs1, a.rs2, a.imm,
                a.virtual_sequence_remaining) == \
               (b.address, b.bitflags, b.rd, b.rs1, b.rs2, b.imm,
                b.virtual_sequence_remaining)
