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
    return BatchedGrandProductProof(layers)


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
