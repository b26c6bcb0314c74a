"""Generic field-element wrapper for device limb tensors.

Instruction `combine_lookups` collation polynomials and subtable MLEs are
written ONCE over a generic field type: they accept either host `FElt`s
(verifier path) or `DevF` device tensors (prover sumcheck path).  `DevF` is a
pytree, so combine functions trace cleanly under jit; int/FElt operands are
embedded as constants (they are only ever structural constants like 2^b —
never transcript challenges, which would silently bake into compiled code).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import device as fd
from .host import FElt
from .spec import FieldSpec


@jax.tree_util.register_pytree_node_class
class DevF:
    """A batch of field elements on device: limbs uint32[L, *shape]."""

    __slots__ = ("limbs", "spec")

    def __init__(self, limbs: jnp.ndarray, spec: FieldSpec):
        self.limbs = limbs
        self.spec = spec

    def tree_flatten(self):
        return (self.limbs,), self.spec

    @classmethod
    def tree_unflatten(cls, spec, children):
        return cls(children[0], spec)

    # -- coercion ------------------------------------------------------------
    def _coerce(self, other) -> jnp.ndarray:
        if isinstance(other, DevF):
            a, b = self.limbs, other.limbs
            if a.shape != b.shape:
                shape = jnp.broadcast_shapes(a.shape, b.shape)
                a = jnp.broadcast_to(a, shape)
                b = jnp.broadcast_to(b, shape)
            return a, b
        if isinstance(other, FElt):
            v = other.v
        elif isinstance(other, int):
            v = other % self.spec.p
        else:
            return NotImplemented
        const = fd.scalar_to_device(self.spec, v)
        const = const.reshape((fd.L,) + (1,) * (self.limbs.ndim - 1))
        return self.limbs, jnp.broadcast_to(const, self.limbs.shape)

    # -- arithmetic ----------------------------------------------------------
    def __add__(self, other):
        a, b = self._coerce(other)
        return DevF(fd.fadd(self.spec, a, b), self.spec)

    __radd__ = __add__

    def __sub__(self, other):
        a, b = self._coerce(other)
        return DevF(fd.fsub(self.spec, a, b), self.spec)

    def __rsub__(self, other):
        a, b = self._coerce(other)
        return DevF(fd.fsub(self.spec, b, a), self.spec)

    def __mul__(self, other):
        a, b = self._coerce(other)
        return DevF(fd.fmul(self.spec, a, b), self.spec)

    __rmul__ = __mul__

    def __neg__(self):
        return DevF(fd.fneg(self.spec, self.limbs), self.spec)

    def square(self):
        return self * self

    @staticmethod
    def one_like(spec: FieldSpec, like: "DevF") -> "DevF":
        return DevF(fd.ones(spec, like.limbs.shape[1:]), spec)


def f_one(example):
    """Multiplicative identity matching `example`'s type (FElt or DevF)."""
    if isinstance(example, DevF):
        return DevF.one_like(example.spec, example)
    return FElt(1, example.spec)


def f_zero(example):
    if isinstance(example, DevF):
        return DevF(fd.zeros(example.spec, example.limbs.shape[1:]), example.spec)
    return FElt(0, example.spec)
