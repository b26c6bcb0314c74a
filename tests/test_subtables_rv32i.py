"""Materialize/MLE parity for the full RV32I subtable zoo.

Mirrors subtable_materialize_mle_parity_test! (subtable/test.rs:1-24): for
every index, evaluating the closed-form MLE at the index bits must equal the
materialized entry; additionally the MLE at a random point must match the
direct MLE sum of the table.
"""
import random

import pytest

from jolt_tpu.field import fr, fr_spec
from jolt_tpu.poly import mle
from jolt_tpu.subtables import (AndSubtable, DivByZeroSubtable, EqAbsSubtable,
                                EqSubtable, IdentitySubtable,
                                LeftIsZeroSubtable, LeftMSBSubtable,
                                LtAbsSubtable, LtuSubtable, OrSubtable,
                                RightIsZeroSubtable, RightMSBSubtable,
                                SignExtendSubtable, SllSubtable,
                                SraSignSubtable, SrlSubtable,
                                TruncateOverflowSubtable, XorSubtable,
                                ZeroLSBSubtable)
from jolt_tpu.utils.math import log2_strict

RNG = random.Random(31337)

SUBTABLES = (
    [AndSubtable(), OrSubtable(), XorSubtable(), EqSubtable(),
     EqAbsSubtable(), LtuSubtable(), LtAbsSubtable(), LeftMSBSubtable(),
     RightMSBSubtable(), LeftIsZeroSubtable(), RightIsZeroSubtable(),
     DivByZeroSubtable(), IdentitySubtable(), ZeroLSBSubtable(),
     SignExtendSubtable(4), TruncateOverflowSubtable(32),
     SraSignSubtable(32)]
    + [SllSubtable(i, 32) for i in range(4)]
    + [SrlSubtable(i, 32) for i in range(4)]
)


@pytest.mark.parametrize("subtable", SUBTABLES, ids=lambda s: s.name)
def test_materialize_mle_parity(subtable):
    M = 256
    entries = subtable.materialize_entries(M)
    ell = log2_strict(M)
    for idx in list(range(16)) + [RNG.randrange(M) for _ in range(24)] + [M - 1]:
        bits = [fr((idx >> (ell - 1 - k)) & 1) for k in range(ell)]
        got = subtable.evaluate_mle(bits)
        assert got == fr(int(entries[idx])), (subtable.name, idx, int(entries[idx]))
    # random-point parity against the direct MLE
    r = [fr(RNG.randrange(fr_spec().p)) for _ in range(ell)]
    direct = mle.evaluate_host([fr(int(e)) for e in entries], r)
    assert subtable.evaluate_mle(r) == direct, subtable.name
