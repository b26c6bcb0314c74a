from .base import LassoSubtable
from .bitwise import AndSubtable, OrSubtable, XorSubtable
from .rv32i import (DivByZeroSubtable, EqAbsSubtable, EqSubtable,
                    IdentitySubtable, LeftIsZeroSubtable, LeftMSBSubtable,
                    LtAbsSubtable, LtuSubtable, RightIsZeroSubtable,
                    RightMSBSubtable, SignExtendSubtable, SllSubtable,
                    SraSignSubtable, SrlSubtable, TruncateOverflowSubtable,
                    ZeroLSBSubtable)

__all__ = ["LassoSubtable", "AndSubtable", "OrSubtable", "XorSubtable",
           "DivByZeroSubtable", "EqAbsSubtable", "EqSubtable",
           "IdentitySubtable", "LeftIsZeroSubtable", "LeftMSBSubtable",
           "LtAbsSubtable", "LtuSubtable", "RightIsZeroSubtable",
           "RightMSBSubtable", "SignExtendSubtable", "SllSubtable",
           "SraSignSubtable", "SrlSubtable", "TruncateOverflowSubtable",
           "ZeroLSBSubtable"]
