from .base import JoltInstruction, SubtableIndices
from .bitwise import AndInstruction, OrInstruction, XorInstruction

__all__ = ["JoltInstruction", "SubtableIndices",
           "AndInstruction", "OrInstruction", "XorInstruction"]
