from .base import LassoSubtable
from .bitwise import AndSubtable, OrSubtable, XorSubtable

__all__ = ["LassoSubtable", "AndSubtable", "OrSubtable", "XorSubtable"]
