from .keccak import keccak256
from .math import log2_strict, next_power_of_two

__all__ = ["keccak256", "log2_strict", "next_power_of_two"]
