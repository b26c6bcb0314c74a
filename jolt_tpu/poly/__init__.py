from . import mle
from .unipoly import CompressedUniPoly, UniPoly

__all__ = ["mle", "CompressedUniPoly", "UniPoly"]
