from .memory_checking import (MemoryCheckingProof, MemoryCheckingProver,
                              MultisetHashes)
from .surge import (SurgePreprocessing, SurgeProof, generate_witness,
                    surge_prove, surge_verify)

__all__ = ["MemoryCheckingProof", "MemoryCheckingProver", "MultisetHashes",
           "SurgePreprocessing", "SurgeProof", "generate_witness",
           "surge_prove", "surge_verify"]
