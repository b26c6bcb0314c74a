from .sumcheck import SumcheckInstanceProof, prove_arbitrary

__all__ = ["SumcheckInstanceProof", "prove_arbitrary"]
