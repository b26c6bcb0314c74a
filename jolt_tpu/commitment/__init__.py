from .base import BatchType, CommitShape, CommitmentScheme
from .mock import MockCommitment, MockCommitmentScheme

__all__ = ["BatchType", "CommitShape", "CommitmentScheme",
           "MockCommitment", "MockCommitmentScheme"]
