from .spec import (FieldSpec, FR_MODULUS, FQ_MODULUS, LIMB_BITS, LIMB_MASK,
                   NUM_LIMBS, fr_spec, fq_spec, int_to_limbs, limbs_to_int)
from .host import FElt, fr, fq, fr_random, batch_inverse
from . import device

__all__ = [
    "FieldSpec", "FR_MODULUS", "FQ_MODULUS", "LIMB_BITS", "LIMB_MASK",
    "NUM_LIMBS", "fr_spec", "fq_spec", "int_to_limbs", "limbs_to_int",
    "FElt", "fr", "fq", "fr_random", "batch_inverse", "device",
]
