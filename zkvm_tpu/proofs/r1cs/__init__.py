"""Two-phase R1CS constraint-system proofs over committed values.

Upstream counterpart: bulletproofs/src/r1cs/* (the interstellar `yoloproofs`
feature, SURVEY.md §2.4): Prover/Verifier both implement the ConstraintSystem
interface so one gadget definition serves both; randomized (challenge-phase)
constraints enable efficient shuffle/permutation gadgets.
"""

from .lc import LinearCombination, Variable, ONE  # noqa: F401
from .proof import R1CSProof  # noqa: F401
from .prover import Prover  # noqa: F401
from .verifier import Verifier  # noqa: F401
from ..errors import R1CSError  # noqa: F401
