"""L2: signatures, keys, Merkle trees.

Upstream counterparts (SURVEY.md §2.3): slingshot/{starsig, musig, keytree,
merkle} — Schnorr over Ristretto with Merlin transcripts (single + batch
verification), n-of-n MuSig aggregation, hierarchical key derivation, and
Merlin-hashed binary Merkle trees.
"""

from .merkle import MerkleTree, Path  # noqa: F401
from .starsig import Signature, VerificationKey, sign, verify, verify_batch  # noqa: F401
from .musig import Multikey  # noqa: F401
from .keytree import Xprv, Xpub  # noqa: F401
