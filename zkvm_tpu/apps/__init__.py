"""L7 application helpers (SURVEY.md §2.8): accounts and token issuance —
thin builders over the ZkVM prover driver, the analogues of
slingshot/{accounts,token}.  The p2p layer and demo node are out of core
scope (no bearing on the proving stack).
"""

from .token import Token, issue_program  # noqa: F401
from .accounts import Receiver, Account, pay_program  # noqa: F401
