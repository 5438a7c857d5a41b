"""Utreexo: a dynamic hash accumulator for the UTXO set.

Upstream counterpart: slingshot/blockchain/src/utreexo (SURVEY.md §2.7):
a forest of perfect Merkle trees; O(log n) membership proofs; insertion by
binary carries; deletion by splitting the containing tree into its path-
sibling subtrees; a Catchup structure re-bases stale proofs after updates.

Key invariant exploited for deletion (and proof catch-up): in a perfect
tree, the proof siblings of a leaf are exactly the roots of the perfect
subtrees left over when that leaf is removed — so a valid proof carries all
material needed to restructure the forest, and an old proof stays usable as
long as SOME prefix of its climb lands on a current root or on a node the
latest Catchup knows how to re-parent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..oracle.merlin import Transcript

_LABEL = b"ZkVM.utreexo"


def leaf_hash(item: bytes) -> bytes:
    t = Transcript(_LABEL)
    t.append_message(b"leaf", item)
    return t.challenge_bytes(b"utreexo.leaf", 32)


def node_hash(left: bytes, right: bytes) -> bytes:
    t = Transcript(_LABEL)
    t.append_message(b"L", left)
    t.append_message(b"R", right)
    return t.challenge_bytes(b"utreexo.node", 32)


@dataclass
class UtreexoProof:
    """Position bits (LSB = level 0: 0 = leaf is left child) + siblings."""
    position: int
    neighbors: list[bytes]


class UtreexoError(Exception):
    pass


@dataclass
class Catchup:
    """Re-bases proofs issued before the latest update.

    parent: child_hash -> (parent_hash, sibling_hash, child_is_right)
    for every node merged during the update.
    """
    parent: dict[bytes, tuple[bytes, bytes, bool]] = field(default_factory=dict)
    root_set: set[bytes] = field(default_factory=set)

    def update_proof(self, item: bytes, proof: UtreexoProof) -> UtreexoProof:
        """Climb the old proof until a hash the new forest knows, then splice
        the new climb on top (upstream Catchup::update_proof)."""
        h = leaf_hash(item)
        pos = proof.position
        kept: list[bytes] = []
        level = 0
        cur = h
        while True:
            if cur in self.root_set or cur in self.parent:
                break
            if level >= len(proof.neighbors):
                raise UtreexoError("proof cannot be caught up")
            sib = proof.neighbors[level]
            kept.append(sib)
            cur = node_hash(sib, cur) if (pos >> level) & 1 else node_hash(cur, sib)
            level += 1
        # now climb the new-parent map
        new_neighbors = list(kept)
        new_pos_bits = pos & ((1 << level) - 1)
        bit = level
        while cur in self.parent:
            parent_h, sibling, is_right = self.parent[cur]
            new_neighbors.append(sibling)
            if is_right:
                new_pos_bits |= 1 << bit
            bit += 1
            cur = parent_h
        return UtreexoProof(new_pos_bits, new_neighbors)


class Utreexo:
    """The accumulator: at most one perfect-tree root per height."""

    MAX_HEIGHT = 64

    def __init__(self):
        self.roots: list[bytes | None] = [None] * self.MAX_HEIGHT
        self.num_leaves = 0

    # -------------------------------------------------------------- queries
    def root_list(self) -> list[tuple[int, bytes]]:
        return [(h, r) for h, r in enumerate(self.roots) if r is not None]

    def state_hash(self) -> bytes:
        t = Transcript(_LABEL)
        for h, r in self.root_list():
            t.append_u64(b"height", h)
            t.append_message(b"root", r)
        return t.challenge_bytes(b"utreexo.state", 32)

    def verify(self, item: bytes, proof: UtreexoProof) -> int:
        """Return the level at which the proof's climb meets a current root;
        raises if it never does."""
        cur = leaf_hash(item)
        pos = proof.position
        for level in range(len(proof.neighbors) + 1):
            if level < len(self.roots) and self.roots[level] == cur:
                return level
            if level == len(proof.neighbors):
                break
            sib = proof.neighbors[level]
            cur = (
                node_hash(sib, cur) if (pos >> level) & 1 else node_hash(cur, sib)
            )
        raise UtreexoError("invalid utreexo proof")

    # -------------------------------------------------------------- updates
    def insert(self, item: bytes, _events: list | None = None):
        self._insert_node(0, leaf_hash(item), _events)
        self.num_leaves += 1

    def _insert_node(self, height: int, h: bytes, events: list | None):
        while self.roots[height] is not None:
            left = self.roots[height]
            self.roots[height] = None
            merged = node_hash(left, h)
            if events is not None:
                events.append((merged, left, h, height))
            h = merged
            height += 1
        self.roots[height] = h

    def delete(self, item: bytes, proof: UtreexoProof,
               _events: list | None = None):
        """Remove a proven leaf: drop the matched root, re-insert the proof's
        sibling subtrees as independent trees of heights 0..level-1."""
        level = self.verify(item, proof)
        self.roots[level] = None
        for h in range(level - 1, -1, -1):
            self._insert_node(h, proof.neighbors[h], _events)
        self.num_leaves -= 1

    def update(self, deletions: list[tuple[bytes, UtreexoProof]],
               insertions: list[bytes]) -> Catchup:
        """Apply a block's worth of changes; returns the Catchup for
        re-basing outstanding proofs (upstream Forest::update + Catchup)."""
        # verify everything against the pre-state first (atomicity)
        probe = self.copy()
        for item, proof in deletions:
            probe.delete(item, proof)
        events: list = []
        for item, proof in deletions:
            self.delete(item, proof, _events=events)
        for item in insertions:
            self.insert(item, _events=events)
        catchup = Catchup()
        for merged, left, right, _h in events:
            catchup.parent[left] = (merged, right, False)
            catchup.parent[right] = (merged, left, True)
        catchup.root_set = {r for _, r in self.root_list()}
        return catchup

    def copy(self) -> "Utreexo":
        c = Utreexo()
        c.roots = list(self.roots)
        c.num_leaves = self.num_leaves
        return c

    def prove_path_for_insert_batch(self, items: list[bytes]) -> None:
        """Proof tracking is wallet-side: fresh inserts are their own trees
        until merged; wallets derive initial proofs from the Catchup returned
        by update()."""
        return None
