"""TermAutomatonQuery: token-automaton matching over positions.

Mirrors the reference sandbox query
(``lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
TermAutomatonQuery.java:90-260`` + ``TermAutomatonScorer.java:230-340``):
an automaton whose transitions consume one token position each — term
transitions require that term at the position, ANY transitions advance the
position unconditionally (the scorer's any-arc loop steps between anchor
occurrences with no token-existence check, ``TermAutomatonScorer.java:
276-300``) — matching anywhere in the document. The reference forbids
leading and trailing ANY transitions (``TermAutomatonQuery.java:157,167``);
we enforce the same, plus two documented v1 bounds: the automaton must be
acyclic (the graph-synonym shapes the query exists for are DAGs; Lucene's
RunAutomaton also handles loops) and state 0 (the start) must have no
incoming transitions. Constant-score match contract (count / k smallest
docIDs), the same v1 contract as the span family — the reference's
freq-based similarity scoring is a documented cut.

The kernel is a vectorized DAG data-flow: ``reach[state]`` holds sorted
``doc·2^34 + next_pos`` keys ("some path reaches ``state`` about to consume
``next_pos``"); states process in topological order; a term arc intersects
the reach set with the term's position keys (one ``np.intersect1d``), an
ANY arc adds 1. No per-doc or per-position Python loops.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.search.phrase import _POS_M, _structs_for_slots


def validate_automaton(transitions, n_states: int, accept) -> list[int]:
    """Check the v1 contract and return a topological state order.

    ``transitions``: iterable of (from_state, to_state, slot) where slot is
    a term, a tuple of alternative terms (parallel arcs), or None for ANY.
    """
    accept = set(accept)
    if not accept:
        raise ValueError("automaton needs at least one accept state")
    if 0 in accept:
        raise ValueError("state 0 (start) cannot be an accept state")
    indeg = [0] * n_states
    adj: list[list[int]] = [[] for _ in range(n_states)]
    for u, v, slot in transitions:
        if not (0 <= u < n_states and 0 <= v < n_states):
            raise ValueError(f"transition ({u},{v}) out of range")
        if v == 0:
            raise NotImplementedError(
                "v1: state 0 (start) cannot have incoming transitions")
        if slot is None:
            # TermAutomatonQuery.java:157,167 — same rule as the reference
            if u == 0:
                raise ValueError("automaton cannot lead with an ANY transition")
            if v in accept:
                raise ValueError("automaton cannot end with an ANY transition")
        indeg[v] += 1
        adj[u].append(v)
    order, stack = [], [s for s in range(n_states) if indeg[s] == 0]
    while stack:
        u = stack.pop()
        order.append(u)
        for v in adj[u]:
            indeg[v] -= 1
            if indeg[v] == 0:
                stack.append(v)
    if len(order) != n_states:
        raise NotImplementedError("v1: automaton must be acyclic")
    return order


def segment_term_automaton(rows, transitions, n_states: int, accept):
    """Matching SEGMENT-LOCAL docIDs for one segment's postings rows."""
    order = validate_automaton(transitions, n_states, accept)
    accept = set(accept)
    # per-slot sorted position keys; an absent slot is an EMPTY array (a
    # dead arc), never a dead query — other paths may still accept
    slot_keys: dict = {}
    for _, _, slot in transitions:
        if slot is None or slot in slot_keys:
            continue
        names = slot if isinstance(slot, tuple) else (slot,)
        per = _structs_for_slots(rows, [names])
        if per is None:
            slot_keys[slot] = np.zeros(0, np.int64)
            continue
        docs, tfs, _nm, flat, _offs = per[0]
        if docs.size and int(docs[-1]) >= (1 << 29):
            raise ValueError(
                "segment_term_automaton requires segment-local docIDs < 2^29")
        slot_keys[slot] = (np.repeat(docs, tfs.astype(np.int64)) * _POS_M
                           + flat.astype(np.int64))

    by_from: dict[int, list] = {}
    for u, v, slot in transitions:
        by_from.setdefault(u, []).append((v, slot))

    reach: dict[int, list] = {s: [] for s in range(n_states)}
    matched: list[np.ndarray] = []
    for u in order:
        if u == 0:
            ru = None  # start state: a match may begin at any position
        else:
            parts = reach[u]
            if not parts:
                continue
            ru = np.unique(np.concatenate(parts))
            if ru.size == 0:
                continue
        for v, slot in by_from.get(u, ()):
            if slot is None:  # ANY: advance unconditionally
                nxt = ru + 1
            else:
                tk = slot_keys[slot]
                if tk.size == 0:
                    continue
                hit = tk if ru is None else np.intersect1d(
                    tk, ru, assume_unique=False)
                if hit.size == 0:
                    continue
                nxt = hit + 1
                if v in accept:
                    matched.append(hit // _POS_M)
            reach[v].append(nxt)
    if not matched:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(matched))
