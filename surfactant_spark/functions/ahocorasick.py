"""Aho-Corasick multi-pattern literal matcher (from-scratch textbook
implementation: trie + BFS failure links + output merging).

Role parity with the reference's prefilter (surfactant/utils/
ahocorasick.py builds an automaton over literal prefixes and confirms
candidates with the full regex): for small dictionaries the vectorized
pandas ``str.contains`` prefilter wins (C string search per literal),
but cost grows linearly with pattern count — at 10k+ entities a single
AC scan of each text replaces 10k substring passes.  detect_mentions
switches to this automaton above a pattern-count threshold.

Matching is case-insensitive (patterns and text lowered), consistent
with the per-literal prefilter path.
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    def __init__(self, patterns: dict[str, list[int]] | list[str]):
        """patterns: literal → list of pattern-ids (or a plain list,
        ids = indices)."""
        if isinstance(patterns, list):
            patterns = {p: [i] for i, p in enumerate(patterns)}
        # trie as list-of-dicts: node → {char: node}
        self._next: list[dict[str, int]] = [{}]
        self._out: list[set[int]] = [set()]
        self._fail: list[int] = [0]
        for lit, ids in patterns.items():
            self._insert(lit.lower(), ids)
        self._build_failure_links()

    def _insert(self, lit: str, ids: list[int]) -> None:
        node = 0
        for ch in lit:
            nxt = self._next[node].get(ch)
            if nxt is None:
                self._next.append({})
                self._out.append(set())
                self._fail.append(0)
                nxt = len(self._next) - 1
                self._next[node][ch] = nxt
            node = nxt
        self._out[node].update(ids)

    def _build_failure_links(self) -> None:
        q = deque()
        for child in self._next[0].values():
            self._fail[child] = 0
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self._next[node].items():
                q.append(child)
                f = self._fail[node]
                while f and ch not in self._next[f]:
                    f = self._fail[f]
                self._fail[child] = self._next[f].get(ch, 0)
                if self._fail[child] == child:  # root self-loop guard
                    self._fail[child] = 0
                self._out[child] |= self._out[self._fail[child]]

    def search_ids(self, text: str) -> set[int]:
        """Set of pattern-ids with at least one occurrence in text."""
        text = text.lower()
        node = 0
        hits: set[int] = set()
        for ch in text:
            while node and ch not in self._next[node]:
                node = self._fail[node]
            node = self._next[node].get(ch, 0)
            if self._out[node]:
                hits |= self._out[node]
        return hits

    def find_all(self, text: str) -> list[tuple[int, int]]:
        """(pattern_id, end_index) for every occurrence (end-inclusive
        position of the match's last char) — the start-position-report
        shape the reference exposes for windowed regex confirm.

        The caller must pass already-lowercased text: offsets are
        reported against the string *as given*, and ``str.lower()`` can
        change string length for some Unicode code points ('İ' → 'i̇'),
        so lowering here would silently misalign offsets against the
        caller's raw string."""
        node = 0
        out: list[tuple[int, int]] = []
        for i, ch in enumerate(text):
            while node and ch not in self._next[node]:
                node = self._fail[node]
            node = self._next[node].get(ch, 0)
            for pid in self._out[node]:
                out.append((pid, i))
        return out
