"""Trie tokenizer: vocab file -> byte-level CharTrie -> shortest-path
(min-score Viterbi) tokenization.

Replaces mlx.data's C++ CharTrie/Tokenizer (reference tokenizer.py uses
``mlx.data.core.CharTrie`` + ``tokenize_shortest``). Three vocab dialects
are supported with the reference's conventions (tokenizer.py:8-129):

- t5:   sentencepiece TSV (token \\t logprob); '▁' -> space; specials
        </s> <unk> <pad>; scores = -logprob (min-sum == max likelihood)
- bert: wordpiece TSV; [SEP]/[CLS]/[PAD]; non-special scores forced to 0
- spm (default): specials <pad> <s> </s> inserted first, <0xNN> byte
        tokens materialised, specials scored max+1

A C++ implementation of the DP inner loop can be loaded via
ml_mdm_tpu.native (same algorithm, ~20x faster for long captions); this
pure-Python version is the always-available reference implementation.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple


class _TrieNode:
    __slots__ = ("children", "id")

    def __init__(self):
        self.children: Dict[int, "_TrieNode"] = {}
        self.id: Optional[int] = None


class CharTrie:
    """Byte-level trie with mlx.data.core.CharTrie-compatible surface."""

    def __init__(self):
        self.root = _TrieNode()
        self._keys: List[bytes] = []

    def insert(self, token: bytes) -> int:
        if isinstance(token, str):
            token = token.encode("utf-8")
        node = self.root
        for b in token:
            node = node.children.setdefault(b, _TrieNode())
        if node.id is None:
            node.id = len(self._keys)
            self._keys.append(token)
        return node.id

    def search(self, token) -> Optional[_TrieNode]:
        if isinstance(token, str):
            token = token.encode("utf-8")
        node = self.root
        for b in token:
            node = node.children.get(b)
            if node is None:
                return None
        return node if node.id is not None else None

    def num_keys(self) -> int:
        return len(self._keys)

    def key(self, i: int) -> bytes:
        return self._keys[i]

    def key_string(self, i: int) -> str:
        return self._keys[i].decode("utf-8", errors="replace")


def tokenize_shortest(
    trie: CharTrie,
    text,
    scores: Optional[List[float]] = None,
    ignore_unk: bool = True,
) -> List[int]:
    """Min-total-score segmentation via Viterbi over the token lattice.

    Without scores, every token costs 1 (=> fewest tokens). Unknown bytes
    are skipped when ignore_unk (mlx behaviour), else raise."""
    if isinstance(text, str):
        data = text.encode("utf-8")
    else:
        data = bytes(text)
    n = len(data)
    INF = float("inf")
    # cost to reach position i, backpointer (prev_pos, token_id or None)
    dist = [INF] * (n + 1)
    back: List[Optional[Tuple[int, Optional[int]]]] = [None] * (n + 1)
    dist[0] = 0.0
    unk_cost = 1e9  # any real segmentation beats skipping a byte

    for i in range(n):
        di = dist[i]
        if di == INF:
            continue
        node = trie.root
        j = i
        matched = False
        while j < n:
            node = node.children.get(data[j])
            if node is None:
                break
            j += 1
            if node.id is not None:
                matched = True
                cost = di + (scores[node.id] if scores is not None else 1.0)
                if cost < dist[j]:
                    dist[j] = cost
                    back[j] = (i, node.id)
        if not matched or dist[i + 1] == INF:
            # allow skipping this byte (unknown)
            if ignore_unk:
                cost = di + unk_cost
                if cost < dist[i + 1]:
                    dist[i + 1] = cost
                    back[i + 1] = (i, None)
            elif not matched:
                raise ValueError(
                    f"untokenizable byte {data[i]!r} at position {i}"
                )

    tokens: List[int] = []
    pos = n
    while pos > 0:
        prev, tok = back[pos]
        if tok is not None:
            tokens.append(tok)
        pos = prev
    tokens.reverse()
    return tokens


# ---------------------------------------------------------------------------
# vocab dialects
# ---------------------------------------------------------------------------

_SEP = "▁".encode()


def read_dictionary_t5(vocab_file: str):
    trie, scores = CharTrie(), []
    with open(vocab_file, "rb") as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            token, score = line.split(b"\t")
            token = token.replace(_SEP, b" ")
            if trie.search(token):
                raise RuntimeError(f"token {token!r} already exists")
            trie.insert(token)
            scores.append(-float(score))
    eos = _find(trie, "</s>")
    bos = _find(trie, "<unk>")
    pad = _find(trie, "<pad>")
    return trie, scores, eos, bos, pad


def read_dictionary_bert(vocab_file: str):
    trie, scores = CharTrie(), []
    specials = (b"[PAD]", b"[SEP]", b"[CLS]")
    with open(vocab_file, "rb") as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            token, score = line.split(b"\t")
            token = token.replace(_SEP, b" ")
            if trie.search(token):
                raise RuntimeError(f"token {token!r} already exists")
            trie.insert(token)
            scores.append(-float(score) if token in specials else 0.0)
    eos = _find(trie, "[SEP]")
    bos = _find(trie, "[CLS]")
    pad = _find(trie, "[PAD]")
    return trie, scores, eos, bos, pad


def read_dictionary(vocab_file: str):
    trie, scores = CharTrie(), []
    specials = [b"<pad>", b"<s>", b"</s>"]
    for token in specials:
        trie.insert(token)
        scores.append(0.0)
    max_score = 0.0
    with open(vocab_file, "rb") as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            token, score = line.split(b"\t")
            s = -float(score)
            if re.match(b"^<.*>$", token):
                if token not in specials:
                    specials.append(token)
            else:
                token = token.replace(_SEP, b" ")
                if trie.search(token):
                    raise RuntimeError(f"token {token!r} already exists")
                trie.insert(token)
                scores.append(s)
            max_score = max(max_score, s)
    for token in specials:
        hex_byte = re.match(b"^<0x(..)>$", token)
        if hex_byte:
            token = bytes.fromhex(hex_byte.groups()[0].decode())
        if not trie.search(token):
            trie.insert(token)
            scores.append(max_score + 1.0)
    eos = _find(trie, "</s>")
    bos = _find(trie, "<s>")
    pad = _find(trie, "<pad>")
    return trie, scores, eos, bos, pad


def _find(trie: CharTrie, token: str) -> int:
    node = trie.search(token)
    return node.id if node is not None else -1


class Tokenizer:
    """Reference-compatible tokenizer facade (tokenizer.py:132-175) plus
    ``tokenize_shortest`` (which the reference delegates to mlx C++)."""

    def __init__(self, vocab_file: str, mode: Optional[str] = None):
        if mode == "t5":
            parts = read_dictionary_t5(vocab_file)
        elif mode == "bert":
            parts = read_dictionary_bert(vocab_file)
        else:
            parts = read_dictionary(vocab_file)
        (self._trie, self._trie_key_scores, self.eos, self.bos,
         self.pad) = parts
        self.vocab_size = self._trie.num_keys()
        self._native = None  # lazily attached C++ tokenizer

    @property
    def trie(self):
        return self._trie

    @property
    def trie_key_scores(self):
        return self._trie_key_scores

    def tokens2text(self, tokens) -> str:
        return "".join(self._trie.key_string(int(t)) for t in tokens)

    def token_id(self, token) -> int:
        node = self._trie.search(token)
        if node is None:
            raise ValueError(f"token: {token} not found in vocab.")
        return node.id

    def tokenize_shortest(self, text, use_scores: bool = True) -> List[int]:
        if self._native is None:
            try:
                from ml_mdm_tpu.native import trie_tokenizer

                self._native = trie_tokenizer.NativeTokenizer(
                    self._trie, self._trie_key_scores
                )
            except Exception:
                self._native = False
        if self._native:
            return self._native.tokenize_shortest(text, use_scores)
        return tokenize_shortest(
            self._trie,
            text,
            self._trie_key_scores if use_scores else None,
            ignore_unk=True,
        )
