"""SentencePiece-unigram subword tokenizer (F3), from scratch.

Behavioral re-expression of ref Tokenization/SentencePieceUnigram.swift:
  * normalize: trim -> NFKC -> collapse [\\s U+3000 U+FEFF]+ to ' ' ->
    ensure leading space -> map ' ' to '▁' (:176-196);
  * lattice: at each position, every dictionary piece of length
    <= max_token_length starting there; positions with no match get a
    single UNK candidate of length 1 (:218-235);
  * Viterbi: maximize summed piece scores; strict > update means the
    FIRST candidate (by position, then insertion order = piece length
    ascending) wins ties (:248-262);
  * backtrack from the end; unreachable positions fall back to UNK
    (:264-281);
  * special tokens register with score 0 and extend max_token_length
    (:165-171).

Vocabulary format matches HF tokenizer.json "unigram": a list of
[piece, log_prob]. This implementation is pure python/dict — the
per-worker cache in scoring/backends.get_backend is how it would ship to
executors (load once per worker, like the reference's per-directory
tokenizer cache, ref GLiNERTokenizer.swift:442-463).
"""

from __future__ import annotations

import json
import re
import unicodedata
from dataclasses import dataclass

_WS = re.compile("[\\s　﻿]+")


@dataclass(frozen=True)
class Piece:
    id: int
    token: str
    score: float


class UnigramTokenizer:
    def __init__(self, vocab: list, unk_token: str = "<unk>"):
        """``vocab``: iterable of (piece, score); ids = positional index."""
        self.pieces: dict[str, Piece] = {}
        for i, (tok, score) in enumerate(vocab):
            self.pieces[tok] = Piece(i, tok, float(score))
        if unk_token not in self.pieces:
            raise ValueError(f"vocab must contain the UNK piece {unk_token!r}")
        self.unk = self.pieces[unk_token]
        self.max_token_length = max((len(t) for t in self.pieces), default=1)

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "UnigramTokenizer":
        with open(path) as f:
            data = json.load(f)
        model = data["model"]
        if model.get("type", "").lower() != "unigram":
            raise ValueError("tokenizer.json model.type must be 'unigram'")
        unk_id = model.get("unk_id", 0)
        vocab = model["vocab"]
        return cls(vocab, unk_token=vocab[unk_id][0])

    def register_special_token(self, token: str, id: int) -> None:
        self.pieces[token] = Piece(id, token, 0.0)
        self.max_token_length = max(self.max_token_length, len(token))

    def normalize(self, text: str) -> str:
        out = unicodedata.normalize("NFKC", text.strip())
        out = _WS.sub(" ", out)
        if not out:
            return ""
        if not out.startswith(" "):
            out = " " + out
        return out.replace(" ", "▁")

    def tokenize(self, text: str) -> tuple[list[int], list[str]]:
        s = self.normalize(text)
        n = len(s)
        if n == 0:
            return [], []

        # lattice[i] = candidates starting at i, shortest first (tie order)
        lattice: list[list[tuple[int, Piece]]] = []
        for i in range(n):
            cands = []
            for size in range(1, min(self.max_token_length, n - i) + 1):
                p = self.pieces.get(s[i : i + size])
                if p is not None:
                    cands.append((size, p))
            if not cands:
                cands.append((1, self.unk))
            lattice.append(cands)

        NEG = float("-inf")
        scores = [NEG] * (n + 1)
        back: list[tuple[int, int, Piece] | None] = [None] * (n + 1)
        scores[0] = 0.0
        for pos in range(n):
            cur = scores[pos]
            if cur == NEG:
                continue
            for size, piece in lattice[pos]:
                nxt = pos + size
                ns = cur + piece.score
                if ns > scores[nxt]:  # strict: first writer wins ties
                    scores[nxt] = ns
                    back[nxt] = (pos, size, piece)

        ids: list[int] = []
        toks: list[str] = []
        pos = n
        while pos > 0:
            bp = back[pos]
            if bp is None:  # unreachable -> UNK fallback, one char
                ids.append(self.unk.id)
                toks.append(self.unk.token)
                pos -= 1
            else:
                prev, _size, piece = bp
                ids.append(piece.id)
                toks.append(piece.token)
                pos = prev
        ids.reverse()
        toks.reverse()
        return ids, toks

    def tokenize_words(self, words: list[str]) -> tuple[list[int], list[str], list[int]]:
        """Tokenize a word sequence; returns (ids, tokens, word_mask) where
        word_mask[k] = 1-based word index for the FIRST subword of each
        word, 0 otherwise — the reference's first-subword convention
        (ref Tokenization/TokenizedInput.swift:4-28, SpanScorer first-
        subword gather)."""
        ids: list[int] = []
        toks: list[str] = []
        mask: list[int] = []
        for wi, word in enumerate(words, start=1):
            w_ids, w_toks = self.tokenize(word)
            ids.extend(w_ids)
            toks.extend(w_toks)
            mask.extend([wi] + [0] * (len(w_ids) - 1))
        return ids, toks, mask
