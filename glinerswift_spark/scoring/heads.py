"""Numpy neural head kernels (F12): Linear, FFN, BiLSTM, span-rep head.

Faithful re-expressions of the reference's from-scratch kernels:
  * Linear: y = W x + b (ref SpanHead/LinearLayer.swift:22-73)
  * FFN: Linear -> ReLU -> Linear (ref LinearLayer.swift:76-81 usage)
  * BiLSTM: single layer, gate order [i, f, g, o], sigmoid/sigmoid/tanh/
    sigmoid, c = f*c + i*g, h = o*tanh(c); bidirectional output is the
    per-timestep CONCAT of forward and backward hidden states
    (ref SpanHead/BiLSTM.swift:24-110)
  * SpanRepHead: contextualize words with the BiLSTM, then represent span
    (s, w) as FFN([h[s] ‖ h[s+w]]) — the start/end-projection shape of the
    reference's exported span head (ref Models/GLiNERSpanScoringModel.swift:41-99,
    Scripts/export_span_head.py:84-128).

Weights here are deterministic (seeded) — the container has no trained
checkpoints — but the numerics are the real ones, so a trained weight
file drops in without code changes (load via sources/manifest.py S1/S3).
"""

from __future__ import annotations

import hashlib

import numpy as np


def _seeded(shape, seed_key: str) -> np.ndarray:
    h = hashlib.md5(seed_key.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float64)


def sigmoid(x):
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


class Linear:
    def __init__(self, weight: np.ndarray, bias: np.ndarray):
        self.weight = weight  # [out, in]
        self.bias = bias      # [out]

    @classmethod
    def seeded(cls, in_dim: int, out_dim: int, key: str) -> "Linear":
        return cls(_seeded((out_dim, in_dim), key + ":w"), _seeded((out_dim,), key + ":b"))

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return x @ self.weight.T + self.bias


class FFN:
    """Linear -> ReLU -> Linear."""

    def __init__(self, lin1: Linear, lin2: Linear):
        self.lin1, self.lin2 = lin1, lin2

    @classmethod
    def seeded(cls, in_dim: int, hidden: int, out_dim: int, key: str) -> "FFN":
        return cls(Linear.seeded(in_dim, hidden, key + ":1"),
                   Linear.seeded(hidden, out_dim, key + ":2"))

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return self.lin2(np.maximum(self.lin1(x), 0.0))


class BiLSTM:
    """Single-layer BiLSTM; weights [4H, in]/[4H, H], bias [4H];
    gate order i, f, g, o (ref BiLSTM.swift:55-79)."""

    def __init__(self, w_ih_f, w_hh_f, b_f, w_ih_b=None, w_hh_b=None, b_b=None):
        self.fwd = (w_ih_f, w_hh_f, b_f)
        self.bwd = (w_ih_b, w_hh_b, b_b) if w_ih_b is not None else None
        self.hidden = b_f.shape[0] // 4

    @classmethod
    def seeded(cls, in_dim: int, hidden: int, key: str, bidirectional: bool = True):
        mk = lambda sfx, shape: _seeded(shape, f"{key}:{sfx}")
        args = [mk("ihf", (4 * hidden, in_dim)), mk("hhf", (4 * hidden, hidden)),
                mk("bf", (4 * hidden,))]
        if bidirectional:
            args += [mk("ihb", (4 * hidden, in_dim)), mk("hhb", (4 * hidden, hidden)),
                     mk("bb", (4 * hidden,))]
        return cls(*args)

    def _run(self, weights, xs: np.ndarray, reverse: bool) -> np.ndarray:
        w_ih, w_hh, b = weights
        H = self.hidden
        T = xs.shape[0]
        out = np.zeros((T, H))
        h = np.zeros(H)
        c = np.zeros(H)
        order = range(T - 1, -1, -1) if reverse else range(T)
        for t in order:
            gates = b + w_ih @ xs[t] + w_hh @ h
            i = sigmoid(gates[0:H])
            f = sigmoid(gates[H : 2 * H])
            g = np.tanh(gates[2 * H : 3 * H])
            o = sigmoid(gates[3 * H : 4 * H])
            c = f * c + i * g
            h = o * np.tanh(c)
            out[t] = h
        return out

    def __call__(self, xs: np.ndarray) -> np.ndarray:
        """[T, in] -> [T, H] or [T, 2H] (concat fwd/bwd per timestep)."""
        if xs.shape[0] == 0:
            width = self.hidden * (2 if self.bwd else 1)
            return np.zeros((0, width))
        f = self._run(self.fwd, xs, reverse=False)
        if self.bwd is None:
            return f
        bwd = self._run(self.bwd, xs, reverse=True)
        return np.concatenate([f, bwd], axis=1)


class SpanRepHead:
    """word embeddings -> BiLSTM context -> span rep via FFN([h_start ‖ h_end])."""

    def __init__(self, in_dim: int, hidden: int, out_dim: int, seed_key: str = "spanhead"):
        self.lstm = BiLSTM.seeded(in_dim, hidden, seed_key + ":lstm")
        self.ffn = FFN.seeded(4 * hidden, 2 * hidden, out_dim, seed_key + ":ffn")
        self.out_dim = out_dim

    def __call__(self, word_embs: np.ndarray, max_width: int) -> np.ndarray:
        """[n_words, in] -> span reps [n_words, max_width, out_dim];
        out-of-document spans are zero."""
        n = word_embs.shape[0]
        out = np.zeros((n, max_width, self.out_dim))
        if n == 0:
            return out
        h = self.lstm(word_embs)  # [n, 2H]
        for w in range(max_width):
            m = n - w
            if m <= 0:
                break
            pair = np.concatenate([h[:m], h[w : w + m]], axis=1)  # [m, 4H]
            out[:m, w, :] = self.ffn(pair)
        return out
