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
    # branchless stable form: z = exp(-|x|) never overflows;
    # x >= 0 -> 1/(1+z), x < 0 -> z/(1+z) — elementwise identical to the
    # two-branch version, no boolean-index allocations (this runs per
    # LSTM timestep, so per-call overhead is the hot cost)
    z = np.exp(-np.abs(x))
    return np.where(x >= 0, 1.0, z) / (1.0 + z)


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
        # input-side projection for ALL timesteps in one GEMM; the
        # recurrence below only adds the h-dependent part. One sigmoid
        # call over the whole 4H gate vector per step (i/f/o slices of it
        # are elementwise identical to per-gate calls; the g quarter's
        # sigmoid lanes are discarded) — per-call numpy overhead on tiny
        # per-gate vectors was the single-core bottleneck of this head.
        pre = xs @ w_ih.T + b  # [T, 4H]
        w_hh_t = w_hh.T
        out = np.empty((T, H))
        h = np.zeros(H)
        c = np.zeros(H)
        order = range(T - 1, -1, -1) if reverse else range(T)
        for t in order:
            gates = pre[t] + h @ w_hh_t
            act = sigmoid(gates)
            g = np.tanh(gates[2 * H : 3 * H])
            c = act[H : 2 * H] * c + act[0:H] * g
            h = act[3 * H : 4 * H] * np.tanh(c)
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
        # stack the [h_start ‖ h_end] pairs of EVERY width into one matrix
        # and run the FFN once — one big GEMM instead of 2*max_width small
        # ones (per-call GEMM overhead dominated this head's tail)
        pairs = np.concatenate(
            [
                np.concatenate([h[: n - w], h[w:n]], axis=1)
                for w in range(min(max_width, n))
            ],
            axis=0,
        )  # [sum_w (n-w), 4H]
        reps = self.ffn(pairs)
        off = 0
        for w in range(min(max_width, n)):
            m = n - w
            out[:m, w, :] = reps[off : off + m]
            off += m
        return out
