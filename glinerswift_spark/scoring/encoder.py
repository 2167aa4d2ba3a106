"""File-loadable numpy transformer encoder — the encoder seam, exercised.

The container ships no torch/onnxruntime and the reference ships no
encoder weights, so extraction normally runs on deterministic stub
states. This module proves the DEPLOYMENT PATH a real encoder takes,
end to end:

    weights on disk (raw little-endian fp32 + metadata.json — the
    reference's artifact contract, ref SpanHead/SpanHeadResources.swift:
    12-67, SpanHeadMetadata.swift)
      -> Manifest artifact resolution (sources/manifest.py, ref
         Models/GLiNERManifest.swift:31-88)
      -> sc.broadcast(EncoderWeights) once on the driver  OR a
         weights_dir opened per worker (spark-submit --files)
      -> per-worker singleton (scoring.backends.get_backend spec cache)
      -> BATCHED hidden states per encoding: one fused QKV GEMM per
         layer over the whole [T, d] token matrix — zero per-token python

``NumpyEncoder`` is a real (tiny) pre-LN transformer: token embeddings
(a [V, d] table over the unigram tokenizer's bounded vocab), sinusoidal
positions, N blocks of single-head self-attention + GELU-free ReLU FFN
with residuals, final layer norm. Weights are random-init-then-saved —
the VALUES are immaterial; the files -> broadcast -> batch CONTRACT is
what the tests pin (a trained checkpoint in this format drops in
without touching any pipeline code).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

from glinerswift_spark.scoring.heads import _load_tensor, _save_tensor, _seeded

METADATA = "encoder.json"


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * g + b


def _softmax_rows(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


class NumpyEncoder:
    """Tiny pre-LN transformer over subword ids. All tensors float32 in
    memory — the artifact files ARE fp32, so float64 residency was pure
    upcasting: it doubled per-forward DRAM traffic and halved SIMD width
    for zero fidelity gain. At production width (d=512, 6 layers) the
    forward is memory-bandwidth-bound — this host's DRAM saturates at
    ~8 streaming cores (measured 36.5 GB/s at 8 procs vs 42.6 at 32) —
    so halving bytes is the single biggest lever on both throughput and
    N->4N core-scaling. Forward is pure numpy sgemm."""

    def __init__(self, tensors: dict, n_layers: int, dim: int, vocab: int,
                 max_len: int = 512):
        self.t = {k: np.asarray(v, dtype=np.float32) for k, v in tensors.items()}
        self.n_layers = n_layers
        self.dim = dim
        self.vocab = vocab
        # sinusoidal positions — derived, not stored (parameter-free);
        # extended lazily in forward() when a sequence outgrows the table
        # (PromptEncodingSpec.max_seq_len is configurable, so 512 is a
        # starting capacity, not a limit — ADVICE r4)
        self.pos = self._sinusoid(max_len, dim)

    @staticmethod
    def _sinusoid(max_len: int, dim: int) -> np.ndarray:
        pos = np.arange(max_len)[:, None]
        i = np.arange(dim)[None, :]
        angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
        pe = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
        # computed in f64 for table-extension bit-stability, held in f32
        return (pe * 0.1).astype(np.float32)

    # -- construction ------------------------------------------------------
    @classmethod
    def seeded(cls, dim: int = 64, n_layers: int = 2, vocab: int = 192,
               key: str = "npencoder") -> "NumpyEncoder":
        t = {"emb": _seeded((vocab, dim), key + ":emb")}
        for l in range(n_layers):
            p = f"l{l}."
            for name, shape in (
                ("wq", (dim, dim)), ("wk", (dim, dim)), ("wv", (dim, dim)),
                ("wo", (dim, dim)),
                ("w1", (dim, 4 * dim)), ("b1", (4 * dim,)),
                ("w2", (4 * dim, dim)), ("b2", (dim,)),
            ):
                t[p + name] = _seeded(shape, f"{key}:{p}{name}")
            for name in ("ln1", "ln2"):
                t[p + name + ".g"] = np.ones(dim)
                t[p + name + ".b"] = np.zeros(dim)
        t["lnf.g"] = np.ones(dim)
        t["lnf.b"] = np.zeros(dim)
        return cls(t, n_layers, dim, vocab)

    # -- the reference's raw-fp32 + metadata artifact contract -------------
    def save(self, out_dir: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        meta = {
            "n_layers": self.n_layers, "dim": self.dim, "vocab": self.vocab,
            "tensors": {},
        }
        for name, arr in sorted(self.t.items()):
            fn = name.replace("/", "_") + ".bin"
            _save_tensor(arr, os.path.join(out_dir, fn))
            meta["tensors"][name] = {"file": fn, "shape": list(arr.shape)}
        path = os.path.join(out_dir, METADATA)
        with open(path, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        return path

    @classmethod
    def load(cls, base_dir: str) -> "NumpyEncoder":
        with open(os.path.join(base_dir, METADATA)) as f:
            meta = json.load(f)
        t = {}
        for name, info in meta["tensors"].items():
            shape = tuple(info["shape"])
            n = int(np.prod(shape)) if shape else 1
            t[name] = _load_tensor(
                os.path.join(base_dir, info["file"]), n
            ).reshape(shape)
        return cls(t, meta["n_layers"], meta["dim"], meta["vocab"])

    # -- batched forward ---------------------------------------------------
    def forward(self, input_ids, attention_mask) -> np.ndarray:
        """[T] ids, [T] 0/1 mask -> [T, dim] hidden states. One GEMM set
        per layer over the whole sequence; pad columns are attention-
        masked out (pad ROWS are re-zeroed by the backend's P6 step)."""
        ids = np.asarray(input_ids, dtype=np.int64) % self.vocab
        T = ids.shape[0]
        if T > self.pos.shape[0]:
            # grow geometrically so repeated long sequences rebuild O(log)
            # times; values for existing rows are identical (pure function
            # of (position, dim))
            self.pos = self._sinusoid(max(T, 2 * self.pos.shape[0]), self.dim)
        x = self.t["emb"][ids] + self.pos[:T]
        live = np.asarray(attention_mask, dtype=bool)
        t = self.t
        scale = 1.0 / np.sqrt(self.dim)
        for l in range(self.n_layers):
            p = f"l{l}."
            h = _layer_norm(x, t[p + "ln1.g"], t[p + "ln1.b"])
            att = (h @ t[p + "wq"]) @ (h @ t[p + "wk"]).T * scale
            att[:, ~live] = -1e30
            x = x + (_softmax_rows(att) @ (h @ t[p + "wv"])) @ t[p + "wo"]
            h = _layer_norm(x, t[p + "ln2.g"], t[p + "ln2.b"])
            x = x + np.maximum(h @ t[p + "w1"] + t[p + "b1"], 0.0) @ t[p + "w2"]
        return _layer_norm(x, t["lnf.g"], t["lnf.b"])

    def forward_many(self, ids_list: list, mask_list: list) -> list:
        """Batched forward over B sequences, PACKED (not padded) into one
        [sum(T_i), d] token matrix.

        The forward is DRAM-bandwidth-bound at production width (see
        class docstring): per-sequence calls re-stream every weight
        matrix per document, so B documents cost B weight sweeps — the
        north star's "batched inference" (the reference's explicit
        per-doc TODO, ref GLiNERModel.swift:179). Packing beats padding
        twice over: (1) a pad-to-batch-max layout inflates both the d^2
        projections AND the O(T^2) attention by the pad ratio (measured
        1.6x SLOWER than per-doc on sf0.1 web docs, T spread 107-478);
        (2) numpy 1.26 routes 3D [B,T,d] @ [d,d] through a non-BLAS
        stacked loop (~8x slower than one reshaped 2D sgemm at d=512).
        Packed, every weight projection is ONE 2D [sumT, d] GEMM with
        zero waste, and only the per-sequence attention — whose 2D
        slices are exactly what forward() computes — loops in python.
        Values therefore match per-sequence forward() up to fp32 GEMM
        reassociation (pinned by test_forward_many_matches_per_sequence
        at 1e-5)."""
        B = len(ids_list)
        if B == 0:
            return []
        if B == 1:
            return [self.forward(ids_list[0], mask_list[0])]
        Ts = [len(x) for x in ids_list]
        Tm = max(Ts)
        if Tm > self.pos.shape[0]:
            self.pos = self._sinusoid(max(Tm, 2 * self.pos.shape[0]), self.dim)
        offs = [0]
        for n in Ts:
            offs.append(offs[-1] + n)
        ids = np.concatenate([
            np.asarray(i, dtype=np.int64) % self.vocab for i in ids_list
        ])
        dead = [  # per-sequence masked-out column indices (usually none)
            np.nonzero(~np.asarray(m, dtype=bool))[0] for m in mask_list
        ]
        x = self.t["emb"][ids] + np.concatenate(
            [self.pos[:n] for n in Ts]
        )                                                # [sumT, d]
        t = self.t
        scale = 1.0 / np.sqrt(self.dim)
        for l in range(self.n_layers):
            p = f"l{l}."
            h = _layer_norm(x, t[p + "ln1.g"], t[p + "ln1.b"])
            q, k, v = h @ t[p + "wq"], h @ t[p + "wk"], h @ t[p + "wv"]
            av = np.empty_like(q)
            for i in range(B):
                s, e = offs[i], offs[i + 1]
                att = q[s:e] @ k[s:e].T * scale
                if dead[i].size:
                    att[:, dead[i]] = -1e30
                av[s:e] = _softmax_rows(att) @ v[s:e]
            x = x + av @ t[p + "wo"]
            h = _layer_norm(x, t[p + "ln2.g"], t[p + "ln2.b"])
            x = x + np.maximum(h @ t[p + "w1"] + t[p + "b1"], 0.0) @ t[p + "w2"]
        x = _layer_norm(x, t["lnf.g"], t["lnf.b"])
        return [x[offs[i]: offs[i + 1]] for i in range(B)]


# per-worker singleton: one weight load per (worker, dir) — the same
# discipline get_backend applies to whole backends
_ENCODER_CACHE: dict = {}


def load_encoder_cached(weights_dir: str) -> NumpyEncoder:
    enc = _ENCODER_CACHE.get(weights_dir)
    if enc is None:
        enc = _ENCODER_CACHE[weights_dir] = NumpyEncoder.load(weights_dir)
    return enc


@dataclass(frozen=True)
class FileEncoderProvider:
    """``hidden_states_provider`` backed by file-loaded encoder weights.

    Exactly one of:
      * ``weights_broadcast`` — sc.broadcast(NumpyEncoder) made on the
        driver after .load(); .value is executor-cached by Spark (one
        deserialization per worker, shared across tasks);
      * ``weights_dir`` — loaded per worker through the module singleton
        above (ship the directory via spark-submit --files and resolve
        with Manifest.resolve_for_executors).

    Hashable + picklable so it can sit inside the frozen
    PromptEncodingSpec that keys the per-worker backend cache.
    """

    weights_dir: str = ""
    weights_broadcast: object = None

    def _encoder(self) -> NumpyEncoder:
        if self.weights_broadcast is not None:
            return self.weights_broadcast.value
        if not self.weights_dir:
            raise ValueError("FileEncoderProvider needs weights_dir or broadcast")
        return load_encoder_cached(self.weights_dir)

    def __call__(self, encoding, default_states: np.ndarray) -> np.ndarray:
        return self._encoder().forward(
            encoding.input_ids, encoding.attention_mask
        )

    # Packing pays only while the packed activations stay cache-resident:
    # measured on this host (d=512 x 6L, taskset-pinned single core,
    # B=16), packed-vs-per-seq speedup by sequence length is
    #   T=10: 6.9x   T=25: 3.8x   T=50: 2.5x   T=100: 1.8x
    #   T=200: 1.3x  T=400: 0.7x  (loses — the [sumT, 4d] FFN
    # intermediate goes DRAM-bound while per-seq stays in L2/L3).
    # The token budget derives from that ONE measured anchor — 3,072
    # packed tokens x 4d fp32 ≈ 25 MB FFN intermediate at d=512 was the
    # edge of the winning region — expressed in BYTES so WIDER widths
    # land on the same cache bound (a GLiNER2-class d=768 checkpoint
    # gets ~2,048 tokens). The per-sequence cutoff is capped at the
    # measured 256 and never raised for narrow dims: a d=64 sweep put
    # the packed-vs-per-seq crossover at ~T=150 (1.12x at T=100, 0.90x
    # at T=200) — the crossover moves EARLIER as dim shrinks because
    # the O(T^2) attention (not amortizable by packing) takes a larger
    # share — so min(256, budget/12) slightly overshoots for toys,
    # costing ~10-25% on sub-millisecond documents, accepted for
    # simplicity.
    PACK_BYTES_BUDGET = 3072 * 4 * 512 * 4  # ≈ 25 MB, the d=512 anchor

    def _pack_limits(self, dim: int) -> tuple:
        budget = max(256, self.PACK_BYTES_BUDGET // (4 * dim * 4))
        return min(256, budget // 12), budget

    def forward_batch(self, encodings: list) -> list:
        """Batched hidden states for a list of SchemaEncodings (the
        backend's score_documents seam): short sequences packed into
        token-budgeted forward_many calls, long ones per-sequence."""
        enc = self._encoder()
        max_t, token_budget = self._pack_limits(enc.dim)
        out: list = [None] * len(encodings)
        pack: list = []   # chunks of indices, each under the token budget
        cur: list = []
        cur_tok = 0
        for i, e in enumerate(encodings):
            n = len(e.input_ids)
            if n > max_t:
                out[i] = enc.forward(e.input_ids, e.attention_mask)
                continue
            if cur and cur_tok + n > token_budget:
                pack.append(cur)
                cur, cur_tok = [], 0
            cur.append(i)
            cur_tok += n
        if cur:
            pack.append(cur)
        for chunk in pack:
            states = enc.forward_many(
                [encodings[i].input_ids for i in chunk],
                [encodings[i].attention_mask for i in chunk],
            )
            for i, s in zip(chunk, states):
                out[i] = s
        return out
