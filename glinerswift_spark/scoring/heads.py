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
import json
import os

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


def _load_tensor(path: str, count: int) -> np.ndarray:
    """Raw little-endian fp32 tensor, validated by element count — the
    reference's loading contract (ref SpanHead/SpanHeadResources.swift:48-61:
    byte-count check, then reinterpret as Float)."""
    arr = np.fromfile(path, dtype="<f4")
    if arr.size != count:
        raise ValueError(
            f"unexpected tensor element count for {path}: "
            f"expected {count}, got {arr.size}"
        )
    return arr.astype(np.float64)


def _save_tensor(arr: np.ndarray, path: str) -> None:
    np.ascontiguousarray(arr, dtype="<f4").tofile(path)


class Linear:
    def __init__(self, weight: np.ndarray, bias: np.ndarray):
        self.weight = weight  # [out, in]
        self.bias = bias      # [out]

    @classmethod
    def seeded(cls, in_dim: int, out_dim: int, key: str) -> "Linear":
        return cls(_seeded((out_dim, in_dim), key + ":w"), _seeded((out_dim,), key + ":b"))

    @classmethod
    def from_files(cls, base_dir: str, info: dict) -> "Linear":
        """``info`` = {"weight","bias","in_features","out_features"} — the
        reference's LinearInfo (ref SpanHead/SpanHeadMetadata.swift:4-15)."""
        n_in, n_out = info["in_features"], info["out_features"]
        w = _load_tensor(os.path.join(base_dir, info["weight"]), n_out * n_in)
        b = _load_tensor(os.path.join(base_dir, info["bias"]), n_out)
        return cls(w.reshape(n_out, n_in), b)

    def save(self, base_dir: str, name: str) -> dict:
        _save_tensor(self.weight, os.path.join(base_dir, f"{name}.weight.bin"))
        _save_tensor(self.bias, os.path.join(base_dir, f"{name}.bias.bin"))
        return {
            "weight": f"{name}.weight.bin",
            "bias": f"{name}.bias.bin",
            "in_features": int(self.weight.shape[1]),
            "out_features": int(self.weight.shape[0]),
        }

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

    @classmethod
    def from_files(cls, base_dir: str, info: dict) -> "FFN":
        """``info`` = {"fc1": LinearInfo, "fc2": LinearInfo} — the
        reference's ProjectionInfo (SpanHeadMetadata.swift:17-20)."""
        return cls(Linear.from_files(base_dir, info["fc1"]),
                   Linear.from_files(base_dir, info["fc2"]))

    def save(self, base_dir: str, name: str) -> dict:
        return {"fc1": self.lin1.save(base_dir, f"{name}.fc1"),
                "fc2": self.lin2.save(base_dir, f"{name}.fc2")}

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

    @classmethod
    def from_files(cls, base_dir: str, info: dict) -> "BiLSTM":
        """``info`` = the reference's RNNInfo shape (SpanHeadMetadata.swift:
        36-63): input_size, hidden_size, forward/backward each with
        weight_ih / weight_hh / bias file names."""
        n_in, h = info["input_size"], info["hidden_size"]

        def load_dir(d):
            return (
                _load_tensor(os.path.join(base_dir, d["weight_ih"]), 4 * h * n_in)
                .reshape(4 * h, n_in),
                _load_tensor(os.path.join(base_dir, d["weight_hh"]), 4 * h * h)
                .reshape(4 * h, h),
                _load_tensor(os.path.join(base_dir, d["bias"]), 4 * h),
            )

        fwd = load_dir(info["forward"])
        bwd = load_dir(info["backward"]) if info.get("backward") else (None, None, None)
        return cls(*fwd, *bwd)

    def _save_dir(self, weights, base_dir: str, name: str) -> dict:
        w_ih, w_hh, b = weights
        _save_tensor(w_ih, os.path.join(base_dir, f"{name}.weight_ih.bin"))
        _save_tensor(w_hh, os.path.join(base_dir, f"{name}.weight_hh.bin"))
        _save_tensor(b, os.path.join(base_dir, f"{name}.bias.bin"))
        return {"weight_ih": f"{name}.weight_ih.bin",
                "weight_hh": f"{name}.weight_hh.bin",
                "bias": f"{name}.bias.bin"}

    def save(self, base_dir: str, name: str) -> dict:
        info = {
            "input_size": int(self.fwd[0].shape[1]),
            "hidden_size": int(self.hidden),
            "num_layers": 1,
            "bidirectional": self.bwd is not None,
            "forward": self._save_dir(self.fwd, base_dir, f"{name}.fwd"),
        }
        if self.bwd is not None:
            info["backward"] = self._save_dir(self.bwd, base_dir, f"{name}.bwd")
        return info

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

    def _run_batch_fwd(self, weights, X: np.ndarray, T: int) -> np.ndarray:
        """Forward-direction recurrence over a padded batch [B, T, in].
        Rows shorter than T compute garbage past their length — callers
        slice per-row outputs to the true length, so it is never read."""
        w_ih, w_hh, b = weights
        H = self.hidden
        B = X.shape[0]
        pre = X @ w_ih.T + b            # [B, T, 4H] — one big GEMM
        w_hh_t = w_hh.T
        out = np.empty((B, T, H))
        h = np.zeros((B, H))
        c = np.zeros((B, H))
        for t in range(T):
            gates = pre[:, t] + h @ w_hh_t       # [B, 4H]
            act = sigmoid(gates)
            g = np.tanh(gates[:, 2 * H : 3 * H])
            c = act[:, H : 2 * H] * c + act[:, 0:H] * g
            h = act[:, 3 * H : 4 * H] * np.tanh(c)
            out[:, t] = h
        return out

    def run_batch(self, seqs: list) -> list:
        """Batched equivalent of calling the BiLSTM per sequence: the
        per-timestep h @ w_hh GEMM runs once for the whole batch instead
        of once per document — the per-call numpy overhead on tiny
        single-doc matrices is THE single-core cost of this head.
        Backward direction reuses the forward loop over per-row
        length-aware reversed sequences (state starts at each row's own
        last real token), so semantics match the per-doc path exactly;
        values agree to float round-off (batched GEMM kernels)."""
        seqs = [np.asarray(s) for s in seqs]
        lens = [s.shape[0] for s in seqs]
        width = self.hidden * (2 if self.bwd else 1)
        if not seqs or max(lens, default=0) == 0:
            return [np.zeros((0, width)) for _ in seqs]
        B, T = len(seqs), max(lens)
        D = seqs[0].shape[1] if seqs[0].ndim == 2 else self.fwd[0].shape[1]
        X = np.zeros((B, T, D))
        for i, s in enumerate(seqs):
            X[i, : lens[i]] = s
        f = self._run_batch_fwd(self.fwd, X, T)
        if self.bwd is None:
            return [f[i, : lens[i]] for i in range(B)]
        Xr = np.zeros_like(X)
        for i, s in enumerate(seqs):
            Xr[i, : lens[i]] = s[::-1]
        br = self._run_batch_fwd(self.bwd, Xr, T)
        return [
            np.concatenate([f[i, : lens[i]], br[i, : lens[i]][::-1]], axis=1)
            for i in range(B)
        ]


class SpanRepHead:
    """word embeddings -> BiLSTM context -> span rep via FFN([h_start ‖ h_end])."""

    def __init__(self, in_dim: int, hidden: int, out_dim: int, seed_key: str = "spanhead"):
        self.lstm = BiLSTM.seeded(in_dim, hidden, seed_key + ":lstm")
        self.ffn = FFN.seeded(4 * hidden, 2 * hidden, out_dim, seed_key + ":ffn")
        self.out_dim = out_dim

    @classmethod
    def from_files(cls, base_dir: str, info: dict) -> "SpanRepHead":
        head = cls.__new__(cls)
        head.lstm = BiLSTM.from_files(base_dir, info["rnn"])
        head.ffn = FFN.from_files(base_dir, info["ffn"])
        head.out_dim = info["ffn"]["fc2"]["out_features"]
        return head

    def save(self, base_dir: str, name: str) -> dict:
        return {"rnn": self.lstm.save(base_dir, f"{name}.rnn"),
                "ffn": self.ffn.save(base_dir, f"{name}.ffn")}

    def __call__(self, word_embs: np.ndarray, max_width: int) -> np.ndarray:
        """[n_words, in] -> span reps [n_words, max_width, out_dim];
        out-of-document spans are zero."""
        n = word_embs.shape[0]
        out = np.zeros((n, max_width, self.out_dim))
        if n == 0:
            return out
        h = self.lstm(word_embs)  # [n, 2H]
        return self._reps_from_context(h, n, max_width, out)

    def _pre_activations(self, h: np.ndarray, n: int, max_width: int) -> np.ndarray:
        """fc1 pre-activations for every (start, width) pair WITHOUT
        materializing the [pairs, 4H] matrix: fc1's weight splits as
        W1 [h_s ‖ h_e] = W1a h_s + W1b h_e, so project h through each
        half ONCE ([n, 2H] GEMMs) and ADD shifted views per width —
        ~8x fewer fc1 FLOPs than the pair-stacked GEMM at max_width 8
        (identical math; float summation order differs by round-off)."""
        halves = getattr(self, "_fc1_halves", None)
        if halves is None:
            W1 = self.ffn.lin1.weight
            half = W1.shape[1] // 2
            # contiguous transposed halves, computed once per head
            halves = self._fc1_halves = (
                np.ascontiguousarray(W1[:, :half].T),
                np.ascontiguousarray(W1[:, half:].T),
            )
        A = h @ halves[0]             # start-side projection  [n, hid]
        B = h @ halves[1]             # end-side projection    [n, hid]
        pres = [A[: n - w] + B[w:n] for w in range(min(max_width, n))]
        return np.concatenate(pres, axis=0) + self.ffn.lin1.bias

    def _reps_from_context(self, h, n, max_width, out):
        pre = self._pre_activations(h, n, max_width)
        reps = self.ffn.lin2(np.maximum(pre, 0.0))
        off = 0
        for w in range(min(max_width, n)):
            m = n - w
            out[:m, w, :] = reps[off : off + m]
            off += m
        return out

    def batch(self, word_embs_list: list, max_width: int) -> list:
        """Batched span reps: one BiLSTM batch pass, factored fc1
        projections per document, ONE fc2 GEMM over every document's
        stacked pre-activations."""
        hs = self.lstm.run_batch(word_embs_list)
        pres = []
        metas = []  # (n, n_widths)
        for h in hs:
            n = h.shape[0]
            n_widths = min(max_width, n)
            metas.append((n, n_widths))
            if n:
                pres.append(self._pre_activations(h, n, max_width))
        if pres:
            reps = self.ffn.lin2(np.maximum(np.concatenate(pres, axis=0), 0.0))
        else:
            reps = np.zeros((0, self.out_dim))
        outs = []
        off = 0
        for n, n_widths in metas:
            out = np.zeros((n, max_width, self.out_dim))
            for w in range(n_widths):
                m = n - w
                out[:m, w, :] = reps[off : off + m]
                off += m
            outs.append(out)
        return outs


def span_label_logits(span_rep: np.ndarray, projections: np.ndarray) -> np.ndarray:
    """J1 score kernel over per-instance label projections.

    ``span_rep`` [n_words, max_width, d] x ``projections`` [p, L, d]
    -> raw logits [p, n_words, max_width, L]; ``sigmoid`` of this is the
    reference's ground-truth score formula
    ``sigmoid(einsum("lkd,bpd->bplk", span_rep, struct_proj))``
    (ref Scripts/dump_gliner2_tensors.py:83,
    SpanHead/GLiNER2SpanScoreBuilder.swift:44-69).

    Implemented as one matmul per instance (p is <= max_count, tiny) so
    the p==1 slice is BIT-identical to the backends' ``span_rep @ lab.T``
    hot path — einsum's different reduction order would drift the last
    float bit and break the oracle score hashes.
    """
    span_rep = np.asarray(span_rep)
    projections = np.asarray(projections)
    if projections.ndim == 2:
        projections = projections[None]
    return np.stack([span_rep @ projections[p].T
                     for p in range(projections.shape[0])])


class CountEmbed:
    """Per-instance structure projections (count-conditioned label
    projections): label embeddings [L, d] -> [max_count, L, d], where
    instance i's projection is FFN(label_emb + count_embedding[i]).
    Mirrors the reference's count-embed head contract — one call maps the
    label embeddings to maxCount per-instance embedding sets, and the
    pipeline keeps the first predictedCount of them
    (ref Models/GLiNER2CountEmbedModel.swift:27-57 projectedEmbeddings,
    GLiNER2SpanPipeline.swift:119-124 prefix(predictedCount))."""

    def __init__(self, count_embedding: np.ndarray, proj: FFN):
        self.count_embedding = count_embedding  # [max_count, d]
        self.proj = proj

    @classmethod
    def seeded(cls, dim: int, max_count: int, key: str) -> "CountEmbed":
        return cls(_seeded((max_count, dim), key + ":emb"),
                   FFN.seeded(dim, dim, dim, key + ":proj"))

    @classmethod
    def from_files(cls, base_dir: str, info: dict) -> "CountEmbed":
        emb = _load_tensor(
            os.path.join(base_dir, info["embedding"]),
            info["max_count"] * info["dim"],
        ).reshape(info["max_count"], info["dim"])
        return cls(emb, FFN.from_files(base_dir, info["proj"]))

    def save(self, base_dir: str, name: str) -> dict:
        _save_tensor(self.count_embedding,
                     os.path.join(base_dir, f"{name}.embedding.bin"))
        return {"embedding": f"{name}.embedding.bin",
                "max_count": int(self.count_embedding.shape[0]),
                "dim": int(self.count_embedding.shape[1]),
                "proj": self.proj.save(base_dir, f"{name}.proj")}

    def __call__(self, label_embs: np.ndarray, count: int | None = None) -> np.ndarray:
        """[L, d] -> [count (or max_count), L, d]."""
        n = self.count_embedding.shape[0] if count is None else count
        return np.stack([
            self.proj(label_embs + self.count_embedding[i])
            for i in range(n)
        ]) if n > 0 else np.zeros((0,) + label_embs.shape)


class PromptHeads:
    """The complete GLiNER2 head bundle behind the prompt-encoding path:

      span_head        — SpanRepHead (BiLSTM + FFN over [h_start ‖ h_end])
      prompt_proj      — FFN projecting [E] prompt embeddings into the
                         span-rep space (ref SpanHeadMetadata
                         prompt_projection, SpanHeadResources.swift:33-36)
      count_predictor  — Linear [P]-embedding -> max_count+? logits
                         (ref GLiNER2CountPredictorModel via
                         GLiNER2SpanPipeline.swift:117)
      count_embed      — CountEmbed per-instance projections
      classifier       — Linear schema-embedding -> logit: the dedicated
                         classification head that scores labels from
                         their [C] prompt embeddings instead of the span
                         tensor (ref Models/GLiNER2ClassifierModel.swift:
                         18-51, GLiNER2SpanPipeline.swift:116)

    ``save``/``load`` round-trip raw fp32 tensors + a metadata.json shape
    table — the reference's on-disk contract
    (ref SpanHead/SpanHeadResources.swift:12-67, SpanHeadMetadata.swift)."""

    METADATA = "metadata.json"

    def __init__(self, span_head: SpanRepHead, prompt_proj: FFN,
                 count_predictor: Linear, count_embed: CountEmbed,
                 classifier: Linear):
        self.span_head = span_head
        self.prompt_proj = prompt_proj
        self.count_predictor = count_predictor
        self.count_embed = count_embed
        self.classifier = classifier

    @classmethod
    def seeded(cls, dim: int, lstm_hidden: int, rep_dim: int,
               max_count: int = 20, key: str = "promptheads") -> "PromptHeads":
        return cls(
            SpanRepHead(dim, lstm_hidden, rep_dim, seed_key=key + ":span"),
            FFN.seeded(dim, dim, rep_dim, key + ":pproj"),
            Linear.seeded(dim, max_count, key + ":count"),
            CountEmbed.seeded(dim, max_count, key + ":cembed"),
            Linear.seeded(dim, 1, key + ":cls"),
        )

    def save(self, out_dir: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        meta = {
            "layers": {
                "span_head": self.span_head.save(out_dir, "span_head"),
                "prompt_projection": self.prompt_proj.save(out_dir, "prompt_projection"),
                "count_predictor": self.count_predictor.save(out_dir, "count_predictor"),
                "count_embed": self.count_embed.save(out_dir, "count_embed"),
                "classifier": self.classifier.save(out_dir, "classifier"),
            }
        }
        path = os.path.join(out_dir, self.METADATA)
        with open(path, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        return path

    @classmethod
    def load(cls, base_dir: str) -> "PromptHeads":
        with open(os.path.join(base_dir, cls.METADATA)) as f:
            layers = json.load(f)["layers"]
        return cls(
            SpanRepHead.from_files(base_dir, layers["span_head"]),
            FFN.from_files(base_dir, layers["prompt_projection"]),
            Linear.from_files(base_dir, layers["count_predictor"]),
            CountEmbed.from_files(base_dir, layers["count_embed"]),
            Linear.from_files(base_dir, layers["classifier"]),
        )
