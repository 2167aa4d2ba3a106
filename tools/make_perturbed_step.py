"""Non-replicated scale step (round-6, VERDICT r5 item 6).

Exact replication is the adversarial dedup case (duplicate clusters grow
quadratically in K) but an unrealistic distribution: every base doc has
K-1 exact twins, so at K=30 nearly every shingle's document frequency is
~30x its base df and the jaccard df-guard routes almost everything
through the high-df correction. This generator produces a UNIQUE-DOC
K-times corpus with a realistic near-dup rate instead:

  * replica 0 of every base doc is the base text verbatim;
  * ~LIGHT_PCT of base docs get LIGHT replicas (one word salted per
    replica) — true near-dups (3-gram jaccard ~0.95+ within the family),
    the "~5% true near-dups" population;
  * all other docs get HEAVY replicas: every 5th word (phase k mod 5)
    replaced by a replica-salted token — pairwise jaccard within a heavy
    family lands ~0.3-0.45, BELOW the 0.5 threshold, so heavy replicas
    are unique documents that still share enough shingles to exercise
    candidate generation.

Deterministic (doc_id + replica index only — no RNG), pure function of
the base corpus. Output: documents.parquet only (the dedup battery's
input); doc_id = base_id + k * stride like make_scale_step.

    python tools/make_perturbed_step.py [SRC] [DST] [K]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

LIGHT_PCT = 20  # 1 in 20 base docs (~5%) keeps true near-dup replicas


def perturb(text: str, base_id: int, k: int, light: bool) -> str:
    if k == 0:
        return text
    words = text.split(" ")
    if light:
        # one salted word -> ~3 of ~200 shingles lost: stays a near-dup
        i = (base_id + 7 * k) % max(1, len(words))
        words[i] = f"{words[i]}x{k}"
        return " ".join(words)
    # every 5th word, phase k%5, salted per replica: ~20% of words ->
    # ~50-60% of 3-gram shingles differ between any two family members
    phase = k % 5
    for i in range(phase, len(words), 5):
        words[i] = f"{words[i]}x{k}"
    return " ".join(words)


def make(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(f"{src}/documents.parquet")
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    n = len(cols["doc_id"])
    stride = 10 ** len(str(max(cols["doc_id"])))
    out = {c: [] for c in t.column_names}
    for rep in range(k):
        for i in range(n):
            did = cols["doc_id"][i]
            light = (did % LIGHT_PCT) == 0
            text = perturb(cols["text"][i], did, rep, light)
            for c in t.column_names:
                if c == "doc_id":
                    out[c].append(did + rep * stride)
                elif c == "text":
                    out[c].append(text)
                elif c == "n_chars":
                    out[c].append(len(text))
                else:
                    out[c].append(cols[c][i])
    pq.write_table(
        pa.table({c: out[c] for c in t.column_names}), f"{dst}/documents.parquet"
    )
    print(f"documents -> {len(out['doc_id'])} rows (k={k}, stride={stride}, "
          f"light=1/{LIGHT_PCT} of base docs)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/perturbed_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    make(src, dst, k)
