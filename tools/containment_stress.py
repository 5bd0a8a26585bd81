"""Boilerplate skew stress for d10 ``containment_pairs`` — the probe
behind BASELINE.md §13.

Two synthetic corpora, both >10k docs so the auto doc-frequency cap is
live (the ≤10k fast path would bypass the split):

* NORMAL: 30k docs, each 3 boilerplate phrases (drawn from 200, so the
  phrase-interior shingles have doc-freq ≈ 450 ≫ cap 128) + 15 rare
  filler words. No hot-heavy docs → the rescue A-side is empty and the
  split's rare path carries everything with a cap²-bounded worst key.
* ADVERSARIAL: NORMAL + 3k tiny quote docs (one shared phrase ± a
  word). Every tiny doc is ≥t-contained in every doc sharing its
  phrase, so the TRUE output is ~|tiny| × df quadratic — no algorithm
  outruns its own result set; the ``min_len`` floor is the defense the
  operator ships for this shape.

For each corpus we run (a) unbounded single-phase (max_doc_freq=None),
(b) the default auto split, and on ADVERSARIAL (c) the split with
min_len=6, printing wall seconds + pair counts and asserting (a)==(b)
pair-for-pair (the split is exactness-preserving) and that (c) equals
(b) minus pairs whose contained doc is shorter than the floor.

Usage: python tools/containment_stress.py [n_normal] [n_tiny]
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from southpaw_spark.operators.dedup import containment_pairs, release
from southpaw_spark.session import get_spark


def build_corpora(n_normal: int, n_tiny: int):
    rng = random.Random(1306)
    phrases = [
        " ".join(f"bp{p}w{k}" for k in range(rng.randrange(3, 6)))
        for p in range(200)
    ]
    docs = []
    for i in range(n_normal):
        words = []
        for _ in range(3):
            words.extend(rng.choice(phrases).split())
        words.extend(f"r{rng.randrange(2_000_000)}" for _ in range(15))
        rng.shuffle(words)
        docs.append((i, " ".join(words)))
    tiny = []
    for i in range(n_tiny):
        ph = rng.choice(phrases).split()
        if rng.random() < 0.5:
            ph = ph + [f"r{rng.randrange(2_000_000)}"]
        tiny.append((10_000_000 + i, " ".join(ph)))
    return docs, tiny


def run(df, label: str, **kw):
    t0 = time.time()
    out = containment_pairs(df, "text", "doc_id", threshold=0.8, **kw)
    pairs = set(
        (r["id_a"], r["id_b"]) for r in out.select("id_a", "id_b").collect()
    )
    wall = time.time() - t0
    release(out)
    print(f"{label:42s} {wall:7.1f} s   {len(pairs):>10,} pairs", flush=True)
    return pairs, wall


def main():
    n_normal = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    n_tiny = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000
    spark = get_spark("containment-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs, tiny = build_corpora(n_normal, n_tiny)
    normal = spark.createDataFrame(docs, "doc_id long, text string").cache()
    normal.count()
    print(f"NORMAL corpus: {n_normal:,} docs", flush=True)
    p_none, _ = run(normal, "normal / unbounded (cap=None)", max_doc_freq=None)
    p_auto, _ = run(normal, "normal / default split (cap=auto)")
    assert p_auto == p_none, "split changed the pair set on NORMAL"

    adv = normal.unionByName(
        spark.createDataFrame(tiny, "doc_id long, text string")
    ).cache()
    adv.count()
    print(f"ADVERSARIAL corpus: +{n_tiny:,} tiny quote docs", flush=True)
    a_none, _ = run(adv, "adversarial / unbounded (cap=None)", max_doc_freq=None)
    a_auto, _ = run(adv, "adversarial / default split (cap=auto)")
    assert a_auto == a_none, "split changed the pair set on ADVERSARIAL"
    a_floor, _ = run(adv, "adversarial / split + min_len=6", min_len=6)
    # the floor removes exactly the pairs whose contained doc is short
    short = {
        r["doc_id"]
        for r in adv.select(
            "doc_id", F.size(F.split("text", " ")).alias("w")
        ).where(F.col("w") - 2 < 6).collect()
    }
    assert a_floor == {p for p in a_auto if p[0] not in short}
    print("parity checks passed", flush=True)


if __name__ == "__main__":
    main()
