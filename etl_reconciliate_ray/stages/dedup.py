"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification — the training-data-pipeline dedup family.

Scale shapes (ray_guide.md "Aggregation at scale" / "Exact dedup"):

- **exact**: vectorized sha256 in ``map_batches`` -> per-batch partial
  min(doc_id) per hash -> one small ``groupby(hash).min`` shuffle.
- **MinHash LSH**: signature per doc (actor pool holds the permutation
  tables) -> explode to (band, band_hash, doc_id) rows -> groupby the
  band bucket -> candidate pairs -> exact Jaccard verify -> connected
  components by iterated min-label propagation (a groupby per round,
  no driver union-find at scale; rounds ~ diameter of dup clusters,
  almost always <= 3).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions import text as T
from ..functions.hashing import sha256_hex_array


def exact_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """One representative (min id) per distinct content hash.
    Returns Dataset(doc_id, content_sha256)."""
    from ray.data.aggregate import Min

    def hash_and_partial_min(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {id_col: batch[id_col], "content_sha256": sha256_hex_array(batch[text_col])}
        )
        red = t.group_by(["content_sha256"], use_threads=False).aggregate([(id_col, "min")])
        return pa.table(
            {id_col: red[f"{id_col}_min"], "content_sha256": red["content_sha256"]}
        )

    return (
        docs_ds.map_batches(hash_and_partial_min, batch_format="pyarrow")
        .groupby("content_sha256")
        .aggregate(Min(on=id_col, alias_name=id_col))
    )


class MinHashBands:
    """Actor stage: shingle -> MinHash signature -> LSH band rows."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16, shingle_k: int = 5, seed: int = 42):
        self.mh = T.MinHasher(num_perm=num_perm, seed=seed)
        self.num_bands = num_bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, bhashes = [], [], []
        for did, txt in zip(batch["doc_id"], batch["text"]):
            sig = self.mh.signature(T.char_shingles(txt, self.shingle_k))
            for b, h in enumerate(self.mh.bands(sig, self.num_bands)):
                ids.append(did)
                bands.append(b)
                bhashes.append(h)
        return pd.DataFrame({"doc_id": ids, "band": bands, "band_hash": bhashes})


def lsh_candidate_pairs(docs_ds, **mh_kwargs):
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    Returns Dataset(doc_a, doc_b) with doc_a < doc_b, deduplicated."""
    bands = docs_ds.map_batches(
        MinHashBands, fn_constructor_kwargs=mh_kwargs, batch_format="pandas",
        batch_size=2048, concurrency=(1, 8),
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # dedupe pairs produced by multiple colliding bands
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="__n__"))
        .select_columns(["doc_a", "doc_b"])
    )


def verify_jaccard_pairs(pairs_df: pd.DataFrame, docs_df: pd.DataFrame,
                         threshold: float = 0.8, shingle_k: int = 5) -> pd.DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs (driver- or
    group-side; candidate sets are tiny relative to the corpus)."""
    texts = dict(zip(docs_df["doc_id"], docs_df["text"]))
    rows = []
    cache: dict[int, set] = {}

    def sh(d):
        if d not in cache:
            cache[d] = set(T.char_shingles(texts[d], shingle_k).tolist())
        return cache[d]

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        j = T.jaccard(sh(a), sh(b))
        if j >= threshold:
            rows.append({"doc_a": int(a), "doc_b": int(b), "jaccard": round(float(j), 6)})
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def minhash_clusters(docs_ds, threshold: float = 0.8, **mh_kwargs):
    """Near-dup clusters: doc_id -> cluster_id (min doc_id of its
    component), via LSH candidates + Jaccard verify + min-label
    propagation over the verified edge list."""
    import ray

    pairs = lsh_candidate_pairs(docs_ds, **mh_kwargs).to_pandas()
    docs_df = docs_ds.select_columns(["doc_id", "text"]).to_pandas()
    verified = verify_jaccard_pairs(pairs, docs_df, threshold=threshold,
                                    shingle_k=mh_kwargs.get("shingle_k", 5))
    # min-label propagation (edge list is small after verification; at
    # 100 TB this loop runs as repeated groupby-min over a pair Dataset)
    label = {int(d): int(d) for d in docs_df["doc_id"]}
    edges = [(int(a), int(b)) for a, b in zip(verified["doc_a"], verified["doc_b"])]
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    out = pd.DataFrame(
        {"doc_id": sorted(label), "cluster_id": [label[d] for d in sorted(label)]}
    )
    return out


class SimHashStage:
    """doc_id, simhash (64-bit as int64-bitcast) per document."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vals = np.array([T.simhash64(t) for t in batch["text"]], dtype=np.uint64)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "simhash": vals.view(np.int64)}
        )
