"""Similarity search over an embedding column (list<float>):
brute-force cosine top-k (baseline) and LSH-bucketed ANN (scale path).

Pattern: the query matrix is small -> broadcast via ``ray.put`` once,
loaded per actor in ``__init__``; each batch does one numpy matmul
(vectorized) and emits only its local top-k per query; a final small
``groupby(query_id)`` reduces local top-ks to the global top-k —
a distributed top-k with O(batches * k) shuffle volume, never the full
score matrix.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _emb_matrix(series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _global_topk(k: int):
    """Shared final reducer for every top-k stage: merge the per-batch
    local top-ks into the global top-k per query, ordering by
    (score desc, neighbor_id asc) for determinism; emits dense ranks."""

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(),
            "neighbor_id": g["neighbor_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return global_topk



def knn_cosine(
    emb_ds,
    query_df: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact top-k cosine neighbors for each query row.
    Returns Dataset(query_id, neighbor_id, rank) with rank 1..k,
    ordered by (cosine desc, neighbor_id asc) — integer output so the
    result is oracle-comparable without float hashing issues."""
    import ray

    qmat = _normalize(_emb_matrix(query_df[emb_col]))
    qids = query_df[id_col].to_numpy()
    ref = ray.put((qids, qmat))

    class LocalTopK:
        def __init__(self):
            self.qids, self.qmat = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy()
            scores = self.qmat @ emb.T  # (Q, B)
            rows = []
            for qi, qid in enumerate(self.qids):
                s = scores[qi]
                mask = ids != qid if exclude_self else np.ones(len(ids), bool)
                cand = np.flatnonzero(mask)
                if len(cand) == 0:
                    continue
                # local top-k: order by (-score, id) for determinism
                order = cand[np.lexsort((ids[cand], -s[cand]))][:k]
                for j in order:
                    rows.append((int(qid), int(ids[j]), float(s[j])))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local = emb_ds.map_batches(
        LocalTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    return local.groupby("query_id").map_groups(_global_topk(k), batch_format="pandas")


def ann_lsh_topk(
    emb_ds,
    query_df: pd.DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
):
    """Approximate top-k: random-hyperplane LSH bucketing; only vectors
    whose sign-signature matches a query's bucket are scored. Recall
    traded for ~2^planes less compute; the bucket id is a deterministic
    function of (seed, embedding) so results are reproducible."""
    import ray

    dim = len(query_df[emb_col].iloc[0])
    planes = np.random.default_rng(seed).standard_normal((num_planes, dim))
    qmat = _normalize(_emb_matrix(query_df[emb_col]))
    qids = query_df[id_col].to_numpy()
    qsig = (qmat @ planes.T > 0).astype(np.uint8)
    qbucket = qsig @ (1 << np.arange(num_planes, dtype=np.uint64))
    ref = ray.put((qids, qmat, qbucket, planes))

    class BucketTopK:
        def __init__(self):
            self.qids, self.qmat, self.qbucket, self.planes = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy()
            sig = (emb @ self.planes.T > 0).astype(np.uint8)
            bucket = sig @ (1 << np.arange(self.planes.shape[0], dtype=np.uint64))
            rows = []
            for qi, qid in enumerate(self.qids):
                mask = (bucket == self.qbucket[qi]) & (ids != qid)
                cand = np.flatnonzero(mask)
                if len(cand) == 0:
                    continue
                s = self.qmat[qi] @ emb[cand].T
                order = np.lexsort((ids[cand], -s))[:k]
                for o in order:
                    rows.append((int(qid), int(ids[cand[o]]), float(s[o])))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local = emb_ds.map_batches(
        BucketTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    return local.groupby("query_id").map_groups(_global_topk(k), batch_format="pandas")


def cosine_dup_pairs(
    emb_ds,
    all_df: pd.DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >=
    threshold): the oracle-checkable brute-force baseline — the full
    corpus matrix is broadcast ONCE (``ray.put``), each batch does one
    matmul against it and emits only its above-threshold pairs. At 100
    TB the broadcast side becomes the IVF/LSH-bucketed variant
    (``ann_lsh_topk``'s bucketing) — same stage contract."""
    import ray

    amat = _normalize(_emb_matrix(all_df[emb_col]))
    aids = all_df[id_col].to_numpy()
    ref = ray.put((aids, amat))

    class DupPairs:
        def __init__(self):
            self.aids, self.amat = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy()
            scores = emb @ self.amat.T  # (B, N)
            bi, aj = np.nonzero(scores >= threshold)
            keep = ids[bi] < self.aids[aj]  # dedupe + drop self-pairs
            return pd.DataFrame(
                {
                    "id_a": ids[bi][keep].astype(np.int64),
                    "id_b": self.aids[aj][keep].astype(np.int64),
                }
            )

    return emb_ds.map_batches(
        DupPairs, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )


def ivf_dup_pairs(
    emb_ds,
    threshold: float = 0.99,
    num_lists: int = 16,
    assign_probes: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_sample: pd.DataFrame | None = None,
    seed: int = 42,
):
    """IVF-bucketed embedding near-duplicate pairs — the SCALE path for
    ``cosine_dup_pairs`` (same output contract: id_a < id_b with cosine
    >= threshold): instead of broadcasting the full corpus matrix
    (O(corpus) per actor), vectors are assigned map-side to their
    ``assign_probes`` nearest IVF lists (k-means coarse quantizer
    trained once on a driver-side sample, broadcast via ``ray.put``)
    and pairs are scored ONLY within each list (one groupby shuffle of
    O(rows x probes); per-list matmul).

    Multi-assignment is the recall mechanism: a near-dup pair has
    near-identical centroid similarities, so the two vectors share at
    least one of their top-``assign_probes`` lists with high
    probability (recall >= 0.9 vs brute force asserted in tests).
    Partitioning assumption: one list's members fit one task — at 100
    TB pick num_lists so corpus/num_lists rows fit a worker.
    """
    import ray

    from ray.data.aggregate import Count

    train = train_sample
    if train is None:
        raise ValueError("ivf_dup_pairs needs a driver-side train_sample")
    cents = _kmeans(_normalize(_emb_matrix(train[emb_col])), num_lists, seed=seed)
    ref = ray.put(cents)
    probes = max(1, assign_probes)

    class AssignLists:
        def __init__(self):
            self.cents = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy()
            sims = emb @ self.cents.T
            k = min(probes, sims.shape[1])
            lists = np.argsort(-sims, axis=1, kind="stable")[:, :k]
            rep = np.repeat(np.arange(len(ids)), k)
            return pd.DataFrame({
                "list_id": lists.reshape(-1).astype(np.int64),
                id_col: ids[rep].astype(np.int64),
                emb_col: [emb[i] for i in rep],
            })

    assigned = emb_ds.map_batches(
        AssignLists, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    def pairs_in_list(g: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(g[emb_col].to_numpy())
        ids = g[id_col].to_numpy().astype(np.int64)
        s = emb @ emb.T
        ai, bj = np.nonzero(np.triu(s >= threshold, k=1))
        lo, hi = np.minimum(ids[ai], ids[bj]), np.maximum(ids[ai], ids[bj])
        keep = lo != hi  # same id probed into one list twice is not a pair
        return pd.DataFrame({"id_a": lo[keep], "id_b": hi[keep]})

    pairs = assigned.groupby("list_id").map_groups(pairs_in_list, batch_format="pandas")
    # a pair found in several shared lists reports once
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="__n__"))
        .select_columns(["id_a", "id_b"])
    )


def kmeans_assign(
    emb_ds,
    k: int = 8,
    train_sample: pd.DataFrame | None = None,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Semantic clustering of an embedding corpus (the SemDeDup /
    topic-bucketing primitive: cluster first, then dedup or sample
    WITHIN clusters): seeded Lloyd's k-means on cosine direction,
    trained once on a driver-side sample (the same coarse quantizer
    IVF uses — ``_kmeans``), centroids broadcast once via ``ray.put``,
    assignment MAP-ONLY (one matmul per batch, no shuffle). Returns
    Dataset(``id_col``, cluster int64, sim_e6 int64) — sim_e6 is the
    cosine to the assigned centroid in the engine's e6 integer
    contract. Deterministic in (train_sample, k, iters, seed).

    Scale shape: the centroid matrix is O(k x dim) regardless of corpus
    size; per-cluster downstream work (``groupby("cluster")``) carries
    the usual partitioning assumption — one cluster's members fit one
    task; raise k until they do."""
    import ray

    if train_sample is None:
        raise ValueError("kmeans_assign needs a driver-side train_sample")
    cents = _kmeans(
        _normalize(_emb_matrix(train_sample[emb_col])), k, iters=iters, seed=seed
    )
    ref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.cents = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            sims = emb @ self.cents.T
            c = sims.argmax(axis=1)
            best = sims[np.arange(len(c)), c]
            return pd.DataFrame({
                id_col: batch[id_col].to_numpy().astype(np.int64),
                "cluster": c.astype(np.int64),
                "sim_e6": np.round(best * 1e6).astype(np.int64),
            })

    return emb_ds.map_batches(
        Assign, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )


def _kmeans(sample: np.ndarray, k: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Tiny seeded Lloyd's k-means on a driver-side sample — the coarse
    quantizer for IVF. Deterministic in (sample, k, iters, seed)."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iters):
        d = sample @ cents.T  # rows normalized -> cosine
        assign = d.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_topk(
    emb_ds,
    query_df: pd.DataFrame,
    k: int = 5,
    num_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_sample: pd.DataFrame | None = None,
    seed: int = 42,
):
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    is trained ONCE on a driver-side sample and broadcast; each batch
    assigns its vectors to their nearest list and scores a query only
    against vectors in that query's ``nprobe`` closest lists — the
    classic Faiss-style IVF recall/compute trade
    (cf. Johnson et al., "Billion-scale similarity search with GPUs").
    Batches never materialize the full score matrix; the final global
    top-k reduce shuffles O(batches x k) rows.
    """
    import ray

    train = train_sample if train_sample is not None else query_df
    cents = _kmeans(_normalize(_emb_matrix(train[emb_col])), num_lists, seed=seed)
    qmat = _normalize(_emb_matrix(query_df[emb_col]))
    qids = query_df[id_col].to_numpy()
    # each query probes its nprobe nearest lists
    qlists = np.argsort(-(qmat @ cents.T), axis=1)[:, : max(1, nprobe)]
    ref = ray.put((qids, qmat, qlists, cents))

    class IVFTopK:
        def __init__(self):
            self.qids, self.qmat, self.qlists, self.cents = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy()
            assign = (emb @ self.cents.T).argmax(axis=1)
            rows = []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(assign, self.qlists[qi]) & (ids != qid)
                cand = np.flatnonzero(mask)
                if len(cand) == 0:
                    continue
                s = self.qmat[qi] @ emb[cand].T
                order = np.lexsort((ids[cand], -s))[:k]
                for o in order:
                    rows.append((int(qid), int(ids[cand[o]]), float(s[o])))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local = emb_ds.map_batches(
        IVFTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    return local.groupby("query_id").map_groups(_global_topk(k), batch_format="pandas")


def _pq_train(
    sample: np.ndarray, m: int, kcodes: int, seed: int = 42, iters: int = 8
) -> np.ndarray:
    """Product-quantization codebooks: split the (normalized) vectors
    into ``m`` contiguous subspaces and run a tiny seeded k-means in
    each — returns (m, kcodes, d/m). Deterministic in its inputs
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011)."""
    n, d = sample.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    assert kcodes <= 256, f"kcodes={kcodes} exceeds uint8 code range"
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(kcodes, n), sub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        cents = x[rng.choice(n, size=min(kcodes, n), replace=False)].copy()
        for _ in range(iters):
            # L2 assignment via the matmul expansion (||x||² is
            # constant per row): O(n·kcodes) memory, same argmin as
            # the (n, kcodes, sub) broadcast form
            d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def _pq_codes(emb: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode (n, d) vectors to (n, m) uint8 codes against the
    codebooks — nearest subspace centroid by L2, fully vectorized per
    subspace."""
    m, kc, sub = books.shape
    assert kc <= 256, f"codebook size {kc} exceeds uint8 code range"
    n = emb.shape[0]
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        x = emb[:, j * sub : (j + 1) * sub]
        cents = books[j]
        d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * (x @ cents.T)
        codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(
    emb_ds,
    books: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Map-only PQ encoding: each vector compresses to m bytes
    (d·4 bytes → m bytes, e.g. 256 B → 8 B at d=64, m=8) — the format
    a 100 TB corpus keeps resident for ANN while full vectors stay in
    cold storage. Codebooks are broadcast once via ray.put."""
    import ray

    ref = ray.put(books)

    class Encode:
        def __init__(self):
            self.books = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            codes = _pq_codes(emb, self.books)
            return pd.DataFrame({
                id_col: batch[id_col].to_numpy(),
                "pq_code": [c.tobytes() for c in codes],
            })

    return emb_ds.map_batches(
        Encode, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )


def pq_topk(
    emb_ds,
    query_df: pd.DataFrame,
    k: int = 5,
    m: int = 8,
    kcodes: int = 32,
    rerank: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_sample: pd.DataFrame | None = None,
    seed: int = 42,
):
    """PQ approximate top-k: asymmetric distance computation (ADC)
    shortlists ``rerank*k`` candidates per batch — each query
    precomputes an (m × kcodes) lookup table of subspace dot products
    ONCE, and a candidate's ADC score is m table gathers summed — then
    only the shortlist is re-scored exactly against the full vectors
    already in the batch (the ADC+R re-rank of Jégou et al. 2011 §V;
    exact work drops from O(n·d) to O(rerank·k·d) per query). Same
    output contract as ivf_topk / ann_lsh_topk (query_id, neighbor_id,
    rank); global reduce shuffles O(batches × k) rows."""
    import ray

    train = train_sample if train_sample is not None else query_df
    books = _pq_train(_normalize(_emb_matrix(train[emb_col])), m, kcodes, seed=seed)
    qmat = _normalize(_emb_matrix(query_df[emb_col]))
    qids = query_df[id_col].to_numpy()
    mm, kc, sub = books.shape
    # LUT[q, j, c] = <query subvector j, codebook[j][c]>
    lut = np.einsum("qjs,jcs->qjc", qmat.reshape(len(qmat), mm, sub), books)
    ref = ray.put((qids, qmat, lut, books))
    shortlist = rerank * k

    class PQTopK:
        def __init__(self):
            self.qids, self.qmat, self.lut, self.books = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            emb = _normalize(_emb_matrix(batch[emb_col]))
            ids = batch[id_col].to_numpy()
            codes = _pq_codes(emb, self.books)  # (n, m)
            rows = []
            j_idx = np.arange(codes.shape[1])
            for qi, qid in enumerate(self.qids):
                # ADC: sum over subspaces of LUT gathers
                s_adc = self.lut[qi][j_idx, codes].sum(axis=1)
                cand = np.flatnonzero(ids != qid)
                if len(cand) > shortlist:
                    keep = np.argpartition(-s_adc[cand], shortlist)[:shortlist]
                    cand = cand[keep]
                # exact re-rank of the shortlist only
                s = emb[cand] @ self.qmat[qi]
                order = np.lexsort((ids[cand], -s))[:k]
                for o in order:
                    rows.append((int(qid), int(ids[cand[o]]), float(s[o])))
            return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    local = emb_ds.map_batches(
        PQTopK, batch_format="pandas", batch_size=4096, concurrency=(1, 8)
    )

    return local.groupby("query_id").map_groups(_global_topk(k), batch_format="pandas")
