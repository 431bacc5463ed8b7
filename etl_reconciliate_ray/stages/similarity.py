"""Similarity search over an embedding column (list<float>):
brute-force cosine top-k (baseline), LSH / IVF / PQ ANN (scale paths),
embedding near-dup pairs and k-means semantic clustering.

Pattern: the query-side state (query matrix, hyperplanes, centroids,
codebooks) is small -> broadcast via ``ray.put`` ONCE and fetched into
a per-worker-process cache (``_fetch``); each batch does one numpy
matmul (vectorized) and emits only its local top-k per query; a final
small ``groupby(query_id)`` reduces local top-ks to the global top-k —
a distributed top-k with O(batches * k) shuffle volume, never the full
score matrix.

Stage wiring: every stage is a plain FUNCTION run as a Ray TASK pool,
not an actor pool — the per-stage state is one ``ray.get`` of a
broadcast ref (zero-copy for numpy from plasma, microseconds after the
first fetch on a node), so actors would buy nothing but spin-up
latency and a fixed concurrency cap. A task pool reuses Ray's
long-lived worker processes (the cache persists across batches and
jobs) and scales to every core on every node. Same reasoning as the
MinHash banding task pool (``stages/dedup.py``), where this conversion
measured a ~20% stage win at 32 CPUs.

Selection kernels are loop-free: batch rows are pre-sorted by id so a
STABLE argsort on negated scores yields exactly (score desc, id asc)
per query in one C call; multi-list candidates reduce through one
lexsort-segmented top-k (``_topk_rows``). No per-query Python append
loops — O(queries x k) output is built by column stacking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _emb_matrix(series) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _emb_matrix_arrow(col) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list<float> column —
    zero-copy flatten + reshape when the lists are rectangular and
    null-free (the embedding-table contract), per-row fallback
    otherwise."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(a.type) and a.null_count == 0:
        flat = a.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64).reshape(len(a), a.type.list_size)
    if (pa.types.is_list(a.type) or pa.types.is_large_list(a.type)) and a.null_count == 0:
        import pyarrow.compute as pc

        widths = pc.list_value_length(a).to_numpy(zero_copy_only=False)
        if len(widths) and (widths == widths[0]).all():
            flat = a.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64).reshape(len(a), int(widths[0]))
    return np.stack([np.asarray(v, dtype=np.float64) for v in a.to_pylist()])


# per-worker-process cache of broadcast state (shared engine-wide)
from ..functions.broadcast import fetch as _fetch  # noqa: E402


_TOPK_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("score", pa.float64())
])


def _empty_topk() -> pa.Table:
    return _TOPK_SCHEMA.empty_table()


def _ids_emb(batch: pa.Table, id_col: str, emb_col: str):
    """Decode + pre-sort a batch by id ascending: with rows in id
    order, a STABLE descending-score sort is exactly the engine's
    (score desc, neighbor_id asc) determinism contract."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    emb = _normalize(_emb_matrix_arrow(batch[emb_col]))
    order = np.argsort(ids, kind="stable")
    return ids[order], emb[order]


def _rowwise_topk(qids: np.ndarray, scores: np.ndarray, ids: np.ndarray, k: int) -> pa.Table:
    """Exact per-row top-k of a dense (Q, B) score matrix whose columns
    are id-ascending; excluded entries carry -inf. One stable argsort,
    no Python loop over queries."""
    if scores.size == 0:
        return _empty_topk()
    kk = min(k, scores.shape[1])
    sel = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
    ssel = np.take_along_axis(scores, sel, axis=1)
    valid = (ssel > -np.inf).ravel()
    return pa.table({
        "query_id": np.repeat(qids.astype(np.int64), kk)[valid],
        "neighbor_id": ids[sel].ravel()[valid].astype(np.int64),
        "score": ssel.ravel()[valid],
    }, schema=_TOPK_SCHEMA)


def _topk_rows(qids: np.ndarray, nids: np.ndarray, scores: np.ndarray, k: int) -> pa.Table:
    """Per-query top-k over a flat candidate list (query_id, neighbor,
    score) — the reduce for multi-list/multi-bucket accumulation. One
    lexsort by (query, -score, id), then a segmented rank cut."""
    if len(qids) == 0:
        return _empty_topk()
    order = np.lexsort((nids, -scores, qids))
    qs, ns, ss = qids[order], nids[order], scores[order]
    starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    seg_len = np.diff(np.r_[starts, len(qs)])
    rank = np.arange(len(qs)) - np.repeat(starts, seg_len)
    keep = rank < k
    return pa.table({
        "query_id": qs[keep].astype(np.int64),
        "neighbor_id": ns[keep].astype(np.int64),
        "score": ss[keep],
    }, schema=_TOPK_SCHEMA)


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

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        st_qids, st_qmat = _fetch(ref)
        ids, emb = _ids_emb(batch, id_col, emb_col)
        scores = st_qmat @ emb.T  # (Q, B)
        if exclude_self:
            scores[st_qids[:, None] == ids[None, :]] = -np.inf
        return _rowwise_topk(st_qids, scores, ids, k)

    local = emb_ds.map_batches(local_topk, batch_format="pyarrow", batch_size=4096)

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
    whose sign-signature matches a query's bucket are scored (the
    matmul runs per distinct query bucket over just its matching batch
    rows — the ~2^planes compute saving is preserved, not papered over
    with a full score matrix). Recall traded for compute; the bucket id
    is a deterministic function of (seed, embedding) so results are
    reproducible."""
    import ray

    dim = len(query_df[emb_col].iloc[0])
    planes = np.random.default_rng(seed).standard_normal((num_planes, dim))
    qmat = _normalize(_emb_matrix(query_df[emb_col]))
    qids = query_df[id_col].to_numpy()
    qsig = (qmat @ planes.T > 0).astype(np.uint8)
    qbucket = qsig @ (1 << np.arange(num_planes, dtype=np.uint64))
    ref = ray.put((qids, qmat, qbucket, planes))

    def bucket_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        st_qids, st_qmat, st_qbucket, st_planes = _fetch(ref)
        ids, emb = _ids_emb(batch, id_col, emb_col)
        sig = (emb @ st_planes.T > 0).astype(np.uint8)
        bucket = sig @ (1 << np.arange(st_planes.shape[0], dtype=np.uint64))
        parts = []
        for b in np.unique(st_qbucket):  # <= min(Q, 2^planes) groups
            qsel = np.flatnonzero(st_qbucket == b)
            cand = np.flatnonzero(bucket == b)
            if len(cand) == 0:
                continue
            sub = st_qmat[qsel] @ emb[cand].T  # (Qb, Nb)
            sub[st_qids[qsel][:, None] == ids[cand][None, :]] = -np.inf
            parts.append(_rowwise_topk(st_qids[qsel], sub, ids[cand], k))
        if not parts:
            return _empty_topk()
        return pa.concat_tables(parts)

    local = emb_ds.map_batches(bucket_topk, batch_format="pyarrow", batch_size=4096)

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

    def dup_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        st_aids, st_amat = _fetch(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix_arrow(batch[emb_col]))
        scores = emb @ st_amat.T  # (B, N)
        bi, aj = np.nonzero(scores >= threshold)
        keep = ids[bi] < st_aids[aj]  # dedupe + drop self-pairs
        return pa.table({
            "id_a": ids[bi][keep].astype(np.int64),
            "id_b": st_aids[aj][keep].astype(np.int64),
        })

    return emb_ds.map_batches(dup_pairs, batch_format="pyarrow", batch_size=4096)


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

    def assign_lists(batch: pa.Table) -> pa.Table:
        st_cents = _fetch(ref)
        if batch.num_rows == 0:
            return pa.table({
                "list_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                emb_col: pa.array(
                    [], pa.list_(pa.float64(), st_cents.shape[1])
                ),
            })
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix_arrow(batch[emb_col]))
        sims = emb @ st_cents.T
        k = min(probes, sims.shape[1])
        lists = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        rep = np.repeat(np.arange(len(ids)), k)
        flat = emb[rep].ravel()
        emb_list = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.float64()), emb.shape[1]
        )
        return pa.table({
            "list_id": pa.array(lists.reshape(-1).astype(np.int64)),
            id_col: pa.array(ids[rep].astype(np.int64)),
            emb_col: emb_list,
        })

    assigned = emb_ds.map_batches(assign_lists, batch_format="pyarrow", batch_size=4096)

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
    keep_embedding: bool = False,
):
    """Semantic clustering of an embedding corpus (the SemDeDup /
    topic-bucketing primitive: cluster first, then dedup or sample
    WITHIN clusters): seeded Lloyd's k-means on cosine direction,
    trained once on a driver-side sample (the same coarse quantizer
    IVF uses — ``_kmeans``), centroids broadcast once via ``ray.put``,
    assignment MAP-ONLY (one matmul per batch, no shuffle). Returns
    Dataset(``id_col``, cluster int64, sim_e6 int64) — sim_e6 is the
    cosine to the assigned centroid in the engine's e6 integer
    contract; ``keep_embedding=True`` additionally carries the
    NORMALIZED vectors (fixed-size list) for cluster-local downstream
    stages (``semantic_dedup``'s prune rides the one cluster shuffle).
    Deterministic in (train_sample, k, iters, seed).

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

    def assign(batch: pa.Table) -> pa.Table:
        st_cents = _fetch(ref)
        if batch.num_rows == 0:
            cols = {
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "sim_e6": pa.array([], pa.int64()),
            }
            if keep_embedding:
                cols[emb_col] = pa.array(
                    [], pa.list_(pa.float64(), st_cents.shape[1])
                )
            return pa.table(cols)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix_arrow(batch[emb_col]))
        sims = emb @ st_cents.T
        c = sims.argmax(axis=1)
        best = sims[np.arange(len(c)), c]
        cols = {
            id_col: pa.array(ids.astype(np.int64)),
            "cluster": pa.array(c.astype(np.int64)),
            "sim_e6": pa.array(np.round(best * 1e6).astype(np.int64)),
        }
        if keep_embedding:  # prune stages need the vectors co-shuffled
            cols[emb_col] = pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float64()), emb.shape[1]
            )
        return pa.table(cols)

    return emb_ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)


def semantic_dedup(
    emb_ds,
    train_sample: pd.DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    chunk: int = 1024,
):
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): semantic
    deduplication as cluster-then-prune — seeded k-means topic clusters
    over the normalized embedding corpus (the ``kmeans_assign``
    quantizer), then WITHIN each cluster every connected group of
    near-duplicates (cosine >= ``threshold``) keeps only its lowest-id
    member. Cross-cluster pairs are never compared: that restriction is
    the algorithm's compute saving (O(sum cluster_size^2) instead of
    O(corpus^2)) and its documented approximation — a near-dup pair
    split across a cluster boundary survives.

    Returns Dataset(``id_col``, cluster int64, rep int64, keep bool):
    ``rep`` is the minimum id of the row's within-cluster duplicate
    group (``rep == id`` exactly for kept rows), so downstream filters
    keep survivors with ``keep`` and audits recover the full group map.

    Scale shape: centroids broadcast once (``ray.put``), assignment
    map-only, ONE shuffle on cluster id, per-cluster pairwise scoring
    inside ``map_groups``. Partitioning assumption: one cluster's
    members fit one task — raise ``k`` until they do (same contract as
    every cluster-local stage here). Deterministic in
    (train_sample, k, iters, seed)."""
    assigned = kmeans_assign(
        emb_ds, k=k, train_sample=train_sample, iters=iters, seed=seed,
        id_col=id_col, emb_col=emb_col, keep_embedding=True,
    )

    def prune_cluster(g: pd.DataFrame) -> pd.DataFrame:
        emb = _normalize(np.stack(g[emb_col].to_numpy()))
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, emb = ids[order], emb[order]
        n = len(ids)
        # chunked edge discovery: O(chunk x n) transient memory instead
        # of the full n x n similarity matrix — a hot cluster's pairwise
        # pass stays bounded; only the above-threshold EDGES persist
        eis, ejs = [], []
        for s in range(0, n, chunk):
            sub = emb[s : s + chunk] @ emb.T  # (c, n)
            bi, bj = np.nonzero(sub >= threshold)
            gi = bi + s
            up = gi < bj  # upper triangle only (i < j, no self)
            eis.append(gi[up])
            ejs.append(bj[up])
        ei = np.concatenate(eis) if eis else np.array([], dtype=np.int64)
        ej = np.concatenate(ejs) if ejs else np.array([], dtype=np.int64)
        lab = np.arange(n)
        while True:  # min-label propagation + pointer jumping
            new = lab.copy()
            np.minimum.at(new, ej, lab[ei])
            np.minimum.at(new, ei, lab[ej])
            new = new[new]
            if (new == lab).all():
                break
            lab = new
        return pd.DataFrame({
            id_col: ids,
            "cluster": g["cluster"].to_numpy()[order],
            "rep": ids[lab],
            "keep": lab == np.arange(n),
        })

    return assigned.groupby("cluster").map_groups(
        prune_cluster, batch_format="pandas"
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
    The matmul runs per probed LIST over just its assigned batch rows
    (queries probing a list are batched together), candidates from a
    query's lists reduce through one segmented top-k; batches never
    materialize the full score matrix and the final global reduce
    shuffles O(batches x k) rows.
    """
    import ray

    train = train_sample if train_sample is not None else query_df
    cents = _kmeans(_normalize(_emb_matrix(train[emb_col])), num_lists, seed=seed)
    qmat = _normalize(_emb_matrix(query_df[emb_col]))
    qids = query_df[id_col].to_numpy()
    # each query probes its nprobe nearest lists
    qlists = np.argsort(-(qmat @ cents.T), axis=1)[:, : max(1, nprobe)]
    ref = ray.put((qids, qmat, qlists, cents))

    def ivf_local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        st_qids, st_qmat, st_qlists, st_cents = _fetch(ref)
        ids, emb = _ids_emb(batch, id_col, emb_col)
        assign = (emb @ st_cents.T).argmax(axis=1)
        parts = []
        for lst in np.unique(st_qlists):  # <= min(Q*nprobe, num_lists) groups
            qsel = np.flatnonzero((st_qlists == lst).any(axis=1))
            cand = np.flatnonzero(assign == lst)
            if len(cand) == 0:
                continue
            sub = st_qmat[qsel] @ emb[cand].T  # (Ql, Nl)
            qi = st_qids[qsel]
            ci = ids[cand]
            sub[qi[:, None] == ci[None, :]] = -np.inf  # self-exclusion
            # per-list top-k FIRST: O(Ql*k) rows survive each list
            # instead of every (query, candidate) pair — the reduce
            # below then touches O(Q*nprobe*k) rows, not Q*B
            parts.append(_rowwise_topk(qi, sub, ci, k))
        if not parts:
            return _empty_topk()
        # each batch vector lives in exactly ONE list (argmax assign),
        # so per-list candidates are duplicate-free and the top-k of
        # per-list top-ks equals the top-k of the full candidate set;
        # one segmented cut reduces a query's multi-list survivors
        t = pa.concat_tables(parts)
        return _topk_rows(
            t["query_id"].to_numpy(),
            t["neighbor_id"].to_numpy(),
            t["score"].to_numpy(),
            k,
        )

    local = emb_ds.map_batches(ivf_local, batch_format="pyarrow", batch_size=4096)

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

    def encode(batch: pa.Table) -> pa.Table:
        st_books = _fetch(ref)
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "pq_code": pa.array([], pa.binary(st_books.shape[0])),
            })
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        emb = _normalize(_emb_matrix_arrow(batch[emb_col]))
        codes = _pq_codes(emb, st_books)  # (n, m) uint8, C-contiguous
        m = codes.shape[1]
        code_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), len(ids), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({id_col: pa.array(ids), "pq_code": code_arr})

    return emb_ds.map_batches(encode, batch_format="pyarrow", batch_size=4096)


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
    ONCE, a candidate's ADC score is m table gathers summed (the full
    (Q, B) ADC matrix builds in m vectorized gathers, no per-query
    loop) — then only the per-query shortlist (one argpartition row
    cut) is re-scored exactly against the full vectors already in the
    batch (the ADC+R re-rank of Jégou et al. 2011 §V; exact work drops
    from O(n·d) to O(rerank·k·d) per query). Same output contract as
    ivf_topk / ann_lsh_topk (query_id, neighbor_id, rank); global
    reduce shuffles O(batches × k) rows."""
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

    def pq_local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        st_qids, st_qmat, st_lut, st_books = _fetch(ref)
        ids, emb = _ids_emb(batch, id_col, emb_col)
        codes = _pq_codes(emb, st_books)  # (n, m)
        n, mj = codes.shape
        # dense ADC matrix (Q, n): m vectorized LUT gathers
        s_adc = np.zeros((len(st_qids), n))
        for j in range(mj):
            s_adc += st_lut[:, j, codes[:, j]]
        s_adc[st_qids[:, None] == ids[None, :]] = -np.inf  # self-exclusion
        if n > shortlist:
            sel = np.argpartition(-s_adc, shortlist, axis=1)[:, :shortlist]
        else:
            sel = np.broadcast_to(np.arange(n), (len(st_qids), n))
        # exact re-rank of each query's shortlist: gather + einsum
        s_exact = np.einsum("qsd,qd->qs", emb[sel], st_qmat)
        s_exact = np.where(
            np.take_along_axis(s_adc, sel, axis=1) > -np.inf, s_exact, -np.inf
        )
        qrep = np.repeat(st_qids, sel.shape[1])
        valid = (s_exact > -np.inf).ravel()
        return _topk_rows(
            qrep[valid], ids[sel].ravel()[valid], s_exact.ravel()[valid], k
        )

    local = emb_ds.map_batches(pq_local, batch_format="pyarrow", batch_size=4096)

    return local.groupby("query_id").map_groups(_global_topk(k), batch_format="pandas")
