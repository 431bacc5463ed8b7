"""Driver-conformance tests: every SQL-expressible query in
pipelines.queries must match its DuckDB oracle on sf0.001
(row count + schema + order-insensitive values), mirroring the
driver's CORRECTNESS check. Rows-only queries get sanity checks.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from etl_reconciliate_ray.pipelines.queries import ORACLE_SQL, QUERIES
from etl_reconciliate_ray.sources.catalog import TABLES, table_path

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, ddb):
    got = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    want = _canon(ddb.execute(ORACLE_SQL[name]).df())
    if len(got) == 0 and len(want) == 0:
        return  # empty results: Ray's to_pandas drops the schema
    assert list(got.columns) == list(want.columns), (name, got.columns, want.columns)
    assert len(got) == len(want), (name, len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9, rtol=0)


ROWS_ONLY = sorted(set(QUERIES) - set(ORACLE_SQL))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    df = _to_pandas(QUERIES[name](SF_DIR))
    assert len(df) >= 0
    # a legitimately-empty result loses its schema through Ray's
    # to_pandas; only non-empty results must carry columns
    if len(df):
        assert len(df.columns) >= 1


def test_cosine_dup_pairs_finds_planted_dups(ray_session):
    import ray.data as rd

    from etl_reconciliate_ray.stages.similarity import cosine_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 8))
    emb = np.vstack([base, base[3] * 2.0, base[11] * 0.5])  # same direction => cos 1
    df = pd.DataFrame({"vec_id": np.arange(len(emb)), "embedding": list(emb)})
    ds = rd.from_pandas(df)
    got = cosine_dup_pairs(ds, df, threshold=0.999).to_pandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    assert (3, 20) in pairs and (11, 21) in pairs
    assert len(pairs) == 2


def test_minhash_finds_exact_dups_as_clusters():
    """Exact duplicate texts must land in one near-dup cluster."""
    import pyarrow.parquet as pq

    docs = pq.read_table(table_path(SF_DIR, "documents"), columns=["doc_id", "text"]).to_pandas()
    dup_groups = docs.groupby("text")["doc_id"].apply(list)
    dup_groups = [g for g in dup_groups if len(g) > 1]
    clusters = _to_pandas(QUERIES["minhash_clusters"](SF_DIR))
    lab = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    for g in dup_groups:
        assert len({lab[d] for d in g}) == 1, f"exact dups split: {g}"


def test_ann_lsh_recall_vs_exact_knn(ray_session):
    """LSH ANN with zero hyperplanes puts everything in one bucket and
    must EQUAL exact knn (the falsifiable anchor); with 4 planes the
    recall floor still holds on sf0.001."""
    from etl_reconciliate_ray.pipelines.queries import _query_vectors
    from etl_reconciliate_ray.sources.catalog import read_table
    from etl_reconciliate_ray.stages.similarity import ann_lsh_topk, knn_cosine

    q = _query_vectors(SF_DIR)

    def pairs(df):
        return set(map(tuple, df[["query_id", "neighbor_id"]].to_numpy()))

    emb = lambda: read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"])  # noqa: E731
    exact = pairs(knn_cosine(emb(), q, k=5).to_pandas())
    zero_planes = pairs(ann_lsh_topk(emb(), q, k=5, num_planes=0).to_pandas())
    assert zero_planes == exact  # one bucket == brute force
    # random 128-dim embeddings are near-orthogonal (max pairwise cos
    # ~0.5), so each hyperplane halves recall (~p=0.5/plane) — assert
    # the measured floor at 1 and 2 planes (0.48 / 0.20 on this seed)
    r1 = pairs(ann_lsh_topk(emb(), q, k=5, num_planes=1).to_pandas())
    r2 = pairs(ann_lsh_topk(emb(), q, k=5, num_planes=2).to_pandas())
    recall1 = len(r1 & exact) / len(exact)
    recall2 = len(r2 & exact) / len(exact)
    assert recall1 >= 0.3, recall1
    assert recall2 >= 0.1, recall2
    assert recall1 >= recall2  # more buckets, less recall: the LSH trade


def test_simhash_hamming_property():
    """Near-duplicate texts must land within a small simhash hamming
    distance; unrelated texts far apart — the property that makes
    simhash a dedup signal at all."""
    from etl_reconciliate_ray.functions.text import simhash64

    rng = np.random.default_rng(5)
    words = [f"w{i}token" for i in range(400)]
    a = " ".join(words)
    near = " ".join(words[:396] + [f"x{i}" for i in range(4)])  # 1% changed
    unrelated = " ".join(f"u{rng.integers(10**9)}" for _ in range(400))

    def hamming(x, y):
        return bin(x ^ y).count("1")

    assert hamming(simhash64(a), simhash64(a)) == 0
    d_near = hamming(simhash64(a), simhash64(near))
    d_far = hamming(simhash64(a), simhash64(unrelated))
    assert d_near <= 12, d_near
    assert d_far >= 18, d_far
    assert d_near < d_far


def test_rolling_fingerprint_containment():
    """A document EMBEDDED inside a larger one shares (almost) all its
    fingerprints with the container — the shift-tolerant containment
    property the winnowing scheme exists for; an unrelated doc shares
    none."""
    from etl_reconciliate_ray.functions.text import rolling_fingerprint

    inner = " ".join(f"tok{i}abc" for i in range(120))  # ~1000 bytes >> window
    container = "prefix text here. " + inner + " and a suffix tail."
    unrelated = " ".join(f"other{i}xyz" for i in range(120))

    fp_inner = set(rolling_fingerprint(inner))
    fp_container = set(rolling_fingerprint(container))
    fp_unrelated = set(rolling_fingerprint(unrelated))
    # every 64-byte window fully inside `inner` also occurs in container
    assert fp_inner <= fp_container, fp_inner - fp_container
    assert not (fp_inner & fp_unrelated)


def test_ivf_dup_pairs_recall_vs_brute_force(ray_session):
    """The IVF-bucketed near-dup path must recover >= 0.9 of the
    brute-force pairs on the planted-dup table (and find the planted
    clones themselves)."""
    from etl_reconciliate_ray.pipelines.queries import QUERIES, q_embdup_pairs_ivf

    brute = _to_pandas(QUERIES["embdup_pairs"](SF_DIR))
    ivf = _to_pandas(q_embdup_pairs_ivf(SF_DIR))
    bset = set(map(tuple, brute[["id_a", "id_b"]].to_numpy()))
    iset = set(map(tuple, ivf[["id_a", "id_b"]].to_numpy()))
    assert bset, "planted dups must produce brute-force pairs"
    assert len(iset & bset) / len(bset) >= 0.9, (len(iset & bset), len(bset))
    assert iset <= bset  # IVF scores exactly — no false positives


def test_minhash_chain_transitive_cluster(ray_session):
    """A~B~C near-dup chain where A !~ C must still form ONE cluster
    (min-label propagation crosses the 2-hop chain); an unrelated doc
    stays its own cluster. Thresholds are derived from the actual
    pairwise Jaccards so the chain precondition is self-validating."""
    import ray.data as rd

    from etl_reconciliate_ray.functions import text as T
    from etl_reconciliate_ray.stages.dedup import minhash_clusters

    words = [f"tok{i}x" for i in range(300)]
    a = " ".join(words)
    b = " ".join(words[:270] + [f"chg{i}" for i in range(30)])
    c = " ".join(words[:240] + [f"oth{i}" for i in range(30)] + [f"chg{i}" for i in range(30)])
    d = " ".join(f"unrelated{i}" for i in range(300))

    def sh(t):
        return set(T.char_shingles(t, 5).tolist())

    j_ab, j_bc, j_ac = (T.jaccard(sh(a), sh(b)), T.jaccard(sh(b), sh(c)),
                        T.jaccard(sh(a), sh(c)))
    assert j_ac < min(j_ab, j_bc)
    thr = (j_ac + min(j_ab, j_bc)) / 2  # between the chain edges and the A-C gap

    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [a, b, c, d]}))
    out = _to_pandas(minhash_clusters(docs, threshold=thr, num_perm=64, num_bands=16))
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lab[1] == lab[2] == lab[3] == 1, lab
    assert lab[4] == 4, lab


def test_cc_driver_and_distributed_paths_identical(ray_session):
    """The budgeted driver union-find fast path and the iterative
    min-label distributed path must produce identical labels on a
    planted graph with a 3-hop chain, a triangle, an isolated pair and
    untouched singletons (driver_edge_budget=0 forces the iterative
    path)."""
    import ray.data as rd

    from etl_reconciliate_ray.stages.dedup import connected_components_min_label

    edges = pd.DataFrame({
        "doc_a": [10, 11, 12, 20, 21, 20, 30],
        "doc_b": [11, 12, 13, 21, 22, 22, 31],
    })
    nodes = pd.DataFrame({"node": list(range(10, 14)) + list(range(20, 23))
                          + [30, 31, 40, 41]})

    def run(budget):
        out = _to_pandas(connected_components_min_label(
            rd.from_pandas(nodes), rd.from_pandas(edges),
            driver_edge_budget=budget,
        )).sort_values("node").reset_index(drop=True)
        return out

    fast, dist = run(1_000_000), run(0)
    assert fast.equals(dist), (fast, dist)
    lab = dict(zip(fast["node"], fast["label"]))
    assert lab[10] == lab[11] == lab[12] == lab[13] == 10
    assert lab[20] == lab[21] == lab[22] == 20
    assert lab[30] == lab[31] == 30
    assert lab[40] == 40 and lab[41] == 41


def test_distributed_verify_matches_kernel(ray_session):
    """verify_pairs_distributed (two hash joins + per-batch verify)
    must produce exactly the in-memory kernel's verified pairs."""
    import pyarrow.parquet as pq

    from etl_reconciliate_ray.sources.catalog import read_table
    from etl_reconciliate_ray.stages.dedup import (
        lsh_candidate_pairs,
        verify_jaccard_pairs,
        verify_pairs_distributed,
    )

    docs_ds = read_table(SF_DIR, "documents", columns=["doc_id", "text"])
    pairs = lsh_candidate_pairs(docs_ds).materialize()
    got = verify_pairs_distributed(pairs, docs_ds, threshold=0.8).to_pandas()
    docs_df = pq.read_table(table_path(SF_DIR, "documents"), columns=["doc_id", "text"]).to_pandas()
    want = verify_jaccard_pairs(pairs.to_pandas(), docs_df, threshold=0.8)
    key = ["doc_a", "doc_b"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ivf_recall_vs_exact_knn(ray_session):
    """IVF with nprobe=num_lists must equal exact knn (probes every
    list); with fewer probes recall stays high on sf0.001."""
    from etl_reconciliate_ray.pipelines.queries import _query_vectors
    from etl_reconciliate_ray.sources.catalog import read_table
    from etl_reconciliate_ray.stages.similarity import ivf_topk, knn_cosine

    q = _query_vectors(SF_DIR)
    import pyarrow.parquet as pq

    train = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()

    def pairs(df):
        return set(map(tuple, df[["query_id", "neighbor_id"]].to_numpy()))

    exact = pairs(
        knn_cosine(read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"]), q, k=5).to_pandas()
    )
    full_probe = pairs(
        ivf_topk(
            read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"]),
            q, k=5, num_lists=8, nprobe=8, train_sample=train,
        ).to_pandas()
    )
    assert full_probe == exact  # probing every list == exact search
    part_probe = pairs(
        ivf_topk(
            read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"]),
            q, k=5, num_lists=8, nprobe=4, train_sample=train,
        ).to_pandas()
    )
    recall = len(part_probe & exact) / len(exact)
    assert recall >= 0.6, recall


def test_kmeans_assign_recovers_planted_clusters(ray_session):
    """Three well-separated direction clusters must come back as three
    pure assignment groups, and the same seed must reproduce the exact
    result (kmeans_assign is the SemDeDup cluster-then-dedup
    primitive)."""
    import ray.data as rd

    from etl_reconciliate_ray.stages.similarity import kmeans_assign

    rng = np.random.default_rng(5)
    dim, per = 16, 40
    basis = np.eye(dim)[:3] * 10.0  # three orthogonal directions
    emb = np.vstack([
        basis[c] + rng.standard_normal(dim) * 0.05
        for c in range(3)
        for _ in range(per)
    ])
    planted = np.repeat(np.arange(3), per)
    df = pd.DataFrame({
        "vec_id": np.arange(len(emb), dtype=np.int64),
        "embedding": list(emb),
    })
    train = df.copy()

    def run():
        return (
            kmeans_assign(rd.from_pandas(df), k=3, train_sample=train, seed=9)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )

    got = run()
    assert len(got) == len(emb)
    # each planted cluster maps to exactly one k-means label, and the
    # three labels are distinct (purity == 1 on separated clusters)
    lab_of = {}
    for c in range(3):
        labs = set(got.loc[planted == c, "cluster"])
        assert len(labs) == 1, (c, labs)
        lab_of[c] = labs.pop()
    assert len(set(lab_of.values())) == 3
    # cosine to own centroid is high on tight clusters
    assert (got["sim_e6"] >= 990_000).all()
    # seed determinism: bit-identical rerun
    pd.testing.assert_frame_equal(got, run())


def test_semantic_dedup_prunes_planted_families(ray_session):
    """The full SemDeDup composition: three separated clusters, each
    holding two planted near-dup families plus a singleton — every
    family must collapse to its LOWEST id (keep/rep contract), the
    singleton and cross-family pairs must survive untouched, and the
    run must be seed-deterministic."""
    import ray.data as rd

    from etl_reconciliate_ray.stages.similarity import semantic_dedup

    rng = np.random.default_rng(17)
    dim = 16
    vecs, fam = [], []  # fam: (cluster, family-id or None)
    for c in range(3):
        axis, mix_a, sing = (
            np.eye(dim)[c], np.eye(dim)[c + 3], np.eye(dim)[c + 6]
        )
        for _ in range(3):  # family A: 3 members, cos ~ 1
            vecs.append(axis + 0.5 * mix_a + rng.standard_normal(dim) * 1e-3)
            fam.append((c, "A"))
        for _ in range(2):  # family B: cos(A, B) = 0.6 < threshold
            vecs.append(axis - 0.5 * mix_a + rng.standard_normal(dim) * 1e-3)
            fam.append((c, "B"))
        vecs.append(axis + 0.5 * sing)  # singleton: cos 0.8 to A/B
        fam.append((c, None))
    emb = np.stack(vecs)
    ids = rng.permutation(len(emb) * 3)[: len(emb)].astype(np.int64)  # scrambled
    df = pd.DataFrame({"vec_id": ids, "embedding": list(emb)})

    def run():
        return (
            semantic_dedup(
                rd.from_pandas(df), df.copy(), k=3, threshold=0.95, seed=9
            )
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )

    got = run()
    assert len(got) == len(emb)
    assert (got["keep"] == (got["rep"] == got["vec_id"])).all()
    by_id = got.set_index("vec_id")
    for key in {f for f in fam}:
        members = ids[[i for i, f in enumerate(fam) if f == key]]
        reps = {by_id.loc[m, "rep"] for m in members}
        if key[1] is None:  # singleton is its own group
            assert reps == {members[0]}
        else:  # family collapses to exactly its min id
            assert reps == {members.min()}, (key, reps)
    # families are the ONLY merges: kept rows = 3 x (A + B + singleton)
    assert int(got["keep"].sum()) == 9
    pd.testing.assert_frame_equal(got, run())


def test_money_dual_equality_semantics():
    """BigDecimal semantics on decimal128: compareTo says 1.50 == 1.5000
    (scale-insensitive), equals says they differ when the declared
    scales differ (reference ReconciliationService.java:151 vs :199)."""
    import pyarrow as pa

    from etl_reconciliate_ray.stages.money import classify_money_batch, dual_equality

    from decimal import Decimal

    ledger = pa.array([Decimal("1.50")] * 3, pa.decimal128(18, 2))
    wire = pa.array(
        [Decimal("1.5000"), Decimal("1.5000"), Decimal("1.5001")], pa.decimal128(19, 4)
    )
    scales = pa.array([2, 4, 2], pa.int32())
    cmp_eq, strict_eq = dual_equality(ledger, wire, scales)
    assert cmp_eq.to_pylist() == [True, True, False]
    assert strict_eq.to_pylist() == [True, False, False]

    # classify over a batch: statuses + exact decimal renderings
    t = pa.table({
        "o_orderkey": pa.array([1, 2, 7, 14], pa.int64()),
        "o_totalprice": pa.array([10.5, 10.5, 10.5, 10.5], pa.float64()),
    })
    out = classify_money_batch(t)
    assert out["status"].to_pylist() == [
        "MATCHED_STRICT",  # odd, not %7: value+scale match
        "MATCHED_CMP",     # even: 10.50 == 10.5000 but scale 4
        "VALUE_DIFF",      # %7: +0.0001 sub-cent discrepancy
        "VALUE_DIFF",      # even AND %7
    ]
    assert out["amt_ledger"].to_pylist() == ["10.50"] * 4
    assert out["amt_wire"].to_pylist() == ["10.5000", "10.5000", "10.5001", "10.5001"]
    assert out["wire_e4"].to_pylist() == [105000, 105000, 105001, 105001]


def test_nest_table_builds_ordered_lists():
    """nest_table: one row per parent, children ordered by order_col,
    list<struct> layout, vectorized offsets."""
    import pyarrow as pa

    from etl_reconciliate_ray.stages.nest import nest_table

    child = pa.table({
        "pk": pa.array([2, 1, 2, 2, 1], pa.int64()),
        "ln": pa.array([3, 1, 1, 2, 2], pa.int32()),
        "v": pa.array([30, 10, 11, 21, 20], pa.int64()),
    })
    out = nest_table(child, "pk", order_col="ln", list_col="kids")
    assert out["pk"].to_pylist() == [1, 2]
    kids = out["kids"].to_pylist()
    assert [k["ln"] for k in kids[0]] == [1, 2]
    assert [k["v"] for k in kids[1]] == [11, 21, 30]
    assert pa.types.is_list(out.schema.field("kids").type)
    assert pa.types.is_struct(out.schema.field("kids").type.value_type)


def test_topk_combiner_equals_global_sort(ray_session):
    """The two-level (batch combiner -> per-group final) top-k must
    equal a global sort regardless of how rows split across batches."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.topk import topk_per_group

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "g": rng.integers(0, 7, n),
        "score": rng.integers(0, 100, n),  # heavy ties -> tiebreak matters
        "id": np.arange(n, dtype=np.int64),
    })
    got = (
        topk_per_group(
            rd.from_pandas(df, override_num_blocks=13), "g", "score", 3, "id"
        )
        .to_pandas()
        .sort_values(["g", "rank"]) 
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "score", "id"], ascending=[True, False, True])
        .groupby("g")
        .head(3)
        .assign(rank=lambda d: d.groupby("g").cumcount() + 1)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["g", "score", "id", "rank"]].astype("int64"),
        want[["g", "score", "id", "rank"]].astype("int64"),
    )


def test_packing_invariants(ray_session):
    """Every doc packed exactly once; no bin over budget unless a
    single over-budget doc rides alone; totals add up."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.packing import pack_batch, pack_documents

    rng = np.random.default_rng(11)
    n = 4000
    toks = rng.integers(1, 900, n)
    toks[::97] = 3000  # some docs alone exceed the 2048 budget
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "n_tokens": pa.array(toks, pa.int64())})
    out = pack_batch(t, "doc_id", "n_tokens", 2048)
    packed = [d for row in out["doc_ids"].to_pylist() for d in row]
    assert sorted(packed) == list(range(n))  # exactly once
    for docs, total in zip(out["doc_ids"].to_pylist(), out["total_tokens"].to_pylist()):
        assert total <= 2048 or len(docs) == 1
    assert sum(out["total_tokens"].to_pylist()) == int(toks.sum())

    # dataset-level: still exactly-once across multiple blocks
    df = t.to_pandas()
    ds = rd.from_pandas(df, override_num_blocks=7)
    allout = pack_documents(ds, "doc_id", "n_tokens", 2048).to_pandas()
    flat = [d for row in allout["doc_ids"] for d in row]
    assert sorted(flat) == list(range(n))


def test_split_assign_partitions_exactly():
    import pyarrow as pa

    from etl_reconciliate_ray.stages.packing import split_assign

    ids = pa.array(list(range(1000)), pa.int64())
    lab = split_assign(ids, {"train": 90, "val": 5, "test": 5}).to_pylist()
    from collections import Counter

    assert Counter(lab) == {"train": 900, "val": 50, "test": 50}
    # stable under permutation: label depends only on the id
    assert lab[123] == split_assign(pa.array([123], pa.int64()),
                                    {"train": 90, "val": 5, "test": 5})[0].as_py()


def test_media_resize_and_frame_sampler_plumbing():
    """Resize emits fixed target dims per row; frame sampler fans out
    exactly ceil(duration/interval) deterministic frames per media."""
    import pyarrow as pa

    from etl_reconciliate_ray.stages.multimodal import FrameSampler, MediaResize

    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["image", "video"]),
        "payload": pa.array([b"aaa", b"bbbb"], pa.large_binary()),
        "meta_duration_ms": pa.array([0, 2500], pa.int32()),
    })
    r = MediaResize(width=64, height=32)(t)
    assert r["meta_width"].to_pylist() == [64, 64]
    assert r["meta_height"].to_pylist() == [32, 32]
    assert all(len(p) > 0 for p in r["payload"].to_pylist())
    # deterministic: same payload + dims -> same bytes
    assert r["payload"].to_pylist() == MediaResize(width=64, height=32)(t)["payload"].to_pylist()

    f = FrameSampler(interval_ms=1000)(t)
    per = {}
    for mid in f["media_id"].to_pylist():
        per[mid] = per.get(mid, 0) + 1
    assert per == {1: 1, 2: 3}  # zero-duration -> 1 frame; 2500ms -> ceil = 3
    assert f["frame_ts_ms"].to_pylist()[-3:] == [0, 1000, 2000]


def test_media_codec_real_decode_path():
    """REAL codec path — ALWAYS runs now: codec="auto" resolves PIL
    where installed and the in-repo pure-Python PNG codec elsewhere;
    MediaFeatures/MediaResize must decode an actual PNG, emit the same
    16-float feature shape as the fake, and resize to the target
    dims. A solid-color source makes the decoded luma value exact and
    backend-independent."""
    import io

    import pyarrow as pa

    from etl_reconciliate_ray.stages.multimodal import (
        MediaFeatures,
        MediaResize,
        _resolve_codec,
    )

    Image = _resolve_codec("auto")
    assert Image is not None  # auto is never the fake
    buf = io.BytesIO()
    Image.new("RGB", (8, 6), (120, 30, 200)).save(buf, format="PNG")
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["image"]),
        "payload": pa.array([buf.getvalue()], pa.large_binary()),
    })
    out = MediaFeatures(codec="auto")(t)
    feat = out["feature"].to_pylist()[0]
    assert len(feat) == 16
    # luma of (120, 30, 200) under ITU-R 601 integer weighting = 76
    assert all(abs(v - 76.0 / 255.0) < 2.0 / 255.0 for v in feat)
    r = MediaResize(width=4, height=3, codec="auto")(t)
    rt = Image.open(io.BytesIO(r["payload"].to_pylist()[0]))
    assert rt.size == (4, 3)


def test_media_codec_fake_and_pil_knobs():
    """codec="auto" decodes for real in every container (PIL or
    minipng); a corrupt payload still degrades per row to the
    deterministic fake, so actor init and batch survive. codec="pil"
    refuses loudly where PIL is absent; codec="fake" never decodes."""
    import importlib.util

    import pyarrow as pa
    import pytest

    from etl_reconciliate_ray.stages.multimodal import MediaFeatures

    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["image"]),
        "payload": pa.array([b"xyz"], pa.large_binary()),
    })
    out = MediaFeatures(codec="auto")(t)
    assert len(out["feature"].to_pylist()[0]) == 16
    out_fake = MediaFeatures(codec="fake")(t)
    assert len(out_fake["feature"].to_pylist()[0]) == 16
    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(ImportError):
            MediaFeatures(codec="pil")


def test_connector_registry_csv_json_custom(ray_session, tmp_path):
    """S5 connector surface: csv/json built-ins honor the uniform
    (columns, filter) contract; a custom-registered backing store is
    indistinguishable from a built-in."""
    import pyarrow.dataset as pads

    from etl_reconciliate_ray.sources.catalog import read_source, register_connector

    df = pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"], "x": [9, 8, 7, 6]})
    csv_p = str(tmp_path / "t.csv")
    json_p = str(tmp_path / "t.json")
    df.to_csv(csv_p, index=False)
    df.to_json(json_p, orient="records", lines=True)

    got = read_source(csv_p, "csv", columns=["k", "v"],
                      filter=(pads.field("k") > 2)).to_pandas()
    assert list(got.columns) == ["k", "v"] and got["k"].tolist() == [3, 4]

    got = read_source(json_p, "json", columns=["k"]).to_pandas()
    assert sorted(got["k"].tolist()) == [1, 2, 3, 4]  # block order is not guaranteed

    def mem_reader(path, columns=None, filter=None):
        import ray.data as rd

        ds = rd.from_pandas(df)
        return ds.select_columns(columns) if columns else ds

    register_connector("mem", mem_reader)
    assert read_source("ignored", "mem", columns=["x"]).to_pandas()["x"].tolist() == [9, 8, 7, 6]

    with pytest.raises(ValueError, match="no connector"):
        read_source("p", "protobuf")


def test_orc_and_feather_connectors(ray_session, tmp_path):
    """The ORC and Feather/Arrow-IPC connectors must stream the same
    rows as the parquet baseline under the uniform (columns, filter)
    contract — ORC across MULTIPLE stripes (the file-internal
    parallelism unit), IPC in both file and stream framing."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.ipc as ipc
    from pyarrow import orc

    from etl_reconciliate_ray.sources.catalog import read_source

    n = 5000
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "v": pa.array([f"s{i%7}" for i in range(n)]),
        "x": pa.array([i * 1.5 for i in range(n)]),
    })
    orc_p = str(tmp_path / "t.orc")
    orc.write_table(t, orc_p, stripe_size=4096)  # force many stripes
    assert orc.ORCFile(orc_p).nstripes > 1

    got = (
        read_source(orc_p, "orc", columns=["k", "v"], filter=(pads.field("k") >= n - 3))
        .to_pandas().sort_values("k")
    )
    assert list(got.columns) == ["k", "v"]
    assert got["k"].tolist() == [n - 3, n - 2, n - 1]
    assert read_source(orc_p, "orc").count() == n

    fea_p = str(tmp_path / "t.feather")
    with ipc.new_file(fea_p, t.schema) as w:
        for b in t.to_batches(max_chunksize=512):
            w.write_batch(b)
    got = read_source(fea_p, "feather", columns=["k"]).to_pandas()
    assert sorted(got["k"].tolist()) == list(range(n))

    # stream-framed IPC (no footer) must also read
    stream_p = str(tmp_path / "t2.arrow")
    with ipc.new_stream(stream_p, t.schema) as w:
        w.write_table(t)
    got = read_source(
        stream_p, "feather", columns=["k", "x"], filter=(pads.field("k") < 2)
    ).to_pandas().sort_values("k")
    assert got["x"].tolist() == [0.0, 1.5]

    # uniform contract: the filter may reference a column OUTSIDE the
    # projection (csv/parquet honor this; the reader must not pre-prune)
    got = read_source(
        orc_p, "orc", columns=["v"], filter=(pads.field("k") >= n - 2)
    ).to_pandas()
    assert len(got) == 2 and list(got.columns) == ["v"]
    got = read_source(
        fea_p, "feather", columns=["v"], filter=(pads.field("k") >= n - 2)
    ).to_pandas()
    assert len(got) == 2 and list(got.columns) == ["v"]

    # stray non-format files in a directory are skipped by extension
    d = tmp_path / "orcdir"
    d.mkdir()
    orc.write_table(t, str(d / "part0.orc"))
    (d / "_SUCCESS").write_text("")
    assert read_source(str(d), "orc", columns=["k"]).count() == n


def test_histogram_quantiles_bounded_error(ray_session):
    """The mergeable histogram sketch must land within ONE bin width of
    the exact rank-indexed quantile on every group — the advertised
    bound, measured."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.stages.topk import grouped_quantiles, histogram_quantiles

    rng = np.random.default_rng(7)
    n = 20000
    df = pd.DataFrame({
        "g": rng.integers(0, 4, n),
        "v": rng.integers(0, 100000, n).astype("int64"),
    })
    ds = lambda: rd.from_pandas(df, override_num_blocks=9)  # noqa: E731
    qs = {"p50": 0.5, "p95": 0.95}
    lo, hi, bins = 0, 100000, 512
    width = (hi - lo + bins - 1) // bins

    exact = grouped_quantiles(ds(), "g", "v", qs).to_pandas().set_index("g")
    approx = histogram_quantiles(ds(), "g", "v", qs, lo=lo, hi=hi, num_bins=bins)
    approx = approx.to_pandas().set_index("g")
    for g in exact.index:
        for name in qs:
            err = abs(int(exact.loc[g, name]) - int(approx.loc[g, name]))
            assert err <= width, (g, name, err, width)
        assert int(exact.loc[g, "n"]) == int(approx.loc[g, "n"])


def test_interval_join_right_column_collision(ray_session):
    """A right_cols source name that collides with a left column must
    surface the RIGHT side's values (pandas renames it `src__r` on
    merge — regression for the inverted suffix lookup)."""
    import pandas as pd
    import ray.data as rd

    from etl_reconciliate_ray.stages.joins import interval_join

    left = pd.DataFrame({"k": [1, 1], "t": [5, 50], "event_id": [100, 101]})
    right = pd.DataFrame({"k": [1], "lo": [0], "hi": [10], "event_id": [900]})
    out = interval_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by="k", on="t", right_lower="lo", right_upper="hi",
        left_cols={"event_id": "left_id"}, right_cols={"event_id": "right_id"},
        num_buckets=2,
    ).to_pandas()
    assert out["left_id"].tolist() == [100]   # only t=5 falls in [0, 10)
    assert out["right_id"].tolist() == [900]  # the RIGHT event id, not 100


def test_bloom_prefilter_properties(ray_session):
    """Bloom contract: ZERO false negatives (every inserted key passes);
    FP rate near theory; prefilter + exact semi filter == exact result."""
    import pyarrow as pa
    import ray.data as rd

    from etl_reconciliate_ray.functions.bloom import (
        bloom_contains, bloom_prefilter, build_bloom,
    )

    keys = pa.array([f"k{i}" for i in range(50_000)])
    other = pa.array([f"x{i}" for i in range(50_000)])
    bloom = build_bloom(keys, bits_log2=19, k=7)  # ~10.5 bits/key

    assert bloom_contains(bloom, keys).all()  # no false negatives, ever
    fp = bloom_contains(bloom, other).mean()
    assert fp < 0.03, fp  # theory ~0.9% at 10.5 bits/key; generous margin

    df = pd.DataFrame({"k": [f"k{i}" for i in range(0, 2000)]
                       + [f"x{i}" for i in range(2000)]})
    ds = rd.from_pandas(df, override_num_blocks=5)
    pre = bloom_prefilter(ds, bloom, on="k").to_pandas()
    exact = {f"k{i}" for i in range(50_000)}
    kept = set(pre["k"])
    assert {k for k in df["k"] if k in exact} <= kept  # prefilter loses nothing
    # definitely-absent fast path is a correct SUBSET of the anti result
    anti_fast = set(bloom_prefilter(ds, bloom, on="k", invert=True).to_pandas()["k"])
    assert anti_fast <= {k for k in df["k"] if k not in exact}


def test_pq_recall_vs_exact_knn(ray_session):
    """PQ-ADC top-k must keep high recall vs exact knn on sf0.001, and
    a degenerate codebook (kcodes >= corpus, m=1 would be exact) isn't
    used — this exercises real 8-subspace compression."""
    import pyarrow.parquet as pq

    from etl_reconciliate_ray.pipelines.queries import _query_vectors
    from etl_reconciliate_ray.sources.catalog import read_table
    from etl_reconciliate_ray.stages.similarity import knn_cosine, pq_topk

    q = _query_vectors(SF_DIR)
    train = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()

    def pairs(df):
        return set(map(tuple, df[["query_id", "neighbor_id"]].to_numpy()))

    exact = pairs(
        knn_cosine(
            read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"]), q, k=5
        ).to_pandas()
    )
    approx = pairs(
        pq_topk(
            read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"]),
            q, k=5, m=8, kcodes=32, train_sample=train,
        ).to_pandas()
    )
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.6, recall


def test_pq_encode_compresses_and_is_deterministic(ray_session):
    """pq_encode emits exactly m bytes per vector and identical codes
    across two runs (broadcast codebooks, seeded training)."""
    import pyarrow.parquet as pq

    from etl_reconciliate_ray.sources.catalog import read_table
    from etl_reconciliate_ray.stages.similarity import (
        _emb_matrix,
        _normalize,
        _pq_train,
        pq_encode,
    )

    train = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    books = _pq_train(_normalize(_emb_matrix(train["embedding"])), m=8, kcodes=32)
    ds = read_table(SF_DIR, "embeddings", columns=["vec_id", "embedding"])
    a = pq_encode(ds, books).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = pq_encode(ds, books).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert (a["pq_code"].str.len() == 8).all()
    assert a.equals(b)
    # codes must discriminate: not all vectors share one code word
    assert a["pq_code"].nunique() > len(a) // 2


def test_span_dedup_planted_structure(ray_session):
    """Planted semantics for cross-document span dedup: a 20-word span
    shared by two docs is removed from BOTH; unique spans survive; a
    span repeated only WITHIN one doc is NOT removed (the criterion is
    distinct-doc count > 1)."""
    import ray.data as rd

    from etl_reconciliate_ray.stages.textstage import span_dedup

    shared = " ".join(f"s{i}" for i in range(20))
    uniq_a = " ".join(f"a{i}" for i in range(20))
    uniq_b = " ".join(f"b{i}" for i in range(20))
    self_rep = " ".join(f"r{i}" for i in range(20))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            shared + " " + uniq_a,
            shared + " " + uniq_b,
            self_rep + " " + self_rep,  # repeated within ONE doc only
        ],
    })
    out = (
        span_dedup(rd.from_pandas(df, override_num_blocks=3), width=20)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, "text"] == uniq_a and out.loc[1, "n_dropped"] == 1
    assert out.loc[2, "text"] == uniq_b and out.loc[2, "n_dropped"] == 1
    assert out.loc[3, "text"] == self_rep + " " + self_rep
    assert out.loc[3, "n_dropped"] == 0 and out.loc[3, "n_spans"] == 2


def test_span_dedup_sharded_probe_matches_broadcast(ray_session):
    """The sharded probe (Bloom front + partitioned exact semi-join +
    doc-bucket cogroup; nothing data-scale on the driver) must produce
    byte-identical output to the broadcast probe — including when the
    dup tail exceeds the auto mode's broadcast budget (budget 0 forces
    the sharded path), with null texts, non-default column names, and
    string doc ids."""
    import ray.data as rd

    from etl_reconciliate_ray.stages.textstage import span_dedup

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 90)))) for _ in range(60)
    ]
    texts[7] = texts[3]                # full-doc duplicate
    texts[11] = texts[4] + " " + texts[5]  # shares leading spans
    texts[12] = None                   # null text: no output row
    df = pd.DataFrame({"k": [f"d{i}" for i in range(60)], "body": texts})

    def run(**kw):
        return (
            span_dedup(rd.from_pandas(df, override_num_blocks=5), width=8,
                       text_col="body", doc_id_col="k", **kw)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )

    broadcast = run(probe="broadcast")
    sharded = run(probe="sharded", num_buckets=4)
    forced = run(probe="auto", broadcast_budget=0, num_buckets=4)
    assert broadcast.equals(sharded)
    assert broadcast.equals(forced)
    assert "d12" not in set(broadcast["k"])
    assert len(broadcast) == 59 and (broadcast["n_dropped"] > 0).any()


def test_window_stage_operators_match_fused_query(ray_session):
    """The public tumbling/hopping stage operators (stages/windows)
    must agree leg-for-leg with the fused single-scan
    time_windows_events query — the consolidation changed the plan
    shape, not the semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_reconciliate_ray.pipelines.queries import QUERIES
    from etl_reconciliate_ray.sources.catalog import read_table
    from etl_reconciliate_ray.stages.windows import (
        hopping_window_agg,
        tumbling_window_agg,
    )

    fused = _to_pandas(QUERIES["time_windows_events"](SF_DIR))

    def canon(df, cols):
        df = df[cols].copy()
        df["window_start"] = pd.to_datetime(df["window_start"]).astype("datetime64[us]")
        return df.sort_values(cols, kind="stable").reset_index(drop=True)

    ev = lambda: read_table(SF_DIR, "events", columns=["ts", "event_type", "value"])  # noqa: E731
    cols = ["event_type", "window_start", "n", "sum_value_cents"]

    def cents(ds):
        return ds.map_batches(
            lambda t: t.append_column(
                "sum_value_cents",
                pc.cast(pc.round(pc.multiply(t["sum_value_f"], 100.0)), pa.int64()),
            ).drop_columns(["sum_value_f"]),
            batch_format="pyarrow",
        ).to_pandas()

    tum = cents(tumbling_window_agg(
        ev(), keys=["event_type"], width="hour", sums={"sum_value_f": "value"}
    ))
    hop = cents(hopping_window_agg(
        ev(), keys=["event_type"], width_minutes=60, hop_minutes=30,
        sums={"sum_value_f": "value"},
    ))
    pd.testing.assert_frame_equal(
        canon(tum, cols), canon(fused[fused["kind"] == "tumbling"], cols)
    )
    pd.testing.assert_frame_equal(
        canon(hop, cols), canon(fused[fused["kind"] == "hopping"], cols)
    )


def test_sink_registry_roundtrip(ray_session, tmp_path):
    """S5 sink surface: every built-in sink writes a Dataset that
    reads back row-identical; a custom-registered sink is
    indistinguishable from a built-in."""
    import ray.data as rd

    from etl_reconciliate_ray.sources.catalog import (
        read_source,
        register_sink,
        write_sink,
    )

    df = pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    for fmt in ["parquet", "csv", "json"]:
        out = str(tmp_path / fmt)
        write_sink(rd.from_pandas(df, override_num_blocks=2), out, fmt)
        back = read_source(out, fmt).to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(back, df, check_dtype=False)

    seen = {}
    register_sink("mem", lambda ds, path, **kw: seen.update(rows=ds.count(), path=path))
    write_sink(rd.from_pandas(df), "ignored", "mem")
    assert seen == {"rows": 4, "path": "ignored"}

    with pytest.raises(ValueError, match="no sink"):
        write_sink(rd.from_pandas(df), "p", "orc")


def test_bench_headline_keys_resolve():
    """Every key bench.py times must exist in the registry — a rename
    or consolidation that orphans a headline key would otherwise only
    surface when the driver's per-round bench crashes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [k for k in bench.HEADLINE_QUERIES if k not in QUERIES]
    assert not missing, missing
