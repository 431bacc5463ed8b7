"""Iterative graph algorithms over edge-list Datasets.

PageRank as iterated Dataset rounds (Page et al. 1999; the Pregel-style
message formulation): each round is ONE execution — a hash join (edges
pick up their source's rank/out-degree) feeding a groupby-sum reduce
(messages land at the destination) — plus one tiny scalar read over the
materialized reduce output. No driver-side adjacency; nothing
corpus-sized leaves the cluster. Companion to the min-label connected
components in ``stages/dedup.py``; near-dup governance needs cluster
structure (CC) and a canonical-representative ranking (PageRank over
the similarity graph picks the most central duplicate to keep).

Two tricks keep the round count of executions at one-and-a-bit:

- the rank is never materialized as a column: state carries the
  incoming sum ``s`` and the round's uniform term ``add`` lives on the
  driver, so ``rank = d·s + add`` is applied lazily inside the next
  round's map stages;
- dangling mass (rank sitting on out-degree-0 nodes — the standard
  stochastic-matrix patch) is accumulated by per-batch SENTINEL rows
  (node = -1) inside the same reduce, then read back with one small
  vectorized pass over the already-materialized result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SENTINEL = -1  # dangling-mass accumulator key; real node ids are >= 0


def _i64(col):
    return pc.cast(col, pa.int64())


def pagerank(
    nodes_ds,
    edges_ds,
    damping: float = 0.85,
    iters: int = 10,
    num_buckets: int = 16,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    undirected: bool = True,
):
    """PageRank over Dataset(node) + Dataset(src, dst) edges.

    Returns Dataset(node, rank float64, rank_e9 int64); ranks sum to 1.
    Fixed ``iters`` power iterations of

        r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/deg(u) + dangling/N)

    Node ids must be >= 0 (-1 is the internal dangling accumulator).
    """
    from ray.data.aggregate import Count, Sum

    from .joins import hash_join

    d = float(damping)

    def symmetrize(t: pa.Table) -> pa.Table:
        s = _i64(t[src_col]).combine_chunks()
        t2 = _i64(t[dst_col]).combine_chunks()
        if undirected:
            return pa.table({
                "src": pa.concat_arrays([s, t2]),
                "dst": pa.concat_arrays([t2, s]),
            })
        return pa.table({"src": s, "dst": t2})

    edges = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    deg = edges.groupby("src").aggregate(Count(alias_name="deg")).map_batches(
        lambda t: pa.table({"node": _i64(t["src"]), "deg": _i64(t["deg"])}),
        batch_format="pyarrow",
    )
    n_total = nodes_ds.count()
    empty = pa.table({
        "node": pa.array([], pa.int64()),
        "rank": pa.array([], pa.float64()),
        "rank_e9": pa.array([], pa.int64()),
    })
    if n_total == 0:
        return nodes_ds.map_batches(lambda t: empty, batch_format="pyarrow")

    # OUTER join so an edge source absent from nodes_ds surfaces as a
    # row with a null marker instead of silently vanishing from the
    # inner message join (its rank mass would just leak). Undirected
    # graphs route BOTH endpoints through deg, so this catches every
    # undeclared endpoint; directed-graph unknown destinations are
    # caught by the n_self check in the round reduce below.
    base = hash_join(
        nodes_ds.map_batches(
            lambda t: pa.table({
                "node": _i64(t["node"]),
                "is_node": pa.array(np.ones(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow",
        ),
        deg,
        on="node",
        how="outer",
        num_buckets=num_buckets,
    )

    def init_state(t: pa.Table) -> pa.Table:
        marker = t["is_node"]
        missing = pc.is_null(marker, nan_is_null=True)
        bad = t.filter(missing)
        if bad.num_rows:
            raise ValueError(
                "pagerank: edge endpoint(s) not present in nodes_ds: "
                f"{bad['node'].to_pylist()[:5]}"
            )
        return pa.table({
            "node": _i64(t["node"]),
            "s": pa.array(np.zeros(t.num_rows)),
            "deg": pc.fill_null(pc.cast(t["deg"], pa.int64()), 0),
        })

    # state: (node, s, deg) materialized; rank = d·s + add, add on the
    # driver. Init s = 0, add = 1/N → uniform rank_0.
    state = base.map_batches(init_state, batch_format="pyarrow").materialize()
    add = 1.0 / n_total

    def _rank(t: pa.Table, add: float):
        return pc.add(pc.multiply(pc.cast(t["s"], pa.float64()), pa.scalar(d)),
                      pa.scalar(add))

    for _ in range(iters):
        def src_state_fn(t: pa.Table, add=add) -> pa.Table:
            t = t.filter(pc.greater(t["node"], _SENTINEL))
            rank = _rank(t, add)
            w = pc.divide(
                rank, pc.cast(pc.max_element_wise(t["deg"], 1), pa.float64())
            )
            return pa.table({"src": t["node"], "w": w, "deg": t["deg"]})

        msgs = hash_join(
            edges,
            state.map_batches(src_state_fn, batch_format="pyarrow"),
            on="src",
            num_buckets=num_buckets,
        ).map_batches(
            lambda t: pa.table({
                "node": _i64(t["dst"]),
                "w": pc.cast(t["w"], pa.float64()),
                "self_deg": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_self": pa.array(np.zeros(t.num_rows, np.int64)),
            }),
            batch_format="pyarrow",
        )

        def self_fn(t: pa.Table, add=add) -> pa.Table:
            # self rows keep every node (and its deg) alive through the
            # reduce; one sentinel row per batch accumulates the batch's
            # dangling rank so no separate dangling pass is needed
            t = t.filter(pc.greater(t["node"], _SENTINEL))
            rank = _rank(t, add)
            dang = pc.sum(
                pc.if_else(pc.equal(t["deg"], 0), rank, pa.scalar(0.0))
            )
            dang = 0.0 if dang.as_py() is None else float(dang.as_py())
            ones = pa.array(np.ones(t.num_rows + 1, np.int64))
            return pa.table({
                "node": pa.concat_arrays([
                    _i64(t["node"]).combine_chunks(),
                    pa.array([_SENTINEL], pa.int64()),
                ]),
                "w": pa.concat_arrays([
                    pa.array(np.zeros(t.num_rows)), pa.array([dang]),
                ]),
                "self_deg": pa.concat_arrays([
                    _i64(t["deg"]).combine_chunks(), pa.array([0], pa.int64()),
                ]),
                "n_self": ones,
            })

        red = (
            state.map_batches(self_fn, batch_format="pyarrow")
            .union(msgs)
            .groupby("node")
            .aggregate(
                Sum(on="w", alias_name="s"),
                Sum(on="self_deg", alias_name="deg"),
                Sum(on="n_self", alias_name="n_self"),
            )
            # cap the state's block count: union + groupby otherwise
            # grow blocks every round (state blocks + message blocks in,
            # as many out), making round k slower than round k-1
            .repartition(num_buckets)
            .materialize()
        )
        # one small vectorized pass over the materialized reduce output
        def dang_fn(t: pa.Table) -> pa.Table:
            # a node row with no self contribution is a message to a
            # destination that was never in nodes_ds — a directed-graph
            # contract violation the outer join can't see
            bad = t.filter(
                pc.and_(
                    pc.greater(t["node"], _SENTINEL), pc.equal(t["n_self"], 0)
                )
            )
            if bad.num_rows:
                raise ValueError(
                    "pagerank: edge destination(s) not present in nodes_ds: "
                    f"{bad['node'].to_pylist()[:5]}"
                )
            return pa.table({
                "m": pc.if_else(
                    pc.equal(t["node"], _SENTINEL),
                    pc.cast(t["s"], pa.float64()),
                    pa.scalar(0.0),
                )
            })

        dangling = red.map_batches(dang_fn, batch_format="pyarrow").sum("m")
        dangling = float(dangling or 0.0)
        state = red
        add = (1.0 - d) / n_total + d * dangling / n_total

    def finish(t: pa.Table, add=add) -> pa.Table:
        t = t.filter(pc.greater(t["node"], _SENTINEL))
        rank = _rank(t, add)
        return pa.table({
            "node": t["node"],
            "rank": rank,
            "rank_e9": pc.cast(pc.round(pc.multiply(rank, 1e9)), pa.int64()),
        })

    return state.map_batches(finish, batch_format="pyarrow")
