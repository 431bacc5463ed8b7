"""Table catalog over a parquet directory (the driver's sf dirs or any
lake path).

Replaces the reference's named-JDBC-datasource registry (S5,
``config/datasource/*.java`` + prefixed properties) with the Ray Data
equivalent: one parquet path per logical table, read with column
pruning and optional row filters pushed to the parquet reader.
"""

from __future__ import annotations

import os

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, filter=None):
    """ray.data Dataset for a catalog table. ``columns`` prunes at the
    read; ``filter`` is a pyarrow dataset expression pushed to row
    groups (prune at the read — never load all columns for a
    2-column transform)."""
    import ray.data as rd

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if filter is not None:
        kwargs["filter"] = filter
    return rd.read_parquet(table_path(sf_dir, name), **kwargs)


def read_table_pandas(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side pyarrow read for provably-small sides (dimension
    tables, query vectors) that get broadcast via ``ray.put``."""
    import pyarrow.parquet as pq

    return pq.read_table(table_path(sf_dir, name), columns=columns).to_pandas()
