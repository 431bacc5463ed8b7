"""etl_reconciliate_ray — a Ray-Data-native CDC ingest & reconcile engine.

Brand-new engine (NOT a port) with the query / data-processing
capabilities of the reference `mzrtcode/ETL-Reconciliate` (Spring Batch
two-source reconciliation job; see SURVEY.md), re-expressed as idiomatic
`ray.data.Dataset` pipelines:

- binlog/WAL tail -> key-partitioned upsert replay onto a Parquet lake
  keyed by ``(repo, path)`` (``pipelines.replay``),
- exactly-once sinks: idempotent, content-addressed parquet writes +
  commit-log with per-partition epoch fencing (``state.commitlog``,
  ``stages.writer``),
- additive schema evolution on merge (``stages.merge``),
- distributed sort-merge cogroup reconciliation emitting
  MATCHED / MISSING_LEFT / MISSING_RIGHT / VALUE_DIFF / DUP statuses
  (``stages.reconcile``), mirroring the reference's
  ``ReconciliationService`` semantics (docstrings cite file:line).

Library code never calls ``ray.init()`` / ``ray.shutdown()`` — the
driver owns the Ray session (see ``__ray_entry__.py`` contract).
"""

__version__ = "0.1.0"
