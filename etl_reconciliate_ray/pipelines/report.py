"""Report sink: the reference's Excel-report + email stage (K1/K2,
``service/ExcelReportService.java:53-163`` two sheets LOTES/DETALLE,
``service/EmailService.java:31-59``) re-expressed as a data engine's
output contract:

- the DETALLE sheet  -> partitioned parquet of the reconcile DETAIL
  rows (one directory per status class, so a re-run can skip classes
  already written and consumers can read just the discrepancies),
- the LOTES sheet    -> parquet of the per-repo ROLLUP table,
- the email          -> a small ``summary.json`` next to the report
  (exact per-status counts + run metadata) — the machine-readable
  equivalent of the human notification.

Writes are resumable: each partition directory is written through
Ray's ``write_parquet`` and the summary is published last with an
atomic rename — a consumer that sees ``summary.json`` sees a complete
report (manifest-gated visibility, same discipline as the lake sink).

Conditional row coloring (green/red on status, ``:122-124,143-145``)
is presentation-only and out of engine scope (SURVEY.md §2.1 K1).
"""

from __future__ import annotations

import json
import os
import shutil
import time


def write_report(detail_ds, rollup_ds, counts_df, out_dir: str, meta: dict | None = None) -> dict:
    """Write the two report tables + summary. Returns the summary dict.

    ``detail_ds`` / ``rollup_ds``: Ray Datasets (detail has a
    ``status`` column); ``counts_df``: the exact per-status counts
    (pandas). Partitioned by status so discrepancy classes are
    separately addressable and a completed table is skipped on re-run.

    Resume safety: a table directory WITHOUT its ``_DONE`` marker may
    hold a crashed attempt's partial files (Ray names files
    per-execution, so a blind rewrite would duplicate rows) — it is
    cleared before rewriting; only ``_DONE``-marked directories skip.
    """
    t0 = time.monotonic()
    os.makedirs(out_dir, exist_ok=True)

    detail_dir = os.path.join(out_dir, "detail")
    if not os.path.exists(os.path.join(detail_dir, "_DONE")):
        shutil.rmtree(detail_dir, ignore_errors=True)  # drop partial attempt
        # ONE pass, hive-partitioned by status: discrepancy classes are
        # separately addressable (status=MATCHED/ is the bulk; consumers
        # usually read only the small discrepancy partitions)
        detail_ds.write_parquet(detail_dir, partition_cols=["status"])
        with open(os.path.join(detail_dir, "_DONE"), "w") as fh:
            fh.write("ok\n")

    rollup_dir = os.path.join(out_dir, "rollup")
    if not os.path.exists(os.path.join(rollup_dir, "_DONE")):
        shutil.rmtree(rollup_dir, ignore_errors=True)
        rollup_ds.write_parquet(rollup_dir)
        with open(os.path.join(rollup_dir, "_DONE"), "w") as fh:
            fh.write("ok\n")

    summary = {
        "status_counts": {
            str(s): int(n) for s, n in zip(counts_df["status"], counts_df["n"])
        },
        "total_rows": int(counts_df["n"].sum()),
        "sec": round(time.monotonic() - t0, 3),
        **(meta or {}),
    }
    tmp = os.path.join(out_dir, "summary.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "summary.json"))  # atomic publish
    return summary


# Reference sheet layout (ExcelReportService.java:30-38,108-146): the
# LOTES sheet is the per-batch rollup, the DETALLE sheet the per-row
# detail, each with a header row and the status column LAST.
_SHEET_LOTES = "lotes"
_SHEET_DETALLE = "detalle"
_RENDER_MAX_ROWS = 1_000_000


def render_report(out_dir: str, fmt: str = "csv", max_rows: int = _RENDER_MAX_ROWS) -> dict:
    """Human-parity render of a written report (K1 presentation gap):
    the two parquet tables re-emitted as the reference's two sheets
    (``ExcelReportService.java:53-163`` LOTES/DETALLE), status column
    moved last to mirror the sheet layout.

    ``fmt="csv"`` writes ``report_lotes.csv`` / ``report_detalle.csv``
    (always available); ``fmt="xlsx"`` writes one two-sheet workbook if
    ``openpyxl``/``xlsxwriter`` is importable and raises a clear
    ``RuntimeError`` otherwise (neither ships in this container).

    This is a DRIVER-SIDE presentation artifact for a human comparing
    against the reference's Excel output — it refuses beyond
    ``max_rows`` (a 100 TB detail table is not a spreadsheet; read the
    partitioned parquet instead). Cell coloring (:122-124,143-145) is
    presentation-only and intentionally out of scope."""
    import pandas as pd

    def _load(sub: str) -> pd.DataFrame:
        root = os.path.join(out_dir, sub)
        if not os.path.exists(os.path.join(root, "_DONE")):
            raise FileNotFoundError(f"report table {sub!r} not written (no _DONE) in {out_dir}")
        import pyarrow.dataset as pads

        dset = pads.dataset(root, format="parquet", partitioning="hive",
                            ignore_prefixes=["_", "."])
        n = dset.count_rows()
        if n > max_rows:
            raise ValueError(
                f"{sub} has {n} rows > max_rows={max_rows}; the render is a "
                "small-scale presentation artifact — read the parquet report instead"
            )
        df = dset.to_table().to_pandas()
        if "status" in df.columns:  # status last, like the reference sheets
            df = df[[c for c in df.columns if c != "status"] + ["status"]]
        return df

    sheets = {_SHEET_LOTES: _load("rollup"), _SHEET_DETALLE: _load("detail")}
    written: dict[str, str] = {}
    if fmt == "csv":
        for name, df in sheets.items():
            path = os.path.join(out_dir, f"report_{name}.csv")
            df.to_csv(path + ".tmp", index=False)
            os.replace(path + ".tmp", path)
            written[name] = path
    elif fmt == "xlsx":
        try:
            import openpyxl  # noqa: F401  (either engine satisfies pandas)
        except ImportError:
            try:
                import xlsxwriter  # noqa: F401
            except ImportError as exc:
                raise RuntimeError(
                    "fmt='xlsx' needs openpyxl or xlsxwriter (not in this "
                    "container); use fmt='csv'"
                ) from exc
        path = os.path.join(out_dir, "report.xlsx")
        # temp name keeps the .xlsx SUFFIX: pandas infers the Excel
        # engine from the final extension, so "report.xlsx.tmp" raised
        # "No engine for filetype: 'tmp'" on every write, even with
        # openpyxl installed
        tmp = os.path.join(out_dir, "report.tmp.xlsx")
        with pd.ExcelWriter(tmp) as xw:
            for name, df in sheets.items():
                df.to_excel(xw, sheet_name=name, index=False)
        os.replace(tmp, path)  # atomic publish, like every other writer here
        written = {name: path for name in sheets}
    else:
        raise ValueError(f"unknown fmt {fmt!r} (csv|xlsx)")
    return {
        "files": written,
        "rows": {name: int(len(df)) for name, df in sheets.items()},
        "columns": {name: list(df.columns) for name, df in sheets.items()},
    }
