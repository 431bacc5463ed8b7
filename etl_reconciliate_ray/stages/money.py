"""Decimal128 money semantics — the reference's dual BigDecimal
equality, re-expressed over Arrow decimal columns.

The reference compares amounts two ways (SURVEY.md §2.4):

- ``compareTo`` — scale-INSENSITIVE numeric equality (``1.5 == 1.50``),
  used as the match predicate (``service/ReconciliationService.java:151``);
- ``equals`` — scale-SENSITIVE equality (``1.50 != 1.5`` because the
  (unscaledValue, scale) pair differs), used for the strict rollup
  check (``service/ReconciliationService.java:199``).

A single Arrow ``decimal128`` column carries ONE scale for all rows, so
the per-row scale of the "feed" side travels as an explicit ``scale``
int column next to the decimal amount — exactly BigDecimal's
(unscaledValue, scale) decomposition. Numeric comparison happens on
decimal128 kernels (``pc.equal`` after a value-preserving rescale
cast); strict equality additionally requires the recorded scales to
match.

Everything is vectorized Arrow compute — no per-row Python — and the
classification is a pure map over batches (no shuffle): at 100 TB this
stage streams.
"""

from __future__ import annotations

from decimal import Decimal

import pyarrow as pa
import pyarrow.compute as pc

#: canonical ledger scale (cents) and the feed's wider wire scale
LEDGER_SCALE = 2
WIRE_SCALE = 4

_DEC2 = pa.decimal128(18, 2)
_DEC4 = pa.decimal128(19, 4)


def to_money(col: pa.ChunkedArray | pa.Array, scale: int = LEDGER_SCALE) -> pa.ChunkedArray:
    """Cast a float64 amount column to decimal128 at ``scale``.

    Safe because amounts are generated ON a 2-dp grid: any 2-dp decimal
    stored as a double is within 1e-11 of its true value, so
    round-to-nearest at 2dp can never hit a tie — Arrow and DuckDB
    produce identical decimals from identical doubles.
    """
    typ = pa.decimal128(18 if scale == 2 else 19, scale)
    return pc.cast(col, typ)


def dual_equality(
    amt_ledger: pa.ChunkedArray | pa.Array,
    amt_wire: pa.ChunkedArray | pa.Array,
    wire_scale: pa.ChunkedArray | pa.Array,
) -> tuple[pa.Array, pa.Array]:
    """(compareTo_equal, equals_equal) masks for a ledger decimal(18,2)
    column vs a wire decimal(19,4) column whose per-row declared scale
    is ``wire_scale``.

    compareTo: value-preserving rescale of the ledger side to the wire
    type, then decimal ``pc.equal`` — ``1.50 == 1.5000``.
    equals: compareTo AND the wire row was declared at the ledger's
    scale — BigDecimal's (unscaledValue, scale) identity.
    """
    lhs = pc.cast(amt_ledger, _DEC4)  # exact: scale widening only
    cmp_eq = pc.equal(lhs, amt_wire)
    strict_eq = pc.and_(cmp_eq, pc.equal(wire_scale, pa.scalar(LEDGER_SCALE, pa.int32())))
    return cmp_eq, strict_eq


def classify_money_batch(batch: pa.Table) -> pa.Table:
    """Map-only money reconciliation over orders rows: the ledger side
    is ``o_totalprice`` at decimal(18,2); the wire side is a
    deterministic re-quote of the same amount — even orderkeys arrive
    at scale 4 (trailing zeros, compareTo-equal but equals-unequal),
    and every 7th orderkey is perturbed by one wire unit (0.0001 — a
    genuine value discrepancy below cent resolution, which an
    integer-cents engine would silently miss; decimal128 catches it).

    Output per row: orderkey, amount strings at native scales (exact
    textual decimal rendering — scale survives as trailing zeros), and
    the dual-equality status.
    """
    key = batch["o_orderkey"]
    ledger = to_money(batch["o_totalprice"], LEDGER_SCALE)
    wire = pc.cast(ledger, _DEC4)
    even = pc.equal(pc.bit_wise_and(key, pa.scalar(1, pa.int64())), pa.scalar(0, pa.int64()))
    wire_scale = pc.if_else(
        even, pa.scalar(WIRE_SCALE, pa.int32()), pa.scalar(LEDGER_SCALE, pa.int32())
    )
    sub = pc.equal(
        pc.subtract(key, pc.multiply(pc.divide(key, pa.scalar(7, pa.int64())),
                                     pa.scalar(7, pa.int64()))),
        pa.scalar(0, pa.int64()),
    )  # key % 7 == 0 (Arrow has no modulo kernel)
    wire = pc.if_else(sub, pc.add(wire, pa.scalar(Decimal("0.0001"), pa.decimal128(5, 4))), wire)
    wire = pc.cast(wire, _DEC4)

    cmp_eq, strict_eq = dual_equality(ledger, wire, wire_scale)
    status = pc.if_else(
        strict_eq, pa.scalar("MATCHED_STRICT"),
        pc.if_else(cmp_eq, pa.scalar("MATCHED_CMP"), pa.scalar("VALUE_DIFF")),
    )
    # 0.0001-unit integer rendering of the wire amount: exact decimal →
    # int64 (fraction provably zero after ×10^4), for scale-sensitive
    # rollup sums downstream
    wire_e4 = pc.cast(
        pc.multiply(wire, pa.scalar(Decimal("10000"), pa.decimal128(5, 0))), pa.int64()
    )
    return pa.table({
        "orderkey": key,
        "amt_ledger": pc.cast(ledger, pa.string()),
        "amt_wire": pc.cast(wire, pa.string()),
        "wire_scale": wire_scale,
        "status": status,
        "wire_e4": wire_e4,
    })
