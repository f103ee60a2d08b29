"""Table profiling — per-column null counts and min/max in ONE streaming
pass (the "describe" / data-quality summary every engine ships).

Shape: each batch emits a tiny per-column partial (n, n_null, min, max —
columns × 4 values, independent of row count); partials combine on the
driver (bounded by columns × blocks). No shuffle at all. Partial min/max
carry a type tag so the driver combines in the ORIGINAL domain (int
compare for ints, byte compare for strings — stringifying first would
order "9" > "10"); only the final output stringifies. String comparison
is raw UTF-8 bytes — the binary collation DuckDB defaults to — and
Python ``str(int)`` equals DuckDB's VARCHAR cast, so the oracle matches
exactly on int/string columns (float/timestamp columns profile fine but
their text formatting is engine-specific; keep them out of hash-checked
oracles).

Reference analog: none (quichash is a hashing tool); graft-mandated
engine surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _tag(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "i"
    if pa.types.is_floating(t):
        return "f"
    return "s"


def profile_table(ds: Dataset, columns: list[str] | None = None) -> pa.Table:
    """→ one row per column: (column, n_rows, n_null, min_v, max_v) with
    min/max stringified at the end (None when every value is null)."""
    if columns is not None:
        ds = ds.select_columns(columns)

    def partial(b: pa.Table) -> pa.Table:
        names, kinds, ns, nulls, mins, maxs = [], [], [], [], [], []
        for name in b.column_names:
            col = b[name]
            names.append(name)
            kinds.append(_tag(col.type))
            ns.append(b.num_rows)
            nulls.append(col.null_count)
            if b.num_rows == col.null_count:
                mins.append(None)
                maxs.append(None)
            else:
                mm = pc.min_max(col)
                mins.append(str(mm["min"].as_py()))
                maxs.append(str(mm["max"].as_py()))
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.string()),
                "max_v": pa.array(maxs, pa.string()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def decode(kind: str, v: str):
        if kind == "i":
            return int(v)
        if kind == "f":
            return float(v)
        return v

    # bounded: columns × number of blocks
    acc: dict[str, list] = {}
    for r in parts.take_all():
        c = r["column"]
        cur = acc.get(c)
        lo = None if r["min_v"] is None else decode(r["kind"], r["min_v"])
        hi = None if r["max_v"] is None else decode(r["kind"], r["max_v"])
        if cur is None:
            acc[c] = [r["n"], r["n_null"], lo, hi]
        else:
            cur[0] += r["n"]
            cur[1] += r["n_null"]
            if lo is not None:
                cur[2] = lo if cur[2] is None else min(cur[2], lo)
            if hi is not None:
                cur[3] = hi if cur[3] is None else max(cur[3], hi)
    names = sorted(acc)

    def s(v):
        return None if v is None else str(v)

    return pa.table(
        {
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array([acc[c][0] for c in names], pa.int64()),
            "n_null": pa.array([acc[c][1] for c in names], pa.int64()),
            "min_v": pa.array([s(acc[c][2]) for c in names], pa.string()),
            "max_v": pa.array([s(acc[c][3]) for c in names], pa.string()),
        }
    )
