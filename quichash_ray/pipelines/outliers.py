"""Robust per-group outlier detection — median/MAD over an integer
column, exactly (no float quantile estimation, no sampling).

The classic "3×MAD" rule made distributed and integer-exact: per-group
value histograms are a COMBINER aggregate (the shuffle carries
(group, value, count) rows — bounded by groups × distinct values, never
row count), the bounded histogram comes to the driver where median and
MAD fall out of two cumulative scans with the same ceil-rank rule as
DuckDB ``quantile_disc``, and one streaming filter pass flags rows with
``|v − median| > k·MAD``. Works on any int64 column; dollar values are
pre-scaled to cents with half-away-from-zero rounding (matching DuckDB
``round()``) by the caller.

Reference analog: none (quichash is a hashing tool); graft-mandated
data-quality operator. Scale note: the histogram is the only collected
state — a value column with unbounded distinct cardinality should be
bucketed first (the caller owns that contract, as with
``doc_length_quantiles``).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _disc_quantile(vals: np.ndarray, counts: np.ndarray, q: float) -> int:
    """Smallest v whose cumulative count ≥ ceil(q·n) (quantile_disc)."""
    order = np.argsort(vals)
    v, c = vals[order], counts[order]
    cum = np.cumsum(c)
    rank = max(1, math.ceil(q * int(cum[-1])))
    return int(v[np.searchsorted(cum, rank, side="left")])


def mad_outliers(
    ds: Dataset,
    k: int = 3,
    id_col: str = "event_id",
    group_col: str = "event_type",
    value_col: str = "cents",
) -> Dataset:
    """→ rows of ``ds`` where |value − median_g| > k·MAD_g, computed
    per ``group_col`` with exact discrete medians. Output columns:
    (id_col, group_col, value_col)."""

    def hist(b: pa.Table) -> pa.Table:
        import pandas as pd

        if b.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame(
                {
                    group_col: b[group_col].to_pandas(),
                    "v": np.asarray(pc.cast(b[value_col], pa.int64())),
                }
            )
            .groupby([group_col, "v"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                group_col: pa.array(g[group_col].to_numpy(), pa.string()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(
            hist, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby([group_col, "v"])
        .sum("cnt")
    )
    # bounded by groups × distinct values — driver-safe by contract
    rows = agg.take_all()
    by_group: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_group.setdefault(r[group_col], []).append(
            (int(r["v"]), int(r["sum(cnt)"]))
        )
    thresholds: dict[str, tuple[int, int]] = {}
    for gname, vc in by_group.items():
        vals = np.array([x[0] for x in vc], dtype=np.int64)
        counts = np.array([x[1] for x in vc], dtype=np.int64)
        med = _disc_quantile(vals, counts, 0.5)
        mad = _disc_quantile(np.abs(vals - med), counts, 0.5)
        thresholds[gname] = (med, mad)

    def flag(b: pa.Table) -> pa.Table:
        import pandas as pd

        t = pa.table(
            {
                id_col: pc.cast(b[id_col], pa.int64()),
                group_col: b[group_col],
                value_col: pc.cast(b[value_col], pa.int64()),
            }
        )
        if t.num_rows == 0 or not thresholds:
            return t.slice(0, 0)
        grp = pd.Series(t[group_col].to_pandas())
        med = grp.map({g: m for g, (m, _) in thresholds.items()})
        mad = grp.map({g: d for g, (_, d) in thresholds.items()})
        # groups with no threshold (null group key, or all-null values —
        # dropped by the histogram groupby) are excluded, not crashed on:
        # the NaN→int64 cast below would otherwise raise ValueError
        known = med.notna().to_numpy()
        med = med.fillna(0)
        mad = mad.fillna(0)
        v = np.asarray(t[value_col])
        keep = known & (
            np.abs(v - med.to_numpy(np.int64)) > k * mad.to_numpy(np.int64)
        )
        return t.filter(pa.array(keep))

    return ds.map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
