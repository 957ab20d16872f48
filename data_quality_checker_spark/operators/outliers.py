"""IQR outlier fences — exact quantiles, computed in one tiny pre-pass.

Reference: src/core/validator.py:270-294 (1.5·IQR fence, ≥5 non-null
values, IQR>0 guard) and :244-254 (3·IQR extended fence). pandas quantiles
are exact linear interpolation; Spark's SQL ``percentile`` uses the same
interpolation, so parity is exact (SURVEY.md §4.3). At 10^12 rows you
would flip the flag below to ``percentile_approx`` with a small accuracy
parameter and document the ε; the two-pass shape (bounds first, then a
fused filter in the main scan) is the scalable part and stays the same.

The pre-pass scans ONLY the numeric column (column pruning keeps it off
the heavy ``bytes`` payload), and its result is folded into the main plan
as literals — so the fence costs one lightweight job, not a second full
pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def iqr_bounds(
    df: DataFrame,
    column: str,
    mult: float = DEFAULT_CONFIG.outlier_iqr_mult,
    min_rows: int = DEFAULT_CONFIG.outlier_min_rows,
    exact: bool = True,
) -> tuple[float, float] | None:
    """→ (lo, hi) fence for `column`, or None when undefined per the
    reference's guards (n < min_rows or IQR == 0)."""
    pct = "percentile" if exact else "percentile_approx"
    row = df.select(
        F.expr(f"{pct}({column}, array(0.25, 0.75))").alias("q"),
        F.count(column).alias("n"),
    ).first()
    if row is None or row["n"] < min_rows or row["q"] is None:
        return None
    q1, q3 = float(row["q"][0]), float(row["q"][1])
    iqr = q3 - q1
    if iqr <= 0:
        return None
    return q1 - mult * iqr, q3 + mult * iqr
