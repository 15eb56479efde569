"""Robust anomaly scoring: median/MAD z-scores per group.

Why it's here: outlier detection over metric streams is the standard
monitoring/analytics operator the events fixture exercises (and in a
training-data pipeline the same shape flags corrupt numeric fields —
lengths, scores, embedding norms — before they skew a mix). Mean/std
z-scores break down under the very outliers they hunt (one wild value
inflates std and masks the rest); the median/MAD estimator has a 50%
breakdown point, the textbook robust choice.

Scale design: two group-sized aggregations (median, then median
absolute deviation) joined back on the group key — group-sized
relations, AQE-broadcast when small. Exact medians buffer a group's
values inside Spark's percentile aggregate, the right default when
groups are entity-sized (a user's events); for web-scale groups pass
``approx_accuracy`` to switch both passes to ``percentile_approx``
(bounded-error rank sketch, map-side combinable) — the estimator is
robust to small rank error by construction.

Determinism (gate q119): both engines interpolate the even-count
median as the mean of the two middle values, subtraction and the one
division are exact-input IEEE ops, and the 6-dp round absorbs sub-ulp
drift.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the Gaussian consistency constant: MAD * 1.4826 estimates sigma
MAD_CONSISTENCY = 1.4826


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    z_threshold: float = 3.0,
    approx_accuracy: int | None = None,
    z_col: str = "robust_z",
) -> DataFrame:
    """Rows whose robust z-score ``(x - median) / (1.4826 * MAD)``
    exceeds ``z_threshold`` in absolute value within their group,
    with the score attached as ``z_col``.

    Groups with MAD = 0 (a majority of identical values) are skipped
    entirely — every deviation there is "infinitely" anomalous and the
    score is undefined; callers wanting those use an exact-inequality
    filter instead.
    """
    if z_threshold <= 0:
        raise ValueError(f"z_threshold must be > 0, got {z_threshold}")
    med_agg = (
        F.percentile_approx(value_col, 0.5, approx_accuracy)
        if approx_accuracy is not None
        else F.median(value_col)
    )
    med = df.groupBy(*group_cols).agg(med_agg.alias("__med"))
    dev = df.join(med, list(group_cols)).withColumn(
        "__d", F.col(value_col) - F.col("__med")
    )
    mad_agg = (
        F.percentile_approx(F.abs(F.col("__d")), 0.5, approx_accuracy)
        if approx_accuracy is not None
        else F.median(F.abs(F.col("__d")))
    )
    mad = dev.groupBy(*group_cols).agg(mad_agg.alias("__mad"))
    scored = (
        dev.join(mad, list(group_cols))
        .where(F.col("__mad") > 0)
        .withColumn(z_col, F.col("__d") / (F.lit(MAD_CONSISTENCY) * F.col("__mad")))
    )
    return scored.where(F.abs(F.col(z_col)) > z_threshold).drop(
        "__med", "__d", "__mad"
    )
