"""Cross-engine deterministic expression helpers.

The correctness gate hash-compares Spark results against a DuckDB
oracle, so every numeric expression here is chosen to be *bit-identical*
across both engines:

- ``dec_sum``: floating-point SUM is order-dependent and Spark's
  shuffle order is nondeterministic. Casting each double to
  DECIMAL(18,s) first makes the sum exact (order-free); casting the
  exact decimal back to double is a single correctly-rounded operation
  that both engines perform identically.
- ``avg_exact``: exact decimal sum, then ONE IEEE double division —
  again bit-identical.
- ``hash64``: 60-bit integer from the md5 hex prefix. md5 is
  byte-identical everywhere; both engines parse 15 hex chars to the
  same BIGINT. Used for MinHash/SimHash/fingerprints so the oracle can
  reproduce signatures exactly. (Spark's builtin ``hash``/``xxhash64``
  has no DuckDB twin, hence md5.)

At scale these stay cheap: decimal sums are JVM-side codegen'd, and
md5 is evaluated once per row/shingle inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a double column, returned as
    double. Precision 30: per-value headroom to 10^(30-scale) — a
    decimal(18,s) cast overflows at 10^12-ish values, which under
    Spark 4's default ANSI mode KILLS the query (and with ANSI off
    silently nulls the value out of the sum). The DuckDB oracles keep
    DECIMAL(18,s): identical values below the 18-digit bound, and the
    gate data is orders of magnitude below it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def avg_exact(col: Column | str, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def hash64(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit hash shared with the DuckDB oracle.

    DuckDB twin: ``('0x' || substring(md5(<salt> || x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def duck_hash64(expr: str, salt: str = "") -> str:
    """The DuckDB SQL string equivalent of :func:`hash64`."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"('0x' || substring(md5({inner}), 1, 15))::BIGINT"


def csv_join(col: Column | str) -> Column:
    """Canonical comma-joined string form of an array column.

    The correctness harness hash-compares cell VALUES; list cells are
    unhashable there, so every registered query emits arrays in this
    scalar form (DuckDB twin: :func:`duck_csv_join`).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.transform(c, lambda v: v.cast("string")), ",")


def duck_csv_join(expr: str) -> str:
    """The DuckDB SQL string equivalent of :func:`csv_join`."""
    return f"array_to_string(list_transform({expr}, v -> v::VARCHAR), ',')"


def gap_ms(ts_col: str, *, partition_cols: list[str], order_cols: list[str]) -> Column:
    """Milliseconds since the previous row in the partition (W3).

    Integer arithmetic on epoch-millis — exact in both engines.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    millis = F.unix_millis(F.col(ts_col))
    return millis - F.lag(millis).over(w)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization matching the oracle's regexp_split_to_array.

    Empty/blank strings tokenize to an empty array (both engines'
    split-on-\\s+ of '' yields [''] — filtered out here).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


DUCK_TOKENS = "list_filter(regexp_split_to_array(trim({expr}), '\\s+'), t -> t <> '')"


def duck_tokens(expr: str) -> str:
    return DUCK_TOKENS.format(expr=expr)


def boundary_bucket(value, bounds, inclusive: bool = True):
    """Equi-depth bucket index for ``value`` given ascending quantile
    ``bounds`` (driver-side metadata from ``approxQuantile``): the
    number of boundaries passed, computed row-locally — the shared
    primitive behind z-order rank bucketing and perplexity buckets,
    and the scale-safe replacement for a global ntile window.

    ``inclusive=True`` advances on value >= boundary (a boundary-equal
    value joins the UPPER bucket); ``inclusive=False`` advances on
    value > boundary (it stays in the lower one). approxQuantile
    boundaries are actual data values, so ties on the boundary are
    common and callers must pin which side they land.

    Repeated boundaries (ties in the sketch) are collapsed; adjacent
    buckets simply merge.
    """
    uniq = []
    for v in bounds:
        if not uniq or v > uniq[-1]:
            uniq.append(v)
    barr = F.array(*[F.lit(v) for v in uniq])
    passed = (lambda b: value >= b) if inclusive else (lambda b: value > b)
    return F.aggregate(
        barr,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(passed(b), 1).otherwise(0).cast("long"),
    )
