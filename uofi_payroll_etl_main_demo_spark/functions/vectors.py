"""Vector (embedding) column builders — extension surface.

The reference (`/root/reference/etl_payroll_pipeline_demo.py`) has no
vector operations; these serve the LLM-data-pipeline extension over the
driver's ``embeddings.embedding array<float>`` column (BASELINE.json
north star; TESTDATA.md).

All builders are pure Column expressions over Spark higher-order array
functions (``zip_with`` / ``aggregate`` / ``transform``) — JVM-side,
no Python UDFs, so they scale with whole-stage codegen across any
number of executors. Elements are cast to double before arithmetic so
results match engines that accumulate in fp64 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _to_double_array(c: ColumnOrName) -> Column:
    return F.transform(_col(c), lambda x: x.cast("double"))


def dot_product(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Elementwise dot product of two equal-length array columns → double.

    ``zip_with`` multiplies pairwise, ``aggregate`` folds left in array
    order (deterministic accumulation order).
    """
    prods = F.zip_with(
        _to_double_array(a), _to_double_array(b), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: ColumnOrName) -> Column:
    """Euclidean norm of an array column → double."""
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity of two array columns → double (null if either
    norm is zero)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)


def scale_vector(a: ColumnOrName, factor: Column) -> Column:
    """Multiply every element by ``factor`` (array<double> out)."""
    return F.transform(_to_double_array(a), lambda x: x * factor)


def normalize_vector(a: ColumnOrName) -> Column:
    """Unit-normalize an array column (null-safe: zero vector → null).

    Normalizing once at ingest turns cosine top-k into dot-product
    top-k — at 100 TB this halves the per-pair flops and lets the
    norm be computed exactly once per row instead of once per pair.
    """
    arr = _to_double_array(a)
    norm = F.sqrt(F.aggregate(
        F.zip_with(arr, arr, lambda x, y: x * y), F.lit(0.0),
        lambda acc, x: acc + x,
    ))
    return F.when(norm != 0, F.transform(arr, lambda x: x / norm))
