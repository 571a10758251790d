"""Custom connectors via the Python Data Source API (Spark 4).

The reference's only "connector" is the Box SDK walk (SURVEY.md §2.1
S1/S2) — driver-side, single-threaded, out of engine core. This module
shows the engine-native way to add a source Spark lacks: subclass
``pyspark.sql.datasource.DataSource``, declare ``partitions()`` so the
scan parallelizes, and yield rows per partition on executors. The same
API surface would wrap any REST/paginated remote store: one partition
per page range, workers fetch independently, no driver bottleneck.

``SyntheticDocsDataSource`` generates a deterministic document corpus
(seeded per partition — same options ⇒ same rows, any parallelism),
used as a self-contained ingest fixture:

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("n", 10_000).option("partitions", 8).load())

Scale posture: row generation is executor-side and embarrassingly
parallel; ``partitions`` controls task fan-out exactly like file
splits do for parquet.
"""

from __future__ import annotations

from pyspark.sql import types as T

try:  # Spark 4+ only; the engine degrades to parquet/CSV sources below it
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    HAS_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover - older Spark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    HAS_PYTHON_DATASOURCE = False

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_WORDS = (
    "the quick brown fox jumps over lazy dog data spark engine scale "
    "shuffle partition column row batch stream join filter group"
).split()
_LANGS = ["en", "es", "fr", "de"]


def _doc_row(i: int) -> tuple:
    # Deterministic per doc id — independent of partitioning.
    rnd = (i * 2654435761) & 0xFFFFFFFF
    n_words = 5 + rnd % 40
    words = [_WORDS[(i + j * 7 + rnd) % len(_WORDS)] for j in range(n_words)]
    return (
        i,
        " ".join(words),
        _LANGS[rnd % len(_LANGS)],
        f"synthetic/{rnd % 4}",
    )


class _DocsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _DocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 4))

    def partitions(self):
        step = max(1, self.n // self.num_partitions)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [
            _DocsPartition(bounds[i], bounds[i + 1])
            for i in range(len(bounds) - 1)
        ]

    def read(self, partition: "_DocsPartition"):
        for i in range(partition.start, partition.end):
            yield _doc_row(i)


class SyntheticDocsDataSource(DataSource):
    """``format("synthetic_docs")`` — deterministic corpus generator."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self):
        return DOCS_SCHEMA

    def reader(self, schema):
        return _DocsReader(self.options)
