"""BPE vocabulary induction (Sennrich et al., ACL 2016) — tokenizer
training as a Spark job.

The standard word-level formulation: collapse the corpus to a
(word, freq) vocabulary once, then per merge round (1) count adjacent
symbol pairs weighted by word frequency, (2) pick the global top pair
(freq desc, then lexicographic — fully deterministic), (3) greedily
merge that pair left-to-right inside every word. The learned merge
table IS the tokenizer.

Scale shape: the corpus is touched ONCE (the word-frequency
aggregation — a shuffle whose payload is distinct words, not
documents). Every merge round then runs over the vocabulary frame,
which is orders of magnitude smaller than the corpus (Heaps' law), so
N rounds cost N small aggregations, not N corpus scans:

- pair counting is a narrow HOF projection (``zip symbols[:-1] with
  symbols[1:]``) + explode + map-side-combined sum;
- the winning pair is a 1-row driver scalar (the BM25-avgdl pattern);
- the merge applies as a higher-order ``aggregate`` fold per word —
  greedy left-to-right, matching the reference algorithm exactly;
- the vocab frame is eagerly checkpointed per round (iterative
  lineage truncation) under ``session.iterative_conf``.

SQL-twinned (round 8): the greedy non-overlapping merge IS
expressible once each symbol is bracket-wrapped (chr30+sym+chr31) —
string ``replace`` then consumes whole symbols and scans greedily
left-to-right exactly like the fold, and the training loop runs as a
DuckDB recursive CTE whose recursive term aggregates pair counts over
the working table (queries.py _sql_bpe_training_cte). Exactness is
ALSO pinned in pytest against a pure-Python reference implementation
(tests/test_text_ext.py) — two independent oracles for the same law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from uofi_payroll_etl_main_demo_spark.functions.text import tokenize_ws
from uofi_payroll_etl_main_demo_spark.session import iterative_conf


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    lowercase: bool = True,
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns one row per learned merge: (rank, left, right, merged,
    pair_freq), rank 1 = first merge. Stops early when no pair reaches
    ``min_pair_freq``.
    """
    spark = df.sparkSession
    word = F.explode(tokenize_ws(text_col)).alias("w")
    src = df.select(word)
    if lowercase:
        src = src.select(F.lower("w").alias("w"))
    with iterative_conf(spark):
        vocab = (
            src.groupBy("w")
            .agg(F.count(F.lit(1)).alias("freq"))
            .select(F.split("w", "").alias("sym"), "freq")
            .localCheckpoint(eager=True)
        )
        merges: list[Row] = []
        for rank in range(1, n_merges + 1):
            s = F.col("sym")
            pairs = vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(s, 1, F.size(s) - 1),
                        F.slice(s, 2, F.size(s) - 1),
                        lambda a, b: F.struct(
                            a.alias("left"), b.alias("right")
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            top = (
                pairs.groupBy("p.left", "p.right")
                .agg(F.sum("freq").alias("pair_freq"))
                .orderBy(
                    F.desc("pair_freq"), F.asc("left"), F.asc("right")
                )
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_freq"] < min_pair_freq:
                break
            a, b = top[0]["left"], top[0]["right"]
            merges.append(
                Row(
                    rank=rank,
                    left=a,
                    right=b,
                    merged=a + b,
                    pair_freq=top[0]["pair_freq"],
                )
            )
            # greedy left-to-right merge: fold each word's symbol array,
            # replacing [.., a] + b with [.., ab]; a freshly-merged 'ab'
            # never re-merges within the round (its value is ab, not a)
            la, lb = F.lit(a), F.lit(b)
            folded = F.aggregate(
                s,
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (x == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.concat(la, lb)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            vocab = vocab.select(folded.alias("sym"), "freq").localCheckpoint(
                eager=True
            )
    return df.sparkSession.createDataFrame(
        merges,
        schema="rank int, left string, right string, merged string, "
        "pair_freq bigint",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize a corpus with a learned merge table → (id, tokens
    array<string>, n_tokens).

    The encode loop (apply every merge in rank order inside every word)
    is genuinely imperative — a rank-N chain of greedy array folds —
    so this is one of the engine's few sanctioned Python boundaries:
    an Arrow-batched ``mapInPandas`` carrying the merge list in the
    closure (KB-scale — the broadcast-a-small-dim pattern). Encoding is
    embarrassingly parallel: no shuffle, scales with input partitions.
    Exactness is pinned against the same pure-Python reference as
    :func:`bpe_merges`.
    """
    import re
    from typing import Iterator

    import pandas as pd

    from uofi_payroll_etl_main_demo_spark.functions.text import _WS_RE

    # split with the SAME explicit whitespace class as tokenize_ws —
    # Python str.split() also breaks on NBSP/U+2028/etc., which would
    # diverge from the trainer's vocabulary AND the SQL twin on any
    # document carrying exotic whitespace
    ws_split = re.compile(_WS_RE + "+")
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(w: str, cache: dict) -> list[str]:
        got = cache.get(w)
        if got is not None:
            return got
        sym = list(w)
        # classic pair-rank loop: repeatedly merge the lowest-rank pair
        # present (equivalent to applying merges in rank order)
        while len(sym) > 1:
            best, best_rank = None, None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (sym[i], sym[i + 1]), r
            if best is None:
                break
            a, b = best
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        cache[w] = sym
        return sym

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                t = (t or "").lower() if lowercase else (t or "")
                enc: list[str] = []
                for w in ws_split.split(t):
                    if not w:
                        continue
                    enc.extend(encode_word(w, cache))
                toks.append(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(x) for x in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, tokens array<string>, n_tokens long"
    )
