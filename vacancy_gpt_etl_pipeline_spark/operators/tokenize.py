"""Tokenizer-exact BPE encoding — budget training data in real tokens.

Scale extension (north star): the packing/chunking operators budget in
whitespace or BPE-ish regex token counts, but a training pipeline
allocates context-window budget in TOKENIZER tokens. This module
implements exact byte-pair-encoding segmentation (Sennrich ACL'16
apply step) against a ranked merge list, with the classic corpus-scale
trick: encode each DISTINCT word once, then join counts back — cost is
O(vocabulary), never O(corpus tokens).

Exactness argument (why the loop below IS Sennrich's algorithm):
Sennrich's apply_bpe repeatedly merges all occurrences of the
lowest-rank pair present in the word. Merging one leftmost occurrence
at a time of the lowest-rank applicable rule reaches the same final
segmentation, because a merge of pair (x, y) only creates adjacencies
involving the NEW symbol xy — and every rule involving xy was learned
after (x, y), i.e. has a strictly higher rank. No lower-rank rule can
become applicable, so rank-order one-at-a-time == rank-order batch.
This one-merge-per-step formulation is what makes the operator
SQL-oracle-verifiable: a recursive CTE can replay it step for step.

Scale shape: explode → distinct (shuffle bounded by vocabulary size) →
Arrow ``mapInPandas`` encode over the distinct-word frame with the
merge table captured in the closure (a broadcast-sized constant) →
join back on the word string (AQE broadcasts the vocabulary-sized
token table) → one map-side-combinable per-doc aggregate. At 100 TB
the vocabulary is millions of rows while the corpus is billions — the
encode never touches the corpus-sized frame.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Merge = Tuple[str, str]

# Ranked merge list (rank = position). Chosen to exercise the shapes a
# learned vocabulary produces over the test corpus: cascaded merges
# ("t a"->"ta", "ta b"->"tab", "tab le"->"table"), merges whose parts
# are themselves merged symbols, a doubled-letter merge ("g g"), and
# rules that only fire mid-word.
DEFAULT_BPE_MERGES: Sequence[Merge] = (
    ("t", "a"),
    ("l", "e"),
    ("ta", "b"),
    ("tab", "le"),
    ("g", "g"),
    ("r", "o"),
    ("s", "c"),
    ("sc", "a"),
    ("e", "r"),
    ("v", "a"),
    ("er", "y"),
)


def bpe_segment(word: str, merges: Sequence[Merge]) -> list[str]:
    """Pure-Python exact BPE apply: repeatedly merge the leftmost
    occurrence of the lowest-rank applicable rule. Shared by the Spark
    operator (inside mapInPandas) and the tests' reference replay."""
    seq: list[str] = list(word)
    while True:
        for x, y in merges:
            for i in range(len(seq) - 1):
                if seq[i] == x and seq[i + 1] == y:
                    seq[i : i + 2] = [x + y]
                    break
            else:
                continue
            break
        else:
            return seq


def bpe_token_counts(
    docs: DataFrame,
    merges: Sequence[Merge] = DEFAULT_BPE_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document tokenizer-exact counts: one row per input document
    with ``n_words`` (whitespace words) and ``n_tokens`` (exact BPE
    tokens under ``merges``). Documents with no words keep a row with
    zero counts — budget accounting must not silently drop them."""
    merge_list = list(merges)

    # Keep empty-split rows: split() never yields an empty array (empty
    # text -> ['']), so every document retains >= 1 exploded row and the
    # final aggregate covers all docs WITHOUT a second doc-sized join —
    # zero-word docs get their zero row from conditional counting.
    words = docs.select(
        id_col,
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("word"),
    )
    vocab = words.where(F.col("word") != "").select("word").distinct()

    def encode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "word_tokens": pdf["word"].map(
                        lambda w: len(bpe_segment(w, merge_list))
                    ),
                }
            )

    tok = vocab.mapInPandas(encode, schema="word string, word_tokens long")
    return (
        words.join(tok, "word", "left")
        .groupBy(id_col)
        .agg(
            F.sum((F.col("word") != "").cast("long"))
            .cast("bigint")
            .alias("n_words"),
            F.sum(F.coalesce("word_tokens", F.lit(0)))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


def bpe_merge_sql(merges: Sequence[Merge] = DEFAULT_BPE_MERGES) -> str:
    """DuckDB CTE fragment replaying the EXACT encode loop as a
    recursive CTE over the distinct-word table ``vocab(word)``:
    each recursion step performs one merge — the leftmost occurrence of
    the lowest-rank applicable rule, picked by a rank-ordered CASE
    chain — and a word stops recursing when no rule applies. Symbol
    sequences are strings delimited by the U+001F unit separator
    (chosen over '|' so a corpus word containing a literal pipe cannot
    corrupt the delimiting — r9 ADVICE), so a rule (x, y) is the
    literal substring SEP+x+SEP+y+SEP and token count is
    separator-count − 1. Precondition (asserted): no merge symbol
    contains U+001F; a corpus word containing U+001F would still
    diverge — acceptable, it is a control character no tokenizer
    vocabulary emits. Emits CTEs ``enc`` and ``tok(word, word_tokens)``
    for the caller to join."""
    SEP = "\x1f"
    assert all(
        SEP not in x and SEP not in y for x, y in merges
    ), "merge symbols must not contain the U+001F delimiter"

    def pat(x: str, y: str) -> str:
        return f"{SEP}{x}{SEP}{y}{SEP}"

    def rep(x: str, y: str) -> str:
        return f"{SEP}{x}{y}{SEP}"

    cases = "\n      ".join(
        f"WHEN strpos(seq, '{pat(x, y)}') > 0 THEN "
        f"substr(seq, 1, strpos(seq, '{pat(x, y)}') - 1) || '{rep(x, y)}' || "
        f"substr(seq, strpos(seq, '{pat(x, y)}') + {len(pat(x, y))})"
        for x, y in merges
    )
    applicable = " OR ".join(
        f"strpos(seq, '{pat(x, y)}') > 0" for x, y in merges
    )
    return f"""enc AS (
  SELECT word,
    '{SEP}' || regexp_replace(word, '(.)', '\\1{SEP}', 'g') AS seq,
    0 AS step
  FROM vocab
  UNION ALL
  SELECT word,
    CASE
      {cases}
    END AS seq,
    step + 1
  FROM enc
  WHERE {applicable}
),
tok AS (
  SELECT word,
    CAST(length(arg_max(seq, step))
      - length(replace(arg_max(seq, step), '{SEP}', '')) - 1 AS BIGINT)
      AS word_tokens
  FROM enc GROUP BY word
)"""
