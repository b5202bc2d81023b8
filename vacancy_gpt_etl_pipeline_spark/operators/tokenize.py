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


def _merge_loop(seq: list[str], merges: Sequence[Merge]) -> list[str]:
    """The exact BPE apply step over an arbitrary symbol alphabet:
    repeatedly merge the leftmost occurrence of the lowest-rank
    applicable rule. Shared by the char-level (word-internal) and
    byte-level (hex-symbol) tiers."""
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


def bpe_segment(word: str, merges: Sequence[Merge]) -> list[str]:
    """Pure-Python exact BPE apply: repeatedly merge the leftmost
    occurrence of the lowest-rank applicable rule. Shared by the Spark
    operator (inside mapInPandas) and the tests' reference replay."""
    return _merge_loop(list(word), merges)


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


#: U+001F unit separator delimits symbol sequences in the SQL replay —
#: chosen over '|' so a corpus word containing a literal pipe cannot
#: corrupt the delimiting (r9 ADVICE). A corpus word containing U+001F
#: itself would still diverge — acceptable, it is a control character
#: no tokenizer vocabulary emits.
_SQL_SEP = "\x1f"


def _merge_cte_sql(
    merges: Sequence[Merge], key_col: str, init_expr: str, tokens_col: str
) -> str:
    """Shared generator for the recursive-CTE encode replay: each
    recursion step performs one merge — the leftmost occurrence of the
    lowest-rank applicable rule, picked by a rank-ordered CASE chain —
    and a row stops recursing when no rule applies. Symbol sequences
    are U+001F-delimited strings, so a rule (x, y) is the literal
    substring SEP+x+SEP+y+SEP and token count is separator-count − 1.
    Emits CTEs ``enc`` and ``tok({key_col}, {tokens_col})`` over the
    caller-provided ``vocab({key_col})``."""
    SEP = _SQL_SEP
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
  SELECT {key_col},
    {init_expr} AS seq,
    0 AS step
  FROM vocab
  UNION ALL
  SELECT {key_col},
    CASE
      {cases}
    END AS seq,
    step + 1
  FROM enc
  WHERE {applicable}
),
tok AS (
  SELECT {key_col},
    CAST(length(arg_max(seq, step))
      - length(replace(arg_max(seq, step), '{SEP}', '')) - 1 AS BIGINT)
      AS {tokens_col}
  FROM enc GROUP BY {key_col}
)"""


def bpe_merge_sql(merges: Sequence[Merge] = DEFAULT_BPE_MERGES) -> str:
    """DuckDB CTE fragment replaying the word-internal (char-alphabet)
    encode loop over the distinct-word table ``vocab(word)``; see
    :func:`_merge_cte_sql` for the replay mechanics and the U+001F
    delimiter rationale. Emits CTEs ``enc`` and
    ``tok(word, word_tokens)`` for the caller to join."""
    SEP = _SQL_SEP
    return _merge_cte_sql(
        merges,
        key_col="word",
        init_expr=(
            f"'{SEP}' || regexp_replace(word, '(.)', '\\1{SEP}', 'g')"
        ),
        tokens_col="word_tokens",
    )


# --- Byte-level BPE tier (GPT-2 family shape) ------------------------------
#
# Production LLM budgets are BYTE-level BPE with regex pre-tokenization
# (Radford et al. 2019 "Language Models are Unsupervised Multitask
# Learners", the GPT-2/cl100k family), not word-internal merges: the
# text is regex-split into pre-tokens (a word optionally CARRIES its
# single preceding space — GPT-2's Ġ), each pre-token is UTF-8 encoded,
# and merges operate over the byte alphabet, so any Unicode input
# tokenizes without an <unk>. This tier implements that algorithm
# exactly, parameterized by a ranked merge list.
#
# Pre-tokenization spec — GPT-2's pattern with the English-specific
# contraction alternatives ('s|'t|...) omitted (documented divergence;
# they are vocabulary-specific, not algorithmic):
#
#     ?\p{L}+ |  ?\p{N}+ |  ?[^\s\p{L}\p{N}]+ | \s+(?!\S) | \s+
#
# Spark evaluates this directly (Java regex supports \p{L} and the
# lookahead) inside codegen via regexp_extract_all — the O(corpus) part
# of the pipeline never leaves the JVM. DuckDB's RE2 has no lookahead,
# so the oracle replays the IDENTICAL semantics in two lookahead-free
# steps (proof in byte_pretokenize's docstring): extract with maximal
# runs, then re-attach trailing spaces with one window pass.
#
# Symbol naming: a byte b is the symbol f"{b:02x}"; a merged symbol is
# the concatenation of its parts' hex. Hex naming (instead of GPT-2's
# bytes_to_unicode printable remap) is an invertible cosmetic choice
# that token COUNTS are invariant to, and it makes the SQL replay's
# initial sequence one expression: hex(encode(pre)) split into pairs.

#: Java-regex form (Spark regexp_extract_all — lookahead + \p{L}).
PRETOKEN_PATTERN_JAVA = (
    r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)

#: RE2 form for the oracle's step 1: same classes, NO space attachment
#: (whitespace stays in maximal runs; attachment is replayed in SQL).
PRETOKEN_PATTERN_RE2 = r"\pL+|\pN+|[^\s\pL\pN]+|\s+"


def _hx(s: str) -> str:
    return s.encode("utf-8").hex()


#: Ranked byte-level merges (rank = position), hex-symbol pairs.
#: Shapes exercised: cascades ("t","h" -> "th","e" -> "the"), merges of
#: merged symbols, the GPT-2 leading-space merge (" "+"the" -> " the",
#: hex 20+746865), a multi-byte UTF-8 merge (d0+b8 = Cyrillic "и" —
#: crosses a codepoint's byte boundary, the case word-level BPE cannot
#: express), digits, and a doubled letter.
DEFAULT_BYTE_MERGES: Sequence[Merge] = tuple(
    (_hx(x), _hx(y))
    for x, y in (
        ("t", "h"),
        ("th", "e"),
        ("i", "n"),
        ("e", "r"),
        ("a", "n"),
        ("an", "d"),
        (" ", "the"),
        (" ", "a"),
        (" a", "nd"),
        ("o", "r"),
        ("s", "t"),
        ("l", "l"),
        ("1", "9"),
    )
) + (
    # UTF-8 'и' (U+0438 = 0xd0 0xb8): merges ACROSS a codepoint's byte
    # boundary — the case word-level BPE cannot express. Raw hex-byte
    # symbols, deliberately NOT through _hx.
    ("d0", "b8"),
    (_hx(" "), _hx("in")),
)


def byte_bpe_segment(
    pretoken: str, merges: Sequence[Merge] = DEFAULT_BYTE_MERGES
) -> list[str]:
    """Exact byte-level BPE apply over one pre-token: UTF-8 encode,
    name each byte by its 2-digit hex, run the shared rank-ordered
    merge loop. Returns the merged hex-symbol sequence (token count =
    its length)."""
    return _merge_loop(
        [f"{b:02x}" for b in pretoken.encode("utf-8")], merges
    )


def byte_pretokenize(text: str) -> list[str]:
    """Independent pure-Python reference for the pre-tokenization spec
    (used by tests; Spark uses the Java regex, the oracle the RE2
    two-step). Implements the spec directly with a character scanner —
    no regex engine — so all three implementations are mutually
    independent.

    Lookahead-elimination argument (why the RE2 two-step in the oracle
    equals the Java pattern): the lookahead only affects where a
    maximal whitespace run W splits. Scanning the Java pattern by hand:
    W followed by end-of-text emits W whole. W followed by a non-space
    token T: if W ends with a literal space ' ' (the only character
    ` ?` matches), `\\s+(?!\\S)` backtracks to W[:-1] (one token, empty
    if |W|=1) and T absorbs the final space; otherwise `\\s+(?!\\S)`
    still backtracks to W[:-1] but the final (non-space) whitespace
    character fails ` ?`, so it is emitted alone and T is unprefixed.
    Those three cases are exactly what the oracle's window pass
    replays over RE2's maximal-run extraction.

    Whitespace boundary: Java's default ``\\s`` and RE2's ``\\s`` are
    ASCII-only — Unicode whitespace like U+00A0/U+2028 classifies as
    punctuation via ``[^\\s\\p{L}\\p{N}]`` in BOTH production engines —
    so this reference uses the same ASCII set, not str.isspace()
    (which would diverge on NBSP while Spark and the oracle still
    agree). U+000B is the one residual engine edge: Java's ``\\s``
    includes it, RE2's excludes it; the corpus fixtures contain no
    vertical tabs, and this reference follows Java."""

    def is_ws(c: str) -> bool:
        return c in " \t\n\x0b\f\r"

    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if is_ws(c):
            j = i
            while j < n and is_ws(text[j]):
                j += 1
            run = text[i:j]
            if j >= n:
                out.append(run)  # trailing run, whole
            elif run[-1] == " ":
                if len(run) > 1:
                    out.append(run[:-1])
                out.append(" " + _take_class_run(text, j))
                j += len(out[-1]) - 1
            else:
                if len(run) > 1:
                    out.append(run[:-1])
                out.append(run[-1])
            i = j
        else:
            tok = _take_class_run(text, i)
            out.append(tok)
            i += len(tok)
    return out


def _take_class_run(text: str, i: int) -> str:
    """The maximal same-class (letter / number / other) run at i.
    Run termination uses the same ASCII whitespace set as
    :func:`byte_pretokenize` — Unicode whitespace (NBSP, U+2028) is
    NOT ``\\s`` to Java/RE2, so it belongs to (and extends) the
    punctuation class run."""
    import unicodedata

    def k(c: str) -> str:
        cat = unicodedata.category(c)
        if cat.startswith("L"):
            return "L"
        if cat.startswith("N"):
            return "N"
        return "P"

    kind = k(text[i])
    j = i + 1
    while (
        j < len(text)
        and text[j] not in " \t\n\x0b\f\r"
        and k(text[j]) == kind
    ):
        j += 1
    return text[i:j]


def bpe_bytelevel_counts(
    docs: DataFrame,
    merges: Sequence[Merge] = DEFAULT_BYTE_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BYTE-level tokenizer-exact counts: one row per
    input document with ``n_pretokens`` (regex pre-tokens, spaces
    attached GPT-2-style) and ``n_tokens`` (exact byte-level BPE tokens
    under ``merges``). Same scale shape as :func:`bpe_token_counts`:
    pre-tokenization runs JVM-side in codegen (regexp_extract_all),
    the merge loop runs ONCE per distinct pre-token (O(vocabulary),
    never O(corpus tokens)) in an Arrow ``mapInPandas``, counts join
    back (AQE broadcasts the vocabulary-sized frame), and one map-side
    combinable aggregate produces per-doc totals. ``explode_outer``
    keeps a null row for pre-token-free documents so they keep a zero
    row without a second doc-sized join."""
    merge_list = list(merges)

    pres = docs.select(
        id_col,
        F.explode_outer(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")),
                F.lit(PRETOKEN_PATTERN_JAVA),
                0,
            )
        ).alias("pre"),
    )
    vocab = pres.where(F.col("pre").isNotNull()).select("pre").distinct()

    def encode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "pre": pdf["pre"],
                    "pre_tokens": pdf["pre"].map(
                        lambda p: len(byte_bpe_segment(p, merge_list))
                    ),
                }
            )

    tok = vocab.mapInPandas(encode, schema="pre string, pre_tokens long")
    return (
        pres.join(tok, "pre", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("pre").isNotNull().cast("long"))
            .cast("bigint")
            .alias("n_pretokens"),
            F.sum(F.coalesce("pre_tokens", F.lit(0)))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


def byte_bpe_merge_sql(
    merges: Sequence[Merge] = DEFAULT_BYTE_MERGES,
) -> str:
    """DuckDB CTE fragment replaying the byte-level encode loop over
    the distinct-pre-token table ``vocab(pre)``: the initial symbol
    sequence is ``hex(encode(pre))`` split into 2-char (one-byte)
    symbols, then the shared rank-ordered merge replay. Emits CTEs
    ``enc`` and ``tok(pre, pre_tokens)``."""
    SEP = _SQL_SEP
    return _merge_cte_sql(
        merges,
        key_col="pre",
        init_expr=(
            f"'{SEP}' || regexp_replace(lower(hex(encode(pre))), "
            f"'(..)', '\\1{SEP}', 'g')"
        ),
        tokens_col="pre_tokens",
    )


def byte_pretokenize_sql(text_source: str = "documents") -> str:
    """DuckDB CTE chain computing GPT-2-style pre-tokens WITHOUT regex
    lookahead (RE2 has none): step 1 extracts maximal-run tokens with
    :data:`PRETOKEN_PATTERN_RE2`; step 2 replays the space attachment
    with one window pass (the three whitespace cases proved equivalent
    in byte_pretokenize's docstring). Emits ``pretok(doc_id, pre)``;
    pre-token-free documents simply have no rows (callers LEFT JOIN
    back to the doc table for zero rows)."""
    return f"""arr AS (
  SELECT doc_id,
    regexp_extract_all(coalesce(text, ''), '{PRETOKEN_PATTERN_RE2}') AS a
  FROM {text_source}
),
tk AS (
  SELECT doc_id, unnest(a) AS tok, generate_subscripts(a, 1) AS i
  FROM arr
),
adj AS (
  SELECT doc_id, i, tok,
    lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt,
    lag(tok)  OVER (PARTITION BY doc_id ORDER BY i) AS prv
  FROM tk
),
pieces AS (
  SELECT doc_id,
    CASE
      WHEN regexp_matches(tok, '^\\s+$') THEN
        CASE
          WHEN nxt IS NULL THEN [tok]
          WHEN substr(tok, length(tok), 1) = ' ' THEN
            CASE WHEN length(tok) > 1
                 THEN [substr(tok, 1, length(tok) - 1)]
                 ELSE CAST([] AS VARCHAR[]) END
          ELSE
            CASE WHEN length(tok) > 1
                 THEN [substr(tok, 1, length(tok) - 1),
                       substr(tok, length(tok), 1)]
                 ELSE [tok] END
        END
      ELSE
        [CASE WHEN prv IS NOT NULL
                   AND regexp_matches(prv, '^\\s+$')
                   AND substr(prv, length(prv), 1) = ' '
              THEN ' ' || tok ELSE tok END]
    END AS outs
  FROM adj
),
pretok AS (
  SELECT doc_id, unnest(outs) AS pre FROM pieces
)"""
