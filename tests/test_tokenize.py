"""Tokenizer-exact BPE: closed forms, an INDEPENDENT Sennrich
batch-apply reference (validating the one-merge-per-step equivalence
argument the oracle depends on), and the packing integration."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.tokenize import (
    DEFAULT_BPE_MERGES,
    bpe_segment,
    bpe_token_counts,
)


def _sennrich_apply(word: str, merges) -> list[str]:
    """Independent reference: the textbook apply step — find the
    lowest-rank pair PRESENT, merge ALL its occurrences left-to-right
    non-overlapping, repeat. Deliberately a different formulation from
    operators/tokenize.bpe_segment."""
    ranks: dict = {}
    for i, pair in enumerate(merges):
        ranks.setdefault(pair, i)  # real merge lists are duplicate-free
    seq = list(word)
    while True:
        pairs = {(seq[i], seq[i + 1]) for i in range(len(seq) - 1)}
        ranked = [p for p in pairs if p in ranks]
        if not ranked:
            return seq
        x, y = min(ranked, key=lambda p: ranks[p])
        out, i = [], 0
        while i < len(seq):
            if i < len(seq) - 1 and seq[i] == x and seq[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out


def test_bpe_segment_closed_forms():
    cases = {
        "table": ["table"],  # 4-deep cascade t,a -> ta,b -> tab + l,e -> le -> table
        "agg": ["a", "gg"],
        "scan": ["sca", "n"],  # s,c -> sc then sc,a -> sca
        "query": ["q", "u", "ery"],  # e,r -> er then er,y
        "value": ["va", "l", "u", "e"],  # l,e consumed the e? no: v,a wins first
        "a": ["a"],
        "": [],
        "ttaable": ["t", "ta", "a", "b", "le"],
    }
    for word, want in cases.items():
        assert bpe_segment(word, DEFAULT_BPE_MERGES) == want, word


def test_bpe_segment_matches_independent_sennrich_reference():
    """The equivalence claim in the module docstring, empirically: the
    one-merge-per-step loop == batch lowest-rank apply, over random
    words AND random merge lists (including merges of merged symbols)."""
    rng = random.Random(7)
    alphabet = "abcdegklorstuvy"
    for trial in range(300):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        assert bpe_segment(word, DEFAULT_BPE_MERGES) == _sennrich_apply(
            word, DEFAULT_BPE_MERGES
        ), word
    # random rule lists: grow symbols by merging previous outputs
    for trial in range(60):
        symbols = list("abcd")
        merges = []
        for _ in range(rng.randint(1, 8)):
            x, y = rng.choice(symbols), rng.choice(symbols)
            merges.append((x, y))
            symbols.append(x + y)
        for _ in range(10):
            word = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12)))
            assert bpe_segment(word, merges) == _sennrich_apply(word, merges), (
                word,
                merges,
            )


def test_bpe_token_counts_operator_keeps_zero_word_docs(spark):
    docs = spark.createDataFrame(
        [(1, "table table agg"), (2, ""), (3, "   "), (4, "scan")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_token_counts(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert (rows[1]["n_words"], rows[1]["n_tokens"]) == (3, 4)  # 1+1+2
    assert (rows[2]["n_words"], rows[2]["n_tokens"]) == (0, 0)
    assert (rows[3]["n_words"], rows[3]["n_tokens"]) == (0, 0)
    assert (rows[4]["n_words"], rows[4]["n_tokens"]) == (1, 2)


def test_bpe_pack_docs_integration(spark, tmp_path):
    """Packing budgeted in exact tokens: replay the offset-bin rule in
    Python from per-doc exact counts and demand identical packs."""
    from vacancy_gpt_etl_pipeline_spark.queries import (
        _BPE_PACK_TARGET,
        REGISTRY,
    )

    rng = random.Random(23)
    vocab = ["table", "agg", "scan", "query", "value", "stream", "group"]
    n = 120
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(n)
    ]
    sources = [f"s{rng.randint(0, 3)}" for _ in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = {
        (r["source"], r["pack_id"]): (r["n_docs"], r["pack_tokens"])
        for r in REGISTRY["bpe_pack_docs"].spark(spark, str(tmp_path)).collect()
    }

    # python replay
    def tok_count(text):
        return sum(
            len(bpe_segment(w, DEFAULT_BPE_MERGES))
            for w in text.split(" ")
            if w
        )

    per_src: dict[str, list[tuple[int, int]]] = {}
    for i in range(n):
        c = tok_count(texts[i])
        if c > 0:
            per_src.setdefault(sources[i], []).append((i, c))
    want: dict[tuple[str, int], list[int]] = {}
    for src, docs in per_src.items():
        cum = 0
        for doc_id, c in sorted(docs):
            pack = cum // _BPE_PACK_TARGET
            want.setdefault((src, pack), []).append(c)
            cum += c
    want_agg = {k: (len(v), sum(v)) for k, v in want.items()}
    assert got == want_agg
    # conservation: every token lands in exactly one pack
    assert sum(t for _, t in got.values()) == sum(
        c for docs in per_src.values() for _, c in docs
    )
    # pack ids are contiguous from 0 within each source
    for src in per_src:
        ids = sorted(p for s, p in got if s == src)
        assert ids == list(range(len(ids)))


# --- Byte-level tier (GPT-2 family) -----------------------------------------

from vacancy_gpt_etl_pipeline_spark.operators.tokenize import (  # noqa: E402
    DEFAULT_BYTE_MERGES,
    PRETOKEN_PATTERN_JAVA,
    byte_bpe_merge_sql,
    byte_bpe_segment,
    byte_pretokenize,
    byte_pretokenize_sql,
    bpe_bytelevel_counts,
)

TRICKY_TEXTS = [
    "he said  привет 42!",
    "a\n b",
    "a \nb",
    "  lead",
    "trail  ",
    "",
    "it's a test",
    "x\t\ty",
    "a \n b",
    " ",
    "\n",
    "a  \n",
    "the theatre and in 1999",
    "многа букф 123",
    "a|b || c",
    "\n\n\nx",
    "  双语 mixed 中文 ",
    "eéиx",
    # non-ASCII whitespace: NBSP / U+2028 are NOT \s to Java or RE2 —
    # they classify as punctuation and EXTEND a [^\s\p{L}\p{N}]+ run
    # (the r10 ADVICE divergence; the Python reference now follows)
    "a b",
    "x  !y",
    "  z",
    "p q  ",
]


def _gpt2_bpe_reference(token: str, merges) -> list[str]:
    """Independent reference: the PUBLISHED GPT-2 bpe() formulation
    (Radford et al. 2019 release, encoder.py) — compute the set of
    adjacent pairs, merge ALL occurrences of the minimum-rank pair in
    one rebuild pass, repeat until no ranked pair remains. Deliberately
    a different formulation from operators/tokenize._merge_loop."""
    ranks = {}
    for i, pair in enumerate(merges):
        ranks.setdefault(pair, i)
    word = [f"{b:02x}" for b in token.encode("utf-8")]
    while len(word) > 1:
        pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
        candidate = min(
            pairs, key=lambda p: ranks.get(p, float("inf"))
        )
        if candidate not in ranks:
            break
        first, second = candidate
        new_word, i = [], 0
        while i < len(word):
            if (
                i < len(word) - 1
                and word[i] == first
                and word[i + 1] == second
            ):
                new_word.append(first + second)
                i += 2
            else:
                new_word.append(word[i])
                i += 1
        word = new_word
    return word


def test_byte_pretokenize_closed_forms():
    cases = {
        "he said  привет 42!": ["he", " said", " ", " привет", " 42", "!"],
        "a\n b": ["a", "\n", " b"],
        "a \nb": ["a", " ", "\n", "b"],  # run ends non-space: no attach
        "  lead": [" ", " lead"],
        "trail  ": ["trail", "  "],
        "": [],
        " ": [" "],
        "it's": ["it", "'", "s"],  # contraction alternatives omitted
    }
    for text, want in cases.items():
        assert byte_pretokenize(text) == want, repr(text)


def test_byte_pretokenize_matches_spark_java_regex(spark):
    """The Python scanner (spec implemented by hand) and Spark's Java
    regex (lookahead form) must agree token-for-token."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY_TEXTS)],
        "doc_id int, text string",
    )
    rows = df.select(
        "doc_id",
        F.regexp_extract_all(
            F.coalesce("text", F.lit("")),
            F.lit(PRETOKEN_PATTERN_JAVA),
            0,
        ).alias("a"),
    ).collect()
    got = {r.doc_id: r.a for r in rows}
    for i, t in enumerate(TRICKY_TEXTS):
        assert got[i] == byte_pretokenize(t), repr(t)


def test_byte_pretokenize_sql_two_step_matches_python():
    """The RE2 two-step (no lookahead) replays the Java semantics —
    the lookahead-elimination argument, checked empirically."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(TRICKY_TEXTS))
    )
    sql = (
        "WITH "
        + byte_pretokenize_sql()
        + " SELECT doc_id, list(pre) FROM pretok GROUP BY doc_id"
    )
    got = dict(con.execute(sql).fetchall())
    for i, t in enumerate(TRICKY_TEXTS):
        assert sorted(got.get(i, [])) == sorted(byte_pretokenize(t)), repr(t)


def test_byte_bpe_segment_matches_published_gpt2_formulation():
    """Fixture corpus + random strings encode identically under the
    one-merge-per-step loop and the published all-occurrences-of-min-
    rank GPT-2 formulation."""
    import random

    pres = {p for t in TRICKY_TEXTS for p in byte_pretokenize(t)}
    rng = random.Random(42)
    alphabet = "abdehinorst 19и双"
    for _ in range(200):
        pres.add(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        )
    for p in sorted(pres):
        assert byte_bpe_segment(p, DEFAULT_BYTE_MERGES) == _gpt2_bpe_reference(
            p, DEFAULT_BYTE_MERGES
        ), repr(p)


def test_byte_bpe_cross_codepoint_merge():
    """The d0+b8 rule merges INSIDE the two-byte UTF-8 encoding of 'и'
    — the case a word/char-level tier cannot express."""
    seg = byte_bpe_segment("и", DEFAULT_BYTE_MERGES)
    assert seg == ["d0b8"]
    assert byte_bpe_segment(" the", DEFAULT_BYTE_MERGES) == ["20746865"]


def test_byte_bpe_oracle_cte_matches_segment():
    import duckdb

    pres = sorted(
        {p for t in TRICKY_TEXTS for p in byte_pretokenize(t)}
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE vocab AS SELECT unnest(?) AS pre", [pres])
    sql = (
        "WITH RECURSIVE "
        + byte_bpe_merge_sql()
        + " SELECT pre, pre_tokens FROM tok"
    )
    got = dict(con.execute(sql).fetchall())
    for p in pres:
        assert got[p] == len(byte_bpe_segment(p, DEFAULT_BYTE_MERGES)), repr(p)


def test_bpe_bytelevel_counts_operator(spark):
    texts = TRICKY_TEXTS + [None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.n_pretokens, r.n_tokens)
        for r in bpe_bytelevel_counts(df).collect()
    }
    assert len(got) == len(texts)  # every doc keeps a row, incl null/empty
    for i, t in enumerate(texts):
        pres = byte_pretokenize(t or "")
        want = (
            len(pres),
            sum(len(byte_bpe_segment(p, DEFAULT_BYTE_MERGES)) for p in pres),
        )
        assert got[i] == want, repr(t)
    assert got[5] == (0, 0)  # "" keeps a zero row
    assert got[len(texts) - 1] == (0, 0)  # NULL text keeps a zero row


def test_bpe_bytelevel_pack_conservation(spark, sf_dir):
    """Byte-level packing twin: every token lands in exactly one pack,
    pack ids are contiguous per source, counts replay the pure-Python
    encode."""
    from vacancy_gpt_etl_pipeline_spark.queries import (
        _BPE_PACK_TARGET,
        bpe_bytelevel_pack,
    )

    got = {
        (r.source, r.pack_id): (r.n_docs, r.pack_tokens)
        for r in bpe_bytelevel_pack(spark, sf_dir).collect()
    }
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )

    def tok_count(text):
        return sum(
            len(byte_bpe_segment(p, DEFAULT_BYTE_MERGES))
            for p in byte_pretokenize(text or "")
        )

    per_src: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        c = tok_count(r.text)
        if c > 0:
            per_src.setdefault(r.source, []).append((r.doc_id, c))
    want: dict[tuple[str, int], list[int]] = {}
    for src, dd in per_src.items():
        cum = 0
        for doc_id, c in sorted(dd):
            want.setdefault((src, cum // _BPE_PACK_TARGET), []).append(c)
            cum += c
    assert got == {k: (len(v), sum(v)) for k, v in want.items()}
    assert sum(t for _, t in got.values()) == sum(
        c for dd in per_src.values() for _, c in dd
    )


# --- merge LEARNING (the full Sennrich loop) --------------------------------


def _sennrich_learn(word_freqs: dict, n: int) -> list:
    """Independent reference for the LEARN loop: the textbook
    get_stats / merge_vocab formulation over symbol TUPLES (Sennrich
    ACL'16 learn_bpe) with the engine's pinned tie-break (count DESC,
    then lexicographically smallest pair). Deliberately a different
    formulation from operators/tokenize.bpe_learn_merges' wrapped-
    string replace recurrence."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    out = []
    for _ in range(n):
        stats: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        x, y = min(stats, key=lambda p: (-stats[p], p[0], p[1]))
        out.append((x, y, stats[(x, y)]))
        nv: dict = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
                    merged.append(x + y)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            t = tuple(merged)
            nv[t] = nv.get(t, 0) + f
        vocab = nv
    return out


def _random_corpus(seed: int, n_docs: int = 40) -> list:
    rng = random.Random(seed)
    pool = (
        "spark scan shuffle sort merge join agg table tablet stream "
        "gg ggg aggregate row rows data dataset best bests sstt a ab"
    ).split()
    return [
        " ".join(rng.choice(pool) for _ in range(rng.randint(0, 12)))
        for _ in range(n_docs)
    ]


def test_bpe_learn_merges_matches_independent_sennrich(spark):
    """The Spark learn loop reproduces the textbook reference merge
    for merge on a random corpus — including doubled-letter (x == y)
    pairs, where non-overlapping all-occurrences semantics bite."""
    from vacancy_gpt_etl_pipeline_spark.operators.tokenize import (
        bpe_learn_merges,
    )

    texts = _random_corpus(13)
    wf: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_learn_merges(df, 14)
    assert got == _sennrich_learn(wf, 14)


def test_bpe_learn_merges_incremental_parity(spark):
    """The incremental-delta trainer returns IDENTICAL merge lists
    (pairs AND counts) to the full-recount baseline and the textbook
    reference on random corpora — including doubled-letter pairs and a
    checkpoint interval small enough to exercise mid-loop lineage
    truncation."""
    from vacancy_gpt_etl_pipeline_spark.operators.tokenize import (
        bpe_learn_merges,
        bpe_learn_merges_incremental,
    )

    for seed in (13, 47):
        texts = _random_corpus(seed)
        wf: dict = {}
        for t in texts:
            for w in t.split(" "):
                if w:
                    wf[w] = wf.get(w, 0) + 1
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        inc = bpe_learn_merges_incremental(df, 14, checkpoint_every=3)
        assert inc == _sennrich_learn(wf, 14), seed
        assert inc == bpe_learn_merges(df, 14), seed


def test_bpe_train_sql_matches_independent_sennrich():
    """The unrolled DuckDB training recurrence reproduces the same
    reference on the same random corpus — so Spark and oracle agree
    via a THIRD independent formulation, not with each other only."""
    import duckdb

    from vacancy_gpt_etl_pipeline_spark.operators.tokenize import (
        bpe_train_sql,
    )

    texts = _random_corpus(29)
    wf: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
    sql = (
        "WITH "
        + bpe_train_sql(14)
        + " SELECT left_sym, right_sym, pair_count FROM learned ORDER BY rank"
    )
    got = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == _sennrich_learn(wf, 14)


def test_learned_merges_feed_encode(spark):
    """Train → encode integration: token counts under the LEARNED
    list equal an independent replay (segment each distinct word with
    the published batch formulation, weight by frequency)."""
    from vacancy_gpt_etl_pipeline_spark.operators.tokenize import (
        bpe_learn_merges,
        bpe_segment,
        bpe_token_counts,
    )

    texts = _random_corpus(41, n_docs=25)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    learned = bpe_learn_merges(df, 10)
    merges = [(x, y) for x, y, _ in learned]
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in bpe_token_counts(df, merges=merges).collect()
    }
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        want = sum(len(_sennrich_apply(w, merges)) for w in words)
        assert got[i] == (len(words), want), (i, t)
