"""Mojibake (UTF-8-decoded-as-Latin-1) repair — closed forms, the
damage/repair round-trip property, false-positive guards, and the
planted-defect registry query."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.functions.text import (
    MOJIBAKE_ALPHABET,
    MOJIBAKE_REPAIRS,
    fix_mojibake,
    mojibake_repair_sql,
)


def _py_repair(s: str) -> str:
    for bad, good in MOJIBAKE_REPAIRS:
        s = s.replace(bad, good)
    return s


def test_repair_table_derivation():
    """Every damaged form IS the codepoint's UTF-8 bytes read as
    Latin-1, length 2, lead/tail ranges disjoint (no cascades)."""
    for bad, good in MOJIBAKE_REPAIRS:
        assert bad == good.encode("utf-8").decode("latin-1")
        assert len(bad) == 2 and len(good) == 1


def test_roundtrip_property_python():
    """damage(clean) then repair == clean, for random strings mixing
    ASCII and the repair alphabet."""
    rng = random.Random(9)
    pool = "abc XYZ 123 " + MOJIBAKE_ALPHABET
    for _ in range(300):
        clean = "".join(
            rng.choice(pool) for _ in range(rng.randint(0, 40))
        )
        damaged = clean.encode("utf-8").decode("latin-1")
        assert _py_repair(damaged) == clean, repr(clean)


def test_ascii_and_already_clean_text_untouched():
    for s in ("plain ascii", "", "café déjà vu", "привет", "x Ã x"):
        # single repaired chars (é, и, ...) are NOT two-char damage
        # sequences; a bare Ã not followed by a tail char stays put
        assert _py_repair(s) == s, repr(s)


def test_spark_repair_matches_python(spark):
    rng = random.Random(11)
    pool = "word table " + MOJIBAKE_ALPHABET
    cleans = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 30)))
        for _ in range(50)
    ]
    damaged = [c.encode("utf-8").decode("latin-1") for c in cleans]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(damaged)], "i int, t string"
    )
    got = {
        r.i: r.fixed
        for r in df.select("i", fix_mojibake("t").alias("fixed")).collect()
    }
    for i, clean in enumerate(cleans):
        assert got[i] == clean, repr(clean)


def test_duckdb_chain_matches_python():
    import duckdb

    rng = random.Random(13)
    pool = "scan sört " + MOJIBAKE_ALPHABET
    cleans = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 30)))
        for _ in range(50)
    ]
    damaged = [c.encode("utf-8").decode("latin-1") for c in cleans]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, txt VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(damaged)))
    sql = f"SELECT i, {mojibake_repair_sql('txt')} FROM t"
    got = dict(con.execute(sql).fetchall())
    for i, clean in enumerate(cleans):
        assert got[i] == clean, repr(clean)


def test_fix_mojibake_docs_planted_defects(spark, sf_dir):
    """The registry query: every third doc gets planted damage; repairs
    are counted exactly (2 chars -> 1 per repair) and non-planted docs
    report zero repairs and unchanged text."""
    from vacancy_gpt_etl_pipeline_spark.queries import fix_mojibake_docs

    out = fix_mojibake_docs(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert len(out) == len(docs)
    n_repaired_docs = 0
    for r in out:
        orig = docs[r.doc_id]
        if r.doc_id % 3 != 0:
            assert r.n_repairs == 0
            assert r.text_fixed == orig
        else:
            # repair restores the accented planted forms exactly once
            expect = orig
            for word, accented in (
                ("value", "válue"),
                ("table", "täble"),
                ("sort", "sört"),
                ("line", "líne"),
                ("merge", "mиrge"),
            ):
                expect = expect.replace(word, accented)
            assert r.text_fixed == expect, r.doc_id
            assert r.n_repairs == sum(
                orig.count(w)
                for w in ("value", "table", "sort", "line", "merge")
            ), r.doc_id
            if r.n_repairs:
                n_repaired_docs += 1
    assert n_repaired_docs > 0  # the planting actually planted


def test_repair_output_cannot_cascade_into_later_rule():
    """r10 ADVICE: 'Ñ' is both a repair OUTPUT (Latin Ñ) and the LEAD
    of the Cyrillic U+0440..U+044F damaged forms. With Cyrillic rules
    ordered first, the pathological input Ã+U+0091+U+008F (damaged Ñ
    followed by a stray tail byte) must repair to Ñ+U+008F — NOT
    cascade into 'я'."""
    pathological = "Ã\x91\x8f"
    assert _py_repair(pathological) == "Ñ\x8f"
    # and the ordering invariant itself: no repair output equals the
    # lead of any LATER rule
    for k, (_, good) in enumerate(MOJIBAKE_REPAIRS):
        assert all(
            bad2[0] != good for bad2, _ in MOJIBAKE_REPAIRS[k + 1 :]
        ), good


def test_cyrillic_and_latin_repairs_both_roundtrip():
    """Reordering must not regress either family's repair."""
    for clean in ("Ñандарин", "Español Ñ", "привет Ñ мир", "яяя ÑÑÑ"):
        damaged = clean.encode("utf-8").decode("latin-1")
        assert _py_repair(damaged) == clean, repr(clean)
