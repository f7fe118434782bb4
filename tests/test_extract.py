"""Extractor tests: per-lang grammar, sha256 lineage invariant
(BASELINE.json input_hint), Spark/pure-Python agreement."""

import hashlib

from pyspark.sql import functions as F

from ontologymatching_spark.operators import extract

PY = "import os\nclass FooBar:\n    pass\ndef do_thing():\n    return None\n"
JAVA = (
    "package org.x;\nimport com.a.b;\npublic class FooBar {\n}\n"
    "public static void doThing() {\n}\n"
)
SCALA = "import os\nclass FooBar {\n}\ndef doThing(): Unit = {}\n"


def test_parse_file_langs():
    for lang, content in [("python", PY), ("java", JAVA), ("scala", SCALA)]:
        parsed = extract.parse_file("r", "p", "c", lang, content)
        kinds = sorted(e["kind"] for e in parsed["entities"])
        assert kinds == ["class", "function"], lang
        assert len(parsed["imports"]) == 1, lang
        assert parsed["sha"] == hashlib.sha256(content.encode()).hexdigest()


def test_extract_triples_spark(spark, small_corpus):
    src_files, _ = small_corpus
    sf = spark.createDataFrame(src_files)
    triples = extract.extract_triples(sf)
    # Spark-side mapInPandas output == pure-Python reference, row for row
    got = triples.toPandas()
    want_rows = []
    for r in src_files.itertuples(index=False):
        want_rows.extend(
            extract.triples_from_file(r.repo, r.path, r.commit, r.lang, r.content)
        )
    assert len(got) == len(want_rows)
    key = ["subj", "pred", "obj"]
    got_set = set(map(tuple, got[key].values))
    want_set = {(r["subj"], r["pred"], r["obj"]) for r in want_rows}
    assert got_set == want_set


def test_sha256_invariant(spark, small_corpus):
    """Per-row invariant: emitted content_sha256 == sha2(content) of the
    source row, checked in Spark itself (F.sha2 vs hashlib in mapInPandas)."""
    src_files, _ = small_corpus
    sf = spark.createDataFrame(src_files)
    ents = extract.extract_entities(sf)
    src_sha = sf.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("expected_sha")
    )
    bad = (
        ents.join(src_sha, ["repo", "path"])
        .filter(F.col("content_sha256") != F.col("expected_sha"))
        .count()
    )
    assert bad == 0


def test_entities_from_triples_crosscheck(spark, small_corpus):
    src_files, _ = small_corpus
    sf = spark.createDataFrame(src_files)
    e1 = extract.extract_entities(sf).select("uri", "local_name", "kind")
    e2 = extract.entities_from_triples(extract.extract_triples(sf)).select(
        "uri", "local_name", "kind"
    )
    assert e1.exceptAll(e2).count() == 0
    assert e2.exceptAll(e1).count() == 0


def test_entity_ids_stable(spark, small_corpus):
    src_files, _ = small_corpus
    sf = spark.createDataFrame(src_files)
    e = extract.with_entity_ids(extract.extract_entities(sf))
    # deterministic: same uri → same id on recompute; ids unique per uri
    pdf = e.select("uri", "entity_id").toPandas()
    assert pdf.groupby("uri")["entity_id"].nunique().max() == 1
    assert pdf["entity_id"].min() >= 0  # 15 hex chars < 2^63, never negative


def test_parse_xml_grammar():
    xml = (
        '<module name="mod9">\n'
        '  <import module="other.mod"/>\n'
        '  <class name="FooBar"/>\n'
        '  <function name="do_thing"/>\n'
        "</module>\n"
    )
    parsed = extract.parse_file("r", "p.xml", "c", "xml", xml)
    kinds = sorted(e["kind"] for e in parsed["entities"])
    assert kinds == ["class", "function"]
    assert parsed["imports"] == ["other.mod"]
