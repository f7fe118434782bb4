"""Tests: lexicon/LSM and OAEI alignment interop round-trips."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.operators import lexicon
from ontologymatching_spark.sources import oaei


def test_build_lexicon_and_lsm(spark):
    src_e = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_id": [1, 2],
                "local_name": ["ParseTable", "loadConfig"],
                "norm_name": ["parse table", "load config"],
                "stem_name": ["pars tabl", "load config"],
            }
        )
    )
    dst_e = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_id": [10, 20],
                "local_name": ["parse_table", "unrelatedThing"],
                "norm_name": ["parse table", "unrelated thing"],
                "stem_name": ["pars tabl", "unrel thing"],
            }
        )
    )
    ls = lexicon.build_lexicon(src_e)
    ld = lexicon.build_lexicon(dst_e)
    out = lexicon.lsm(ls, ld, synonym_weight=0.95).toPandas()
    got = {(r.src_id, r.dst_id): r.sim_lsm for r in out.itertuples()}
    assert got == {(1, 10): 0.95}


def test_lexicon_mined_from_links(spark):
    e = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_id": [1],
                "local_name": ["mod7"],
                "norm_name": ["mod7"],
                "stem_name": ["mod7"],
            }
        )
    )
    links = spark.createDataFrame(
        pd.DataFrame({"mention_id": [100], "entity_id": [1]})
    )
    mentions = spark.createDataFrame(
        pd.DataFrame({"mention_id": [100], "label": ["Mod7Alias"]})
    )
    lex = lexicon.build_lexicon(e, links, mentions).toPandas()
    assert "mod7alias" in set(lex["term"])


def test_oaei_rdf_roundtrip(spark, tmp_path):
    align = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_uri": ["a/x#class/A", "a/y#function/b"],
                "dst_uri": ["b/x#class/A2", "b/y#function/b2"],
                "sim": [0.95, 0.8],
                "rel": ["=", "="],
            }
        )
    )
    p = str(tmp_path / "align.rdf")
    oaei.write_oaei_rdf(align, p)
    back = oaei.read_oaei_rdf(spark, p).toPandas().sort_values("src_uri")
    orig = align.toPandas().sort_values("src_uri")
    assert list(back["src_uri"]) == list(orig["src_uri"])
    assert list(back["dst_uri"]) == list(orig["dst_uri"])
    assert [round(v, 6) for v in back["sim"]] == [round(v, 6) for v in orig["sim"]]


def test_tsv_roundtrip_and_old_oaei(spark, tmp_path):
    align = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_uri": ["u1", "u2"],
                "dst_uri": ["v1", "v2"],
                "sim": [1.0, 0.75],
            }
        )
    )
    p = str(tmp_path / "a.tsv")
    oaei.write_tsv(align, p)
    back = oaei.read_tsv(spark, p).toPandas().sort_values("src_uri")
    assert list(back["dst_uri"]) == ["v1", "v2"]

    old = oaei.parse_old_oaei(spark, "u1 = v1\nu2 < v2\njunk line\n").toPandas()
    assert len(old) == 2
    assert set(old["rel"]) == {"=", "<"}


def test_read_txt_alignment_variants(spark, tmp_path):
    from ontologymatching_spark.sources.oaei import read_txt_alignment

    # ref2: all three arities (the 4-field row IS kept — documented
    # deviation from the reference's missing result.add)
    p2 = tmp_path / "ref2.txt"
    p2.write_text("a\tb\nc\t<\td\ne\t>\tf\t0.7\n")
    got = {
        (r.src_uri, r.dst_uri, r.rel, r.sim)
        for r in read_txt_alignment(spark, str(p2), "ref2").collect()
    }
    assert got == {("a", "b", "=", 1.0), ("c", "d", "<", 1.0),
                   ("e", "f", ">", 0.7)}

    # ref3: 5-field (with arrow) and 4-field rows
    p3 = tmp_path / "ref3.txt"
    p3.write_text("sd\tsrc1\t--->\tdst1\tdd\nsd\tsrc2\tdst2\tdd\n")
    got3 = {
        (r.src_uri, r.dst_uri)
        for r in read_txt_alignment(spark, str(p3), "ref3").collect()
    }
    assert got3 == {("src1", "dst1"), ("src2", "dst2")}

    # ref5: AM export with and without provenance; unparseable sim -> 1.0
    p5 = tmp_path / "ref5.txt"
    p5.write_text("s1\t--->\td1\t0.9\t=\nsx\t--->\tdx\tNaNish\t=\tbsm\n")
    rows5 = {
        (r.src_uri, r.dst_uri, r.sim, r.provenance)
        for r in read_txt_alignment(spark, str(p5), "ref5").collect()
    }
    assert rows5 == {("s1", "d1", 0.9, None), ("sx", "dx", 1.0, "bsm")}

    with pytest.raises(ValueError):
        read_txt_alignment(spark, str(p5), "nope")
