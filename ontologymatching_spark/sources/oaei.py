"""OAEI alignment-format interop (SURVEY.md §2.1).

Reader: parses the OAEI RDF ``<Cell>`` format (and the TSV variants) into an
alignment DataFrame — capability parity with ReferenceAlignmentMatcher
(referenceAlignment/ReferenceAlignmentMatcher.java:41-50 formats, :228 OAEI
RDF parse). Writer: emits the ``<Cell>`` RDF (OAEIAlignmentFormat.java:30-43)
and TSV (TSVAlignmentFormat.java).

The RDF writer is deliberately driver-side (selected alignments are small
after 1-1 selection; SURVEY §2.1 "small driver-side XML writer only for
interop"); tables go to the lake via parquet/Iceberg, not XML.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_REL_MAP = {"=": "=", "<": "<", ">": ">", "%": "%", "?": "?"}


def write_oaei_rdf(alignment: DataFrame, path: str) -> None:
    """alignment(src_uri, dst_uri, sim[, rel]) → OAEI RDF file."""
    pdf = alignment.toPandas()
    rel_col = "rel" if "rel" in pdf.columns else None
    cells = []
    for r in pdf.itertuples(index=False):
        rel = getattr(r, "rel", "=") if rel_col else "="
        cells.append(
            "  <map><Cell>\n"
            f"    <entity1 rdf:resource=\"{escape(r.src_uri)}\"/>\n"
            f"    <entity2 rdf:resource=\"{escape(r.dst_uri)}\"/>\n"
            f"    <relation>{escape(rel)}</relation>\n"
            f"    <measure rdf:datatype=\"xsd:float\">{r.sim:.6f}</measure>\n"
            "  </Cell></map>"
        )
    doc = (
        "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n"
        "<rdf:RDF xmlns=\"http://knowledgeweb.semanticweb.org/heterogeneity/alignment\"\n"
        "         xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\"\n"
        "         xmlns:xsd=\"http://www.w3.org/2001/XMLSchema#\">\n"
        "<Alignment>\n<xml>yes</xml>\n<level>0</level>\n<type>11</type>\n"
        + "\n".join(cells)
        + "\n</Alignment>\n</rdf:RDF>\n"
    )
    with open(path, "w") as f:
        f.write(doc)


_NS = "{http://knowledgeweb.semanticweb.org/heterogeneity/alignment}"
_RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"


def read_oaei_rdf(spark: SparkSession, path: str) -> DataFrame:
    """OAEI RDF file → alignment(src_uri, dst_uri, rel, sim)."""
    tree = ET.parse(path)
    rows = []
    for cell in tree.iter(f"{_NS}Cell"):
        e1 = cell.find(f"{_NS}entity1").get(f"{_RDF}resource")
        e2 = cell.find(f"{_NS}entity2").get(f"{_RDF}resource")
        rel_el = cell.find(f"{_NS}relation")
        m_el = cell.find(f"{_NS}measure")
        rows.append(
            {
                "src_uri": e1,
                "dst_uri": e2,
                "rel": rel_el.text if rel_el is not None else "=",
                "sim": float(m_el.text) if m_el is not None else 1.0,
            }
        )
    pdf = pd.DataFrame(rows, columns=["src_uri", "dst_uri", "rel", "sim"])
    return spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame(
        [], "src_uri string, dst_uri string, rel string, sim double"
    )


def write_tsv(alignment: DataFrame, path: str) -> None:
    """TSV alignment dump (TSVAlignmentFormat.java): src \t dst \t sim."""
    alignment.select("src_uri", "dst_uri", "sim").toPandas().to_csv(
        path, sep="\t", index=False
    )


def read_tsv(spark: SparkSession, path: str) -> DataFrame:
    """TSV variants (ReferenceAlignmentMatcher formats): src \t dst [\t sim]."""
    pdf = pd.read_csv(path, sep="\t")
    cols = list(pdf.columns)
    pdf = pdf.rename(
        columns={cols[0]: "src_uri", cols[1]: "dst_uri"}
    )
    if len(cols) < 3:
        pdf["sim"] = 1.0
    else:
        pdf = pdf.rename(columns={cols[2]: "sim"})
    return spark.createDataFrame(pdf[["src_uri", "dst_uri", "sim"]])


def parse_old_oaei(spark: SparkSession, text: str) -> DataFrame:
    """Old-OAEI plain format: lines of '<uri1> <rel> <uri2>' (legacy variant
    dispatch, ReferenceAlignmentMatcher.java:190-217)."""
    rows = []
    for line in text.splitlines():
        m = re.match(r"^(\S+)\s+([=<>%?])\s+(\S+)$", line.strip())
        if m:
            rows.append(
                {"src_uri": m.group(1), "dst_uri": m.group(3),
                 "rel": m.group(2), "sim": 1.0}
            )
    pdf = pd.DataFrame(rows, columns=["src_uri", "dst_uri", "rel", "sim"])
    return spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame(
        [], "src_uri string, dst_uri string, rel string, sim double"
    )


def read_txt_alignment(
    spark: SparkSession, path: str, fmt: str = "ref2"
) -> DataFrame:
    """The reference's TXT reference-alignment variants
    (ReferenceAlignmentMatcher.java:44-47 format list; parsers
    parseRefFormat2:338-380, parseRefFormat3:388-414, parseRefFormat5:418-447):

      ref2: ``src\\tdst`` | ``src\\trel\\tdst`` | ``src\\trel\\tdst\\tsim``
            (NOTE: the reference's 4-field branch constructs the pair but
            never result.add()s it — an upstream bug we do NOT reproduce;
            the 4-field row is kept here)
      ref3: ``srcDesc\\tsrc\\t--->\\tdst\\tdstDesc`` or
            ``srcDesc\\tsrc\\tdst\\tdstDesc`` (Madison–Dane test case)
      ref5: ``src\\t--->\\tdst\\tsim\\trel[\\tprovenance]`` (AM export)

    → alignment(src_uri, dst_uri, rel, sim, provenance). Malformed lines are
    skipped, as in the reference."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            s = line.split("\t")
            if fmt == "ref2":
                if len(s) == 2:
                    rows.append((s[0].strip(), s[1].strip(), "=", 1.0, None))
                elif len(s) == 3:
                    rows.append((s[0].strip(), s[2].strip(), s[1].strip(), 1.0, None))
                elif len(s) == 4:
                    try:
                        sim = float(s[3])
                    except ValueError:
                        continue  # malformed sim → skip line, per docstring
                    rows.append(
                        (s[0].strip(), s[2].strip(), s[1].strip(), sim, None)
                    )
            elif fmt == "ref3":
                if len(s) == 5:
                    rows.append((s[1], s[3], "=", 1.0, None))
                elif len(s) == 4:
                    rows.append((s[1], s[2], "=", 1.0, None))
            elif fmt == "ref5":
                if (len(s) == 5 or len(s) == 6) and s[1] == "--->":
                    try:
                        sim = float(s[3])
                    except ValueError:
                        sim = 1.0
                    rel = s[4] if s[4] else "="
                    prov = s[5] if len(s) == 6 else None
                    rows.append((s[0], s[2], rel, sim, prov))
            else:
                raise ValueError(f"unknown TXT alignment format: {fmt!r}")
    schema = (
        "src_uri string, dst_uri string, rel string, sim double, "
        "provenance string"
    )
    return spark.createDataFrame(rows, schema)
