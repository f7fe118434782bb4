"""Triple / entity extraction from source code — the analog of the reference's
ontology scan (`ontologyParser/OntoTreeBuilder.java:165-253,339-460`: parse a
document, walk declarations, build Node lists + edges).

One pure-Python per-file grammar (`parse_file`) is shared by:
  - the Spark path: ``extract_triples`` / ``extract_entities`` via
    ``mapInPandas`` (batched Arrow UDTF — one file row in, many rows out,
    SURVEY.md §2.9), and
  - the single-node oracle (oracle/matcher_oracle.py),
so both sides see byte-identical entities.

Lineage: every emitted row carries (repo, path, commit, content_sha256) — the
per-row invariant required by BASELINE.json `input_hint` (sha256(content)
equality vs the source row).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

# --- per-lang grammars (intentionally regular; corpus/generator.py renders
# exactly these surface forms) -------------------------------------------------

_GRAMMARS: dict[str, list[tuple[str, re.Pattern]]] = {
    "python": [
        ("class", re.compile(r"^class (\w+):")),
        ("function", re.compile(r"^def (\w+)\(")),
        ("import", re.compile(r"^import ([\w.]+)")),
    ],
    "java": [
        ("class", re.compile(r"^public class (\w+)")),
        ("function", re.compile(r"^public static void (\w+)\(")),
        ("import", re.compile(r"^import ([\w.]+);")),
    ],
    "scala": [
        ("class", re.compile(r"^(?:class|object|trait) (\w+)")),
        ("function", re.compile(r"^def (\w+)\(")),
        ("import", re.compile(r"^import ([\w.]+)")),
    ],
    # generic XML tree (XmlTreeBuilder analog, ontologyParser/XmlTreeBuilder
    # .java — the reference also reads non-code ontology encodings)
    "xml": [
        ("class", re.compile(r"^\s*<class name=\"(\w+)\"\s*/?>")),
        ("function", re.compile(r"^\s*<function name=\"(\w+)\"\s*/?>")),
        ("import", re.compile(r"^\s*<import module=\"([\w.]+)\"\s*/?>")),
    ],
}


def entity_uri(repo: str, path: str, kind: str, name: str) -> str:
    return f"{repo}/{path}#{kind}/{name}"


def module_uri(repo: str, path: str) -> str:
    return f"{repo}/{path}"


def module_name(path: str) -> str:
    """File stem: 'src/util/mod003.py' → 'mod003'."""
    base = path.rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[0] if "." in base else base


def parse_file(repo: str, path: str, commit: str, lang: str, content: str) -> dict:
    """Parse one file → {'entities': [...], 'imports': [...], 'sha': hex}."""
    sha = hashlib.sha256(content.encode()).hexdigest()
    grammar = _GRAMMARS.get(lang, _GRAMMARS["python"])
    entities: list[dict] = []
    imports: list[str] = []
    seen: set[tuple[str, str]] = set()
    for line in content.split("\n"):
        for kind, rx in grammar:
            m = rx.match(line)
            if not m:
                continue
            name = m.group(1)
            if kind == "import":
                imports.append(name)
            elif (kind, name) not in seen:
                seen.add((kind, name))
                entities.append({"kind": kind, "name": name})
            break
    return {"entities": entities, "imports": imports, "sha": sha}


def triples_from_file(repo: str, path: str, commit: str, lang: str,
                      content: str) -> list[dict]:
    """(subj, pred, obj) triples + lineage for one file (FIXTURES.md §2)."""
    parsed = parse_file(repo, path, commit, lang, content)
    mod = module_uri(repo, path)
    lineage = {
        "repo": repo,
        "path": path,
        "commit": commit,
        "content_sha256": parsed["sha"],
    }
    out: list[dict] = [
        {"subj": mod, "pred": "hasName", "obj": module_name(path), **lineage},
        {"subj": mod, "pred": "hasKind", "obj": "module", **lineage},
    ]
    for e in parsed["entities"]:
        uri = entity_uri(repo, path, e["kind"], e["name"])
        out.append({"subj": mod, "pred": "declares", "obj": uri, **lineage})
        out.append({"subj": uri, "pred": "hasName", "obj": e["name"], **lineage})
        out.append({"subj": uri, "pred": "hasKind", "obj": e["kind"], **lineage})
    for imp in parsed["imports"]:
        out.append({"subj": mod, "pred": "imports", "obj": imp, **lineage})
    return out


TRIPLE_SCHEMA = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("content_sha256", StringType()),
    ]
)

ENTITY_SCHEMA = StructType(
    [
        StructField("uri", StringType()),
        StructField("local_name", StringType()),
        StructField("kind", StringType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("content_sha256", StringType()),
    ]
)

_TRIPLE_COLS = [f.name for f in TRIPLE_SCHEMA.fields]
_ENTITY_COLS = [f.name for f in ENTITY_SCHEMA.fields]


def extract_triples(src_files: DataFrame) -> DataFrame:
    """src_files → triples, batched per Arrow batch (mapInPandas)."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                rows.extend(
                    triples_from_file(r.repo, r.path, r.commit, r.lang, r.content)
                )
            yield pd.DataFrame(rows, columns=_TRIPLE_COLS)

    return src_files.select("repo", "path", "commit", "lang", "content").mapInPandas(
        emit, schema=TRIPLE_SCHEMA
    )


def extract_entities(src_files: DataFrame) -> DataFrame:
    """src_files → entities(uri, local_name, kind, lineage…)."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                parsed = parse_file(r.repo, r.path, r.commit, r.lang, r.content)
                lineage = {
                    "repo": r.repo,
                    "path": r.path,
                    "commit": r.commit,
                    "content_sha256": parsed["sha"],
                }
                rows.append(
                    {
                        "uri": module_uri(r.repo, r.path),
                        "local_name": module_name(r.path),
                        "kind": "module",
                        **lineage,
                    }
                )
                for e in parsed["entities"]:
                    rows.append(
                        {
                            "uri": entity_uri(r.repo, r.path, e["kind"], e["name"]),
                            "local_name": e["name"],
                            "kind": e["kind"],
                            **lineage,
                        }
                    )
            yield pd.DataFrame(rows, columns=_ENTITY_COLS)

    return src_files.select("repo", "path", "commit", "lang", "content").mapInPandas(
        emit, schema=ENTITY_SCHEMA
    )


def entities_from_triples(triples: DataFrame) -> DataFrame:
    """Alternative derivation: rebuild the entities table from the triples
    table (pure DataFrame ops) — used to cross-check the extractor."""
    names = triples.filter(F.col("pred") == "hasName").select(
        F.col("subj").alias("uri"),
        F.col("obj").alias("local_name"),
        "repo", "path", "commit", "content_sha256",
    )
    kinds = triples.filter(F.col("pred") == "hasKind").select(
        F.col("subj").alias("uri"), F.col("obj").alias("kind")
    )
    return names.join(kinds, "uri")


def with_entity_ids(entities: DataFrame) -> DataFrame:
    """Stable 63-bit entity id from the URI (deterministic across runs and
    parallelism levels — the reference's dense `Node.index` is insertion-order
    based, AMNode.java:50-106, which is not reproducible under parallelism;
    a content-derived id is)."""
    return entities.withColumn(
        "entity_id",
        F.conv(F.substring(F.sha2(F.col("uri"), 256), 1, 15), 16, 10).cast("long"),
    )
