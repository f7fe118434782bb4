"""ontologymatching_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the capabilities of the Harmenius/OntologyMatching
reference (AgreementMaker ontology-matching core + skip-gram companion),
re-targeted at an Iceberg/parquet lake of source-code repositories.

Pipeline (see SURVEY.md for the full blueprint):

    src_files(repo, path, commit, lang, content)
      → extract   : per-file batched Arrow UDF → (subj, pred, obj) triples + entities
      → block     : candidate-pair generation (normalized-name / token / shingle keys,
                    salted hot keys, per-block caps)   [replaces the reference's
                    O(n·m) cartesian alignNodesOneByOne]
      → match     : BSM tier cascade, PSM weighted AMSub+Edit, VMM TF-IDF cosine
      → combine   : LWC quality-weighted average
      → select    : stable-marriage / greedy 1-1 (scanMatrix semantics)
      → components: hash-min connected-components canonicalization
      → materialize: nodes/edges with per-partition lineage + sha256 invariants

Everything is DataFrame-first; Python appears only in vectorized pandas/Arrow
UDFs (string-similarity kernels, per-file parsing, per-component assignment).
"""

__version__ = "0.1.0"
