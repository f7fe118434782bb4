"""Deterministic synthetic source-code corpus + gold alignment (FIXTURES.md §4).

Produces the primary input table ``src_files(repo, path, commit, lang,
content)`` and the ``gold(src_uri, dst_uri, rel, sim, tier)`` table. Every
value derives from ``numpy.random.default_rng(seed)`` / sha256 of stable keys,
so regeneration is bit-identical.

The corpus mirrors the reference's test design (SURVEY.md §5): entity aliases
are planted across repos with controlled perturbation *tiers* that exercise the
BSM cascade exactly (BaseSimilarityMatcher.java:292-355):

  tier 1  exact name copy                    → expected sim 1.00
  tier 2  case/underscore restyle            → expected sim 0.95
  tier 3  plural / gerund (stem-equal)       → expected sim 0.90
  tier 4  digit suffix                       → expected sim 0.80
  tier 5  one-char typo (PSM-only territory) → amsub_edit ≳ 0.75

Hot-key skew (FIXTURES.md §3.7): ~30% of files also declare one of
``main/utils/test/config`` so the blocking stage sees hot keys.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# ~120 code-flavored word stems; names compose 2-3 of these (Zipf-weighted),
# giving a few thousand distinct identifier combinations.
WORDS = (
    "parse load store fetch read write scan merge sort hash join filter map "
    "reduce batch stream buffer cache index table row column key value node "
    "edge graph tree list set dict queue stack heap task job stage plan query "
    "engine driver worker client server socket http file path dir config util "
    "helper manager handler builder factory adapter proxy wrapper context "
    "session token auth user group role event log metric trace span error "
    "result status state flag mode type kind name label text string number "
    "count total sum avg min max rate time date clock timer schedule cron "
    "lock mutex atomic thread pool channel signal message packet frame block "
    "chunk segment part record field schema format codec encode decode "
    "compress archive backup restore sync async remote local global shared"
).split()

HOT_NAMES = ["main", "utils", "test", "config"]

LANGS = ["python", "java", "scala"]


def _sha_hex(*parts: str) -> str:
    return hashlib.sha256("|".join(parts).encode()).hexdigest()


def _snake(words: list[str]) -> str:
    return "_".join(words)


def _camel(words: list[str]) -> str:
    return words[0] + "".join(w.capitalize() for w in words[1:])


def _pascal(words: list[str]) -> str:
    return "".join(w.capitalize() for w in words)


def _pluralize(w: str) -> str:
    if w.endswith("s"):
        return w + "es"
    if w.endswith("y"):
        return w[:-1] + "ies"
    return w + "s"


def _gerund(w: str) -> str:
    if w.endswith("e") and len(w) > 2:
        return w[:-1] + "ing"
    return w + "ing"


@dataclass
class Entity:
    kind: str  # class | function
    name: str  # surface name as it appears in code


@dataclass
class FileSpec:
    repo: str
    path: str
    lang: str
    entities: list[Entity] = field(default_factory=list)
    imports: list[str] = field(default_factory=list)


def _perturb(words: list[str], tier: int, rng: np.random.Generator,
             kind: str, lang: str) -> str:
    """Render a perturbed alias name for the given tier."""
    w = list(words)
    if tier == 3:
        i = int(rng.integers(0, len(w)))
        w[i] = _pluralize(w[i]) if rng.random() < 0.5 else _gerund(w[i])
    styled = _style(w, kind, lang)
    if tier == 2:
        # restyle: snake <-> camel flip is achieved by rendering for the other
        # convention; additionally randomize one char's case boundary.
        alt = _snake(w) if styled != _snake(w) else _camel(w)
        styled = alt
    elif tier == 4:
        styled = styled + str(int(rng.integers(2, 10)))
    elif tier == 5:
        # one-char substitution not at position 0
        if len(styled) > 3:
            i = int(rng.integers(1, len(styled) - 1))
            repl = "abcdefghijklmnopqrstuvwxyz"[int(rng.integers(0, 26))]
            styled = styled[:i] + repl + styled[i + 1 :]
    return styled


def _style(words: list[str], kind: str, lang: str) -> str:
    if kind == "class":
        return _pascal(words)
    return _snake(words) if lang == "python" else _camel(words)


def _render_file(spec: FileSpec) -> str:
    """Render source text in the declared lang's surface syntax. The grammar
    is intentionally regular so the extractor (operators/extract.py) and this
    generator agree exactly on what entities a file declares."""
    lines: list[str] = []
    if spec.lang == "python":
        for m in spec.imports:
            lines.append(f"import {m}")
        for e in spec.entities:
            if e.kind == "class":
                lines.append(f"class {e.name}:")
                lines.append("    pass")
            else:
                lines.append(f"def {e.name}():")
                lines.append("    return None")
    elif spec.lang == "java":
        lines.append(f"package {spec.repo.replace('/', '.').replace('-', '_')};")
        for m in spec.imports:
            lines.append(f"import {m};")
        for e in spec.entities:
            if e.kind == "class":
                lines.append(f"public class {e.name} {{")
                lines.append("}")
            else:
                lines.append(f"public static void {e.name}() {{")
                lines.append("}")
    else:  # scala
        for m in spec.imports:
            lines.append(f"import {m}")
        for e in spec.entities:
            if e.kind == "class":
                lines.append(f"class {e.name} {{")
                lines.append("}")
            else:
                lines.append(f"def {e.name}(): Unit = {{}}")
    return "\n".join(lines) + "\n"


def entity_uri(repo: str, path: str, kind: str, name: str) -> str:
    return f"{repo}/{path}#{kind}/{name}"


def generate_corpus(
    n_repos: int = 20,
    files_per_repo: int = 10,
    seed: int = 42,
    alias_fraction: float = 0.6,
    hot_fraction: float = 0.3,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (src_files, gold).

    Even-indexed repos are the *source* side, odd-indexed the *target* side
    (the reference matches ontology1 x ontology2; we match the two repo
    halves). Each source entity gets an alias planted on the target side with
    probability ``alias_fraction``, at a Zipf-ish tier mix.
    """
    rng = np.random.default_rng(seed)
    repos = [f"org{i:04d}/lib{WORDS[i % len(WORDS)]}" for i in range(n_repos)]
    src_repos = repos[0::2]
    dst_repos = repos[1::2]

    # Zipf-weighted word sampling drives both TF-IDF fixtures and skew.
    word_p = 1.0 / np.arange(1, len(WORDS) + 1) ** 1.1
    word_p /= word_p.sum()

    def sample_words() -> list[str]:
        k = int(rng.integers(2, 4))
        idx = rng.choice(len(WORDS), size=k, replace=False, p=word_p)
        return [WORDS[i] for i in sorted(idx)]

    # --- plan files -------------------------------------------------------
    specs: dict[tuple[str, str], FileSpec] = {}
    gold_rows: list[dict] = []

    def new_spec(repo: str, fi: int) -> FileSpec:
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        ext = {"python": "py", "java": "java", "scala": "scala"}[lang]
        path = f"src/{WORDS[int(rng.integers(0, len(WORDS)))]}/mod{fi:03d}.{ext}"
        spec = FileSpec(repo=repo, path=path, lang=lang)
        specs[(repo, path)] = spec
        return spec

    src_specs = [new_spec(r, fi) for r in src_repos for fi in range(files_per_repo)]
    dst_specs = [new_spec(r, fi) for r in dst_repos for fi in range(files_per_repo)]

    # --- populate source entities + plant aliases -------------------------
    tier_choices = [1, 2, 3, 4, 5]
    tier_p = np.array([0.3, 0.25, 0.2, 0.15, 0.1])
    tier_sim = {1: 1.0, 2: 0.95, 3: 0.9, 4: 0.8, 5: 0.75}

    for spec in src_specs:
        n_ent = int(rng.integers(1, 8))
        for _ in range(n_ent):
            words = sample_words()
            kind = "class" if rng.random() < 0.4 else "function"
            name = _style(words, kind, spec.lang)
            if any(e.name == name and e.kind == kind for e in spec.entities):
                continue
            spec.entities.append(Entity(kind, name))
            if rng.random() < alias_fraction:
                tier = int(rng.choice(tier_choices, p=tier_p))
                tgt = dst_specs[int(rng.integers(0, len(dst_specs)))]
                alias = _perturb(words, tier, rng, kind, tgt.lang)
                if tier == 1:
                    alias = name
                if any(e.name == alias and e.kind == kind for e in tgt.entities):
                    continue
                tgt.entities.append(Entity(kind, alias))
                gold_rows.append(
                    {
                        "src_uri": entity_uri(spec.repo, spec.path, kind, name),
                        "dst_uri": entity_uri(tgt.repo, tgt.path, kind, alias),
                        "rel": "=",
                        "sim": tier_sim[tier],
                        "tier": tier,
                    }
                )

    # distractor entities on the target side (no gold partner)
    for spec in dst_specs:
        n_extra = int(rng.integers(0, 4))
        for _ in range(n_extra):
            words = sample_words()
            kind = "class" if rng.random() < 0.4 else "function"
            name = _style(words, kind, spec.lang)
            if any(e.name == name and e.kind == kind for e in spec.entities):
                continue
            spec.entities.append(Entity(kind, name))

    # hot-key skew: plant hot-named functions on both sides
    all_specs = src_specs + dst_specs
    n_hot = int(len(all_specs) * hot_fraction)
    hot_idx = rng.choice(len(all_specs), size=n_hot, replace=False)
    for i in hot_idx:
        spec = all_specs[int(i)]
        hot = HOT_NAMES[int(rng.integers(0, len(HOT_NAMES)))]
        if not any(e.name == hot for e in spec.entities):
            spec.entities.append(Entity("function", hot))

    # imports: each file imports 0-3 sibling modules (drives the mention
    # graph). Group by repo ONCE — the per-file scan over all specs was
    # quadratic (an hour of driver python at 306k files).
    by_repo: dict[str, list[FileSpec]] = {}
    for s in all_specs:
        by_repo.setdefault(s.repo, []).append(s)
    for spec in all_specs:
        n_imp = int(rng.integers(0, 4))
        repo_files = [s for s in by_repo[spec.repo] if s is not spec]
        for _ in range(min(n_imp, len(repo_files))):
            other = repo_files[int(rng.integers(0, len(repo_files)))]
            mod = other.path.rsplit("/", 1)[-1].split(".")[0]
            if mod not in spec.imports:
                spec.imports.append(mod)

    # --- render -----------------------------------------------------------
    rows = []
    for spec in all_specs:
        content = _render_file(spec)
        rows.append(
            {
                "repo": spec.repo,
                "path": spec.path,
                "commit": _sha_hex(spec.repo, spec.path)[:40],
                "lang": spec.lang,
                "content": content,
            }
        )
    src_files = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    gold = pd.DataFrame(
        gold_rows, columns=["src_uri", "dst_uri", "rel", "sim", "tier"]
    ).drop_duplicates(subset=["src_uri", "dst_uri"])
    return src_files, gold
