"""Surface-rot pin: the lucene-closure idea applied to the operator
tier.  Every PUBLIC function in the operator modules must be consumed
somewhere — by a declared query, a test, an example, a streaming/sink
path, or as a building block inside the package.  A def that nothing
references is dead surface: it decays silently (no test runs it, no
oracle checks it) while still being counted as capability.

Mechanical, not curated: new operators are covered automatically; an
intentional not-yet-wired function must be added to the explicit
skip-list with a reason, which the diff then shows."""

from __future__ import annotations

import ast
import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPERATOR_MODULES = [
    "garmadon_spark/operators/text.py",
    "garmadon_spark/operators/corpus.py",
    "garmadon_spark/operators/dedup.py",
    "garmadon_spark/operators/similarity.py",
    "garmadon_spark/operators/multimodal.py",
    "garmadon_spark/operators/timeseries.py",
    "garmadon_spark/operators/rangejoin.py",
    "garmadon_spark/operators/enrich.py",
    "garmadon_spark/operators/flatten.py",
    "garmadon_spark/operators/jvmstats.py",
    "garmadon_spark/operators/normalize.py",
    "garmadon_spark/operators/bucketing.py",
    "garmadon_spark/operators/skew.py",
    "garmadon_spark/operators/corpus.py",
]

# name -> reason it is allowed to have no external consumer yet
ALLOWED_UNREFERENCED: dict[str, str] = {}


def test_every_public_operator_is_consumed():
    corpus = ""
    for pat in ("tests/*.py", "garmadon_spark/**/*.py", "examples/*.py",
                "tools/*.py", "bench.py", "__spark_entry__.py"):
        for f in glob.glob(os.path.join(REPO, pat), recursive=True):
            corpus += open(f).read()

    orphans = []
    for rel in sorted(set(OPERATOR_MODULES)):
        path = os.path.join(REPO, rel)
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if not isinstance(node, ast.FunctionDef):
                continue
            if node.name.startswith("_"):
                continue
            if node.name in ALLOWED_UNREFERENCED:
                continue
            # the definition itself contributes exactly one match;
            # any consumer (call, import, query wiring) adds more
            uses = len(re.findall(rf"\b{node.name}\b", corpus))
            if uses < 2:
                orphans.append(f"{rel}::{node.name}")
    assert not orphans, (
        "public operators with no consumer anywhere in the repo "
        f"(add coverage or an ALLOWED_UNREFERENCED reason): {orphans}"
    )
