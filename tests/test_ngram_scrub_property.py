"""Property-based check of the exact-substring scrub: for arbitrary
small corpora, the Spark operator must agree byte-for-byte with a
straightforward Python reference model (hash every k-gram, flag spans
in ≥ min_docs distinct docs, drop covered tokens).  The vocabulary is
mixed-case so the test pins BOTH halves of the case contract: matching
is case-folded, surviving tokens keep their original case."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from garmadon_spark.operators.dedup import scrub_repeated_ngrams

K = 3
MIN_DOCS = 2

# small vocab so repeated k-grams actually occur across random docs;
# mixed case so "Aa bb" in one doc matches "aa BB" in another while the
# scrub must emit each doc's own casing for survivors
word = st.sampled_from(["aa", "Aa", "bb", "BB", "cc", "dd", "Ee"])
doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=6)


def _reference(texts: list[str]) -> dict[int, tuple[str, int]]:
    gram_docs: dict[str, set[int]] = {}
    toks_by_doc = {}
    for did, text in enumerate(texts):
        ltoks = text.lower().split(" ")
        toks_by_doc[did] = (text.split(" "), ltoks)
        for i in range(max(len(ltoks) - K + 1, 0)):
            g = hashlib.md5(" ".join(ltoks[i:i + K]).encode()).hexdigest()
            gram_docs.setdefault(g, set()).add(did)
    out = {}
    for did, (toks, ltoks) in toks_by_doc.items():
        starts = sorted({
            i
            for i in range(max(len(ltoks) - K + 1, 0))
            if len(gram_docs[
                hashlib.md5(" ".join(ltoks[i:i + K]).encode()).hexdigest()
            ]) >= MIN_DOCS
        })
        covered = {p for s in starts for p in range(s, s + K)}
        # survivors come from the ORIGINAL-case token stream
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[did] = (" ".join(kept), len(starts))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_scrub_matches_reference_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_flagged_spans)
        for r in scrub_repeated_ngrams(
            df, k=K, min_docs=MIN_DOCS
        ).collect()
    }
    assert got == _reference(texts)
