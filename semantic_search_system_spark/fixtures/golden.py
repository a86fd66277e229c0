"""Golden-triple oracle: a reference-faithful, plain-pandas implementation of the
whole extraction → canonicalization → triple pipeline.

Mirrors the reference's triple set (SURVEY.md §1.3): for each document,
``(doc, MENTIONS, entity)`` and ``(doc, HAS_TOPIC, topic)`` (from
nlp/pr_aws_nlp.py:64-97 / nlp/pr_local_nlp_pipeline.py:70-93 semantics), plus
``(broad_topic, RELATES_TO_DOC, doc)`` from the phrase-clustering +
topic→doc join (nlp/topic_modeling.py:31-66 + knowledge_graph.py:151-189).

This module is intentionally NOT Spark: it is the independent oracle the Spark
pipeline's P/R >= 0.95 target is measured against (single-threaded, dict/loop
based, like the reference itself). Shares only ``spec.py`` with the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import spec


def golden_enrich(interleaved: pd.DataFrame) -> pd.DataFrame:
    """Per-doc extraction over the interleaved table (pandas rows: doc_id, spans)."""
    rows = []
    for doc_id, spans in zip(interleaved["doc_id"], interleaved["spans"]):
        ordered = sorted(list(spans), key=lambda s: s["offset"])
        text_spans = [s["text"] for s in ordered if s["kind"] == "text" and s["text"]]
        media_refs = [s["media_ref"] for s in ordered if s["kind"] != "text"]
        content = " ".join(text_spans)
        ext = spec.extract_doc(content)
        rows.append(
            {
                "doc_id": doc_id,
                "content": content,
                "summary": spec.summarize(text_spans),
                "entities": ext["entities"],
                "topics": ext["topics"],
                "media_refs": media_refs,
                "embedding": spec.embed_text(content),
            }
        )
    return pd.DataFrame(rows)


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller string wins as root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def golden_canonicalize(phrases: list[str]) -> dict[str, str]:
    """phrase → broad-topic label via threshold graph + connected components.

    Spec (shared with the Spark path): block on first token, edge where
    cosine >= PHRASE_SIM_THRESHOLD, components via union-find, component label
    = member phrase nearest the component centroid (ties → lexicographic min).
    Reproduces the reference's complete-linkage-cut + centroid-label flow
    (topic_modeling.py:31-66) as a deterministic threshold-graph cut.
    """
    uniq = sorted({spec.normalize_key(p) for p in phrases if p and p.strip()})
    vecs = {p: spec.embed_text(p) for p in uniq}
    blocks: dict[str, list[str]] = {}
    for p in uniq:
        blocks.setdefault(p.split()[0], []).append(p)
    uf = _UnionFind()
    for p in uniq:
        uf.find(p)
    for _, members in sorted(blocks.items()):
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                # float64 dot, rounded to SIM_NDIGITS before thresholding
                # (spec.round_half_away contract — engine-independent boundary)
                sim = float(
                    spec.round_half_away(
                        np.dot(vecs[a].astype(np.float64), vecs[b].astype(np.float64))
                    )
                )
                if sim >= spec.PHRASE_SIM_THRESHOLD:
                    uf.union(a, b)
    comps: dict[str, list[str]] = {}
    for p in uniq:
        comps.setdefault(uf.find(p), []).append(p)
    label_of: dict[str, str] = {}
    for _, members in sorted(comps.items()):
        centroid = np.mean([vecs[m] for m in members], axis=0)
        best = min(members, key=lambda m: (-float(np.dot(vecs[m], centroid)), m))
        for m in members:
            label_of[m] = best
    return label_of


def golden_triples(interleaved: pd.DataFrame) -> pd.DataFrame:
    """The full golden triple set: (subj, pred, obj) for the P/R comparison."""
    enriched = golden_enrich(interleaved)
    triples: set[tuple[str, str, str]] = set()
    all_topics: list[str] = []
    for _, row in enriched.iterrows():
        for e in row["entities"]:
            triples.add((row["doc_id"], spec.PRED_MENTIONS, spec.normalize_key(e)))
        for t in row["topics"]:
            triples.add((row["doc_id"], spec.PRED_HAS_TOPIC, spec.normalize_key(t)))
            all_topics.append(t)
    label_of = golden_canonicalize(all_topics)
    for _, row in enriched.iterrows():
        for t in row["topics"]:
            triples.add((label_of[spec.normalize_key(t)], spec.PRED_RELATES, row["doc_id"]))
    out = pd.DataFrame(sorted(triples), columns=["subj", "pred", "obj"])
    return out


def precision_recall(
    emitted: set[tuple[str, str, str]], golden: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not emitted or not golden:
        return 0.0, 0.0
    tp = len(emitted & golden)
    return tp / len(emitted), tp / len(golden)
