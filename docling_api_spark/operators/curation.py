"""End-to-end crawl-curation composite: the keep/drop decision a
web-scale training-data pipeline actually ships, composed from the
already-gated stages in crawl order:

    robots-exclusion verdict  (webtext.robots_filter)
  → head-meta keep            (queries.head_meta: noindex / canonical)
  → canonical-URL dedup       (webtext.url_canonical_dedup)
  → near-dup-aware quality    (text_stats.quality_filter_neardup)
  → stratified sampling       (webtext.stratified_sample)

Per-stage gates prove each stage's formula; this composite value-checks
the COMPOSITION — the doc_id join keys and the verdict precedence — the
thing per-stage gates cannot see. The reference service has no crawl
layer (its input is an upload, ``/root/reference/document_converter/
route.py:30``); this is the Common-Crawl-shape pipeline wrapped around
its per-document conversion capability.

The precedence template below is ONE string used by both engines: the
Spark side binds the five stage relations to temp views over the REAL
stage queries (extraction regexes, LSH + connected components, REP
parse), while the oracle binds them to the five stage ORACLES (each
individually driver-proven equivalent). Any drift in precedence order
or join keys breaks the value hash.

Plan at 100 TB: five equi-joins keyed on doc_id (unique — no skew by
construction); every stage already materializes doc_id-keyed output, so
the joins co-partition and AQE picks sort-merge vs broadcast per stage
size. The meta stage keys on url — doc_id is recovered map-side with
one regexp (a real pipeline carries the id through extraction instead;
the regexp stands in for that join key without widening the gate's
surface).
"""

from __future__ import annotations

#: verdict precedence, first failing stage wins (crawl order):
#: robots → noindex → canonical-elsewhere → url-dup → quality/near-dup
#: (that stage's own reason code passes through) → sampling
#: LEFT joins + conservative coalesce: a document MISSING from a stage
#: relation must not silently vanish from the verdict table (an inner
#: join would drop it) — it drops with the typed reason
#: 'missing_<stage>_verdict', the fail-closed contract a production
#: composition needs when one upstream table is partial. The synthetic
#: stages are total over documents, so the corpus oracle never hits
#: these branches; the template fuzz test drives them directly.
_TEMPLATE = """
WITH meta_k AS (
  SELECT CAST(regexp_extract(url, '/doc/([0-9]+)', 1) AS BIGINT) AS doc_id,
         noindex, is_canonical_self
  FROM {meta}
)
SELECT d.doc_id,
  CASE WHEN r.doc_id IS NULL THEN 'missing_robots_verdict'
       WHEN NOT r.crawl_allowed THEN 'robots_denied'
       WHEN m.doc_id IS NULL THEN 'missing_meta_verdict'
       WHEN m.noindex THEN 'meta_noindex'
       WHEN NOT m.is_canonical_self THEN 'canonical_elsewhere'
       WHEN u.doc_id IS NULL THEN 'missing_canon_verdict'
       WHEN NOT u.is_canonical THEN 'url_duplicate'
       WHEN q.doc_id IS NULL THEN 'missing_quality_verdict'
       WHEN q.drop_reason <> '' THEN q.drop_reason
       WHEN s.doc_id IS NULL THEN 'missing_sample_verdict'
       WHEN NOT s.keep THEN 'sampled_out'
       ELSE '' END AS drop_reason,
  coalesce(r.crawl_allowed AND NOT m.noindex AND m.is_canonical_self
           AND u.is_canonical AND q.keep AND s.keep, FALSE) AS keep
FROM (SELECT doc_id FROM documents) d
LEFT JOIN {robots} r ON r.doc_id = d.doc_id
LEFT JOIN meta_k m ON m.doc_id = d.doc_id
LEFT JOIN {canon} u ON u.doc_id = d.doc_id
LEFT JOIN {qual} q ON q.doc_id = d.doc_id
LEFT JOIN {sample} s ON s.doc_id = d.doc_id
"""


def verdict_sql(robots: str, meta: str, canon: str, qual: str,
                sample: str) -> str:
    """The shared (dialect-free) composition SQL over five stage
    relations — pass temp-view names (Spark) or parenthesized stage
    oracle SQL (DuckDB)."""
    return _TEMPLATE.format(robots=robots, meta=meta, canon=canon,
                            qual=qual, sample=sample)
