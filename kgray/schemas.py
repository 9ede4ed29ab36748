"""Central pyarrow schemas for every logical table (SURVEY.md §1.3)."""

from __future__ import annotations

import pyarrow as pa

CORPUS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

VOCAB = pa.schema(
    [
        ("vocab", pa.string()),
        ("entity_id", pa.string()),
        ("label", pa.string()),
        ("norm_label", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("entity_type", pa.string()),
    ]
)

MENTIONS = pa.schema(
    [
        ("doc_key", pa.string()),
        ("work_uri", pa.string()),
        ("mention_type", pa.string()),
        ("surface", pa.string()),
        ("norm", pa.string()),
    ]
)

LINKED = pa.schema(
    list(MENTIONS)
    + [
        ("dbpedia_id", pa.string()),
        ("dbpedia_score", pa.float64()),
        ("viaf_id", pa.string()),
        ("viaf_score", pa.float64()),
        ("europeana_id", pa.string()),
        ("europeana_score", pa.float64()),
        ("canonical_uri", pa.string()),
        ("method", pa.string()),
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("bucket", pa.int32()),
    ]
)

CANONICAL = pa.schema(
    [
        ("mention_type", pa.string()),
        ("norm", pa.string()),
        ("n_mentions", pa.int64()),
        ("canonical_uri", pa.string()),
        ("dbpedia_id", pa.string()),
        ("viaf_id", pa.string()),
        ("europeana_id", pa.string()),
    ]
)
