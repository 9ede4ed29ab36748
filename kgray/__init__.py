"""kgray — a Ray-Data-native knowledge-graph construction engine.

From-scratch implementation of the capabilities of the reference
(`ait-ngcms/scoregraph`; checkout empty at survey time — the
authoritative contract is BASELINE.json's north_star, see SURVEY.md §0
and docs/PIPELINE_SPEC.md). Everything here derives from the public
Ray Data / pyarrow APIs.
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Drop Ray's benign 'Failed to hash the schemas (for
    deduplication): unhashable type: dict' warning: the driver's
    testdata parquet carries pandas schema metadata that Ray's
    schema-dedup fast path cannot hash; unification still succeeds on
    the slow path, so the message is pure noise on every shuffle."""

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
    _SchemaHashNoiseFilter()
)
