"""kgray — a Ray-Data-native knowledge-graph construction engine.

From-scratch implementation of the capabilities of the reference
(`ait-ngcms/scoregraph`; checkout empty at survey time — the
authoritative contract is BASELINE.json's north_star, see SURVEY.md §0
and docs/PIPELINE_SPEC.md). Everything here derives from the public
Ray Data / pyarrow APIs.
"""

__version__ = "0.1.0"
