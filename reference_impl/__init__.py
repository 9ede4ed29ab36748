"""Sequential pure-Python reference oracle (SURVEY.md §5 item 1).

Plays the role of the reference's (`ait-ngcms/scoregraph`) output on
the sample corpus — the checkout at /root/reference was empty (see
SURVEY.md §0), so the P/R ≥ 0.95 gate compares the Ray engine against
this independent, single-process implementation of the SAME semantic
spec (docs/PIPELINE_SPEC.md). No code is shared with `kgray/` — the
normalizers, similarity kernels, parser and linker are re-implemented
here in a different style so a bug cannot cancel out across the two.
"""

from .oracle import (  # noqa: F401
    run_canonical,
    run_canonical_fuzzy,
    run_mentions,
    run_oracle,
)
