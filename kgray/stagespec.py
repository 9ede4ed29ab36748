"""User-extension surface (SURVEY.md §2.10): a pipeline segment is an
ordered list of `Stage` specs applied to a Dataset.

The reference grew by adding a new `*_helper.py` script per authority
source; here the equivalent is declaring a `Stage` — any
batch->batch callable (stateless task stage) or callable CLASS
(stateful actor-pool stage, state built once per actor in
``__init__``) — and appending it to the list. Zero engine changes:
`apply_stages` turns the list into chained `map_batches` with the
right execution mode per stage.

Example (the flagship's mention segment, plus a user UDF)::

    stages = [
        Stage("sha", stages_mod.with_sha),
        Stage("extract", stages_mod.extract_mentions),
        Stage("my_udf", my_batch_fn),                      # task stage
        Stage("linker", Linker,                            # actor stage
              fn_constructor_kwargs={"vocab_path": p},
              options={"batch_size": 4096, "concurrency": (2, 8)}),
    ]
    out = apply_stages(corpus, stages)
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

from ray.data import Dataset


@dataclass(frozen=True)
class Stage:
    """One pipeline step: `fn` is a batch->batch callable (stateless
    task stage) or a callable class (stateful actor-pool stage).
    `options` pass through to `map_batches` (batch_size, concurrency,
    num_cpus, ...); `fn_constructor_kwargs` feed a class's __init__."""

    name: str
    fn: Callable | type
    fn_constructor_kwargs: dict[str, Any] | None = None
    options: dict[str, Any] = field(default_factory=dict)


def apply_stages(ds: Dataset, stages: list[Stage]) -> Dataset:
    """Chain the stage list onto `ds`. Defaults: zero-copy Arrow
    batches; classes get an autoscaling actor pool (1, 4) unless the
    stage overrides `concurrency`."""
    for st in stages:
        opts: dict[str, Any] = {"batch_format": "pyarrow", **st.options}
        if inspect.isclass(st.fn):
            opts.setdefault("concurrency", (1, 4))
            if st.fn_constructor_kwargs:
                opts["fn_constructor_kwargs"] = st.fn_constructor_kwargs
        elif st.fn_constructor_kwargs:
            raise ValueError(
                f"stage {st.name!r}: fn_constructor_kwargs requires a "
                "callable CLASS (actor stage), got a plain function"
            )
        ds = ds.map_batches(st.fn, **opts)
    return ds
