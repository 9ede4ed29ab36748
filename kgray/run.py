"""CLI entry point (SURVEY.md §3.2): the `ray job submit` surface.

    python -m kgray.run --input DIR --out DIR [--vocab PATH]
                        [--partitions P] [--no-resume]
                        [--max-partitions K] [--scale tiny|smoke|bench]

`--scale` synthesizes the seeded fixture corpus (FIXTURES.md) instead
of `--input`. Owns its Ray session (guarded init), unlike the library.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kgray.run")
    p.add_argument("--input", help="parquet corpus directory")
    p.add_argument("--scale", choices=["tiny", "smoke", "bench"],
                   help="synthesize the seeded fixture corpus at this scale")
    p.add_argument("--vocab", default=None, help="vocabulary parquet (default: fixture vocab)")
    p.add_argument("--out", required=True)
    p.add_argument("--partitions", type=int, default=16)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--max-partitions", type=int, default=None,
                   help="stop after K newly completed partitions (kill simulation)")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--link-batch-size", type=int, default=4096)
    args = p.parse_args(argv)

    if not args.input and not args.scale:
        p.error("one of --input / --scale is required")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kgray import checkpoint, fixtures

    input_path = args.input or fixtures.corpus_path(args.scale)
    vocab = args.vocab or fixtures.vocab_path()
    summary = checkpoint.run_checkpointed(
        input_path,
        vocab,
        args.out,
        num_partitions=args.partitions,
        resume=not args.no_resume,
        max_partitions=args.max_partitions,
        link_batch_size=args.link_batch_size,
    )
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
