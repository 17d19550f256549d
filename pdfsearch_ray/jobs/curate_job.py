"""Corpus-curation job: the composite training-data pipeline as a CLI.

    python -m pdfsearch_ray.jobs.curate_job \
        --input /corpus/documents.parquet --out-dir /curated \
        --rate en=0.125 --rate de=0.5 --default-rate 0.25

Reads a documents-shaped parquet corpus (doc_id, text, lang), runs
exact dedup → Gopher quality gate → per-language deterministic
downsampling → fixed-window chunking, and writes chunk shards
partitioned by language with a manifest (pipelines/curate.py).  The
script owns the Ray session (guarded init); the library never calls
ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Curate a training corpus")
    p.add_argument("--input", required=True,
                   help="documents parquet file/dir (doc_id, text, lang)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--rate", action="append", default=[],
                   metavar="LANG=RATE",
                   help="per-language sampling rate (repeatable)")
    p.add_argument("--default-rate", type=float, default=0.25)
    p.add_argument("--chunk-size", type=int, default=None)
    p.add_argument("--chunk-stride", type=int, default=None)
    p.add_argument("--num-buckets", type=int, default=16)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    rates = {}
    for spec in args.rate:
        lang, _, r = spec.partition("=")
        rates[lang] = float(r)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from pdfsearch_ray.pipelines import curate

    kw = dict(rates=rates, default_rate=args.default_rate,
              num_buckets=args.num_buckets)
    if args.chunk_size is not None:
        kw["chunk_size"] = args.chunk_size
    if args.chunk_stride is not None:
        kw["chunk_stride"] = args.chunk_stride
    manifest = curate.curate_corpus(args.input, args.out_dir, **kw)
    print(json.dumps(manifest), file=sys.stdout)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
