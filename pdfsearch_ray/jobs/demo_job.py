"""Combined build→search demo — the mirror of the reference's third
entry point `examples/pdf_search_demo.go:113-136` (runIndexSearch):
build (or reuse with ``--reuse``, the ReuseIndex path), immediately
search, print the combined timing split (`dt`, `dtIndex`, `dtSearch`,
docs/sec — pdf_search_demo.go:178-187) and optionally persist results.

    python -m pdfsearch_ray.jobs.demo_job \
        --input pages/ --index-dir /tmp/idx -- "quick brown fox"
"""

from __future__ import annotations

import argparse
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Build index then search it")
    p.add_argument("--input", required=True,
                   help="pages parquet file/dir (url,warc_ts,html,text,lang)")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--reuse", action="store_true",
                   help="reuse an existing index (ReuseIndex semantics: no "
                        "validation, no rebuild — index_search.go:86-91)")
    p.add_argument("--max-results", type=int, default=10)
    p.add_argument("--best", action="store_true")
    p.add_argument("--out", default=None, help="results parquet path")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("terms", nargs="+")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from pdfsearch_ray.pipelines.build import build_from_pages
    from pdfsearch_ray.pipelines.query import BM25Index
    from pdfsearch_ray.pipelines.results import run_query_set

    t0 = time.perf_counter()
    n_docs = None
    if not args.reuse:
        manifest = build_from_pages(args.input, args.index_dir, resume=True)
        n_docs = manifest.n_docs
    dt_index = time.perf_counter() - t0

    query = " ".join(args.terms)
    t1 = time.perf_counter()
    idx = BM25Index(args.index_dir)
    ms = idx.search(query, max_results=args.max_results, with_spans=True)
    if args.best:
        ms = ms.best()
    dt_search = time.perf_counter() - t1

    for i, m in enumerate(ms.matches):
        line = m.lines[0] if m.lines else ""
        print(f"{i + 1:4d}: doc={m.doc_id} score={m.score:.4f} "
              f"url={m.url!r} :: {line[:80]}")
    if args.out:
        run_query_set(idx, [query], args.out,
                      max_results=args.max_results, apply_best=args.best)

    dt = time.perf_counter() - t0
    n_docs = n_docs if n_docs is not None else idx.doc_count()
    rate = (n_docs / dt_index) if dt_index > 0 and not args.reuse else 0.0
    print(f"dt={dt:.2f}s dtIndex={dt_index:.2f}s dtSearch={dt_search * 1000:.1f}ms "
          f"docs={n_docs} ({rate:.0f} docs/sec)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
