"""Search CLI — the mirror of the reference's `examples/search.go`
(/root/reference/examples/search.go:21-67): reuse an existing index
(ReuseIndex semantics — no rebuild), run one query, print the match set,
optionally persist results (the search.history/ artifact analog,
index_search.go:196-221).

    python -m pdfsearch_ray.jobs.search_job --index-dir /x -- "term ..."
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Query the fulltext index")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--max-results", type=int, default=10)
    p.add_argument("--best", action="store_true",
                   help="keep only max-score spans (Best() semantics)")
    p.add_argument("--method", default="auto",
                   choices=["auto", "taat", "maxscore"])
    p.add_argument("--out", default=None, help="write results parquet here")
    p.add_argument("--html", default=None,
                   help="write an HTML evidence page (highlighted spans "
                        "in context — the marked-up-PDF analog) here")
    p.add_argument("--ansi", action="store_true",
                   help="print highlighted snippets to the terminal")
    p.add_argument("--shards", type=int, default=0,
                   help=">0: scatter-gather across N doc-range shard "
                        "actors (exact TAAT rank identity)")
    p.add_argument("terms", nargs="+")
    args = p.parse_args(argv)

    from pdfsearch_ray.pipelines.query import BM25Index
    from pdfsearch_ray.pipelines.results import run_query_set

    query = " ".join(args.terms)
    idx = BM25Index(args.index_dir)
    if args.shards > 0:
        from pdfsearch_ray.pipelines.engine import ShardedEngine

        eng = ShardedEngine(args.index_dir, n_shards=args.shards)
        try:
            ms = eng.search(query, max_results=args.max_results)
        finally:
            eng.shutdown()
    else:
        ms = idx.search(query, max_results=args.max_results,
                        method=args.method)
    if args.best:
        ms = ms.best()
    print(f"{ms.total_matches} total matches, "
          f"{len(ms.matches)} returned, {ms.search_duration * 1000:.1f} ms")
    for i, m in enumerate(ms.matches):
        line = m.lines[0] if m.lines else ""
        print(f"{i + 1:4d}: doc={m.doc_id} score={m.score:.4f} "
              f"url={m.url!r} spans={len(m.spans)} :: {line[:80]}")
    if args.ansi:
        from pdfsearch_ray.pipelines.render import render_ansi

        print(render_ansi(query, ms, index=idx))
    if args.html:
        from pdfsearch_ray.pipelines.render import render_html

        with open(args.html, "w", encoding="utf-8") as f:
            f.write(render_html(query, ms, index=idx))
        print(f"wrote {args.html}")
    if args.out:
        run_query_set(idx, [query], args.out,
                      max_results=args.max_results, apply_best=args.best)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
