"""Index maintenance job: append / delete / compact / snapshot.

The lifecycle counterpart of build_job — the reference reaches these
through the forceCreate=false reopen path (bleve_glue.go:16-29) and the
catalog remove (bleve_pdf.go:166-175); here each is an explicit
distributed job over an existing index dir:

    python -m pdfsearch_ray.jobs.maintain_job append \
        --index-dir /idx --input new_docs.parquet
    python -m pdfsearch_ray.jobs.maintain_job delete \
        --index-dir /idx --doc-ids 5,9,12     # or --hashes a1b2...
    python -m pdfsearch_ray.jobs.maintain_job compact --index-dir /idx
    python -m pdfsearch_ray.jobs.maintain_job tail \
        --index-dir /idx --watch-dir /deltas --idle-exit-sec 60
        # streaming micro-batch mode: each *.parquet renamed into
        # /deltas becomes an incremental segment commit; serving
        # replicas see it on QueryEngine.reload()

The script owns the Ray session (guarded init, per the driver
contract); the library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Index maintenance")
    sub = p.add_subparsers(dest="cmd", required=True)

    ap = sub.add_parser("append", help="add new docs as a segment")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--input", required=True,
                    help="parquet file/dir of new docs (doc_id, text, ...)")
    ap.add_argument("--lang-col", default=None)
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--audit-unique", action="store_true")

    dp = sub.add_parser("delete", help="tombstone docs (lazy delete)")
    dp.add_argument("--index-dir", required=True)
    dp.add_argument("--doc-ids", default="",
                    help="comma-separated doc ids")
    dp.add_argument("--hashes", default="",
                    help="comma-separated content hashes")

    cp = sub.add_parser("compact",
                        help="merge segments and purge tombstones")
    cp.add_argument("--index-dir", required=True)
    cp.add_argument("--resume", action="store_true")
    cp.add_argument("--keep-old", action="store_true",
                    help="leave <index-dir>.old on disk so warm serving "
                         "replicas can drain before reload()")

    tp = sub.add_parser(
        "tail",
        help="stream-append: watch a directory for delta parquet files "
             "and commit each batch as an incremental segment")
    tp.add_argument("--index-dir", required=True)
    tp.add_argument("--watch-dir", required=True,
                    help="directory writers rename *.parquet deltas into")
    tp.add_argument("--poll-sec", type=float, default=2.0)
    tp.add_argument("--max-batches", type=int, default=None,
                    help="exit after N commits (default: run forever)")
    tp.add_argument("--idle-exit-sec", type=float, default=None,
                    help="exit after this long with no new files")
    tp.add_argument("--compact-every", type=int, default=None,
                    help="fold segments into the base whenever the "
                         "index accumulates this many append segments")
    tp.add_argument("--lang-col", default=None)
    tp.add_argument("--url-col", default=None)
    tp.add_argument("--no-dedup", action="store_true")

    sp = sub.add_parser(
        "snapshot",
        help="content-addressed incremental backup of a committed index")
    sp.add_argument("--index-dir", required=True)
    sp.add_argument("--repo-dir", required=True)
    sp.add_argument("--name", required=True)

    rp = sub.add_parser("restore",
                        help="verified restore of a snapshot")
    rp.add_argument("--repo-dir", required=True)
    rp.add_argument("--name", required=True)
    rp.add_argument("--dest-dir", required=True)

    lp = sub.add_parser("snapshots", help="list repository snapshots")
    lp.add_argument("--repo-dir", required=True)

    for q in (ap, dp, cp, tp, sp, rp, lp):
        q.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    # snapshot/restore are pure file ops — no Ray session needed
    if args.cmd in ("snapshot", "restore", "snapshots"):
        from pdfsearch_ray.pipelines import snapshot as snap

        if args.cmd == "snapshot":
            out = snap.snapshot_index(args.index_dir, args.repo_dir,
                                      name=args.name)
        elif args.cmd == "restore":
            snap.restore_index(args.repo_dir, args.name, args.dest_dir)
            out = {"restored": args.dest_dir}
        else:
            out = snap.list_snapshots(args.repo_dir)
        print(json.dumps(out))
        return 0

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)

    from pdfsearch_ray.pipelines import build as b

    if args.cmd == "append":
        out = b.append_index(
            args.input, args.index_dir,
            lang_col=args.lang_col, url_col=args.url_col,
            dedup=not args.no_dedup, audit_unique=args.audit_unique,
            report=lambda m: print(m, file=sys.stderr),
        )
    elif args.cmd == "tail":
        out = b.tail_append(
            args.index_dir, args.watch_dir,
            poll_sec=args.poll_sec, max_batches=args.max_batches,
            idle_exit_sec=args.idle_exit_sec,
            compact_every=args.compact_every,
            lang_col=args.lang_col, url_col=args.url_col,
            dedup=not args.no_dedup,
            report=lambda m: print(m, file=sys.stderr),
        )
    elif args.cmd == "delete":
        out = b.delete_docs(
            args.index_dir,
            doc_ids=[int(x) for x in args.doc_ids.split(",") if x],
            hashes=[x for x in args.hashes.split(",") if x] or None,
        )
    else:
        m = b.compact_index(args.index_dir, resume=args.resume,
                            remove_old=not args.keep_old,
                            report=lambda m: print(m, file=sys.stderr))
        out = {"n_docs": m.n_docs, "avgdl": m.avgdl,
               "build_metrics": m.build_metrics}
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
