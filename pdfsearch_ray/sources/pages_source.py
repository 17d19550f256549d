"""Pages-corpus source: partitioned, checkpointed extract stage.

The rebuild of the reference's dispatcher→extract-worker fan-out
(internal/doclib/index_pdfs.go:69-95,204-251), re-expressed Ray-Data-first
with deterministic identity and resume:

* The driver enumerates input parquet *row groups* (metadata only — no
  data read) into partition descriptors; a descriptor Dataset fans out to
  extract tasks, so parallelism == row groups regardless of file count.
* Each task reads ONE row group with pyarrow, extracts text, assigns
  ``doc_id = (partition_id << 32) | row_in_partition`` (deterministic and
  dense per partition — the "%04X.%d" generalization, bleve_pdf.go:57 —
  so results are identical at ANY cluster parallelism), and writes its
  output parquet atomically (tmp + rename) plus a completion marker.
* On rerun, descriptors with a marker are skipped: resumable from
  per-partition checkpoints with lineage (north_rule), the real version
  of the reference's rollback-on-partial-write (bleve_pdf.go:342-351).
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.extract import EXTRACTOR_VERSION, HtmlExtractor
from ..state.manifest import validated_completed_partitions, write_partition_marker


def list_partitions(input_path: str | list[str]) -> list[dict]:
    """Enumerate (file, row_group) partitions from parquet metadata."""
    if isinstance(input_path, str):
        if os.path.isdir(input_path):
            files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        else:
            files = [input_path]
    else:
        files = sorted(input_path)
    descs = []
    pid = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            descs.append(
                {
                    "partition_id": pid,
                    "path": f,
                    "row_group": rg,
                    "n_rows": md.row_group(rg).num_rows,
                }
            )
            pid += 1
    return descs


class _ExtractPartition:
    """Task body: descriptor rows → extracted parquet + marker; emits one
    summary row per partition (the lineage record)."""

    def __init__(self, out_dir: str, lang_allow: tuple[str, ...] | None):
        self.out_dir = out_dir
        self.lang_allow = lang_allow
        self.extractor = HtmlExtractor(lang_allow)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = {"partition_id": [], "rows_in": [], "rows_out": [], "sec": []}
        for i in range(batch.num_rows):
            pid = batch["partition_id"][i].as_py()
            path = batch["path"][i].as_py()
            rg = batch["row_group"][i].as_py()
            t0 = time.perf_counter()
            # use_threads=False: many extract tasks run concurrently; a
            # per-task thread pool would oversubscribe the node
            src = pq.ParquetFile(path).read_row_group(
                rg, columns=["url", "html", "lang"], use_threads=False
            )
            n = src.num_rows
            src = src.append_column(
                "partition_id", pa.array([pid] * n, type=pa.int64())
            ).append_column(
                "row_offset", pa.array(range(n), type=pa.int64())
            )
            extracted = self.extractor(src)
            final = os.path.join(self.out_dir, f"part-{pid:06d}.parquet")
            tmp = final + f".tmp.{os.getpid()}"
            pq.write_table(extracted, tmp)
            os.replace(tmp, final)  # atomic commit
            dt = time.perf_counter() - t0
            write_partition_marker(
                self.out_dir,
                pid,
                {
                    "rows_in": n,
                    "rows_out": extracted.num_rows,
                    "doc_id_sum": int(pa.compute.sum(extracted["doc_id"]).as_py() or 0),
                    "extractor_version": EXTRACTOR_VERSION,
                    # identity + config fields so resume can validate the
                    # marker still describes THIS row group under THIS
                    # config (see validated_completed_partitions)
                    "path": path,
                    "row_group": rg,
                    "lang_allow": list(self.lang_allow) if self.lang_allow else None,
                    "sec": round(dt, 4),
                },
            )
            out_rows["partition_id"].append(pid)
            out_rows["rows_in"].append(n)
            out_rows["rows_out"].append(extracted.num_rows)
            out_rows["sec"].append(dt)
        return pa.table(
            {
                "partition_id": pa.array(out_rows["partition_id"], type=pa.int64()),
                "rows_in": pa.array(out_rows["rows_in"], type=pa.int64()),
                "rows_out": pa.array(out_rows["rows_out"], type=pa.int64()),
                "sec": pa.array(out_rows["sec"], type=pa.float64()),
            }
        )


_WORKER_EXTRACTORS: dict = {}


def _extract_partition_task(batch: pa.Table, out_dir: str,
                            lang_allow: tuple[str, ...] | None) -> pa.Table:
    key = (out_dir, tuple(lang_allow) if lang_allow else None)
    ex = _WORKER_EXTRACTORS.get(key)
    if ex is None:
        ex = _WORKER_EXTRACTORS[key] = _ExtractPartition(out_dir, lang_allow)
    return ex(batch)


def extract_pages(
    input_path: str | list[str],
    out_dir: str,
    *,
    lang_allow: tuple[str, ...] | None = ("en",),
    resume: bool = True,
    concurrency: int | None = None,
) -> dict:
    """Run (or resume) the extract checkpoint; returns summary metrics."""
    os.makedirs(out_dir, exist_ok=True)
    descs = list_partitions(input_path)
    done = (
        validated_completed_partitions(
            out_dir, descs,
            extractor_version=EXTRACTOR_VERSION, lang_allow=lang_allow,
        )
        if resume
        else set()
    )
    pending = [d for d in descs if d["partition_id"] not in done]
    summary = {
        "partitions": len(descs),
        "skipped": len(descs) - len(pending),
        "extractor_version": EXTRACTOR_VERSION,
    }
    if pending:
        ds = rd.from_items(pending, override_num_blocks=len(pending))
        if concurrency:
            # pinned actor pool (explicit resource sizing)
            res = ds.map_batches(
                _ExtractPartition,
                fn_constructor_kwargs=dict(out_dir=out_dir,
                                           lang_allow=lang_allow),
                batch_size=1,
                batch_format="pyarrow",
                concurrency=concurrency,
            ).to_pandas()
        else:
            # task pool with per-worker memoized extractor state — same
            # once-per-worker init as an actor pool without paying actor
            # spawn for a stage of short per-partition tasks
            from functools import partial

            res = ds.map_batches(
                partial(_extract_partition_task, out_dir=out_dir,
                        lang_allow=lang_allow),
                batch_size=1,
                batch_format="pyarrow",
            ).to_pandas()
        summary["rows_in"] = int(res["rows_in"].sum())
        summary["rows_out"] = int(res["rows_out"].sum())
        summary["sec_per_partition_p95"] = float(res["sec"].quantile(0.95)) if len(res) else 0.0
    # write a stage-level manifest listing completion state
    with open(os.path.join(out_dir, "_extract_summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


def extracted_dataset(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(sorted(glob.glob(os.path.join(out_dir, "part-*.parquet"))))
