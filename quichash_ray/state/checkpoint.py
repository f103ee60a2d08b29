"""Checkpoint / lineage / resume (north_rule: every stage checkpoints
per-partition lineage and throughput metrics to allow resume from failure).

``CheckpointedPipeline`` materializes each named stage to partitioned Parquet
under ``workdir/<stage>/`` with a ``_LINEAGE.json`` manifest:

    {stage, rows, n_files, elapsed_sec, rows_per_sec, written_at,
     input_stages, files: [{name, rows, bytes}], schema}

Writes are atomic (temp dir + rename), so a manifest existing implies the
stage completed; a killed run leaves at most one ``.tmp-`` dir that the next
run clears. On resume, completed stages load from their Parquet instead of
recomputing — the reference has no such story (a killed scan restarts from
zero, output written only after a full barrier, /root/reference/src/scan.rs:
450-463; SURVEY §4 checkpoint row).

Output layout is many Parquet files (one per block), never one giant file, so
a downstream consumer can itself read partition-parallel.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
from datetime import datetime, timezone
from typing import Callable

from ray.data import Dataset

LINEAGE = "_LINEAGE.json"


def _utcnow() -> str:
    return datetime.now(timezone.utc).isoformat()


class CheckpointedPipeline:
    """Stage-granular checkpointing: ``run(name, fn, deps...)`` computes a
    Dataset once, persists it, and replays from disk on later runs."""

    def __init__(self, workdir: str):
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        # clear half-written temp dirs from a killed run
        for entry in os.listdir(workdir):
            if entry.startswith(".tmp-"):
                shutil.rmtree(os.path.join(workdir, entry), ignore_errors=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def is_done(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._stage_dir(name), LINEAGE))

    def lineage(self, name: str) -> dict:
        with open(os.path.join(self._stage_dir(name), LINEAGE)) as f:
            return json.load(f)

    def load(self, name: str) -> Dataset:
        import glob

        import ray.data

        d = self._stage_dir(name)
        paths = sorted(
            glob.glob(os.path.join(d, "*.parquet"))
            + glob.glob(os.path.join(d, "part-*", "*.parquet"))
        )
        return ray.data.read_parquet(paths if paths else d)

    def run(
        self,
        name: str,
        fn: Callable[[], Dataset],
        input_stages: tuple[str, ...] = (),
    ) -> Dataset:
        """Execute ``fn`` (or resume): returns the stage's Dataset."""
        if self.is_done(name):
            return self.load(name)
        tmp = os.path.join(self.workdir, f".tmp-{name}-{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        t0 = time.time()
        ds = fn()
        ds.write_parquet(tmp)
        elapsed = time.time() - t0
        files = []
        rows = 0
        import pyarrow.parquet as pq

        schema_str = ""
        for fname in sorted(os.listdir(tmp)):
            fpath = os.path.join(tmp, fname)
            if not fname.endswith(".parquet"):
                continue
            md = pq.read_metadata(fpath)
            if not schema_str:
                schema_str = str(pq.read_schema(fpath))
            files.append(
                {
                    "name": fname,
                    "rows": md.num_rows,
                    "bytes": os.path.getsize(fpath),
                }
            )
            rows += md.num_rows
        from quichash_ray.state.metrics import read_metrics

        manifest = {
            "stage": name,
            "rows": rows,
            "n_files": len(files),
            "cap_metrics": read_metrics(),  # dropped buckets/grams so far
            "elapsed_sec": round(elapsed, 3),
            "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else None,
            "written_at": _utcnow(),
            "input_stages": list(input_stages),
            "files": files,
            "schema": schema_str,
        }
        with open(os.path.join(tmp, LINEAGE), "w") as f:
            json.dump(manifest, f, indent=1)
        final = self._stage_dir(name)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        return self.load(name)

    def run_partitioned(
        self,
        name: str,
        part_fn: Callable[[int], Dataset],
        num_parts: int,
        input_stages: tuple[str, ...] = (),
    ) -> Dataset:
        """Per-partition resume WITHIN a stage: partition ``i``'s output is
        computed by ``part_fn(i)`` and committed atomically (temp dir →
        ``part-i`` rename + ``.done`` marker). A run killed mid-stage
        recomputes only the partitions without markers — the stage-granular
        ``run()`` restarts the whole stage.

        ``part_fn`` must be deterministic per partition (e.g. one input
        file / key range per partition) so resumed output ≡ fresh output.
        """
        if self.is_done(name):
            # a completed stage is reusable only at the SAME partition
            # count — part_fn(i) semantics change with num_parts, so a
            # stale manifest with a different count must not short-circuit
            if self.lineage(name).get("n_partitions") == num_parts:
                return self.load(name)
            shutil.rmtree(self._stage_dir(name), ignore_errors=True)
        final = self._stage_dir(name)
        os.makedirs(final, exist_ok=True)
        # drop stale partitions from an earlier attempt with a LARGER
        # partition count — load() reads every part-* dir, so leftovers
        # beyond range(num_parts) would silently join the output. Parse
        # the full numeric suffix (not a fixed 5-digit slice) so counts
        # beyond 99999 still clean up.
        part_re = re.compile(r"^part-(\d+)(?:\.done)?$")
        for entry in os.listdir(final):
            m = part_re.match(entry)
            if m and int(m.group(1)) >= num_parts:
                p = os.path.join(final, entry)
                (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
        t0 = time.time()
        computed = 0
        for i in range(num_parts):
            marker = os.path.join(final, f"part-{i:05d}.done")
            pdir = os.path.join(final, f"part-{i:05d}")
            if os.path.exists(marker):
                continue
            tmp = os.path.join(
                self.workdir, f".tmp-{name}-part{i}-{os.getpid()}"
            )
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            part_fn(i).write_parquet(tmp)
            shutil.rmtree(pdir, ignore_errors=True)
            os.rename(tmp, pdir)
            with open(marker, "w") as f:
                f.write(_utcnow())
            computed += 1
        elapsed = time.time() - t0
        # stage-level manifest aggregating per-partition outputs
        import pyarrow.parquet as pq

        files = []
        rows = 0
        schema_str = ""
        for i in range(num_parts):
            pdir = os.path.join(final, f"part-{i:05d}")
            for fname in sorted(os.listdir(pdir)):
                if not fname.endswith(".parquet"):
                    continue
                fpath = os.path.join(pdir, fname)
                md = pq.read_metadata(fpath)
                if not schema_str:
                    schema_str = str(pq.read_schema(fpath))
                files.append(
                    {
                        "name": f"part-{i:05d}/{fname}",
                        "rows": md.num_rows,
                        "bytes": os.path.getsize(fpath),
                    }
                )
                rows += md.num_rows
        manifest = {
            "stage": name,
            "rows": rows,
            "n_files": len(files),
            "n_partitions": num_parts,
            "partitions_computed_this_run": computed,
            "elapsed_sec": round(elapsed, 3),
            "rows_per_sec": round(rows / elapsed, 1) if elapsed > 0 else None,
            "written_at": _utcnow(),
            "input_stages": list(input_stages),
            "files": files,
            "schema": schema_str,
        }
        with open(os.path.join(final, LINEAGE), "w") as f:
            json.dump(manifest, f, indent=1)
        return self.load(name)

    def invalidate(self, name: str) -> None:
        shutil.rmtree(self._stage_dir(name), ignore_errors=True)

    def report(self) -> list[dict]:
        """All completed stages' lineage manifests (metrics sidecar)."""
        out = []
        for entry in sorted(os.listdir(self.workdir)):
            p = os.path.join(self.workdir, entry, LINEAGE)
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
        return out


def checkpointed_fuzzy_dedup(
    corpus_path: str,
    workdir: str,
    cfg=None,
    id_col: str = "row_id",
    text_col: str = "content",
) -> Dataset:
    """The flagship pipeline split into resumable checkpointed stages:
    signatures → candidate pairs → verified edges → cluster assignments.
    Kill it at any point; the next invocation resumes after the last
    completed stage and provably produces the same output (tests)."""
    import ray.data

    from quichash_ray.config import FuzzyConfig
    from quichash_ray.pipelines.fuzzy import (
        combined_candidate_pairs,
        exact_stage,
        fuzzy_dedup,
        verify_pairs_jaccard,
    )
    from quichash_ray.stages.lookup import attach_lookup
    from quichash_ray.stages.minhash import make_signature_fn
    from quichash_ray.stages.unionfind import connected_components

    cfg = cfg or FuzzyConfig()
    cp = CheckpointedPipeline(workdir)

    def _membership():
        m, _ = exact_stage(
            ray.data.read_parquet(corpus_path), id_col, text_col
        )
        return m

    membership = cp.run("membership", _membership)

    def _signatures():
        # reuse the checkpointed membership instead of re-running the full
        # digest pass: rep ids are the rows where id == rep
        from quichash_ray.stages.lookup import semi_join_broadcast

        rep_ids = membership.filter(expr=f"{id_col} == rep").select_columns(
            [id_col]
        )
        reps = semi_join_broadcast(
            ray.data.read_parquet(corpus_path), rep_ids, id_col
        )
        return reps.map_batches(
            make_signature_fn(cfg, id_col, text_col, keep_shingles=True),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=512,
        )

    signatures = cp.run("signatures", _signatures, ("membership",))

    verified = cp.run(
        "verified_edges",
        lambda: verify_pairs_jaccard(
            combined_candidate_pairs(signatures, cfg, id_col),
            signatures,
            cfg,
            id_col,
        ).select_columns(["id_a", "id_b"]),
        ("signatures",),
    )

    def _clusters():
        import pyarrow as pa
        import pyarrow.compute as pc

        labels = connected_components(verified)
        lab = labels.map_batches(
            lambda b: b.rename_columns(["rep", "cluster_id"]),
            batch_format="pyarrow", batch_size=None,
        )
        assigned = attach_lookup(
            membership, lab, key_col="rep", value_col="cluster_id",
            out_col="rep_cluster",
        )

        def finalize(b: pa.Table) -> pa.Table:
            cluster = pc.coalesce(b["rep_cluster"], b["rep"])
            return pa.table(
                {
                    id_col: b[id_col],
                    "cluster_id": pc.cast(cluster, pa.int64()),
                    "rep": b["rep"],
                }
            )

        return assigned.map_batches(finalize, batch_format="pyarrow", batch_size=None)

    return cp.run("clusters", _clusters, ("membership", "verified_edges"))


def checkpointed_digest_scan(
    corpus_path: str,
    workdir: str,
    algorithms: tuple[str, ...] = ("sha256",),
    content_col: str = "content",
) -> Dataset:
    """The expensive corpus digest scan with per-INPUT-FILE resume: each
    input Parquet file is one partition of ``run_partitioned`` — a run
    killed mid-scan re-digests only the files without ``.done`` markers
    (the reference restarts its whole scan from zero, scan.rs:450-463)."""
    import glob

    import ray.data

    from quichash_ray.stages.digest import add_digests

    files = (
        sorted(glob.glob(os.path.join(corpus_path, "*.parquet")))
        if os.path.isdir(corpus_path)
        else [corpus_path]
    )
    cp = CheckpointedPipeline(workdir)

    def part(i: int) -> Dataset:
        return add_digests(
            ray.data.read_parquet(files[i]),
            list(algorithms),
            content_col=content_col,
            drop_content=True,
        )

    return cp.run_partitioned("digests", part, len(files))
