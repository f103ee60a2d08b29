"""CLI — ``python -m quichash_ray.cli <command>``.

Mirrors the reference's command surface (/root/reference/src/cli.rs:35-221):
hash (default), scan, verify, compare, dedup, analyze, benchmark, list —
plus the engine's own ``fuzzy`` (MinHash/LSH clustering) and ``resume``
(checkpointed pipeline). Each command drives a Ray Data pipeline over a
Parquet corpus table (or literal text for ``hash``) and writes Parquet /
JSON reports; entrypoints are ``ray job submit``-able.

The CLI owns its Ray session (init/shutdown); library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from datetime import datetime, timezone


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _meta() -> dict:
    return {"timestamp": datetime.now(timezone.utc).isoformat()}


def cmd_hash(args) -> int:
    """Digest a literal string or stdin with N algorithms (hash.rs:489-583)."""
    from quichash_ray.functions.hashes import digest_hex

    data = args.text if args.text is not None else sys.stdin.buffer.read()
    for algo in args.algorithms.split(","):
        print(f"{digest_hex(data, algo.strip())}  {algo.strip()}")
    return 0


def cmd_list(args) -> int:
    """Algorithm catalog (hash.rs:346-439)."""
    from quichash_ray.functions.hashes import list_algorithms

    for a in list_algorithms():
        flags = []
        if a.post_quantum:
            flags.append("post-quantum")
        if not a.cryptographic:
            flags.append("non-cryptographic")
        print(f"{a.name:14} {a.output_bits:4} bits  {' '.join(flags)}")
    return 0


def cmd_scan(args) -> int:
    """corpus parquet → digest table parquet (the scan command analog)."""
    import ray.data

    from quichash_ray.pipelines.dedup import digest_table

    _init_ray(args.num_cpus)
    ds = ray.data.read_parquet(args.input)
    out = digest_table(
        ds,
        content_col=args.content_col,
        key_cols=tuple(args.key_cols.split(",")),
        algorithm=args.algorithm,
    ).materialize()  # one execution serves both the write and the count
    out.write_parquet(args.output)
    print(json.dumps({"rows": out.count(), "output": args.output, **_meta()}))
    return 0


def cmd_dedup(args) -> int:
    import ray.data

    from quichash_ray.pipelines.dedup import digest_table, duplicate_groups

    _init_ray(args.num_cpus)
    ds = ray.data.read_parquet(args.input)
    digests = digest_table(
        ds,
        content_col=args.content_col,
        key_cols=tuple(args.key_cols.split(",")),
        algorithm=args.algorithm,
    )
    groups = duplicate_groups(
        digests, id_col=args.key_cols.split(",")[0]
    ).materialize()
    groups.write_parquet(args.output)
    df = groups.to_pandas()
    report = {
        "dup_groups": len(df),
        "dup_files": int(df["cnt"].sum()) if len(df) else 0,
        "wasted_bytes": int(df["wasted"].sum()) if len(df) else 0,
        "output": args.output,
        **_meta(),
    }
    print(json.dumps(report))
    return 0


def cmd_verify(args) -> int:
    import pyarrow as pa
    import ray.data

    from quichash_ray.pipelines.dbops import (
        verify_classify,
        verify_mixed,
        verify_report,
    )

    _init_ray(args.num_cpus)
    stored = ray.data.read_parquet(args.stored)
    current = ray.data.read_parquet(args.current)
    if args.mixed:
        # per-entry algorithm/mode verify (verify.rs:302-307): stored must
        # carry (path, digest|hash, algorithm, fast_mode); current carries
        # raw content to re-digest per row
        def normalize(b: pa.Table) -> pa.Table:
            if "digest" not in b.column_names and "hash" in b.column_names:
                b = b.rename_columns(
                    ["digest" if c == "hash" else c for c in b.column_names]
                )
            return b

        classified = verify_mixed(
            stored.map_batches(normalize, batch_format="pyarrow", batch_size=None),
            current,
            content_col=args.content_col,
        ).materialize()
    else:
        classified = verify_classify(stored, current).materialize()
    if args.output:
        classified.write_parquet(args.output)
    print(json.dumps({**verify_report(classified), **_meta()}))
    return 0


def cmd_compare(args) -> int:
    import ray.data

    from quichash_ray.pipelines.dbops import (
        compare_classify,
        compare_report,
        moved_pairs,
    )

    _init_ray(args.num_cpus)
    db1 = ray.data.read_parquet(args.db1)
    db2 = ray.data.read_parquet(args.db2)
    classified = compare_classify(db1, db2).materialize()
    moved = moved_pairs(classified).materialize()
    if args.output:
        classified.write_parquet(args.output)
    print(json.dumps({**compare_report(classified, moved), **_meta()}))
    return 0


def cmd_analyze(args) -> int:
    import ray.data

    from quichash_ray.pipelines.dedup import analyze_stats, digest_table

    _init_ray(args.num_cpus)
    ds = ray.data.read_parquet(args.input)
    digests = digest_table(
        ds,
        content_col=args.content_col,
        key_cols=tuple(args.key_cols.split(",")),
        algorithm=args.algorithm,
    )
    stats = analyze_stats(digests).to_pandas().iloc[0].to_dict()
    print(json.dumps({**{k: int(v) for k, v in stats.items()}, **_meta()}))
    return 0


def cmd_fuzzy(args) -> int:
    """Full near-dup clustering; optionally checkpointed/resumable."""
    import ray.data

    _init_ray(args.num_cpus)
    if args.workdir:
        from quichash_ray.state.checkpoint import checkpointed_fuzzy_dedup

        out = checkpointed_fuzzy_dedup(args.input, args.workdir)
    else:
        from quichash_ray.pipelines.fuzzy import fuzzy_dedup

        out = fuzzy_dedup(ray.data.read_parquet(args.input))
    out = out.materialize()
    out.write_parquet(args.output)
    print(json.dumps({"rows": out.count(), "output": args.output, **_meta()}))
    return 0


def cmd_benchmark(args) -> int:
    """Per-algorithm digest throughput on generated data (benchmark.rs:31-82)."""
    import numpy as np

    from quichash_ray.functions.hashes import get_digest_fn, list_algorithms

    from quichash_ray.functions.hashes import is_pure_python_fallback

    size = args.size_mb * 1024 * 1024
    rng = np.random.Generator(np.random.Philox(key=[1, 0]))
    data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
    # algorithms running on the pure-Python fallback (no C wheel in this
    # environment) get a 1 MB payload — the full default (100 MB) would run
    # for tens of minutes and look hung; the output marks the fallback
    small = data[: 1024 * 1024]
    results = []
    for a in list_algorithms():
        fn = get_digest_fn(a.name)
        fallback = is_pure_python_fallback(a.name)
        payload = small if fallback else data
        t0 = time.time()
        fn(payload)
        dt = time.time() - t0
        results.append(
            {
                "algorithm": a.name,
                "throughput_mbps": round(len(payload) / (1024 * 1024) / dt, 1),
                "pure_python": fallback,
            }
        )
    results.sort(key=lambda r: -r["throughput_mbps"])
    for r in results:
        note = "  (pure-python fallback, 1MB payload)" if r["pure_python"] else ""
        print(f"{r['algorithm']:14} {r['throughput_mbps']:>10.1f} MB/s{note}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="quichash_ray")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, io=True):
        sp.add_argument("--num-cpus", type=int, default=None)
        if io:
            sp.add_argument("--input", required=True, help="corpus parquet path")
            sp.add_argument("--content-col", default="content")
            sp.add_argument("--key-cols", default="path")
            sp.add_argument("--algorithm", default="sha256")

    sp = sub.add_parser("hash", help="digest a literal / stdin")
    sp.add_argument("text", nargs="?", default=None)
    sp.add_argument("-a", "--algorithms", default="sha256")
    sp.set_defaults(fn=cmd_hash)

    sp = sub.add_parser("list", help="algorithm catalog")
    sp.set_defaults(fn=cmd_list)

    sp = sub.add_parser("scan", help="corpus → digest table")
    common(sp)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_scan)

    sp = sub.add_parser("dedup", help="exact duplicate groups")
    common(sp)
    sp.add_argument("--output", required=True)
    sp.set_defaults(fn=cmd_dedup)

    sp = sub.add_parser("verify", help="stored digest table vs current")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--stored", required=True)
    sp.add_argument("--current", required=True)
    sp.add_argument("--output", default=None)
    sp.add_argument(
        "--mixed",
        action="store_true",
        help="re-hash each stored entry with its own algorithm + fast mode "
        "(current must be a content table)",
    )
    sp.add_argument("--content-col", default="text")
    sp.set_defaults(fn=cmd_verify)

    sp = sub.add_parser("compare", help="digest table vs digest table")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--db1", required=True)
    sp.add_argument("--db2", required=True)
    sp.add_argument("--output", default=None)
    sp.set_defaults(fn=cmd_compare)

    sp = sub.add_parser("analyze", help="corpus statistics")
    common(sp)
    sp.set_defaults(fn=cmd_analyze)

    sp = sub.add_parser("fuzzy", help="near-dup clustering (MinHash/LSH)")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--workdir", default=None, help="checkpoint dir (resumable)")
    sp.set_defaults(fn=cmd_fuzzy)

    sp = sub.add_parser("benchmark", help="per-algorithm throughput")
    sp.add_argument("-s", "--size-mb", type=int, default=100)
    sp.set_defaults(fn=cmd_benchmark)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
