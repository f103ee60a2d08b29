"""Deterministic synthetic source-code corpus (the `input_hint` table).

Schema (BASELINE.json input_hint / FIXTURES.md §1):

    repo: string, path: string, commit: string, lang: string,
    content: large_string  (+ row_id: int64 used by the truth sidecar)

Every row's content is a pure function of ``(seed, row_id)``, so generation is
an embarrassingly parallel ``ray.data.range(n).map_batches(...)`` — no
communication, no driver-side materialization, valid at any scale. Planted
structure (deterministic by ``row_id % 10`` / ``% 1000``):

- ``id % 1000 == 555``  → **mega group**: one fixed boilerplate content shared
  by all such rows (the LICENSE/empty-file hot-key analog, FIXTURES.md §1).
- ``id % 10 == 7``      → exact dup of base row ``id - 7`` (different repo/path).
- ``id % 10 == 8``      → near dup of base row ``id - 8`` (1-3 token/line edits,
  target 5-gram Jaccard ≳ 0.85).
- ``id % 10 == 9``      → moved file: content of base ``id - 9``, same repo,
  different path (compare.rs:477-522 moved-pair analog).
- ``id % 100 == 91``    → low-similarity mutation of ``id - 8`` (Jaccard
  ~0.5-0.7; must NOT cluster at b=16/r=8) — overrides the near-dup rule.
- ``id % 97 == 0``      → path drawn from the international-filename pool
  (FIXTURES.md §4).
- otherwise             → unique base row.

The ground-truth sidecar (``truth_for_ids``) labels each row with its expected
cluster id (the base row's id) and kind ∈ {unique, exact_dup, near_dup, moved,
mega, low_sim} — the oracle for dup-pair recall ≥ 0.99.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = ["py", "rs", "c", "go", "md", "txt"]

_VOCAB = [
    # identifier-ish tokens, keywords, operators — code-shaped text
    "def", "fn", "return", "if", "else", "for", "while", "let", "mut",
    "self", "impl", "struct", "class", "import", "from", "pub", "static",
    "const", "match", "loop", "break", "continue", "async", "await",
    "result", "value", "index", "count", "total", "buffer", "stream",
    "reader", "writer", "parse", "format", "config", "options", "handler",
    "context", "state", "error", "warning", "input", "output", "path",
    "file", "data", "batch", "block", "chunk", "table", "column", "row",
    "hash", "digest", "token", "shingle", "cluster", "partition", "shard",
    "x", "y", "i", "j", "k", "n", "acc", "tmp", "out", "lhs", "rhs",
    "=", "+", "-", "*", "/", "==", "!=", "<", ">", "(", ")", "{", "}",
    "[", "]", ",", ";", ":", "->", "&&", "||",
]

_UNICODE_NAMES = [
    "файл_тест.txt", "测试文件.py", "اختبار.rs", "בדיקה.go", "परीक्षण.c",
    "ทดสอบ.md", "ტესტი.txt", "δοκιμή.py", "test_😀🎉.txt",
    "file with  double  spaces.txt", " leading_space.txt",
    "trailing_space .txt", "very_long_" + "x" * 80 + ".txt",
    "mixed_тест_测试_test.py", "dots.and-dashes_and_underscores.v2.txt",
]

_MEGA_CONTENT = (
    "Licensed under the Apache License, Version 2.0 (the \"License\");\n"
    "you may not use this file except in compliance with the License.\n"
    "You may obtain a copy of the License at\n\n"
    "    http://www.apache.org/licenses/LICENSE-2.0\n\n"
    "Unless required by applicable law or agreed to in writing, software\n"
    "distributed under the License is distributed on an \"AS IS\" BASIS.\n"
)


def _rng(seed: int, row_id: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=[seed, row_id]))


def _base_content(seed: int, base_id: int) -> str:
    """Unique-ish code-shaped text, 20..120 lines, 4..9 tokens per line."""
    g = _rng(seed, base_id)
    n_lines = int(g.integers(20, 120))
    vocab_idx = g.integers(0, len(_VOCAB), size=(n_lines, 9))
    lens = g.integers(4, 10, size=n_lines)
    lines = []
    for li in range(n_lines):
        toks = [_VOCAB[vocab_idx[li, t]] for t in range(lens[li])]
        # a per-file unique identifier keeps base rows distinct
        if li == 0:
            toks.append(f"uid_{base_id}")
        lines.append(" ".join(toks))
    return "\n".join(lines) + "\n"


def _mutate(content: str, seed: int, row_id: int, heavy: bool) -> str:
    """Rename identifiers / drop lines — light keeps Jaccard high, heavy low."""
    g = _rng(seed, row_id + 10_000_019)
    lines = content.split("\n")
    tokens_per_line = [ln.split(" ") for ln in lines]
    if heavy:
        # replace ~40% of tokens and drop ~20% of lines → Jaccard ~0.5
        keep = g.random(len(tokens_per_line)) > 0.2
        tokens_per_line = [t for t, k in zip(tokens_per_line, keep) if k]
        for toks in tokens_per_line:
            for i in range(len(toks)):
                if g.random() < 0.4:
                    toks[i] = _VOCAB[int(g.integers(0, len(_VOCAB)))]
    else:
        # light edit, scaled to doc size so 5-gram Jaccard stays ≥ ~0.85
        # (the 0.85-0.99 planted band, FIXTURES.md §1): 1-2 token renames,
        # plus a line deletion only for docs with ≥ 60 lines
        if len(tokens_per_line) >= 60:
            del tokens_per_line[int(g.integers(1, len(tokens_per_line)))]
        for _ in range(int(g.integers(1, 3))):
            li = int(g.integers(0, len(tokens_per_line)))
            if tokens_per_line[li]:
                ti = int(g.integers(0, len(tokens_per_line[li])))
                tokens_per_line[li][ti] = f"renamed_{row_id % 1000}"
    return "\n".join(" ".join(t) for t in tokens_per_line)


def row_kind(row_id: int) -> str:
    if row_id % 1000 == 555:
        return "mega"
    if row_id % 100 == 91:
        return "low_sim"
    m = row_id % 10
    if m == 7:
        return "exact_dup"
    if m == 8:
        return "near_dup"
    if m == 9:
        return "moved"
    return "unique"


def truth_cluster_id(row_id: int) -> int:
    """Expected cluster representative (the base row's id)."""
    kind = row_kind(row_id)
    if kind == "mega":
        return 555  # all mega rows share cluster 555
    if kind in ("exact_dup", "near_dup", "moved"):
        return row_id - (row_id % 10)
    return row_id  # unique / low_sim cluster alone


def content_for_id(seed: int, row_id: int) -> str:
    kind = row_kind(row_id)
    if kind == "mega":
        return _MEGA_CONTENT
    if kind in ("exact_dup", "moved"):
        return _base_content(seed, row_id - (row_id % 10))
    if kind == "near_dup":
        return _mutate(_base_content(seed, row_id - 8), seed, row_id, heavy=False)
    if kind == "low_sim":
        return _mutate(_base_content(seed, row_id - 8), seed, row_id, heavy=True)
    return _base_content(seed, row_id)


def _path_for_id(seed: int, row_id: int, lang: str) -> str:
    if row_id % 97 == 0:
        name = _UNICODE_NAMES[row_id % len(_UNICODE_NAMES)]
        return f"i18n/{name}"
    g = _rng(seed, row_id + 40_000_003)
    d1 = ["src", "lib", "core", "util", "tests", "internal"][int(g.integers(0, 6))]
    d2 = ["io", "net", "fmt", "data", "hash", "text"][int(g.integers(0, 6))]
    return f"{d1}/{d2}/mod_{row_id}.{lang}"


def _repo_for_id(row_id: int, kind: str) -> str:
    # moved rows stay in their base row's repo; exact dups land elsewhere
    rid = row_id - (row_id % 10) if kind == "moved" else row_id
    return f"org{(rid * 7919) % 40:04d}/repo{(rid * 104729) % 200:04d}"


def corpus_batch(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate corpus rows for the given row ids (a map_batches kernel)."""
    repos, paths, commits, langs, contents, row_ids = [], [], [], [], [], []
    for row_id in ids.tolist():
        kind = row_kind(row_id)
        lang = LANGS[(row_id * 31) % len(LANGS)]
        content = content_for_id(seed, row_id)
        repos.append(_repo_for_id(row_id, kind))
        paths.append(_path_for_id(seed, row_id, lang))
        # 40-hex commit deterministic from (repo-ish id, seed)
        commits.append(
            np.base_repr((row_id * 2654435761 + seed) % (1 << 60), 16)
            .lower()
            .zfill(40)[:40]
        )
        langs.append(lang)
        contents.append(content)
        row_ids.append(row_id)
    return pa.table(
        {
            "row_id": pa.array(row_ids, pa.int64()),
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )


def truth_for_ids(ids: np.ndarray) -> pa.Table:
    """Ground-truth sidecar for recall measurement (FIXTURES.md §1)."""
    return pa.table(
        {
            "row_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(
                [truth_cluster_id(i) for i in ids.tolist()], pa.int64()
            ),
            "kind": pa.array([row_kind(i) for i in ids.tolist()], pa.string()),
        }
    )


def corpus_dataset(n_rows: int, seed: int = 42, parallelism: int = -1):
    """Distributed corpus generation: range(n) → map_batches(generator)."""
    import ray.data

    ds = ray.data.range(n_rows, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(
        lambda b, s=seed: corpus_batch(np.asarray(b["id"]), s),
        batch_format="numpy",
        batch_size=512,
    )


def write_corpus(
    out_dir: str, n_rows: int, seed: int = 42, parallelism: int = -1
) -> str:
    """Materialize a corpus + truth sidecar to ``out_dir`` (idempotent)."""
    import os

    import ray.data

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(os.path.join(out_dir, "corpus"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "truth"), exist_ok=True)
    corpus_dataset(n_rows, seed, parallelism).write_parquet(
        os.path.join(out_dir, "corpus")
    )
    ray.data.range(n_rows).map_batches(
        lambda b: truth_for_ids(np.asarray(b["id"])),
        batch_format="numpy",
        batch_size=4096,
    ).write_parquet(os.path.join(out_dir, "truth"))
    with open(done, "w") as f:
        f.write(f"n_rows={n_rows} seed={seed}\n")
    return out_dir
