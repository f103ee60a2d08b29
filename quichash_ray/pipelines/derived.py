"""Deterministic dup-planted derivations of the ``documents`` test table.

The driver's ``documents`` table has no duplicate rows (500/5000 distinct
texts), so to exercise dedup/verify/compare operators under the DuckDB oracle
the engine and the SQL derive the SAME expanded table from it:

    D(doc_id, copy, path, text):
      copy 0: every document              path = 'doc_<id>_<copy>'
      copy 1: doc_id % 5 == 0   (dup)
      copy 2: doc_id % 25 == 0  (second dup → groups of size 3)

Verify/compare scenarios mutate D deterministically (mod-7 text edits,
mod-10/11 drops/adds, mod-13 renames) — every rule is mirrored literally in
the oracle SQL in ``__ray_entry__``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset



def _mod_eq(col: pa.ChunkedArray | pa.Array, m: int, v: int) -> pa.Array:
    """doc_id % m == v as a boolean Arrow mask (pyarrow lacks a modulo kernel)."""
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pa.array(np.asarray(arr) % m == v)

def _copies(b: pa.Table, text_col: str) -> pa.Table:
    parts = []
    for copy in (0, 1, 2):
        if copy == 0:
            sel = b
        elif copy == 1:
            sel = b.filter(_mod_eq(b["doc_id"], 5, 0))
        else:
            sel = b.filter(_mod_eq(b["doc_id"], 25, 0))
        if sel.num_rows == 0:
            continue
        path = pc.binary_join_element_wise(
            pa.scalar("doc"),
            pc.cast(sel["doc_id"], pa.string()),
            pa.scalar(str(copy)),
            pa.scalar("_"),
        )
        parts.append(
            pa.table(
                {
                    "doc_id": sel["doc_id"],
                    "copy": pa.array([copy] * sel.num_rows, pa.int64()),
                    "path": path,
                    "text": sel[text_col],
                }
            )
        )
    return pa.concat_tables(parts)


def dup_planted(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → D (see module docstring). Stateless row expansion."""
    return ds.map_batches(
        lambda b: _copies(b, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


# The SQL CTE equivalent of ``dup_planted`` — prepended to oracle queries.
DUP_PLANTED_SQL = """
d AS (
    SELECT doc_id, c.copy AS copy,
           'doc_' || doc_id || '_' || c.copy AS path, text
    FROM documents, (VALUES (0), (1), (2)) AS c(copy)
    WHERE c.copy = 0
       OR (c.copy = 1 AND doc_id % 5 = 0)
       OR (c.copy = 2 AND doc_id % 25 = 0)
)
"""


def verify_scenario(planted: Dataset) -> tuple[Dataset, Dataset]:
    """→ (stored, current) text tables for the verify matrix:

    - current drops rows with copy=1 AND doc_id%10==0        → missing
    - current mutates text where copy=0 AND doc_id%7==0      → mismatch
    - current adds copy=3 rows where doc_id%11==0            → new
    """

    def to_current(b: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.and_(
                pc.equal(b["copy"], 1), _mod_eq(b["doc_id"], 10, 0)
            )
        )
        cur = b.filter(keep)
        mutate = pc.and_(
            pc.equal(cur["copy"], 0), _mod_eq(cur["doc_id"], 7, 0)
        )
        text = pc.if_else(
            mutate,
            pc.binary_join_element_wise(cur["text"], pa.scalar("~MOD"), pa.scalar("")),
            cur["text"],
        )
        cur = cur.set_column(cur.schema.get_field_index("text"), "text", text)
        new_rows = b.filter(
            pc.and_(
                pc.equal(b["copy"], 0), _mod_eq(b["doc_id"], 11, 0)
            )
        )
        if new_rows.num_rows:
            new_path = pc.binary_join_element_wise(
                pa.scalar("doc"),
                pc.cast(new_rows["doc_id"], pa.string()),
                pa.scalar("3"),
                pa.scalar("_"),
            )
            new_text = pc.binary_join_element_wise(
                new_rows["text"], pa.scalar("~NEW"), pa.scalar("")
            )
            cur = pa.concat_tables(
                [
                    cur,
                    pa.table(
                        {
                            "doc_id": new_rows["doc_id"],
                            "copy": pa.array([3] * new_rows.num_rows, pa.int64()),
                            "path": new_path,
                            "text": new_text,
                        }
                    ),
                ]
            )
        return cur

    current = planted.map_batches(
        to_current, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return planted, current


VERIFY_SCENARIO_SQL = """
stored AS (SELECT path, sha256(text) AS digest FROM d),
current AS (
    SELECT path,
           sha256(CASE WHEN copy = 0 AND doc_id % 7 = 0
                       THEN text || '~MOD' ELSE text END) AS digest
    FROM d
    WHERE NOT (copy = 1 AND doc_id % 10 = 0)
    UNION ALL
    SELECT 'doc_' || doc_id || '_3' AS path, sha256(text || '~NEW') AS digest
    FROM d WHERE copy = 0 AND doc_id % 11 = 0
)
"""


def mixed_verify_scenario(
    planted: Dataset, fast_sample_size: int = 64
) -> tuple[Dataset, Dataset]:
    """→ (stored, current) for per-entry mixed algorithm/mode verify:

    stored: every D row digested with ITS OWN settings —
      algorithm = md5 when doc_id%3==0 else sha256,
      fast_mode = doc_id%4==0 (sampled with S=64; ASCII text)
    current: the same text mutations as :func:`verify_scenario`
      (drop copy1 %10 → missing, mutate copy0 %7 → mismatch,
      add copy3 %11 → new), as TEXT rows (verify re-digests them).
    """
    from quichash_ray.functions.fastmode import fast_sample
    from quichash_ray.functions.hashes import get_digest_fn

    def to_stored(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        fns = {"md5": get_digest_fn("md5"), "sha256": get_digest_fn("sha256")}
        algos, fasts, digests = [], [], []
        for i, t in zip(ids, texts):
            algo = "md5" if i % 3 == 0 else "sha256"
            fast = i % 4 == 0
            data = t.encode("utf-8")
            if fast:
                data = fast_sample(data, fast_sample_size)
            algos.append(algo)
            fasts.append(fast)
            digests.append(fns[algo](data).hex())
        return pa.table(
            {
                "path": b["path"],
                "digest": pa.array(digests, pa.string()),
                "algorithm": pa.array(algos, pa.string()),
                "fast_mode": pa.array(fasts, pa.bool_()),
            }
        )

    stored = planted.map_batches(
        to_stored, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    _, current = verify_scenario(planted)
    return stored, current


# SQL mirror of ``mixed_verify_scenario`` + the per-entry re-digest. The
# fast-mode sample expression must equal fastmode.fast_sample at S=64
# (ASCII text: char offsets == byte offsets; DuckDB substr is 1-based).
_FS = (
    "CASE WHEN strlen({t}) < 192 THEN {t} "
    "ELSE substr({t}, 1, 64) || substr({t}, strlen({t})//2 - 31, 64) "
    "|| substr({t}, strlen({t}) - 63, 64) END"
)


def _mixed_digest_sql(text_expr: str) -> str:
    fs = _FS.format(t=text_expr)
    return f"""CASE WHEN doc_id % 3 = 0 THEN
           CASE WHEN doc_id % 4 = 0 THEN md5({fs}) ELSE md5({text_expr}) END
       ELSE
           CASE WHEN doc_id % 4 = 0 THEN sha256({fs}) ELSE sha256({text_expr}) END
       END"""


MIXED_VERIFY_SCENARIO_SQL = f"""
stored AS (
    SELECT path, doc_id, {_mixed_digest_sql('text')} AS digest
    FROM d
),
cur AS (
    SELECT path, doc_id,
           CASE WHEN copy = 0 AND doc_id % 7 = 0 THEN text || '~MOD'
                ELSE text END AS text
    FROM d WHERE NOT (copy = 1 AND doc_id % 10 = 0)
    UNION ALL
    SELECT 'doc_' || doc_id || '_3' AS path, doc_id, text || '~NEW' AS text
    FROM d WHERE copy = 0 AND doc_id % 11 = 0
),
redigest AS (
    SELECT c.path, {_mixed_digest_sql('c.text').replace('doc_id', 's.doc_id')} AS actual
    FROM cur c JOIN stored s ON s.path = c.path
)
"""


def decontam_test_corpus(docs: Dataset, text_col: str = "text") -> Dataset:
    """Deterministic eval-corpus derivation for decontamination checks:
    doc_id%10==0 rows verbatim (exact leakage) plus doc_id%7==0 rows
    case/whitespace-mangled (caught only by the normalized fingerprint).
    Mirrored literally in the oracle SQL."""

    def to_test(b: pa.Table) -> pa.Table:
        exact = b.filter(_mod_eq(b["doc_id"], 10, 0))
        mangled = b.filter(_mod_eq(b["doc_id"], 7, 0))
        mtext = pc.binary_join_element_wise(
            pc.utf8_upper(mangled[text_col]), pa.scalar("  "), pa.scalar("")
        )
        return pa.concat_tables(
            [
                pa.table(
                    {"doc_id": exact["doc_id"], text_col: exact[text_col]}
                ),
                pa.table({"doc_id": mangled["doc_id"], text_col: mtext}),
            ]
        )

    return docs.map_batches(
        to_test, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def compare_scenario(docs: Dataset, text_col: str = "text") -> tuple[Dataset, Dataset]:
    """→ (db1, db2): db1 = one row per document, path 'doc_<id>'.
    db2: doc_id%17==0 dropped (removed); doc_id%7==0 text mutated (changed);
    doc_id%13==0 (and not %7) path renamed 'moved_<id>' (moved)."""

    def to_db1(b: pa.Table) -> pa.Table:
        path = pc.binary_join_element_wise(
            pa.scalar("doc"), pc.cast(b["doc_id"], pa.string()), pa.scalar("_")
        )
        return pa.table({"doc_id": b["doc_id"], "path": path, "text": b[text_col]})

    def to_db2(b: pa.Table) -> pa.Table:
        keep = pc.invert(_mod_eq(b["doc_id"], 17, 0))
        s = b.filter(keep)
        mutate = _mod_eq(s["doc_id"], 7, 0)
        text = pc.if_else(
            mutate,
            pc.binary_join_element_wise(s[text_col], pa.scalar("~V2"), pa.scalar("")),
            s[text_col],
        )
        rename = _mod_eq(s["doc_id"], 13, 0)
        path = pc.if_else(
            rename,
            pc.binary_join_element_wise(
                pa.scalar("moved"), pc.cast(s["doc_id"], pa.string()), pa.scalar("_")
            ),
            pc.binary_join_element_wise(
                pa.scalar("doc"), pc.cast(s["doc_id"], pa.string()), pa.scalar("_")
            ),
        )
        return pa.table({"doc_id": s["doc_id"], "path": path, "text": text})

    return (
        docs.map_batches(to_db1, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        docs.map_batches(to_db2, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
    )


COMPARE_SCENARIO_SQL = """
db1 AS (SELECT 'doc_' || doc_id AS path, sha256(text) AS digest FROM documents),
db2 AS (
    SELECT CASE WHEN doc_id % 13 = 0 THEN 'moved_' || doc_id
                ELSE 'doc_' || doc_id END AS path,
           sha256(CASE WHEN doc_id % 7 = 0 THEN text || '~V2' ELSE text END) AS digest
    FROM documents
    WHERE doc_id % 17 <> 0
)
"""


def repo_forked(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → (repo, path, content): a deterministic forked-repo
    scenario for :func:`quichash_ray.pipelines.repodedup.repo_neardup`.

    Every doc lands in repo ``r{doc_id % 40:03d}``; repos whose id is
    divisible by 4 additionally get a fork ``r..._fork`` holding the
    subset of their files with ``doc_id % 3 != 0`` (~2/3, same content —
    Jaccard(base, fork) ≈ 2/3, comfortably over the 0.5 gate, while
    unrelated repo pairs share nothing: the documents table has no
    duplicate texts). The full north-rule input shape
    ``(repo, path, commit, lang, content)``: ``lang`` cycles py/rs/go/md
    by doc_id, ``commit`` is a 40-char snapshot id per repo (forks get a
    distinct one). Mirrored literally by ``REPO_FORKED_SQL``.
    """

    LANGS = pa.array(["py", "rs", "go", "md"], pa.string())

    def _commit(rid_arr, offset: int):
        return pc.utf8_lpad(
            pc.cast(
                pa.array(rid_arr + offset, pa.int64()), pa.string()
            ),
            40,
            "0",
        )

    def expand(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(
            b["doc_id"].combine_chunks()
            if isinstance(b["doc_id"], pa.ChunkedArray)
            else b["doc_id"]
        )
        rid = ids % 40
        repo = pc.binary_join_element_wise(
            pa.scalar("r"),
            pc.utf8_lpad(
                pc.cast(pa.array(rid, pa.int64()), pa.string()), 3, "0"
            ),
            pa.scalar(""),
        )
        path = pc.binary_join_element_wise(
            pa.scalar("f_"), pc.cast(b["doc_id"], pa.string()), pa.scalar("")
        )
        base = pa.table(
            {
                "repo": repo,
                "path": path,
                "commit": _commit(rid, 0),
                "lang": LANGS.take(pa.array(ids % 4, pa.int64())),
                "content": b[text_col],
            }
        )
        fork_mask = pa.array((rid % 4 == 0) & (ids % 3 != 0))
        f = b.filter(fork_mask)
        if f.num_rows == 0:
            return base
        fids = np.asarray(
            f["doc_id"].combine_chunks()
            if isinstance(f["doc_id"], pa.ChunkedArray)
            else f["doc_id"]
        )
        frid = fids % 40
        frepo = pc.binary_join_element_wise(
            pa.scalar("r"),
            pc.utf8_lpad(
                pc.cast(pa.array(frid, pa.int64()), pa.string()), 3, "0"
            ),
            pa.scalar("_fork"),
            pa.scalar(""),
        )
        fpath = pc.binary_join_element_wise(
            pa.scalar("f_"), pc.cast(f["doc_id"], pa.string()), pa.scalar("")
        )
        fork = pa.table(
            {
                "repo": frepo,
                "path": fpath,
                "commit": _commit(frid, 41),
                "lang": LANGS.take(pa.array(fids % 4, pa.int64())),
                "content": f[text_col],
            }
        )
        return pa.concat_tables([base, fork])

    return ds.map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def repo_history(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → (repo, path, commit, content): an incremental-corpus
    scenario for :func:`quichash_ray.pipelines.repodedup.latest_snapshot`.

    Every file exists at commit ``0...1``; files with ``doc_id % 5 == 0``
    get an updated version at commit ``0...2`` (content + ' [v2]'); files
    with ``doc_id % 7 == 0`` get one at commit ``0...3``. The latest
    snapshot is v3 where %7, else v2 where %5, else v1. Mirrored
    literally by ``REPO_HISTORY_SQL``.
    """

    def expand(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(
            b["doc_id"].combine_chunks()
            if isinstance(b["doc_id"], pa.ChunkedArray)
            else b["doc_id"]
        )
        repo = pc.binary_join_element_wise(
            pa.scalar("r"),
            pc.utf8_lpad(
                pc.cast(pa.array(ids % 40, pa.int64()), pa.string()), 3, "0"
            ),
            pa.scalar(""),
        )
        path = pc.binary_join_element_wise(
            pa.scalar("f_"), pc.cast(b["doc_id"], pa.string()), pa.scalar("")
        )

        def version(tbl_mask, tag: str, cnum: str):
            f = b.filter(tbl_mask)
            if f.num_rows == 0:
                return None
            fids = np.asarray(
                f["doc_id"].combine_chunks()
                if isinstance(f["doc_id"], pa.ChunkedArray)
                else f["doc_id"]
            )
            frepo = pc.binary_join_element_wise(
                pa.scalar("r"),
                pc.utf8_lpad(
                    pc.cast(pa.array(fids % 40, pa.int64()), pa.string()),
                    3,
                    "0",
                ),
                pa.scalar(""),
            )
            fpath = pc.binary_join_element_wise(
                pa.scalar("f_"),
                pc.cast(f["doc_id"], pa.string()),
                pa.scalar(""),
            )
            content = (
                pc.binary_join_element_wise(
                    f[text_col].combine_chunks()
                    if isinstance(f[text_col], pa.ChunkedArray)
                    else f[text_col],
                    pa.scalar(tag),
                    pa.scalar(""),
                )
                if tag
                else f[text_col]
            )
            return pa.table(
                {
                    "repo": frepo,
                    "path": fpath,
                    "commit": pa.array(
                        [cnum.rjust(40, "0")] * f.num_rows, pa.string()
                    ),
                    "content": content,
                }
            )

        parts = [
            pa.table(
                {
                    "repo": repo,
                    "path": path,
                    "commit": pa.array(
                        ["1".rjust(40, "0")] * b.num_rows, pa.string()
                    ),
                    "content": b[text_col],
                }
            )
        ]
        v2 = version(pa.array(ids % 5 == 0), " [v2]", "2")
        if v2 is not None:
            parts.append(v2)
        v3 = version(pa.array(ids % 7 == 0), " [v3]", "3")
        if v3 is not None:
            parts.append(v3)
        return pa.concat_tables(parts)

    return ds.map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


REPO_HISTORY_SQL = """
rh AS (
    SELECT 'r' || lpad(CAST(doc_id % 40 AS VARCHAR), 3, '0') AS repo,
           'f_' || doc_id AS path,
           lpad('1', 40, '0') AS commit, text AS content
    FROM documents
    UNION ALL
    SELECT 'r' || lpad(CAST(doc_id % 40 AS VARCHAR), 3, '0'),
           'f_' || doc_id, lpad('2', 40, '0'), text || ' [v2]'
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT 'r' || lpad(CAST(doc_id % 40 AS VARCHAR), 3, '0'),
           'f_' || doc_id, lpad('3', 40, '0'), text || ' [v3]'
    FROM documents WHERE doc_id % 7 = 0
)
"""


REPO_FORKED_SQL = """
rp AS (
    SELECT 'r' || lpad(CAST(doc_id % 40 AS VARCHAR), 3, '0') AS repo,
           'f_' || doc_id AS path,
           lpad(CAST(doc_id % 40 AS VARCHAR), 40, '0') AS commit,
           (['py', 'rs', 'go', 'md'])[(doc_id % 4) + 1] AS lang,
           text AS content
    FROM documents
    UNION ALL
    SELECT 'r' || lpad(CAST(doc_id % 40 AS VARCHAR), 3, '0') || '_fork',
           'f_' || doc_id,
           lpad(CAST((doc_id % 40) + 41 AS VARCHAR), 40, '0'),
           (['py', 'rs', 'go', 'md'])[(doc_id % 4) + 1],
           text
    FROM documents
    WHERE (doc_id % 40) % 4 = 0 AND doc_id % 3 <> 0
)
"""


def pii_planted(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → PP: deterministic PII planted into a third of the docs
    (emails on doc_id%3==0, IPv4 on %5==1, SSN-shaped ids on %7==2) so the
    pii_scrub operator has known redaction targets under the DuckDB oracle
    (``PII_PLANTED_SQL`` mirrors every rule literally)."""

    def plant(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b[text_col].to_pylist()
        out = []
        for i, t in zip(ids, texts):
            if t is None:
                out.append(None)
                continue
            if i % 3 == 0:
                t += f" contact user{i}@example.com now"
            if i % 5 == 1:
                t += f" from host 10.{i % 200}.3.{i % 250}"
            if i % 7 == 2:
                t += f" id {i % 900:03d}-42-{i % 9000:04d}"
            out.append(t)
        return pa.table(
            {"doc_id": b["doc_id"], "text": pa.array(out, pa.string())}
        )

    return ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


PII_PLANTED_SQL = """
pp AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0
                THEN ' contact user' || doc_id || '@example.com now'
                ELSE '' END
           || CASE WHEN doc_id % 5 = 1
                THEN ' from host 10.' || (doc_id % 200) || '.3.'
                     || (doc_id % 250)
                ELSE '' END
           || CASE WHEN doc_id % 7 = 2
                THEN ' id ' || lpad(CAST(doc_id % 900 AS VARCHAR), 3, '0')
                     || '-42-' || lpad(CAST(doc_id % 9000 AS VARCHAR), 4, '0')
                ELSE '' END
           AS text
    FROM documents
)
"""


def incremental_new(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → NC: a deterministic "new crawl shard" for
    :func:`quichash_ray.pipelines.incremental.incremental_dedup` — even
    doc_ids keep their text verbatim (duplicates of the old corpus), odd
    ids get ' ~fresh' appended (novel content). ``INCREMENTAL_NEW_SQL``
    mirrors the rule literally; both sides then decide dup/novel by actual
    digest membership, so the oracle checks the semantics, not the rule."""

    def mutate(b: pa.Table) -> pa.Table:
        fresh = pc.invert(_mod_eq(b["doc_id"], 2, 0))
        text = pc.if_else(
            fresh,
            pc.binary_join_element_wise(
                b[text_col], pa.scalar(" ~fresh"), pa.scalar("")
            ),
            b[text_col],
        )
        return pa.table({"doc_id": b["doc_id"], "text": text})

    return ds.map_batches(
        mutate, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


INCREMENTAL_NEW_SQL = """
nc AS (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN text
                ELSE text || ' ~fresh' END AS text
    FROM documents
)
"""


def quote_eval(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → QE: an eval corpus of verbatim QUOTES — for docs with
    doc_id%9==0 and ≥17 whitespace tokens, the 15-token slice
    tokens[2:17] — the embedded-passage leakage shape that only
    k-token-gram overlap decontamination catches (the exact and
    normalized-fingerprint tiers see a different document).
    ``QUOTE_EVAL_SQL`` mirrors the rule literally."""
    import re

    tok_re = re.compile(r"\S+")

    def build(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_t = [], []
        for i, t in zip(ids, texts):
            if t is None or i % 9 != 0:
                continue
            toks = tok_re.findall(t)
            if len(toks) < 17:
                continue
            out_id.append(i)
            out_t.append(" ".join(toks[2:17]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_t, pa.string()),
            }
        )

    return ds.map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


QUOTE_EVAL_SQL = r"""
qe AS (
    SELECT doc_id,
           array_to_string(
             (regexp_extract_all(text, '\S+'))[3:17], ' '
           ) AS text
    FROM documents
    WHERE doc_id % 9 = 0
      AND len(regexp_extract_all(text, '\S+')) >= 17
)
"""


def clone_planted(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → CP: every doc plus, for doc_id%6==0, a partial clone
    (id + 1000000) with a planted preamble prepended — the clone shares
    every interior token k-gram with its source while its head grams
    differ, the winnowing detector's target shape. ``CLONE_PLANTED_SQL``
    is the literal mirror."""

    def plant(b: pa.Table) -> pa.Table:
        base = pa.table({"doc_id": b["doc_id"], "text": b[text_col]})
        cl = b.filter(_mod_eq(b["doc_id"], 6, 0))
        if cl.num_rows == 0:
            return base
        import pyarrow.compute as _pc

        clone = pa.table(
            {
                "doc_id": _pc.add(cl["doc_id"], pa.scalar(1000000, pa.int64())),
                "text": _pc.binary_join_element_wise(
                    pa.scalar("intro preamble tokens here"),
                    cl[text_col],
                    pa.scalar(" "),
                ),
            }
        )
        return pa.concat_tables([base, clone])

    return ds.map_batches(
        plant, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


CLONE_PLANTED_SQL = """
cp AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000,
           'intro preamble tokens here ' || text
    FROM documents WHERE doc_id % 6 = 0
)
"""


def code_planted(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → CPD: deterministic comment-laden code suffixes for
    :func:`quichash_ray.pipelines.codeclean.comment_scrub` — a block
    comment on doc_id%2==0, a ``//`` line comment on %3==0, a ``#`` line
    comment on %5==0. ``CODE_PLANTED_SQL`` mirrors every rule literally."""

    def plant(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b[text_col].to_pylist()
        out = []
        for i, t in zip(ids, texts):
            if t is None:
                out.append(None)
                continue
            if i % 2 == 0:
                t += f"\nint x = {i}; /* block\nnote {i} */ return x;"
            if i % 3 == 0:
                t += f"\nlet y = {i}; // line note {i}"
            if i % 5 == 0:
                t += f"\nvalue: {i}  # hash note {i}"
            out.append(t)
        return pa.table(
            {"doc_id": b["doc_id"], "text": pa.array(out, pa.string())}
        )

    return ds.map_batches(
        plant, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


CODE_PLANTED_SQL = """
cpd AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 2 = 0
                THEN chr(10) || 'int x = ' || doc_id || '; /* block'
                     || chr(10) || 'note ' || doc_id || ' */ return x;'
                ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                THEN chr(10) || 'let y = ' || doc_id || '; // line note '
                     || doc_id
                ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                THEN chr(10) || 'value: ' || doc_id || '  # hash note '
                     || doc_id
                ELSE '' END
           AS text
    FROM documents
)
"""


_BOILERPLATE = "COPYRIGHT 2024 EXAMPLE CORP ALL RIGHTS RESERVED"
_NEWSLETTER = "subscribe to our newsletter for updates"


def line_planted(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → LP: multi-line docs with planted boilerplate (the test
    documents are single-line). Per doc: the original text, a boilerplate
    line in EVERY doc (df = corpus), a newsletter line in a third of docs,
    the boilerplate REPEATED within-doc on doc_id%4==1 (within-doc dup
    signal), and a unique footer line (df = 1). doc_id%97==13 docs get NULL
    text so the null-text contract (engine and oracle both skip them — see
    linededup module docstring) is actually exercised at every sf.
    ``LINE_PLANTED_SQL`` is the literal mirror."""

    def plant(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b[text_col].to_pylist()
        out = []
        for i, t in zip(ids, texts):
            if t is None or i % 97 == 13:
                out.append(None)
                continue
            lines = [t, _BOILERPLATE]
            if i % 3 == 0:
                lines.append(_NEWSLETTER)
            if i % 4 == 1:
                lines.append(_BOILERPLATE)
            lines.append(f"doc footer {i}")
            out.append("\n".join(lines))
        return pa.table(
            {"doc_id": b["doc_id"], "text": pa.array(out, pa.string())}
        )

    return ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


LINE_PLANTED_SQL = """
lp AS (
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 13 THEN NULL ELSE
           text
           || chr(10) || 'COPYRIGHT 2024 EXAMPLE CORP ALL RIGHTS RESERVED'
           || CASE WHEN doc_id % 3 = 0
                THEN chr(10) || 'subscribe to our newsletter for updates'
                ELSE '' END
           || CASE WHEN doc_id % 4 = 1
                THEN chr(10)
                     || 'COPYRIGHT 2024 EXAMPLE CORP ALL RIGHTS RESERVED'
                ELSE '' END
           || chr(10) || 'doc footer ' || doc_id
           END AS text
    FROM documents
)
"""


def case_variants(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → CV: every document verbatim, plus — for doc_id%6==0 —
    a 'case variant' copy (doc_id + 10_000_000) whose text is
    ``' ' || upper(text) || ' !!!'``: identical after C4-style
    canonicalization (lowercase, punctuation→space, whitespace collapse)
    but a different byte string, so exact dedup misses it and
    normalized dedup must catch it. Mirrored literally in
    ``CASE_VARIANTS_SQL``."""

    def expand(b: pa.Table) -> pa.Table:
        sel = b.filter(_mod_eq(b["doc_id"], 6, 0))
        vtext = pc.binary_join_element_wise(
            pa.scalar(" "),
            pc.utf8_upper(sel[text_col]),
            pa.scalar(" !!!"),
            pa.scalar(""),
        )
        vid = pc.add(sel["doc_id"], pa.scalar(10_000_000, pa.int64()))
        return pa.concat_tables(
            [
                pa.table({"doc_id": b["doc_id"], "text": b[text_col]}),
                pa.table({"doc_id": pc.cast(vid, pa.int64()), "text": vtext}),
            ]
        )

    return ds.map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


CASE_VARIANTS_SQL = """
cv AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id,
           ' ' || upper(text) || ' !!!' AS text
    FROM documents WHERE doc_id % 6 = 0
)
"""


def fuzzy_eval(ds: Dataset, text_col: str = "text") -> Dataset:
    """documents → FE: a fuzzy-leaked eval corpus — for doc_id%11==0,
    the document with every 1-based token position i where i%10==8
    REMOVED (≈10% token deletion): a near-duplicate that exact and
    13-gram decontamination miss but shingle-containment catches.
    Mirrored literally in ``FUZZY_EVAL_SQL``."""
    import re

    tok_re = re.compile(r"\S+")

    def build(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_t = [], []
        for i, t in zip(ids, texts):
            if t is None or i % 11 != 0:
                continue
            toks = [
                tok
                for j, tok in enumerate(tok_re.findall(t), start=1)
                if j % 10 != 8
            ]
            if not toks:
                continue
            out_id.append(i)
            out_t.append(" ".join(toks))
        return pa.table(
            {
                "eval_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_t, pa.string()),
            }
        )

    return ds.map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


FUZZY_EVAL_SQL = r"""
fe AS (
    SELECT doc_id AS eval_id,
           string_agg(t[i], ' ' ORDER BY i) AS text
    FROM (
        SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
        FROM (
            SELECT doc_id, regexp_extract_all(text, '\S+') AS t
            FROM documents
            WHERE text IS NOT NULL AND doc_id % 11 = 0
        )
    )
    WHERE i % 10 <> 8
    GROUP BY doc_id
)
"""
