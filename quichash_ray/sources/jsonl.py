"""JSONL corpus interchange — read/write (id, text, ...) document tables
as newline-delimited JSON, the lingua franca of public text-corpus dumps.

Thin, schema-checked wrappers over Ray Data's native readers/writers (the
heavy lifting — parallel file splits, streaming, compression codecs — is
Ray's): ``read_corpus_jsonl`` validates that the id/text columns exist and
normalizes the id to int64 up front so every downstream operator (digest
tables, exchanges, winnowing) sees the engine-wide schema contract;
``write_corpus_jsonl`` emits one file per block (resumable layout — a
partial job leaves complete files behind, same discipline as the Parquet
sinks).

Parquet remains the performance format (columnar pruning at the read);
JSONL is for interchange with external corpora and tooling.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def read_corpus_jsonl(
    paths: str | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    **read_kwargs,
) -> Dataset:
    """JSONL file(s)/dir → Dataset with ``id_col`` coerced to int64.

    Raises ``ValueError`` if the required columns are missing — a loud
    schema check at the boundary instead of a KeyError deep inside a
    worker task.
    """
    import ray.data

    ds = ray.data.read_json(paths, **read_kwargs)
    schema = ds.schema()
    missing = {id_col, text_col} - set(schema.names)
    if missing:
        raise ValueError(
            f"JSONL corpus at {paths!r} is missing required column(s) "
            f"{sorted(missing)}; found {list(schema.names)}"
        )

    idx = schema.names.index(id_col)
    if pa.types.is_int64(schema.types[idx]):
        return ds

    def coerce(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = b.schema.get_field_index(id_col)
        return b.set_column(i, id_col, pc.cast(b[id_col], pa.int64()))

    return ds.map_batches(
        coerce, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def write_corpus_jsonl(ds: Dataset, path: str, **write_kwargs) -> None:
    """Dataset → newline-delimited JSON under ``path`` (one file per
    block; a re-run into a fresh dir is the resume unit)."""
    ds.write_json(path, **write_kwargs)
