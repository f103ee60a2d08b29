"""quichash_ray — a Ray-Data-native dedup & data-processing engine.

A from-scratch re-expression of the capabilities of vyrti/quichash
(/root/reference, Rust CLI) as streaming Ray Data pipelines over Arrow:
exact content-digest dedup, verify/compare/analyze DB operations, and the
scale-out fuzzy layer (MinHash+LSH, SimHash, suffix-array substring,
union-find clustering) the reference's semantics generalize to.

Layout:
  functions/  pure kernels (digests, fast-mode sampling, path/text ops)
  sources/    corpus synthesis, legacy-DB ingestion, parquet helpers
  stages/     map_batches / actor-pool stage builders
  pipelines/  end-to-end composed pipelines (dedup, verify, fuzzy, ...)
  state/      checkpoint / lineage / resume
"""

__version__ = "0.1.0"
