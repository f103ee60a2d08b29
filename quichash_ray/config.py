"""Pipeline configuration — the builder-API analog.

The reference exposes builder-style engines (``ScanEngine::with_parallel/
with_fast_mode/with_ignore``, /root/reference/src/scan.rs:52-91;
``DedupEngine::with_fast_mode/with_parallel``, dedup.rs:152-173). Here a
single frozen dataclass carries every knob and is consumed by the pipeline
builders in :mod:`quichash_ray.pipelines`.

The fuzzy-stage constants are the fixed config the recall target is measured
against (BASELINE.json north_star / FIXTURES.md §7): k=5 token shingles,
128 MinHash permutations (seed 42), LSH b=16 × r=8, 64-bit SimHash with
Hamming radius 3 via 4×16-bit pigeonhole chunks, suffix-array substring stage
on clusters ≤64 members with min span 50 tokens.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from quichash_ray.functions.fastmode import FAST_MODE_SAMPLE_SIZE


@dataclass(frozen=True)
class FuzzyConfig:
    shingle_k: int = 5
    num_perms: int = 128
    seed: int = 42
    lsh_bands: int = 16
    lsh_rows: int = 8  # bands * rows == num_perms
    simhash_bits: int = 64
    simhash_radius: int = 3
    simhash_chunks: int = 4  # pigeonhole chunks of bits/chunks bits each
    jaccard_threshold: float = 0.80  # verify threshold for LSH candidates
    suffix_max_cluster: int = 64
    suffix_min_span_tokens: int = 50

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.num_perms:
            raise ValueError("lsh_bands * lsh_rows must equal num_perms")


@dataclass(frozen=True)
class PipelineConfig:
    # exact stage
    algorithms: tuple[str, ...] = ("sha256",)
    dedup_algorithm: str = "sha256"  # reference dedup hard-codes blake3
    # (dedup.rs:279-282); sha256 is our default content key because hashlib's
    # C sha256 is the fastest *available* kernel here — set "blake3" for
    # strict reference parity.
    fast_mode: bool = False
    fast_sample_size: int = FAST_MODE_SAMPLE_SIZE
    # fuzzy stage
    fuzzy: FuzzyConfig = field(default_factory=FuzzyConfig)
    # execution knobs (per-stage sizing, multi-node-minded)
    batch_size: int = 1024
    minhash_concurrency: int = 8
    # partitioning: number of hash partitions for shuffle outputs at scale
    num_partitions: int = 64
