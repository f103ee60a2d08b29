"""MinHash + SimHash signature stage — the stateful actor-pool kernel.

Per north_star config (FIXTURES.md §7): 5-token shingles, 128 MinHash
permutations (seed 42), LSH banding b=16 × r=8, 64-bit SimHash.

``SignatureActor`` is the reference pattern "build state once, apply per
record" (the gitignore-matcher analog, /root/reference/src/ignore_handler.rs:
27-70 / SURVEY ST5): the permutation table is built once per actor in
``__init__`` and reused across every batch — pass the CLASS to
``map_batches(SignatureActor, concurrency=N, batch_size=B)``.

Permutations are ``h_i(s) = (a_i * s + b_i) mod 2^64`` with odd ``a_i`` —
deterministic from the seed, vectorized as one (num_perms × n_shingles)
numpy broadcast per row. Band keys hash each r-row signature slice to one
64-bit key; LSH bucketing is then a plain groupby on ``(band_id, band_key)``.

SimHash: bit j of the 64-bit signature is the sign of Σ±1 over shingle
hashes' bit j — vectorized via unpackbits over the shingle array.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from quichash_ray.config import FuzzyConfig
from quichash_ray.pipelines.ngram import gram_hashes


class SignatureActor:
    """(id, text) batches → (id, minhash list, simhash, n_shingles)."""

    def __init__(
        self,
        cfg: FuzzyConfig | None = None,
        id_col: str = "row_id",
        text_col: str = "content",
        keep_shingles: bool = False,
    ):
        self.cfg = cfg or FuzzyConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.keep_shingles = keep_shingles
        rng = np.random.Generator(np.random.Philox(key=[self.cfg.seed, 0]))
        # odd multipliers → bijections mod 2^64
        self.a = (
            rng.integers(1, 1 << 63, size=self.cfg.num_perms, dtype=np.uint64)
            * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rng.integers(
            0, 1 << 63, size=self.cfg.num_perms, dtype=np.uint64
        )
        self._bit_cols = np.arange(64, dtype=np.uint64)

    def _signatures(self, shingles: np.ndarray) -> tuple[np.ndarray, int]:
        """Single-doc path (kept for tests) — → (sig uint64[perms], simhash)."""
        if len(shingles) == 0:
            return np.full(self.cfg.num_perms, np.iinfo(np.uint64).max, np.uint64), 0
        with np.errstate(over="ignore"):
            hashed = self.a[:, None] * shingles[None, :] + self.b[:, None]
        sig = hashed.min(axis=1)
        bits = (shingles[:, None] >> self._bit_cols[None, :]) & np.uint64(1)
        votes = 2 * bits.astype(np.int64).sum(axis=0) - len(shingles)
        sim = np.uint64(0)
        for j in range(64):
            if votes[j] > 0:
                sim |= np.uint64(1) << np.uint64(j)
        return sig, int(sim)

    # L2-blocking target: per-chunk shingle slice (and the one temp vector
    # the perm loop allocates) stays cache-resident across the 128 MinHash +
    # 64 SimHash passes. The unblocked kernel streamed ~1.3 MB/row from DRAM
    # 192 times per batch and saturated memory bandwidth at 32 cores
    # (round-1 scaling profile: 2.6x at 4x CPUs).
    _CHUNK_SHINGLES = 24 * 1024  # 192 KB of uint64 per pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized: all docs' shingles concatenate into one array;
        per-doc MinHash minima come from ``np.minimum.reduceat`` per
        permutation and SimHash bit votes from ``np.add.reduceat``, both
        applied over L2-sized chunks of documents — no per-row numpy
        dispatch in the hot loop and no DRAM streaming per pass."""
        cfg = self.cfg
        ids: list[int] = []
        sh_arrays: list[np.ndarray] = []
        for rid, text in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            if text is None:
                continue
            ids.append(rid)
            sh_arrays.append(gram_hashes(text.split(), cfg.shingle_k))
        n = len(ids)
        lens = np.array([len(s) for s in sh_arrays], dtype=np.int64)
        nonempty = lens > 0
        all_sh = (
            np.concatenate([s for s in sh_arrays if len(s)])
            if nonempty.any()
            else np.empty(0, np.uint64)
        )
        # segment boundaries over non-empty docs only (reduceat needs them)
        ne_lens = lens[nonempty]
        bounds = np.concatenate(([0], np.cumsum(ne_lens)))
        sig = np.full((n, cfg.num_perms), np.iinfo(np.uint64).max, np.uint64)
        sim = np.zeros(n, dtype=np.uint64)
        if len(all_sh):
            ne_idx = np.flatnonzero(nonempty)
            n_ne = len(ne_idx)
            weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
            d0 = 0
            while d0 < n_ne:
                # extend the doc chunk until its shingle span exceeds the
                # L2 target (always at least one doc)
                d1 = int(
                    np.searchsorted(
                        bounds, bounds[d0] + self._CHUNK_SHINGLES, "right"
                    )
                ) - 1
                d1 = max(d1, d0 + 1)
                s0, s1 = bounds[d0], bounds[d1]
                sh_c = all_sh[s0:s1]
                seg_c = bounds[d0:d1] - s0
                rows = ne_idx[d0:d1]
                with np.errstate(over="ignore"):
                    for i in range(cfg.num_perms):
                        h = self.a[i] * sh_c + self.b[i]
                        sig[rows, i] = np.minimum.reduceat(h, seg_c)
                votes = np.empty((d1 - d0, 64), dtype=np.int64)
                for j in range(64):
                    bits = ((sh_c >> np.uint64(j)) & np.uint64(1)).astype(
                        np.int64
                    )
                    votes[:, j] = np.add.reduceat(bits, seg_c)
                majority = (2 * votes) > ne_lens[d0:d1, None]
                sim[rows] = (majority.astype(np.uint64) * weights[None, :]).sum(
                    axis=1, dtype=np.uint64
                )
                d0 = d1
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1).view(np.int64), pa.int64()),
                cfg.num_perms,
            ),
            "simhash": pa.array(sim.view(np.int64), pa.int64()),
            "n_shingles": pa.array(lens, pa.int64()),
        }
        if self.keep_shingles:
            # byte image of each doc's sorted uint64 shingle set — binary
            # columns move through Ray's sort shuffle as flat buffers
            # (list<int64> was the measured 10x penalty, NOTES_r1 thread 2)
            from quichash_ray.stages.pairverify import uint64s_to_binary_rows

            offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            flat = (
                np.concatenate(sh_arrays)
                if n and offs[-1]
                else np.empty(0, np.uint64)
            )
            cols["shingles"] = uint64s_to_binary_rows(flat, offs)
        return pa.table(cols)


_WORKER_CACHE: dict[tuple, "SignatureActor"] = {}


def make_signature_fn(
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    text_col: str = "content",
    keep_shingles: bool = False,
):
    """Stateless-task variant of :class:`SignatureActor`: a plain function
    whose per-worker state (the permutation table) is built once per worker
    PROCESS via a module-global cache — the same build-once amortization as
    the actor pool, without paying actor-process spin-up (one new process
    per pool slot) on short jobs. Use the actor-pool class when the state is
    heavy (models, indexes); use this when it is cheap to build but worth
    caching."""
    cfg = cfg or FuzzyConfig()
    key = (cfg, id_col, text_col, keep_shingles)

    def fn(batch: pa.Table) -> pa.Table:
        actor = _WORKER_CACHE.get(key)
        if actor is None:
            actor = SignatureActor(key[0], key[1], key[2], key[3])
            _WORKER_CACHE[key] = actor
        return actor(batch)

    return fn


def band_rows(
    signatures, cfg: FuzzyConfig | None = None, id_col: str = "row_id"
):
    """Signature table → (id, band_id, band_key): b rows per document.

    band_key is a 64-bit polynomial hash of the band's r signature values —
    two docs share a band bucket iff their r-slices are identical (up to
    hash collision, ~2^-64 per slice pair).
    """
    cfg = cfg or FuzzyConfig()
    b_, r_ = cfg.lsh_bands, cfg.lsh_rows
    mult = np.uint64(0x9E3779B97F4A7C15)

    def kernel(batch: pa.Table) -> pa.Table:
        mh = batch["minhash"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        n = len(mh)
        flat = np.asarray(mh.flatten(), dtype=np.int64).view(np.uint64)
        sig = flat.reshape(n, b_ * r_)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        with np.errstate(over="ignore"):
            keys = np.zeros((n, b_), dtype=np.uint64)
            for band in range(b_):
                h = np.full(n, np.uint64(band * 2 + 1), np.uint64)
                for j in range(r_):
                    h = (h * mult) ^ sig[:, band * r_ + j]
                keys[:, band] = h * mult
        out_ids = np.repeat(ids, b_)
        out_band = np.tile(np.arange(b_, dtype=np.int64), n)
        out_key = keys.reshape(-1).view(np.int64)
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "band_id": pa.array(out_band, pa.int64()),
                "band_key": pa.array(out_key, pa.int64()),
            }
        )

    return signatures.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )
