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
        """→ (minhash signature uint64[num_perms], simhash uint64)."""
        if len(shingles) == 0:
            return np.full(self.cfg.num_perms, np.iinfo(np.uint64).max, np.uint64), 0
        with np.errstate(over="ignore"):
            hashed = self.a[:, None] * shingles[None, :] + self.b[:, None]
        sig = hashed.min(axis=1)
        # simhash: per-bit majority over shingle hashes
        bits = (shingles[:, None] >> self._bit_cols[None, :]) & np.uint64(1)
        votes = 2 * bits.astype(np.int64).sum(axis=0) - len(shingles)
        sim = np.uint64(0)
        for j in range(64):
            if votes[j] > 0:
                sim |= np.uint64(1) << np.uint64(j)
        return sig, int(sim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids, sigs, sims, counts, shingle_lists = [], [], [], [], []
        for rid, text in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            if text is None:
                continue
            sh = gram_hashes(text.split(), cfg.shingle_k)
            sig, sim = self._signatures(sh)
            ids.append(rid)
            sigs.append(sig.view(np.int64))
            sims.append(np.int64(np.uint64(sim).astype(np.int64)))
            counts.append(len(sh))
            if self.keep_shingles:
                shingle_lists.append(sh.view(np.int64))
        cols = {
            self.id_col: pa.array(ids, pa.int64()),
            "minhash": pa.array(
                [s.tolist() for s in sigs], pa.list_(pa.int64())
            ),
            "simhash": pa.array(sims, pa.int64()),
            "n_shingles": pa.array(counts, pa.int64()),
        }
        if self.keep_shingles:
            cols["shingles"] = pa.array(
                [s.tolist() for s in shingle_lists], pa.list_(pa.int64())
            )
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
