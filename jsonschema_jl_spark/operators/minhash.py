"""Caption normalization, char shingling and MinHash signatures (P2+P3).

All kernels are Arrow-batched pandas UDFs with pure-numpy inner loops — no
per-row Python UDFs (BASELINE.json:15).  The shingle/permutation parameters
come exclusively from DedupConfig so the engine and the recall oracle can
never diverge (BASELINE.json:6).

Hashing scheme (documented, deterministic):
  * normalize: NFC -> casefold -> whitespace collapse (P2)
  * shingles: k-byte windows of the UTF-8 normalized text, hashed with a
    polynomial rolling hash in uint64 (natural mod-2^64 wraparound), deduped
  * minhash_i(S) = min_{x in S} (a_i * x + b_i  mod 2^64) — multiply-add
    universal-style hashing in the 2^64 ring (vectorized; the classic
    mod-Mersenne-prime scheme needs 128-bit intermediates numpy lacks)
"""

from __future__ import annotations

import unicodedata
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG

_POLY_BASE = np.uint64(1099511628211)  # FNV-ish odd multiplier


def normalize_text(s: str) -> str:
    """NFC + casefold + whitespace collapse.  Single definition shared by the
    distributed kernel and the driver-side exact oracle."""
    s = unicodedata.normalize("NFC", s)
    s = s.casefold()
    return " ".join(s.split())


def shingle_set_np(s: str, k: int) -> np.ndarray:
    """Deduped uint64 hashes of all k-byte windows of the normalized text.
    Texts shorter than k hash as a single whole-text shingle."""
    b = normalize_text(s).encode("utf-8")
    arr = np.frombuffer(b, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    if arr.size <= k:
        win = arr[None, :]
        powers = _POLY_BASE ** np.arange(arr.size, dtype=np.uint64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(arr, k)
        powers = _POLY_BASE ** np.arange(k, dtype=np.uint64)
    h = win.astype(np.uint64) @ powers  # wraps mod 2^64
    return np.unique(h)


def _perm_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(cfg.minhash_seed)
    a = rng.integers(1, 1 << 63, size=cfg.num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=cfg.num_perm, dtype=np.uint64)
    return a, b


def minhash_np(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signature for one shingle set: min over (a*x+b) per permutation."""
    sh = shingles.astype(np.uint64)
    # (P, S) intermediate chunked over permutations to bound memory
    out = np.empty(a.size, dtype=np.uint64)
    step = 32
    for i in range(0, a.size, step):
        h = a[i : i + step, None] * sh[None, :] + b[i : i + step, None]
        out[i : i + step] = h.min(axis=1)
    return out


def minhash_batch(texts: pd.Series, cfg: DedupConfig) -> tuple[list, list]:
    """Vectorized per-batch kernel: returns (shingle sets, signatures) as
    lists of int64 ndarrays.  Signatures are computed with a single
    reduceat over the concatenated shingle arrays per permutation chunk —
    O(P * total_shingles) with no per-row Python in the hot loop."""
    a, b = _perm_params(cfg)
    sets = [shingle_set_np(t if t is not None else "", cfg.shingle_k) for t in texts]
    lens = np.fromiter((s.size for s in sets), dtype=np.int64, count=len(sets))
    if len(sets) == 0:
        return [], []
    flat = np.concatenate(sets) if len(sets) else np.empty(0, dtype=np.uint64)
    offsets = np.zeros(len(sets), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    P = cfg.num_perm
    sigs = np.empty((P, len(sets)), dtype=np.uint64)
    step = 16
    for i in range(0, P, step):
        h = a[i : i + step, None] * flat[None, :] + b[i : i + step, None]
        sigs[i : i + step, :] = np.minimum.reduceat(h, offsets, axis=1)
    sigs_i64 = sigs.view(np.int64).T  # (rows, P)
    return [s.view(np.int64) for s in sets], [sigs_i64[r] for r in range(len(sets))]


_SIG_SCHEMA = T.StructType(
    [
        T.StructField("shingles", T.ArrayType(T.LongType()), False),
        T.StructField("minhash", T.ArrayType(T.LongType()), False),
    ]
)


def with_signatures(
    df: DataFrame, text_col: str = "caption", cfg: DedupConfig = DEFAULT_CONFIG,
    repartition: bool = True,
) -> DataFrame:
    """Add `shingles: array<long>` and `minhash: array<long>` columns.

    The Arrow kernel's parallelism equals the input partition count; a
    column-pruned scan of a few large files yields too few partitions to
    keep every core busy, so by default the (narrow) input is rebalanced to
    the cluster's parallelism first — a cheap shuffle of (id, text, phash)
    that the banding shuffle downstream would pay anyway."""

    @F.pandas_udf(_SIG_SCHEMA)
    def sig_udf(batch_iter: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in batch_iter:
            sets, sigs = minhash_batch(texts, cfg)
            yield pd.DataFrame({"shingles": sets, "minhash": sigs})

    if repartition:
        df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    out = df.withColumn("__sig", sig_udf(F.col(text_col)))
    return out.withColumn("shingles", F.col("__sig.shingles")).withColumn(
        "minhash", F.col("__sig.minhash")
    ).drop("__sig")
