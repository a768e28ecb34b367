"""Exact all-pairs recall oracle (P12, BASELINE.json:2,14).

At toy scale the oracle computes, driver-side in numpy/pandas, the exact set
of duplicate pairs under the IDENTICAL DedupConfig the engine uses (same
normalization, same shingle hashing, same tau/radius/containment rules), then
scores the engine's clustering: recall = |engine_pairs ∩ oracle_pairs| /
|oracle_pairs| over same-cluster pairs.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG
from jsonschema_jl_spark.operators.minhash import normalize_text, shingle_set_np


def oracle_dup_pairs(pdf: pd.DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> set[tuple[str, str]]:
    """Exact all-pairs duplicate relation over (image_id, caption, phash)."""
    ids = pdf["image_id"].tolist()
    caps = [normalize_text(c) for c in pdf["caption"].tolist()]
    sets = [shingle_set_np(c, cfg.shingle_k) for c in pdf["caption"].tolist()]
    phash = pdf["phash"].to_numpy(dtype=np.int64).view(np.uint64)
    pairs: set[tuple[str, str]] = set()
    n = len(ids)
    for i, j in combinations(range(n), 2):
        dup = False
        a, b = sets[i], sets[j]
        inter = np.intersect1d(a, b, assume_unique=True).size
        if inter / (a.size + b.size - inter) >= cfg.jaccard_tau:
            dup = True
        if not dup and bin(int(phash[i] ^ phash[j])).count("1") <= cfg.hamming_radius:
            dup = True
        if not dup:
            ci, cj = caps[i], caps[j]
            if len(ci) >= cfg.min_contained_len and len(ci) < len(cj) and ci in cj:
                dup = True
            elif len(cj) >= cfg.min_contained_len and len(cj) < len(ci) and cj in ci:
                dup = True
        if dup:
            key = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
            pairs.add(key)
    return pairs


def cluster_pairs(labels: pd.DataFrame, id_col: str = "image_id", comp_col: str = "component") -> set[tuple[str, str]]:
    """All unordered same-cluster pairs implied by a labeling."""
    out: set[tuple[str, str]] = set()
    for _, grp in labels.groupby(comp_col):
        members = sorted(grp[id_col].tolist())
        out.update(combinations(members, 2))
    return out


def transitive_closure(pairs: set[tuple[str, str]]) -> set[tuple[str, str]]:
    """Close the oracle pair set under connectivity (clusters are components,
    so engine same-cluster pairs are judged against the closure)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[str, list[str]] = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    out: set[tuple[str, str]] = set()
    for members in groups.values():
        out.update(combinations(sorted(members), 2))
    return out


def recall(engine_pairs: set[tuple[str, str]], oracle_pairs: set[tuple[str, str]]) -> float:
    if not oracle_pairs:
        return 1.0
    return len(engine_pairs & oracle_pairs) / len(oracle_pairs)
