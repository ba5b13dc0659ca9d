"""Pure-Python HNSW — executable graph-ANN parity for environments
without the optional hnswlib wheel.

The reference's core search structure is an HNSW graph per vector
attribute (knn/knn.cpp:411-540, built on hnswlib with M=16 /
efConstruction=200 defaults, knn/knn.h:48-55). This module implements the
published algorithm (Malkov & Yashunin, arXiv:1603.09320: insert with
exponential level sampling, greedy descent through upper layers,
best-first beam search with `ef` candidates at layer 0) in numpy-backed
Python. It exists so the graph-ANN code path is *executed and
recall-tested* everywhere — `knn_topk_partitioned_ann` uses hnswlib when
importable and this implementation otherwise.

Scale posture: one transient index per partition inside mapInPandas
(build O(n log n) per partition, searched once per query), merged by a
global TakeOrdered — identical to the hnswlib path. The Python build is
~100x slower than the C++ one, so partitions should stay small
(PY_HNSW_MAX_PARTITION_ROWS guard); at production scale, install the
wheel.
"""

from __future__ import annotations

import heapq
import math
import random
from typing import Sequence

import numpy as np

PY_HNSW_MAX_PARTITION_ROWS = 200_000


class HnswIndex:
    """Hierarchical Navigable Small World graph over float32 vectors.

    Metrics follow hnswlib conventions: 'l2' -> squared L2, 'ip' ->
    1 - dot, 'cosine' -> 1 - cos (vectors are NOT re-normalized here;
    pass normalized data for true cosine, as hnswlib's cosine space
    normalizes on add)."""

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        M: int = 16,
        ef_construction: int = 200,
        seed: int = 42,
    ):
        self.dim = dim
        self.metric = metric
        self.M = M
        self.M0 = 2 * M
        self.ml = 1.0 / math.log(M)
        self.ef_construction = ef_construction
        self._rng = random.Random(seed)
        self._vecs: list[np.ndarray] = []
        self._norms: list[float] = []
        self._labels: list[int] = []
        # graph[node][level] -> list of neighbor node ids
        self._graph: list[list[list[int]]] = []
        self._entry: int | None = None
        self._max_level = -1
        # Distance-computation counter — pDistanceComputations parity
        # (knn/knn.h:117); counts build + search evaluations.
        self.n_dist_calcs = 0

    # ------------------------------------------------------------ distance

    def _dist(self, q: np.ndarray, qn: float, node: int) -> float:
        self.n_dist_calcs += 1
        v = self._vecs[node]
        if self.metric == "l2":
            d = q - v
            return float(np.dot(d, d))
        dot = float(np.dot(q, v))
        if self.metric == "ip":
            return 1.0 - dot
        denom = (qn * self._norms[node]) or 1e-30
        return 1.0 - dot / denom

    # ------------------------------------------------------------- insert

    def add(self, vec: Sequence[float], label: int) -> None:
        q = np.asarray(vec, dtype=np.float32)
        node = len(self._vecs)
        self._vecs.append(q)
        self._norms.append(float(np.linalg.norm(q)) or 1e-30)
        self._labels.append(label)
        level = int(-math.log(max(self._rng.random(), 1e-12)) * self.ml)
        self._graph.append([[] for _ in range(level + 1)])

        if self._entry is None:
            self._entry = node
            self._max_level = level
            return

        qn = self._norms[node]
        curr = self._entry
        # Greedy descent through layers above the new node's level.
        for lev in range(self._max_level, level, -1):
            curr = self._greedy_closest(q, qn, curr, lev)
        # Beam-search insert on each shared layer, top-down.
        for lev in range(min(level, self._max_level), -1, -1):
            cands = self._search_layer(q, qn, [curr], self.ef_construction, lev)
            m = self.M0 if lev == 0 else self.M
            neighbors = [n for _, n in heapq.nsmallest(m, cands)]
            self._graph[node][lev] = list(neighbors)
            for nb in neighbors:
                links = self._graph[nb][lev]
                links.append(node)
                if len(links) > m:
                    # Prune to the m closest (simple selection, as in the
                    # paper's SELECT-NEIGHBORS-SIMPLE variant).
                    nbv = self._vecs[nb]
                    nbn = self._norms[nb]
                    links.sort(key=lambda x: self._dist(nbv, nbn, x))
                    del links[m:]
            curr = neighbors[0] if neighbors else curr

        if level > self._max_level:
            self._max_level = level
            self._entry = node

    def _greedy_closest(self, q: np.ndarray, qn: float, start: int, level: int) -> int:
        curr = start
        curr_d = self._dist(q, qn, curr)
        improved = True
        while improved:
            improved = False
            for nb in self._graph[curr][level] if level < len(self._graph[curr]) else []:
                d = self._dist(q, qn, nb)
                if d < curr_d:
                    curr, curr_d = nb, d
                    improved = True
        return curr

    def _search_layer(
        self,
        q: np.ndarray,
        qn: float,
        entry_points: list[int],
        ef: int,
        level: int,
        budget: int | None = None,
        stagnation: int | None = None,
    ) -> list[tuple[float, int]]:
        """Best-first beam search; returns [(dist, node)] of <= ef nodes.

        `budget` caps distance computations for this call; `stagnation`
        stops after that many consecutive beam pops with no improvement
        to the result set (the adaptive-termination analog — reference
        HNSWTerminationPolicy_e::QUANTILE, knn/knn.cpp:481, lives in its
        hnswlib fork's search loop the same way)."""
        visited = set(entry_points)
        cand: list[tuple[float, int]] = []  # min-heap
        best: list[tuple[float, int]] = []  # max-heap via negated dist
        for ep in entry_points:
            d = self._dist(q, qn, ep)
            heapq.heappush(cand, (d, ep))
            heapq.heappush(best, (-d, ep))
        pops_since_improve = 0
        while cand:
            d, node = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            if stagnation is not None and pops_since_improve >= stagnation:
                break
            improved = False
            for nb in self._graph[node][level] if level < len(self._graph[node]) else []:
                if nb in visited:
                    continue
                if budget is not None and self.n_dist_calcs >= budget:
                    return [(-nd, n) for nd, n in best]
                visited.add(nb)
                dn = self._dist(q, qn, nb)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
                    improved = True
            pops_since_improve = 0 if improved else pops_since_improve + 1
        return [(-nd, n) for nd, n in best]

    # ------------------------------------------------------------- search

    def search(
        self,
        vec: Sequence[float],
        k: int,
        ef: int = 64,
        policy: str = "none",
        budget: int | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k (label, dist), ascending by distance.

        policy: 'none' = full ef beam; 'adaptive' = stagnation-based
        early termination (disabled for k <= 10, mirroring the
        reference's `iResults > 10` gate, knn/knn.cpp:481); 'budget'
        = hard cap of `budget` distance computations. `n_dist_calcs`
        accumulates across searches — the pDistanceComputations counter
        (knn/knn.h:117); read/reset it around a call for per-query
        stats."""
        if policy not in ("none", "adaptive", "budget"):
            raise ValueError(f"policy must be none|adaptive|budget, got {policy!r}")
        if self._entry is None:
            return []
        q = np.asarray(vec, dtype=np.float32)
        qn = float(np.linalg.norm(q)) or 1e-30
        curr = self._entry
        for lev in range(self._max_level, 0, -1):
            curr = self._greedy_closest(q, qn, curr, lev)
        stagnation = None
        if policy == "adaptive" and k > 10:
            stagnation = max(ef // 4, 8)
        found = self._search_layer(
            q,
            qn,
            [curr],
            max(ef, k),
            0,
            budget=budget if policy == "budget" else None,
            stagnation=stagnation,
        )
        top = heapq.nsmallest(k, found)
        return [(self._labels[n], d) for d, n in top]


def build_index(
    ids: Sequence[int],
    vectors: np.ndarray,
    metric: str = "cosine",
    M: int = 16,
    ef_construction: int = 200,
    seed: int = 42,
) -> HnswIndex:
    if len(ids) > PY_HNSW_MAX_PARTITION_ROWS:
        raise ValueError(
            f"pure-python HNSW refuses partitions over "
            f"{PY_HNSW_MAX_PARTITION_ROWS} rows (got {len(ids)}): install "
            "hnswlib for production-scale graph builds"
        )
    index = HnswIndex(vectors.shape[1], metric, M, ef_construction, seed)
    for i, vid in enumerate(ids):
        index.add(vectors[i], int(vid))
    return index
