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


class P2Quantile:
    """Streaming quantile by the published P-squared algorithm (Jain &
    Chlamtac, CACM 1985): five markers track (min, p/2, p, (1+p)/2, max)
    heights; interior markers move by the parabolic formula when their
    position drifts from the desired one. O(1) memory per stream.

    Design provenance: the reference keeps its discovery-rate threshold
    in the same estimator (knn/quantile.h:24-163); this is an
    independent implementation of the same published algorithm."""

    def __init__(self, p: float):
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"quantile must be in [0,1], got {p}")
        self.p = p
        self.reset()

    def reset(self) -> None:
        self.count = 0
        self._q = [0.0] * 5  # marker heights
        self._n = [0.0] * 5  # marker positions
        self._np = [0.0] * 5  # desired positions
        self._dn = [0.0, self.p / 2.0, self.p, (1.0 + self.p) / 2.0, 1.0]

    def insert(self, x: float) -> None:
        self.count += 1
        if self.count <= 5:
            self._q[self.count - 1] = x
            if self.count == 5:
                self._q.sort()
                for i in range(5):
                    self._n[i] = i + 1
                    self._np[i] = 1 + 4 * self._dn[i]
            return
        # locate the cell, stretching the extreme markers
        if x < self._q[0]:
            self._q[0] = x
            cell = 0
        elif x >= self._q[4]:
            self._q[4] = x
            cell = 3
        else:
            cell = next(
                i for i in range(4) if self._q[i] <= x < self._q[i + 1]
            )
        for i in range(cell + 1, 5):
            self._n[i] += 1
        for i in range(5):
            self._np[i] += self._dn[i]
        # adjust interior markers
        q, n = self._q, self._n
        for i in (1, 2, 3):
            d = self._np[i] - n[i]
            if (d >= 1.0 and n[i + 1] - n[i] > 1.0) or (
                d <= -1.0 and n[i - 1] - n[i] < -1.0
            ):
                s = 1 if d >= 1.0 else -1
                # parabolic prediction (the P^2 formula)
                hi, lo = n[i + 1] - n[i], n[i] - n[i - 1]
                cand = q[i] + (s / (hi + lo)) * (
                    (lo + s) * (q[i + 1] - q[i]) / hi
                    + (hi - s) * (q[i] - q[i - 1]) / lo
                )
                if q[i - 1] < cand < q[i + 1]:
                    q[i] = cand
                else:  # fall back to linear move toward the neighbor
                    q[i] += s * (q[i + s] - q[i]) / (hi if s > 0 else lo)
                n[i] += s

    def ready(self) -> bool:
        return self.count >= 5

    def get(self) -> float:
        return self._q[2]


class MovingP2Quantile:
    """Windowed P2: the estimator resets every `window` inserts and the
    reported value blends the previous window's final estimate with the
    current partial one by fill fraction — a moving quantile that adapts
    when the stream's distribution drifts (reference
    MP2QuantileEstimator_c behavior, knn/quantile.h:120-163)."""

    def __init__(self, window: int, p: float):
        if window <= 0:
            raise ValueError("window must be positive")
        self.window = window
        self._est = P2Quantile(p)
        self.reset()

    def reset(self) -> None:
        self._count = 0
        self._in_window = 0
        self._prev = 0.0
        self._est.reset()

    def insert(self, x: float) -> None:
        self._est.insert(x)
        self._count += 1
        self._in_window += 1
        if self._in_window == self.window:
            self._prev = self._est.get()
            self._est.reset()
            self._in_window = 0

    def get(self) -> float:
        if not self._count:
            return 0.0
        if self._count < self.window:
            return self._est.get()
        if not self._in_window:
            return self._prev
        w2 = self._in_window / self.window
        return (1.0 - w2) * self._prev + w2 * self._est.get()


def _patience_for_ef(ef: int) -> int:
    """Consecutive-bad-rounds tolerance, tighter at large ef (the beam
    has had more chances to improve) — reference CalcPatience,
    knn/termination.cpp:27-39."""
    if ef <= 800:
        return 9
    if ef <= 2000:
        return 8
    if ef <= 4000:
        return 7
    return 6


class QuantileTermination:
    """Discovery-rate adaptive stop (reference TerminationQuantile_c,
    knn/termination.cpp:41-79): per beam round, rate = candidates
    collected into the frontier / distances scored; a round is BAD when
    its rate falls under the moving P2 quantile of past rates, and the
    search stops after `patience` consecutive bad rounds. Warm-up rounds
    (frontier not yet at ef) only reset the counters — the signal is
    replacements against a saturated frontier."""

    THRESHOLD_QUANTILE = 0.2
    THRESHOLD_QUANTILE_L2 = 0.14  # reference TerminationQuantileL2_c
    WINDOW = 128

    def __init__(self, quantile: float | None = None):
        self.quantile = (
            quantile if quantile is not None else self.THRESHOLD_QUANTILE
        )
        self._threshold = MovingP2Quantile(self.WINDOW, self.quantile)
        self.reset()

    def reset(self) -> None:
        self.collected = 0
        self._prev_collected = 0
        self.scored = 0
        self._bad_rounds = 0
        self._patience = _patience_for_ef(10)
        self._threshold.reset()

    def on_scored(self) -> None:
        self.scored += 1

    def on_collected(self) -> None:
        self.collected += 1

    def should_terminate(self, ef: int, current_size: int) -> bool:
        if current_size < ef:
            self._prev_collected = self.collected
            self.scored = 0
            self._bad_rounds = 0
            self._patience = _patience_for_ef(ef)
            return False
        rate = (self.collected - self._prev_collected) / (1e-9 + self.scored)
        bad = rate < self._threshold.get()
        self._bad_rounds = (self._bad_rounds + 1) if bad else 0
        self._threshold.insert(rate)
        self._prev_collected = self.collected
        self.scored = 0
        return self._bad_rounds >= self._patience



def _walk_array(vec):
    """Vector -> walk-space array. float32 by default; an explicitly
    float64 ndarray is PRESERVED — q8 level vectors for dim > 257 are
    handed in as float64 so squared-L2/ip sums stay exact past float32's
    2^24 integer ceiling (see hnsw_index._q8_walk_dtype)."""
    if getattr(vec, "dtype", None) == np.float64:
        return vec
    return np.asarray(vec, dtype=np.float32)


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
        # 'hamming': vectors are PACKED SIGN-BIT CODES (python ints, one
        # bit per dimension) and distance is popcount(xor) — the
        # quantized-graph space (reference searches the HNSW graph over
        # quantized codes, knn/knn.cpp:411-452 + quantizer at rest).
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

    def _dist(self, q, qn: float, node: int) -> float:
        self.n_dist_calcs += 1
        v = self._vecs[node]
        if self.metric == "hamming":
            return float(bin(q ^ v).count("1"))
        if self.metric == "l2":
            d = q - v
            return float(np.dot(d, d))
        dot = float(np.dot(q, v))
        if self.metric == "ip":
            return 1.0 - dot
        denom = (qn * self._norms[node]) or 1e-30
        return 1.0 - dot / denom

    def nbytes(self) -> int:
        """Rough resident size (vectors + norms/labels + link lists) —
        feeds the executor-side cache's byte-bounded LRU eviction. An
        estimate, not an audit: python object headers are folded into a
        flat per-node constant."""
        n = len(self._vecs)
        vec_b = 16  # hamming codes: one python int per node
        if n and hasattr(self._vecs[0], "nbytes"):
            vec_b = self._vecs[0].nbytes
        links = sum(len(lvl) for node in self._graph for lvl in node)
        return n * (vec_b + 80) + links * 8

    # ------------------------------------------------------------- insert

    def add(self, vec, label: int) -> None:
        if self.metric == "hamming":
            q = int(vec)  # packed code
            qn = 0.0
        else:
            q = _walk_array(vec)
            qn = float(np.linalg.norm(q)) or 1e-30
        node = len(self._vecs)
        self._vecs.append(q)
        self._norms.append(qn)
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
        quantile_state: "QuantileTermination | None" = None,
        allowed_nodes: "set[int] | None" = None,
    ) -> list[tuple[float, int]]:
        """Best-first beam search; returns [(dist, node)] of <= ef nodes.

        `budget` caps distance computations for this call; `stagnation`
        stops after that many consecutive beam pops with no improvement
        to the result set; `quantile_state` applies the discovery-rate
        moving-quantile policy (reference
        HNSWTerminationPolicy_e::QUANTILE, knn/knn.cpp:481 +
        termination.cpp:41-79 — each beam pop is a round). The policies
        live in the search loop the same way the reference's hnswlib
        fork hosts them.

        `allowed_nodes` is the in-walk filter (reference
        KNNFilter_i::IsAllowed, knn/knn.h:87-94, knn.cpp:90-96, applied
        inside hnswlib's search loop): a disallowed node is still
        VISITED and EXPANDED — the walk needs it for connectivity — but
        never enters the result frontier, so the beam keeps graph speed
        instead of post-filtering a mostly-disallowed top-ef."""
        visited = set(entry_points)
        cand: list[tuple[float, int]] = []  # min-heap
        best: list[tuple[float, int]] = []  # max-heap via negated dist

        def _ok(n: int) -> bool:
            return allowed_nodes is None or n in allowed_nodes

        for ep in entry_points:
            d = self._dist(q, qn, ep)
            heapq.heappush(cand, (d, ep))
            if _ok(ep):
                heapq.heappush(best, (-d, ep))
        pops_since_improve = 0
        while cand:
            d, node = heapq.heappop(cand)
            if best and d > -best[0][0] and len(best) >= ef:
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
                if quantile_state is not None:
                    quantile_state.on_scored()
                if len(best) < ef or not best or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    if _ok(nb):
                        heapq.heappush(best, (-dn, nb))
                        if len(best) > ef:
                            heapq.heappop(best)
                        improved = True
                        if quantile_state is not None:
                            quantile_state.on_collected()
            pops_since_improve = 0 if improved else pops_since_improve + 1
            if quantile_state is not None and quantile_state.should_terminate(
                ef, len(best)
            ):
                break
        return [(-nd, n) for nd, n in best]

    # ------------------------------------------------------------- search

    def search(
        self,
        vec: Sequence[float],
        k: int,
        ef: int = 64,
        policy: str = "none",
        budget: int | None = None,
        allowed: "Sequence[int] | set[int] | None" = None,
    ) -> list[tuple[int, float]]:
        """Top-k (label, dist), ascending by distance.

        `allowed` restricts results to these LABELS, applied in-walk
        (filter-during-search, not post-filter): the beam traverses
        disallowed nodes for connectivity but only allowed ones enter
        the frontier — reference KNNFilter_i::IsAllowed semantics
        (knn/knn.h:87-94, knn.cpp:90-96).

        policy: 'none' = full ef beam; 'adaptive' = stagnation-based
        early termination; 'quantile' = the reference's discovery-rate
        moving-quantile policy (TerminationQuantile_c,
        termination.cpp:41-79 — P2-estimated 0.2-quantile threshold,
        0.14 for l2 per TerminationQuantileL2_c, patience by ef);
        'budget' = hard cap of `budget` distance computations. adaptive
        and quantile are disabled for k <= 10, mirroring the reference's
        `iResults > 10` gate (knn/knn.cpp:481). `n_dist_calcs`
        accumulates across searches — the pDistanceComputations counter
        (knn/knn.h:117); read/reset it around a call for per-query
        stats."""
        if policy not in ("none", "adaptive", "budget", "quantile"):
            raise ValueError(
                f"policy must be none|adaptive|quantile|budget, got {policy!r}"
            )
        if self._entry is None:
            return []
        # Budget is PER QUERY (reference pDistanceComputations is read
        # around a search, knn/knn.h:117) but n_dist_calcs accumulates
        # across searches — an index served from a cache would otherwise
        # terminate instantly on its second budget-policy query. Snapshot
        # and cap against the absolute counter.
        abs_budget = (
            self.n_dist_calcs + budget if budget is not None else None
        )
        allowed_nodes = None
        if allowed is not None:
            allow = allowed if isinstance(allowed, set) else set(allowed)
            allowed_nodes = {
                n for n, lbl in enumerate(self._labels) if lbl in allow
            }
            if not allowed_nodes:
                return []
        if self.metric == "hamming":
            q, qn = int(vec), 0.0
        else:
            q = _walk_array(vec)
            qn = float(np.linalg.norm(q)) or 1e-30
        curr = self._entry
        for lev in range(self._max_level, 0, -1):
            curr = self._greedy_closest(q, qn, curr, lev)
        stagnation = None
        if policy == "adaptive" and k > 10:
            stagnation = max(ef // 4, 8)
        quantile_state = None
        if policy == "quantile" and k > 10:
            quantile_state = QuantileTermination(
                QuantileTermination.THRESHOLD_QUANTILE_L2
                if self.metric == "l2"
                else QuantileTermination.THRESHOLD_QUANTILE
            )
        found = self._search_layer(
            q,
            qn,
            [curr],
            max(ef, k),
            0,
            budget=abs_budget if policy == "budget" else None,
            stagnation=stagnation,
            quantile_state=quantile_state,
            allowed_nodes=allowed_nodes,
        )
        top = heapq.nsmallest(k, found)
        return [(self._labels[n], d) for d, n in top]

    def search_exact(
        self,
        vec: Sequence[float],
        k: int,
        allowed: "Sequence[int] | set[int] | None" = None,
    ) -> list[tuple[int, float]]:
        """Exact top-k over the index's node set — the ef >= n limit of
        the beam search, computed as one vectorized float64 pass so the
        result is exact even when neighbor pruning has disconnected a
        sub-graph (an exhaustive beam only reaches the entry point's
        component). Distances are evaluated in float64 over the stored
        float32 vectors, matching a SQL oracle that casts the same
        column to DOUBLE — this is the deterministic construction that
        lets a graph-sidecar-served query carry a full hash oracle
        (reference fullscan fallback, knn/knn.cpp:216-217).
        Ties break by ascending label, mirroring ORDER BY dist, id."""
        n = len(self._vecs)
        if not n:
            return []
        if self.metric == "hamming":
            qc = int(vec)
            self.n_dist_calcs += n
            labels = np.asarray(self._labels, dtype=np.int64)
            dist = np.fromiter(
                (float(bin(qc ^ c).count("1")) for c in self._vecs),
                dtype=np.float64,
                count=n,
            )
            if allowed is not None:
                allow = allowed if isinstance(allowed, set) else set(allowed)
                mask = np.fromiter(
                    (int(l) in allow for l in labels), dtype=bool, count=n
                )
                labels, dist = labels[mask], dist[mask]
            order = np.lexsort((labels, dist))[:k]
            return [(int(labels[i]), float(dist[i])) for i in order]
        V = np.stack(self._vecs).astype(np.float64)
        q = np.asarray(vec, dtype=np.float64)
        if self.metric == "l2":
            d = V - q
            dist = np.einsum("ij,ij->i", d, d)
        else:
            dots = V @ q
            if self.metric == "ip":
                dist = 1.0 - dots
            else:
                norms = np.sqrt(np.einsum("ij,ij->i", V, V))
                qn = float(np.linalg.norm(q)) or 1e-30
                denom = np.where(norms > 0, norms, 1e-30) * qn
                dist = 1.0 - dots / denom
        self.n_dist_calcs += n
        labels = np.asarray(self._labels, dtype=np.int64)
        if allowed is not None:
            allow = allowed if isinstance(allowed, set) else set(allowed)
            mask = np.fromiter(
                (int(l) in allow for l in labels), dtype=bool, count=n
            )
            labels, dist = labels[mask], dist[mask]
        order = np.lexsort((labels, dist))[:k]
        return [(int(labels[i]), float(dist[i])) for i in order]


def index_to_rows(index: HnswIndex) -> list[tuple[int, int, list[float], list[list[int]]]]:
    """Serialize the graph as plain rows (node, label, vec, links) —
    links[level] is the node's adjacency at that level, list length =
    node's top level + 1. Together with (entry, max_level, metric, M,
    ef_construction) this is the complete index state: the same
    save-everything contract as the reference's index Save
    (knn/knn.cpp:643-790 writes vectors + graph + entry point), but as
    parquet-friendly rows instead of a private binary format. Hamming
    (quantized) indexes serialize via hnsw_index._graph_state_rows,
    which stores packed code bytes instead of float lists."""
    if index.metric == "hamming":
        raise ValueError(
            "index_to_rows is float-vector serialization; hamming-space "
            "indexes persist their packed codes via the graph sidecar"
        )
    return [
        (
            node,
            int(index._labels[node]),
            [float(x) for x in index._vecs[node]],
            [list(lv) for lv in index._graph[node]],
        )
        for node in range(len(index._vecs))
    ]


def index_from_rows(
    rows: "Sequence[tuple[int, int, Sequence[float], Sequence[Sequence[int]]]]",
    metric: str,
    M: int,
    ef_construction: int,
    entry: int,
    max_level: int,
    seed: int = 42,
) -> HnswIndex:
    """Reconstruct a searchable index from serialized rows (the Load half
    of knn/knn.cpp:557-640). O(n) with ZERO distance computations — vs
    the O(n log n) beam-search build — which is what makes a persisted
    graph worth serving from. Searches on the reconstruction are
    bit-identical to the original (pinned by test). `seed` re-arms the
    level-sampling RNG so subsequent add()s (incremental append) are
    deterministic given (seed, existing size)."""
    rows = sorted(rows, key=lambda r: r[0])
    if [r[0] for r in rows] != list(range(len(rows))):
        raise ValueError("graph rows must be a contiguous 0..n-1 node range")
    if not rows:
        raise ValueError("empty graph state")
    dim = len(rows[0][2])
    index = HnswIndex(dim, metric, M, ef_construction, seed)
    for _node, label, vec, links in rows:
        v = _walk_array(vec)
        index._vecs.append(v)
        index._norms.append(float(np.linalg.norm(v)) or 1e-30)
        index._labels.append(int(label))
        index._graph.append([list(map(int, lv)) for lv in links])
    index._entry = int(entry)
    index._max_level = int(max_level)
    return index


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
