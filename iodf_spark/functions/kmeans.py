"""Deterministic fixed-iteration Lloyd's k-means — the quantizer trainer
behind trained IVF centroids and PQ codebooks (round-8 verdict #2: replace
id-prefix sampling with trained quantizers).

Runs DRIVER-SIDE on a bounded sample, which is the production shape at
100 TB (faiss trains its coarse quantizer and PQ codebooks on a sampled
slice, never the corpus): training cost is O(sample x k x iters),
independent of corpus size, and the trained centroids broadcast as
literals into the distributed assign/encode stages.

Determinism is the load-bearing property: the SAME function on the SAME
sample must produce bit-identical float64 centroids wherever it runs,
because the Spark query and the DuckDB oracle twin both embed the output
as full-precision literals. Everything is therefore fixed-order:

* init = farthest-first traversal (Gonzalez '85) — no RNG: centroid 0 is
  sample[0]; each next centroid is the sample point maximizing min
  distance to the chosen set, ties broken by lowest index;
* assignment iterates points in index order; nearest centroid, ties to
  the LOWEST centroid id (the same tie rule as the distributed
  _ivf_assign / _pq_encode argmins);
* update = arithmetic mean of members in index order — under 'cos' the
  mean is RE-NORMALIZED to unit length after every update (classic
  Dhillon–Modha spherical k-means): centroids stay on the sphere, so
  the training argmax of P @ C.T IS max-cosine, matching the serving
  assignment in _ivf_assign/assign_cos exactly (an unnormalized mean
  biases the dot toward large-norm = tight centroids, a different and
  wrong objective); a cluster that loses all members (or whose mean
  cancels to the zero vector) keeps its previous centroid (no
  re-seeding RNG);
* a fixed iteration count (no data-dependent convergence test — early
  exit on a float comparison could diverge between environments).

Metrics: 'cos' (spherical k-means — assignment by max cosine, means
taken over L2-normalized points; the IVF coarse-quantizer metric) and
'l2' (classic Lloyd's; the per-subspace PQ codebook metric, matching
_pq_encode's argmin ||x-c||^2).
"""

from __future__ import annotations


def hash_order_key(i: int) -> int:
    """Deterministic, engine-independent ordering key for drawing the
    bounded training sample: Knuth's multiplicative hash
    (i * 2654435761 mod 2^32). Ordering a corpus by this key and taking
    the first N gives a fixed pseudo-uniform sample — unlike the
    id-prefix sample, it is unbiased on corpora where content correlates
    with id order (time-ordered crawls, the normal case: a prefix of a
    crawl is one era's distribution, not the corpus's). Pure integer
    arithmetic so the same expression runs in SQL
    (``(id * 2654435761) % 4294967296``) on any engine and reproduces
    these exact keys — determinism is load-bearing (the trained output
    enters both dialects as literals)."""
    return (int(i) * 2654435761) % 4294967296


def lloyd_kmeans(
    sample: list[list[float]],
    k: int,
    iters: int = 10,
    metric: str = "cos",
) -> list[list[float]]:
    """Train ``k`` centroids on ``sample`` (a driver-side list of float
    vectors, caller-fixed order). Returns k centroids as float64 lists.
    Raises if the sample has fewer than k points."""
    import numpy as np

    if metric not in ("cos", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    X = np.asarray(sample, dtype=np.float64)
    if X.ndim != 2 or len(X) < k:
        raise ValueError(f"need a 2-D sample with >= {k} points, got {X.shape}")
    P = X
    if metric == "cos":
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        if not (norms > 0).all():
            raise ValueError("zero vector in training sample (cos metric)")
        P = X / norms

    # farthest-first init (deterministic; ties -> lowest index via argmax)
    def dist_to(c):
        if metric == "cos":
            return 1.0 - P @ c
        d = P - c
        return (d * d).sum(axis=1)

    cents = [P[0].copy()]
    dmin = dist_to(cents[0])
    for _ in range(k - 1):
        nxt = int(np.argmax(dmin))
        cents.append(P[nxt].copy())
        dmin = np.minimum(dmin, dist_to(cents[-1]))
    C = np.stack(cents)

    for _ in range(iters):
        if metric == "cos":
            # max cosine == max dot on normalized points; ties -> lowest
            # centroid id (argmax returns the first maximum)
            A = np.argmax(P @ C.T, axis=1)
        else:
            d2 = ((P[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            A = np.argmin(d2, axis=1)
        for j in range(k):
            members = P[A == j]
            if len(members):
                m = members.mean(axis=0)
                if metric == "cos":
                    # spherical update: project the mean back onto the unit
                    # sphere so the next argmax(P @ C.T) is a true cosine
                    # assignment (degenerate zero-mean keeps the previous
                    # centroid — no RNG re-seed)
                    n = float(np.linalg.norm(m))
                    if n > 0.0:
                        C[j] = m / n
                else:
                    C[j] = m
    return [[float(x) for x in row] for row in C]


def train_ivf_centroids(
    sample: list[list[float]], k: int, iters: int = 10
) -> list[list[float]]:
    """Spherical k-means for the IVF coarse quantizer (assignment metric
    is cosine — see _ivf_assign)."""
    return lloyd_kmeans(sample, k, iters=iters, metric="cos")


def train_pq_codebooks(
    sample: list[list[float]],
    m_subspaces: int,
    n_codes: int,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Per-subspace L2 Lloyd's for PQ codebooks (encode metric is argmin
    ||x_sub - c||^2 — see _pq_encode). Returns [m][n_codes][sub_dim]."""
    dim = len(sample[0])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    out = []
    for j in range(m_subspaces):
        subsample = [v[j * sub : (j + 1) * sub] for v in sample]
        out.append(lloyd_kmeans(subsample, n_codes, iters=iters, metric="l2"))
    return out


def assign_cos(vec: list[float], cents: list[list[float]]) -> int:
    """Nearest-centroid id under cosine, ties to the lowest id — the
    pure-python twin of the distributed argmax in _ivf_assign (used to
    derive training residuals driver-side)."""
    import math

    vn = math.sqrt(sum(x * x for x in vec))
    best, best_cos = 0, float("-inf")
    for i, c in enumerate(cents):
        cn = math.sqrt(sum(x * x for x in c))
        cos = sum(a * b for a, b in zip(vec, c)) / (vn * cn)
        if cos > best_cos:
            best, best_cos = i, cos
    return best


def train_residual_codebooks(
    sample: list[list[float]],
    cent_vecs: list[list[float]],
    m_subspaces: int,
    n_codes: int,
    iters: int = 10,
) -> list[list[list[float]]]:
    """PQ codebooks trained on RESIDUALS to the (trained) coarse
    quantizer — the IVFADC training recipe (Jégou TPAMI'11 §III):
    residuals are derived driver-side with the same cosine-argmax /
    lowest-id-tie assignment the distributed encoder uses, then each
    subspace runs L2 Lloyd's. Deterministic end to end."""
    residuals = []
    for v in sample:
        c = cent_vecs[assign_cos(v, cent_vecs)]
        residuals.append([a - b for a, b in zip(v, c)])
    return train_pq_codebooks(residuals, m_subspaces, n_codes, iters=iters)
