"""ANN recall at scale (VERDICT r11 #10): the driver-gated IVF/PQ gates
run at sf0.1 embedding counts (2,000 vectors); a broken bucketing or
quantization path can hide there because every list/cell is tiny.  This
suite-only fixture generates 100,000 clustered 64-dim vectors and runs
the SAME registered gate code over them, asserting shortlist recall
holds as cluster populations grow 50x — the scale direction a 100 TB
corpus actually moves in.

Ground truth is exact numpy top-k on the driver (test-only; the gates
themselves never do this).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq
import pytest

from datafusion_iceberg_spark import registry

registry.load_all_modules()

N_VECS = 100_000
DIM = 64
N_CLUSTERS = 24
NOISE = 0.25


@pytest.fixture(scope="module")
def big_sf_dir(tmp_path_factory) -> str:
    """A testdata-shaped directory whose embeddings.parquet holds 10^5
    clustered vectors (same schema as the driver's: vec_id int64,
    embedding list<float>, label int32).  Cluster ids interleave with
    vec_id (id % C) so the PQ training sample (low ids) spans every
    cluster, as a hash-sample would at real scale."""
    rng = np.random.default_rng(20260816)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(N_VECS, dtype=np.int64) % N_CLUSTERS
    vecs = centers[labels] + NOISE * rng.standard_normal((N_VECS, DIM))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )
    d = tmp_path_factory.mktemp("ann_scale")
    papq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float32()), DIM
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels.astype(np.int32), pa.int32()),
            }
        ),
        os.path.join(str(d), "embeddings.parquet"),
    )
    # module-level ground truth rides on the fixture object
    return str(d)


def _exact_topk(sf_dir: str, n_queries: int, k: int) -> dict[int, set]:
    t = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    x = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sims = x[:n_queries] @ x.T  # (q, N)
    out = {}
    for q in range(n_queries):
        s = sims[q].copy()
        s[q] = -np.inf  # exclude self
        idx = np.argpartition(-s, k)[:k]
        out[q] = set(int(i) for i in idx[np.argsort(-s[idx])])
    return out


def test_ivf_topk_recall_at_100k(spark, big_sf_dir):
    """sim_ivf_topk probes 4/16 lists over 100k vectors (~6,250/list —
    50x the driver-scale populations).  Clustered data concentrates a
    query's true neighbors in its probed lists, so recall must stay far
    above the probed-fraction floor (25%); a wrong assignment key or a
    per-list truncation bug collapses it."""
    from datafusion_iceberg_spark.extensions.similarity import TOP_K

    truth = _exact_topk(big_sf_dir, n_queries=5, k=TOP_K)
    approx: dict[int, set] = {}
    for r in registry.QUERIES["sim_ivf_topk"](spark, big_sf_dir).collect():
        approx.setdefault(int(r.query_id), set()).add(int(r.cand_id))
    hits = sum(len(truth[q] & approx.get(q, set())) for q in truth)
    recall = hits / sum(len(v) for v in truth.values())
    assert recall >= 0.6, f"IVF recall {recall:.2f} at N={N_VECS}"


def test_pq_shortlist_recall_at_100k(spark, big_sf_dir):
    """embed_pq_search's in-query contract (ADC 200-shortlist keeps >=3
    of the true top-5) must hold when the corpus is 50x larger: the
    shortlist is a fixed size, so this is the bound that actually decays
    if quantization distortion swamps neighbor gaps at scale."""
    rows = registry.QUERIES["embed_pq_search"](spark, big_sf_dir).collect()
    assert rows, "empty PQ result at 100k"
    assert all(r.recall_ok for r in rows), (
        f"PQ shortlist recall below bound at N={N_VECS}: "
        f"{[(r.query_id, r.recall_ok) for r in rows if not r.recall_ok]}"
    )
    # and the exact leg agrees with driver-side numpy ground truth
    from datafusion_iceberg_spark.extensions.similarity import _PQ_TOPK

    truth = _exact_topk(big_sf_dir, n_queries=5, k=_PQ_TOPK)
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(int(r.query_id), set()).add(int(r.cand_id))
    for q, want in truth.items():
        assert got.get(q) == want, f"query {q}: exact top-{_PQ_TOPK} differs"
