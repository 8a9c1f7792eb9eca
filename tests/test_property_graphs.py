"""Property-based kernel checks (hypothesis): random small digraphs vs
pure-python oracles. Fixed seeds / few examples — each example runs real
Spark jobs, so this is adversarial coverage, not a fuzz marathon."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from planar_spark.kernels.components import incremental_wcc
from planar_spark.kernels import connected_components
from planar_spark.kernels.scc import strongly_connected_components
from planar_spark.oracle.numpy_oracle import oracle_components, oracle_scc
from tests.conftest import graph_from_numpy

N = 10

edge_lists = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=0,
    max_size=25,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(edges=edge_lists)
def test_scc_property(spark, config, edges):
    e = np.array(edges or [(0, 0)], dtype=np.int64).reshape(-1, 2)
    g = graph_from_numpy(spark, e, N)
    got = np.full(N, -1, dtype=np.int64)
    for r in strongly_connected_components(g, config).collect():
        got[r["vid"]] = r["scc_id"]
    assert np.array_equal(got, oracle_scc(e, N))
    g.unpersist()


@settings(**_SETTINGS)
@given(edges=edge_lists, cut=st.integers(0, 25))
def test_incremental_wcc_property(spark, config, edges, cut):
    e = np.array(edges or [(0, 0)], dtype=np.int64).reshape(-1, 2)
    old_e, new_e = e[: cut % (len(e) + 1)], e[cut % (len(e) + 1):]
    g_old = graph_from_numpy(spark, old_e, N)
    labels = connected_components(g_old, config).state
    ndf = spark.createDataFrame(
        [(int(s), int(d)) for s, d in new_e] or [], "src long, dst long"
    )
    out = incremental_wcc(labels, ndf, config)
    got = np.full(N, -1, dtype=np.int64)
    for r in out.collect():
        got[r["vid"]] = r["label"]
    assert np.array_equal(got, oracle_components(e, N))
    g_old.unpersist()
