"""kNN stage tests vs a brute-force oracle."""

import numpy as np
import pyarrow as pa

from gdal_ray import fixtures


def _bruteforce_knn(qx, qy, rx, ry, rid, k):
    out = []
    for x, y in zip(qx, qy):
        d2 = (rx - x) ** 2 + (ry - y) ** 2
        order = np.lexsort((rid, d2))[:k]
        out.append(list(zip(rid[order], d2[order])))
    return out


def test_knn_matches_bruteforce(ray_session):
    import ray.data as rd

    from gdal_ray.stages.knn import knn_join

    ref = fixtures.gen_ref_points(300)
    rng = np.random.default_rng(9)
    q = pa.table(
        {
            "qid": pa.array(np.arange(50, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-80, 80, 50)),
            "lat": pa.array(rng.uniform(-60, 60, 50)),
        }
    )
    out = (
        knn_join(rd.from_arrow(q), ref, k=4, concurrency=1)
        .to_pandas()
        .sort_values(["qid", "knn_rank"])
    )
    exp = _bruteforce_knn(
        q["lon"].to_numpy(),
        q["lat"].to_numpy(),
        ref["lon"].to_numpy(),
        ref["lat"].to_numpy(),
        ref["point_id"].to_numpy(),
        4,
    )
    got = out.groupby("qid").apply(
        lambda g: list(zip(g["point_id"], g["dist2"])), include_groups=False
    )
    for qid in range(50):
        assert [p for p, _ in got[qid]] == [p for p, _ in exp[qid]]
        np.testing.assert_allclose(
            [d for _, d in got[qid]], [d for _, d in exp[qid]], rtol=0
        )


def test_idw_exact_hit_and_smooth(ray_session):
    import ray.data as rd

    from gdal_ray.stages.knn import idw_estimate

    ref = pa.table(
        {
            "point_id": pa.array([0, 1, 2], pa.int64()),
            "lon": pa.array([0.0, 10.0, 20.0]),
            "lat": pa.array([0.0, 0.0, 0.0]),
            "value": pa.array([1.0, 2.0, 4.0]),
        }
    )
    q = pa.table({"lon": pa.array([10.0, 5.0]), "lat": pa.array([0.0, 0.0])})
    out = idw_estimate(rd.from_arrow(q), ref, k=3, concurrency=1).to_pandas()
    # exact hit takes the reference value (gdalgrid rule)
    assert out["idw_value"][0] == 2.0
    # interior estimate is a weighted mean within data range
    assert 1.0 < out["idw_value"][1] < 4.0


def test_knnjoiner_indexed_matches_bruteforce(ray_session):
    """KNNJoiner now routes through GridKNN; results must stay exact
    vs direct brute force at a larger reference-set size."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.knn import knn_join

    rng = np.random.default_rng(9)
    nref = 3000
    ref = pa.table(
        {
            "point_id": pa.array(np.arange(nref, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-80, 80, nref)),
            "lat": pa.array(rng.uniform(-60, 60, nref)),
        }
    )
    nq = 500
    pts = pa.table(
        {
            "qid": pa.array(np.arange(nq, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-90, 90, nq)),
            "lat": pa.array(rng.uniform(-70, 70, nq)),
        }
    )
    out = (
        knn_join(rd.from_arrow(pts), ref, k=5)
        .to_pandas()
        .sort_values(["qid", "knn_rank"])
        .reset_index(drop=True)
    )
    # brute-force oracle
    qx = pts["lon"].to_numpy()
    qy = pts["lat"].to_numpy()
    rx = ref["lon"].to_numpy()
    ry = ref["lat"].to_numpy()
    d2 = (qx[:, None] - rx) ** 2 + (qy[:, None] - ry) ** 2
    for qi in range(nq):
        order = np.lexsort((np.arange(nref), d2[qi]))[:5]
        got = out[out["qid"] == qi]
        assert got["point_id"].tolist() == list(order)
        assert got["dist2"].tolist() == d2[qi][order].tolist()
