"""IVF index behavior (pipelines/ann.py): pruned read, determinism,
recall floor vs brute force on the driver embeddings table."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from tippecanoe_ray.pipelines.ann import (
    brute_force_topk,
    build_ivf_index,
    ivf_topk_indexed,
)

SF = "/root/testdata/sf0.001"


def _embeddings():
    return pq.read_table(os.path.join(SF, "embeddings.parquet")).select(
        ["vec_id", "embedding"]
    )


def test_ivf_index_layout_and_determinism(ray_session, tmp_path):
    t = _embeddings()
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_ivf_index(ray.data.from_arrow(t), d1)
    # a second build from a different partitioning must produce the
    # SAME centroids and the same assignment (the 6dp quantization
    # makes the float math partition-order independent)
    build_ivf_index(ray.data.from_arrow(t).repartition(7), d2)
    c1 = pq.read_table(os.path.join(d1, "_centroids.parquet"))
    c2 = pq.read_table(os.path.join(d2, "_centroids.parquet"))
    assert c1.sort_by("list_id").equals(c2.sort_by("list_id"))
    for d in (d1, d2):
        lists = [n for n in os.listdir(d) if n.startswith("list=")]
        assert 1 <= len(lists) <= 8
    # every vector lands in exactly one list
    n1 = sum(
        pq.read_table(p).num_rows
        for p in glob.glob(os.path.join(d1, "list=*", "*.parquet"))
    )
    assert n1 == t.num_rows


def test_ivf_pruned_read_and_recall(ray_session, tmp_path):
    t = _embeddings()
    d = str(tmp_path / "ivf")
    build_ivf_index(ray.data.from_arrow(t), d)
    qvec = np.asarray(
        t.filter(pa.compute.equal(t["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64,
    )
    got = ivf_topk_indexed(d, qvec[None, :], k=10, n_probe=2)
    assert len(got) == 10
    # the pruned read touches at most n_probe list partitions' rows
    per_list = {
        int(p.split("list=")[1].split(os.sep)[0]): pq.read_table(p).num_rows
        for p in glob.glob(os.path.join(d, "list=*", "*.parquet"))
    }
    assert sum(sorted(per_list.values())[-2:]) < t.num_rows
    # recall floor vs brute force: the query's own list must contain
    # its exact nearest neighbors' majority on this synthetic data
    bf = brute_force_topk(ray.data.from_arrow(t), qvec[None, :], k=10)
    overlap = len(set(got["vec_id"]) & set(bf["vec_id"]))
    assert overlap >= 6
