"""k-means (llm/cluster.py): pinned-semantics checks against an
independent numpy re-implementation, plus invariants the gate query
relies on (determinism, cid domain, empty-cluster drop)."""

import numpy as np
from pyspark.sql import functions as F

from dbms_spark.llm.cluster import kmeans_assign, kmeans_sizes
from dbms_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, vecs, k, iters):
    """Straight-line reference of the pinned algorithm: quantize,
    smallest-id seeds, dist||cid string tiebreak, half-up integer
    mean.  Written independently of the Spark/SQL forms."""
    q = np.round(vecs.astype(np.float64) * 10000.0)
    order = np.argsort(ids)
    cent = {int(ids[i]): q[i].copy() for i in order[:k]}

    def assign():
        out = {}
        for i, vid in enumerate(ids):
            best = None
            for cid in sorted(cent):
                d = int(((q[i] - cent[cid]) ** 2).sum())
                key = f"{d:014d}{cid:010d}"
                if best is None or key < best[0]:
                    best = (key, cid)
            out[int(vid)] = best[1]
        return out

    for _ in range(iters):
        a = assign()
        groups = {}
        for vid, cid in a.items():
            groups.setdefault(cid, []).append(vid)
        idx = {int(v): i for i, v in enumerate(ids)}
        cent = {}
        for cid, members in groups.items():
            s = np.sum([q[idx[v]] for v in members], axis=0)
            n = len(members)
            cent[cid] = np.floor((2 * s + n) / (2 * n))
    return assign()


def test_kmeans_matches_numpy_reference(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows])
    want = _numpy_kmeans(ids, vecs, k=3, iters=2)
    got = {r["vec_id"]: r["cid"]
           for r in kmeans_assign(emb, k=3, iters=2).collect()}
    assert got == want


def test_kmeans_deterministic_and_well_formed(spark):
    emb = load_table(spark, SF, "embeddings")
    a1 = sorted(map(tuple, kmeans_assign(emb, k=4, iters=2).collect()))
    a2 = sorted(map(tuple, kmeans_assign(emb, k=4, iters=2).collect()))
    assert a1 == a2
    n = emb.count()
    assert len(a1) == n
    seeds = {r["vec_id"] for r in
             emb.orderBy("vec_id").limit(4).select("vec_id").collect()}
    assert {cid for _, cid in a1} <= seeds  # cids are seed ids only
    sizes = kmeans_sizes(emb, k=4, iters=2)
    assert sizes.agg(F.sum("n_members")).first()[0] == n


def test_kmeans_separates_planted_clusters(spark):
    """Two well-separated planted blobs must land in two clusters
    regardless of seed placement after 2 rounds."""
    import itertools

    rows = []
    for i, off in itertools.product(range(20), (0.0, 100.0)):
        vec = [off + (i % 5) * 0.01] * 64
        rows.append((i * 2 + int(off > 0), vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = kmeans_assign(df, k=2, iters=2)
    got = {r["vec_id"]: r["cid"] for r in a.collect()}
    lo = {got[v] for v in got if v % 2 == 0}
    hi = {got[v] for v in got if v % 2 == 1}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi


def test_semantic_dedup_hand_computed(spark):
    """Duplicate directions collapse to the min id, orthogonal vectors
    all survive, and a near-duplicate below the threshold survives."""
    from dbms_spark.llm.cluster import semantic_dedup

    def unit(i, dims=8):
        v = [0.0] * dims
        v[i] = 1.0
        return v

    rows = [
        (1, unit(0)),            # kept: representative of the e0 family
        (2, unit(0)),            # exact dup of 1 -> dropped
        (3, [0.999, 0.04] + [0.0] * 6),  # cos ~0.999 vs e0 -> dropped
        (4, unit(1)),            # orthogonal -> kept
        (5, unit(2)),            # orthogonal -> kept
        (6, [0.7, 0.714] + [0.0] * 6),   # cos ~0.7 vs e0: below 0.95 -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k=1: one cluster, so the pair scope is the whole set — isolates
    # the similarity/grouping semantics from the quantizer
    out = semantic_dedup(df, threshold=0.95, k=1, iters=1, dims=8)
    kept = sorted(r["vec_id"] for r in out.collect())
    assert kept == [1, 4, 5, 6]


def test_derive_k_scaled_rule(spark):
    """k=None derives the cluster count keeping avg cell ~ target_cell
    (sum(c_i^2) linear in n — the SCALE.md scaled-k rule); explicit k
    still wins for gate determinism."""
    from dbms_spark.llm.cluster import derive_k, semantic_dedup

    assert derive_k(100, target_cell=4096) == 4          # floor
    assert derive_k(4096 * 10, target_cell=4096) == 10   # exact
    assert derive_k(4096 * 10 + 1, target_cell=4096) == 11  # ceil
    assert derive_k(10**9, target_cell=4096) == 244141   # 100TB-ish shape

    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    auto = semantic_dedup(df, threshold=0.999, k=None, iters=1, dims=8,
                          target_cell=10)
    # survivors form a valid (vec_id, cid) relation over <= ceil(40/10) cells
    got = auto.select("cid").distinct().count()
    assert 1 <= got <= 4
    assert auto.count() <= 40


def test_tar_shards_deterministic_and_readback(spark, tmp_path):
    """Tar shard bytes are a pure function of shard content
    (re-export byte-identical); every member round-trips its document
    text; write_tar_shards lands one tar per shard."""
    import io
    import os
    import tarfile

    from dbms_spark.llm.shard import tar_shards, write_tar_shards

    docs = spark.createDataFrame(
        [(i, f"document body {i} with text") for i in range(40)]
        + [(99, None)],                       # NULL text -> empty member
        "doc_id long, text string")
    a = {r.shard_id: bytes(r.tar_bytes) for r in tar_shards(docs, 3).collect()}
    b = {r.shard_id: bytes(r.tar_bytes) for r in tar_shards(docs, 3).collect()}
    assert a == b and len(a) == 3
    seen = {}
    for blob in a.values():
        with tarfile.open(fileobj=io.BytesIO(blob)) as t:
            for m in t.getmembers():
                assert m.mtime == 0 and m.uid == 0
                seen[m.name] = t.extractfile(m).read().decode()
    src = {f"{r.doc_id}.txt": (r.text or "") for r in docs.collect()}
    assert seen == src                       # every doc in exactly one shard

    out = str(tmp_path / "shards")
    assert write_tar_shards(docs, out, 3) == 3
    files = sorted(os.listdir(out))
    assert files == ["shard-00000.tar", "shard-00001.tar", "shard-00002.tar"]
    with tarfile.open(os.path.join(out, files[0])) as t:
        assert t.getnames()
