import sys, time, tempfile
sys.path.insert(0, "/root/repo")
from dbms_spark import get_spark
from dbms_spark.sources.catalog import load_table
from dbms_spark.llm.ann_store import AnnIndexStore
import dbms_spark.queries as Q
spark = get_spark("ann_jobs")
spark.range(100).count()
sc = spark.sparkContext

def jobs_between(fn, label):
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    # use a job group to count jobs
    sc.setJobGroup(label, label)
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    ids = tracker.getJobIdsForGroup(label)
    print(f"{label}: {dt:.2f}s jobs={len(ids or [])}", flush=True)
    sc.setJobGroup(None, None)

emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
cents = Q._ivf_cents(); books = Q._pq_books()
# q309 shape
store = AnnIndexStore(spark, tempfile.mkdtemp(prefix="jx_") + "/ix")
jobs_between(lambda: store.build(emb.filter("vec_id % 3 != 0"), quantizers=(cents, None)), "build")
jobs_between(lambda: store.append(emb.filter("vec_id % 3 = 0"), batch_id=1), "append")
jobs_between(lambda: store.append(emb.filter("vec_id % 3 = 0"), batch_id=1), "append_redeliver")
jobs_between(lambda: store.search(emb.filter("vec_id % 100 = 0"), k=5).write.format("noop").mode("overwrite").save(), "search+noop")
# q310 extra: retrain
store2 = AnnIndexStore(spark, tempfile.mkdtemp(prefix="jx2_") + "/ix")
jobs_between(lambda: store2.build(emb.filter("vec_id % 3 != 0"), quantizers=(cents[:2], None)), "build_coarse")
jobs_between(lambda: store2.append(emb.filter("vec_id % 3 = 0"), batch_id=1), "append2")
jobs_between(lambda: store2.retrain(quantizers=(cents, books)), "retrain")
jobs_between(lambda: store2.search(emb.filter("vec_id % 100 = 0"), k=5).write.format("noop").mode("overwrite").save(), "search_pq+noop")
# maintain on a fresh store (drift+compact path)
store3 = AnnIndexStore(spark, tempfile.mkdtemp(prefix="jx3_") + "/ix")
store3.build(emb.filter("vec_id % 3 != 0"), quantizers=(cents, None))
store3.append(emb.filter("vec_id % 3 = 0"), batch_id=1)
jobs_between(lambda: print(store3.maintain()), "maintain")
spark.stop()
