"""Engine facade + JDBC planning surfaces."""

from dbms_spark.engine import DbmsEngine
from dbms_spark.operators.structm import ColumnSpec
from dbms_spark.sources import jdbc
from dbms_spark.sources.catalog import load_table


def test_struct_migrate_ddls(spark):
    eng = DbmsEngine(spark)
    ddls = eng.struct_migrate({
        "t1": [ColumnSpec("id", "NUMBER", precision=12, nullable=False),
               ColumnSpec("name", "VARCHAR2", length=40)],
    })
    assert "CREATE TABLE t1" in ddls["t1"]
    assert "`id` BIGINT NOT NULL" in ddls["t1"]


def test_data_migrate_and_compare_roundtrip(spark, sf_dir, tmp_path):
    eng = DbmsEngine(spark)
    src = load_table(spark, sf_dir, "orders")
    sink = str(tmp_path / "orders_out")
    n = eng.data_migrate(src, sink, key_cols=["o_orderkey"], n_chunks=4,
                         ledger_path=str(tmp_path / "ledger"))
    assert n == src.count()
    back = spark.read.parquet(sink)
    report = eng.data_compare(src, back)
    assert report.equal, "migrated copy must checksum-match the source"


def test_compare_detects_and_fixes(spark, sf_dir, tmp_path):
    eng = DbmsEngine(spark)
    src = load_table(spark, sf_dir, "nation")
    dst = src.filter("n_nationkey != 3")
    report = eng.data_compare(src, dst)
    assert not report.equal
    diff = eng.compare_drilldown(src, dst)
    stmts = eng.gen_fix_sql(diff, "nation", src.columns)
    assert len(stmts) == 1 and stmts[0].startswith("INSERT INTO `nation`")


def test_sql_migrate(spark, sf_dir, tmp_path):
    eng = DbmsEngine(spark)
    out = str(tmp_path / "sqlout")
    n = eng.sql_migrate("SELECT r_regionkey, upper(r_name) AS rn FROM region", sf_dir, out)
    assert n == 5
    assert spark.read.parquet(out).columns == ["r_regionkey", "rn"]


def test_assess_pack(spark, sf_dir):
    eng = DbmsEngine(spark)
    out = eng.assess(sf_dir)
    ov = {r["table_name"]: r for r in out["overview"].collect()}
    assert ov["lineitem"]["num_rows"] > ov["region"]["num_rows"]
    top = [r["table_name"] for r in out["top_tables"].orderBy("rank").collect()]
    assert top[0] == "lineitem"
    assert out["type_distribution"].count() > 0


def test_jdbc_query_text_rendering():
    src = jdbc.JdbcSource(
        url="jdbc:mysql://host/db", table="s.t",
        snapshot_clause="AS OF TIMESTAMP '2024-01-01 00:00:00'",
        sql_hint="FULL(t)",
    )
    q = src.query_text("a, b", "a > 5")
    assert q == ("SELECT /*+ FULL(t) */ a, b FROM s.t "
                 "AS OF TIMESTAMP '2024-01-01 00:00:00' WHERE a > 5")
    assert src.reader_options()["fetchsize"] == "10000"


def test_gen_import_into():
    stmt = jdbc.gen_import_into("db.t", ["a", "b"], "/out/csv", separator="|")
    assert stmt.startswith("IMPORT INTO db.t (`a`, `b`) FROM '/out/csv/*.csv'")
    assert "FIELDS_TERMINATED_BY='|'" in stmt


def test_dedup_pipeline_keeps_one_representative(spark):
    from dbms_spark.engine import DbmsEngine

    base = [(i, f"unique doc number {i} with words " + " ".join(f"w{j}" for j in range(12)))
            for i in range(8)]
    dups = [(100 + i, base[0][1]) for i in range(3)]  # 3 exact dups of doc 0
    docs = spark.createDataFrame(base + dups, "doc_id bigint, text string")
    out = DbmsEngine(spark).dedup_pipeline(docs, min_sim=0.9)
    kept = sorted(r["doc_id"] for r in out.collect())
    # all 3 copies of doc 0 dropped, representative (min id 0) kept
    assert kept == [0, 1, 2, 3, 4, 5, 6, 7]
    # skew-hardened miner (hub star for over-cap buckets): same kept set
    capped = DbmsEngine(spark).dedup_pipeline(docs, min_sim=0.9, bucket_cap=2)
    assert sorted(r["doc_id"] for r in capped.collect()) == kept


def test_cli_verbs(spark, tmp_path, capsys):
    """The __main__ CLI drives compare / chunk / mix over parquet paths
    (reuses the already-running session via getOrCreate)."""
    import json as _json

    from dbms_spark.__main__ import main

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.createDataFrame([(i, f"v{i}") for i in range(50)], "id long, v string") \
        .write.parquet(a)
    spark.createDataFrame([(i, f"v{i}") for i in range(49)], "id long, v string") \
        .write.parquet(b)
    rc = main(["compare", "--src", a, "--dst", b, "--keys", "id", "--chunks", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["equal"] is False and out["src_rows"] == 50

    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(20)), f"s{i % 2}") for i in range(20)],
        "doc_id long, text string, source string").write.parquet(docs)
    rc = main(["chunk", "--docs", docs, "--out", str(tmp_path / "ch"),
               "--window", "8", "--stride", "6"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["chunks"] == 20 * 3  # 20 toks, w=8 s=6 -> 3 chunks

    rc = main(["mix", "--docs", docs, "--out", str(tmp_path / "mx"),
               "--rates", "s0=100"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["kept"] == 10

    vecs = str(tmp_path / "vecs.parquet")
    spark.createDataFrame(
        [(i, [float(i % 3)] * 8) for i in range(30)],
        "vec_id long, embedding array<float>").write.parquet(vecs)
    rc = main(["cluster", "--vectors", vecs, "--out", str(tmp_path / "cl"),
               "--k", "3", "--dims", "8"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and sum(out["sizes"].values()) == 30
    assert len(out["sizes"]) == 3  # three planted value-groups, k=3


def test_engine_similarity_and_heavy_hitter_verbs(spark, sf_dir):
    from dbms_spark.engine import DbmsEngine
    from dbms_spark.sources.catalog import load_table, table_path

    eng = DbmsEngine(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter("vec_id % 100 = 0")
    path = table_path(sf_dir, "embeddings")
    exact = eng.similarity_search(emb, qs, k=3)
    assert exact.count() == qs.count() * 3
    for m in ("lsh", "ivf", "ivfpq"):
        out = eng.similarity_search(emb, qs, k=3, method=m, train_path=path)
        assert set(out.columns) >= {"query_id", "neighbor_id"}
        assert out.count() > 0
    hh = eng.heavy_hitters(load_table(spark, sf_dir, "orders"), "o_custkey", n=3)
    rows = hh.collect()
    assert len(rows) == 3 and all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_engine_corpus_report(spark, sf_dir):
    from dbms_spark.engine import DbmsEngine
    from dbms_spark.sources.catalog import load_table

    eng = DbmsEngine(spark)
    docs = load_table(spark, sf_dir, "documents")
    rep = eng.corpus_report(docs)
    assert set(rep) == {"languages", "quality_bands", "token_totals",
                        "dup_line_pressure", "exact_dup_groups",
                        "length_quantiles", "doc_ndv",
                        "source_overlap", "source_concentration"}
    conc = rep["source_concentration"].collect()
    assert len(conc) == 1 and conc[0].ndv > 0
    ov = rep["source_overlap"].collect()
    assert all(0 <= r.jaccard_ppm <= 1000000 for r in ov)
    q = {r.p: r.value for r in rep["length_quantiles"].collect()}
    assert q[0.25] <= q[0.5] <= q[0.95]
    assert rep["doc_ndv"].first().hll_est > 0
    langs = {r["pred_lang"]: r["n_docs"] for r in rep["languages"].collect()}
    assert sum(langs.values()) == docs.count()
    tot = rep["token_totals"].first()
    assert tot["n_docs"] == docs.count() and tot["total_tokens"] > 0
    bands = rep["quality_bands"].collect()
    assert all(0 <= r["band"] <= 10 for r in bands)


def test_engine_full_verify(spark, sf_dir):
    """The one-verb migration acceptance: struct drift detected, data
    mismatch classified per key, contract checked on the target, and
    repair SQL generated."""
    from pyspark.sql import functions as F

    from dbms_spark.engine import DbmsEngine

    eng = DbmsEngine(spark)
    src = load_table(spark, sf_dir, "orders")
    dst = src.filter("o_orderkey % 53 != 0").withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 41 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")))
    rules = [("price_positive", "o_totalprice", "min", 0.0)]
    rep = eng.full_verify(src, dst, "orders", ["o_orderkey"], constraint_rules=rules)
    assert rep["struct_equal"]
    assert not rep["compare"].equal
    kinds = {r["change_type"] for r in rep["key_diff"].collect()}
    assert kinds == {"INSERT", "UPDATE"}
    assert rep["fix_sql"] and any(s.upper().startswith(("INSERT", "REPLACE", "DELETE"))
                                  for s in rep["fix_sql"])
    assert rep["contract_violations"].first()["violations"] == 0

    # identical tables: clean bill, no worklist keys in the report
    rep2 = eng.full_verify(src, src, "orders", ["o_orderkey"])
    assert rep2["compare"].equal and "key_diff" not in rep2


def test_cli_migrate_and_scan_verbs(spark, tmp_path, capsys):
    import json as _json

    from dbms_spark.__main__ import main

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame([(i, float(i) + 0.5) for i in range(40)],
                          "id long, amount double").write.parquet(src)
    rc = main(["migrate", "--src", src, "--out", str(tmp_path / "mig"),
               "--keys", "id", "--chunks", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["rows"] == 40
    assert spark.read.parquet(str(tmp_path / "mig")).count() == 40

    rc = main(["scan", "--src", src, "--cols", "amount"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and sum(p["cnt"] for p in out["profile"]) == 40


def test_cli_cdc_verb(spark, tmp_path, capsys):
    import json as _json

    from dbms_spark.__main__ import main

    ev = tmp_path / "events"; ev.mkdir()
    rows = [
        {"schema_name": "s", "table_name": "t", "query_type": "INSERT",
         "commit_ts": 1, "key_json": _json.dumps({"id": 1}),
         "new_json": _json.dumps({"id": 1, "v": "a"}), "old_json": None,
         "is_ddl": False, "ddl_query": None},
        {"schema_name": "s", "table_name": "t", "query_type": "UPDATE",
         "commit_ts": 2, "key_json": _json.dumps({"id": 1}),
         "new_json": _json.dumps({"id": 1, "v": "a2"}), "old_json": None,
         "is_ddl": False, "ddl_query": None},
    ]
    with open(ev / "b1.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    rc = main(["cdc", "--events", str(ev), "--store", str(tmp_path / "st"),
               "--table", "t", "--keys", "id", "--row-schema", "id bigint, v string"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["rows"] == 1 and out["watermark"] == 2


def test_cli_status_verb(spark, tmp_path, capsys):
    import json as _json

    from dbms_spark.__main__ import main

    src = str(tmp_path / "s.parquet")
    spark.createDataFrame([(i,) for i in range(30)], "id long").write.parquet(src)
    rc = main(["migrate", "--src", src, "--out", str(tmp_path / "o"),
               "--keys", "id", "--chunks", "3", "--ledger", str(tmp_path / "led")])
    capsys.readouterr()
    rc = main(["status", "--ledger", str(tmp_path / "led")])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["by_status"]["done"]["chunks"] == 3
    assert out["by_status"]["done"]["rows"] == 30


def test_engine_curate(spark, sf_dir):
    """The one-verb curation pass: quality filter -> near-dup removal
    -> decontamination, each stage observably shrinking the corpus."""
    from pyspark.sql import functions as F

    from dbms_spark.engine import DbmsEngine
    from dbms_spark.sources.catalog import load_table

    eng = DbmsEngine(spark)
    # doc_id-keyed selections: limit() without ordering is not stable
    # across partition layouts
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text") \
        .filter("doc_id < 80")
    family = docs.filter("doc_id < 5")
    # inject exact-ish clones (one char appended) so dedup has work
    clones = family.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" x")).alias("text"))
    corpus = docs.unionAll(clones)
    n0 = corpus.count()

    # benchmark = clone texts verbatim: decontamination must drop any
    # clone-family representative that survives the dedup stage
    curated = eng.curate(corpus, bench=family, min_tokens=10, min_quality=0.0,
                         min_sim=0.5).cache()
    n1 = curated.count()
    assert 0 < n1 < n0                           # stages dropped rows
    # every clone family (original + clone) is gone entirely: dedup
    # kept one representative, decontamination removed it
    survivors = curated.filter(
        (F.col("doc_id") >= 1000000) | (F.col("doc_id") < 5)).count()
    assert survivors == 0
    curated.unpersist()


def test_cli_struct_verb(spark, tmp_path, capsys):
    import json as _json

    from dbms_spark.__main__ import main

    spec = {
        "tables": {"orders": [
            {"name": "order_id", "type_name": "NUMBER", "precision": 12,
             "nullable": False},
            {"name": "created_at", "type_name": "TIMESTAMP(6)",
             "default": "SYSDATE"},
        ]},
        "sequences": [
            {"name": "seq_orders", "last_number": 1000, "cache_size": 50},
        ],
    }
    f = tmp_path / "spec.json"
    f.write_text(_json.dumps(spec))
    rc = main(["struct", "--spec", str(f), "--if-not-exists"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert "`order_id` BIGINT NOT NULL" in out["tables"]["orders"]
    assert "DEFAULT NOW()" in out["tables"]["orders"]       # dialect-translated
    assert out["sequences"][0].startswith(
        "CREATE SEQUENCE IF NOT EXISTS DWH.seq_orders START 1100 ")


def test_engine_curate_with_passage_strip(spark):
    """curate(strip_passages_n=3): cross-doc boilerplate windows are
    removed before near-dup mining, and docs that were PURE boilerplate
    drop out entirely."""
    from dbms_spark.engine import DbmsEngine

    eng = DbmsEngine(spark)
    boiler = "all rights reserved contact us today"
    rows = [
        (1, f"unique alpha words one {boiler}"),
        (2, f"unique beta tokens two {boiler}"),
        (3, boiler),                              # pure boilerplate
        (4, "entirely original content with no shared passages at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = eng.curate(docs, min_tokens=1, min_quality=0.0, min_sim=0.99,
                     strip_passages_n=3)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 3 not in got                           # stripped to empty -> dropped
    assert set(got) == {1, 2, 4}
    for t in got.values():
        assert "rights reserved" not in t         # boilerplate gone
    assert got[4] == "entirely original content with no shared passages at all"


def test_cli_dedup_policies_and_overlap(spark, tmp_path, capsys):
    """CLI: dedup --keep-best/--drop-contained and the overlap verb."""
    import json as _json

    from dbms_spark.__main__ import main

    t = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    host = t + " kilo lima mike november oscar papa quebec romeo sierra tango"
    docs = str(tmp_path / "docs2.parquet")
    spark.createDataFrame(
        [(1, t, "s0", 10), (2, t, "s0", 99), (3, host, "s1", 5),
         (4, "unrelated words entirely different tokens here now yes", "s1", 1)],
        "doc_id long, text string, source string, score long"
    ).write.parquet(docs)

    rc = main(["dedup", "--docs", docs, "--out", str(tmp_path / "kb"),
               "--keep-best", "score", "--drop-contained"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["in"] == 4
    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "kb")).collect()}
    # keep-best keeps 2 (score 99) over 1; drop-contained then drops 2
    # (contained in host 3); 3 and 4 survive
    assert kept == {3, 4}

    rc = main(["overlap", "--docs", docs, "--group-col", "source",
               "--key-col", "text", "--k", "8"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["groups_pairs"] == 1
    assert out["top"][0]["g_a"] == "s0" and out["top"][0]["n_common"] == 0


def test_engine_retrieval_and_event_verbs(spark, sf_dir):
    """rank_bm25 / funnel / retention / top_paths / sparse overlap —
    thin façade checks (semantics are pinned in test_llm/test_events/
    test_sketch; gates q263-q267 hash-verify values)."""
    eng = DbmsEngine(spark)
    docs = load_table(spark, sf_dir, "documents")
    ranked = eng.rank_bm25(docs, ["spark", "join"], k=5).collect()
    assert len(ranked) == 5 and [r.rank for r in ranked] != []
    assert ranked[0].score_x1e6 >= ranked[-1].score_x1e6

    ev = load_table(spark, sf_dir, "events")
    fn = {r.step: r.n_users
          for r in eng.funnel(ev, ["view", "click", "purchase"]).collect()}
    assert fn[0] >= fn[1] >= fn[2]          # funnel is monotone

    ret = eng.retention(ev).collect()
    assert all(r.week_offset >= 0 and r.n_users > 0 for r in ret)

    paths = eng.top_paths(ev, n=2, k=5, tiebreak=["event_id"]).collect()
    assert len(paths) == 5 and all("->" in r.path for r in paths)

    sparse = eng.source_overlap(docs, "source", "text", k=16, sparse=True)
    dense = eng.source_overlap(docs, "source", "text", k=16)
    # unique texts -> sparse empty, dense keeps its zero rows
    assert sparse.count() <= dense.count()


def test_cli_search_and_events_verbs(spark, tmp_path, capsys):
    """CLI: search (BM25 top-k), events (funnel + anomaly count),
    overlap --sparse."""
    import datetime as dt
    import json as _json

    from dbms_spark.__main__ import main

    docs = str(tmp_path / "docs3.parquet")
    spark.createDataFrame(
        [(i, ("needle " if i % 3 == 0 else "") + f"common text uniq{i}", "s0")
         for i in range(9)],
        "doc_id long, text string, source string").write.parquet(docs)
    rc = main(["search", "--docs", docs, "--terms", "needle,common", "--k", "3"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and len(out["results"]) == 3
    assert all(r["doc_id"] % 3 == 0 for r in out["results"])  # needle docs win

    base = dt.datetime(2024, 1, 10)
    ev = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(1, base + dt.timedelta(hours=i), t, 10.0, i)
         for i, t in enumerate(["view", "click", "purchase", "view"])],
        "user_id long, ts timestamp, event_type string, value double,"
        " event_id long").write.parquet(ev)
    rc = main(["events", "--events", ev, "--funnel", "view,click,purchase",
               "--anomalies"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["funnel"] == {"view": 1, "click": 1, "purchase": 1}
    assert out["anomalies"] == 0

    rc = main(["events", "--events", ev,
               "--attribute", "purchase:view|click",
               "--heartbeat-gap", "1800"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["attribution"] == {"click": 1}
    assert out["heartbeat_gaps"] == 3   # every hour step > 30 min

    rc = main(["overlap", "--docs", docs, "--group-col", "source",
               "--key-col", "text", "--k", "4", "--sparse"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["groups_pairs"] == 0   # one group: no pairs


def test_engine_round8_event_facades(spark, sf_dir):
    """Thin façade checks for the round-8 event verbs (semantics are
    pinned in test_events + gates q288-q297)."""
    from pyspark.sql import functions as F

    from dbms_spark.sources.catalog import load_table

    eng = DbmsEngine(spark)
    ev = load_table(spark, sf_dir, "events")
    att = eng.attribute_multi(ev, "purchase", ["view", "click"],
                              max_touches=3)
    sums = (att.groupBy("conv_id").agg(F.sum("weight_ppm").alias("s"))
            .select(F.min("s"), F.max("s")).first())
    assert sums[0] == sums[1] == 1_000_000
    assert eng.heartbeat(ev, max_gap_seconds=86400,
                         tiebreak=["event_id"]).count() >= 0
    rep = {r.step: r for r in eng.funnel_report(
        ev, ["view", "click", "purchase"]).collect()}
    assert rep[0].conv_from_first_ppm == 1_000_000
    coh = eng.funnel_by_cohort(ev, ["view", "click"]).collect()
    assert all(r.n_users > 0 for r in coh)
    off = eng.offline_devices(ev, "2024-01-30 00:00:00",
                              threshold_seconds=3 * 86400)
    assert all(r.silent_seconds > 3 * 86400 for r in off.collect())


def test_cli_events_flags(spark, tmp_path, capsys):
    """events verb: new --activity-curve/--cohort-value flags, plus
    --heartbeat-gap 0 which the round-8 falsy check silently skipped
    (now valid: every positive gap exceeds a zero threshold)."""
    import datetime as dt
    import json as _json

    from dbms_spark.__main__ import main

    base = dt.datetime(2024, 5, 1)
    ev = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(u, base + dt.timedelta(seconds=s), t, 1.0, i)
         for i, (u, s, t) in enumerate(
             [(1, 0, "a"), (1, 90_000, "b"), (2, 10, "a")])],
        "user_id long, ts timestamp, event_type string, value double,"
        " event_id long").write.parquet(ev)
    rc = main(["events", "--events", ev, "--funnel", "a,b",
               "--activity-curve", "7", "--cohort-value", "7",
               "--heartbeat-gap", "0"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["n_events"] == 3
    assert out["funnel"] == {"a": 2, "b": 1}
    assert out["activity_curve"]["1"] == 1 and out["activity_curve"]["2"] == 1
    # all activity lands in age bucket 0 (days 0 and 1, 7-day buckets)
    assert out["cohort_value_rows"] == 1
    assert out["heartbeat_gaps"] >= 1          # zero threshold flags gaps
