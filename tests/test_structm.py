"""Struct migrate/compare: the NUMBER ladder golden values
(reference: database/mapping/oracle.go:30-250), rule priority, DDL
render, and metadata diff kinds."""

from pyspark.sql import types as T

from dbms_spark.operators import structm as S


def test_number_ladder():
    assert S.map_number(2, 0) == (T.ByteType(), "TINYINT")
    assert S.map_number(4, 0) == (T.ShortType(), "SMALLINT")
    assert S.map_number(8, 0) == (T.IntegerType(), "INT")
    assert S.map_number(18, 0) == (T.LongType(), "BIGINT")
    assert S.map_number(19, 0) == (T.DecimalType(19, 0), "DECIMAL(19,0)")
    assert S.map_number(10, 2) == (T.DecimalType(10, 2), "DECIMAL(10,2)")
    assert S.map_number(None, None) == (T.DecimalType(38, 10), "DECIMAL(38,10)")
    # precision/scale capping
    assert S.map_number(40, 35) == (T.DecimalType(38, 30), "DECIMAL(38,30)")


def test_map_type_families():
    assert S.map_type(S.ColumnSpec("a", "VARCHAR2", length=50))[1] == "VARCHAR(50)"
    assert S.map_type(S.ColumnSpec("a", "CLOB"))[0] == T.StringType()
    assert S.map_type(S.ColumnSpec("a", "BLOB"))[0] == T.BinaryType()
    assert S.map_type(S.ColumnSpec("a", "TIMESTAMP(9)"))[1] == "DATETIME(6)"  # Spark caps at 6
    assert S.map_type(S.ColumnSpec("a", "BINARY_DOUBLE"))[0] == T.DoubleType()
    assert "unmapped" in S.map_type(S.ColumnSpec("a", "SDO_GEOMETRY"))[1]


def test_rule_priority():
    out = S.resolve_rule(
        builtin={"NUMBER": "DECIMAL", "DATE": "DATETIME"},
        task={"DATE": "DATE"},
        table={"NUMBER": "BIGINT"},
        column={"NUMBER": "TINYINT"},
    )
    assert out["NUMBER"] == "TINYINT"  # column wins
    assert out["DATE"] == "DATE"       # task layer applied


def test_render_create_table():
    ddl = S.render_create_table(
        "t", [
            S.ColumnSpec("id", "NUMBER", precision=10, nullable=False),
            S.ColumnSpec("name", "VARCHAR2", length=20, default="'x'"),
        ],
    )
    assert "`id` BIGINT NOT NULL" in ddl
    assert "`name` VARCHAR(20) DEFAULT 'x'" in ddl
    assert ddl.startswith("CREATE TABLE t (")


def test_index_compare(spark):
    src = S.indexes_to_df(spark, "t", [
        S.IndexSpec("pk_t", ("id",), unique=True, primary=True),
        S.IndexSpec("ix_ab", ("a", "b")),
        S.IndexSpec("ux_c", ("c",), unique=True),
    ])
    dst = S.indexes_to_df(spark, "t", [
        S.IndexSpec("PRIMARY", ("id",), unique=True, primary=True),  # same def, diff name -> OK
        S.IndexSpec("ix_extra", ("z",)),
    ])
    out = {(r["columns"], r["kind"]): r for r in S.index_compare(src, dst).collect()}
    assert ("a,b", "MISSING_IN_DST") in out
    assert "CREATE INDEX `ix_ab` ON t (`a`, `b`);" == out[("a,b", "MISSING_IN_DST")]["alter_sql"]
    assert ("c", "MISSING_IN_DST") in out
    assert out[("c", "MISSING_IN_DST")]["alter_sql"].startswith("CREATE UNIQUE INDEX")
    assert ("z", "EXTRA_IN_DST") in out
    assert out[("z", "EXTRA_IN_DST")]["alter_sql"] == "DROP INDEX `ix_extra` ON t;"
    assert ("id", "OK") not in out  # name difference alone is not a diff


def test_gen_merge_and_delete():
    from dbms_spark.sources.jdbc import gen_delete_by_key, gen_merge_into

    m = gen_merge_into("db.t", ["id"], ["id", "v", "ts"])
    assert m.startswith("MERGE INTO db.t t USING (SELECT ?, ?, ?)")
    assert "ON t.`id` = s.`id`" in m
    assert "UPDATE SET t.`v` = s.`v`, t.`ts` = s.`ts`" in m
    assert "INSERT (`id`, `v`, `ts`)" in m
    assert gen_delete_by_key("t", ["a", "b"]) == "DELETE FROM t WHERE `a` = ? AND `b` = ?"
    # all columns are keys: no WHEN MATCHED clause (nothing to update)
    allkey = gen_merge_into("t", ["a", "b"], ["a", "b"])
    assert "WHEN MATCHED" not in allkey
    assert "WHEN NOT MATCHED THEN INSERT" in allkey


def test_struct_compare_kinds(spark):
    src_schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.DoubleType()),
    ])
    dst_schema = T.StructType([
        T.StructField("a", T.IntegerType()),   # type mismatch
        T.StructField("b", T.StringType()),    # ok
        T.StructField("d", T.StringType()),    # extra in dst
    ])                                          # c missing in dst
    src = S.schema_to_df(spark, "t", src_schema)
    dst = S.schema_to_df(spark, "t", dst_schema)
    out = {r["col_name"]: r for r in S.struct_compare(src, dst).collect()}
    assert out["a"]["kind"] == "TYPE_MISMATCH" and "MODIFY COLUMN" in out["a"]["alter_sql"]
    assert out["c"]["kind"] == "MISSING_IN_DST" and "ADD COLUMN" in out["c"]["alter_sql"]
    assert out["d"]["kind"] == "EXTRA_IN_DST" and "DROP COLUMN" in out["d"]["alter_sql"]
    assert "b" not in out


def test_struct_compare_default_comment_drift(spark):
    src = S.specs_to_df(spark, "t", [
        S.ColumnSpec("a", "INT", default="1", comment="counter"),
        S.ColumnSpec("b", "VARCHAR", length=10, default="'x'"),
        S.ColumnSpec("c", "DATE", default="SYSDATE"),
    ])
    dst = S.specs_to_df(spark, "t", [
        S.ColumnSpec("a", "INT", default="1", comment="renamed comment"),
        S.ColumnSpec("b", "VARCHAR", length=10),          # default dropped
        S.ColumnSpec("c", "DATE", default="SYSDATE"),     # identical
    ])
    out = {r["col_name"]: r for r in S.struct_compare(src, dst).collect()}
    assert out["a"]["kind"] == "COMMENT_MISMATCH" and "COMMENT 'counter'" in out["a"]["alter_sql"]
    assert out["b"]["kind"] == "DEFAULT_MISMATCH" and "SET DEFAULT 'x'" in out["b"]["alter_sql"]
    assert "c" not in out
    # default dropped on the SOURCE side -> suggest DROP DEFAULT
    out2 = {r["col_name"]: r for r in S.struct_compare(dst, src).collect()}
    assert "DROP DEFAULT" in out2["b"]["alter_sql"]


def test_partition_compare(spark):
    src = S.partitions_to_df(spark, "t", "RANGE", [
        S.PartitionSpec("p2023", "2024-01-01"),
        S.PartitionSpec("p2024", "2025-01-01"),
        S.PartitionSpec("p2025", "2026-01-01"),
    ])
    dst = S.partitions_to_df(spark, "t", "RANGE", [
        S.PartitionSpec("p2023", "2024-01-01"),
        S.PartitionSpec("p2024", "2025-06-01"),  # high value drift
    ])
    out = {r["partition_name"]: r for r in S.partition_compare(src, dst).collect()}
    assert out["p2025"]["kind"] == "ADD_PARTITION" and "ADD PARTITION" in out["p2025"]["suggest"]
    assert out["p2024"]["kind"] == "HIGH_VALUE_MISMATCH"
    assert "p2023" not in out
    # partition TYPE mismatch suppresses per-partition detail (manual path)
    dst_hash = S.partitions_to_df(spark, "t", "HASH", [S.PartitionSpec("h0", "4")])
    rows = S.partition_compare(src, dst_hash).collect()
    assert len(rows) == 1 and rows[0]["kind"] == "PARTITION_TYPE"
    assert rows[0]["suggest"] == "Manual Create Partition Table"


def test_table_meta_compare(spark):
    src = S.table_meta_to_df(spark, [("t", "orders fact", "utf8mb4", "utf8mb4_bin")])
    dst = S.table_meta_to_df(spark, [("t", None, "latin1", "latin1_swedish_ci")])
    out = {r["kind"]: r for r in S.table_meta_compare(src, dst).collect()}
    assert "COMMENT 'orders fact'" in out["TABLE_COMMENT"]["suggest"]
    assert "CONVERT TO CHARACTER SET utf8mb4" in out["CHARSET_COLLATION"]["suggest"]


def test_datatype_rule_tables(spark):
    # reference cardinality: 30 scalar + 10 interval + 1 + 30 timestamp variants
    assert len(S.O2M_DATATYPE_RULES) == 71
    assert dict(S.M2O_DATATYPE_RULES)["VARCHAR"] == "VARCHAR2"
    assert dict(S.O2M_DATATYPE_RULES)["VARCHAR2"] == "VARCHAR"
    assert dict(S.O2M_DATATYPE_RULES)["TIMESTAMP(6) WITH LOCAL TIME ZONE"] == "TIMESTAMP"
    cat = spark.createDataFrame(
        [("t", "a", 1, "BIGINT"), ("t", "b", 2, "VARCHAR"), ("t", "c", 3, "FLOAT[]")],
        "table_name string, column_name string, ordinal int, data_type string",
    )
    out = {r["column_name"]: r for r in S.datatype_rule_join(cat, spark).collect()}
    assert out["a"]["oracle_type"] == "NUMBER"
    assert out["a"]["mysql_type"] == "TINYINT/SMALLINT/INT/BIGINT/DECIMAL"
    assert out["b"]["oracle_type"] == "VARCHAR2" and out["b"]["mysql_type"] == "VARCHAR"
    assert "c" not in out  # no rule for array types -> dropped on both engines


def test_schema_compat_verdicts(spark):
    """Every verdict class from one evolution: widen by size, widen by
    rule (with min-size requirement), additive nullable, and the
    breaking trio (drop, narrow, nullable->NOT NULL)."""
    from dbms_spark.operators.structm import ColumnSpec, schema_compat, specs_to_df

    old = specs_to_df(spark, "t", [
        ColumnSpec("a", "NUMBER", precision=12, scale=2),   # DECIMAL(12,2)
        ColumnSpec("b", "VARCHAR2", length=10),
        ColumnSpec("c", "CHAR", length=2, nullable=True),
    ])
    new = specs_to_df(spark, "t", [
        ColumnSpec("a", "NUMBER", precision=10, scale=2),   # narrowed precision
        ColumnSpec("b", "VARCHAR2", length=5),              # narrowed length
        ColumnSpec("c", "CHAR", length=2, nullable=False),  # null -> NOT NULL
        ColumnSpec("d", "DATE", nullable=True),             # additive
    ])
    got = {r["col_name"]: r["verdict"] for r in schema_compat(old, new).collect()}
    assert got == {"a": "BREAKING", "b": "BREAKING", "c": "BREAKING", "d": "ADDITIVE"}

    ok = specs_to_df(spark, "t", [ColumnSpec("a", "NUMBER", precision=10, scale=0)])
    same = {r["verdict"] for r in schema_compat(ok, ok).collect()}
    assert same == {"OK"}


def test_schema_compat_scale_shrink_is_breaking(spark):
    from dbms_spark.operators.structm import ColumnSpec, schema_compat, specs_to_df

    old = specs_to_df(spark, "t", [ColumnSpec("a", "NUMBER", precision=12, scale=2)])
    new = specs_to_df(spark, "t", [ColumnSpec("a", "NUMBER", precision=13, scale=1)])
    assert schema_compat(old, new).first()["verdict"] == "BREAKING"
    wider = specs_to_df(spark, "t", [ColumnSpec("a", "NUMBER", precision=14, scale=2)])
    assert schema_compat(old, wider).first()["verdict"] == "SAFE_WIDEN"


def test_pg_datatype_rules_ladder_and_unmapped(spark):
    from dbms_spark.operators.structm import pg_datatype_rule_join

    cat = spark.createDataFrame([
        ("t", "a", "SERIAL", 0),
        ("t", "b", "CHAR", 100),        # -> CHAR(100)
        ("t", "c", "CHAR", 300),        # -> VARCHAR(300)
        ("t", "d", "CHAR", 20000),      # -> LONGTEXT
        ("t", "e", "VARCHAR", 20000),   # -> MEDIUMTEXT
        ("t", "f", "VARCHAR", 5000000), # -> LONGTEXT
        ("t", "g", "GEOGRAPHY", 0),     # unmapped -> NULL (manual)
    ], "table_name string, col_name string, base_type string, char_len long")
    got = {r["col_name"]: r["target_type"]
           for r in pg_datatype_rule_join(cat, spark).collect()}
    assert got == {"a": "INT", "b": "CHAR(100)", "c": "VARCHAR(300)",
                   "d": "LONGTEXT", "e": "MEDIUMTEXT", "f": "LONGTEXT",
                   "g": None}


def test_tidb_rule_families_mirror_reference():
    """O2T == O2M except NUMBER->DECIMAL; T2O == M2O verbatim
    (reference buildin_rule_datatype.go:469,1105)."""
    o2m = dict(S.O2M_DATATYPE_RULES)
    o2t = dict(S.O2T_DATATYPE_RULES)
    assert o2t["NUMBER"] == "DECIMAL" and o2m["NUMBER"] != "DECIMAL" or \
        o2m["NUMBER"] == o2t["NUMBER"] == "DECIMAL"
    assert {k: v for k, v in o2t.items() if k != "NUMBER"} == \
        {k: v for k, v in o2m.items() if k != "NUMBER"}
    assert S.T2O_DATATYPE_RULES == S.M2O_DATATYPE_RULES
    assert len(S.O2T_DATATYPE_RULES) == len(S.O2M_DATATYPE_RULES)


def test_default_value_rules():
    assert S.map_default_value("SYSDATE") == "NOW()"
    assert S.map_default_value("SYS_GUID()") == "UUID()"
    assert S.map_default_value("") == "NULL"
    assert S.map_default_value("'x'") == "'x'"            # literal passes through
    assert S.map_default_value(None) is None
    assert S.map_default_value("CURRENT_TIMESTAMP", "m2o") == "SYSDATE"
    assert S.map_default_value("NULL", "m2o") == "NULL"


def test_sequence_migrate(spark):
    """Cache-headroom START, NOMAXVALUE at the BIGINT ceiling, and
    flag rendering (reference struct_migrate_task.go:1142-1210)."""
    seqs = S.sequences_to_df(spark, "ODS", [
        S.SequenceSpec("s_cached", last_number=100, cache_size=20),
        S.SequenceSpec("s_nocache", last_number=100, cache_size=0,
                       max_value="9223372036854775807"),
        S.SequenceSpec("s_kept", last_number=10, increment_by=3, min_value=5,
                       max_value="500000", cache_size=7, cycle=True),
    ])
    out = {r["sequence_name"]: r for r in S.sequence_migrate(seqs, "DWH").collect()}
    # cached: +2*cache; nocache: +5000
    assert out["s_cached"]["start_with"] == 140
    assert out["s_nocache"]["start_with"] == 5100
    # Oracle default 10^28-1 and the exact int64 ceiling both exceed
    # the MySQL-compatible BIGINT domain
    assert "NOMAXVALUE" in out["s_cached"]["ddl"]
    assert "NOMAXVALUE" in out["s_nocache"]["ddl"]
    assert "NOCACHE" in out["s_nocache"]["ddl"]
    assert out["s_kept"]["ddl"] == (
        "CREATE SEQUENCE DWH.s_kept START 24 INCREMENT 3 MINVALUE 5 "
        "MAXVALUE 500000 CACHE 7 CYCLE;")
    # IF NOT EXISTS variant (CreateIfNotExist task param)
    ine = S.sequence_migrate(seqs, "DWH", if_not_exists=True).collect()
    assert all(r["ddl"].startswith("CREATE SEQUENCE IF NOT EXISTS DWH.") for r in ine)


def test_fk_check_compare(spark):
    """Definition-keyed FK/check diff (struct_compare_table.go:535-705):
    name-only drift is no diff; rule drift is an ADD+DROP pair."""
    src = S.fks_to_df(spark, "t", [
        S.ForeignKeySpec("fk_a", ("x",), "S", "r", ("rx",), delete_rule="CASCADE"),
        S.ForeignKeySpec("fk_b", ("y",), "S", "q", ("qy",)),
    ])
    dst = S.fks_to_df(spark, "t", [
        S.ForeignKeySpec("fk_a_renamed", ("x",), "S", "r", ("rx",), delete_rule="CASCADE"),
        S.ForeignKeySpec("fk_b", ("y",), "S", "q", ("qy",), update_rule="RESTRICT"),
    ])
    rows = S.fk_compare(src, dst, "T").collect()
    kinds = sorted(r["kind"] for r in rows)
    assert kinds == ["ADD", "DROP"]          # fk_a name drift invisible
    add = next(r for r in rows if r["kind"] == "ADD")
    assert add["alter_sql"] == \
        "ALTER TABLE T.t ADD FOREIGN KEY (y) REFERENCES S.q(qy);"
    drop = next(r for r in rows if r["kind"] == "DROP")
    assert drop["alter_sql"] == "ALTER TABLE T.t DROP FOREIGN KEY fk_b;"
    # BOTH rules render when both are set — the reference emits each rule
    # whenever non-empty (struct_compare_table.go CompareTableForeignConstraint)
    both = S.fks_to_df(spark, "t", [
        S.ForeignKeySpec("fk_c", ("z",), "S", "r", ("rz",),
                         delete_rule="SET NULL", update_rule="RESTRICT")])
    out = S.fk_compare(both, both.limit(0), "T").collect()
    assert out[0]["alter_sql"].endswith(
        "(rz) ON DELETE SET NULL ON UPDATE RESTRICT;")

    cs = S.checks_to_df(spark, "t", [("ck1", "(a > 0)")])
    cd = S.checks_to_df(spark, "t", [("ck2", "(b > 0)")])
    ck = {r["kind"]: r["alter_sql"] for r in S.check_compare(cs, cd, "T").collect()}
    assert ck["ADD"] == "ALTER TABLE T.t ADD CONSTRAINT ck1 CHECK (a > 0);"
    assert ck["DROP"] == "ALTER TABLE T.t DROP CHECK ck2;"


def test_render_create_table_translates_defaults():
    """DDL render applies the default-value dialect rules (SYSDATE ->
    NOW()); literals pass through; translate_defaults=None preserves
    the source expression verbatim."""
    specs = [S.ColumnSpec("ts", "DATE", default="SYSDATE"),
             S.ColumnSpec("name", "VARCHAR2", length=10, default="'x'")]
    ddl = S.render_create_table("t", specs)
    assert "DEFAULT NOW()" in ddl and "DEFAULT 'x'" in ddl
    raw = S.render_create_table("t", specs, translate_defaults=None)
    assert "DEFAULT SYSDATE" in raw


def test_sequence_migrate_invariants(spark):
    """Randomized invariants over one batched DataFrame pass: START
    always exceeds LAST_NUMBER (the cache-headroom guarantee),
    NOMAXVALUE exactly when max_value >= 2^63-1, flags consistent."""
    import random

    rng = random.Random(20260814)
    specs = []
    for i in range(50):
        cache = rng.choice([0, 0, 20, 100, 5000])
        maxv = rng.choice([
            "99999", "9223372036854775806", "9223372036854775807",
            "9999999999999999999999999999"])
        specs.append(S.SequenceSpec(
            f"s{i}", last_number=rng.randrange(1, 10**12),
            increment_by=rng.choice([1, 2, 5]), min_value=rng.randrange(1, 100),
            max_value=maxv, cache_size=cache, cycle=rng.random() < 0.5))
    by_name = {s.name: s for s in specs}
    out = S.sequence_migrate(
        S.sequences_to_df(spark, "ODS", specs), "DWH").collect()
    assert len(out) == len(specs)
    for r in out:
        s = by_name[r["sequence_name"]]
        pad = 5000 if s.cache_size == 0 else 2 * s.cache_size
        assert r["start_with"] == s.last_number + pad > s.last_number
        assert ("NOMAXVALUE" in r["ddl"]) == (int(s.max_value) >= 2**63 - 1)
        assert ("NOCACHE" in r["ddl"]) == (s.cache_size == 0)
        assert r["ddl"].endswith("CYCLE;") and \
            (" NOCYCLE;" in r["ddl"]) == (not s.cycle)


def test_m2p_rules_and_pg_render(spark):
    """MySQL/TiDB -> Postgres direction: UNSIGNED widens one rung, the
    text/blob ladder collapses, lengths re-attach only on
    parameterizable PG types, and the DDL renders double-quoted with
    translated defaults (reference task flows MYSQL@POSTGRES /
    TIDB@POSTGRES, utils/constant/task.go:62)."""
    m2p = dict(S.M2P_DATATYPE_RULES)
    assert m2p["INT UNSIGNED"] == "BIGINT"            # widened
    assert m2p["BIGINT UNSIGNED"] == "NUMERIC(20,0)"  # no wider integer
    assert m2p["LONGTEXT"] == m2p["TINYTEXT"] == "TEXT"   # ladder collapses
    assert m2p["LONGBLOB"] == m2p["VARBINARY"] == "BYTEA"
    assert S.T2P_DATATYPE_RULES == S.M2P_DATATYPE_RULES   # TiDB reuses MySQL

    specs = [
        S.ColumnSpec("id", "BIGINT UNSIGNED", nullable=False),
        S.ColumnSpec("name", "VARCHAR", length=120, nullable=False),
        S.ColumnSpec("bal", "DECIMAL", precision=12, scale=2, default="0"),
        S.ColumnSpec("ts", "DATETIME", default="CURRENT_TIMESTAMP"),
        S.ColumnSpec("uid", "CHAR", length=36, default="UUID()"),
        S.ColumnSpec("blob", "LONGBLOB"),
        S.ColumnSpec("geo", "GEOGRAPHY"),              # unmapped -> flagged
    ]
    ddl = S.pg_render_create_table("accounts", specs)
    assert '"id" NUMERIC(20,0) NOT NULL' in ddl
    assert '"name" CHARACTER VARYING(120) NOT NULL' in ddl
    assert '"bal" NUMERIC(12,2) DEFAULT 0' in ddl     # literal passes through
    assert '"ts" TIMESTAMP WITHOUT TIME ZONE DEFAULT CURRENT_TIMESTAMP' in ddl
    assert '"uid" CHARACTER(36) DEFAULT gen_random_uuid()' in ddl
    assert '"blob" BYTEA' in ddl
    assert 'unmapped source type: GEOGRAPHY' in ddl
    assert ddl.startswith('CREATE TABLE "accounts" (')

    # rule-join: unmapped types surface as NULL target, lengths attach
    cat = spark.createDataFrame(
        [("t", "a", "VARCHAR", 50), ("t", "b", "TEXT", None),
         ("t", "c", "GEOGRAPHY", None), ("t", "d", "INT UNSIGNED", None)],
        "table_name string, col_name string, base_type string, char_len bigint")
    got = {r["col_name"]: r["target_type"]
           for r in S.m2p_datatype_rule_join(cat, spark).collect()}
    assert got == {"a": "CHARACTER VARYING(50)", "b": "TEXT",
                   "c": None, "d": "BIGINT"}
