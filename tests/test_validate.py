

def test_benford_screen_hand_values(spark):
    """Planted Benford-ish vs uniform first digits: the screen's
    obs_ppm is exact integer share; a never-observed digit reports
    n=0 with full deviation; leading zeros/decimals don't fool the
    digit extraction (0.042 -> 4)."""
    from dbms_spark.operators.validate import BENFORD_PPM, benford_screen

    vals = ([1.0] * 30 + [2.5] * 18 + [0.042] * 10 + [9000.0] * 2
            + [0.0] * 5)           # zeros: no [1-9] digit, dropped
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.digit: (r.n, r.obs_ppm, r.abs_dev_ppm)
           for r in benford_screen(df, "x").collect()}
    assert set(got) == set(range(1, 10))       # full spine
    assert got[1][0] == 30 and got[2][0] == 18
    assert got[4][0] == 10                     # 0.042 -> first digit 4
    assert got[9][0] == 2
    assert got[3] == (0, 0, BENFORD_PPM[3])    # absent digit surfaces
    total = sum(n for n, _, _ in got.values())
    assert total == 60                         # zeros dropped
    assert got[1][1] == 1_000_000 * 30 // 60
