"""Value-level pins for the rank/changepoint statistics on constructed
inputs with KNOWN closed-form answers (SURVEY §5.2-3: the differential
oracle cannot catch a bug SHARED by both engines — round-9 ADVICE found
exactly that class in q100/q101, where a spurious /2 lived in the Spark
expression AND the oracle SQL, so the hash gate stayed green while tau
and K were both halved). These tests pin the statistics to hand-derived
values on tiny frames, independent of any oracle."""

from __future__ import annotations

import math

import pytest

from e_commerce_data_engineering_spark.plans.tpch_stats import (
    q100_kendall_tau,
    q101_pettitt_changepoint,
)


@pytest.fixture(scope="module")
def stat_sf_dir(spark, tmp_path_factory):
    """A miniature sf dir holding only the tables these pins read."""
    root = tmp_path_factory.mktemp("stat_pins")

    # lineitem: flag A perfectly concordant (d_i, q_i) = (i, i), flag B
    # perfectly discordant (i, 11 - i); 10 tie-free points each.
    li = [("A", i / 100.0, float(i)) for i in range(1, 11)] + [
        ("B", i / 100.0, float(11 - i)) for i in range(1, 11)
    ]
    spark.createDataFrame(
        li, "l_returnflag string, l_discount double, l_quantity double"
    ).coalesce(1).write.parquet(str(root / "lineitem.parquet"))

    # orders: one order per day for 40 days, cents-exact step 100.00 ->
    # 200.00 after day 20.
    import datetime as dt

    base = dt.date(1995, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), 100.0 if i < 20 else 200.0)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).coalesce(1).write.parquet(str(root / "orders.parquet"))
    return str(root)


def test_q100_tau_perfect_concordance(spark, stat_sf_dir):
    out = {
        r["flag"]: r
        for r in q100_kendall_tau(spark, stat_sf_dir).collect()
    }
    a, b = out["A"], out["B"]
    assert a["concordant"] == 45 and a["discordant"] == 0
    assert a["tau_b"] == pytest.approx(1.0)  # was 0.5 through round 9
    assert b["concordant"] == 0 and b["discordant"] == 45
    assert b["tau_b"] == pytest.approx(-1.0)


def test_q101_pettitt_step_series(spark, stat_sf_dir):
    row = q101_pettitt_changepoint(spark, stat_sf_dir).collect()[0]
    n = 40
    xs = [100.0 if i < 20 else 200.0 for i in range(n)]
    # brute-force Pettitt: U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j)
    us = []
    for t in range(1, n):
        u = 0
        for i in range(t):
            for j in range(t, n):
                u += (xs[i] > xs[j]) - (xs[i] < xs[j])
        us.append(u)
    k = max(abs(u) for u in us)
    assert k == 400  # 20 * 20 discordant block
    assert row["n_days"] == n
    assert row["k_stat"] == pytest.approx(float(k))  # was K/2 through r9
    assert row["change_day"] == "1995-01-20"
    p = 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2))
    assert row["p_value"] == pytest.approx(p, abs=1e-6)
    assert row["mean_before"] == pytest.approx(100.0)
    assert row["mean_after"] == pytest.approx(200.0)


def test_q116_rho_perfect_monotone(spark, stat_sf_dir):
    """Spearman's rho on the same constructed frame: flag A's tie-free
    perfectly increasing ranks give rho = +1 exactly, flag B's
    perfectly decreasing ranks give rho = -1 — a halving/doubling slip
    in the midrank identity or the moment formula cannot survive this
    pin (the q100 lesson: both engines shared the bug, so only a
    closed-form pin catches it)."""
    from e_commerce_data_engineering_spark.plans.tpch_stats import (
        q116_spearman_rho,
    )

    out = {
        r["flag"]: r for r in q116_spearman_rho(spark, stat_sf_dir).collect()
    }
    assert out["A"]["n"] == 10 and out["B"]["n"] == 10
    assert out["A"]["rho_s"] == pytest.approx(1.0)
    assert out["B"]["rho_s"] == pytest.approx(-1.0)
