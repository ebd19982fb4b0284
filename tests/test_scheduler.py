"""Frontier wave scheduler: host budgets + priority wave selection."""

from pyspark.sql import functions as F

from crawlspark.scheduler import allocate_host_budgets, select_wave


def test_allocate_proportional_with_clamps(spark):
    stats = spark.createDataFrame(
        [("a", 700), ("b", 250), ("c", 49), ("d", 1)],
        "host string, weight int",
    )
    out = {
        r["host"]: r["budget"]
        for r in allocate_host_budgets(
            stats, total_budget=1000, min_budget=5, max_budget=600
        ).collect()
    }
    # floor(1000*w/1000) clamped to [5, 600]
    assert out == {"a": 600, "b": 250, "c": 49, "d": 5}


def _frontier(spark):
    rows = [
        # host, url, priority, ts
        ("a", "u1", 9, 1), ("a", "u2", 9, 0), ("a", "u3", 5, 0),
        ("b", "v1", 7, 2), ("b", "v2", 8, 1),
        ("c", "w1", 1, 0),
    ]
    return spark.createDataFrame(
        rows, "host string, url string, priority long, crawl_ts long"
    )


def test_select_wave_host_order_and_budget_cut(spark):
    budgets = spark.createDataFrame(
        [("a", 2), ("b", 1)], "host string, budget long"
    )  # c absent -> uncapped
    out = select_wave(_frontier(spark), budgets=budgets).collect()
    got = {r["url"]: r["host_seq"] for r in out}
    # a: u2 (ts 0) before u1 (ts 1) at equal priority; u3 cut by budget 2
    # b: v2 (priority 8) first; v1 cut by budget 1
    assert got == {"u2": 1, "u1": 2, "v2": 1, "w1": 1}


def test_select_wave_global_rank_and_size(spark):
    out = select_wave(_frontier(spark), wave_size=3).collect()
    by_rank = {r["wave_rank"]: r["url"] for r in out}
    # global order: priority DESC, ts, url -> u2(9,0) u1(9,1) v2(8,1)
    assert by_rank == {1: "u2", 2: "u1", 3: "v2"}


def test_salted_precut_equals_naive(spark):
    """The presalt pre-cut is exact: salted vs unsalted paths agree on a
    frontier with a hot host and a mix of capped/uncapped hosts."""
    rows = [("hot", f"u{i:04d}", i % 11, i % 7) for i in range(400)]
    rows += [("cold", f"c{i}", i, 0) for i in range(20)]
    rows += [("free", f"f{i}", i % 3, i) for i in range(30)]  # uncapped
    df = spark.createDataFrame(
        rows, "host string, url string, priority long, crawl_ts long"
    )
    budgets = spark.createDataFrame(
        [("hot", 25), ("cold", 7)], "host string, budget long"
    )

    def run(presalt):
        out = select_wave(df, budgets=budgets, wave_size=40, presalt=presalt)
        return sorted(
            (r["url"], r["host_seq"], r["wave_rank"]) for r in out.collect()
        )

    assert run(None) == run(8)


def test_select_wave_composes_budget_then_size(spark):
    budgets = spark.createDataFrame([("a", 1)], "host string, budget long")
    out = select_wave(_frontier(spark), budgets=budgets, wave_size=2).collect()
    by_rank = {r["wave_rank"]: r["url"] for r in out}
    # a cut to u2 only; then global: u2(9,0) v2(8,1)
    assert by_rank == {1: "u2", 2: "v2"}
