"""Plugin chain routing/provenance (utils/plugins.py) and scalar
function parity (utils/dates.py, utils/helpers.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from alerta_spark.functions import date_parts, is_ip, is_ipv4, is_ipv6, to_utc
from alerta_spark.plugins import PluginChain, drop_when, with_column_when


def _events(spark):
    return spark.createDataFrame(
        [
            ("1", "authentication", ["login"], "x"),
            ("2", "network", ["firewall"], "y"),
            ("3", "authentication", [], "z"),
        ],
        "event_id string, category string, tags array<string>, payload string",
    )


def test_plugin_routes_on_category_and_tags(spark):
    chain = PluginChain()
    chain.register(
        "auth_enricher",
        ["authentication"],
        with_column_when("enriched", F.lit("yes")),
        priority=10,
    )
    chain.register("login_tagger", ["login"], with_column_when("login_seen", F.lit(True)))
    out = chain.apply(_events(spark)).orderBy("event_id").collect()
    assert [r["plugins"] for r in out] == [
        ["auth_enricher", "login_tagger"],
        [],
        ["auth_enricher"],
    ]
    assert [r["enriched"] for r in out] == ["yes", None, "yes"]


def test_plugin_star_matches_all_and_priority_order(spark):
    chain = PluginChain()
    chain.register("late", ["*"], with_column_when("mark", F.lit("late")), priority=200)
    chain.register("early", ["*"], with_column_when("mark", F.lit("early")), priority=1)
    out = chain.apply(_events(spark)).collect()
    # later (higher priority number) plugin runs last and wins the column
    assert all(r["mark"] == "late" for r in out)
    assert all(r["plugins"] == ["early", "late"] for r in out)


def test_plugin_drop(spark):
    chain = PluginChain()
    chain.register("dropper", ["network"], drop_when(F.lit(True)))
    out = chain.apply(_events(spark))
    assert sorted(r["event_id"] for r in out.collect()) == ["1", "3"]


def test_register_plugins_directory_discovery(spark):
    """U1 module discovery (reference utils/plugins.py:32-61): scan a
    directory, register message classes by priority, route by
    registration tokens, honor the drop signal."""
    import os

    from alerta_spark.plugins import register_plugins

    plugin_dir = os.path.join(os.path.dirname(__file__), "sample_plugins")
    chain = register_plugins(plugin_dir)
    assert [p.name for p in chain.plugins] == ["lowercase_severity", "drop_debug"]
    assert [p.priority for p in chain.plugins] == [5, 50]

    df = spark.createDataFrame(
        [
            ("1", "INFO", "alert"),
            ("2", "WARNING", "debug"),   # dropped by drop_debug
            ("3", None, "alert"),
        ],
        "event_id string, severity string, category string",
    )
    out = {r["event_id"]: r for r in chain.apply(df).collect()}
    assert set(out) == {"1", "3"}          # debug event dropped
    assert out["1"]["severity"] == "info"  # lowercased by the row plugin
    assert out["1"]["plugins"] == ["lowercase_severity", "drop_debug"]


def test_register_plugins_missing_dir_and_bad_module(tmp_path):
    from alerta_spark.plugins import register_plugins

    assert register_plugins("/nonexistent/path").plugins == []
    bad = tmp_path / "broken_plugin.py"
    bad.write_text("raise RuntimeError('boom')\n")
    try:
        register_plugins(str(tmp_path))
        raise AssertionError("expected ImportError")
    except ImportError:
        pass


def test_to_utc_epoch_heuristics(spark):
    df = spark.createDataFrame(
        [("1700000000",), ("1700000000000",), ("1700000000000000",),
         ("1700000000000000000",), ("2023-11-14T22:13:20Z",)],
        "v string",
    )
    rows = df.select(to_utc(F.col("v")).alias("t")).collect()
    expect = datetime(2023, 11, 14, 22, 13, 20)
    assert all(r["t"] == expect for r in rows), rows


def test_date_parts_zero_padded(spark):
    df = spark.createDataFrame([(datetime(2026, 2, 3, 4, 5),)], "ts timestamp")
    p = df.select(date_parts(F.col("ts")).alias("p")).first()["p"]
    assert (p["year"], p["month"], p["day"], p["hour"]) == ("2026", "02", "03", "04")


def test_ip_validators(spark):
    df = spark.createDataFrame(
        [("6.9.9.93",), ("256.1.1.1",), ("::1",), ("2001:db8::8a2e:370:7334",), ("nope",)],
        "ip string",
    )
    rows = df.select(
        "ip", is_ipv4("ip").alias("v4"), is_ipv6("ip").alias("v6"), is_ip("ip").alias("any")
    ).collect()
    got = {r["ip"]: (r["v4"], r["v6"], r["any"]) for r in rows}
    assert got["6.9.9.93"] == (True, False, True)
    assert got["256.1.1.1"] == (False, False, False)
    assert got["::1"] == (False, True, True)
    assert got["2001:db8::8a2e:370:7334"] == (False, True, True)
    assert got["nope"] == (False, False, False)
