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


def test_is_cloudtrail_reference_regex(spark):
    """C17: the reference's regex verbatim (utils/helpers.py:10) —
    digits prefix required, case-insensitive, .json.gz suffix."""
    from alerta_spark.functions import is_cloudtrail

    df = spark.createDataFrame(
        [
            ("123456_CloudTrail_us-east-1.json.gz", True),
            ("999_cloudtrail_x.JSON.GZ", True),
            ("cloudtrail_x.json.gz", False),   # no digits prefix
            ("123456_cloudtrail_x.json", False),  # wrong suffix
            ("randomfile.log", False),
        ],
        "fname string, expect boolean",
    )
    rows = df.select("expect", is_cloudtrail("fname").alias("got")).collect()
    assert all(r["got"] == r["expect"] for r in rows)


def test_cidr_validation_and_membership(spark):
    """C16 CIDR parity with reference netaddr (utils/helpers.py:44-74):
    is_ip accepts ranges; in_cidr is a pure range predicate."""
    from alerta_spark.functions import in_any_cidr, in_cidr, ipv4_to_long, is_cidr, is_ip

    df = spark.createDataFrame(
        [
            ("10.0.0.0/8", True, False),
            ("192.168.1.5", True, False),
            ("192.168.1.0/33", False, False),  # bad prefix
            ("10.1.2.3", True, True),
            ("10.255.255.255", True, True),
            ("11.0.0.0", True, False),
            ("2001:db8::/32", True, False),
            ("999.1.1.1", False, False),
            ("5", False, False),  # reference rejects bare digits
        ],
        "ip string, valid boolean, in_ten boolean",
    )
    rows = df.select(
        "ip",
        "valid",
        "in_ten",
        is_ip("ip").alias("got_valid"),
        in_cidr("ip", "10.0.0.0/8").alias("got_in"),
    ).collect()
    for r in rows:
        assert r["got_valid"] == r["valid"], r["ip"]
        assert r["got_in"] == r["in_ten"], r["ip"]

    assert is_cidr is not None
    v = df.select(ipv4_to_long("ip").alias("n")).where(F.col("ip") == "10.1.2.3")
    assert v.collect()[0]["n"] == 10 * 16777216 + 1 * 65536 + 2 * 256 + 3
    multi = df.select(
        "ip", in_any_cidr("ip", ["11.0.0.0/8", "192.168.0.0/16"]).alias("m")
    ).collect()
    got = {r["ip"]: r["m"] for r in multi}
    assert got["11.0.0.0"] is True and got["192.168.1.5"] is True
    assert got["10.1.2.3"] is False


def test_to_utc_conformant_reference_semantics(spark):
    """C8 conformance mode: fuzzy strings parse, the string epoch-
    divisor quirk is replicated, <=0 maps to epoch zero, junk is NULL
    (reference utils/dates.py:38-85)."""
    from datetime import datetime

    from alerta_spark.functions import to_utc_conformant

    df = spark.createDataFrame(
        [
            ("1700000000",),        # 10 digits -> divisor 10^(10%10)=1 -> seconds
            ("0",),                 # <= 0 -> epoch zero
            ("-12.5",),             # negative float -> epoch zero
            ("seen on 2023-11-14 at 22:13 UTC",),  # fuzzy
            ("total garbage",),     # NULL (reference raises; scans can't)
        ],
        "raw string",
    )
    got = {
        r["raw"]: r["ts"]
        for r in df.select("raw", to_utc_conformant("raw").alias("ts")).collect()
    }
    assert got["1700000000"] == datetime(2023, 11, 14, 22, 13, 20)
    assert got["0"] == datetime(1970, 1, 1)
    assert got["-12.5"] == datetime(1970, 1, 1)
    assert got["seen on 2023-11-14 at 22:13 UTC"] == datetime(2023, 11, 14, 22, 13)
    assert got["total garbage"] is None


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


def test_meteor_id_and_short_uuid_formats(spark):
    """C12/C13: nondeterministic values, deterministic CONTRACTS —
    meteor_id is 24 lowercase hex chars (alerta.py:31-35), short_uuid
    is the first 8 uuid chars (utils/helpers.py:35-36); distinct per
    row."""
    import re

    from alerta_spark.functions import meteor_id, short_uuid

    rows = (
        spark.range(200)
        .select(meteor_id().alias("mid"), short_uuid().alias("sid"))
        .collect()
    )
    assert all(re.fullmatch(r"[0-9a-f]{24}", r["mid"]) for r in rows)
    assert all(re.fullmatch(r"[0-9a-f-]{8}", r["sid"]) for r in rows)
    assert len({r["mid"] for r in rows}) == 200  # unique per row


def test_plugin_null_category_never_matches_or_drops(spark):
    """arrays_overlap yields NULL (not false) when either side holds a
    null element: an event with category=NULL satisfying a drop
    predicate used to be silently DELETED by a plugin that never
    matched it (~NULL is NULL, where(NULL) drops). The token array is
    now NULL-free and the match bit coalesced to false."""
    df = spark.createDataFrame(
        [("1", None, None, "x"), ("2", "network", ["fw", None], "y")],
        "event_id string, category string, tags array<string>, payload string",
    )
    chain = PluginChain()
    chain.register("dropper", ["authentication"], drop_when(F.lit(True)))
    out = chain.apply(df)
    # neither row matches 'authentication' -> nothing may drop
    assert sorted(r["event_id"] for r in out.collect()) == ["1", "2"]
    chain2 = PluginChain()
    chain2.register("net_dropper", ["network"], drop_when(F.lit(True)))
    out2 = chain2.apply(df)
    # the null TAG element must not poison row 2's genuine match
    assert [r["event_id"] for r in out2.collect()] == ["1"]


def test_plugin_provenance_survives_routing_field_rewrite(spark):
    """The reference appends the executed plugin's name AFTER
    onMessage runs, based on the PRE-transform match: a plugin that
    rewrites its own routing field must still be recorded."""
    df = spark.createDataFrame(
        [("1", "raw", ["raw"], "x")],
        "event_id string, category string, tags array<string>, payload string",
    )
    chain = PluginChain()
    # matched rows lose the 'raw' tag — the routing field it matched on
    chain.register(
        "normalizer",
        ["raw"],
        with_column_when("tags", F.array().cast("array<string>")),
    )
    row = chain.apply(df).first()
    assert row["tags"] == []
    assert row["plugins"] == ["normalizer"]


def test_to_utc_overflow_strings_null_not_crash(spark):
    """ANSI casts throw on overflow; the silent-miss contract says a
    garbage numeric string yields NULL, never an aborted scan."""
    from alerta_spark.functions.scalars import to_utc, to_utc_conformant

    df = spark.createDataFrame(
        [("20000000000000000000",), ("1" + "0" * 40,), ("inf",), ("1700000000",)],
        "v string",
    )
    rows = df.select("v", to_utc("v").alias("t")).collect()
    got = {r["v"]: r["t"] for r in rows}
    assert got["1700000000"] is not None
    assert got["20000000000000000000"] is None
    assert got["1" + "0" * 40] is None
    rows2 = df.select("v", to_utc_conformant("v").alias("t")).collect()
    got2 = {r["v"]: r["t"] for r in rows2}
    assert got2["1700000000"] is not None
    assert got2["20000000000000000000"] is None
    assert got2["inf"] is None
