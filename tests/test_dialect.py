from alerta_spark.dialect import trino_to_spark


def test_json_extract_scalar_rewrite():
    assert (
        trino_to_spark("json_extract_scalar(details,'$.eventname') = 'ConsoleLogin'")
        == "get_json_object(details,'$.eventname') = 'ConsoleLogin'"
    )


def test_rewrite_skips_string_literals():
    crit = "x = 'json_extract_scalar(a)' AND json_extract_scalar(b,'$.c')=1"
    out = trino_to_spark(crit)
    assert out.startswith("x = 'json_extract_scalar(a)'")
    assert "get_json_object(b,'$.c')=1" in out


def test_case_insensitive():
    assert trino_to_spark("JSON_EXTRACT_SCALAR(d,'$.x')") == "get_json_object(d,'$.x')"


def test_cast_and_position_pass_through():
    crit = (
        "CAST(json_extract_scalar(details,'$.risk_score') as INTEGER)>80 "
        "AND position('Defaulted' IN json_extract_scalar(details,'$.risk_reasons'))=0"
    )
    out = trino_to_spark(crit)
    assert "CAST(get_json_object(details,'$.risk_score') as INTEGER)>80" in out
    assert "position('Defaulted' IN get_json_object(details,'$.risk_reasons'))=0" in out


def test_escaped_quote_in_literal():
    crit = "name = 'O''json_extract_scalar' AND json_extract_scalar(d,'$.x')='1'"
    out = trino_to_spark(crit)
    assert "'O''json_extract_scalar'" in out
    assert "get_json_object(d,'$.x')='1'" in out
