"""Semantic tests for PII scrubbing — parity proves the engines agree;
these prove the redaction actually fires on the intended shapes."""

import duckdb

from docling_api_spark.operators import pii


def _run(rows):
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"(VALUES {vals}) v(doc_id, text)")
    out = {}
    for r in con.sql(pii._pii_sql("duck")).fetchall():
        out[r[0]] = r
    clean = {r[0]: r[1] for r in con.sql(
        "SELECT doc_id, " + pii.scrub_expr("duck", pii._inject_sql())
        + " AS c FROM documents").fetchall()}
    return out, clean


def test_all_three_classes_redacted():
    # doc 21: %3=0 (email) and %4=1 (phone); doc 12: %3=0, %5=2 (ip)
    out, clean = _run([(21, "hello world"), (12, "data row")])
    assert out[21][1] == 1 and out[21][2] == 1      # email + phone
    assert out[12][1] == 1 and out[12][3] == 1      # email + ip
    assert "<EMAIL>" in clean[21] and "<PHONE>" in clean[21]
    assert "<IP>" in clean[12]
    assert "@" not in clean[21]
    assert "10.0." not in clean[12]


def test_clean_doc_untouched():
    out, clean = _run([(1, "just words here")])
    # doc 1: %4=1 injects a phone only
    assert out[1][1] == 0 and out[1][2] == 1 and out[1][3] == 0
    assert clean[1].startswith("just words here")
    assert "555" not in clean[1]


def test_real_world_shapes_redacted():
    # r3 review find: the first patterns were lowercase-only and pinned
    # to the synthetic 7-digit phone — real shapes leaked through
    import duckdb

    from docling_api_spark.operators.pii import scrub_expr
    con = duckdb.connect()

    def scrub(s):
        return con.sql(
            "SELECT " + scrub_expr("duck", f"'{s}'")).fetchall()[0][0]

    assert scrub("mail John.Doe@Example.COM now") == "mail <EMAIL> now"
    assert scrub("call +1-555-867-5309 ok") == "call <PHONE> ok"
    assert scrub("call +44-20-7946-0958 ok") == "call <PHONE> ok"
    assert scrub("ip 10.0.200.41 end") == "ip <IP> end"


def test_email_redacted_before_phone_pass():
    # the email's digits must not be half-eaten by the phone pass:
    # redaction order is email -> phone -> ip
    out, clean = _run([(0, "x")])          # %3=0: email only
    assert out[0][1] == 1 and out[0][2] == 0
    assert clean[0] == "x contact <EMAIL> now"
