"""Property-based engine parity: hypothesis-generated adversarial texts
through the SAME metric on Spark and DuckDB. The driver's oracle gate
checks parity on the synthetic corpus; these push the portable-SQL
formulations through hostile inputs (newlines, symbols, digits,
unicode ellipsis, repeated tokens, leading/trailing whitespace) that
the corpus never contains."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from indu_doc_transformer_spark.operators import textstats as ts

# tokens that exercise every rule: words, digits, symbols, ellipsis
TOKEN = st.sampled_from(
    ["alpha", "beta", "Gamma", "123", "42", "#", "...", "…", "x1", "répète"]
)
SEP = st.sampled_from([" ", "  ", "\n", "\n\n", " \n "])


@st.composite
def texts(draw):
    toks = draw(st.lists(TOKEN, min_size=1, max_size=12))
    seps = [draw(SEP) for _ in toks[:-1]] + [""]
    return "".join(t + s for t, s in zip(toks, seps))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(texts(), min_size=1, max_size=24))
def test_gopher_metrics_parity(spark, con, batch):
    rows = [(i, t) for i, t in enumerate(batch)]
    df = spark.createDataFrame(rows, "id long, text string")
    t = F.col("text")
    got = {
        r.id: (r.nw, r.mwl, r.ar, r.dr, r.dl, r.sym, r.keep)
        for r in df.select(
            "id",
            ts.ws_token_count(t).alias("nw"),
            ts.mean_word_len_x100(t).alias("mwl"),
            ts.alpha_word_ratio(t).alias("ar"),
            ts.digit_word_ratio(t).alias("dr"),
            ts.dup_line_fraction(t).alias("dl"),
            ts.symbol_word_ratio(t).alias("sym"),
            ts.gopher_keep(t).cast("int").alias("keep"),
        ).collect()
    }
    con.execute("CREATE OR REPLACE TABLE h AS SELECT * FROM (VALUES (NULL::BIGINT, NULL::VARCHAR)) v(id, text) WHERE false")
    con.executemany("INSERT INTO h VALUES (?, ?)", rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(r"""
            WITH t AS (SELECT id, text,
                        regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
                        list_filter(list_transform(regexp_split_to_array(text, '\n'), x -> trim(x)), x -> x != '') AS lines
                       FROM h)
            SELECT id,
                   len(toks),
                   cast(floor(list_sum(list_transform(toks, x -> length(x))) * 100.0 / len(toks)) as bigint),
                   round(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) / cast(len(toks) as double), 6),
                   round(len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) / cast(len(toks) as double), 6),
                   CASE WHEN len(lines) <= 0 THEN 0.0
                        ELSE round((len(lines) - len(list_distinct(lines))) / cast(len(lines) as double), 6) END,
                   round(len(regexp_extract_all(text, '\.{3}|[#…]')) / cast(len(toks) as double), 6),
                   CASE WHEN len(toks) >= 5
                        AND cast(floor(list_sum(list_transform(toks, x -> length(x))) * 100.0 / len(toks)) as bigint) <= 1000
                        AND round(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) / cast(len(toks) as double), 6) >= 0.6
                        AND (CASE WHEN len(lines) <= 0 THEN 0.0
                             ELSE round((len(lines) - len(list_distinct(lines))) / cast(len(lines) as double), 6) END) <= 0.3
                        AND (CASE WHEN len(paras) <= 0 THEN 0.0
                             ELSE round((len(paras) - len(list_distinct(paras))) / cast(len(paras) as double), 6) END) <= 0.3
                        AND round(len(regexp_extract_all(text, '\.{3}|[#…]')) / cast(len(toks) as double), 6) <= 0.1
                        THEN 1 ELSE 0 END
            FROM (SELECT *, list_filter(list_transform(regexp_split_to_array(text, '\n{2,}'), x -> trim(x)), x -> x != '') AS paras FROM t)
        """).fetchall()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(texts(), min_size=1, max_size=16))
def test_pii_redaction_parity(spark, con, batch):
    """PII regexes behave identically in Java regex and RE2 over
    adversarial token soup with injected PII fragments."""
    rows = [
        (i, t + (" a@b.co 1.2.3.4 +1234567" if i % 2 == 0 else ""))
        for i, t in enumerate(batch)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    t = F.col("text")
    got = {
        r.id: (r.e, r.i, r.p, r.red)
        for r in df.select(
            "id",
            ts.pii_count(t, "EMAIL").alias("e"),
            ts.pii_count(t, "IPV4").alias("i"),
            ts.pii_count(t, "PHONE").alias("p"),
            ts.pii_redact(t).alias("red"),
        ).collect()
    }
    con.execute("CREATE OR REPLACE TABLE hp AS SELECT * FROM (VALUES (NULL::BIGINT, NULL::VARCHAR)) v(id, text) WHERE false")
    con.executemany("INSERT INTO hp VALUES (?, ?)", rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(r"""
            SELECT id,
                   len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
                   len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')),
                   len(regexp_extract_all(text, '\+\d{7,15}')),
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
                       '\+\d{7,15}', '<PHONE>', 'g')
            FROM hp
        """).fetchall()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(texts(), min_size=1, max_size=16))
def test_ngram_repetition_parity(spark, con, batch):
    """The gram-window arithmetic (sequence bounds, slice lengths,
    denominators ntok-(n-1)) agrees between the Spark higher-order
    expressions and the DuckDB formulation on hostile inputs, including
    docs shorter than n."""
    rows = [(i, t) for i, t in enumerate(batch)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: (r.top2_frac, r.top3_frac, r.top4_frac)
        for r in ts.top_ngram_stats(df, "id", "text").collect()
    }
    con.execute("CREATE OR REPLACE TABLE hn AS SELECT * FROM (VALUES (NULL::BIGINT, NULL::VARCHAR)) v(id, text) WHERE false")
    con.executemany("INSERT INTO hn VALUES (?, ?)", rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(r"""
            WITH t AS (SELECT id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM hn),
            base AS (SELECT id, cast(len(toks) as bigint) AS ntok, toks FROM t WHERE len(toks) >= 2),
            g AS (
              SELECT id, ntok, n,
                     unnest(list_transform(generate_series(1, ntok - (n - 1)),
                                           i -> array_to_string(list_slice(toks, i, i + n - 1), ' '))) AS gram
              FROM base, (SELECT unnest([2, 3, 4]) AS n) ns WHERE ntok >= n
            ),
            c AS (SELECT id, ntok, n, gram, count(*) AS cnt FROM g GROUP BY ALL),
            top AS (SELECT id, ntok, n, max(cnt) AS top_cnt FROM c GROUP BY ALL)
            SELECT id,
                   round(coalesce(max(CASE WHEN n = 2 THEN top_cnt / cast(ntok - 1 as double) END), 0.0), 6),
                   round(coalesce(max(CASE WHEN n = 3 THEN top_cnt / cast(ntok - 2 as double) END), 0.0), 6),
                   round(coalesce(max(CASE WHEN n = 4 THEN top_cnt / cast(ntok - 3 as double) END), 0.0), 6)
            FROM top GROUP BY id
        """).fetchall()
    }
    assert got == want  # docs with < 2 ws-tokens appear in neither
