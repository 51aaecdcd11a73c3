"""Cross-engine fuzz: every portable expression must be bit-identical in
Spark and DuckDB on adversarial text — unicode, emoji, punctuation runs,
whitespace-only, empty strings, huge tokens.  One generated corpus, one
pass per engine, row-by-row comparison (deterministic seed)."""

import random

import duckdb
import pandas as pd
import pytest

from ayeaye_spark.functions import portable as P

WORDS = [
    "the", "value", "spark", "müller", "naïve", "café", "中文", "данные",
    "a", "x9", "HTTP", "don't", "co-op", "3.14", "€100", "omega:Ω",
]
PUNCT = [".", ",", "!!", "??", "—", "…", "(", ")", ";", ":"]
WS = [" ", "  ", "\t", "\n", " \t ", "   "]


def make_corpus(n=250, seed=42):
    rng = random.Random(seed)
    texts = ["", " ", "\t\n", "a", "ONE-TOKEN", "ü", "中 文 字", "  leading", "trailing  "]
    while len(texts) < n:
        parts = []
        for _ in range(rng.randint(1, 40)):
            parts.append(rng.choice(WORDS))
            if rng.random() < 0.3:
                parts.append(rng.choice(PUNCT))
            parts.append(rng.choice(WS))
        texts.append("".join(parts))
    return texts


EXPRS = {
    "token_count": lambda d: P.token_count("text", d),
    "lex_tokens": lambda d: P.size(P.regexp_tokens("text", d), d),
    "fingerprint": lambda d: P.fingerprint("text", d),
    "lang_id": lambda d: P.lang_id("text", d),
    "quality_ppm": lambda d: P.quality_score_ppm("text", d),
    "char_hash": lambda d: P.char_hash("text", d),
}

# two-step expressions over a materialized token-hash column
HASH_EXPRS = {
    "simhash": lambda d: P.simhash32_from_hashes("th", d),
    "minhash4": lambda d: P.concat_ws_arr(
        ",", P.minhash_from_hashes("sh", 4, d), d
    ),
}


@pytest.mark.parametrize("seed", [42, 7])
def test_portable_expressions_match_across_engines(spark, seed):
    texts = make_corpus(seed=seed)
    pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz")
    con = duckdb.connect()
    con.register("fuzz", pdf)

    cols_s = ", ".join(f"{fn(P.SPARK)} AS {name}" for name, fn in EXPRS.items())
    cols_d = ", ".join(f"{fn(P.DUCKDB)} AS {name}" for name, fn in EXPRS.items())
    srows = {r["rid"]: r.asDict() for r in spark.sql(
        f"SELECT rid, {cols_s} FROM fuzz").collect()}
    dcols = ["rid", *EXPRS]
    drows = {r[0]: dict(zip(dcols, r)) for r in con.sql(
        f"SELECT rid, {cols_d} FROM fuzz").fetchall()}

    mismatches = []
    for rid, srow in srows.items():
        for name in EXPRS:
            if srow[name] != drows[rid][name]:
                mismatches.append((rid, name, srow[name], drows[rid][name], texts[rid][:60]))
    assert not mismatches, f"{len(mismatches)} diffs; first: {mismatches[:5]}"

    # hash-array two-step expressions
    s_inner = (f"SELECT rid, {P.hash_array(P.tokens('text', P.SPARK), P.SPARK)} AS th, "
               f"{P.token_hash_ngrams('th0', 2, P.SPARK)} AS sh FROM "
               f"(SELECT rid, text, {P.hash_array(P.tokens('text', P.SPARK), P.SPARK)} AS th0 FROM fuzz)")
    d_inner = (f"SELECT rid, {P.hash_array(P.tokens('text', P.DUCKDB), P.DUCKDB)} AS th, "
               f"{P.token_hash_ngrams('th0', 2, P.DUCKDB)} AS sh FROM "
               f"(SELECT rid, text, {P.hash_array(P.tokens('text', P.DUCKDB), P.DUCKDB)} AS th0 FROM fuzz)")
    cols_s2 = ", ".join(f"{fn(P.SPARK)} AS {name}" for name, fn in HASH_EXPRS.items())
    cols_d2 = ", ".join(f"{fn(P.DUCKDB)} AS {name}" for name, fn in HASH_EXPRS.items())
    srows2 = {r["rid"]: r.asDict() for r in spark.sql(
        f"SELECT rid, {cols_s2} FROM ({s_inner})").collect()}
    dcols2 = ["rid", *HASH_EXPRS]
    drows2 = {r[0]: dict(zip(dcols2, r)) for r in con.sql(
        f"SELECT rid, {cols_d2} FROM ({d_inner})").fetchall()}
    mismatches2 = [
        (rid, name, srows2[rid][name], drows2[rid][name], texts[rid][:60])
        for rid in srows2 for name in HASH_EXPRS
        if srows2[rid][name] != drows2[rid][name]
    ]
    assert not mismatches2, f"{len(mismatches2)} diffs; first: {mismatches2[:5]}"


def test_asof_join_fuzz_vs_duckdb(spark):
    """Randomized as-of join (backward + forward) vs DuckDB's native ASOF
    JOIN on 40 users x ~25 events (unique ts per user — engines may pick
    differently among exact ties, which both treat as unspecified)."""
    import random

    rng = random.Random(1234)
    left_rows, right_rows = [], []
    rid = 0
    for u in range(40):
        ts_pool = rng.sample(range(1, 5000), 50)
        for t in ts_pool[:25]:
            left_rows.append((rid, u, t)); rid += 1
        for t in ts_pool[25:]:
            right_rows.append((u, t, float(t) / 7.0))

    left = spark.createDataFrame(left_rows, "id long, u long, t long")
    right = spark.createDataFrame(right_rows, "u long, t long, v double")

    con = duckdb.connect()
    con.register("l", pd.DataFrame(left_rows, columns=["id", "u", "t"]))
    con.register("r", pd.DataFrame(right_rows, columns=["u", "t", "v"]))

    back = {r["id"]: r["v"] for r in relational_asof(left, right, "backward").collect()}
    duck_back = dict(con.sql(
        "SELECT l.id, r.v FROM l ASOF LEFT JOIN r ON l.u = r.u AND r.t <= l.t"
    ).fetchall())
    assert back == duck_back

    fwd = {r["id"]: r["v"] for r in relational_asof(left, right, "forward").collect()}
    duck_fwd = dict(con.sql(
        "SELECT l.id, r.v FROM l ASOF LEFT JOIN r ON l.u = r.u AND r.t >= l.t"
    ).fetchall())
    assert fwd == duck_fwd


def relational_asof(left, right, direction):
    from ayeaye_spark.operators.relational import asof_join

    return asof_join(left, right, on="t", by=["u"], right_value_cols=["v"],
                     direction=direction)


@pytest.mark.parametrize("seed", [42, 7])
def test_python_twin_matches_sql_chain(spark, seed):
    """functions.portable_py must reproduce the SQL hash chain exactly on
    the adversarial corpus: tokens -> char hash -> 3-gram shingle hashes
    -> minhash signature (the vectorized dedup stage's contract)."""
    from ayeaye_spark.functions import portable_py as PY

    texts = make_corpus(seed=seed)
    pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("fuzz_py")

    sql = (
        f"SELECT rid, {P.token_hash_ngrams('th', 3, P.SPARK)} AS sh, "
        f"{P.minhash_from_hashes('sh0', 8, P.SPARK)} AS mh FROM "
        f"(SELECT rid, {P.hash_array(P.tokens('text', P.SPARK), P.SPARK)} AS th, "
        f" {P.token_hash_ngrams('th0', 3, P.SPARK)} AS sh0 FROM "
        f" (SELECT rid, text, {P.hash_array(P.tokens('text', P.SPARK), P.SPARK)} AS th0 "
        f"  FROM fuzz_py))"
    )
    srows = {r["rid"]: (sorted(r["sh"]), list(r["mh"])) for r in spark.sql(sql).collect()}

    simhash_sql = (
        f"SELECT rid, {P.simhash32_from_hashes('th', P.SPARK)} AS sim FROM "
        f"(SELECT rid, {P.hash_array(P.tokens('text', P.SPARK), P.SPARK)} AS th FROM fuzz_py)"
    )
    ssim = {r["rid"]: r["sim"] for r in spark.sql(simhash_sql).collect()}

    lang_sql = (
        f"SELECT rid, {P.lang_id_from_tokens('tk', P.SPARK)} AS lg, "
        f"{P.quality_score_ppm_from_tokens('text', 'tk', P.SPARK)} AS q FROM "
        f"(SELECT rid, text, {P.tokens('text', P.SPARK)} AS tk FROM fuzz_py)"
    )
    stext = {r["rid"]: (r["lg"], r["q"]) for r in spark.sql(lang_sql).collect()}

    cache = {}
    for rid, text in enumerate(texts):
        toks = PY.tokens(text)
        assert (PY.lang_id(toks), PY.quality_score_ppm(text, toks)) == stext[rid], \
            f"text twin rid={rid} text={text[:60]!r}"
        th = PY.token_hashes(toks, cache)
        sh = PY.shingle_hashes(th, 3)
        mh = PY.minhash(sh, 8)
        got = (sorted(sh.tolist()), mh.tolist())
        assert got == srows[rid], f"rid={rid} text={text[:60]!r}"
        assert PY.simhash32(th) == ssim[rid], f"simhash rid={rid} text={text[:60]!r}"


class TestPositionalShingleParity:
    def test_positional_shingles_three_way(self, spark):
        """portable.token_hash_ngrams_all (SPARK + DUCKDB dialects) and
        portable_py.shingle_hashes_positional produce the SAME ordered
        gram list — positions included (the repeated-span operator's
        correctness rests on index alignment, not just set equality)."""
        from ayeaye_spark.functions import portable_py as PY

        texts = make_corpus(seed=77)
        pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})
        spark.createDataFrame(pdf).createOrReplaceTempView("fuzz_pos")
        duck = duckdb.connect()
        duck.register("fuzz_pos_d", pdf)

        for n in (1, 2, 5):
            s_sql = (
                f"SELECT rid, {P.token_hash_ngrams_all('th', n, P.SPARK)} AS g FROM "
                f"(SELECT rid, {P.hash_array(P.tokens('text', P.SPARK), P.SPARK)} AS th "
                f" FROM fuzz_pos)"
            )
            srows = {r["rid"]: list(r["g"]) for r in spark.sql(s_sql).collect()}
            d_sql = (
                f"SELECT rid, {P.token_hash_ngrams_all('th', n, P.DUCKDB)} AS g FROM "
                f"(SELECT rid, {P.hash_array(P.tokens('text', P.DUCKDB), P.DUCKDB)} AS th "
                f" FROM fuzz_pos_d)"
            )
            drows = {rid: list(g) for rid, g in duck.execute(d_sql).fetchall()}
            cache = {}
            for rid, text in enumerate(texts):
                th = PY.token_hashes(PY.tokens(text), cache)
                py = PY.shingle_hashes_positional(th, n).tolist()
                assert py == srows[rid], f"spark n={n} rid={rid}"
                assert py == drows[rid], f"duckdb n={n} rid={rid}"


GOPHER_EXPRS = {
    "mean_len": lambda d: P.mean_token_len_ppm(P.tokens("text", d), d),
    "symbol": lambda d: P.symbol_token_ppm("text", P.tokens("text", d), d),
    "bullet": lambda d: P.bullet_line_ppm("text", d),
    "ellipsis": lambda d: P.ellipsis_line_ppm("text", d),
    "alpha": lambda d: P.alpha_token_ppm(P.tokens("text", d), d),
    "gopher": lambda d: P.gopher_pass("text", P.tokens("text", d), d),
}


@pytest.mark.parametrize("seed", [42, 11])
def test_gopher_rule_expressions_match_across_engines(spark, seed):
    texts = make_corpus(seed=seed)
    # adversarial line structure for the line-based rules
    texts += [
        "- bullet one\n* bullet two\n• bullet three\nplain",
        "trailing dots...\nmore…\nno dots",
        "\n\n\n", "- \n* \n",
        "# symbols # everywhere # the of and...",
    ]
    pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("gfuzz")
    con = duckdb.connect()
    con.register("gfuzz", pdf)

    cols_s = ", ".join(f"{fn(P.SPARK)} AS {name}" for name, fn in GOPHER_EXPRS.items())
    cols_d = ", ".join(f"{fn(P.DUCKDB)} AS {name}" for name, fn in GOPHER_EXPRS.items())
    srows = {r["rid"]: r.asDict() for r in spark.sql(
        f"SELECT rid, {cols_s} FROM gfuzz").collect()}
    dcols = ["rid", *GOPHER_EXPRS]
    drows = {r[0]: dict(zip(dcols, r)) for r in con.sql(
        f"SELECT rid, {cols_d} FROM gfuzz").fetchall()}

    mismatches = []
    for rid, srow in srows.items():
        for name in GOPHER_EXPRS:
            if srow[name] != drows[rid][name]:
                mismatches.append((rid, name, srow[name], drows[rid][name],
                                   texts[rid][:60]))
    assert not mismatches, f"{len(mismatches)} diffs; first: {mismatches[:5]}"


@pytest.mark.parametrize("seed", [42])
def test_gopher_python_twins_match_sql(spark, seed):
    """functions.portable_py's rule twins must be bit-identical to the
    SQL renderings on the same adversarial corpus (the vectorized
    operator depends on this parity)."""
    from ayeaye_spark.functions import portable_py as PY

    texts = make_corpus(seed=seed) + [
        "- bullet\n* two\n• three\nplain",
        "dots...\nmore…\nnone",
        "\tindented tab line\n - spaced bullet",
        "#tag # # the of and...",
    ]
    pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("pfuzz", pdf)
    cols_d = ", ".join(f"{fn(P.DUCKDB)} AS {name}" for name, fn in GOPHER_EXPRS.items())
    drows = {r[0]: dict(zip(["rid", *GOPHER_EXPRS], r)) for r in con.sql(
        f"SELECT rid, {cols_d} FROM pfuzz").fetchall()}

    mismatches = []
    for rid, t in enumerate(texts):
        toks = PY.tokens(t)
        got = {
            "mean_len": PY.mean_token_len_ppm(toks),
            "symbol": PY.symbol_token_ppm(t, toks),
            "bullet": PY.bullet_line_ppm(t),
            "ellipsis": PY.ellipsis_line_ppm(t),
            "alpha": PY.alpha_token_ppm(toks),
            "gopher": PY.gopher_pass(t, toks),
        }
        for name, v in got.items():
            if v != drows[rid][name]:
                mismatches.append((rid, name, v, drows[rid][name], t[:60]))
    assert not mismatches, f"{len(mismatches)} diffs; first: {mismatches[:5]}"


@pytest.mark.parametrize("seed", [3, 19])
def test_sq8_and_int_dot_match_across_engines(spark, seed):
    """Round-8 array helpers: sq8 quantization (per-value IEEE + floor)
    and the integer dot must be bit-identical across engines on random
    vectors, including degenerate (constant) dimensions and extreme
    magnitudes."""
    rng = random.Random(seed)
    d = 6
    vecs = []
    for i in range(120):
        v = [rng.uniform(-1e4, 1e4) for _ in range(d)]
        v[3] = 7.25          # degenerate dimension: mx == mn
        if i % 17 == 0:
            v[0] = 0.0
        vecs.append(v)
    mn = [min(v[i] for v in vecs) for i in range(d)]
    mx = [max(v[i] for v in vecs) for i in range(d)]
    pdf = pd.DataFrame({
        "rid": range(len(vecs)),
        "v": vecs,
        "mn": [mn] * len(vecs),
        "mx": [mx] * len(vecs),
    })

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("sq8fuzz")
    scode = P.sq8_codes("v", "mn", "mx", P.SPARK)
    got_s = {
        r["rid"]: (list(r["code"]), r["dd"])
        for r in spark.sql(
            f"SELECT rid, {scode} AS code, "
            f"{P.int_dot(scode, scode, P.SPARK)} AS dd FROM sq8fuzz"
        ).collect()
    }

    con = duckdb.connect()
    con.register("sq8fuzz", pdf)
    dcode = P.sq8_codes("v", "mn", "mx", P.DUCKDB)
    got_d = {
        rid: (list(code), dd)
        for rid, code, dd in con.execute(
            f"SELECT rid, {dcode} AS code, "
            f"{P.int_dot(dcode, dcode, P.DUCKDB)} AS dd FROM sq8fuzz"
        ).fetchall()
    }
    assert got_s == got_d
    # degenerate dimension codes to 0 everywhere; codes are in [0,255]
    assert all(c[3] == 0 for c, _ in got_s.values())
    assert all(0 <= x <= 255 for c, _ in got_s.values() for x in c)


@pytest.mark.parametrize("seed", [5, 23])
def test_bpe_piece_count_matches_across_engines(spark, seed):
    """The separator-replace BPE apply must agree bit-for-bit across
    engines on adversarial text — unicode, quotes, punctuation runs —
    and with a python reference applying the same greedy merges."""
    texts = make_corpus(n=120, seed=seed)
    merges = [("t", "h"), ("th", "e"), ("'", "'"), ("м", "ю"),
              ("a", "n"), ("an", "d")]
    pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("bpefuzz")
    sexpr = P.bpe_piece_count("coalesce(text, '')", merges, P.SPARK)
    got_s = dict(spark.sql(
        f"SELECT rid, {sexpr} AS np FROM bpefuzz"
    ).collect())

    con = duckdb.connect()
    con.register("bpefuzz", pdf)
    dexpr = P.bpe_piece_count("coalesce(text, '')", merges, P.DUCKDB)
    got_d = dict(con.execute(
        f"SELECT rid, {dexpr} AS np FROM bpefuzz"
    ).fetchall())
    assert got_s == got_d

    def apply_word(w):
        syms = list(w)
        for l, r in merges:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            syms = out
        return len(syms)

    for rid, t in enumerate(texts):
        expect = sum(apply_word(w) for w in (t or "").lower().split())
        assert got_s[rid] == expect, (rid, t[:40])


def test_embedding_coverage_ppm_matches_on_non_clean_ratio(spark):
    """coverage_ppm uses per-dialect integer floor division; the prior
    float `/` + CAST AS BIGINT passed only on clean ratios (Spark
    truncates toward zero, DuckDB rounds to nearest — 2*1e6/3 was
    666666 vs 666667).  Pin both engines to the same floor on a 2/3
    coverage corpus."""
    import duckdb
    import pandas as pd

    from ayeaye_spark.catalog import _embedding_coverage_sql

    docs = pd.DataFrame({"doc_id": [1, 2, 3]})
    embs = pd.DataFrame({"vec_id": [1, 2]})

    spark.createDataFrame(docs).createOrReplaceTempView("documents")
    spark.createDataFrame(embs).createOrReplaceTempView("embeddings")
    srow = spark.sql(_embedding_coverage_sql(P.SPARK)).collect()[0]

    con = duckdb.connect()
    con.register("documents", docs)
    con.register("embeddings", embs)
    cur = con.execute(_embedding_coverage_sql(P.DUCKDB))
    drow = dict(zip([c[0] for c in cur.description], cur.fetchone()))

    assert srow["coverage_ppm"] == drow["coverage_ppm"] == 666666
    assert srow["n_docs_with_embedding"] == 2 and srow["n_docs"] == 3


URL_CASES = [
    "HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#frag",
    "http://example.com/a",
    "https://user:pw@Sub.Example.co.uk.:443//x//y///?gclid=99&z=9&a=",
    "example.com/path/?fbclid=1",
    "https://example.com",
    "https://example.com/?",
    "https://example.com/#",
    "http://example.com:8080/a/b/",
    "ftp://Files.Example.ORG:21/pub/",
    "https://example.com/a?A=1&a=1",          # case-distinct params kept
    "https://example.com/a?utm_campaign=x",   # only-tracking query
    "https://example.com/a?&&",               # empty params
    "https://EXAMPLE.com./",
    "http://a.b.c.d.example.gov.au/x?p=q#y",
    "no scheme no slash",
    "",
    " https://spaced.example.com/x ",
    None,
]


def test_canonical_url_and_domain_match_across_engines(spark):
    """portable.canonical_url / url_host / registrable_domain must be
    bit-identical in Spark and DuckDB on adversarial URLs."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"rid": range(len(URL_CASES)), "url": URL_CASES})
    spark.createDataFrame(pdf).createOrReplaceTempView("urlfuzz")
    con = duckdb.connect()
    con.register("urlfuzz", pdf)

    def q(d):
        return (f"SELECT rid, {P.canonical_url('url', d)} AS c, "
                f"{P.registrable_domain(P.url_host('url', d), d)} AS g "
                f"FROM urlfuzz")

    got_s = {r["rid"]: (r["c"], r["g"])
             for r in spark.sql(q(P.SPARK)).collect()}
    got_d = {r[0]: (r[1], r[2])
             for r in con.execute(q(P.DUCKDB)).fetchall()}
    assert got_s == got_d
    # spot-pin the semantics (not just cross-engine agreement)
    assert got_s[0][0] == "http://example.com/a?a=1&b=2"
    # a tracking/port/fragment-only variant collapses onto case 0
    import duckdb as _dd

    variant = "http://EXAMPLE.com/a?b=2&utm_x=1&a=1"
    got_v = _dd.connect().execute(
        f"SELECT {P.canonical_url(repr(variant), P.DUCKDB)}"
    ).fetchone()[0]
    assert got_v == got_s[0][0]
    assert got_s[2][1] == "example.co.uk"      # PSL second-level
    assert got_s[10][0] == "https://example.com/a"  # tracking-only query
    assert got_s[13][1] == "example.gov.au"
    assert got_s[17] == (None, None)           # NULL url propagates


def test_encoding_artifact_counts_match_across_engines(spark):
    import duckdb
    import pandas as pd

    texts = [
        "clean ascii",
        "cafÃ© and naÃ¯ve",                  # 2 mojibake
        "smart â€™ quote â€œ open",          # 2 mojibake
        "lost � char �",                     # 2 replacement
        "ctrl \x07 bell \x01 one \x1f unit", # 3 control
        "tab\tand\nnewline are fine",        # whitelisted controls
        "Â nbsp artifact",                   # 1 mojibake (Â + space? no: Â+space not in class)
        "",
        None,
    ]
    pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})
    spark.createDataFrame(pdf).createOrReplaceTempView("encfuzz")
    con = duckdb.connect()
    con.register("encfuzz", pdf)

    def q(d):
        m, r, c = P.encoding_artifact_counts("coalesce(text, '')", d)
        return f"SELECT rid, {m} AS m, {r} AS r, {c} AS c FROM encfuzz"

    got_s = {r["rid"]: (r["m"], r["r"], r["c"])
             for r in spark.sql(q(P.SPARK)).collect()}
    got_d = {r[0]: (r[1], r[2], r[3])
             for r in con.execute(q(P.DUCKDB)).fetchall()}
    assert got_s == got_d
    assert got_s[0] == (0, 0, 0)
    assert got_s[1] == (2, 0, 0)
    assert got_s[2] == (2, 0, 0)
    assert got_s[3] == (0, 2, 0)
    assert got_s[4] == (0, 0, 3)
    assert got_s[5] == (0, 0, 0)   # \t and \n are legitimate


HTML_CASES = [
    '<html><head><title>T</title><style>p {color: red}</style>'
    '<script type="text/javascript">var x = 1 < 2;</script></head>'
    '<body><!-- hidden\n comment --><h1>Doc &amp; Title</h1>'
    '<p>Some &lt;b&gt;text&#39;s&nbsp;here &amp;lt; raw.</p>'
    '<ul><li><a href="/x">Nav one</a></li><li><a class="k">Nav\ntwo'
    '</a></li></ul><a>pair</a><A HREF="y">CAPS</A></body></html>',
    "plain no tags &quot;q&quot;",
    "<a>only a link</a>",
    "<script>all script</script>",
    "<style>.x{}</style>leftover",
    "<p>t</p><a href='u'>L1</a><a>L2</a>",
    "<br><br>spaced<hr/>out",
    "un<closed",                       # dangling '<' is literal text
    "<!-- only comment -->",
    "a < b and c > d",                 # bare comparisons survive
    "<SCRIPT>CAPS()</SCRIPT>ok",
    "",
    None,
]


def test_html_extraction_matches_across_engines(spark):
    """portable.html_to_text / html_anchor_texts / link_density_ppm
    must be bit-identical in Spark (Java regex) and DuckDB (RE2) on
    adversarial markup."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"rid": range(len(HTML_CASES)), "h": HTML_CASES})
    spark.createDataFrame(pdf).createOrReplaceTempView("htmlfuzz")
    con = duckdb.connect()
    con.register("htmlfuzz", pdf)

    def q(d):
        return (f"SELECT rid, {P.html_to_text('h', d)} AS t, "
                f"{P.html_anchor_texts('h', d)} AS a, "
                f"{P.link_density_ppm('h', d)} AS l FROM htmlfuzz")

    got_s = {r["rid"]: (r["t"], list(r["a"]) if r["a"] is not None else None,
                        r["l"])
             for r in spark.sql(q(P.SPARK)).collect()}
    got_d = {r[0]: (r[1], r[2], r[3]) for r in con.execute(q(P.DUCKDB)).fetchall()}
    assert got_s == got_d
    # semantic pins, not just agreement
    assert got_s[0][0] == ("T Doc & Title Some <b>text's here &lt; raw. "
                           "Nav one Nav two pair CAPS")
    assert got_s[0][1] == ["Nav one", "Nav two", "pair", "CAPS"]
    assert got_s[3] == ("", [], 0)            # script-only page
    assert got_s[9][0] == "a < b and c > d"   # "< b and c >" is no tag... 
    assert got_s[12] == (None, None, None)    # NULL propagates


def test_license_flags_match_across_engines(spark):
    import duckdb
    import pandas as pd

    texts = [
        "Licensed under Creative Commons Attribution 4.0",
        "see https://creativecommons.org/licenses/by-nc-sa/3.0/",
        "This is CC BY-SA licensed",
        "ALL RIGHTS RESERVED",
        "public domain dedication",
        "CC0 waiver applies",
        "noai noimageai",
        "the word noaim does not opt out",
        "nothing special",
        "",
        None,
    ]
    pdf = pd.DataFrame({"rid": range(len(texts)), "text": texts})
    spark.createDataFrame(pdf).createOrReplaceTempView("licfuzz")
    con = duckdb.connect()
    con.register("licfuzz", pdf)

    def q(d):
        flags = P.license_signal_flags("text", d)
        cols = ", ".join(f"{e} AS {n}" for n, e in flags.items())
        return f"SELECT rid, {cols} FROM licfuzz"

    got_s = {r["rid"]: (r["cc_license"], r["public_domain"],
                        r["rights_reserved"], r["ai_opt_out"])
             for r in spark.sql(q(P.SPARK)).collect()}
    got_d = {r[0]: tuple(r[1:]) for r in con.execute(q(P.DUCKDB)).fetchall()}
    assert got_s == got_d
    assert got_s[0][0] and got_s[1][0] and got_s[2][0]
    assert got_s[3][2] and got_s[4][1] and got_s[5][1]
    assert got_s[6][3] and not got_s[7][3]
    assert got_s[10] == (False, False, False, False)  # NULL -> coalesced


HREF_CASES = [
    '<a href="https://Other.COM/x">t</a><a class=k href=\'/rel\'>r</a>'
    '<A HREF=//cdn.net/y>p</A><a href="#top">f</a><a href="mailto:a@b">m</a>'
    '<a href=relative.html>q</a><a href="">e</a>',
    '<script>var a = \'<a href="https://fake.com/x">\';</script>'
    '<a href="https://real.com/y">ok</a>',       # script links ignored
    '<a title="no href here">none</a>',
    "plain text",
    "",
    None,
]


def test_html_hrefs_and_link_host_match_across_engines(spark):
    """portable.html_hrefs / link_host bit-identical across engines."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({
        "rid": range(len(HREF_CASES)), "h": HREF_CASES,
        "bh": ["base.example.com"] * len(HREF_CASES),
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("hreffuzz")
    con = duckdb.connect()
    con.register("hreffuzz", pdf)

    def q(d):
        hosts = P.transform(
            P.html_hrefs("h", d), "x", P.link_host("x", "bh", d), d
        )
        return (f"SELECT rid, {P.html_hrefs('h', d)} AS r, "
                f"{hosts} AS t FROM hreffuzz")

    def norm(v):
        return list(v) if v is not None else None

    got_s = {r["rid"]: (norm(r["r"]), norm(r["t"]))
             for r in spark.sql(q(P.SPARK)).collect()}
    got_d = {r[0]: (norm(r[1]), norm(r[2]))
             for r in con.execute(q(P.DUCKDB)).fetchall()}
    assert got_s == got_d
    # semantic pins
    # class order: double-quoted, then single-quoted, then bare
    assert got_s[0][1] == ["other.com", None, None, None,
                           "base.example.com", "cdn.net",
                           "base.example.com"]
    assert got_s[1][0] == ["https://real.com/y"]  # script-quoted ignored
    assert got_s[2] == ([], [])
    assert got_s[5] == (None, None)


ROBOTS_RULE_CASES = [
    "/private/",
    "/*.gif$",
    "/a+b?.html",
    "/exact$",
    "/",
    "/*",
    "/path/*/deep$",
    "/(paren){brace}[brack]|pipe^caret",
    "/dollar$in$middle$",
    "/back\\slash",
    "/star**double",
    "*leading",
    "$",
]

PATHQ_CASES = [
    "https://a.com/x/y?b=2",
    "https://a.com",
    "https://a.com?id=1",          # query-only: must become /?id=1
    "https://a.com/#frag",
    "https://a.com/a/b.gif",
    "a.com/no-scheme?q=1",
    "https://user@a.com:8080/p?x=1#f",
    "",
    None,
]


def test_robots_primitives_match_across_engines(spark):
    """portable.url_pathq / robots_rule_regex and the per-row regex
    match must be bit-identical in Spark and DuckDB on adversarial
    rules (regex metachars, wildcards, anchors) x paths."""
    import duckdb
    import pandas as pd

    rows = [(i * 100 + j, r, u)
            for i, r in enumerate(ROBOTS_RULE_CASES)
            for j, u in enumerate(PATHQ_CASES)]
    pdf = pd.DataFrame(rows, columns=["rid", "rule", "url"])
    spark.createDataFrame(pdf).createOrReplaceTempView("robofuzz")
    con = duckdb.connect()
    con.register("robofuzz", pdf)

    def q(d):
        pathq = P.url_pathq("url", d)
        rx = P.robots_rule_regex("rule", d)
        m = P.regexp_like_col(pathq, rx, d)
        return (f"SELECT rid, {pathq} AS pq, {rx} AS rx, "
                f"CASE WHEN url IS NULL THEN NULL ELSE {m} END AS m "
                f"FROM robofuzz")

    got_s = {r["rid"]: (r["pq"], r["rx"], r["m"])
             for r in spark.sql(q(P.SPARK)).collect()}
    got_d = {r[0]: (r[1], r[2], r[3])
             for r in con.execute(q(P.DUCKDB)).fetchall()}
    assert got_s == got_d
    # semantic pins: rule 0 = '/private/' never matches these paths;
    # rule 4 = '/' matches EVERY non-null path incl. the query-only URL
    root_matches = [got_s[400 + j][2] for j in range(len(PATHQ_CASES))]
    assert all(m is True for m in root_matches[:7])
    # '/*.gif$' matches only the .gif path
    gif = {j: got_s[100 + j][2] for j in range(7)}
    assert gif == {0: False, 1: False, 2: False, 3: False,
                   4: True, 5: False, 6: False}
