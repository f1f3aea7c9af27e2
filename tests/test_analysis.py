"""Tokenizer tests pinned to the reference's golden cases
(lucene/core/src/test/.../standard/TestStandardAnalyzer.java:228-267)."""

import numpy as np
import pandas as pd

from lucene_solr_8_7_0_spark.functions.analysis import analyze_batch, tokenize_text


def toks(text, **kw):
    return tokenize_text(text, **kw)


def test_reference_golden_cases():
    # TestStandardAnalyzer assertions (lowercased by the analyzer chain)
    assert toks("B2B") == ["b2b"]
    assert toks("2B") == ["2b"]
    assert toks("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert toks("dogs,chase,cats") == ["dogs", "chase", "cats"]
    assert toks("ac/dc") == ["ac", "dc"]
    assert toks("O'Reilly") == ["o'reilly"]
    assert toks("O'Reilly's") == ["o'reilly's"]
    assert toks("21.35") == ["21.35"]
    assert toks("R2D2 C3PO") == ["r2d2", "c3po"]
    assert toks("216.239.63.104") == ["216.239.63.104"]
    assert toks("David has 5000 bones") == ["david", "has", "5000", "bones"]
    assert toks("C embedded developers wanted") == ["c", "embedded", "developers", "wanted"]
    assert toks("foo bar FOO BAR") == ["foo", "bar", "foo", "bar"]
    assert toks('"QUOTED" word') == ["quoted", "word"]
    assert toks("") == []
    assert toks(".") == []
    assert toks(" ") == []


def test_word_break_katakana_hiragana_classes():
    # U+30FB KATAKANA MIDDLE DOT is Word_Break=MidLetter, NOT Katakana
    # (StandardTokenizerImpl.jflex \p{WB:Katakana}): it breaks katakana
    # runs but joins ALetter like ':'
    assert toks("アア・イイ") == ["アア", "イイ"]
    assert toks("a・b") == ["a・b"]
    # WB:Katakana members outside the main block: halfwidth sound marks
    # FF9E..FF9F and the 309B..309C spacing sound marks join runs
    assert toks("ｶﾞｷﾞ") == ["ｶﾞｷﾞ"]
    assert toks("ア゛") == ["ア゛"]
    # Script:Hiragana only — one char per token; iteration marks ゝゞ
    # (309D..309E) and ゟ included, 3097..309C excluded
    assert toks("ひらがな") == ["ひ", "ら", "が", "な"]
    assert toks("仮名ゞテスト") == ["仮", "名", "ゞ", "テスト"]


def _adversarial_strings(n=1500):
    import random

    alphabet = (
        list("abcXYZ019_.,;:'’・ -/\"²Ⅻ") + list("アイ・ガひら仮名ゞｶﾞ")
        + ["ͤ", "゙", "ั", "্", "̈", "א", "ب", "ก", "𩬅", "‍", "‿"]
    )
    random.seed(11)
    out = [
        "".join(random.choice(alphabet) for _ in range(random.randint(1, 25)))
        for _ in range(n)
    ]
    out += [
        "O'Reilly's 21.35 4,600 216.239.63.104 1.2.3 a.2 x_y2 ab2.3cd",
        "アア・イイ a・b ｶﾞｷﾞ ア゛ ひらがな 仮名ゞテスト",
        "", ".", " ", "'", "’a’", "5.", ".5", "1,,2", "a''b",
        "moͤchte", "ܒܠܫܢ̈ܐ", "জানুয়ারি", "ದಿನಾಂಕ", "A:B_A::B",
        "аͤ'ͤб", "1ͤ2", "²b", "Ⅻ3", "a‿b", "x‍y",
    ]
    return out


def test_sql_token_pattern_equivalence():
    """SQL_STANDARD_TOKEN_PATTERN (lookaround-free, RE2 dialect) is the
    EXACT same token language as STANDARD_TOKEN_RE — this is what lets
    DuckDB replay the standard tokenizer as the driver oracle."""
    import duckdb

    from lucene_solr_8_7_0_spark.functions.analysis import (
        SQL_STANDARD_TOKEN_PATTERN,
        STANDARD_TOKEN_RE,
    )

    con = duckdb.connect()
    for s in _adversarial_strings():
        py = STANDARD_TOKEN_RE.findall(s)
        db = con.execute(
            "select regexp_extract_all(?, ?)", [s, SQL_STANDARD_TOKEN_PATTERN]
        ).fetchone()[0]
        assert py == db, (s, py, db)


def test_jvm_token_pattern_equivalence(spark):
    """JAVA_STANDARD_TOKEN_PATTERN (the JVM build path) tokenizes
    char-for-char identically to the Python chain — rank identity
    rests on index-side and query-side analysis agreeing."""
    import pandas as pd

    from lucene_solr_8_7_0_spark.functions.analysis import (
        STANDARD_TOKEN_RE,
        jvm_token_array,
    )

    strs = _adversarial_strings(800)
    df = spark.createDataFrame(pd.DataFrame({"content": strs}))
    jvm = [
        r["t"]
        for r in df.select(jvm_token_array("content", "standard").alias("t"))
        .collect()
    ]
    for s, j in zip(strs, jvm):
        assert STANDARD_TOKEN_RE.findall(s) == j, (s, j)


def test_jvm_ascii_fast_path_equivalence(spark):
    """The ASCII-specialized pattern the JVM tokenizer dispatches to
    for all-ASCII documents must tokenize EXACTLY like the full
    Unicode grammar on every ASCII input — randomized strings dense in
    the joiner/edge cases ('.', ',', ';', ':', \"'\", '_', digit/letter
    boundaries), compared against both the full Java pattern and the
    Python reference chain."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    from lucene_solr_8_7_0_spark.functions.analysis import (
        JAVA_ASCII_TOKEN_PATTERN,
        JAVA_STANDARD_TOKEN_PATTERN,
        STANDARD_TOKEN_RE,
        jvm_token_array,
    )

    rng = random.Random(420)
    alphabet = "ab1._,;:' Z9\t\n-" + "".join(chr(c) for c in range(32, 127))
    strs = ["a.b c'd 1.2 1,2 a:b _x_ don't 3;4 a.1 1.a .a a."] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(1500)
    ]
    df = spark.createDataFrame(pd.DataFrame({"content": strs}))
    rows = df.select(
        F.regexp_extract_all(
            "content", F.lit(JAVA_ASCII_TOKEN_PATTERN), F.lit(0)
        ).alias("fast"),
        F.regexp_extract_all(
            "content", F.lit(JAVA_STANDARD_TOKEN_PATTERN), F.lit(0)
        ).alias("full"),
        jvm_token_array("content", "standard").alias("dispatch"),
    ).collect()
    for s, r in zip(strs, rows):
        assert r["fast"] == r["full"] == r["dispatch"], (s, r)
        assert r["dispatch"] == STANDARD_TOKEN_RE.findall(s), s


def test_html_strip_char_filter(spark):
    """HTMLStripCharFilter analog: golden strip cases, the single-
    decode entity property, and JVM == Python parity (the char filter
    runs identically in the build's codegen path and the Arrow
    tokenize path)."""
    import pandas as pd

    from lucene_solr_8_7_0_spark.functions.analysis import (
        html_strip,
        jvm_html_strip,
        tokenize_text,
    )
    from pyspark.sql import functions as F

    cases = [
        ("<p>hello <b>world</b></p>", " hello  world  "),
        ("a <!-- note --> b", "a   b"),
        ("x <script>var y = '<p>';</script> z", "x   z"),
        ("x <style>p .red</style> y", "x   y"),
        ("cost &lt; 5 &amp; found", "cost < 5 & found"),
        # single decode: &amp;lt; is the literal text "&lt;", not "<"
        ("&amp;lt;tag&amp;gt;", "&lt;tag&gt;"),
        ("<a href=\"u?x=1&amp;y=2\">link</a>", " link "),
        ("<!DOCTYPE html><HTML>Hi</HTML>", "  Hi "),
        ("plain text < 42 stays", "plain text < 42 stays"),
    ]
    for raw, want in cases:
        assert html_strip(raw) == want, raw
    # tokenizer-level: markup contributes no tokens
    toks = tokenize_text(
        "<div id=\"x\">data <b>join</b></div> &lt;end&gt;",
        "simple", html_strip=True,
    )
    assert toks == ["data", "join", "end"]
    # JVM parity on the golden cases + doc-like strings
    strs = [raw for raw, _ in cases] + [
        "<table><tr><td>a</td></tr></table>",
        "no markup at all",
        "<sCrIpT>hidden()</sCrIpT> shown",
    ]
    df = spark.createDataFrame(pd.DataFrame({"content": strs}))
    jvm = [
        r["s"]
        for r in df.select(jvm_html_strip(F.col("content")).alias("s")).collect()
    ]
    assert jvm == [html_strip(s) for s in strs]


def test_word_delimiter_analyzer(spark):
    """WordDelimiterGraphFilter default-flag analog: the reference's
    own javadoc/test examples (WordDelimiterGraphFilter.java:47-76),
    plus JVM == Python parity of the whole chain."""
    import pandas as pd

    from lucene_solr_8_7_0_spark.functions.analysis import (
        jvm_token_array,
        tokenize_text,
    )

    cases = [
        ("PowerShot", ["power", "shot"]),
        ("SD500", ["sd", "500"]),
        ("Wi-Fi", ["wi", "fi"]),
        ("O'Neil's", ["o", "neil"]),
        ("HTTPServer", ["http", "server"]),
        ("j2se", ["j", "2", "se"]),
        ("super-duper-XL500-42-AutoCoder!", [
            "super", "duper", "xl", "500", "42", "auto", "coder"]),
        ("foo_bar baz", ["foo", "bar", "baz"]),
        ("aAbB", ["a", "ab", "b"]),
    ]
    for raw, want in cases:
        assert tokenize_text(raw, "word_delimiter") == want, raw
    strs = [raw for raw, _ in cases] + ["", "plain words only", "ABC123def"]
    df = spark.createDataFrame(pd.DataFrame({"content": strs}))
    jvm = [
        r["t"]
        for r in df.select(
            jvm_token_array("content", "word_delimiter").alias("t")
        ).collect()
    ]
    assert jvm == [tokenize_text(s, "word_delimiter") for s in strs]


def test_index_time_synonyms(spark, tmp_path):
    """Index-time SynonymGraphFilter (single-token rules): synonyms
    are injected at the SAME position (phrases match across them), do
    not change the norm length (discountOverlaps), and the Python
    oracle agrees with the engine on the synonym-built index."""
    import numpy as np
    import pandas as pd

    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.functions.analysis import analyze_batch
    from lucene_solr_8_7_0_spark.functions.oracle import (
        build_oracle_index,
        oracle_search,
    )
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    syns = (("quick", ("fast", "speedy")),)
    # batch-level semantics first
    tb = analyze_batch(
        pd.Series(["the quick fox", "a fast dog"]), "simple",
        index_synonyms=syns,
    )
    rows = sorted(zip(tb.doc_idx.tolist(), tb.terms.tolist(),
                      tb.positions.tolist()))
    assert (0, "fast", 1) in rows and (0, "speedy", 1) in rows
    assert (0, "quick", 1) in rows
    np.testing.assert_array_equal(tb.doc_lengths, [3, 3])  # primaries only

    docs = spark.createDataFrame(
        [
            ("r", "a.txt", "c", "txt", "the quick fox"),
            ("r", "b.txt", "c", "txt", "a fast dog"),
            ("r", "c.txt", "c", "txt", "slow turtle"),
        ],
        schema="repo string, path string, commit string, lang string, "
               "content string",
    )
    cfg = EngineConfig(analyzer="simple", segment_size=64,
                       index_synonyms=syns)
    d1 = str(tmp_path / "syn")
    build_index(spark, docs, d1, cfg)
    s = IndexSearcher(spark, d1)
    assert s.cfg.index_synonyms == syns  # round-trips engine_config.json

    def ids(q):
        return sorted(r["doc_id"] for r in s.matches_df(q).collect())

    quick_doc = ids(Q.TermQuery("quick"))[0]
    assert ids(Q.TermQuery("fast")) == sorted(
        [quick_doc] + ids(Q.TermQuery("dog"))
    )
    assert ids(Q.TermQuery("speedy")) == [quick_doc]
    # same-position injection: phrase across the synonym
    assert ids(Q.PhraseQuery(("fast", "fox"))) == [quick_doc]
    # norms unaffected: TermQuery('fox') scores identically vs a
    # no-synonym build (same df, tf, and discounted length)
    d2 = str(tmp_path / "plain")
    build_index(spark, docs, d2,
                EngineConfig(analyzer="simple", segment_size=64))
    s2 = IndexSearcher(spark, d2)
    t1 = s.search(Q.TermQuery("fox"), k=3)
    t2 = s2.search(Q.TermQuery("fox"), k=3)
    np.testing.assert_array_equal(t1.scores, t2.scores)
    # engine == oracle on the synonym index
    corpus = (
        docs.join(
            spark.read.parquet(f"{d1}/docs").select("repo", "path", "doc_id"),
            ["repo", "path"],
        ).select("doc_id", "content").toPandas()
    )
    oi = build_oracle_index(corpus, cfg)
    for q in [Q.TermQuery("fast"), Q.TermQuery("speedy"),
              Q.PhraseQuery(("fast", "fox")),
              Q.term_or(["fast", "dog"], 1)]:
        td = s.search(q, k=5)
        exp = oracle_search(oi, q, k=5)
        assert td.doc_ids.tolist() == exp.doc_ids.tolist(), str(q)
        np.testing.assert_array_equal(td.scores, exp.scores, err_msg=str(q))


def test_reference_language_golden_cases():
    """The FULL TestStandardAnalyzer.java language case list (module
    docstring documents the known gaps: emoji, Hebrew gershayim,
    astral marks).  Expected token arrays are the reference's own
    assertions, lowercased by our analyzer chain."""
    cases = {
        "armenian": ("Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն)",
                     ["վիքիպեդիայի", "13", "միլիոն", "հոդվածները", "4,600", "հայերեն"]),
        "amharic": ("ዊኪፔድያ የባለ ብዙ ቋንቋ የተሟላ",
                    ["ዊኪፔድያ", "የባለ", "ብዙ", "ቋንቋ", "የተሟላ"]),
        "arabic": ("الفيلم الوثائقي الأول عن ويكيبيديا يسمى",
                   ["الفيلم", "الوثائقي", "الأول", "عن", "ويكيبيديا", "يسمى"]),
        "aramaic": ("ܘܝܩܝܦܕܝܐ (ܐܢܓܠܝܐ: Wikipedia) ܗܘ ܒܠܫܢ̈ܐ ܣܓܝܐ̈ܐ܂",
                    ["ܘܝܩܝܦܕܝܐ", "ܐܢܓܠܝܐ", "wikipedia", "ܗܘ", "ܒܠܫܢ̈ܐ", "ܣܓܝܐ̈ܐ"]),
        "bengali": ("এই বিশ্বকোষ পরিচালনা করে উইকিমিডিয়া ১৫ জানুয়ারি, ২০০১",
                    ["এই", "বিশ্বকোষ", "পরিচালনা", "করে", "উইকিমিডিয়া", "১৫", "জানুয়ারি", "২০০১"]),
        "farsi": ("ویکی پدیای انگلیسی در تاریخ ۲۵ دی ۱۳۷۹ دانشنامهٔ",
                  ["ویکی", "پدیای", "انگلیسی", "در", "تاریخ", "۲۵", "دی", "۱۳۷۹", "دانشنامهٔ"]),
        "greek": ("Γράφεται σε συνεργασία από εθελοντές",
                  ["γράφεται", "σε", "συνεργασία", "από", "εθελοντές"]),
        "thai": ("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔",
                 ["การที่ได้ต้องแสดงว่างานดี", "แล้วเธอจะไปไหน", "๑๒๓๔"]),
        "lao": ("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ",
                ["ສາທາລະນະລັດ", "ປະຊາທິປະໄຕ", "ປະຊາຊົນລາວ"]),
        "tibetan": ("སྣོན་མཛོད་དང་ལས་འདིས་བོད་ཡིག་",
                    ["སྣོན", "མཛོད", "དང", "ལས", "འདིས", "བོད", "ཡིག"]),
        "chinese": ("我是中国人。 １２３４ Ｔｅｓｔｓ ",
                    ["我", "是", "中", "国", "人", "１２３４", "ｔｅｓｔｓ"]),
        "lucene1545": ("moͤchte", ["moͤchte"]),
        "supplementary": ("𩬅艱鍟䇹愯瀛", ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]),
        "korean": ("훈민정음", ["훈민정음"]),
        "korean2": ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
        "japanese": ("仮名遣い カタカナ", ["仮", "名", "遣", "い", "カタカナ"]),
        "comb_hira": ("ざ", ["ざ"]),
        "comb_kata": ("ザ", ["ザ"]),
        "comb_ideo": ("壹゙", ["壹゙"]),
        "comb_hangul": ("아゙", ["아゙"]),
    }
    for name, (text, want) in cases.items():
        assert toks(text) == want, name


def test_reference_mid_joiner_cases():
    """testMid: consecutive MidLetter/MidNumLet/MidNum chars split."""
    for text, want in [
        ("A:B", ["a:b"]), ("A::B", ["a", "b"]),
        ("1.2", ["1.2"]), ("A.B", ["a.b"]),
        ("1..2", ["1", "2"]), ("A..B", ["a", "b"]),
        ("1,2", ["1,2"]), ("1,,2", ["1", "2"]),
        ("A.:B", ["a", "b"]), ("A:.B", ["a", "b"]),
        ("1,.2", ["1", "2"]), ("1.,2", ["1", "2"]),
        ("A:B_A:B", ["a:b_a:b"]), ("A:B_A::B", ["a:b_a", "b"]),
        ("1.2_1.2", ["1.2_1.2"]), ("A.B_A.B", ["a.b_a.b"]),
        ("1.2_1..2", ["1.2_1", "2"]), ("A.B_A..B", ["a.b_a", "b"]),
        ("1,2_1,2", ["1,2_1,2"]), ("1,2_1,,2", ["1,2_1", "2"]),
        ("C_A.:B", ["c_a", "b"]), ("C_A:.B", ["c_a", "b"]),
        ("3_1,.2", ["3_1", "2"]), ("3_1.,2", ["3_1", "2"]),
    ]:
        assert toks(text) == want, text


def test_source_code_identifiers():
    assert toks("snake_case camelCase dotted.name") == [
        "snake_case",
        "camelcase",
        "dotted.name",
    ]
    assert toks("x=1; foo(bar, baz)") == ["x", "1", "foo", "bar", "baz"]
    # digit-letter boundary around '.': breaks (no UAX#29 rule joins them)
    assert toks("foo2.bar") == ["foo2", "bar"]


def test_max_token_length_skip_semantics():
    # over-long token: dropped, consumes a position, not counted in length
    long_tok = "x" * 256
    batch = analyze_batch(pd.Series([f"aa {long_tok} bb"]))
    assert batch.terms.tolist() == ["aa", "bb"]
    assert batch.positions.tolist() == [0, 2]  # position hole at 1
    assert batch.doc_lengths.tolist() == [2]
    # exactly 255 chars is kept
    tok255 = "y" * 255
    assert toks(f"a {tok255}") == ["a", tok255]


def test_positions_contiguous_without_stopwords():
    batch = analyze_batch(pd.Series(["one two three two"]))
    assert batch.positions.tolist() == [0, 1, 2, 3]
    assert batch.doc_lengths.tolist() == [4]


def test_batch_layout():
    batch = analyze_batch(pd.Series(["a b", "", "c"]))
    assert batch.doc_idx.tolist() == [0, 0, 2]
    assert batch.terms.tolist() == ["a", "b", "c"]
    assert batch.doc_lengths.tolist() == [2, 0, 1]


def test_simple_analyzer_sql_equivalent():
    batch = analyze_batch(
        pd.Series(["Foo.Bar BAZ_1 x-y"]), analyzer="simple"
    )
    # lower() then [a-z0-9_]+ runs: dot splits in simple mode
    assert batch.terms.tolist() == ["foo", "bar", "baz_1", "x", "y"]


def test_cjk_per_char():
    assert toks("我是中") == ["我", "是", "中"]


def test_cjk_script_classes():
    """StandardTokenizerImpl type classes (TestStandardAnalyzer
    testJapanese/testKorean golden behavior): ideographs + hiragana one
    per token, katakana as runs that never join Latin, hangul as
    ALetter runs that do."""
    assert toks("それはまだ実験段階にあります") == list("それはまだ実験段階にあります")
    assert toks("ドラえもん") == ["ドラ", "え", "も", "ん"]
    assert toks("カタカナ abc") == ["カタカナ", "abc"]
    assert toks("仮名遣い カタカナ") == ["仮", "名", "遣", "い", "カタカナ"]
    assert toks("안녕하세요 한국어") == ["안녕하세요", "한국어"]


def test_null_safety():
    batch = analyze_batch(pd.Series([None, "a"]))
    assert batch.terms.tolist() == ["a"]
    assert batch.doc_lengths.tolist() == [0, 1]


def test_stop_filter_position_holes():
    """StopFilter semantics (StopFilter.java:28,106): stopped tokens
    are removed, leave position holes, and don't count toward length."""
    batch = analyze_batch(
        pd.Series(["The quick THE fox", "the the the"]),
        analyzer="standard",
        stopwords=("the",),
    )
    assert batch.terms.tolist() == ["quick", "fox"]
    # positions keep the holes: quick@1, fox@3
    assert batch.positions.tolist() == [1, 3]
    # field lengths count only kept tokens
    assert batch.doc_lengths.tolist() == [2, 0]
    # stop filtering runs after lowercasing (chain order)
    batch2 = analyze_batch(
        pd.Series(["THE Quick"]), analyzer="standard", stopwords=("the",)
    )
    assert batch2.terms.tolist() == ["quick"]


def test_stop_filter_end_to_end(spark, tmp_path_factory):
    """Phrases never match across a stopword hole at slop 0; the hole
    is bridgeable with slop 1 (Lucene position-increment behavior)."""
    import pandas as _pd
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    rows = [
        ("r", "000", "c", "txt", "quick the fox runs"),
        ("r", "001", "c", "txt", "quick fox sleeps"),
        ("r", "002", "c", "txt", "the the the fox"),
    ]
    docs = spark.createDataFrame(
        _pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    )
    d = str(tmp_path_factory.mktemp("stopidx"))
    cfg = EngineConfig(analyzer="simple", segment_size=8, stopwords=("the",))
    build_index(spark, docs, d, cfg)
    s = IndexSearcher(spark, d)
    # 'the' left no postings at all
    assert s.termdict.filter("term = 'the'").count() == 0
    # exact phrase does NOT bridge the hole
    assert s.matches_df(Q.PhraseQuery(("quick", "fox"))).toPandas()[
        "doc_id"
    ].tolist() == [1]
    # slop 1 bridges it
    got = sorted(
        s.matches_df(Q.PhraseQuery(("quick", "fox"), slop=1)).toPandas()["doc_id"]
    )
    assert got == [0, 1]
    # norm lengths exclude stopped tokens (doc 2: only 'fox' remains)
    meta = spark.read.parquet(s.docmeta_path).toPandas().set_index("doc_id")
    assert meta.loc[2, "length"] == 1
    # the stop set persists with the index and survives reload
    s2 = IndexSearcher(spark, d)
    assert tuple(s2.cfg.stopwords) == ("the",)


def test_max_doc_tokens_limit(spark, tmp_path):
    """LimitTokenCountFilter analog: only each doc's first N surviving
    tokens are indexed; field length counts the kept tokens; the
    oracle agrees end-to-end."""
    import numpy as np

    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.functions.analysis import analyze_batch
    from lucene_solr_8_7_0_spark.functions.oracle import (
        build_oracle_index,
        oracle_search,
    )
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    import pandas as pd

    tb = analyze_batch(
        pd.Series(["one two three four five", "alpha beta"]),
        "simple", max_doc_tokens=3,
    )
    assert tb.terms.tolist() == ["one", "two", "three", "alpha", "beta"]
    np.testing.assert_array_equal(tb.doc_lengths, [3, 2])

    docs = spark.createDataFrame(
        [("r", "a", "c", "t", "one two three four five"),
         ("r", "b", "c", "t", "four alpha")],
        schema="repo string, path string, commit string, lang string, "
               "content string",
    )
    cfg = EngineConfig(analyzer="simple", segment_size=64, max_doc_tokens=3)
    d = str(tmp_path / "lim")
    build_index(spark, docs, d, cfg)
    s = IndexSearcher(spark, d)
    assert s.cfg.max_doc_tokens == 3  # round-trips engine_config.json
    # 'four'/'five' of doc a were truncated away; doc b keeps 'four'
    assert s.matches_df(Q.TermQuery("five")).count() == 0
    four = s.matches_df(Q.TermQuery("four")).collect()
    assert len(four) == 1
    # engine == oracle on the truncated index
    corpus = (
        docs.join(
            spark.read.parquet(f"{d}/docs").select("repo", "path", "doc_id"),
            ["repo", "path"],
        ).select("doc_id", "content").toPandas()
    )
    oi = build_oracle_index(corpus, cfg)
    for q in [Q.TermQuery("one"), Q.TermQuery("four"),
              Q.PhraseQuery(("one", "two"))]:
        td = s.search(q, k=5)
        exp = oracle_search(oi, q, k=5)
        assert td.doc_ids.tolist() == exp.doc_ids.tolist(), str(q)
        np.testing.assert_array_equal(td.scores, exp.scores, err_msg=str(q))
