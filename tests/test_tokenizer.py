"""Frozen tokenizer semantics (FIXTURES.md test 3)."""
from jesterj_ray.tokenize.tokenizer import (code_tokenize, simple_tokenize,
                                            split_identifier)


def test_simple_tokenize():
    assert simple_tokenize("Hello World_x 42") == ["hello", "world", "x", "42"]
    assert simple_tokenize("") == []
    assert simple_tokenize("   \n\t ") == []
    assert simple_tokenize("a-b.c") == ["a", "b", "c"]


def test_simple_matches_sql_semantics():
    # must equal duckdb regexp_extract_all(lower(text), '[a-z0-9]+')
    import duckdb
    con = duckdb.connect()
    for text in ["Hello World_x 42", "merge SORT join", "a-b.c", "über café 7x"]:
        sql = con.sql(
            "SELECT regexp_extract_all(lower(?), '[a-z0-9]+')", params=[text]
        ).fetchone()[0]
        assert simple_tokenize(text) == sql, text


def test_split_identifier():
    assert split_identifier("parseHTTPResponse") == ["parse", "http", "response"]
    assert split_identifier("my_var2") == ["my", "var2"]
    assert split_identifier("XMLHttpRequest") == ["xml", "http", "request"]
    assert split_identifier("__init__") == ["init"]
    assert split_identifier("CONSTANT_NAME") == ["constant", "name"]
    assert split_identifier("simple") == ["simple"]


def test_code_tokenize():
    toks = code_tokenize("def parseConfig(my_var): return XMLError2")
    assert toks == ["def", "parse", "config", "my", "var", "return",
                    "xml", "error2"]
    assert code_tokenize("x = 42 + y_z") == ["x", "42", "y", "z"]
    assert code_tokenize("") == []
    # comment-only content still tokenizes its words (no comment stripping)
    assert code_tokenize("# only a comment") == ["only", "a", "comment"]


def test_fast_code_tokenize_equivalence():
    """The whole-text fast path must be token-identical to the per-ident
    reference on corpus texts, edge cases, and random ASCII soup."""
    import numpy as np
    from hypothesis import given, settings, strategies as st
    from jesterj_ray.sources.corpus import generate_corpus
    from jesterj_ray.tokenize.tokenizer import (code_tokenize,
                                                code_tokenize_reference)

    cases = [
        "", "x", "X", "_", "__init__", "123abc", "abc123", "var2sort",
        "my_var2", "parseHTTPResponse", "XMLHttpRequest2", "HTTP2Sort",
        "CONSTANT_NAME", "a1B", "x 123abc", "_123abc", "1x2y3z",
        "log(\"batch 94\")", "func validate_result(worker) {",
        "Über café 7x", "a-b.c,d;e", "A", "AB", "ABc", "aB", "a_B_c",
    ]
    for t in cases:
        assert code_tokenize(t) == code_tokenize_reference(t), repr(t)
    for content in generate_corpus(100, seed=9)["content"].to_pylist():
        assert code_tokenize(content) == code_tokenize_reference(content)

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.characters(
        codec="ascii", categories=("L", "N", "P", "Z")), max_size=80))
    def prop(t):
        assert code_tokenize(t) == code_tokenize_reference(t), repr(t)

    prop()
