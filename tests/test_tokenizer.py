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
