"""RTF extraction (stages/rtf.py): tokenizer behaviors the SQL oracle
never exercises — destination groups, \\* skips, nesting, escapes,
control-word delimiter rules, raw newline handling."""
import pyarrow as pa

from jesterj_ray.stages.rtf import rtf_extract, rtf_to_text


def test_basic_formatting_dropped():
    assert rtf_to_text(r"{\rtf1\ansi\f0\fs24 hello {\b bold} world\par}") \
        == "hello bold world\n"


def test_destination_groups_skipped_whole():
    raw = (r"{\rtf1{\fonttbl{\f0 Times New Roman;}{\f1 Arial;}}"
           r"{\info{\title secret}{\author me}}visible\par}")
    assert rtf_to_text(raw) == "visible\n"


def test_star_destination_skipped():
    # \* marks an unknown destination: skip the whole group
    assert rtf_to_text(r"{a{\*\generator Word 11}b}") == "ab"


def test_nested_group_inside_skip_stays_skipped():
    # inner braces inside a skipped destination must not end the skip
    raw = r"{x{\stylesheet{\s1 one{\s2 two}}tail}y}"
    assert rtf_to_text(raw) == "xy"


def test_escapes_literal_and_cp1252():
    assert rtf_to_text(r"\{brace\} back\\slash") == "{brace} back\\slash"
    assert rtf_to_text(r"caf\'e9 \'ae") == "café ®"


def test_delimiter_space_is_eaten_once():
    # the single space ending a control word is a delimiter, not text;
    # a second space IS text
    assert rtf_to_text(r"\b bold") == "bold"
    assert rtf_to_text(r"\b  two") == " two"
    # non-space delimiter (brace/backslash) is not consumed
    assert rtf_to_text(r"\b{x}") == "x"


def test_numeric_params_consumed():
    assert rtf_to_text(r"\fs24 text") == "text"
    assert rtf_to_text(r"\li-720 neg") == "neg"


def test_par_line_tab():
    assert rtf_to_text(r"a\par b\line c\tab d") == "a\nb\nc\td"


def test_raw_newlines_ignored():
    assert rtf_to_text("one\r\ntwo\nthree") == "onetwothree"


def test_batch_entry_point():
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "raw_rtf": pa.array(
                      [r"{\rtf1{\fonttbl{\f0 X;}}hi\par}"], pa.string())})
    out = rtf_extract(t)
    assert out["text_extracted"].to_pylist() == ["hi\n"]
    assert out["doc_id"].to_pylist() == [7]


def test_synthesis_roundtrip_matches_oracle_shape():
    # mirrors the driver pipeline: synthesized RTF extracts back to the
    # original text (+ ' café' on doc_id%11==0) + trailing newline
    from jesterj_ray.stages.rtf import _synth_rtf
    t = pa.table({"doc_id": pa.array([0, 3, 11], pa.int64()),
                  "text": pa.array(["alpha beta gamma delta epsilon zeta",
                                    "one two", ""], pa.string())})
    synth = _synth_rtf(t)
    out = rtf_extract(synth)
    got = out["text_extracted"].to_pylist()
    assert got[0] == "alpha beta gamma delta epsilon zeta café\n"
    assert got[1] == "one two\n"
    assert got[2] == " café\n"  # empty text, doc_id%11==0 appends
