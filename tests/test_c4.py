"""C4 line cleaning (stages/c4.py): rule semantics on crafted lines,
page verdicts, batch-boundary safety."""
import numpy as np
import pyarrow as pa

from jesterj_ray.stages.c4 import c4_filter_lines


def _rows(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lidx": pa.array([r[1] for r in rows], pa.int64()),
        "line": pa.array([r[2] for r in rows], pa.string())})


def test_line_rules():
    rows = [
        (1, 0, "this line has enough words and punct."),   # keep
        (1, 1, "no terminal punctuation here at all"),     # drop: punct
        (1, 2, "too few words."),                          # drop: words
        (1, 3, "enable JavaScript to view this content."),  # drop: js
        (1, 4, "another good line with plenty of words!"),  # keep
        (1, 5, "is this a question with many words?"),      # keep
    ]
    out = c4_filter_lines(_rows(rows))
    assert out["n_lines"][0].as_py() == 6
    assert out["n_kept"][0].as_py() == 3
    assert out["page_kept"][0].as_py() is True
    assert out["text_clean"][0].as_py().count("\n") == 2


def test_page_rules():
    good = [(d, i, f"good line number {i} with word count fine.")
            for d in (1, 2, 3) for i in range(4)]
    bad = [(1, 9, "some Lorem Ipsum filler text appears here."),
           (2, 9, "var x = function() { return 1; }.")]
    out = c4_filter_lines(_rows(good + bad)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1, "page_kept"] == False  # noqa: E712 (lorem)
    assert out.loc[2, "page_kept"] == False  # noqa: E712 (brace)
    assert out.loc[3, "page_kept"] == True   # noqa: E712
    assert out.loc[1, "text_clean"] is None
    # min_lines: a page with only 2 surviving lines drops
    short = [(7, i, "fine line with exactly enough words here.")
             for i in range(2)]
    o2 = c4_filter_lines(_rows(short))
    assert o2["page_kept"][0].as_py() is False


def test_pipeline_block_independence(ray_session):
    from jesterj_ray.stages.c4 import c4_line_filter_pipeline
    a = c4_line_filter_pipeline("/root/testdata/sf0.001",
                                num_blocks=1).to_pandas()
    b = c4_line_filter_pipeline("/root/testdata/sf0.001",
                                num_blocks=13).to_pandas()
    assert a.equals(b)
    assert len(a) > 0
    assert a["page_kept"].nunique() == 2          # both verdicts occur
    assert (a.loc[~a["page_kept"], "text_clean"].isna()).all()
