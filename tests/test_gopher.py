"""Gopher quality rules (stages/gopher.py): line-level semantics the
flat test corpus can't exercise, zero-word docs, distinct-stop logic,
and a verdict-mix smoke over sf0.001."""
import pyarrow as pa

from jesterj_ray.stages.gopher import (GOPHER_STOPS, apply_rules,
                                       gopher_signals)


def _sig(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return gopher_signals(t, field="text")


def test_line_rules():
    out = _sig([
        "- one\n- two\n* three\nplain",        # 3 of 4 lines bulleted
        "end...\nmiddle... not\nfine",         # 1 of 3 ends with ...
        "no lines here",
    ])
    assert out["bullet_ratio"][0].as_py() == 0.75
    assert out["ellipsis_ratio"][1].as_py() == 0.333333
    assert out["bullet_ratio"][2].as_py() == 0.0
    assert out["n_words"][2].as_py() == 3


def test_zero_words_and_symbols():
    out = _sig(["", "   ", "## #... ...."])
    assert out["n_words"][0].as_py() == 0
    assert out["n_words"][1].as_py() == 0
    assert out["mean_word_len"][1].as_py() == 0.0
    # '##' = 2 hashes; '#...' = 1 hash + 1 ellipsis; '....' = 1
    # (non-overlapping scan) -> 5 symbols / 3 words
    assert out["symbol_ratio"][2].as_py() == 1.666667


def test_stop_distinct_not_total():
    # 'the' four times counts ONCE; need >= 2 distinct to pass
    out = _sig(["the the the the", "the cat and the dog"])
    assert out["n_stop_distinct"][0].as_py() == 1
    assert out["n_stop_distinct"][1].as_py() == 2
    assert len(GOPHER_STOPS) == 8


def test_rule_verdicts_on_rounded_columns():
    sig = _sig(["the cat and " + "word " * 30,      # passes (33 words)
                "zz " * 40])                        # no stops -> fails
    out = apply_rules(sig, min_words=20)
    assert out["gopher_pass"][0].as_py() is True
    assert out["gopher_pass"][1].as_py() is False


def test_pipeline_mix(ray_session):
    from jesterj_ray.stages.gopher import gopher_rules_pipeline
    out = gopher_rules_pipeline("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert list(out["doc_id"]) == sorted(out["doc_id"])
    # the min_words=20 scaling must leave both verdicts represented
    assert out["gopher_pass"].nunique() == 2
