"""Paragraph-level dedup (stages/paragraphs.py): keep-first semantics,
real blank-line splitting, full-drop docs, parallelism independence."""
import pyarrow as pa
import ray.data as rd

from jesterj_ray.stages.paragraphs import (dedup_paragraphs,
                                           split_paragraphs)


def _paras(rows):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    return split_paragraphs(t, field="text")


def test_split_real_paragraphs():
    out = _paras([(7, "alpha beta\n\n  gamma  \n \n\ndelta\n\n\n")])
    assert out["ptext"].to_pylist() == ["alpha beta", "gamma", "delta"]
    assert out["pidx"].to_pylist() == [0, 1, 2]
    assert out["n_paras"].to_pylist() == [3, 3, 3]


def test_keep_first_cross_and_within_doc(ray_session):
    rows = [
        (0, "boiler plate\n\nunique zero"),
        (1, "unique one\n\nboiler plate\n\nunique one"),  # within-doc dup
        (2, "boiler plate"),                              # fully dropped
    ]
    ds = rd.from_arrow(_paras(rows))
    out = dedup_paragraphs(ds, num_groups=4).to_pandas()
    assert list(out["doc_id"]) == [0, 1]                  # doc 2 gone
    d0 = out.set_index("doc_id")
    assert d0.loc[0, "text_clean"] == "boiler plate\n\nunique zero"
    assert d0.loc[0, "n_paras"] == 2 and d0.loc[0, "n_kept"] == 2
    # doc 1 loses the boilerplate AND its own second 'unique one'
    assert d0.loc[1, "text_clean"] == "unique one"
    assert d0.loc[1, "n_paras"] == 3 and d0.loc[1, "n_kept"] == 1


def test_parallelism_independence(ray_session):
    rows = [(i, f"shared tail\n\nbody {i} words here") for i in range(20)]
    base = _paras(rows)
    a = dedup_paragraphs(rd.from_arrow(base).repartition(1),
                         num_groups=3).to_pandas()
    b = dedup_paragraphs(rd.from_arrow(base).repartition(7),
                         num_groups=11).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # only doc 0 keeps the shared tail
    keeps = {r.doc_id: r.n_kept for r in a.itertuples()}
    assert keeps[0] == 2 and all(keeps[i] == 1 for i in range(1, 20))


def test_synth_pipeline_smoke(ray_session):
    from jesterj_ray.stages.paragraphs import paragraph_dedup_pipeline
    out = paragraph_dedup_pipeline("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["n_kept"] <= out["n_paras"]).all()
    # exactly one surviving copy of the injected append boilerplate
    n_append = out["text_clean"].str.contains(
        "subscribe to the newsletter for weekly updates").sum()
    assert n_append == 1
