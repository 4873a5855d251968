"""Unit tests per processor (reference test model: SURVEY.md §5 item 1,
e.g. test/processors/CopyFieldTest.java, RegexValueReplaceTest.java)."""
import pyarrow as pa
import pytest

from jesterj_ray.stages import fields as F


@pytest.fixture
def batch():
    return pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["  hello ", "a,b , c", "data data"], pa.string()),
        "size": pa.array([500, 2048, 3 * 1024 * 1024], pa.int64()),
    })


def test_copy_field(batch):
    out = F.copy_field(batch, from_field="text", into="body")
    assert out["body"].to_pylist() == batch["text"].to_pylist()
    assert "text" in out.column_names
    renamed = F.copy_field(batch, from_field="text", into="body",
                           retain_original=False)
    assert "text" not in renamed.column_names


def test_drop_field(batch):
    assert "text" not in F.drop_field(batch, field="text").column_names


def test_trim_values(batch):
    assert F.trim_values(batch, field="text")["text"].to_pylist()[0] == "hello"


def test_split_field(batch):
    out = F.split_field(batch, field="text", delimiter=",")
    assert out["text"].to_pylist()[1] == ["a", "b", "c"]
    out2 = F.split_field(batch, field="text", delimiter=",", trim=False)
    assert out2["text"].to_pylist()[1] == ["a", "b ", " c"]


def test_regex_value_replace(batch):
    out = F.regex_value_replace(batch, field="text", regex="data",
                                replacement="D")
    assert out["text"].to_pylist()[2] == "D D"
    out2 = F.regex_value_replace(batch, field="text", regex="data",
                                 replacement="D", discard_unmatched=True)
    assert out2["text"].to_pylist()[0] is None


def test_filter_matching(batch):
    out = F.filter_matching(batch, field="text", regex="data")
    assert out.num_rows == 1
    out2 = F.filter_matching(batch, field="text", regex="data", keep=False)
    assert out2.num_rows == 2


def test_set_static_value(batch):
    out = F.set_static_value(batch, field="tag", value="x")
    assert out["tag"].to_pylist() == ["x", "x", "x"]
    # skip_if_present only fills nulls
    b = batch.append_column("tag", pa.array(["a", None, "c"]))
    out2 = F.set_static_value(b, field="tag", value="x", mode="skip_if_present")
    assert out2["tag"].to_pylist() == ["a", "x", "c"]
    out3 = F.set_static_value(b, field="tag", value="x", mode="append_new")
    assert out3["tag"].to_pylist() == ["a", None, "c"]


def test_date_reformat_timestamp_and_string():
    b = pa.table({"ts": pa.array([1704153600123], pa.int64()),
                  "s": pa.array(["2024-01-02T03:04:05"], pa.string())})
    out = F.date_reformat(b, field="ts", out_field="iso")
    assert out["iso"].to_pylist() == ["2024-01-02T00:00:00Z"]
    out2 = F.date_reformat(b, field="s", out_field="iso")
    assert out2["iso"].to_pylist() == ["2024-01-02T03:04:05Z"]


def test_readable_file_size(batch):
    out = F.readable_file_size(batch, field="size", numeric_field="n",
                               units_field="u")
    assert out["readable_size"].to_pylist() == ["500 bytes", "2 KB", "3 MB"]
    assert out["n"].to_pylist() == [500, 2, 3]
    assert out["u"].to_pylist() == ["bytes", "KB", "MB"]


def test_url_encode(batch):
    out = F.url_encode_field(batch, field="text", out_field="enc")
    assert out["enc"].to_pylist()[0] == "%20%20hello%20"


def test_field_template(batch):
    out = F.field_template(batch, template="doc-{id}:{text}", out_field="label")
    assert out["label"].to_pylist()[2] == "doc-3:data data"


def test_doc_per_line():
    b = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["l1\nl2\nl3", "only"], pa.string())})
    out = F.doc_per_line(b, text_field="text", keep_cols=["id"])
    assert out["line"].to_pylist() == ["l1", "l2", "l3", "only"]
    assert out["line_number"].to_pylist() == [1, 2, 3, 1]
    assert out["id"].to_pylist() == [1, 1, 1, 2]


def test_add_raw_size(batch):
    out = F.add_raw_size(batch, field="text")
    assert out["doc_raw_size"].to_pylist()[0] == len("  hello ")


def test_log_and_fail(batch):
    p = F.LogAndFail(fail_after=1)
    p(batch)
    with pytest.raises(RuntimeError):
        p(batch)


def test_wrapping_swallows_error(batch):
    def bad(b):
        raise ValueError("boom")

    calls = []
    wrapped = F.wrapping(bad, on_error=lambda b, e: b, always=lambda: calls.append(1))
    out = wrapped(batch)
    assert out is batch and calls == [1]


def test_parse_delimited():
    b = pa.table({"line": pa.array(["t1\t2024\tbody text here",
                                    "t2\t2025", "bare"])})
    out = F.parse_delimited(b, field="line", delimiter="\t",
                            column_names=["title", "year", "body"])
    assert out["title"].to_pylist() == ["t1", "t2", "bare"]
    assert out["year"].to_pylist() == ["2024", "2025", None]
    assert out["body"].to_pylist() == ["body text here", None, None]
    assert "line" not in out.column_names
    strict = F.parse_delimited(b, field="line", delimiter="\t",
                               column_names=["title", "year", "body"],
                               skip_malformed=True)
    assert strict.num_rows == 1
    # extra parts fold into the last column (max_splits)
    b2 = pa.table({"line": pa.array(["a\tb\tc\td"])})
    out2 = F.parse_delimited(b2, field="line", delimiter="\t",
                             column_names=["x", "y", "rest"])
    assert out2["rest"].to_pylist() == ["c\td"]


def test_route_by_value_and_filter_seen():
    import ray.data as rd
    src = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "kind": pa.array(["solr", "os", "solr", "nope"])}))
    routes = F.route_by_value(src, field="kind",
                              routes={"solr": "send_solr", "os": "send_os"},
                              default_drop=False)
    assert sorted(routes) == ["__unrouted__", "send_os", "send_solr"]
    assert routes["send_solr"].to_pandas()["doc_id"].tolist() == [1, 3]
    assert routes["send_os"].to_pandas()["doc_id"].tolist() == [2]
    assert routes["__unrouted__"].to_pandas()["doc_id"].tolist() == [4]

    kept = F.filter_seen(src, key_field="doc_id", seen_keys={1, 3})
    assert kept.to_pandas()["doc_id"].tolist() == [2, 4]
