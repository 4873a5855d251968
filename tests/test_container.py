"""Recursive container extraction (stages/container.py): behaviors
the SQL oracle never exercises — deep nesting paths, depth cap,
sniff-based routing, directory entries, broken utf-8."""
import pytest

import pyarrow as pa

from jesterj_ray.stages.container import (ContainerExploder,
                                          _synth_container,
                                          explode_container,
                                          make_container)


def test_flat_children_in_entry_order():
    z = make_container([("b.txt", b"beta"), ("a.txt", b"alpha")])
    assert explode_container(z) == [("/b.txt", "beta"),
                                    ("/a.txt", "alpha")]


def test_nested_zip_extends_path():
    inner2 = make_container([("leaf.txt", b"deep")])
    inner1 = make_container([("l2.zip", inner2), ("mid.txt", b"m")])
    outer = make_container([("l1.zip", inner1), ("top.txt", b"t")])
    assert explode_container(outer) == [
        ("/l1.zip/l2.zip/leaf.txt", "deep"),
        ("/l1.zip/mid.txt", "m"),
        ("/top.txt", "t")]


def test_depth_cap_raises():
    z = make_container([("leaf.txt", b"x")])
    for i in range(4):
        z = make_container([(f"n{i}.zip", z)])
    assert len(explode_container(z, max_depth=5)) == 1
    with pytest.raises(ValueError):
        explode_container(z, max_depth=4)


def test_sniff_routes_html_not_extension():
    # content sniffing like Tika's detector: a .txt whose payload is
    # markup still goes through the HTML extractor (tags stripped),
    # and leading whitespace doesn't defeat the sniff
    z = make_container([
        ("page.txt", b"  \n<html><body><p>hi <b>there</b></p>"
                     b"</body></html>")])
    assert explode_container(z) == [("/page.txt", "hi there")]


def test_directory_entries_skipped_and_bad_utf8_replaced():
    z = make_container([("d/", b""), ("d/f.txt", b"ok \xff end")])
    [(path, text)] = explode_container(z)
    assert path == "/d/f.txt"
    assert text == "ok � end"


def test_batch_entry_point_schema_and_synthesis():
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["a b c d e"], pa.string())})
    out = ContainerExploder()(_synth_container(t))
    assert out.column_names == ["doc_id", "child_path",
                                "text_extracted"]
    rows = sorted(zip(out["child_path"].to_pylist(),
                      out["text_extracted"].to_pylist()))
    # 5 words: part1 = first 3, part2 = last 2, deep = first 3
    assert rows == [("/inner.zip/deep.txt", "a b c"),
                    ("/part1.txt", "a b c"),
                    ("/part2.html", "d e")]
