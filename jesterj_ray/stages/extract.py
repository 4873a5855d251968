"""Structured extraction stages: XML path extraction and JSON field
extraction from payload columns.

Reference analogs:
- ``StaxExtractingProcessor`` (``ingest/processors/StaxExtractingProcessor
  .java:36-128``): streaming StAX XML walk with a trie of element paths ->
  destination fields, attribute matchers, bounded path buffer.  Ours walks
  with ``xml.etree.ElementTree.iterparse`` (also streaming) and a dict of
  absolute element paths (the reference's PatriciaTrie only buys prefix
  sharing on exact paths, SURVEY.md §2.3).
- JSON payloads have no reference analog (JesterJ predates them here) but
  the same shape applies: path spec -> column.
"""

from __future__ import annotations

import io
import json
from typing import Dict, List, Optional

import pyarrow as pa


class XmlPathSpec:
    """One extraction rule: absolute element path -> output field.

    ``path``: '/'-joined tag names from the root, e.g.
    ``"article/front/title"``.  ``attr``: extract that attribute instead of
    text.  Multiple matches per doc -> list of strings (the reference's
    multi-valued field).
    """

    def __init__(self, path: str, field: str, attr: Optional[str] = None):
        self.path = path.strip("/")
        self.field = field
        self.attr = attr


def extract_xml_paths(batch: pa.Table, *, xml_field: str,
                      specs: List[XmlPathSpec]) -> pa.Table:
    """Streaming-parse each XML value; emit one list<string> column per
    spec.  Malformed XML yields empty lists (the reference marks the doc
    ERROR; our per-row quarantine policy is to keep the row with empty
    extraction plus an ``xml_error`` flag)."""
    from xml.etree import ElementTree

    out: Dict[str, List[List[str]]] = {s.field: [] for s in specs}
    errors: List[bool] = []
    by_path: Dict[str, List[XmlPathSpec]] = {}
    for s in specs:
        by_path.setdefault(s.path, []).append(s)

    for xml in batch[xml_field].to_pylist():
        row: Dict[str, List[str]] = {s.field: [] for s in specs}
        err = False
        if xml:
            try:
                stack: List[str] = []
                for event, elem in ElementTree.iterparse(
                        io.StringIO(xml), events=("start", "end")):
                    if event == "start":
                        stack.append(elem.tag)
                    else:
                        path = "/".join(stack)
                        for s in by_path.get(path, ()):
                            if s.attr is not None:
                                v = elem.get(s.attr)
                                if v is not None:
                                    row[s.field].append(v)
                            elif elem.text is not None:
                                row[s.field].append(elem.text)
                        stack.pop()
                        elem.clear()  # bounded memory: drop subtree
            except ElementTree.ParseError:
                err = True
        errors.append(err)
        for f, vals in row.items():
            out[f].append(vals)

    for s in specs:
        batch = batch.append_column(s.field,
                                    pa.array(out[s.field],
                                             pa.list_(pa.string())))
    return batch.append_column("xml_error", pa.array(errors, pa.bool_()))


def extract_json_field(batch: pa.Table, *, json_field: str, key: str,
                       out_field: str, as_type: str = "string") -> pa.Table:
    """Extract one top-level key from a JSON-string column.

    ``as_type``: string | int64 | float64.  Missing key / bad JSON -> null.
    """
    vals = []
    for s in batch[json_field].to_pylist():
        v = None
        if s:
            try:
                v = json.loads(s).get(key)
            except (json.JSONDecodeError, AttributeError):
                v = None
        vals.append(v)
    typ = {"string": pa.string(), "int64": pa.int64(),
           "float64": pa.float64()}[as_type]
    if as_type == "string":
        vals = [None if v is None else str(v) for v in vals]
    return batch.append_column(out_field, pa.array(vals, typ))
