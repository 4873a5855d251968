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


class StaxHandler:
    """Subtree event collector — the ``LimitedStaxHandler`` analog
    (``StaxExtractingProcessor.java:377-410``).  One instance is created
    per MATCHED element (by the spec's factory) and receives the matched
    subtree's events: ``on_characters`` for every text node (default:
    accumulate all), ``on_start_element`` / ``on_end_element`` for nested
    elements (default: no-op — override to gate capture to chosen
    children, e.g. just <firstname>/<lastname> of a <person>).  The
    match's value is ``result()``."""

    def __init__(self, accumulator: List[str], spec: "ElementSpec"):
        self.accumulator = accumulator
        self.spec = spec

    def on_characters(self, text: str) -> None:
        self.accumulator.append(text)

    def on_start_element(self, tag: str, attrs: Dict[str, str]) -> None:
        pass

    def on_end_element(self, tag: str) -> None:
        pass

    def result(self) -> str:
        return "".join(self.accumulator)


class ElementSpec:
    """What to do with a matched element — the reference ElementSpec
    (``StaxExtractingProcessor.java:263-351``): destination field,
    attributes whose values prepend the captured text (in supplied order,
    space-separated), regex matchers that must ALL fullmatch attribute
    values for the element to count, and a handler FACTORY so callers can
    plug custom subtree logic (``LimitedStaxHandlerFactory:355-357``)."""

    def __init__(self, dest_field: str, handler_factory=None):
        self.dest_field = dest_field
        self.handler_factory = handler_factory or StaxHandler
        self._attrs_to_include: List[str] = []
        self._attr_value_matchers: List = []

    def incl_attribute_text(self, attr_name: str) -> "ElementSpec":
        if attr_name not in self._attrs_to_include:
            self._attrs_to_include.append(attr_name)
        return self

    def match_on_attr_value(self, attr_name: str, pattern) -> "ElementSpec":
        import re
        self._attr_value_matchers.append((attr_name, re.compile(pattern)))
        return self

    def matches(self, attrs: Dict[str, str]) -> bool:
        for name, pat in self._attr_value_matchers:
            v = attrs.get(name)
            if v is None or not pat.fullmatch(v):
                return False
        return True

    def handle_if_matches(self, attrs: Dict[str, str]):
        if not self.matches(attrs):
            return None
        acc: List[str] = []
        for name in self._attrs_to_include:
            acc.append(attrs.get(name, "") + " ")
        return self.handler_factory(acc, self)


def _deliver_subtree(elem, handler: StaxHandler) -> None:
    """Replay the matched element's subtree as events in document order
    (the matched element's own start tag is not delivered, matching the
    reference's handler lifecycle)."""
    if elem.text:
        handler.on_characters(elem.text)
    for child in elem:
        handler.on_start_element(child.tag, dict(child.attrib))
        _deliver_subtree(child, handler)
        handler.on_end_element(child.tag)
        if child.tail:
            handler.on_characters(child.tail)


def extract_xml_elements(batch: pa.Table, *, xml_field: str,
                         specs: Dict[str, List["ElementSpec"]],
                         path_buffer: int = 2048,
                         fail_on_long_path: bool = False) -> pa.Table:
    """Full StaxExtracting analog: ``specs`` maps absolute element paths
    (slash-joined tags from the root) to ElementSpecs.  Each matched
    element (path match + attribute matchers) yields one value via its
    handler; multiple matches append (multi-valued fields, one
    list<string> column per destination).  ``path_buffer`` bounds the
    tracked path length (reference withPathBuffer/failOnLongPath):
    elements beyond it don't match and flag ``xml_error`` unless
    ``fail_on_long_path`` raises instead."""
    from xml.etree import ElementTree

    dest_fields: List[str] = []
    for lst in specs.values():
        for s in lst:
            if s.dest_field not in dest_fields:
                dest_fields.append(s.dest_field)
    out: Dict[str, List[List[str]]] = {f: [] for f in dest_fields}
    errors: List[bool] = []
    # a spec on the root element itself needs the whole tree alive
    root_spec = any(len(p.split("/")) == 1 for p in specs)

    for xml in batch[xml_field].to_pylist():
        row: Dict[str, List[str]] = {f: [] for f in dest_fields}
        err = False
        if xml:
            try:
                stack: List[str] = []
                too_long = 0  # depth below an over-long path
                for event, elem in ElementTree.iterparse(
                        io.StringIO(xml), events=("start", "end")):
                    if event == "start":
                        if too_long or sum(len(t) + 1 for t in stack) + \
                                len(elem.tag) > path_buffer:
                            if fail_on_long_path:
                                raise ValueError(
                                    f"element path exceeds {path_buffer}")
                            err = True
                            too_long += 1
                        stack.append(elem.tag)
                        continue
                    path = "/".join(stack)
                    if too_long:
                        too_long -= 1
                    else:
                        for s in specs.get(path, ()):
                            h = s.handle_if_matches(dict(elem.attrib))
                            if h is not None:
                                _deliver_subtree(elem, h)
                                row[s.dest_field].append(h.result())
                    stack.pop()
                    if len(stack) <= 1 and not root_spec:
                        elem.clear()  # bounded memory at the top levels
            except (ElementTree.ParseError, ValueError):
                if fail_on_long_path:
                    raise
                err = True
        errors.append(err)
        for f in dest_fields:
            out[f].append(row[f])

    for f in dest_fields:
        batch = batch.append_column(f, pa.array(out[f],
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
