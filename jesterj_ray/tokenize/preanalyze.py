"""Pre-analyzed field emission — the PreAnalyzeFields analog.

Reference (``ingest/processors/PreAnalyzeFields.java:64-114``): run a
Lucene Analyzer over field values and emit the Solr pre-analyzed JSON
format ``{"v":"1","str":...,"tokens":[{t,s,e,i,p,y,f}]}`` per value, so
the search engine can skip analysis at index time.

Ours runs a frozen tokenizer (``jesterj_ray.tokenize.tokenizer``) with
character offsets and position increments and emits the same JSON shape:
``t``=term, ``s``/``e``=start/end offset, ``i``=position increment.
The analyzer is module-level compiled regex state — the load-once-per-
worker pattern the reference achieves with a ThreadLocal analyzer factory
(``PreAnalyzeFields.java:189-212``).
"""

from __future__ import annotations

import json
import re
from typing import List

import pyarrow as pa

from .tokenizer import split_identifier

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+")
_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def analyze_with_offsets(text: str, tokenizer: str = "code") -> List[dict]:
    """Tokens with offsets: [{t, s, e, i}]. Sub-tokens from identifier
    splitting share the identifier's offsets with position increment 1 for
    the first sub-token and 0... no — each sub-token advances position by
    1 (they are real positions for phrase queries); offsets span the whole
    identifier."""
    out: List[dict] = []
    if tokenizer == "simple":
        for m in _SIMPLE_RE.finditer(text.lower()):
            out.append({"t": m.group(), "s": m.start(), "e": m.end(), "i": 1})
        return out
    for m in _IDENT_RE.finditer(text):
        ident = m.group()
        if "_" in ident or not ident.islower():
            for sub in split_identifier(ident):
                out.append({"t": sub, "s": m.start(), "e": m.end(), "i": 1})
        else:
            out.append({"t": ident, "s": m.start(), "e": m.end(), "i": 1})
    return out


_OFFSET_ANALYZERS: dict = {}    # registered-config name -> compiled


def pre_analyze_field(batch: pa.Table, *, field: str,
                      out_field: str = "", tokenizer: str = "code"
                      ) -> pa.Table:
    """Emit the pre-analyzed JSON for each value of ``field``.

    ``tokenizer``: 'simple'/'code' (frozen), or the name of a
    schema-driven analyzer registered via
    ``analyzer.register_analyzer`` — the reference's actual wiring
    (PreAnalyzeFields consumes the schema-built Lucene analyzer);
    offsets then follow the chain's OffsetAttribute rule
    (:func:`..analyzer.build_analyzer_with_offsets`)."""
    if tokenizer in ("simple", "code"):
        analyze = lambda v: analyze_with_offsets(v, tokenizer)  # noqa: E731
    else:
        if tokenizer not in _OFFSET_ANALYZERS:
            from .analyzer import (ANALYZER_CONFIGS,
                                   build_analyzer_with_offsets)
            if tokenizer not in ANALYZER_CONFIGS:
                raise ValueError(
                    f"unknown pre-analyze tokenizer {tokenizer!r}: "
                    "not frozen and not a registered analyzer config")
            _OFFSET_ANALYZERS[tokenizer] = build_analyzer_with_offsets(
                ANALYZER_CONFIGS[tokenizer])
        analyze = _OFFSET_ANALYZERS[tokenizer]
    vals = batch[field].to_pylist()
    payloads = []
    for v in vals:
        toks = analyze(v or "")
        payloads.append(json.dumps({"v": "1", "str": v, "tokens": toks},
                                   ensure_ascii=False))
    return batch.append_column(out_field or f"{field}_preanalyzed",
                               pa.array(payloads, pa.string()))
