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


_OFFSET_ANALYZERS: dict = {}    # serialized CONFIG -> compiled (so a
#                                 re-registered name never serves stale)


def pre_analyze_field(batch: pa.Table, *, field: str,
                      out_field: str = "", tokenizer="code"
                      ) -> pa.Table:
    """Emit the pre-analyzed JSON for each value of ``field``.

    ``tokenizer``: 'simple'/'code' (frozen), a CONFIG DICT (the
    schema-driven analyzer — pass the dict in ``fn_kwargs`` so it
    travels to Ray workers, which do NOT share the driver's
    registration globals), or a registered analyzer NAME
    (driver-local convenience).  Config chains store the
    POST-charFilter text as ``str`` so the emitted offsets index the
    stored string exactly (:func:`..analyzer.build_preanalyzer`) —
    the reference's PreAnalyzeFields-consumes-the-schema-analyzer
    wiring."""
    if tokenizer in ("simple", "code"):
        def analyze(v):
            return v, analyze_with_offsets(v, tokenizer)
    else:
        from .analyzer import ANALYZER_CONFIGS, build_preanalyzer
        if isinstance(tokenizer, dict):
            cfg = tokenizer
        elif tokenizer in ANALYZER_CONFIGS:
            cfg = ANALYZER_CONFIGS[tokenizer]
        else:
            raise ValueError(
                f"unknown pre-analyze tokenizer {tokenizer!r}: not "
                "frozen, not a config dict, and not registered in "
                "this process (inside map_batches pass the CONFIG "
                "DICT — workers don't see driver registrations)")
        key = json.dumps(cfg, sort_keys=True)
        if key not in _OFFSET_ANALYZERS:
            _OFFSET_ANALYZERS[key] = build_preanalyzer(cfg)
        analyze = _OFFSET_ANALYZERS[key]
    vals = batch[field].to_pylist()
    payloads = []
    for v in vals:
        s, toks = analyze(v or "")
        payloads.append(json.dumps({"v": "1", "str": s, "tokens": toks},
                                   ensure_ascii=False))
    return batch.append_column(out_field or f"{field}_preanalyzed",
                               pa.array(payloads, pa.string()))
