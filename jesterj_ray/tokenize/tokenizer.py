"""Tokenizers — FROZEN semantics (the oracle and the engine share these).

Reference analog: JesterJ ``PreAnalyzeFields`` runs a Lucene Analyzer built
once per step over field values (reference
``ingest/processors/PreAnalyzeFields.java:64-114``, analyzer construction
``ingest/utils/SolrSchemaUtil.java:134+``).  Our engine needs two frozen
tokenizers:

- ``simple_tokenize``: lowercase, maximal runs of ``[a-z0-9]+``.  Exactly
  expressible in DuckDB SQL as ``regexp_extract_all(lower(text),
  '[a-z0-9]+')`` so the driver's SQL oracle can verify index pipelines
  end-to-end.
- ``code_tokenize``: language-aware identifier splitting — snake_case and
  camelCase identifiers split into sub-tokens (``parseHTTPResponse`` ->
  ``parse http response``; ``my_var2`` -> ``my var2``), lowercased.  Used by
  the code-corpus index; verified against the in-repo brute-force oracle.

Determinism rules (tests pin these):
- token order is document order (after splitting, sub-tokens keep order)
- no stemming, no stopword removal, tokens of length >= 1 kept
"""

from __future__ import annotations

import re
from typing import List

# simple: maximal [a-z0-9]+ runs over the lowercased text
_SIMPLE_RE = re.compile(r"[a-z0-9]+")

# code: identifiers / numbers in the raw text
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+")
# camelCase boundaries: ABCDef -> ABC_Def ; abC -> ab_C
_ACRONYM_RE = re.compile(r"([A-Z]+)([A-Z][a-z])")
_CAMEL_RE = re.compile(r"([a-z0-9])([A-Z])")
_ASCII_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def simple_tokenize(text: str) -> List[str]:
    """Lowercase [a-z0-9]+ runs. SQL-oracle-identical."""
    return _SIMPLE_RE.findall(text.lower())


def split_identifier(ident: str) -> List[str]:
    """Split one identifier on snake_case and camelCase boundaries, lowercase."""
    s = _ACRONYM_RE.sub(r"\1_\2", ident)
    s = _CAMEL_RE.sub(r"\1_\2", s)
    return [p.lower() for p in s.split("_") if p]


def code_tokenize_reference(text: str) -> List[str]:
    """Identifier-aware tokenization, reference implementation (per-ident
    Python loop).  Kept as the equivalence oracle for the fast path."""
    out: List[str] = []
    for ident in _IDENT_RE.findall(text):
        if "_" in ident or not ident.islower():
            out.extend(split_identifier(ident))
        else:
            out.append(ident)
    return out


# digit-run at an identifier START followed by letters splits ("123abc" ->
# 123, abc — identifiers cannot start with digits) while a digit INSIDE an
# identifier does not ("var2sort" stays whole): fixed-width lookbehind
# blocks the in-identifier case
_LEADING_NUM_RE = re.compile(r"(?<![A-Za-z0-9_])([0-9]+)([A-Za-z])")


# cheap superset test for "anything that might force identifier
# splitting": an uppercase letter, an underscore, or any digit-letter
# adjacency (a lookbehind-free over-approximation — false positives just
# take the slower exact path)
_NEEDS_SPLIT_RE = re.compile(r"[A-Z_]|[0-9][A-Za-z]")


def code_tokenize(text: str) -> List[str]:
    """Identifier-aware tokenization for source code — whole-text fast
    path: if one scan finds nothing to split, tokens are a plain findall;
    otherwise three C-level regex substitutions insert boundaries
    (acronym, camelCase, leading-number) before the findall.  Proven
    token-identical to :func:`code_tokenize_reference` (pytest property
    test + corpus sweep)."""
    if _NEEDS_SPLIT_RE.search(text) is None:
        return _SIMPLE_RE.findall(text)  # already all-lowercase tokens
    s = _ACRONYM_RE.sub(r"\1_\2", text)
    s = _CAMEL_RE.sub(r"\1_\2", s)
    s = _LEADING_NUM_RE.sub(r"\1_\2", s)
    # per-token lower (tokens are pure ASCII): whole-text .lower() would
    # manufacture ASCII letters from exotic codepoints ('İ' -> 'i̇')
    return [t.lower() for t in _ASCII_TOKEN_RE.findall(s)]


TOKENIZERS = {"simple": simple_tokenize, "code": code_tokenize}

# the DuckDB expression exactly equivalent to simple_tokenize(text)
SIMPLE_TOKENIZE_SQL = "regexp_extract_all(lower({col}), '[a-z0-9]+')"


def lower_column(col):
    """Python ``str.lower`` (full-casing) semantics for an Arrow string
    column.  Arrow's ``utf8_lower`` does SIMPLE 1:1 case mapping and
    diverges from Python/DuckDB full casing on SpecialCasing
    codepoints ('İ' U+0130 -> 'i' vs 'i̇'; CLAUDE.md pins Python
    casing for every tokenizer/query path).  All-ASCII batches — the
    common corpus case, checked with one vectorized kernel — take the
    zero-copy ``utf8_lower`` path, which is identical there; any batch
    containing a non-ASCII byte falls back to per-row ``str.lower``,
    which is exact everywhere."""
    import pyarrow as _pa
    import pyarrow.compute as _pc
    if isinstance(col, _pa.ChunkedArray):
        col = col.combine_chunks()
    filled = _pc.fill_null(col, "")
    non_ascii = _pc.sum(_pc.count_substring_regex(
        filled, pattern="[^\\x00-\\x7F]")).as_py() or 0
    if non_ascii == 0:
        return _pc.utf8_lower(col)
    return _pa.array([None if v is None else v.lower()
                      for v in col.to_pylist()], _pa.string())
