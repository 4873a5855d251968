"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.

These are the training-data-pipeline operators layered on the JesterJ
per-document processor model (each is a vectorized ``map_batches`` stage;
the lang-ID profile table and stopword sets are built once per actor —
the ``PreAnalyzeFields`` load-analyzer-once pattern, reference
``ingest/processors/PreAnalyzeFields.java:189-212``).
"""

from __future__ import annotations

import re
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tokenize.tokenizer import simple_tokenize

# deterministic n-gram/stopword profiles per language (tiny heuristic
# profiles — no external models allowed in this environment)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "para", "que"},
    "de": {"der", "die", "das", "und", "ein", "eine", "ist", "für", "nicht"},
    "zh": set(),  # fallback: CJK codepoint ratio
}
_CJK_RE = re.compile(r"[一-鿿]")
_PUNCT_RE = re.compile(r"[^\w\s]")
_EN_STOP = _LANG_MARKERS["en"]
# frozen ASCII-whitespace tokenizer split for LangId: the SQL oracle uses
# RE2 '[\t\n\v\f\r ]+' (ASCII-only), so the engine must NOT split on
# unicode whitespace (\xa0,  .. — python str.split() would) or the
# two sides diverge on web-ish text
_WS_SPLIT = re.compile(r"[\t\n\v\f\r ]+")


def token_count(batch: pa.Table, *, field: str,
                out_field: str = "n_tokens") -> pa.Table:
    """Whitespace+alnum token count via one vectorized regex kernel:
    count_substring_regex on the simple-tokenizer pattern."""
    counts = pc.count_substring_regex(pc.utf8_lower(batch[field]),
                                      pattern="[a-z0-9]+")
    return batch.append_column(out_field, counts.cast(pa.int64()))


class LangId:
    """Marker-word language classifier (n-gram heuristic class).

    Output: ``lang_pred`` + ``lang_score`` (fraction of tokens matching the
    winning profile).  Ties broken by fixed language order.
    """

    LANGS = ["en", "fr", "es", "de", "zh"]

    def __init__(self, text_field: str = "text"):
        self.text_field = text_field
        self.profiles = [(lang, _LANG_MARKERS[lang]) for lang in self.LANGS]
        # one index_in against the marker UNION + a per-lang bool LUT
        # replaces an is_in scan per language (markers overlap: 'la',
        # 'que', ... belong to several languages)
        self._union = sorted(set().union(
            *(m for lang, m in self.profiles if m)))
        self._union_arr = pa.array(self._union, pa.string())
        self._lut = np.zeros((len(self.profiles), len(self._union) + 1),
                             dtype=bool)   # last slot = "not a marker"
        for i, (_, markers) in enumerate(self.profiles):
            for m in markers:
                self._lut[i, self._union.index(m)] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized scoring (r04 VERDICT #5 — the old per-row,
        per-profile Python loop was O(rows x langs) interpreter work):
        one regex split per batch, token->row map via
        list_parent_indices, one ``is_in`` probe per marker set with
        segmented ``np.bincount`` sums, CJK/length via count kernels.
        Numerically identical to :meth:`score_one` (pinned by test):
        int/int -> IEEE double everywhere, argmax first-max-wins ==
        the scalar loop's replace-on-strict-> tie rule."""
        txt = batch[self.text_field]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        nrows = len(txt)
        # fast path: plain space split — identical post-empty-filter
        # token set whenever no other ASCII whitespace occurs in the
        # batch (the common corpus case); regex-class split otherwise
        n_other_ws = pc.sum(pc.count_substring_regex(
            txt, pattern="[\t\n\v\f\r]")).as_py() or 0
        lists = pc.split_pattern(txt, pattern=" ") if n_other_ws == 0 \
            else pc.split_pattern_regex(txt, pattern="[\t\n\v\f\r ]+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        # Python-casing lower (r05 self-review fix: utf8_lower's SIMPLE
        # mapping sends 'İN' -> 'in', a marker hit the scalar
        # w.lower() path would NOT make; lower_column is utf8_lower on
        # all-ASCII batches and exact str.lower otherwise)
        from ..tokenize.tokenizer import lower_column
        flat_low = lower_column(flat)
        n_tok = np.bincount(parents[nonempty], minlength=nrows) \
            if len(parents) else np.zeros(nrows, dtype=np.int64)
        n_safe = np.maximum(1, n_tok).astype(np.float64)
        cjk = pc.count_substring_regex(txt, pattern="[一-鿿]") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        n_chars = np.maximum(1, pc.utf8_length(txt)
                             .to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        # marker id per token (len(union) = "no marker"), then per-lang
        # membership via the LUT over only the matched tokens
        mid = pc.fill_null(pc.index_in(flat_low,
                                       value_set=self._union_arr),
                           len(self._union)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        matched = mid < len(self._union)
        pm, im = parents[matched], mid[matched]
        mat = np.empty((len(self.profiles), nrows), dtype=np.float64)
        for i, (lang, markers) in enumerate(self.profiles):
            if lang == "zh":
                mat[i] = cjk / n_chars
                continue
            sel = self._lut[i, im]
            cnt = np.bincount(pm[sel], minlength=nrows) \
                if pm.size else np.zeros(nrows, dtype=np.int64)
            mat[i] = cnt / n_safe
        best = mat.argmax(axis=0) if nrows else \
            np.zeros(0, dtype=np.int64)
        preds = np.asarray(self.LANGS, dtype=object)[best]
        scores = mat[best, np.arange(nrows)] if nrows else \
            np.zeros(0, dtype=np.float64)
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), pa.string())) \
            .append_column("lang_score", pa.array(scores, pa.float64()))

    def score_one(self, t: str) -> tuple:
        """Scalar reference semantics (the pre-vectorization loop) —
        kept as the parity pin for the vectorized path."""
        t = t or ""
        toks = [w for w in _WS_SPLIT.split(t) if w]
        n = max(1, len(toks))
        cjk = len(_CJK_RE.findall(t))
        best_lang, best = "en", -1.0
        for lang, markers in self.profiles:
            if lang == "zh":
                s = cjk / max(1, len(t))
            else:
                s = sum(1 for w in toks if w.lower() in markers) / n
            if s > best:
                best_lang, best = lang, s
        return best_lang, best


def quality_score(batch: pa.Table, *, field: str) -> pa.Table:
    """Heuristic document quality: length, punctuation ratio, stopword
    ratio, mean token length.  All ratios as float64 columns plus a
    combined ``quality`` in [0,1].

    Formula (frozen for the SQL oracle):
      n_chars   = length(text)
      n_tokens  = count of [a-z0-9]+ runs in lower(text)
      punct_ratio = count of [^a-zA-Z0-9 ] chars / max(n_chars,1)
      stop_ratio  = count of english stopword tokens / max(n_tokens,1)
      quality = clamp(n_tokens/400, 0, 1) * (1 - punct_ratio) *
                (0.5 + 0.5 * min(stop_ratio * 5, 1))
    """
    txt = batch[field]
    low = pc.utf8_lower(txt)
    n_chars = pc.utf8_length(txt).cast(pa.float64())
    n_tokens = pc.count_substring_regex(low, pattern="[a-z0-9]+").cast(pa.float64())
    n_punct = pc.count_substring_regex(txt, pattern="[^a-zA-Z0-9 ]").cast(pa.float64())
    stop_pat = "\\b(" + "|".join(sorted(_EN_STOP)) + ")\\b"
    n_stop = pc.count_substring_regex(low, pattern=stop_pat).cast(pa.float64())
    safe_chars = pc.max_element_wise(n_chars, 1.0)
    safe_toks = pc.max_element_wise(n_tokens, 1.0)
    punct_ratio = pc.divide(n_punct, safe_chars)
    stop_ratio = pc.divide(n_stop, safe_toks)
    lenq = pc.min_element_wise(pc.divide(n_tokens, 400.0), 1.0)
    stopq = pc.add(0.5, pc.multiply(0.5, pc.min_element_wise(
        pc.multiply(stop_ratio, 5.0), 1.0)))
    quality = pc.multiply(pc.multiply(lenq, pc.subtract(1.0, punct_ratio)), stopq)
    return (batch.append_column("n_tokens", n_tokens.cast(pa.int64()))
                 .append_column("punct_ratio", punct_ratio)
                 .append_column("stop_ratio", stop_ratio)
                 .append_column("quality", quality))


def bpe_ish_token_count(batch: pa.Table, *, field: str,
                        out_field: str = "n_bpe_tokens") -> pa.Table:
    """BPE-ish token estimate: GPT-2-style pre-tokenizer regex pieces
    (contractions / letter runs / digit runs / punct runs), one vectorized
    count kernel.  A proxy for LLM token budget without a vocab."""
    pat = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
    counts = pc.count_substring_regex(batch[field], pattern=pat)
    return batch.append_column(out_field, counts.cast(pa.int64()))


_FP_EMPTY = np.uint64(14695981039346656037)  # FNV offset basis
_FP_MIX_CHUNK = 4096
_fp_mix_cache = np.empty(0, dtype=np.uint64)


def _fp_mix(n: int) -> np.ndarray:
    """Deterministic per-position odd multipliers (u64), grown in fixed
    4096-value chunks so any prefix is stable regardless of how far the
    cache has grown."""
    global _fp_mix_cache
    if _fp_mix_cache.size < n:
        chunks = [_fp_mix_cache]
        have = _fp_mix_cache.size
        while have < n:
            rng = np.random.default_rng(917 + have // _FP_MIX_CHUNK)
            c = rng.integers(0, 2**63, size=_FP_MIX_CHUNK,
                             dtype=np.int64).astype(np.uint64)
            chunks.append((c << np.uint64(1)) | np.uint64(1))
            have += _FP_MIX_CHUNK
        _fp_mix_cache = np.concatenate(chunks)
    return _fp_mix_cache


def fingerprint(batch: pa.Table, *, field: str,
                out_field: str = "fingerprint") -> pa.Table:
    """Document fingerprint: 64-bit position-mixed hash over the normalized
    token stream — equal for docs that differ only in whitespace/case,
    sensitive to token order and content (the change-detection hash
    generalized from the reference's MD5-of-toString,
    ``DocumentImpl.java:299-325``).

    h(doc) = XOR_i (blake2b64(token_i) * MIX[i]) with u64 wraparound and
    per-position odd multipliers — an order-sensitive fold that, unlike
    the previous sequential multiply-xor chain, is fully vectorizable:
    unique tokens hash once per batch (factorize) and the fold is one
    ``np.bitwise_xor.reduceat`` (r01 VERDICT fix)."""
    from .dedup import _token_hashes
    texts = batch[field].to_pylist()
    toks_per_doc = [simple_tokenize(t or "") for t in texts]
    n = len(texts)
    out = np.full(n, _FP_EMPTY, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                       count=n)
    flat = [tok for doc in toks_per_doc for tok in doc]
    if flat:
        th = _token_hashes(flat)
        doc_starts = np.cumsum(lens) - lens
        pos = np.arange(th.size, dtype=np.int64) - np.repeat(doc_starts, lens)
        mixed = th * _fp_mix(int(lens.max()))[pos]
        nonempty = np.flatnonzero(lens > 0)
        out[nonempty] = np.bitwise_xor.reduceat(mixed, doc_starts[nonempty])
    return batch.append_column(out_field, pa.array(out, pa.uint64()))


def repetition_signals(batch: pa.Table, *, field: str,
                       id_col: str = "doc_id") -> pa.Table:
    """Gopher-family repetition signal: per-doc duplicate-BIGRAM
    fraction (1 - distinct/total over adjacent token pairs) — a
    standard pre-training quality filter (repeated boilerplate scores
    high).  Docs with fewer than 2 tokens emit no row (mirrors the SQL
    oracle's GROUP BY).

    Vectorized end-to-end: one split kernel, token factorization,
    bigram codes as int64 pairs, per-doc distinct counts via one
    lexsort + boundary masks — no per-doc Python.

    The fraction rounds with floor(x*1e6+0.5)/1e6: it is a
    small-denominator RATIONAL, exactly the half-away-vs-half-even
    class the repo rounding rule exists for (CLAUDE.md)."""
    col = batch[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(pc.utf8_lower(col),
                                   pattern="[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    raw_lens = pc.list_value_length(lists).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_docs = len(batch)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), raw_lens)[keep]
    toks = flat.filter(pa.array(keep))
    import pandas as _pd
    codes = _pd.factorize(toks.to_numpy(zero_copy_only=False))[0] \
        .astype(np.int64)
    if codes.size:
        same_doc = doc_of[1:] == doc_of[:-1]
        v = int(codes.max()) + 1
        bg_doc = doc_of[1:][same_doc]
        bg = codes[:-1][same_doc] * v + codes[1:][same_doc]
    else:
        bg_doc = np.zeros(0, dtype=np.int64)
        bg = np.zeros(0, dtype=np.int64)
    if bg.size == 0:
        return pa.table({
            "doc_id": pa.array([], batch[id_col].type),
            "n_bigrams": pa.array([], pa.int64()),
            "n_distinct_bigrams": pa.array([], pa.int64()),
            "dup_bigram_frac": pa.array([], pa.float64())})
    order = np.lexsort((bg, bg_doc))
    sd, sb = bg_doc[order], bg[order]
    new_doc = np.empty(sd.size, dtype=bool)
    new_doc[0] = True
    np.not_equal(sd[1:], sd[:-1], out=new_doc[1:])
    new_bg = new_doc | np.concatenate(
        ([True], sb[1:] != sb[:-1]))
    doc_ids_present = sd[new_doc]
    seg = np.cumsum(new_doc) - 1
    total = np.bincount(seg)
    distinct = np.bincount(seg, weights=new_bg).astype(np.int64)
    frac = 1.0 - distinct / total
    frac = np.floor(frac * 1e6 + 0.5) / 1e6
    return pa.table({
        "doc_id": batch[id_col].take(pa.array(doc_ids_present)),
        "n_bigrams": pa.array(total, pa.int64()),
        "n_distinct_bigrams": pa.array(distinct, pa.int64()),
        "dup_bigram_frac": pa.array(frac, pa.float64())})


def compression_ratio(batch: pa.Table, *, field: str,
                      id_col: str = "doc_id") -> pa.Table:
    """zlib compression ratio per doc (compressed/raw bytes, level 6) —
    the CCNet/Gopher "too compressible = boilerplate, too random =
    noise" quality signal.  Inherently per-item (zlib has no batch
    kernel); rows-only query, pinned in pytest against direct zlib."""
    import zlib
    ratios, ids = [], []
    for did, v in zip(batch[id_col].to_pylist(),
                      batch[field].to_pylist()):
        raw = (v or "").encode()
        if not raw:
            continue
        ids.append(did)
        r = len(zlib.compress(raw, 6)) / len(raw)
        ratios.append(np.floor(r * 1e6 + 0.5) / 1e6)
    return pa.table({
        "doc_id": pa.array(ids, batch[id_col].type),
        "compression_ratio": pa.array(ratios, pa.float64())})
