"""Gopher-family document quality rules (Rae et al. 2021, §A1.1).

The published pre-training filter: a document survives when a set of
cheap surface statistics all land inside fixed bands.  Every signal
here is one-or-two vectorized Arrow kernels over the batch (a §2.3-
style per-field processor; no per-row Python), and the whole rule
table is FROZEN and mirrored term-by-term in the ``gopher_rules``
DuckDB oracle — edit both sides together.

Signals (words = non-empty ``[\\t\\n\\v\\f\\r ]``-separated segments,
the repo's frozen ASCII-whitespace split — see ``textstats._WS_SPLIT``):

- ``n_words``          word count
- ``mean_word_len``    total word chars / words
- ``symbol_ratio``     ('#' count + '...' count) / words
- ``bullet_ratio``     lines starting '-', '*' or '•' / lines
- ``ellipsis_ratio``   lines ending '...' / lines
- ``frac_alpha_words`` words containing [A-Za-z] / words
- ``n_stop_distinct``  distinct hits among Gopher's 8 stop words

Rule bands (defaults = the paper's, word band lowered to the corpus
scale by callers): ``min_words <= n_words <= max_words``,
``3 <= mean_word_len <= 10``, ``symbol_ratio <= 0.1``,
``bullet_ratio <= 0.9``, ``ellipsis_ratio <= 0.3``,
``frac_alpha_words >= 0.8``, ``n_stop_distinct >= 2``.

Ratios are small-denominator RATIONALS, so they round half-AWAY
(``floor(x*1e6+0.5)/1e6``) to match SQL ``round()`` (repo rule).
Documents with zero words fail (every ratio treated as out-of-band).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# Gopher's "must contain 2 of" stop list (frozen; oracle mirrors)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

_WS = "[\\t\\n\\v\\f\\r ]"


def _away6(x) -> np.ndarray:
    """Half-AWAY-from-zero 6dp rounding (the repo rule for rationals —
    matches SQL round()); shared by flagship's components too."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def gopher_signals(batch: pa.Table, *, field: str,
                   id_col: str = "doc_id") -> pa.Table:
    """All signals, vectorized; one output row per input row."""
    from ..tokenize.tokenizer import lower_column
    txt = batch[field]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    low = lower_column(txt)   # Python/DuckDB full casing (oracle parity)
    words = pc.split_pattern_regex(txt, pattern=_WS + "+")
    flat = pc.list_flatten(words)
    raw_lens = pc.list_value_length(words).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_docs = len(batch)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), raw_lens)[keep]
    kept = flat.filter(pa.array(keep))
    n_words = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    wlens = pc.utf8_length(kept).to_numpy(zero_copy_only=False)
    char_mass = np.bincount(doc_of, weights=wlens, minlength=n_docs)
    is_alpha = pc.match_substring_regex(kept, pattern="[A-Za-z]") \
        .to_numpy(zero_copy_only=False)
    n_alpha = np.bincount(doc_of, weights=is_alpha, minlength=n_docs)
    n_sym = pc.add(
        pc.count_substring(txt, pattern="#"),
        pc.count_substring_regex(txt, pattern=r"\.\.\.")) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    # line stats: n_lines = '\n' count + 1 (text has >= 1 line even empty)
    n_lines = pc.add(pc.count_substring(txt, pattern="\n"), 1) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_bullet = pc.count_substring_regex(
        txt, pattern=r"(?m)^[-*•]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_ell = pc.count_substring_regex(txt, pattern=r"(?m)\.\.\.$") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_stop = np.zeros(n_docs, dtype=np.int64)
    for w in GOPHER_STOPS:
        hit = pc.match_substring_regex(
            low, pattern=r"\b" + w + r"\b") \
            .to_numpy(zero_copy_only=False)
        n_stop += hit.astype(np.int64)
    safe_w = np.maximum(n_words, 1).astype(np.float64)
    out = pa.table({
        "doc_id": batch[id_col],
        "n_words": pa.array(n_words, pa.int64()),
        "mean_word_len": pa.array(_away6(char_mass / safe_w),
                                  pa.float64()),
        "symbol_ratio": pa.array(_away6(n_sym / safe_w), pa.float64()),
        "bullet_ratio": pa.array(_away6(n_bullet / n_lines),
                                 pa.float64()),
        "ellipsis_ratio": pa.array(_away6(n_ell / n_lines),
                                   pa.float64()),
        "frac_alpha_words": pa.array(_away6(n_alpha / safe_w),
                                     pa.float64()),
        "n_stop_distinct": pa.array(n_stop, pa.int64()),
    })
    return out


def apply_rules(sig: pa.Table, *, min_words: int = 50,
                max_words: int = 100_000,
                min_stop_distinct: int = 2) -> pa.Table:
    """Append the boolean verdict column ``gopher_pass``.

    Verdicts are computed on the ROUNDED ratios (the published columns)
    so the oracle's comparisons agree bit-for-bit.
    """
    g = lambda c: sig[c].to_numpy(zero_copy_only=False)  # noqa: E731
    ok = ((g("n_words") >= min_words) & (g("n_words") <= max_words)
          & (g("mean_word_len") >= 3.0) & (g("mean_word_len") <= 10.0)
          & (g("symbol_ratio") <= 0.1)
          & (g("bullet_ratio") <= 0.9)
          & (g("ellipsis_ratio") <= 0.3)
          & (g("frac_alpha_words") >= 0.8)
          & (g("n_stop_distinct") >= min_stop_distinct))
    return sig.append_column("gopher_pass", pa.array(ok, pa.bool_()))


def gopher_rules_pipeline(sf_dir: str, *, min_words: int = 20,
                          max_words: int = 100_000,
                          min_stop_distinct: int = 1):
    """documents → signals → rule verdicts, sorted by doc_id.

    ``min_words=20`` / ``min_stop_distinct=1`` scale the paper's
    50-word floor and 2-distinct-stop-word rule to the synthetic test
    corpus (~25-word docs drawn from a vocabulary containing only one
    of the 8 stop words) so the verdict column has both outcomes.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=16)
    out = ds.map_batches(gopher_signals, batch_format="pyarrow",
                         fn_kwargs={"field": "text"}) \
            .map_batches(apply_rules, batch_format="pyarrow",
                         fn_kwargs={"min_words": min_words,
                                    "max_words": max_words,
                                    "min_stop_distinct":
                                        min_stop_distinct})
    return out.sort("doc_id")
