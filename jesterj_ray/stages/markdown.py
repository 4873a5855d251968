"""Markdown -> text extraction — the second rich-document slice of the
Tika slot (``TikaProcessor.java:50-84``; markdown is, after HTML, the
most common markup in web/training corpora).

The whole extractor is a frozen chain of RE2 rewrites applied with
vectorized Arrow ``replace_substring_regex`` — and mirrored verbatim in
the DuckDB oracle (both engines are RE2), so the oracle independently
recomputes the extraction like ``stages/redact.py`` does.  Covered
constructs: fenced code blocks (dropped), ATX headings, images (alt
kept), links (text kept), bold/italic (both markers), inline code,
blockquotes, bullet/ordered list markers, horizontal rules, whitespace
normalization.  Edit the chain on BOTH sides together.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# FROZEN (pattern, replacement) chain — RE2 on both sides; ORDER is
# load-bearing (images before links, bold before italic, fences first
# so their content never feeds later rules).
MARKDOWN_CHAIN = [
    (r"(?s)```.*?```", " "),                 # fenced code blocks drop
    (r"(?m)^#{1,6} +", ""),                  # ATX heading markers
    (r"!\[([^\]]*)\]\([^)]*\)", r"\1"),      # images -> alt text
    (r"\[([^\]]*)\]\([^)]*\)", r"\1"),       # links -> anchor text
    (r"\*\*([^*]+)\*\*", r"\1"),             # bold **
    (r"__([^_]+)__", r"\1"),                 # bold __
    (r"\*([^*]+)\*", r"\1"),                 # italic *
    (r"_([^_]+)_", r"\1"),                   # italic _
    (r"`([^`]+)`", r"\1"),                   # inline code
    (r"(?m)^> ?", ""),                       # blockquote markers
    (r"(?m)^[-*+] +", ""),                   # bullet list markers
    (r"(?m)^\d+\. +", ""),                   # ordered list markers
    (r"(?m)^-{3,}$", " "),                   # horizontal rules
]


def markdown_to_text(batch: pa.Table, *, field: str,
                     out_field: str = "text_md") -> pa.Table:
    s = batch[field]
    for pat, repl in MARKDOWN_CHAIN:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    s = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(s, pattern=r"\s+", replacement=" "))
    return batch.append_column(out_field, s)


def _synth_markdown(did: int, text: str) -> str:
    """Deterministic markdown doc over (doc_id, text): every chain rule
    fires at least once per document."""
    words = (text or "x").split()
    w0 = words[0] if words else "x"
    body = " ".join(words[1:]) if len(words) > 1 else ""
    return (f"# Doc {did}\n"
            f"> quoted intro {did % 5}\n"
            f"**{w0}** and *{did % 3}th* _note_ plus `code{did % 7}`\n"
            f"[link {did}](https://ex.com/{did}) "
            f"![img {did % 11}](pic{did}.png)\n"
            f"```\nhidden {did} block\n```\n"
            f"- item one\n"
            f"2. item {did % 13}\n"
            f"---\n"
            f"{body}")


def markdown_extract_pipeline(sf_dir: str):
    """documents -> synthesized markdown -> REAL vectorized extraction;
    DuckDB re-runs the identical RE2 chain (see oracle SQL)."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         override_num_blocks=8)

    def synth(t: pa.Table) -> pa.Table:
        vals = [_synth_markdown(int(d), x or "")
                for d, x in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist())]
        return pa.table({"doc_id": t["doc_id"],
                         "md": pa.array(vals, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(markdown_to_text, batch_format="pyarrow",
                     fn_kwargs={"field": "md"}).to_pandas()
    out = out.drop(columns=["md"])
    return out.sort_values("doc_id").reset_index(drop=True)
