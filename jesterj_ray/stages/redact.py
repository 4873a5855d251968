"""PII / URL redaction — the scrubbing pass of a training-data pipeline.

Reference analog: the per-document field transforms of §2.3
(``RegexValueReplace``-style processors) applied to the privacy problem
every corpus pipeline has: emails, URLs, phone numbers and IPs must not
reach the training set.

Everything is vectorized Arrow ``replace_substring_regex`` /
``count_substring_regex`` — and the patterns are RE2 on BOTH sides
(Arrow and DuckDB), so the SQL oracle independently recomputes the same
redaction rather than trusting a template.  Pattern ORDER matters
(an email inside a URL must redact as part of the URL), so the chain is
a frozen list applied in sequence; edit both sides together.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# FROZEN (pattern, placeholder) chain — mirrored verbatim in the
# redact_pii oracle SQL; RE2 syntax only (no lookaround/backrefs).
REDACTION_CHAIN = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
]


def redact_pii(batch: pa.Table, *, field: str,
               out_field: str = "text_redacted") -> pa.Table:
    """One vectorized RE2 pass per rule: counts each category BEFORE
    its replacement (so a URL-embedded email counts as URL only — it is
    already ``<URL>`` when the email rule runs), then replaces."""
    s = batch[field]
    counts = {}
    for name, pat, repl in REDACTION_CHAIN:
        counts[name] = pc.count_substring_regex(s, pattern=pat) \
            .cast(pa.int64())
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    out = batch.append_column(out_field, s)
    for name in counts:
        out = out.append_column(f"n_{name}", counts[name])
    return out


def _synth_pii(did: int, text: str) -> str:
    """Deterministic PII injection over (doc_id, text) for the oracle
    pipeline: both sides synthesize this exact string, then each runs
    its OWN redaction."""
    return (f"{text} contact u{did}@ex{did % 9}.example.com or "
            f"https://site{did % 7}.example/p/{did}?u=a{did}@b.co "
            f"node 10.{did % 256}.0.{did % 200} "
            f"tel {200 + did % 700}-{100 + did % 900}-{1000 + did % 9000}")


def redact_pii_pipeline(sf_dir: str):
    """documents + injected PII -> redacted text + per-category counts;
    DuckDB recomputes both with its own RE2 regexp_replace chain."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         override_num_blocks=8)

    def synth(t: pa.Table) -> pa.Table:
        vals = [_synth_pii(int(d), x or "")
                for d, x in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist())]
        return pa.table({"doc_id": t["doc_id"],
                         "text": pa.array(vals, pa.string())})

    out = ds.map_batches(synth, batch_format="pyarrow") \
        .map_batches(redact_pii, batch_format="pyarrow",
                     fn_kwargs={"field": "text"}).to_pandas()
    out = out.drop(columns=["text"])
    return out.sort_values("doc_id").reset_index(drop=True)
