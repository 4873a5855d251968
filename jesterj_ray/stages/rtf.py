"""RTF -> text extraction — the fourth rich-document slice of the Tika
slot (``TikaProcessor.java:50-84``; .rtf files are a classic office
ingest format and need no codec libraries).

A real, pure-Python RTF tokenizer covering the format's core:

- group nesting ``{ }``; DESTINATION groups dropped whole — the
  ``\\*`` marker and the common named destinations (fonttbl, colortbl,
  stylesheet, info, pict, header, footer),
- control words ``\\word[-N]`` with the delimiter-space-eaten rule;
  ``\\par``/``\\line`` -> newline, ``\\tab`` -> tab, everything else
  (formatting: ``\\b``, ``\\fs24``, ...) dropped,
- escapes: ``\\{ \\} \\\\`` literal, ``\\'hh`` cp1252 byte,
- raw CR/LF in the token stream ignored (RTF rule).

Honest subset: unicode ``\\uN`` fallbacks and nested alternative
destinations are not handled (documented; the reference delegates to
Tika's full parser).  The driver pipeline synthesizes RTF from the
documents table (bold runs, skipped font/info tables, an ``\\'e9``
escape) and the oracle recomputes the expected extraction from the
synthesis template — any group-skip / delimiter / escape bug breaks
the hash.  pytest covers the constructs SQL never sees.
"""

from __future__ import annotations

import pyarrow as pa

import ray

_DESTINATIONS = frozenset({"fonttbl", "colortbl", "stylesheet", "info",
                           "pict", "header", "footer"})


def rtf_to_text(data: str) -> str:
    out = []
    i, n = 0, len(data)
    depth = 0
    skip_depth = None        # depth at which a destination group began
    while i < n:
        c = data[i]
        if c == "{":
            depth += 1
            i += 1
            continue
        if c == "}":
            depth -= 1
            if skip_depth is not None and depth < skip_depth:
                skip_depth = None
            i += 1
            continue
        if skip_depth is not None:
            i += 1
            continue
        if c == "\\":
            nxt = data[i + 1] if i + 1 < n else ""
            if nxt in "{}\\":
                out.append(nxt)
                i += 2
                continue
            if nxt == "'":
                out.append(bytes([int(data[i + 2:i + 4], 16)])
                           .decode("cp1252"))
                i += 4
                continue
            if nxt == "*":
                skip_depth = depth
                i += 2
                continue
            j = i + 1
            while j < n and data[j].isalpha():
                j += 1
            word = data[i + 1:j]
            k = j
            if k < n and (data[k] == "-" or data[k].isdigit()):
                k += 1
                while k < n and data[k].isdigit():
                    k += 1
            if k < n and data[k] == " ":
                k += 1               # the delimiter space is EATEN
            if word in ("par", "line"):
                out.append("\n")
            elif word == "tab":
                out.append("\t")
            elif word in _DESTINATIONS:
                skip_depth = depth
            i = k
            continue
        if c in "\r\n":
            i += 1                   # raw newlines are ignored in RTF
            continue
        out.append(c)
        i += 1
    return "".join(out)


def rtf_extract(batch: pa.Table, *, src_col: str = "raw_rtf",
                id_col: str = "doc_id") -> pa.Table:
    texts = [rtf_to_text(r or "") for r in batch[src_col].to_pylist()]
    return pa.table({"doc_id": batch[id_col],
                     "text_extracted": pa.array(texts, pa.string())})


def _synth_rtf(batch: pa.Table, *, field: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """Deterministic RTF synthesis (frozen; oracle mirrors): every 5th
    word bolded in a group, font/info destination tables up front, an
    \\'e9 escape word appended on doc_id % 11 == 0, \\par at the end."""
    ids = batch[id_col].to_pylist()
    texts = batch[field].to_pylist()
    raws = []
    for d, t in zip(ids, texts):
        ws = (t or "").split(" ")
        parts = []
        for i, w in enumerate(ws):
            parts.append("{\\b " + w + "}" if i % 5 == 4 else w)
        body = " ".join(parts)
        if d % 11 == 0:
            body += " caf\\'e9"
        raws.append("{\\rtf1\\ansi{\\fonttbl{\\f0 Times;}}"
                    "{\\info{\\title doc " + str(d) + "}}"
                    "\\f0\\fs24 " + body + "\\par}")
    return batch.append_column("raw_rtf", pa.array(raws, pa.string()))


def rtf_extract_pipeline(sf_dir: str, *, num_blocks: int = 16):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=num_blocks)
    out = ds.map_batches(_synth_rtf, batch_format="pyarrow") \
        .map_batches(rtf_extract, batch_format="pyarrow")
    return out.sort("doc_id")
