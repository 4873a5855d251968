"""Step registry + declarative plan loading — the plan-jar analog.

The reference packages plans as jars with a ``@JavaPlanConfig`` provider
class discovered at startup (``ingest/Main.java:280-362``).  Ours is a
JSON plan spec resolved against this registry of named processors:

    {"name": "my_plan",
     "source": {"parquet": "/path/docs.parquet", "columns": ["doc_id","text"]},
     "steps": [
       {"name": "trim",  "processor": "trim_values",
        "kwargs": {"field": "text"}},
       {"name": "count", "processor": "token_count",
        "kwargs": {"field": "text"}, "predecessors": ["trim"]},
       {"name": "sink",  "processor": "write_parquet",
        "kwargs": {"path": "/tmp/out"}, "predecessors": ["count"]}
     ]}

Steps without ``predecessors`` chain after the previous step (linear
default); explicit predecessors build the DAG.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, Optional

from .plan import Plan, PlanBuilder, Step


def _registry() -> Dict[str, Any]:
    from ..stages import dedup, extract, fields, multimodal, senders, textstats
    from ..tokenize import preanalyze
    reg: Dict[str, Any] = {
        # field processors (§2.3)
        "copy_field": fields.copy_field,
        "drop_field": fields.drop_field,
        "trim_values": fields.trim_values,
        "split_field": fields.split_field,
        "regex_value_replace": fields.regex_value_replace,
        "filter_matching": fields.filter_matching,
        "set_static_value": fields.set_static_value,
        "date_reformat": fields.date_reformat,
        "readable_file_size": fields.readable_file_size,
        "url_encode_field": fields.url_encode_field,
        "field_template": fields.field_template,
        "doc_per_line": fields.doc_per_line,
        "add_raw_size": fields.add_raw_size,
        "parse_delimited": fields.parse_delimited,
        "noop": fields.noop,
        # extraction
        "extract_json_field": extract.extract_json_field,
        "pre_analyze_field": preanalyze.pre_analyze_field,
        # text analysis
        "token_count": textstats.token_count,
        "quality_score": textstats.quality_score,
        "bpe_token_count": textstats.bpe_ish_token_count,
        "fingerprint": textstats.fingerprint,
        "lang_id": textstats.LangId,                   # actor class
        # dedup / hashing
        "add_sha256": dedup.add_sha256,
        "add_simhash": dedup.add_simhash,
        # senders / sinks
        "status_sink": senders.StatusSink,             # actor class
        "throttled_fetcher": senders.ThrottledFetcher, # actor class
        # multimodal
        "image_decoder": multimodal.ImageDecoder,      # actor class
        "audio_frame_sampler": multimodal.AudioFrameSampler,
    }
    return reg


def resolve_processor(name: str):
    reg = _registry()
    if name not in reg:
        raise KeyError(f"unknown processor '{name}'; known: {sorted(reg)}")
    return reg[name]


def load_plan(spec: dict) -> Plan:
    b = PlanBuilder(spec.get("name", "plan"))
    prev: Optional[str] = None
    for s in spec["steps"]:
        proc = resolve_processor(s["processor"])
        kwargs = s.get("kwargs", {})
        if isinstance(proc, type):
            step = Step(s["name"], proc,
                        fn_constructor_kwargs=kwargs,
                        concurrency=s.get("concurrency", 2),
                        batch_size=s.get("batch_size"))
        else:
            step = Step(s["name"], proc, fn_kwargs=kwargs,
                        batch_size=s.get("batch_size"))
        preds = s.get("predecessors")
        if preds is None:
            preds = [prev] if prev else []
        b.add_step(step, *preds)
        prev = s["name"]
    return b.build()


def load_plan_file(path: str) -> Plan:
    with open(path) as f:
        return load_plan(json.load(f))
