"""End-to-end web-corpus curation — the Dolma/DataComp recipe as ONE
composed Dataset chain:

    quality filter  ->  exact dedup (keep-first)  ->  benchmark
    decontamination  ->  per-language token-budget mix

Every stage is one of the repo's oracle-checked primitives (the whole
chain has its own composed DuckDB oracle): ``textstats.quality_score``
(frozen formula), ``dedup.exact_dedup`` (coarse-sha-gkey keep-min),
``decontam.ngram_contamination`` (broadcast benchmark 5-gram set,
streaming probes), ``sampling.mix_by_token_budget`` (frozen hash rank,
two-level fold).  The benchmark side is the deterministic
``doc_id % 20 == 0`` holdout (the contamination_vs_holdout split);
holdout docs never enter the training pool.

Contamination drop rule: ratio > ``contam_max`` on the UNROUNDED
``n_hit / n_grams`` (both engines compute the identical IEEE division
of the same ints; a doc exactly AT the threshold is kept by both).
Docs with fewer than 5 tokens carry no 5-gram evidence and pass.

At 100 TB every stage keeps its documented shape: quality is
block-local, dedup exchanges hashes not content, the benchmark set
broadcasts once, and the mix's driver input is O(groups x budget).
The contamination frame returned to the driver is (pool-doc, 3 ints)
rows — at 10^10 docs that step becomes a broadcast-drop-set join
(ids only), noted here rather than hidden.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.decontam import holdout_split, ngram_contamination
from ..stages.dedup import exact_dedup
from ..stages.sampling import mix_by_token_budget
from ..stages.textstats import quality_score


def curation_pipeline(sf_dir: str, *, quality_min: float = 0.05,
                      contam_max: float = 0.2, budget: int = 2000,
                      bench_mod: int = 20,
                      num_blocks: int = 8) -> pd.DataFrame:
    """Returns the final mixed selection (lang, rank, doc_id, n_tok,
    cum_tokens), sorted (lang, rank) — column names match the
    token_budget_mix family so the composed oracle hashes exactly."""
    path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(path, columns=["doc_id", "lang", "text"],
                         override_num_blocks=num_blocks)

    # 1. quality filter (frozen formula; emits quality + n_tokens)
    ds = ds.map_batches(quality_score, batch_format="pyarrow",
                        fn_kwargs={"field": "text"})
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality"], quality_min)),
        batch_format="pyarrow")

    # 2. exact dedup keep-first by content
    ds = exact_dedup(ds, field="text", order_col="doc_id",
                     keep_cols=["doc_id", "lang", "text"])

    # 3. decontamination: pool excludes the holdout, then drops docs
    #    whose distinct-5-gram hit ratio exceeds contam_max (the split
    #    rule lives ONCE in decontam.holdout_split)
    pool, bench = holdout_split(path, ds, bench_mod=bench_mod)
    pool = pool.materialize()
    contam = ngram_contamination(pool, bench, text_col="text",
                                 id_col="doc_id", n=5)
    dropped = contam.loc[
        contam["n_hit"] / contam["n_grams"] > contam_max, "doc_id"]
    drop_set = pa.array(np.asarray(dropped, dtype=np.int64),
                        pa.int64())

    def drop_contaminated(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t["doc_id"],
                                           value_set=drop_set)))

    kept = pool.map_batches(drop_contaminated, batch_format="pyarrow")

    # 4. per-language token-budget mix over the curated pool
    return mix_by_token_budget(sf_dir, budget=budget, ds=kept,
                               num_blocks=num_blocks)
