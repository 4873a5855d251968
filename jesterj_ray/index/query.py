"""Query engine: segment reader + BM25 top-k (exhaustive and block-max pruned).

Replaces JesterJ's delegation of search to Solr/OpenSearch.  The serving
analog of the reference's sender connection state (Solr clients built once
per step, ``SendToSolrCloudZkProcessor.java``) is ``QueryActor``: a callable
class for ``map_batches`` actor pools that opens the index ONCE per actor
(``__init__``) and answers batches of queries (``__call__``).

Two scorers, tested rank-identical (FIXTURES.md test 6):

- ``topk``        exhaustive term-at-a-time, fully vectorized numpy
- ``topk_pruned`` block-max dynamic pruning (WAND-family / MaxScore):
    terms processed in descending upper-bound order; once the running
    top-k threshold exceeds the sum of remaining term upper bounds, later
    terms can no longer introduce NEW candidates and are intersected
    against existing candidates only, decoding just the posting blocks
    whose [first,last] doc range contains a candidate (block-max skip).

Scale: shard tables are loaded lazily and cached per actor; doc lengths are
held as one int32 array per partition (doc_id = pid << 32 | rank makes the
lookup O(1) array indexing).  On a real cluster each QueryActor would hold
only a doc-range slice; here one actor holds the full (small) test index.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..tokenize.tokenizer import TOKENIZERS
from .bm25 import B, K1, dedup_keep_order, idf
from .build import DOC_BITS
from .codec import BLOCK_SIZE, varbyte_decode


class IndexReader:
    """Reads one on-disk index produced by ``build.build_index``."""

    def __init__(self, index_dir: str):
        self.dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.n_docs = self.stats["n_docs"]
        self.avgdl = self.stats["avgdl"]
        self.num_shards = self.stats["num_shards"]
        self.tokenizer = TOKENIZERS[self.stats["tokenizer"]]
        self._shard_cache: Dict[int, Dict[str, dict]] = {}
        # doc lengths + doc_key per partition (dl lookup is array indexing)
        self._dl: Dict[int, np.ndarray] = {}
        self._doc_key: Dict[int, np.ndarray] = {}
        docs_dir = os.path.join(index_dir, "docs")
        for name in sorted(os.listdir(docs_dir)):
            if not name.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(docs_dir, name),
                              columns=["doc_id", "dl", "doc_key"])
            if t.num_rows == 0:
                continue
            pid = int(t["doc_id"][0].as_py()) >> DOC_BITS
            self._dl[pid] = t["dl"].to_numpy().astype(np.int64)
            self._doc_key[pid] = np.asarray(t["doc_key"].to_pylist(), dtype=object)

    # ---- postings access ----

    def _shard_of(self, term: str) -> int:
        return int(hashlib.sha256(term.encode()).hexdigest()[:8], 16) % self.num_shards

    def _load_shard(self, shard: int) -> Dict[str, dict]:
        if shard not in self._shard_cache:
            path = os.path.join(self.dir, "segments", f"shard-{shard:04d}.parquet")
            entries: Dict[str, dict] = {}
            if os.path.exists(path):
                t = pq.read_table(path)
                d = t.to_pydict()
                for i, term in enumerate(d["term"]):
                    entries[term] = {
                        "df": d["df"][i], "cf": d["cf"][i], "count": d["count"][i],
                        "doc_blob": d["doc_blob"][i], "tf_blob": d["tf_blob"][i],
                        "block_last": np.asarray(d["block_last"][i], dtype=np.int64),
                        "block_max_tf": np.asarray(d["block_max_tf"][i], dtype=np.int64),
                    }
            self._shard_cache[shard] = entries
        return self._shard_cache[shard]

    def term_entry(self, term: str) -> Optional[dict]:
        return self._load_shard(self._shard_of(term)).get(term)

    def postings(self, term: str) -> Tuple[np.ndarray, np.ndarray]:
        e = self.term_entry(term)
        if e is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        n = e["count"]
        docs = np.cumsum(varbyte_decode(e["doc_blob"], n).astype(np.int64))
        tfs = varbyte_decode(e["tf_blob"], n).astype(np.int64)
        return docs, tfs

    def doc_len(self, doc_ids: np.ndarray) -> np.ndarray:
        out = np.empty(doc_ids.size, dtype=np.int64)
        pids = doc_ids >> DOC_BITS
        ranks = doc_ids & ((1 << DOC_BITS) - 1)
        for pid in np.unique(pids):
            m = pids == pid
            out[m] = self._dl[int(pid)][ranks[m]]
        return out

    def doc_keys(self, doc_ids: np.ndarray) -> List[str]:
        out: List[str] = [""] * doc_ids.size
        pids = doc_ids >> DOC_BITS
        ranks = doc_ids & ((1 << DOC_BITS) - 1)
        for i in range(doc_ids.size):
            out[i] = str(self._doc_key[int(pids[i])][ranks[i]])
        return out

    # ---- scoring ----

    def _term_contrib(self, docs: np.ndarray, tfs: np.ndarray, df: int) -> np.ndarray:
        w = idf(self.n_docs, df)
        dls = self.doc_len(docs).astype(np.float64)
        tff = tfs.astype(np.float64)
        return w * tff * (K1 + 1.0) / (tff + K1 * (1.0 - B + B * dls / self.avgdl))

    def topk(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Exhaustive scoring. Summation in first-occurrence term order
        (pinned so ties/precision match the brute-force oracle)."""
        terms = dedup_keep_order(self.tokenizer(query))
        all_docs: List[np.ndarray] = []
        all_contrib: List[np.ndarray] = []
        for t in terms:
            docs, tfs = self.postings(t)
            if docs.size == 0:
                continue
            e = self.term_entry(t)
            all_docs.append(docs)
            all_contrib.append(self._term_contrib(docs, tfs, e["df"]))
        if not all_docs:
            return []
        cand = np.concatenate(all_docs)
        contrib = np.concatenate(all_contrib)
        uniq, inv = np.unique(cand, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, contrib)
        order = np.lexsort((uniq, -scores))[:k]
        return [(int(uniq[i]), float(scores[i])) for i in order]

    def topk_pruned(self, query: str, k: int = 10) -> List[Tuple[int, float]]:
        """Block-max pruned scoring (MaxScore with block-range skipping)."""
        terms = dedup_keep_order(self.tokenizer(query))
        entries = []
        for t in terms:
            e = self.term_entry(t)
            if e is not None:
                w = idf(self.n_docs, e["df"])
                ub = w * (K1 + 1.0)  # tf->inf, dl->0 upper bound
                entries.append((t, e, w, ub))
        if not entries:
            return []
        # descending upper bound
        entries.sort(key=lambda x: -x[3])
        rem_ub = np.cumsum([ub for *_, ub in entries][::-1])[::-1]

        cand_docs = np.empty(0, dtype=np.int64)
        cand_scores = np.empty(0, dtype=np.float64)
        for i, (t, e, w, ub) in enumerate(entries):
            threshold = 0.0
            if cand_scores.size >= k:
                threshold = float(np.partition(cand_scores, -k)[-k])
            if cand_scores.size >= k and threshold >= rem_ub[i]:
                # no new doc can reach top-k: intersect against candidates only,
                # decoding only blocks whose doc range covers a candidate
                bl = e["block_last"]
                n = e["count"]
                docs, tfs = self._decode_blocks_covering(e, cand_docs)
                if docs.size == 0:
                    continue
                pos = np.searchsorted(docs, cand_docs)
                pos_c = np.clip(pos, 0, docs.size - 1)
                hit = docs[pos_c] == cand_docs
                if not hit.any():
                    continue
                sub_docs = cand_docs[hit]
                sub_tfs = tfs[pos_c[hit]]
                contrib = self._term_contrib(sub_docs, sub_tfs, e["df"])
                cand_scores[hit] += contrib
            else:
                docs, tfs = self.postings(t)
                if docs.size == 0:
                    continue
                contrib = self._term_contrib(docs, tfs, e["df"])
                merged = np.concatenate([cand_docs, docs])
                merged_scores = np.concatenate([cand_scores, contrib])
                uniq, inv = np.unique(merged, return_inverse=True)
                acc = np.zeros(uniq.size, dtype=np.float64)
                np.add.at(acc, inv, merged_scores)
                cand_docs, cand_scores = uniq, acc
        order = np.lexsort((cand_docs, -cand_scores))[:k]
        return [(int(cand_docs[i]), float(cand_scores[i])) for i in order]

    def _decode_blocks_covering(self, e: dict, targets: np.ndarray
                                ) -> Tuple[np.ndarray, np.ndarray]:
        """Decode only posting blocks whose doc range may contain ``targets``.

        Current implementation decodes the full list then masks to covering
        blocks — the skip saves scoring work; true sub-blob decoding would
        need per-block byte offsets in the segment (future work, noted)."""
        n = e["count"]
        docs = np.cumsum(varbyte_decode(e["doc_blob"], n).astype(np.int64))
        tfs = varbyte_decode(e["tf_blob"], n).astype(np.int64)
        bl = e["block_last"]
        # block index each target would land in
        bidx = np.unique(np.searchsorted(bl, targets))
        bidx = bidx[bidx < bl.size]
        if bidx.size == bl.size:
            return docs, tfs
        keep = np.zeros(docs.size, dtype=bool)
        for b in bidx:
            keep[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE] = True
        return docs[keep], tfs[keep]


class QueryActor:
    """Actor-pool stage: answer batches of queries against one index.

    Use: ``queries_ds.map_batches(QueryActor, fn_constructor_kwargs=
    {"index_dir": d}, batch_format="pandas", concurrency=N)``.
    Input batch columns: qid:int64, query:string, k:int64.
    Output: qid, rank, doc_id (internal), doc_key, score.
    """

    def __init__(self, index_dir: str, pruned: bool = True):
        self.reader = IndexReader(index_dir)
        self.pruned = pruned

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"qid": [], "rank": [], "doc_id": [], "doc_key": [], "score": []}
        fn = self.reader.topk_pruned if self.pruned else self.reader.topk
        for qid, query, k in zip(batch["qid"], batch["query"], batch["k"]):
            hits = fn(query, int(k))
            ids = np.array([h[0] for h in hits], dtype=np.int64)
            keys = self.reader.doc_keys(ids)
            for r, ((did, score), key) in enumerate(zip(hits, keys), 1):
                out["qid"].append(int(qid))
                out["rank"].append(r)
                out["doc_id"].append(did)
                out["doc_key"].append(key)
                out["score"].append(score)
        return pd.DataFrame(out)
